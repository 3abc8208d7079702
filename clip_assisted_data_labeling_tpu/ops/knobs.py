"""Performance knobs (``CTPU_*`` env vars) — snapshot ONCE at import.

Every knob here selects between measured implementations (BENCH_NOTES.md);
the defaults are the fastest configuration on the bench chip. They used to be
read lazily inside jitted functions, which made a mid-process env change
silently ineffective (the cached trace keeps the old value). Reading them once
at import makes the contract visible: set the env var BEFORE importing the
package. Tests that must flip a knob mid-process call :func:`reload` and use
fresh jit shapes (cached traces keep whatever value they were traced with).

``CTPU_PALLAS_INTERPRET`` is deliberately NOT snapshot here — it gates kernel
execution per trace (tests monkeypatch it around individual shape families;
see ops/attention._env_interpret).
"""
from __future__ import annotations

import os


def reload() -> None:
    """Re-read every knob from the environment (test hook)."""
    g = globals()
    # crop → patch-embed handoff layout: 'image' (classic [R,R,3] resample +
    # in-place patch contraction, measured +3 imgs/s) or 'grid' (resample
    # einsums emit the patch grid directly)
    g["PREPROC"] = os.environ.get("CTPU_PREPROC", "image")
    # batch items per packed-attention grid step (>1 measured neutral and
    # VMEM-fragile — see ops/attention.fused_attention_packed; values >1
    # disable the pipelined head order for the call, which needs the VMEM)
    g["ATTN_ITEMS"] = int(os.environ.get("CTPU_ATTN_ITEMS", "1"))
    # software-pipelined head loop in the whole-block attention kernel (issue
    # head h+1's QKᵀ before head h's softmax so the scheduler overlaps MXU and
    # VPU): kernel 3.27→3.01 ms, e2e 335→358 imgs/s measured — default ON
    # (ops/attention._packed_kernel; disproof-resistant: bit-identical output)
    g["ATTN_PIPELINE"] = os.environ.get("CTPU_ATTN_PIPELINE", "1") == "1"
    # packed_attention_auto routing: prefer the grouped kernel's pipelined
    # whole-scores mode over a row-tiling whole-block kernel (long sequences,
    # e.g. ViT-L-336's S=577). Opt-in A/B knob until measured on chip.
    g["ATTN_WHOLESCORES_ROUTE"] = (
        os.environ.get("CTPU_ATTN_WHOLESCORES_ROUTE") == "1"
    )
    # Pallas single-pass ln+static-quantize kernels on the int8_static path
    # (+23 imgs/s round 3); '0' falls back to XLA's ln chain
    g["LN_KERNEL"] = os.environ.get("CTPU_LN_KERNEL", "1") == "1"
    # dynamic-int8 block implementation: 'xla-plain' | 'xla' | 'hybrid'
    # (models/vit._int8_block_mode docstring has the measurements)
    g["INT8_BLOCK"] = os.environ.get("CTPU_INT8_BLOCK", "xla-plain")
    # int8 attention wire (per-channel qkv scales + the q8s kernel): 'auto'
    # (default) enables it per shape — exactly the towers whose non-wire
    # route falls to the flash kernel while the tiled q8s kernel fits
    # (SO400M-384 measured +29%; neutral at 224, -14% at 336 — BENCH_NOTES
    # round-8). '1' forces on everywhere, '0' forces off. Resolution per
    # tower lives in models/vit.int8_wire_enabled.
    g["INT8_WIRE"] = {"1": "on", "0": "off"}.get(
        os.environ.get("CTPU_INT8_WIRE", ""), "auto")
    # fully-fused Pallas W8A8 GEMM prototype (slower until Mosaic gains
    # native-int8 matmuls; ops/quant.q_matmul docstring)
    g["FUSED_QMATMUL"] = os.environ.get("CTPU_FUSED_QMATMUL") == "1"
    # ConvNeXt W8A8 pointwise-matmul path under int8_static: 'auto' enables
    # it where it measured a win — towers with final width >= 1536 (large_d
    # +5.4%, base_w -3%: the small-C stages are bandwidth-bound and the
    # quantize passes cost more than the matmul speedup — BENCH_NOTES
    # round-10). '1'/'0' force. Resolution in convnext.cnx_int8_static_enabled.
    g["CNX_INT8"] = {"1": "on", "0": "off"}.get(
        os.environ.get("CTPU_CNX_INT8", ""), "auto")
    # modified-ResNet W8A8 1x1-conv-as-matmul path under int8_static: same
    # 'auto'/'1'/'0' contract as CNX_INT8; resolution per tower in
    # resnet.rn_int8_static_enabled (measured A/B in BENCH_NOTES).
    g["RN_INT8"] = {"1": "on", "0": "off"}.get(
        os.environ.get("CTPU_RN_INT8", ""), "auto")
    # minimum bottleneck width for a block to take the W8A8 path (0 = every
    # block); the narrow early stages are bandwidth-bound (A/B in BENCH_NOTES)
    g["RN_INT8_MIN_MID"] = int(os.environ.get("CTPU_RN_INT8_MIN_MID", "0"))
    # W8A8 1x1 formulation: int8 NHWC conv (no activation relayout) vs the
    # reshape-to-matmul path (A/B in BENCH_NOTES)
    g["RN_INT8_CONV"] = os.environ.get("CTPU_RN_INT8_CONV", "0") == "1"


PREPROC: str
ATTN_ITEMS: int
ATTN_PIPELINE: bool
ATTN_WHOLESCORES_ROUTE: bool
LN_KERNEL: bool
INT8_BLOCK: str
INT8_WIRE: str  # 'auto' | 'on' | 'off'
FUSED_QMATMUL: bool
CNX_INT8: str  # 'auto' | 'on' | 'off'
RN_INT8: str  # 'auto' | 'on' | 'off'
RN_INT8_MIN_MID: int
RN_INT8_CONV: bool

reload()
