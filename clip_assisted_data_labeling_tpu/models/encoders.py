"""Encoder registry: the TPU-native analog of the reference's CLIP_Encoder /
PE_Encoder dispatch (utils/embedder.py:58-150, selected at _1_embed_with_CLIP.py:69-75).

A ``CLIPImageEncoder`` owns the ViT config + params and exposes:

  * ``img_resolution`` — drives the fused preprocess output size,
  * ``encode(preprocessed)`` — jitted bf16 ViT forward, L2-normalized embeddings,
  * ``embed_crops(canvas, crop_params)`` — the fully-fused single-dispatch path:
    uint8 canvases → 4-crop preprocess → ViT → [B, n_crops, D] embeddings, all in
    one XLA program (the reference's per-crop PIL pipeline + torch forward,
    collapsed into one device computation).

Weight resolution order (no network egress — the reference downloads from the HF
hub, we only read local files):
  1. explicit ``params`` argument,
  2. ``<model_path>/<model-name-with-slashes-as-dashes>.npz`` (our native format),
  3. ``<model_path>/*.{pt,pth,bin,safetensors}`` torch checkpoints (converted),
  4. deterministic random init (seeded by model name) with a loud warning —
     useful for benchmarks and tests; embeddings are still deterministic.
"""
from __future__ import annotations

import functools
import logging
import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from clip_assisted_data_labeling_tpu.models import clip_weights
from clip_assisted_data_labeling_tpu.models.convnext import (
    CNXConfig,
    cnx_encode_image,
    init_cnx_params,
)
from clip_assisted_data_labeling_tpu.models.resnet import (
    RNConfig,
    init_rn_params,
    rn_encode_image,
)
from clip_assisted_data_labeling_tpu.models.vit import (
    VitConfig,
    init_vit_params,
    resolve_config,
    vit_encode_image,
)


def _encode_fn(cfg):
    """Per-family jitted forward (the reference's CLIP_Encoder dispatches the
    same way on the open_clip architecture, utils/embedder.py:58-63)."""
    if isinstance(cfg, RNConfig):
        return rn_encode_image
    if isinstance(cfg, CNXConfig):
        return cnx_encode_image
    return vit_encode_image


def _init_fn(cfg):
    if isinstance(cfg, RNConfig):
        return init_rn_params
    if isinstance(cfg, CNXConfig):
        return init_cnx_params
    return init_vit_params
from clip_assisted_data_labeling_tpu.ops.crops import fused_crop_resize_normalize

log = logging.getLogger(__name__)


def _stable_seed(name: str) -> int:
    # hash the WHOLE name: a prefix-based seed collides every "ViT-…" variant
    # onto identical random-init weights, silently duplicating features in
    # multi-model random-init runs (same-geometry towers, e.g. two ViT-L-14
    # pretrain tags, would embed identically)
    return zlib.crc32(name.encode()) % (2**31)


def calibration_file(model_name: str, directory: str) -> str:
    """Canonical on-disk location of a model's int8_static calibration."""
    safe = model_name.replace("/", "-")
    return os.path.join(directory, f"{safe}.calib.npz")


def save_calibration(path: str, amax: dict, model_name: str | None = None) -> None:
    """Persist the RAW amax pytree from models/vit.vit_act_amax (pre-margin;
    attach_act_amax applies the margin deterministically at load). Always
    writes every site the calibration produced — including qkv_amax even when
    the int8-wire knob is off — so one file serves any knob configuration."""
    flat = {k: np.asarray(v, np.float32) for k, v in amax.items()}
    if model_name is not None:
        flat["_model_name"] = np.asarray(model_name)
    # atomic replace: concurrent writers (multi-host shards on a shared FS)
    # or a mid-save kill must never leave a torn npz that poisons every
    # later resume; the pid keeps the temp names distinct across processes
    # (.npz suffix so np.savez doesn't append another)
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_calibration(path: str) -> dict:
    data = np.load(path)
    return {k: np.asarray(data[k]) for k in data.files}


def check_calibration(amax: dict, cfg, path: str, model_name: str = "") -> None:
    """Reject a calibration file recorded for a different tower — attaching it
    would silently mis-scale every activation site. Two guards: the recorded
    model name (same-geometry towers, e.g. CLIP vs PE variants with identical
    layers/width, would pass a shape-only check), then the amax shapes."""
    recorded = str(amax.get("_model_name", ""))
    if recorded and model_name and recorded != model_name:
        raise ValueError(
            f"{path} was calibrated for {recorded}, not {model_name} — "
            "wrong model's file (delete it or pass --calibration)"
        )
    if not recorded:
        # pre-provenance file: the name guard cannot run, shapes are the only
        # check left and they CANNOT distinguish same-geometry towers
        log.warning(
            "%s records no model name (written before provenance was added) "
            "— only shape-checked; delete it to recalibrate with provenance",
            path,
        )
    if isinstance(cfg, RNConfig):
        # modified-ResNet calibration: one [2] site-amax per bottleneck block
        for s, n in enumerate(cfg.layers):
            for b in range(n):
                k = f"s{s}b{b}_act_amax"
                got = np.asarray(amax[k]).shape if k in amax else None
                if got != (2,):
                    raise ValueError(
                        f"{path} holds {k}={got}, expected (2,) (recorded for "
                        f"{amax.get('_model_name', 'unknown model')}) — wrong "
                        "model's calibration file"
                    )
        return
    if isinstance(cfg, CNXConfig):
        # ConvNeXt calibration: one [depth, 2] site-amax per stage
        for s, d in enumerate(cfg.depths):
            k = f"s{s}_act_amax"
            got = np.asarray(amax[k]).shape if k in amax else None
            if got != (d, 2):
                raise ValueError(
                    f"{path} holds {k}={got}, expected {(d, 2)} "
                    f"(recorded for {amax.get('_model_name', 'unknown model')})"
                    " — wrong model's calibration file"
                )
        return
    if "act_amax" not in amax:
        raise ValueError(
            f"{path} is not a calibration file (no act_amax key) — wrong "
            "file passed as --calibration?"
        )
    shape = np.asarray(amax["act_amax"]).shape
    qshape = np.asarray(amax["qkv_amax"]).shape if "qkv_amax" in amax else None
    if shape != (cfg.layers, 4) or (qshape is not None
                                    and qshape != (cfg.layers, 3 * cfg.width)):
        raise ValueError(
            f"{path} holds a {shape}/{qshape} calibration "
            f"(recorded for {amax.get('_model_name', 'unknown model')}); "
            f"model {model_name} needs ({cfg.layers}, 4)/"
            f"({cfg.layers}, {3 * cfg.width}) — wrong model's file "
            "(delete it or pass --calibration)"
        )


class CLIPImageEncoder:
    def __init__(
        self,
        model_name: str,
        model_path: str | None = None,
        params: dict | None = None,
        compute_dtype=jnp.bfloat16,
        parity_preprocess: bool = True,
        calibration_path: str | None = None,
    ):
        self.model_name = model_name
        # int8_static calibration persistence: when set, scales are loaded from
        # this npz if it exists and saved to it after first-batch calibration —
        # making embeddings independent of dataset order and resume points
        # (without it, per-layer amaxes come from whichever batch runs first).
        self.calibration_path = calibration_path
        self.cfg = resolve_config(model_name)
        eva_block = (getattr(self.cfg, "mlp_type", "mlp") == "swiglu"
                     or getattr(self.cfg, "attn_inner_ln", False))
        if compute_dtype == "int8" and isinstance(self.cfg, RNConfig):
            # modified-ResNets support int8_static (W8A8 on the 1x1 bottleneck
            # matmuls, models/resnet.py) but have no dynamic-int8 formulation
            log.warning(
                "%s has no dynamic-int8 formulation — use int8_static for "
                "the W8A8 1x1-matmul path; running bfloat16", model_name,
            )
            compute_dtype = "bfloat16"
        elif compute_dtype == "int8_static" and isinstance(self.cfg, RNConfig):
            from clip_assisted_data_labeling_tpu.models.resnet import (
                rn_int8_static_enabled,
            )

            if not rn_int8_static_enabled(self.cfg):
                # same measured-auto contract as the ConvNeXt gate;
                # CTPU_RN_INT8=1 forces the W8A8 path for A/Bs
                log.info(
                    "%s: int8_static auto-resolves OFF for this ResNet "
                    "geometry (measured slower than bf16); running bfloat16",
                    model_name,
                )
                compute_dtype = "bfloat16"
        elif compute_dtype == "int8" and isinstance(self.cfg, CNXConfig):
            # ConvNeXt supports int8_static on its pointwise matmuls
            # (models/convnext.py) but has no dynamic-int8 formulation
            log.warning(
                "%s has no int8 formulation — use int8_static for the "
                "W8A8 pointwise-matmul path; running bfloat16", model_name,
            )
            compute_dtype = "bfloat16"
        elif compute_dtype == "int8_static" and isinstance(self.cfg, CNXConfig):
            from clip_assisted_data_labeling_tpu.models.convnext import (
                cnx_int8_static_enabled,
            )

            if not cnx_int8_static_enabled(self.cfg):
                # measured a loss on the small towers (bandwidth-bound
                # stages; BENCH_NOTES round-10) — auto runs them bf16;
                # CTPU_CNX_INT8=1 forces the W8A8 path for A/Bs
                log.info(
                    "%s: int8_static auto-resolves OFF for this ConvNeXt "
                    "geometry (measured slower than bf16); running bfloat16",
                    model_name,
                )
                compute_dtype = "bfloat16"
        elif compute_dtype == "int8" and eva_block:
            # EVA02's swiglu/sub-LN block has a STATIC int8 path
            # (vit._block_int8_static_lnk EVA branches) but no dynamic one
            log.warning(
                "%s (EVA02 swiglu/sub-LN block) has no dynamic-int8 "
                "formulation — use int8_static for the fast path; running "
                "bfloat16", model_name,
            )
            compute_dtype = "bfloat16"
        # post-norm towers (EVA02-E) run both int8 modes through the generic
        # block path: vit_act_amax mirrors the post-norm sites (a[0]/a[2]
        # quantize the raw residual stream — per-LAYER scales absorb the
        # depth-wise magnitude growth; accuracy pinned in
        # tests/test_eva_parity.py::test_eva02_e_int8_static_accuracy)
        # compute_dtype "int8" selects the W8A8 fast mode: matmul weights are
        # quantized once here, activations dynamically per token (ops/quant.py);
        # non-matmul compute stays bf16. "int8_static" additionally calibrates
        # per-layer STATIC activation scales on the first batch it sees (one
        # extra forward), after which every quantize fuses into its producer's
        # epilogue — the fastest mode (models/vit.vit_act_amax).
        self.static_quant = compute_dtype == "int8_static"
        if self.static_quant:
            compute_dtype = "int8"
        self.quantized = np.dtype(compute_dtype) == np.dtype(np.int8)
        self.compute_dtype = jnp.bfloat16 if self.quantized else compute_dtype
        self.parity_preprocess = parity_preprocess
        self.params = params if params is not None else self._load_params(model_path)
        if self.quantized:
            if isinstance(self.cfg, RNConfig):
                from clip_assisted_data_labeling_tpu.models.resnet import (
                    is_rn_quantized,
                    quantize_rn_params,
                )

                if not is_rn_quantized(self.params):
                    log.info("Quantizing %s 1x1 convs to W8A8", model_name)
                    self.params = quantize_rn_params(self.params)
            elif isinstance(self.cfg, CNXConfig):
                from clip_assisted_data_labeling_tpu.models.convnext import (
                    is_cnx_quantized,
                    quantize_cnx_params,
                )

                if not is_cnx_quantized(self.params):
                    log.info("Quantizing %s pointwise matmuls to W8A8", model_name)
                    self.params = quantize_cnx_params(self.params)
            else:
                from clip_assisted_data_labeling_tpu.ops.quant import (
                    is_quantized,
                    quantize_vit_params,
                )

                if not is_quantized(self.params):
                    log.info("Quantizing %s weights to W8A8", model_name)
                    self.params = quantize_vit_params(self.params)

    @property
    def img_resolution(self) -> int:
        return self.cfg.image_size

    @property
    def embed_dim(self) -> int:
        return self.cfg.embed_dim

    def _load_params(self, model_path: str | None) -> dict:
        if model_path and not os.path.exists(model_path):
            # a typo'd weights path must fail loudly, not fall through to
            # random init and embed garbage
            raise FileNotFoundError(f"--model_path {model_path} does not exist")
        if model_path and os.path.isfile(model_path):
            if model_path.endswith(".npz"):
                return clip_weights.ensure_rope_half(
                    clip_weights.load_params_npz(model_path), self.cfg)
            log.info("Converting torch checkpoint %s", model_path)
            return self._convert_torch_file(model_path)
        if model_path and os.path.isdir(model_path):
            safe = self.model_name.replace("/", "-")
            if os.path.isdir(os.path.join(model_path, f"{safe}.orbax")):
                # sharded checkpoint (towers too big to gather on one host)
                orbax_dir = os.path.join(model_path, f"{safe}.orbax")
                log.info("Loading %s weights from %s", self.model_name, orbax_dir)
                return clip_weights.ensure_rope_half(
                    clip_weights.load_params_orbax(orbax_dir), self.cfg)
            npz = os.path.join(model_path, f"{safe}.npz")
            if os.path.exists(npz):
                log.info("Loading %s weights from %s", self.model_name, npz)
                return clip_weights.ensure_rope_half(
                    clip_weights.load_params_npz(npz), self.cfg)
            ckpt_exts = (".pt", ".pth", ".bin", ".safetensors")
            candidates = [
                f for f in sorted(os.listdir(model_path)) if f.endswith(ckpt_exts)
            ]
            # exact stem first (full sanitized name, then bare architecture —
            # 'ViT-L-14/openai' finds ViT-L-14.pt), then substring matches,
            # then standard single-checkpoint names (pytorch_model.bin,
            # model.safetensors, open_clip_pytorch_model.bin)
            arch = self.model_name.split("/")[0]
            named = (
                [f for f in candidates if os.path.splitext(f)[0] == safe]
                or [f for f in candidates if os.path.splitext(f)[0] == arch]
                or [f for f in candidates if safe in f]
            )
            if not named and len(candidates) == 1:
                named = candidates
            if not named:
                named = [
                    f for f in candidates
                    if os.path.splitext(f)[0] in
                    ("pytorch_model", "model", "open_clip_pytorch_model")
                ]
            if named:
                full = os.path.join(model_path, named[0])
                log.info("Converting torch checkpoint %s", full)
                return self._convert_torch_file(full)
            if candidates:
                # the directory HAS checkpoints, just not this model's — that
                # is a lookup miss, not a request for random init; falling
                # through would silently embed garbage
                raise FileNotFoundError(
                    f"{model_path} holds {candidates} but none matches "
                    f"{self.model_name} (looked for '{safe}'/'{arch}')"
                )
        log.warning(
            "No local weights found for %s — using deterministic random init "
            "(fine for benchmarks/tests; NOT a trained encoder).",
            self.model_name,
        )
        init = _init_fn(self.cfg)
        # jit the init: ONE device program instead of hundreds of eager
        # per-leaf dispatches (870 s → 16 s for the billion-param towers on
        # the tunnel), and XLA fuses each leaf's f32 normal → target-dtype
        # convert so no f32 temporary materializes (EVA02-E's 7 GB fc1 f32
        # intermediate OOM'd the eager path — BENCH_NOTES round-13). RNG
        # values are identical jitted or eager (threefry is deterministic).
        return jax.jit(lambda k: init(self.cfg, k))(
            jax.random.key(_stable_seed(self.model_name)))

    def _convert_torch_file(self, path: str) -> dict:
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd = load_file(path)
        else:
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=True)
            sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        return clip_weights.convert_torch_state_dict(sd, self.cfg)

    def save_npz(self, path: str) -> None:
        clip_weights.save_params_npz(path, self.params)

    def _calibrated(self) -> bool:
        """Static activation scales already attached to self.params?"""
        if isinstance(self.cfg, RNConfig):
            return "s0b0_act_amax" in self.params
        if isinstance(self.cfg, CNXConfig):
            return "s0_act_amax" in self.params
        return "act_amax" in self.params["blocks"]

    def load_calibration(self) -> bool:
        """Attach persisted int8_static scales if a calibration file exists.
        Returns True when scales are attached (loaded now or previously)."""
        if not self.static_quant:
            return False
        if self._calibrated():
            return True
        if not (self.calibration_path and os.path.exists(self.calibration_path)):
            return False
        from clip_assisted_data_labeling_tpu.models.vit import (
            attach_act_amax,
            int8_wire_enabled,
        )

        amax = load_calibration(self.calibration_path)
        check_calibration(amax, self.cfg, self.calibration_path, self.model_name)
        amax.pop("_model_name", None)
        if isinstance(self.cfg, RNConfig):
            from clip_assisted_data_labeling_tpu.models.resnet import (
                attach_rn_act_amax,
            )

            log.info("Loaded static int8 calibration from %s",
                     self.calibration_path)
            self.params = attach_rn_act_amax(self.params, amax)
            return True
        if isinstance(self.cfg, CNXConfig):
            from clip_assisted_data_labeling_tpu.models.convnext import (
                attach_cnx_act_amax,
            )

            log.info("Loaded static int8 calibration from %s",
                     self.calibration_path)
            self.params = attach_cnx_act_amax(self.params, amax)
            return True
        wire = int8_wire_enabled(self.cfg)
        if wire and "qkv_amax" not in amax:
            log.info(
                "%s lacks qkv_amax (saved without the int8 wire); recalibrating",
                self.calibration_path,
            )
            return False
        if not wire:
            amax = {"act_amax": amax["act_amax"]}
        log.info("Loaded static int8 calibration from %s", self.calibration_path)
        self.params = attach_act_amax(self.params, amax)
        return True

    def _maybe_calibrate(self, images: jnp.ndarray) -> None:
        """int8_static mode: derive per-layer static activation scales from the
        FIRST (real-data) batch — one extra forward, then every later batch
        runs the fully-static path. ``images`` may be [B, R, R, 3] or
        pre-patchified [B, N, p·p·3]. With ``calibration_path`` set, scales are
        reloaded from disk when present (order-independent, resume-stable) and
        persisted after a fresh calibration."""
        if not self.static_quant or self._calibrated():
            return
        if self.load_calibration():
            return
        if isinstance(self.cfg, RNConfig):
            from clip_assisted_data_labeling_tpu.models.resnet import (
                attach_rn_act_amax,
                rn_act_amax,
            )

            log.info("Calibrating ResNet static int8 scales on the first batch")
            amax = jax.tree.map(
                np.asarray,
                rn_act_amax(self.params, images, self.cfg,
                            compute_dtype=self.compute_dtype),
            )
            if self.calibration_path:
                save_calibration(self.calibration_path, amax, self.model_name)
                log.info("Saved static int8 calibration to %s",
                         self.calibration_path)
            self.params = attach_rn_act_amax(self.params, amax)
            return
        if isinstance(self.cfg, CNXConfig):
            from clip_assisted_data_labeling_tpu.models.convnext import (
                attach_cnx_act_amax,
                cnx_act_amax,
            )

            log.info("Calibrating ConvNeXt static int8 scales on the first batch")
            amax = jax.tree.map(
                np.asarray,
                cnx_act_amax(self.params, images, self.cfg,
                             compute_dtype=self.compute_dtype),
            )
            if self.calibration_path:
                save_calibration(self.calibration_path, amax, self.model_name)
                log.info("Saved static int8 calibration to %s",
                         self.calibration_path)
            self.params = attach_cnx_act_amax(self.params, amax)
            return
        from clip_assisted_data_labeling_tpu.models.vit import (
            attach_act_amax,
            vit_act_amax,
        )

        log.info("Calibrating static int8 activation scales on the first batch")
        amax = jax.tree.map(
            np.asarray,
            vit_act_amax(self.params, images, self.cfg,
                         compute_dtype=self.compute_dtype),
        )
        if self.calibration_path:
            save_calibration(self.calibration_path, amax, self.model_name)
            log.info("Saved static int8 calibration to %s", self.calibration_path)
        # The int8 attention wire (per-channel qkv_amax + the q8s kernel)
        # defaults per shape (models/vit.int8_wire_enabled): ON where the
        # non-wire route would fall to the flash kernel (SO400M-384 measured
        # +29%), OFF where the bf16 packed kernel serves the shape (neutral
        # at L-224, -14% at L-336 — BENCH_NOTES round-8). CTPU_INT8_WIRE=1/0
        # forces it.
        from clip_assisted_data_labeling_tpu.models.vit import (
            int8_wire_enabled,
        )

        if not int8_wire_enabled(self.cfg):
            amax = {"act_amax": amax["act_amax"]}
        self.params = attach_act_amax(self.params, amax)

    def encode(self, preprocessed: jnp.ndarray) -> jnp.ndarray:
        """[..., R, R, 3] CLIP-normalized images → [..., embed_dim] unit vectors."""
        lead = preprocessed.shape[:-3]
        flat = preprocessed.reshape((-1,) + preprocessed.shape[-3:])
        self._maybe_calibrate(flat)
        encode = _encode_fn(self.cfg)
        emb = encode(self.params, flat, self.cfg, compute_dtype=self.compute_dtype)
        return emb.reshape(lead + (self.cfg.embed_dim,))

    def encode_variable(self, images: list) -> jnp.ndarray:
        """Variable-aspect naflex path: list of [H, W, 3] uint8 arrays →
        [B, width] unit embeddings, each image on its own aspect-preserving
        patch grid (models/naflex.py). The square-crop pipeline never needs
        this — embed_crops/encode fill the full positional grid."""
        if not getattr(self.cfg, "naflex", False):
            raise ValueError(
                f"{self.model_name} is not a naflex tower; use encode/embed_crops"
            )
        if self.quantized:
            raise ValueError(
                "the masked variable-aspect path has no int8 formulation — "
                "construct the encoder with compute_dtype='bfloat16' (the "
                "square-crop pipeline path does support int8 modes)"
            )
        from clip_assisted_data_labeling_tpu.models.naflex import (
            build_pos_weights,
            naflex_encode,
            preprocess_variable,
        )

        n_max = self.cfg.seq_len
        prepped = [preprocess_variable(np.asarray(im), self.cfg, n_max)
                   for im in images]
        patches = np.stack([p for p, _, _ in prepped])
        masks = np.stack([m for _, m, _ in prepped])
        pos_w = build_pos_weights([s for _, _, s in prepped], n_max,
                                  self.cfg.grid)
        return naflex_encode(
            self.params, jnp.asarray(patches), jnp.asarray(pos_w),
            jnp.asarray(masks), self.cfg, compute_dtype=self.compute_dtype,
        )

    def embed_crops(self, canvas_u8: jnp.ndarray, crop_params: jnp.ndarray) -> jnp.ndarray:
        """[B, C, C, 3] uint8 + [B, n_crops, 2, 4] → [B, n_crops, D]; one jit."""
        if self.static_quant and not self._calibrated():
            # persisted scales first: building calibration crops is a DISTINCT
            # jit program from _embed_crops_jit's, and a new shape costs
            # minutes of remote compile on the tunnel (CLAUDE.md)
            if not self.load_calibration():
                crops = fused_crop_resize_normalize(
                    canvas_u8, crop_params, out_size=self.cfg.image_size,
                    parity=self.parity_preprocess, dtype=self.compute_dtype,
                    patch_size=self.cfg.patch_size,
                    mean=self.cfg.norm_mean, std=self.cfg.norm_std,
                )
                self._maybe_calibrate(crops.reshape((-1,) + crops.shape[2:]))
        return _embed_crops_jit(
            self.params,
            canvas_u8,
            crop_params,
            self.cfg,
            self.compute_dtype,
            self.parity_preprocess,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype", "parity_preprocess")
)
def _embed_crops_jit(params, canvas_u8, crop_params, cfg, compute_dtype, parity_preprocess):
    from clip_assisted_data_labeling_tpu.ops import knobs

    # two measured layouts for handing crops to the patch embed (round-3):
    #  grid  — resample einsums emit [gh,gw,p,p,3] directly (no patchify copy,
    #          but the 5-D vertical pass runs at ~23 TFLOP/s)
    #  image — classic [R,R,3] resample (vertical pass is a clean matmul) +
    #          in-place strided patch contraction in _patch_embed
    patch_mode = knobs.PREPROC  # 'image' measured +3 (import-time snapshot)
    is_conv = isinstance(cfg, (RNConfig, CNXConfig))
    crops = fused_crop_resize_normalize(
        canvas_u8,
        crop_params,
        out_size=cfg.image_size,
        parity=parity_preprocess,
        dtype=compute_dtype,
        patch_size=cfg.patch_size if (patch_mode == "grid" and not is_conv) else None,
        patch_flatten=False,  # patch-embed einsum contracts the grid in place
        mean=cfg.norm_mean, std=cfg.norm_std,
    )
    b, n = crops.shape[:2]
    encode = _encode_fn(cfg)
    emb = encode(
        params,
        crops.reshape((b * n,) + crops.shape[2:]),
        cfg,
        compute_dtype=compute_dtype,
    )
    return emb.reshape(b, n, -1)


def create_encoder(model_name: str, model_path: str | None = None, **kw) -> CLIPImageEncoder:
    """Reference-compatible dispatch: 'PE-…' and 'Arch/pretrained' both resolve to
    the same TPU image tower; PE names select the PE config family."""
    return CLIPImageEncoder(model_name, model_path=model_path, **kw)
