"""Tensor-parallel sharding rules for the ViT image tower.

The reference has no tensor parallelism (SURVEY.md §2b: single-GPU torch); this
is a new TPU-native component for serving towers too big for one chip's HBM
(ViT-H/14, ViT-g/14, PE-Core-G14-448). The scheme is standard Megatron-style
column→row parallelism over a 2-D ``('data', 'model')`` mesh:

  * ``qkv_kernel``/``fc1_kernel`` are column-parallel: output features sharded
    on ``model`` — every chip computes a head/hidden slice with no comms,
  * ``out_kernel``/``fc2_kernel`` are row-parallel: input features sharded on
    ``model``; XLA/GSPMD inserts the one ``psum`` per pair at the residual add,
  * biases follow their kernel's output sharding; layernorms, patch embedding,
    positional embeddings and the final projection are replicated (tiny),
  * attention heads shard cleanly because ``qkv`` packs [q|k|v] each of width
    ``w`` and GSPMD shards each third's head dim uniformly.

Stacked-block layout (models/vit.py ``init_vit_params``): every block kernel
carries a leading depth axis, so the specs below lead with ``None``. Quantized
pytrees (ops/quant.py) gain per-output-channel ``*_scale`` leaves which must
shard exactly like their kernel's output axis.

Used by ``__graft_entry__.dryrun_multichip`` (2-D mesh branch) and available to
the embed pipeline via ``ShardedEmbedder(..., mesh=get_mesh_2d(d, m))``.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# PartitionSpecs for the leaves of params["blocks"] (leading axis = depth).
# Anything not listed here — layernorm scales/biases and row-parallel kernels'
# biases (added post-psum, replicated) — is replicated.
TP_BLOCK_SPECS: dict[str, P] = {
    # column-parallel (output features on 'model')
    "qkv_kernel": P(None, None, "model"),
    "qkv_bias": P(None, "model"),
    "fc1_kernel": P(None, None, "model"),
    "fc1_bias": P(None, "model"),
    # row-parallel (input features on 'model'; bias replicated)
    "out_kernel": P(None, "model", None),
    "fc2_kernel": P(None, "model", None),
    # W8A8 per-output-channel scales follow their kernel's output sharding
    "qkv_kernel_scale": P(None, "model"),
    # int8 attention-wire per-channel amax: one value per qkv output column
    "qkv_amax": P(None, "model"),
    "fc1_kernel_scale": P(None, "model"),
    "out_kernel_scale": P(None, None),
    "fc2_kernel_scale": P(None, None),
}


def tp_block_spec(leaf_name: str) -> P:
    """PartitionSpec for one params['blocks'] leaf (replicated if unlisted)."""
    return TP_BLOCK_SPECS.get(leaf_name, P())


def apply_tp_sharding(params: dict, mesh: Mesh, model_axis: str = "model") -> dict:
    """Place a ViT parameter pytree onto ``mesh`` with tensor-parallel layout.

    ``mesh`` must carry a ``model_axis``; every non-block leaf is replicated,
    block leaves follow ``TP_BLOCK_SPECS``. Works for both float and quantized
    (ops/quant.py) pytrees. Returns a new pytree of placed arrays.
    """
    if model_axis not in mesh.axis_names:
        raise ValueError(
            f"mesh axes {mesh.axis_names} lack the tensor axis {model_axis!r}; "
            f"build one with parallel.mesh.get_mesh_2d(data, model)"
        )

    def rename(spec: P) -> P:
        return P(*[model_axis if ax == "model" else ax for ax in spec])

    out: dict = {}
    for name, leaf in params.items():
        if name == "blocks":
            out[name] = {
                k: jax.device_put(v, NamedSharding(mesh, rename(tp_block_spec(k))))
                for k, v in leaf.items()
            }
        else:
            out[name] = jax.device_put(leaf, NamedSharding(mesh, P()))
    return out
