"""Data-parallel embedding over the device mesh.

The reference is single-device by construction (SURVEY §2b); this wraps the fused
canvas → crops → ViT → embeddings program in batch sharding over the 1-D
``data`` mesh: canvases/crop-params sharded on their leading axis, ViT params
replicated, XLA/GSPMD handles the rest. One host feeds all local devices; for
multi-host slices, run one process per host over its own file shard (the stores
are keyed by uuid so shards merge trivially).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_assisted_data_labeling_tpu.models.vit import VitConfig, vit_encode_image
from clip_assisted_data_labeling_tpu.ops.crops import fused_crop_resize_normalize
from clip_assisted_data_labeling_tpu.ops.image_stats import image_stats_batch


class ShardedEmbedder:
    """Replicates params once; embeds batches whose leading dim is a multiple of
    the mesh size (the loader's fixed batch shape makes this free)."""

    def __init__(self, params: dict, cfg: VitConfig, mesh: Mesh,
                 compute_dtype=jnp.bfloat16, parity_preprocess: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.parity_preprocess = parity_preprocess
        self._repl = NamedSharding(mesh, P())
        self._data = NamedSharding(mesh, P("data"))
        if "model" in mesh.axis_names:
            # 2-D (data, model) mesh: tensor-parallel param layout for towers
            # too big to replicate per chip (rules in parallel/tp.py)
            from clip_assisted_data_labeling_tpu.parallel.tp import apply_tp_sharding

            self.params = apply_tp_sharding(params, mesh)
        else:
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, self._repl), params
            )
        self.n_devices = mesh.shape["data"]

    def embed(self, canvas_u8, crop_params, stat_params=None):
        assert canvas_u8.shape[0] % self.n_devices == 0, (
            f"batch {canvas_u8.shape[0]} must divide over {self.n_devices} devices"
        )
        canvas = jax.device_put(canvas_u8, self._data)
        cp = jax.device_put(crop_params, self._data)
        if stat_params is not None:
            sp = jax.device_put(stat_params, self._data)
            return _embed_stats_jit(
                self.params, canvas, cp, sp, self.cfg, self.compute_dtype,
                self.parity_preprocess,
            )
        return _embed_jit(
            self.params, canvas, cp, self.cfg, self.compute_dtype,
            self.parity_preprocess,
        )


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "parity"))
def _embed_jit(params, canvas_u8, crop_params, cfg, compute_dtype, parity):
    crops = fused_crop_resize_normalize(
        canvas_u8, crop_params, out_size=cfg.image_size, parity=parity,
        dtype=compute_dtype,
    )
    b, n = crops.shape[:2]
    emb = vit_encode_image(
        params, crops.reshape((b * n,) + crops.shape[2:]), cfg,
        compute_dtype=compute_dtype,
    )
    return emb.reshape(b, n, -1)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "parity"))
def _embed_stats_jit(params, canvas_u8, crop_params, stat_params, cfg,
                     compute_dtype, parity):
    emb = _embed_jit(params, canvas_u8, crop_params, cfg, compute_dtype, parity)
    stats = image_stats_batch(canvas_u8, stat_params)
    return emb, stats
