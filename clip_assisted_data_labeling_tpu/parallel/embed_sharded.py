"""Data-parallel embedding over the device mesh.

The reference is single-device by construction (SURVEY §2b); this shards the
fused canvas → crops → ViT → embeddings program over the ``data`` mesh axis:
canvases/crop-params split on their leading axis, ViT params replicated. The
1-D DP mesh uses ``shard_map`` — each shard runs the ordinary single-device
program, so the Pallas kernels (attention, ln+quantize) work untouched
(GSPMD cannot partition opaque custom calls). The 2-D (data, model) mesh
keeps the GSPMD path with tensor-parallel param sharding (parallel/tp.py);
XLA inserts the TP collectives there. One host feeds all local devices; for
multi-host slices, run one process per host over its own file shard (the
stores are keyed by uuid so shards merge trivially).
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
                 compute_dtype=jnp.bfloat16, parity_preprocess: bool = False,
                 calibration_path: str | None = None, model_name: str = ""):
        self.cfg = cfg
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.parity_preprocess = parity_preprocess
        # int8_static persistence (same contract as CLIPImageEncoder): load
        # saved scales when the file exists, save after a fresh calibration;
        # model_name is recorded alongside so same-geometry towers (e.g. CLIP
        # vs PE variants with identical layers/width) can't swap scale files.
        # Persistence without provenance would silently re-open that hole, so
        # the name is REQUIRED whenever a calibration file is in play.
        if calibration_path and not model_name:
            raise ValueError(
                "ShardedEmbedder(calibration_path=...) needs model_name — "
                "calibration files are validated by recorded model name"
            )
        self.calibration_path = calibration_path
        self.model_name = model_name
        self._repl = NamedSharding(mesh, P())
        self._data = NamedSharding(mesh, P("data"))
        self._dp_only = "model" not in mesh.axis_names
        self._tp_static = False  # set by calibrate_static on 2-D meshes
        if not self._dp_only:
            # 2-D (data, model) mesh: tensor-parallel param layout for towers
            # too big to replicate per chip (rules in parallel/tp.py)
            from clip_assisted_data_labeling_tpu.parallel.tp import apply_tp_sharding

            self.params = apply_tp_sharding(params, mesh)
        else:
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, self._repl), params
            )
        self.n_devices = mesh.shape["data"]

    def calibrate_static(self, canvas_u8, crop_params) -> None:
        """int8_static on the mesh: run the (pure-XLA) calibration forward on
        this sharded batch — jnp.max over the sharded batch dim reduces across
        shards — and attach the scales replicated. Later ``embed`` calls take
        the static path per shard."""
        from clip_assisted_data_labeling_tpu.models.vit import (
            attach_act_amax,
            vit_act_amax,
        )

        from clip_assisted_data_labeling_tpu.models.encoders import (
            load_calibration,
            save_calibration,
        )
        if "act_amax" in self.params.get("blocks", {}):
            return
        import os

        from clip_assisted_data_labeling_tpu.models.convnext import CNXConfig

        if isinstance(self.cfg, CNXConfig):
            # ConvNeXt int8_static on the mesh: calibrate on this batch's
            # crops, attach the scales replicated (pointwise-matmul W8A8 —
            # models/convnext.py; the params stay replicated on 2-D meshes
            # too, so the tower runs data-parallel there)
            from clip_assisted_data_labeling_tpu.models.convnext import (
                attach_cnx_act_amax,
                cnx_act_amax,
            )
            from clip_assisted_data_labeling_tpu.models.encoders import (
                check_calibration,
            )

            if "s0_act_amax" in self.params:
                return
            amax = None
            if self.calibration_path and os.path.exists(self.calibration_path):
                amax = load_calibration(self.calibration_path)
                check_calibration(amax, self.cfg, self.calibration_path,
                                  self.model_name)
                amax.pop("_model_name", None)
                print(f"Loaded static int8 calibration from {self.calibration_path}")
            if amax is None:
                canvas = jax.device_put(canvas_u8, self._data)
                cp = jax.device_put(crop_params, self._data)
                crops = fused_crop_resize_normalize(
                    canvas, cp, out_size=self.cfg.image_size,
                    parity=self.parity_preprocess, dtype=self.compute_dtype,
                    mean=self.cfg.norm_mean, std=self.cfg.norm_std,
                )
                flat = crops.reshape((-1,) + crops.shape[2:])
                amax = jax.tree.map(np.asarray, cnx_act_amax(
                    self.params, flat, self.cfg,
                    compute_dtype=self.compute_dtype))
                if self.calibration_path:
                    save_calibration(self.calibration_path, amax,
                                     self.model_name)
                    print(f"Saved static int8 calibration to {self.calibration_path}")
            self.params = attach_cnx_act_amax(self.params, amax)
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, self._repl), self.params
            )
            return

        from clip_assisted_data_labeling_tpu.models.resnet import RNConfig

        if isinstance(self.cfg, RNConfig):
            # modified-ResNet int8_static on the mesh: same contract as the
            # CNX branch above (W8A8 1x1-matmul path, models/resnet.py)
            from clip_assisted_data_labeling_tpu.models.encoders import (
                check_calibration,
            )
            from clip_assisted_data_labeling_tpu.models.resnet import (
                attach_rn_act_amax,
                rn_act_amax,
            )

            if "s0b0_act_amax" in self.params:
                return
            amax = None
            if self.calibration_path and os.path.exists(self.calibration_path):
                amax = load_calibration(self.calibration_path)
                check_calibration(amax, self.cfg, self.calibration_path,
                                  self.model_name)
                amax.pop("_model_name", None)
                print(f"Loaded static int8 calibration from {self.calibration_path}")
            if amax is None:
                canvas = jax.device_put(canvas_u8, self._data)
                cp = jax.device_put(crop_params, self._data)
                crops = fused_crop_resize_normalize(
                    canvas, cp, out_size=self.cfg.image_size,
                    parity=self.parity_preprocess, dtype=self.compute_dtype,
                    mean=self.cfg.norm_mean, std=self.cfg.norm_std,
                )
                flat = crops.reshape((-1,) + crops.shape[2:])
                amax = jax.tree.map(np.asarray, rn_act_amax(
                    self.params, flat, self.cfg,
                    compute_dtype=self.compute_dtype))
                if self.calibration_path:
                    save_calibration(self.calibration_path, amax,
                                     self.model_name)
                    print(f"Saved static int8 calibration to {self.calibration_path}")
            self.params = attach_rn_act_amax(self.params, amax)
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, self._repl), self.params
            )
            return

        from clip_assisted_data_labeling_tpu.models.vit import (
            int8_wire_enabled,
        )

        if (getattr(self.cfg, "block_norm", "pre") == "post"
                and not self._dp_only):
            # tp_static's explicit-collective blocks are pre-norm
            # formulations; a post-norm tower (EVA02-E) would silently
            # compute the wrong network under them
            raise ValueError(
                "int8_static for post-norm towers has no tensor-parallel "
                "formulation (parallel/tp_static.py) — use a 1-D data mesh "
                "or --compute_dtype bfloat16"
            )

        # per-shape auto wire resolution uses the GLOBAL tower shape; on 2-D
        # meshes tp_static re-gates per LOCAL shard geometry (a shard whose
        # non-wire route would be the bf16 whole-block kernel still runs the
        # wire if the global auto said so — documented trade, ROADMAP)
        wire = int8_wire_enabled(self.cfg)

        amax = None
        if self.calibration_path and os.path.exists(self.calibration_path):
            from clip_assisted_data_labeling_tpu.models.encoders import (
                check_calibration,
            )

            amax = load_calibration(self.calibration_path)
            check_calibration(amax, self.cfg, self.calibration_path,
                              self.model_name)
            amax.pop("_model_name", None)
            if wire and "qkv_amax" not in amax:
                amax = None  # saved without the wire scales; recalibrate
            else:
                print(f"Loaded static int8 calibration from {self.calibration_path}")
        if amax is None:
            canvas = jax.device_put(canvas_u8, self._data)
            cp = jax.device_put(crop_params, self._data)
            crops = fused_crop_resize_normalize(
                canvas, cp, out_size=self.cfg.image_size,
                parity=self.parity_preprocess, dtype=self.compute_dtype,
                mean=self.cfg.norm_mean, std=self.cfg.norm_std,
            )
            flat = crops.reshape((-1,) + crops.shape[2:])
            amax = jax.tree.map(np.asarray, vit_act_amax(
                self.params, flat, self.cfg, compute_dtype=self.compute_dtype))
            if self.calibration_path:
                save_calibration(self.calibration_path, amax, self.model_name)
                print(f"Saved static int8 calibration to {self.calibration_path}")
        if not wire:  # mirror encoders.py (resolved above)
            amax = {"act_amax": amax["act_amax"]}
        if self._dp_only:
            self.params = attach_act_amax(self.params, amax)
            self.params = jax.tree.map(
                lambda x: jax.device_put(x, self._repl), self.params
            )
            return
        # 2-D (data, model) mesh: GSPMD cannot partition the static Pallas
        # blocks, so switch to the EXPLICIT-collective TP formulation
        # (parallel/tp_static.py) — bit-identical to single-device
        # int8_static, FLOPs split over the model axis. The reorder/placement
        # gathers params to host once (fine at these scales; giant towers
        # should load pre-reordered checkpoints).
        from clip_assisted_data_labeling_tpu.parallel.tp_static import (
            place_tp_static,
        )

        host_params = jax.tree.map(np.asarray, self.params)
        host_params = attach_act_amax(host_params, amax)
        # qkv_amax (when the wire resolved on) rides into place_tp_static:
        # reorder_qkv_tp permutes it with the qkv columns and it shards
        # P(None, 'model') — _block_tp_static folds the local slice exactly
        # as the single-device wire block (bit-identity test: test_tp_static)
        self.params = place_tp_static(host_params, self.mesh, self.cfg)
        self._tp_static = True
        print(f"int8_static: explicit-collective TP over {dict(self.mesh.shape)}")

    def embed(self, canvas_u8, crop_params, stat_params=None):
        assert canvas_u8.shape[0] % self.n_devices == 0, (
            f"batch {canvas_u8.shape[0]} must divide over {self.n_devices} devices"
        )
        canvas = jax.device_put(canvas_u8, self._data)
        cp = jax.device_put(crop_params, self._data)
        if self._dp_only:
            emb_fn, stats_fn = _shard_mapped(
                self.mesh, self.cfg, self.compute_dtype, self.parity_preprocess
            )
            if stat_params is not None:
                sp = jax.device_put(stat_params, self._data)
                return stats_fn(self.params, canvas, cp, sp)
            return emb_fn(self.params, canvas, cp)
        if self._tp_static:
            # explicit-collective TP int8_static: crops (+stats) are pure
            # data-parallel GSPMD; the tower runs the shard_map TP program
            from clip_assisted_data_labeling_tpu.parallel.tp_static import (
                vit_encode_tp_static,
            )

            crops = _crops_jit(canvas, cp, self.cfg, self.compute_dtype,
                               self.parity_preprocess)
            b, n = crops.shape[:2]
            emb = vit_encode_tp_static(
                self.params, crops.reshape((b * n,) + crops.shape[2:]),
                self.cfg, self.mesh, compute_dtype=self.compute_dtype,
            ).reshape(b, n, -1)
            if stat_params is not None:
                sp = jax.device_put(stat_params, self._data)
                return emb, image_stats_batch(canvas, sp)
            return emb
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


@functools.lru_cache(maxsize=8)
def _shard_mapped(mesh: Mesh, cfg: VitConfig, compute_dtype, parity: bool):
    """jit(shard_map) DP programs: per-shard single-device bodies (Pallas-safe)."""
    from clip_assisted_data_labeling_tpu.parallel.mesh import compat_shard_map

    def body(params, canvas, cp):
        return _embed_jit(params, canvas, cp, cfg, compute_dtype, parity)

    def body_stats(params, canvas, cp, sp):
        return _embed_stats_jit(params, canvas, cp, sp, cfg, compute_dtype,
                                parity)

    emb = jax.jit(compat_shard_map(
        body, mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"), check_rep=False,
    ))
    stats = jax.jit(compat_shard_map(
        body_stats, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_rep=False,
    ))
    return emb, stats


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "parity"))
def _crops_jit(canvas_u8, crop_params, cfg, compute_dtype, parity):
    """Data-parallel crop preprocess only (the TP-static path runs the tower
    as a separate shard_map program)."""
    return fused_crop_resize_normalize(
        canvas_u8, crop_params, out_size=cfg.image_size, parity=parity,
        dtype=compute_dtype, mean=cfg.norm_mean, std=cfg.norm_std,
    )


def _family_encode_fn(cfg):
    """Per-family forward, mirroring models/encoders._encode_fn — the DP path
    embeds every registry family, not just ViTs (conv towers ride the same
    shard_map program; their convs are ordinary XLA ops)."""
    from clip_assisted_data_labeling_tpu.models.convnext import (
        CNXConfig,
        cnx_encode_image,
    )
    from clip_assisted_data_labeling_tpu.models.resnet import (
        RNConfig,
        rn_encode_image,
    )

    if isinstance(cfg, RNConfig):
        return rn_encode_image
    if isinstance(cfg, CNXConfig):
        return cnx_encode_image
    return vit_encode_image


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "parity"))
def _embed_jit(params, canvas_u8, crop_params, cfg, compute_dtype, parity):
    crops = fused_crop_resize_normalize(
        canvas_u8, crop_params, out_size=cfg.image_size, parity=parity,
        dtype=compute_dtype, mean=cfg.norm_mean, std=cfg.norm_std,
    )
    b, n = crops.shape[:2]
    emb = _family_encode_fn(cfg)(
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
