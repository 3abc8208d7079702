"""SimpleFC label regressor — jitted JAX train/eval replacing utils/nn_model.py.

The reference model (utils/nn_model.py:6-41) is a Linear stack with LeakyReLU +
Dropout between layers and a final Sigmoid (labels normalized to [0,1]), saved as a
*whole-module torch pickle* that self-describes its feature recipe via attributes
(clip_models, crop_names, use_img_stat_features, data_min/max — consumed at
_5_predict_labels.py:107-111 and utils/embedder.py:290-296).

Here the network is a pure function over a param pytree; the self-describing
checkpoint becomes an explicit ``RegressorMeta`` JSON stored alongside the params
in one ``.npz`` (no pickled code). For interop, ``load_torch_pickle`` can ingest
the reference's own ``.pth`` module pickles (including the shipped
``single_crop_regression_9.4k_imgs_80_epochs.pth``) by shimming the
``utils.nn_model`` module path and harvesting the Linear weights + metadata.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


@dataclasses.dataclass
class RegressorMeta:
    clip_models: tuple
    crop_names: tuple
    input_size: int
    hidden_sizes: tuple
    output_size: int = 1
    use_img_stat_features: bool = False
    dropout_prob: float = 0.0
    data_min: float | None = None
    data_max: float | None = None
    # classification mode (reference README TODO: "class labels +
    # classification"): the sorted distinct label values seen at training
    # time; the network ends in C logits and predicted scores are the
    # softmax-expected label value — staying inside the CSV contract
    # (predicted_label is a float in label units) so sort/subset/preview
    # downstream work unchanged. None = regression (sigmoid head).
    class_values: tuple | None = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "RegressorMeta":
        d = json.loads(s)
        d["clip_models"] = tuple(d["clip_models"])
        d["crop_names"] = tuple(d["crop_names"])
        d["hidden_sizes"] = tuple(d["hidden_sizes"])
        if d.get("class_values") is not None:
            d["class_values"] = tuple(d["class_values"])
        return cls(**d)


def init_regressor_params(
    key: jax.Array, input_size: int, hidden_sizes: Sequence[int], output_size: int = 1
) -> list[dict]:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    sizes = [input_size, *hidden_sizes, output_size]
    params = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(sizes[i])
        params.append(
            {
                "kernel": jax.random.uniform(
                    k1, (sizes[i], sizes[i + 1]), minval=-bound, maxval=bound
                ),
                "bias": jax.random.uniform(
                    k2, (sizes[i + 1],), minval=-bound, maxval=bound
                ),
            }
        )
    return params


def regressor_apply(
    params: list[dict],
    x: jnp.ndarray,
    *,
    dropout_prob: float = 0.0,
    dropout_key: jax.Array | None = None,
    head: str = "sigmoid",  # 'sigmoid' (regression) | 'linear' (class logits)
) -> jnp.ndarray:
    """Forward pass → sigmoid outputs in [0,1]. Dropout only when a key is given.

    Matmuls run at full f32 precision: the network is tiny and score parity with
    the reference matters more than speed (XLA CPU's oneDNN and TPU's default
    precision would otherwise use a reduced-precision fast path).
    """
    n = len(params)
    for i, layer in enumerate(params):
        x = jnp.matmul(x, layer["kernel"], precision=jax.lax.Precision.HIGHEST)
        x = x + layer["bias"]
        if i < n - 1:
            x = jnp.where(x >= 0, x, LEAKY_SLOPE * x)
            if dropout_key is not None and dropout_prob > 0.0:
                dropout_key, sub = jax.random.split(dropout_key)
                keep = jax.random.bernoulli(sub, 1.0 - dropout_prob, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout_prob), 0.0)
    return x if head == "linear" else jax.nn.sigmoid(x)


class SimpleFCRegressor:
    """Param pytree + metadata bundle with save/load and batched predict."""

    def __init__(self, params: list[dict], meta: RegressorMeta):
        self.params = params
        self.meta = meta

    @classmethod
    def create(cls, key: jax.Array, meta: RegressorMeta) -> "SimpleFCRegressor":
        return cls(
            init_regressor_params(key, meta.input_size, meta.hidden_sizes, meta.output_size),
            meta,
        )

    def describe(self) -> str:
        """Network layout listing (reference ``--print_network_layout``: SimpleFC
        verbose prints the torch module repr, utils/nn_model.py:35-36)."""
        m = self.meta
        sizes = [m.input_size, *m.hidden_sizes, m.output_size]
        lines = ["SimpleFCRegressor("]
        for i in range(len(sizes) - 1):
            lines.append(f"  Linear(in_features={sizes[i]}, out_features={sizes[i + 1]})")
            if i < len(sizes) - 2:
                lines.append(f"  LeakyReLU(negative_slope={LEAKY_SLOPE})")
                lines.append(f"  Dropout(p={m.dropout_prob})")
        if m.class_values is not None:
            lines.append(f"  Softmax(classes={list(m.class_values)})")
        else:
            lines.append("  Sigmoid()")
        lines.append(")")
        n_params = sum(
            int(np.prod(p["kernel"].shape)) + int(np.prod(p["bias"].shape)) for p in self.params
        )
        lines.append(
            f"clip_models={list(m.clip_models)} crop_names={list(m.crop_names)} "
            f"img_stats={m.use_img_stat_features} params={n_params:,}"
        )
        return "\n".join(lines)

    # --- prediction -----------------------------------------------------------
    def predict(self, features: np.ndarray, batch_size: int = 65536,
                wire: str = "float32") -> np.ndarray:
        """Batched inference; the chunk size only bounds device memory (the
        network is tiny), so it is large to amortize dispatch/transfer.

        ``wire`` is the host→device format for the feature matrix. The
        default is the exact f32 wire (library callers and parity tests);
        the predict *stage* passes ``float16``, halving the H2D transfer it
        is bound by on thin links (BENCH_NOTES: 99.96% of predict wall time
        is H2D on this tunnel). ``int8`` halves it again (per-row symmetric
        quantization, F + 4 bytes/row): scores move ~1e-3 in [0,1] score
        space on CLIP-feature inputs (tests/test_regressor.py) — opt-in
        where transfer dominates. Matmuls still run f32 on device. A batch
        holding values outside fp16 range / non-finite values silently falls
        back to the f32 wire."""
        if len(features) == 0:
            return np.zeros((0,), np.float32)
        cvals = self.meta.class_values
        cvals_dev = None if cvals is None else jnp.asarray(cvals, jnp.float32)
        outs = []
        for i in range(0, len(features), batch_size):
            x_host = np.asarray(features[i : i + batch_size], np.float32)
            q8 = quantize_feature_rows(x_host) if wire == "int8" else None
            if q8 is not None:
                xq, scale = jnp.asarray(q8[0]), jnp.asarray(q8[1])
                if cvals_dev is None:
                    outs.append(np.asarray(
                        _predict_q8_jit(_as_tuple(self.params), xq, scale)))
                else:
                    outs.append(np.asarray(_predict_expected_q8_jit(
                        _as_tuple(self.params), xq, scale, cvals_dev)))
                continue
            if wire == "float16" and np.abs(x_host).max(initial=0.0) <= 6.0e4:
                x = jnp.asarray(x_host.astype(np.float16))
            else:  # exact wire; also the NaN path (NaN fails the <= check)
                x = jnp.asarray(x_host)
            if cvals_dev is None:
                outs.append(np.asarray(_predict_jit(_as_tuple(self.params), x)))
            else:  # classification: softmax-expected label value
                outs.append(np.asarray(
                    _predict_expected_jit(_as_tuple(self.params), x, cvals_dev)
                ))
        return np.concatenate(outs, axis=0).reshape(len(features), -1)[:, 0]

    def predict_classes(self, features: np.ndarray,
                        batch_size: int = 65536) -> np.ndarray:
        """Classification models only: argmax class label values [N]."""
        if self.meta.class_values is None:
            raise ValueError("predict_classes requires a classification model")
        cvals = np.asarray(self.meta.class_values, np.float32)
        outs = []
        for i in range(0, len(features), batch_size):
            x = jnp.asarray(np.asarray(features[i : i + batch_size], np.float32))
            logits = np.asarray(_predict_logits_jit(_as_tuple(self.params), x))
            outs.append(cvals[np.argmax(logits, axis=-1)])
        return np.concatenate(outs) if outs else np.zeros((0,), np.float32)

    # --- native checkpoint format ---------------------------------------------
    def save(self, path: str) -> None:
        flat = {"__meta__": np.array(self.meta.to_json())}
        for i, layer in enumerate(self.params):
            flat[f"layer{i}/kernel"] = np.asarray(layer["kernel"], np.float32)
            flat[f"layer{i}/bias"] = np.asarray(layer["bias"], np.float32)
        np.savez(path, **flat)

    @classmethod
    def load(cls, path: str) -> "SimpleFCRegressor":
        data = np.load(path, allow_pickle=False)
        meta = RegressorMeta.from_json(str(data["__meta__"]))
        params = []
        i = 0
        while f"layer{i}/kernel" in data.files:
            params.append(
                {
                    "kernel": jnp.asarray(data[f"layer{i}/kernel"]),
                    "bias": jnp.asarray(data[f"layer{i}/bias"]),
                }
            )
            i += 1
        return cls(params, meta)

    # --- reference torch-pickle interop ----------------------------------------
    @classmethod
    def load_torch_pickle(cls, path: str) -> "SimpleFCRegressor":
        """Load a reference whole-module pickle (_4_train_model.py:237). The pickle
        references the class path ``utils.nn_model.SimpleFC``; we install a shim
        module so unpickling succeeds, then harvest Linear weights + metadata."""
        import torch

        _install_nn_model_shim()
        module = torch.load(path, map_location="cpu", weights_only=False)
        linears = [m for m in module.layers if isinstance(m, torch.nn.Linear)]
        params = [
            {
                "kernel": jnp.asarray(l.weight.detach().numpy().T),
                "bias": jnp.asarray(l.bias.detach().numpy()),
            }
            for l in linears
        ]
        meta = RegressorMeta(
            clip_models=tuple(getattr(module, "clip_models", ())),
            crop_names=tuple(getattr(module, "crop_names", ())),
            input_size=int(linears[0].weight.shape[1]),
            hidden_sizes=tuple(int(l.weight.shape[0]) for l in linears[:-1]),
            output_size=int(linears[-1].weight.shape[0]),
            use_img_stat_features=bool(getattr(module, "use_img_stat_features", False)),
            data_min=_maybe_float(getattr(module, "data_min", None)),
            data_max=_maybe_float(getattr(module, "data_max", None)),
        )
        return cls(params, meta)

    def save_torch_pickle(self, path: str) -> None:
        """Export as a reference-compatible whole-module pickle: the exact
        ``utils.nn_model.SimpleFC`` layer structure (Linear + LeakyReLU +
        Dropout per hidden layer, final Linear, Sigmoid — utils/nn_model.py:
        6-41) with the self-describing attributes _5_predict_labels.py:107-111
        consumes. Pickle stores classes by qualified name, so the shimmed
        ``utils.nn_model.SimpleFC`` written here resolves to the reference's
        real class when loaded in the reference environment — models trained
        in this framework flow back into the reference toolchain unchanged."""
        if self.meta.class_values is not None:
            raise ValueError(
                "torch export is regression-only: the reference's SimpleFC "
                "(utils/nn_model.py:6-41) ends in Sigmoid and its predictor "
                "treats the output as one score — a C-logit classification "
                "head would be silently misread there"
            )
        import torch

        shim = _install_nn_model_shim()
        m = self.meta
        mod = shim.SimpleFC()
        mod.clip_models = list(m.clip_models)
        mod.crop_names = list(m.crop_names)
        mod.use_img_stat_features = m.use_img_stat_features
        mod.data_min, mod.data_max = m.data_min, m.data_max
        layers = []
        n = len(self.params)
        for i, p in enumerate(self.params):
            k = np.asarray(p["kernel"], np.float32)
            lin = torch.nn.Linear(k.shape[0], k.shape[1])
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(k.T.copy()))
                lin.bias.copy_(torch.from_numpy(np.array(p["bias"], np.float32)))
            layers.append(lin)
            if i < n - 1:
                layers.append(torch.nn.LeakyReLU())
                layers.append(torch.nn.Dropout(p=m.dropout_prob))
        layers.append(torch.nn.Sigmoid())
        mod.layers = torch.nn.ModuleList(layers)
        mod.eval()
        torch.save(mod, path)


def _install_nn_model_shim():
    """Register a ``utils.nn_model`` stand-in so reference module pickles can
    be read (classes resolved by name at unpickle) AND written (classes saved
    by name at pickle; ``__module__``/``__qualname__`` are pinned so torch.save
    emits references to ``utils.nn_model.SimpleFC``, which resolve to the real
    class inside the reference environment). Returns the shim module."""
    import sys
    import types

    import torch

    if "utils.nn_model" not in sys.modules:
        shim_pkg = sys.modules.setdefault("utils", types.ModuleType("utils"))
        shim = types.ModuleType("utils.nn_model")

        class SimpleFC(torch.nn.Module):  # populated by (un)pickling
            def forward(self, x):  # reference semantics (utils/nn_model.py:38-41)
                for layer in self.layers:
                    x = layer(x)
                return x

        class SimpleconvFC(torch.nn.Module):
            pass

        for klass in (SimpleFC, SimpleconvFC):
            klass.__module__ = "utils.nn_model"
            klass.__qualname__ = klass.__name__
        shim.SimpleFC = SimpleFC
        shim.SimpleconvFC = SimpleconvFC
        shim.device = torch.device("cpu")
        sys.modules["utils.nn_model"] = shim
        shim_pkg.nn_model = shim
    return sys.modules["utils.nn_model"]


def _maybe_float(x):
    if x is None:
        return None
    try:
        return float(x)
    except (TypeError, ValueError):
        return None


def _as_tuple(params: list[dict]):
    return tuple((l["kernel"], l["bias"]) for l in params)


@jax.jit
def _predict_jit(param_tuple, x):
    params = [{"kernel": k, "bias": b} for k, b in param_tuple]
    # upcast on device: the wire may be fp16 (predict's transfer-bound default)
    return regressor_apply(params, x.astype(jnp.float32))


def quantize_feature_rows(x_host: np.ndarray):
    """Per-row symmetric int8 quantization of a feature matrix (the int8
    H2D wire): returns (int8 [N, F], f32 row scales [N, 1]), or None when
    the batch holds non-finite values (caller falls back to the f32 wire).
    Wire bytes per row: F + 4 vs 2·F for fp16 — another ~2× on the
    transfer-bound predict stage. Delegates to the dedup wire's quantizer
    (ops/similarity.quantize_rows_int8 — ONE rounding/guard scheme for
    every int8 host wire; its 1e-8 amax clamp also covers denormal rows)."""
    if not np.isfinite(x_host).all():
        return None
    from clip_assisted_data_labeling_tpu.ops.similarity import (
        quantize_rows_int8,
    )

    xq, scale = quantize_rows_int8(x_host)
    return xq, scale[:, None]


@jax.jit
def _predict_q8_jit(param_tuple, xq, scale):
    params = [{"kernel": k, "bias": b} for k, b in param_tuple]
    return regressor_apply(params, xq.astype(jnp.float32) * scale)


@jax.jit
def _predict_expected_q8_jit(param_tuple, xq, scale, class_values):
    params = [{"kernel": k, "bias": b} for k, b in param_tuple]
    logits = regressor_apply(params, xq.astype(jnp.float32) * scale,
                             head="linear")
    probs = jax.nn.softmax(logits, axis=-1)
    return (probs @ class_values)[:, None]


@jax.jit
def _predict_logits_jit(param_tuple, x):
    params = [{"kernel": k, "bias": b} for k, b in param_tuple]
    return regressor_apply(params, x.astype(jnp.float32), head="linear")


@jax.jit
def _predict_expected_jit(param_tuple, x, class_values):
    """Classification scores: softmax over C logits @ class label values."""
    params = [{"kernel": k, "bias": b} for k, b in param_tuple]
    logits = regressor_apply(params, x.astype(jnp.float32), head="linear")
    probs = jax.nn.softmax(logits, axis=-1)
    return (probs @ class_values)[:, None]
