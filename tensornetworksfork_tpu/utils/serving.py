"""AOT serving exports: compile a trained model to a self-contained,
batch-polymorphic StableHLO artifact (`jax.export`) that serves WITHOUT any
framework or model code — params are baked in as constants, and one blob can
target several platforms (cpu + tpu).

The reference has no serving story (inference re-runs the torch module
graph, models/tensor_train.py:219-236); this is the TPU-native production
counterpart: export once after training, ship the blob, and any JAX runtime
(or IFRT proxy) executes it. Classification artifacts reproduce the full
predict semantics — bias feature appended, zero logit appended to the C-1
model outputs (reference AAMNST.py:178 / models/tensor_train.py:261).

    blob = export_estimator(reg)                      # trained estimator
    f = load_forward(blob)                            # anywhere, later
    probs = f(X)                                      # any batch size

`export_forward` is the layer-level variant for raw TNLayer / SumLayer
models (inputs are whatever the layer's __call__ takes, e.g. patch tensors
for conv-TT image models).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport


def _serving_fn(model, classification: bool, add_bias: bool):
    """The traced serving computation: model forward (+ bias column, + the
    appended zero logit for classification)."""

    def fn(x):
        if add_bias:
            x = jnp.concatenate(
                [x, jnp.ones((x.shape[0], 1), dtype=x.dtype)], axis=1)
        y = model(x)
        if classification:
            y = jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1)
        return y

    return fn


def export_forward(model, feature_shape: Sequence[int], *,
                   classification: bool = False, add_bias: bool = False,
                   dtype=jnp.float32,
                   platforms: Optional[Tuple[str, ...]] = ("cpu", "tpu"),
                   batch_polymorphic: bool = True) -> bytes:
    """Export a trained TNLayer/SumLayer to a serialized StableHLO blob.

    feature_shape: the per-sample input shape, i.e. x.shape[1:] of what the
    model's __call__ takes (features for tabular TT, (patches, patch_pixels)
    for conv-TT). The batch dim is symbolic when batch_polymorphic (serve
    any batch size with one artifact); otherwise pass the fixed batch size
    as the first entry of feature_shape and it is used verbatim.
    """
    fn = _serving_fn(model, classification, add_bias)
    if batch_polymorphic:
        b, = jexport.symbolic_shape("b")
        aval = jax.ShapeDtypeStruct((b, *feature_shape), dtype)
    else:
        aval = jax.ShapeDtypeStruct(tuple(feature_shape), dtype)
    exp = jexport.export(jax.jit(fn), platforms=platforms)(aval)
    return exp.serialize()


def export_estimator(reg, *, platforms: Optional[Tuple[str, ...]] =
                     ("cpu", "tpu"), batch_polymorphic: bool = True) -> bytes:
    """Export a FITTED TensorTrainRegressor-style estimator: the artifact
    takes raw (B, n_features) rows and reproduces estimator.predict —
    bias column appended, zero logit appended for classification."""
    if getattr(reg, "_model", None) is None or reg.input_dim is None:
        raise ValueError("estimator must be fitted before export")
    return export_forward(
        reg._model, (reg.input_dim - 1,),  # input_dim counts the bias column
        classification=(reg.task == "classification"), add_bias=True,
        dtype=reg.dtype, platforms=platforms,
        batch_polymorphic=batch_polymorphic)


def load_forward(blob: Union[bytes, str]):
    """Deserialize a serving blob (bytes, or a path to one) into a callable.
    Needs only jax at serve time — no framework/model code, no params."""
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exp = jexport.deserialize(blob)
    # jit the exported call ONCE: exp.call alone re-traces per invocation
    # (measured 612 ms/chunk vs 5.9 jitted at the flagship forward — the
    # artifact itself is already compiled code, the retrace was pure
    # dispatch overhead)
    call = jax.jit(exp.call)

    def fn(x):
        # device arrays pass through untouched: np.asarray on a jax.Array
        # would force a device->host->device round-trip of the whole batch
        # per call (measured 380 ms/chunk vs 6 through the tunnel)
        return call(x if isinstance(x, jax.Array) else jnp.asarray(x))

    fn.platforms = exp.platforms
    return fn


def save_forward(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)
