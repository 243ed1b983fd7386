"""Batched ML inference over record streams — the filter_tensorflow role
(plugins/filter_tensorflow/, TFLite inference on a record field) done the
Spark-idiomatic way: ``pyspark.ml.functions.predict_batch_udf``.

predict_batch_udf is the designated scale path for model scoring: the model
loads ONCE per executor (not per row/batch), inputs arrive as Arrow-batched
numpy arrays, and the udf pipelines with the surrounding codegen stages —
the same role the TFLite interpreter plays in the C filter, minus the
per-record msgpack decode.

Two real model paths run end-to-end here: a linear+sigmoid model with
deterministic weights, and a serialized numpy MLP (ReLU hidden + sigmoid
out) loaded from an .npz checkpoint per executor
(``make_npz_mlp_predict_fn``) — both oracle-checked score-for-score. The
TFLite loader (``make_tf_predict_fn``) has a complete invoke path but is
import-gated since no DL runtime ships in this container.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stub_weights(dim: int) -> np.ndarray:
    """Deterministic fake weights: w_i = ((i*31) % 7 - 3) / 10."""
    return ((np.arange(dim) * 31) % 7 - 3) / 10.0


def make_stub_predict_fn(dim: int):
    """Model-maker for predict_batch_udf: runs once per executor; the
    returned closure scores (batch, dim) float arrays -> sigmoid(X @ w)."""

    def make():
        # self-contained closure (no module references): survives pickling
        # to workers that don't have the package importable
        import numpy as _np

        w = ((_np.arange(dim) * 31) % 7 - 3) / 10.0

        def predict(inputs: _np.ndarray) -> _np.ndarray:
            z = inputs.astype(_np.float64) @ w
            return 1.0 / (1.0 + _np.exp(-z))

        return predict

    return make


# --------------------------------------------------------------------------
# Real serialized-model path: a numpy MLP loaded from an .npz weights file.
# This is a genuine load-weights->forward-pass pipeline through
# predict_batch_udf (model read once per executor, Arrow-batched inputs);
# the npz format stands in for a framework checkpoint since no DL runtime
# ships in this container. On a cluster, ship the file via spark.files or
# shared storage.
# --------------------------------------------------------------------------
def save_mlp_npz(path: str, layers: list[tuple[np.ndarray, np.ndarray]]) -> None:
    """Serialize [(W0, b0), (W1, b1), ...] to an npz checkpoint."""
    arrays = {}
    for i, (w, b) in enumerate(layers):
        arrays[f"W{i}"] = np.asarray(w, dtype=np.float64)
        arrays[f"b{i}"] = np.asarray(b, dtype=np.float64)
    np.savez(path, **arrays)


def mlp_weight(i: int, j: int) -> float:
    """Deterministic weight formula shared with the SQL oracle."""
    return ((i * 7 + j * 13) % 11 - 5) / 10.0


def mlp_bias(j: int) -> float:
    return ((j * 3) % 5 - 2) / 10.0


def make_demo_mlp(dim: int, hidden: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """dim -> hidden (ReLU) -> 1 (sigmoid) with deterministic weights, so an
    independent oracle can recompute every score."""
    w0 = np.array([[mlp_weight(i, j) for j in range(hidden)] for i in range(dim)])
    b0 = np.array([mlp_bias(j) for j in range(hidden)])
    w1 = np.array([[((j * 5) % 9 - 4) / 10.0] for j in range(hidden)])
    b1 = np.array([0.05])
    return [(w0, b0), (w1, b1)]


def make_npz_mlp_predict_fn(model_path: str):
    """Model-maker for predict_batch_udf: loads the npz checkpoint once per
    executor; forward pass is ReLU hidden layers + sigmoid output."""

    def make():
        import numpy as _np

        data = _np.load(model_path)
        layers = []
        i = 0
        while f"W{i}" in data:
            layers.append((data[f"W{i}"], data[f"b{i}"]))
            i += 1
        if not layers:
            raise ValueError(f"no W0/b0 arrays in {model_path}")

        def predict(inputs: _np.ndarray) -> _np.ndarray:
            x = inputs.astype(_np.float64)
            for k, (w, b) in enumerate(layers):
                x = x @ w + b
                if k < len(layers) - 1:
                    x = _np.maximum(x, 0.0)
            x = 1.0 / (1.0 + _np.exp(-x))
            return x[:, 0] if x.ndim == 2 and x.shape[1] == 1 else x

        return predict

    return make


def make_tf_predict_fn(model_path: str):  # pragma: no cover - no TF in container
    """TFLite loader for predict_batch_udf (filter_tensorflow's engine).
    Import-gated: complete invoke path when tensorflow is installed."""

    def make():
        try:
            import tensorflow as tf
        except ImportError as e:
            raise ImportError(
                "tensorflow is not installed in this environment; "
                "use make_npz_mlp_predict_fn or make_stub_predict_fn"
            ) from e
        interp = tf.lite.Interpreter(model_path=model_path)
        inp = interp.get_input_details()[0]
        outd = interp.get_output_details()[0]

        def predict(inputs: np.ndarray) -> np.ndarray:
            interp.resize_tensor_input(inp["index"], list(inputs.shape))
            interp.allocate_tensors()
            interp.set_tensor(inp["index"], inputs.astype(inp["dtype"]))
            interp.invoke()
            out = interp.get_tensor(outd["index"])
            return out[:, 0] if out.ndim == 2 and out.shape[1] == 1 else out

        return predict

    return make


def score_column(
    embedding_col: str | Column,
    dim: int,
    make_predict_fn=None,
    batch_size: int = 1024,
) -> Column:
    """Score an array<float> column with an executor-cached model."""
    from pyspark.ml.functions import predict_batch_udf

    udf = predict_batch_udf(
        make_predict_fn or make_stub_predict_fn(dim),
        return_type=T.DoubleType(),
        batch_size=batch_size,
        input_tensor_shapes=[[dim]],
    )
    col = F.col(embedding_col) if isinstance(embedding_col, str) else embedding_col
    return udf(col)


def predict_batch(
    df: DataFrame,
    embedding_col: str,
    dim: int,
    make_predict_fn=None,
    threshold: float | None = None,
    score_name: str = "score",
    batch_size: int = 1024,
) -> DataFrame:
    """Attach a model score (and optional thresholded ``predicted`` flag).

    One narrow transformation — no shuffle, no collect; at 100 TB this is
    scan -> Arrow batch -> model -> scan-side projection, parallel per
    input partition.
    """
    out = df.withColumn(
        score_name,
        score_column(embedding_col, dim, make_predict_fn, batch_size=batch_size),
    )
    if threshold is not None:
        out = out.withColumn("predicted", F.col(score_name) > F.lit(threshold))
    return out
