"""Batched ML inference over record streams — the filter_tensorflow role
(plugins/filter_tensorflow/, TFLite inference on a record field) done the
Spark-idiomatic way: ``pyspark.ml.functions.predict_batch_udf``.

predict_batch_udf is the designated scale path for model scoring: the model
loads ONCE per executor (not per row/batch), inputs arrive as Arrow-batched
numpy arrays, and the udf pipelines with the surrounding codegen stages —
the same role the TFLite interpreter plays in the C filter, minus the
per-record msgpack decode.

No deep-learning runtime ships in this container, so the default model is a
deterministic linear+sigmoid stub (weights derived from the feature index)
— the *plumbing* (executor-cached model, tensor batching, threshold
classify) is real and oracle-checked; swap ``make_predict_fn`` for a real
framework loader (the import-try below shows the TF shape).
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


def make_tf_predict_fn(model_path: str):  # pragma: no cover - no TF in container
    """The real-framework shape (kept import-gated; raises without TF)."""

    def make():
        try:
            import tensorflow as tf  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "tensorflow is not installed in this environment; "
                "use make_stub_predict_fn or install a runtime"
            ) from e
        interp = tf.lite.Interpreter(model_path=model_path)
        interp.allocate_tensors()

        def predict(inputs: np.ndarray) -> np.ndarray:
            raise NotImplementedError("wire interp invoke here")

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
