"""Streaming sources.

- tail_source: the in_tail analog (plugins/in_tail/, ~7.7k LoC of glob
  scanning, rotation tracking, SQLite offset DB). In Spark the whole
  mechanism collapses to a file stream: glob discovery per micro-batch,
  offsets in the checkpoint, `maxFilesPerTrigger` as the rotation-scale
  valve, `input_file_name()` for the per-file context the reference keeps
  in its file state.
- dummy_source: in_dummy/in_random (synthetic records at a rate).
- kafka passthrough: in_kafka/out_kafka are native Spark connectors; the
  helper just standardizes the event envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.model import TAG_COL, TS_COL


def tail_source(
    spark: SparkSession,
    path_glob: str,
    fmt: str = "text",
    schema: T.StructType | str | None = None,
    tag_template: str = "tail.0",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-tail stream: each discovered file's lines/records become tagged
    events; `file` column carries the origin path (tail_file.c keeps this
    in per-file state)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "text":
        reader = reader.schema("value string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.format(fmt).load(path_glob)
    return (
        df.withColumn("file", F.input_file_name())
        .withColumn(TAG_COL, F.lit(tag_template))
        .withColumn(TS_COL, F.current_timestamp())
    )


def dummy_source(
    spark: SparkSession, rows_per_second: int = 10, tag: str = "dummy.0"
) -> DataFrame:
    """in_dummy analog: rate source re-shaped into the event envelope."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.lit(tag).alias(TAG_COL),
            F.col("timestamp").alias(TS_COL),
            F.col("value").alias("seq"),
        )
    )


def kafka_source(
    spark: SparkSession, bootstrap: str, topics: str, tag_from_topic: bool = True
) -> DataFrame:  # pragma: no cover - no broker in test env
    """in_kafka analog (plugins/in_kafka/): native connector, topic -> tag."""
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .load()
    )
    tag = F.col("topic") if tag_from_topic else F.lit("kafka.0")
    return df.select(
        tag.alias(TAG_COL),
        F.col("timestamp").alias(TS_COL),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
