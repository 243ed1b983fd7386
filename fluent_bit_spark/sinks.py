"""Sinks: the out_* plugin surface re-expressed as writers.

Reference formats (plugins/out_file/file.c:472-579): json / csv / ltsv /
plain / msgpack / per-record template. Parquet replaces msgpack as the
binary columnar format (msgpack is an implementation detail of the C
engine, not a capability). Tag-partitioned writes reproduce out_s3's
'$TAG in the key template' (plugins/out_s3/) via partitionBy — one pass
writes every route.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.model import TAG_COL


def ltsv_line(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Encode columns as an LTSV line (out_file ltsv format)."""
    cols = cols or df.columns
    parts = [F.concat(F.lit(f"{c}:"), F.col(c).cast("string")) for c in cols]
    return F.concat_ws("\t", *parts)


def template_line(df: DataFrame, template: str) -> Column:
    """out_file 'template' format: '{key}' placeholders per record."""
    import re

    out: list[Column] = []
    pos = 0
    for m in re.finditer(r"\{([A-Za-z_][A-Za-z0-9_]*)\}", template):
        if m.start() > pos:
            out.append(F.lit(template[pos : m.start()]))
        out.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        out.append(F.lit(template[pos:]))
    return F.concat(*out)


def write_file(
    df: DataFrame,
    path: str,
    fmt: str = "json",
    mode: str = "overwrite",
    partition_by_tag: bool = False,
    compression: str | None = None,
    template: str | None = None,
    **options,
) -> None:
    """out_file analog. fmt: json | csv | parquet | ltsv | plain | template.

    partition_by_tag=True writes tag=<value>/ directories — the router +
    out_s3 $TAG-key pattern as a single partitioned write.
    """
    writer_df = df
    fmt = fmt.lower()
    if fmt == "ltsv":
        keep = [TAG_COL] if partition_by_tag and TAG_COL in df.columns else []
        writer_df = df.select(*keep, ltsv_line(df).alias("value"))
        fmt = "text"
    elif fmt == "template":
        if not template:
            raise ValueError("template format needs template=")
        keep = [TAG_COL] if partition_by_tag and TAG_COL in df.columns else []
        writer_df = df.select(*keep, template_line(df, template).alias("value"))
        fmt = "text"
    elif fmt == "plain":
        keep = [TAG_COL] if partition_by_tag and TAG_COL in df.columns else []
        writer_df = df.select(*keep, F.to_json(F.struct(*df.columns)).alias("value"))
        fmt = "text"

    w = writer_df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)  # gzip/snappy/zstd (flb_gzip.c etc.)
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by_tag and TAG_COL in writer_df.columns:
        w = w.partitionBy(TAG_COL)
    w.format(fmt).save(path)


def stream_sink(
    sdf: DataFrame,
    path: str,
    fmt: str = "parquet",
    checkpoint: str | None = None,
    trigger_once: bool = False,
    **options,
):
    """Streaming writer with checkpointing (the chunkio/retry machinery of
    the reference collapses into Spark's checkpoint + exactly-once file
    sink)."""
    w = sdf.writeStream.format(fmt).option("path", path)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    for k, v in options.items():
        w = w.option(k, v)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
