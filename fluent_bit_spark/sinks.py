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


def gelf_line(
    df: DataFrame,
    short_message_key: str = "short_message",
    host_key: str = "host",
    timestamp_key: str = "timestamp",
    level_key: str = "level",
) -> Column:
    """GELF 1.1 encoder (src/flb_pack_gelf.c:415-470): version/host/
    timestamp(epoch sec)/level/short_message are promoted from their
    configured source keys; every other record key becomes an
    underscore-prefixed additional field (flb_pack_gelf.c:70)."""
    fields = [F.lit("1.1").alias("version")]
    promoted = {host_key: "host", level_key: "level", short_message_key: "short_message"}
    if host_key in df.columns:
        fields.append(F.col(host_key).cast("string").alias("host"))
    if timestamp_key in df.columns:
        fields.append(F.col(timestamp_key).cast("double").alias("timestamp"))
        promoted[timestamp_key] = "timestamp"
    if level_key in df.columns:
        fields.append(F.col(level_key).alias("level"))
    if short_message_key in df.columns:
        fields.append(F.col(short_message_key).cast("string").alias("short_message"))
    for c in df.columns:
        if c not in promoted:
            fields.append(F.col(c).alias(f"_{c}"))
    return F.to_json(F.struct(*fields))


def loki_streams(
    df: DataFrame,
    label_keys: list[str],
    line_col: str = "msg",
    ts_col: str = "timestamp",
) -> DataFrame:
    """out_loki stream shaping (plugins/out_loki/): group records by their
    label set into Loki push-API streams — (labels map, values array of
    (epoch_ns, line)), values time-ordered. One shuffle on the label set;
    a foreachBatch HTTP push consumes this frame directly."""
    entries = []
    for k in label_keys:
        entries.extend([F.lit(k), F.col(k).cast("string")])
    # exact epoch-ns: micros*1000 stays integral (a double round-trip loses
    # precision past 2^53 ns ≈ 2255-03); kept LONG inside the sort struct so
    # ordering is numeric, stringified only at the end for the push payload
    ns = F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000).cast("long")
    return (
        df.select(
            F.create_map(*entries).alias("stream"),
            F.struct(ns.alias("ts"), F.col(line_col).cast("string").alias("line")).alias("v"),
        )
        .groupBy("stream")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("v")),
                lambda s: F.array(s.getField("ts").cast("string"), s.getField("line")),
            ).alias("values")
        )
    )


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
    """out_file analog. fmt: json | csv | parquet | ltsv | plain | template
    | gelf.

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
    elif fmt == "gelf":
        keep = [TAG_COL] if partition_by_tag and TAG_COL in df.columns else []
        writer_df = df.select(*keep, gelf_line(df, **options.pop("gelf_keys", {})).alias("value"))
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


def prometheus_exposition(
    df: DataFrame,
    name_col: str = "metric_name",
    type_col: str = "metric_type",
    label_cols: list[str] | None = None,
    value_col: str = "value",
    add_labels: dict[str, str] | None = None,
    value_fmt: str = "double",
) -> DataFrame:
    """out_prometheus_exporter text page (plugins/out_prometheus_exporter/
    prom.c; rendering per the public Prometheus exposition format that the
    cmetrics encoder emits): one ``# TYPE name type`` header per metric
    plus ``name{k="v",...} value`` sample lines. ``add_labels`` mirrors the
    plugin's add_label config (static labels appended to every sample).
    Label values get the spec's escaping (backslash, quote, newline).
    ``value_fmt='long'`` renders integral counters without a decimal tail
    so the text is engine-portable.

    Returns (kind, ord, line): kind 0 = header, 1 = sample; ``ord`` orders
    samples under their header for page assembly. Pure expressions —
    map-side only until the tiny per-metric-name header distinct."""
    labels = list(label_cols or [])
    statics = sorted((add_labels or {}).items())

    def esc(c):
        return F.regexp_replace(
            F.regexp_replace(F.regexp_replace(c.cast("string"), r"\\", r"\\\\"), '"', '\\\\"'),
            "\n", r"\\n",
        )

    parts = []
    for k in labels:
        parts.append(F.concat(F.lit(f'{k}="'), esc(F.col(k)), F.lit('"')))
    for k, v in statics:
        parts.append(F.lit(f'{k}="{v}"'))
    labelset = (
        F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}")) if parts else F.lit("")
    )
    val = (
        F.col(value_col).cast("long").cast("string")
        if value_fmt == "long"
        else F.col(value_col).cast("double").cast("string")
    )
    samples = df.select(
        F.lit(1).alias("kind"),
        F.col(name_col).alias("__n"),
        F.concat(F.col(name_col), labelset, F.lit(" "), val).alias("line"),
    )
    headers = (
        df.select(F.col(name_col).alias("__n"), F.col(type_col).alias("__t"))
        .distinct()
        .select(
            F.lit(0).alias("kind"),
            "__n",
            F.concat(F.lit("# TYPE "), F.col("__n"), F.lit(" "), F.col("__t")).alias("line"),
        )
    )
    return headers.unionByName(samples).select(
        "kind", F.col("__n").alias("metric"), "line"
    )


def flowcounter(
    df: DataFrame,
    ts_col: str = "timestamp",
    unit: str = "minute",
    size_col: Column | None = None,
) -> DataFrame:
    """out_flowcounter: per-interval record/byte throughput counters
    (plugins/out_flowcounter/out_flowcounter.c:100-116 output_fcount):
    ``counts``, ``bytes``, ``counts/<unit>`` and ``bytes/<unit>`` (integer
    division by the tick length), keyed by the interval's ``until`` epoch.

    The reference buckets by *processing* wall-clock anchored at startup
    (configure() base=time(NULL)); a distributed engine buckets by event
    time on epoch-aligned tumbling windows — same tick widths, deterministic
    placement. ``bytes`` counts the serialized record: pass ``size_col``
    (e.g. octet_length of the raw line) or default to the JSON-encoded row
    size, mirroring the msgpack event size the reference accumulates
    (out_flowcounter.c:119-125 count_up).

    One shuffle on (window) — time-uniform key, scale-safe.
    """
    ticks = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    if unit not in ticks:
        raise ValueError(f"unit must be one of {sorted(ticks)}, got {unit!r}")
    tick = ticks[unit]
    size = size_col if size_col is not None else F.octet_length(F.to_json(F.struct(*df.columns)))
    w = F.window(F.col(ts_col).cast("timestamp"), f"{tick} seconds")
    out = (
        df.groupBy(w.alias("__w"))
        .agg(F.count(F.lit(1)).alias("counts"), F.sum(size).cast("long").alias("bytes"))
        .select(
            F.unix_seconds(F.col("__w.end")).alias("until"),
            "counts",
            "bytes",
            (F.col("counts") / F.lit(tick)).cast("long").alias(f"counts_per_{unit}"),
            (F.col("bytes") / F.lit(tick)).cast("long").alias(f"bytes_per_{unit}"),
        )
    )
    return out
