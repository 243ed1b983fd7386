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
from pyspark.sql import types as T

from fluent_bit_spark.functions import timefmt as _tf
from fluent_bit_spark.model import TAG_COL, TS_COL


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
        # coalesce: F.concat is null-intolerant — one NULL placeholder
        # would otherwise NULL the whole line and silently drop the
        # record (the ltsv/gelf/syslog encoders all guard this way)
        out.append(F.coalesce(F.col(m.group(1)).cast("string"), F.lit("")))
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


def s3_object_keys(
    df: DataFrame,
    key_format: str = "/$TAG",
    tag_col: str = TAG_COL,
    ts_col: str = TS_COL,
) -> DataFrame:
    """out_s3 S3_Key_Format analog (plugins/out_s3/s3.c flb_get_s3_key):
    ``$TAG``/``$TAG[n]`` + strftime tokens expand per record into an
    ``s3_key`` column. The uploader groups by it; ``write_s3`` below maps
    each distinct key to a partition directory in one pass."""
    from fluent_bit_spark.accessor import tag_template

    return df.withColumn("s3_key", tag_template(key_format, tag_col, ts_col))


def write_s3(
    df: DataFrame,
    path: str,
    key_format: str = "/$TAG",
    fmt: str = "json",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """out_s3 with a key template: one partitioned write, distinct expanded
    keys become ``s3_key=<value>/`` directories (Spark's layout for the
    reference's per-key objects — no per-key driver loop, scale-safe)."""
    keyed = s3_object_keys(df, key_format)
    w = keyed.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.partitionBy("s3_key").format(fmt).save(path)


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

    Returns (kind, metric, line): kind 0 = header, 1 = sample; sorting by
    (metric, kind) places each header above its samples for page
    assembly. Pure expressions — map-side only until the tiny
    per-metric-name header distinct."""
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


# --------------------------------------------------------------------------
# out_syslog — RFC5424 / RFC3164 message encode
# --------------------------------------------------------------------------
# plugins/out_syslog/syslog.c:62-103 name tables (case-insensitive lookup at
# syslog.c:729,761); single-digit severity and 1-2-digit facility numerics
# accepted verbatim (syslog.c:722-757).
_SYSLOG_SEVERITY = {
    "emerg": 0, "alert": 1, "crit": 2, "err": 3,
    "warning": 4, "notice": 5, "info": 6, "debug": 7,
}
_SYSLOG_FACILITY = {
    "kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4, "syslog": 5,
    "lpr": 6, "news": 7, "uucp": 8, "cron": 9, "authpriv": 10, "ftp": 11,
    "ntp": 12, "security": 13, "console": 14, "local0": 16, "local1": 17,
    "local2": 18, "local3": 19, "local4": 20, "local5": 21, "local6": 22,
    "local7": 23,
}


def _syslog_name_lookup(col: Column, table: dict) -> Column:
    m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
    return F.element_at(m, F.lower(F.trim(col.cast("string"))))


def syslog_severity_num(col: Column) -> Column:
    s = F.trim(col.cast("string"))
    return F.when(s.rlike("^[0-7]$"), s.cast("int")).otherwise(
        _syslog_name_lookup(col, _SYSLOG_SEVERITY)
    )


def syslog_facility_num(col: Column) -> Column:
    s = F.trim(col.cast("string"))
    two = F.when(s.cast("int") <= 23, s.cast("int"))
    return (
        F.when(s.rlike("^[0-9]$"), s.cast("int"))
        .when(s.rlike("^[0-2][0-9]$"), two)
        .otherwise(_syslog_name_lookup(col, _SYSLOG_FACILITY))
    )


# SD-NAME chars: printable US-ASCII except '=', SP, ']', '"'
# (rfc5424_sp_name table, syslog.c:210-227); invalid bytes become '_'.
_SD_NAME_INVALID = r"[^!#-<>-\\^-~]"


def _sd_escape_value(c: Column) -> Column:
    # '"', '\', ']' get a backslash prefix (rfc5424_sp_value, syslog.c:190)
    return F.regexp_replace(c.cast("string"), r'([\\"\]])', r"\\$1")


def syslog_encode(
    df: DataFrame,
    format: str = "rfc5424",
    ts_col: str = "timestamp",
    message_key: str | None = "message",
    hostname_key: str | None = None,
    appname_key: str | None = None,
    procid_key: str | None = None,
    msgid_key: str | None = None,
    sd_keys: list[str] | None = None,
    severity_key: str | None = None,
    facility_key: str | None = None,
    severity_preset: int = 6,
    facility_preset: int = 1,
    maxsize: int | None = None,
) -> DataFrame:
    """Encode records as syslog wire messages
    (plugins/out_syslog/syslog.c:229-380 syslog_rfc5424, 382-460
    syslog_rfc3164):

    - ``rfc5424``: ``<pri>1 ts host app procid msgid sd [BOM]msg`` with the
      field truncations the reference applies (host 255, app 48, procid 128,
      msgid 32), NILVALUE ``-`` for absent fields, structured data rendered
      from map-typed ``sd_keys`` columns (SD-NAME sanitization to ``_``,
      value escaping), and the UTF-8 BOM before MSG (syslog.c:368).
    - ``rfc3164``: ``<pri>Mon %2d HH:MM:SS [host ][app[procid]: ]msg``.
    - severity/facility resolved from record keys via the reference's
      digit-or-name rules with preset fallbacks (6/1); PRI = fac*8 + sev.
    - a message already starting with ``<`` passes through verbatim
      (pre-formatted syslog, syslog.c:237-244).
    - final line truncated to ``syslog_maxsize`` (2048/1024 defaults,
      syslog.c:40-41,859).

    Pure Catalyst — shuffle-free encode."""
    if format not in ("rfc5424", "rfc3164"):
        raise ValueError(f"format must be rfc5424 or rfc3164, got {format!r}")
    if maxsize is None:
        maxsize = 2048 if format == "rfc5424" else 1024

    sev = F.lit(int(severity_preset))
    if severity_key and severity_key in df.columns:
        sev = F.coalesce(syslog_severity_num(F.col(severity_key)), sev)
    fac = F.lit(int(facility_preset))
    if facility_key and facility_key in df.columns:
        fac = F.coalesce(syslog_facility_num(F.col(facility_key)), fac)
    pri = F.concat(F.lit("<"), (fac * 8 + sev).cast("string"), F.lit(">"))

    ts = F.col(ts_col).cast("timestamp")

    def field(key, limit):
        if key and key in df.columns:
            return F.coalesce(
                F.substring(F.col(key).cast("string"), 1, limit), F.lit("-")
            )
        return F.lit("-")

    msg = (
        F.col(message_key).cast("string")
        if message_key and message_key in df.columns
        else F.lit(None).cast("string")
    )

    if format == "rfc5424":
        micros = _tf.frac_micros(ts)
        header = F.concat(
            pri, F.lit("1 "),
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("."), micros, F.lit("Z "),
            field(hostname_key, 255), F.lit(" "),
            field(appname_key, 48), F.lit(" "),
            field(procid_key, 128), F.lit(" "),
            field(msgid_key, 32), F.lit(" "),
        )
        sd_frags = []
        for key in sd_keys or []:
            if key not in df.columns:
                continue
            import re as _re

            sdid = _re.sub(_SD_NAME_INVALID, "_", key[:32])
            params = F.aggregate(
                F.map_entries(F.col(key)),
                F.lit(""),
                lambda acc, e: F.concat(
                    acc,
                    F.lit(" "),
                    F.regexp_replace(F.substring(e["key"], 1, 32), _SD_NAME_INVALID, "_"),
                    F.lit('="'),
                    _sd_escape_value(e["value"]),
                    F.lit('"'),
                ),
            )
            sd_frags.append(
                F.when(
                    F.col(key).isNotNull(),
                    F.concat(F.lit("[" + sdid), params, F.lit("]")),
                )
            )
        sd = (
            F.coalesce(F.concat_ws("", F.array_compact(F.array(*sd_frags))), F.lit("-"))
            if sd_frags
            else F.lit("-")
        )
        sd = F.when(sd == "", F.lit("-")).otherwise(sd) if sd_frags else sd
        line = F.concat(
            header,
            sd,
            F.coalesce(F.concat(F.lit(" \ufeff"), msg), F.lit("")),
        )
    else:
        header = F.concat(
            pri,
            F.date_format(ts, "MMM"), F.lit(" "),
            F.format_string("%2d", F.dayofmonth(ts)), F.lit(" "),
            F.date_format(ts, "HH:mm:ss"), F.lit(" "),
        )
        host = (
            F.concat(F.col(hostname_key).cast("string"), F.lit(" "))
            if hostname_key and hostname_key in df.columns
            else F.lit("")
        )
        procid = (
            F.concat(F.lit("["), F.col(procid_key).cast("string"), F.lit("]"))
            if procid_key and procid_key in df.columns
            else F.lit(None)
        )
        app = (
            F.concat(
                F.col(appname_key).cast("string"),
                F.coalesce(procid, F.lit("")),
                F.lit(": "),
            )
            if appname_key and appname_key in df.columns
            else F.lit("")
        )
        line = F.concat(
            header,
            F.coalesce(host, F.lit("")),
            F.coalesce(app, F.lit("")),
            F.coalesce(msg, F.lit("")),
        )

    raw = msg.isNotNull() & msg.startswith("<")
    out = F.when(raw, msg).otherwise(F.substring(line, 1, maxsize))
    return df.select(out.alias("line"))


# --------------------------------------------------------------------------
# out_http — JSON body framing + the shared json_date_format semantics
# --------------------------------------------------------------------------
def json_date_value(ts_col: Column, fmt: str = "double") -> Column:
    """The flb_pack json_date_format value (src/flb_pack.c:1395-1427):
    ``double`` = float seconds (µs exact under the 2^53 mantissa),
    ``iso8601`` = %Y-%m-%dT%H:%M:%S.%06dZ, ``java_sql_timestamp`` =
    %Y-%m-%d %H:%M:%S.%06d, ``epoch`` = whole seconds, ``epoch_ms``/
    ``milliseconds`` = epoch ms."""
    ts = ts_col.cast("timestamp")
    us = F.unix_micros(ts)
    micros = _tf.frac_micros(ts)
    if fmt == "double":
        return (us.cast("double") / F.lit(1e6)).alias("date")
    if fmt == "iso8601":
        return F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("."), micros, F.lit("Z")
        )
    if fmt == "java_sql_timestamp":
        return F.concat(
            F.date_format(ts, "yyyy-MM-dd HH:mm:ss"), F.lit("."), micros
        )
    if fmt == "epoch":
        return F.floor(us / F.lit(1_000_000)).cast("long")
    if fmt in ("epoch_ms", "milliseconds"):
        return F.floor(us / F.lit(1000)).cast("long")
    raise ValueError(f"unknown json_date_format {fmt!r}")


def http_payload(
    df: DataFrame,
    body_format: str = "json",
    tag_col: str = "tag",
    ts_col: str = "timestamp",
    json_date_key: str | None = "date",
    json_date_format: str = "double",
    batch_col: str | None = None,
    per_partition: bool = False,
) -> DataFrame:
    """out_http request-body shaping (plugins/out_http/http.c): each record
    becomes a JSON object with ``json_date_key`` injected per
    ``json_date_format``; bodies are framed per batch key (default the tag,
    mirroring one request per flushed chunk) as

    - ``json``: a JSON array ``[{...},{...}]``
    - ``json_stream``: objects concatenated with no separator
    - ``json_lines``: NDJSON

    Returns (batch, body). Record order inside a body is (ts, record-json)
    sorted — deterministic where the reference preserves arrival order.
    One shuffle on the batch key. C renders ``double`` dates with %.17g
    trailing-zero stripping; here the numeric value is identical but Spark's
    JSON float rendering differs textually — use iso8601/epoch formats for
    byte-identical bodies.

    SCALE: one body per batch key is unbounded — a hot tag accumulates its
    whole day into one string. ``per_partition=True`` frames one body per
    (batch, input partition) instead — group sizes bounded by partition
    size like the reference's per-chunk flush, so a hot key cannot OOM an
    executor — at the cost of non-reproducible body boundaries (the oracle
    checks the keyed mode)."""
    seps = {"json": ",", "json_stream": "", "json_lines": "\n"}
    if body_format not in seps:
        raise ValueError(f"body_format must be one of {sorted(seps)}")
    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    date_cols = []
    if json_date_key:
        date_cols = [json_date_value(F.col(ts_col), json_date_format).alias(json_date_key)]
    rec = F.to_json(F.struct(*date_cols, *[F.col(c) for c in others]))
    batch = F.col(batch_col) if batch_col else F.col(tag_col)
    lines = df.select(
        batch.alias("batch"),
        F.struct(F.col(ts_col).cast("timestamp").alias("t"), rec.alias("j")).alias("e"),
    )
    joined = F.array_join(
        F.transform(F.array_sort(F.collect_list("e")), lambda s: s["j"]),
        seps[body_format],
    )
    body = (
        F.concat(F.lit("["), joined, F.lit("]"))
        if body_format == "json"
        else joined
    )
    keys = ["batch"]
    if per_partition:
        lines = lines.withColumn("__part", F.spark_partition_id())
        keys.append("__part")
    return lines.groupBy(*keys).agg(body.alias("body")).select("batch", "body")


def plot_lines(
    df: DataFrame, key: str, ts_col: str = "timestamp"
) -> DataFrame:
    """out_plot gnuplot feed (plugins/out_plot/plot.c:181-196): per record
    ``<epoch.%06f> <value>`` — integer values printed bare, floats %f.
    Catalyst-only."""
    dt_ = df.schema[key].dataType
    val = F.col(key)
    if isinstance(dt_, (T.FloatType, T.DoubleType, T.DecimalType)):
        val = F.format_string("%f", val.cast("double"))
    else:
        val = val.cast("long").cast("string")
    secs = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / F.lit(1e6)
    return df.where(F.col(key).isNotNull()).select(
        F.concat(F.format_string("%f", secs), F.lit(" "), val).alias("line")
    )
