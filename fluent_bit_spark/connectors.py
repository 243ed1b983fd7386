"""Connector encoders/decoders: the out_es / out_splunk / in+out_opentelemetry
payload semantics as DataFrame transforms.

The reference implements these as HTTP clients/servers; the *query-engine*
capability is the payload shaping — index rotation, id extraction, event
wrapping, OTLP envelope nesting/unnesting. Transport is a foreachBatch HTTP
push (or the native Kafka/file sinks); these functions produce exactly the
frames such a push consumes, fully JVM-side (to_json/from_json, no UDFs), so
at 100 TB the encode is whole-stage-codegen and the only shuffle is the one
the user asks for (OTLP resource grouping).

References:
- out_es bulk format, Logstash_Format/Logstash_Prefix/Logstash_DateFormat,
  Id_Key: plugins/out_es/es.c:744-838 (elasticsearch_format), es_conf.c.
- out_splunk HEC event wrapping, event_host/source/sourcetype/index key
  promotion: plugins/out_splunk/splunk.c:351-470, splunk_conf.c.
- OTLP logs JSON: plugins/in_opentelemetry/opentelemetry_logs.c (decode),
  plugins/out_opentelemetry/ (encode); resourceLogs -> scopeLogs ->
  logRecords with timeUnixNano / body.stringValue / attributes KV-list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.functions import timefmt as _tf
from fluent_bit_spark.model import TS_COL


# --------------------------------------------------------------------------
# out_es — Elasticsearch/OpenSearch bulk
# --------------------------------------------------------------------------
def es_bulk(
    df: DataFrame,
    index: str = "fluent-bit",
    logstash_format: bool = False,
    logstash_prefix: str = "logstash",
    logstash_dateformat: str = "yyyy.MM.dd",
    id_key: str | None = None,
    ts_col: str = TS_COL,
    doc_cols: list[str] | None = None,
    include_tag_key: str | None = None,
) -> DataFrame:
    """Shape records into ES bulk-API pairs: one `action_line` + one
    `doc_line` JSON string per record (newline-join a partition for the
    request body).

    - logstash_format=True rotates the index per record timestamp:
      `<prefix>-<date_format(ts)>` (es.c Logstash_Format path).
    - id_key names the record key whose value becomes `_id` (es.c Id_Key);
      absent key -> ES auto-ids (no _id in the action).
    - include_tag_key adds the tag under that key (es.c Include_Tag_Key).
    """
    doc_cols = doc_cols or [c for c in df.columns if c != ts_col]
    if logstash_format:
        idx = F.concat(
            F.lit(logstash_prefix + "-"), F.date_format(F.col(ts_col), logstash_dateformat)
        )
    elif "$TAG" in index or "%" in index:
        # templated index: $TAG/$TAG[n] + strftime, same accessor semantics
        # as the s3/cloudwatch key templates
        from fluent_bit_spark.accessor import tag_template

        idx = tag_template(index, ts_col=ts_col)
    else:
        idx = F.lit(index)
    action_fields = [idx.alias("_index")]
    if id_key is not None:
        action_fields.append(F.col(id_key).cast("string").alias("_id"))
    action = F.to_json(F.struct(F.struct(*action_fields).alias("index")))
    doc_fields = [F.col(c) for c in doc_cols]
    if include_tag_key:
        doc_fields.append(F.col("tag").alias(include_tag_key))
    return df.select(
        idx.alias("_index"),
        *( [F.col(id_key).cast("string").alias("_id")] if id_key else [] ),
        action.alias("action_line"),
        F.to_json(F.struct(*doc_fields)).alias("doc_line"),
    )


_ES_ACTION_T = T.StructType(
    [
        T.StructField(
            op,
            T.StructType(
                [
                    T.StructField("_index", T.StringType()),
                    T.StructField("_id", T.StringType()),
                ]
            ),
        )
        for op in ("index", "create", "update", "delete")
    ]
)


def _event_ts(sec, nsec_us):
    """Exact event time: whole seconds + integer microseconds (a float
    epoch add would round near current-epoch magnitudes). Returns None
    when the epoch is outside datetime's year range — a sender emitting
    epoch MILLISECONDS as the integer timestamp (a classic fluentd
    misconfig) must skip that event per the decoders' skip-corrupt
    contract, not kill the whole Spark task (r12 review)."""
    import datetime as dt

    try:
        return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(
            tzinfo=None
        ) + dt.timedelta(microseconds=nsec_us)
    except (ValueError, OverflowError, OSError):
        return None


def es_bulk_decode(df: DataFrame, body_col: str = "bulk_body") -> DataFrame:
    """Decode ES bulk-API request bodies into per-record rows
    (in_elasticsearch: plugins/in_elasticsearch/in_elasticsearch_bulk_conn.c
    — NDJSON of alternating action + source lines).

    Pairing is a sequential fold over the line array (F.aggregate with a
    (pairs, pending-action) accumulator) because `delete` actions carry NO
    source line — positional even/odd pairing would shift every pairing
    after the first delete. The fold emits (action, doc) for
    index/create/update and (action, NULL) for delete, all JVM-side and
    shuffle-free at any request size; a trailing action with no source
    line yields a NULL doc rather than being dropped.

    Output: `op` (index/create/update/delete), `es_index`, `es_id`,
    `doc` (source JSON string; NULL for delete).
    """
    # split on \r?\n, not '\n' alone: the bulk spec allows CRLF, and
    # F.trim strips only ASCII spaces — a lone '\r' line would survive
    # the blank filter and fall through the op chain as a phantom
    # 'delete' with NULL meta, while real doc lines would carry a
    # trailing \r into `doc`
    lines = F.filter(
        F.split(F.col(body_col), "\r?\n"), lambda x: F.length(F.trim(x)) > 0
    )
    pair_arr_t = "array<struct<action:string,doc:string>>"
    null_s = F.lit(None).cast("string")

    def _acc(pairs_col, pending_col):
        return F.struct(pairs_col.alias("pairs"), pending_col.alias("pending"))

    def _append(pairs_col, action_col, doc_col):
        return F.concat(
            pairs_col, F.array(F.struct(action_col.alias("action"), doc_col.alias("doc")))
        )

    pairs = F.aggregate(
        lines,
        _acc(F.expr(f"CAST(array() AS {pair_arr_t})"), null_s),
        lambda acc, x: F.when(
            acc["pending"].isNotNull(),  # x is the pending action's source line
            _acc(_append(acc["pairs"], acc["pending"], x), null_s),
        ).when(
            F.get_json_object(x, "$.delete").isNotNull(),  # doc-less action
            _acc(_append(acc["pairs"], x, null_s), null_s),
        ).otherwise(_acc(acc["pairs"], x)),
        lambda acc: F.when(
            acc["pending"].isNotNull(), _append(acc["pairs"], acc["pending"], null_s)
        ).otherwise(acc["pairs"]),
    )
    other = [c for c in df.columns if c != body_col]
    exploded = df.select(*other, F.explode(pairs).alias("p")).select(
        *other,
        F.from_json(F.col("p.action"), _ES_ACTION_T).alias("a"),
        F.col("p.doc").alias("doc"),
    )
    op = (
        F.when(F.col("a.index").isNotNull(), F.lit("index"))
        .when(F.col("a.create").isNotNull(), F.lit("create"))
        .when(F.col("a.update").isNotNull(), F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    meta = F.coalesce(F.col("a.index"), F.col("a.create"), F.col("a.update"), F.col("a.delete"))
    return exploded.select(
        *other,
        op.alias("op"),
        meta["_index"].alias("es_index"),
        meta["_id"].alias("es_id"),
        "doc",
    )


# --------------------------------------------------------------------------
# in_forward / msgpack event streams
# --------------------------------------------------------------------------
_MSGPACK_EVENT_FIELDS = [
    T.StructField("sec", T.LongType()),
    T.StructField("nsec", T.LongType()),
    T.StructField("metadata", T.StringType()),
    T.StructField("body", T.StringType()),
]


def _json_default(o):
    import base64

    if isinstance(o, (bytes, bytearray)):
        return base64.b64encode(bytes(o)).decode("ascii")
    return repr(o)


def msgpack_events_decode(df: DataFrame, bin_col: str = "chunk") -> DataFrame:
    """Decode fluent-bit msgpack event chunks (V1 ``[ts, body]`` / V2
    ``[[ts, meta], body]``, EventTime ext, group markers skipped) into
    per-event rows: passthrough columns + timestamp (µs), ts_nanos
    (sub-µs remainder), metadata/body as JSON strings.

    flb_pack.c:670 / flb_log_event_decoder.c parity. Pure-Python decode is
    acceptable here because this is the ingest-boundary protocol adapter,
    run once per captured chunk through Arrow-batched mapInPandas —
    downstream processing stays columnar. Scale = one task per chunk
    partition; no shuffle."""
    import json

    from fluent_bit_spark.functions.msgpack_codec import decode_event_stream

    other = [c for c in df.columns if c != bin_col]
    schema = T.StructType(
        [df.schema[c] for c in other]
        + [T.StructField(TS_COL, T.TimestampType()), T.StructField("ts_nanos", T.LongType())]
        + _MSGPACK_EVENT_FIELDS[2:]
    )

    def run(batches):
        import datetime as dt

        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                payload = rec.pop(bin_col)
                if payload is None:
                    continue
                for sec, nsec, meta, body in decode_event_stream(bytes(payload)):
                    ts = _event_ts(sec, nsec // 1000)
                    if ts is None:
                        continue  # out-of-range epoch: skip, don't crash
                    rows.append(
                        {
                            **{c: rec[c] for c in other},
                            TS_COL: ts,
                            "ts_nanos": nsec % 1000,
                            "metadata": None if meta is None else json.dumps(meta, default=_json_default),
                            "body": json.dumps(body, default=_json_default),
                        }
                    )
            yield pd.DataFrame(rows, columns=[*other, TS_COL, "ts_nanos", "metadata", "body"])

    return df.mapInPandas(run, schema)


def forward_frames_decode(df: DataFrame, bin_col: str = "frame") -> DataFrame:
    """in_forward wire decode (plugins/in_forward/fw_prot.c): each binary
    cell is one transport frame in Message / Forward / PackedForward mode
    (gzip-compressed payloads undone by magic sniff). Emits per-event rows
    tagged with the frame's tag. Same Arrow-batched protocol-adapter shape
    as msgpack_events_decode."""
    import json

    from fluent_bit_spark.functions.msgpack_codec import decode_forward_frame

    other = [c for c in df.columns if c != bin_col]
    schema = T.StructType(
        [df.schema[c] for c in other]
        + [
            T.StructField("tag", T.StringType()),
            T.StructField(TS_COL, T.TimestampType()),
            T.StructField("ts_nanos", T.LongType()),
        ]
        + _MSGPACK_EVENT_FIELDS[2:]
    )

    def run(batches):
        import datetime as dt

        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                payload = rec.pop(bin_col)
                if payload is None:
                    continue
                tag, events, _opts = decode_forward_frame(bytes(payload))
                for sec, nsec, meta, body in events:
                    ts = _event_ts(sec, nsec // 1000)
                    if ts is None:
                        continue  # out-of-range epoch: skip, don't crash
                    rows.append(
                        {
                            **{c: rec[c] for c in other},
                            "tag": tag,
                            TS_COL: ts,
                            "ts_nanos": nsec % 1000,
                            "metadata": None if meta is None else json.dumps(meta, default=_json_default),
                            "body": json.dumps(body, default=_json_default),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[*other, "tag", TS_COL, "ts_nanos", "metadata", "body"]
            )

    return df.mapInPandas(run, schema)


# --------------------------------------------------------------------------
# out_splunk — HTTP Event Collector
# --------------------------------------------------------------------------
def splunk_hec(
    df: DataFrame,
    event_cols: list[str] | None = None,
    host: str | None = None,
    source: str | None = None,
    sourcetype: str | None = None,
    index: str | None = None,
    host_key: str | None = None,
    source_key: str | None = None,
    sourcetype_key: str | None = None,
    index_key: str | None = None,
    ts_col: str = TS_COL,
    send_raw: bool = False,
) -> DataFrame:
    """Wrap records as HEC event envelopes.

    Static host/source/sourcetype/index set the metadata; *_key variants
    promote a record key into the envelope instead (splunk.c
    event_host/event_source/event_sourcetype/event_index lookups — key wins
    over static when both given, and the promoted key is removed from the
    event body). send_raw=True emits the bare record (Splunk_Send_Raw).

    Output: `time` (epoch micros, exact), envelope metadata columns, and
    `event` (JSON string of the record body).
    """
    event_cols = event_cols or [c for c in df.columns if c != ts_col]
    promoted = {k for k in (host_key, source_key, sourcetype_key, index_key) if k}
    body_cols = [c for c in event_cols if c not in promoted]
    event = F.to_json(F.struct(*[F.col(c) for c in body_cols]))
    if send_raw:
        return df.select(event.alias("raw"))

    def meta(key: str | None, static: str | None, name: str):
        if key is not None:
            return F.col(key).cast("string").alias(name)
        return F.lit(static).cast("string").alias(name)

    return df.select(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("time_us"),
        meta(host_key, host, "host"),
        meta(source_key, source, "source"),
        meta(sourcetype_key, sourcetype, "sourcetype"),
        meta(index_key, index, "index"),
        event.alias("event"),
    )


_HEC_EVENT_T = T.StructType(
    [
        # string, not double: Splunk accepts "time" as a quoted string
        # too ("1723804800.123"), which a DoubleType field would NULL
        # out and silently drop the timestamp (r12 review)
        T.StructField("time", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("sourcetype", T.StringType()),
        T.StructField("index", T.StringType()),
    ]
)


def splunk_hec_decode(df: DataFrame, json_col: str = "hec_json") -> DataFrame:
    """Decode HEC event envelopes (in_splunk: plugins/in_splunk/splunk_prot.c
    — JSON objects with `time` epoch seconds (fractional allowed), routing
    metadata, and the user `event`).

    `event` comes back as raw JSON text whether the sender posted an object
    or a plain string (get_json_object handles both), so downstream parsing
    is explicit, matching the in_splunk raw-record handoff. Pure
    from_json/get_json_object — one codegen stage, shuffle-free.
    """
    e = F.from_json(F.col(json_col), _HEC_EVENT_T)
    other = [c for c in df.columns if c != json_col]
    return df.select(
        *other,
        # round before the bigint cast: the nearest double to
        # 1723804800.123 is ...1229999, and truncation would land a
        # systematic 1 µs short of the sender's value
        F.timestamp_micros(
            F.round(e["time"].cast("double") * 1_000_000).cast("bigint")
        ).alias(TS_COL),
        e["host"].alias("host"),
        e["source"].alias("source"),
        e["sourcetype"].alias("sourcetype"),
        e["index"].alias("index"),
        F.get_json_object(F.col(json_col), "$.event").alias("event"),
    )


# --------------------------------------------------------------------------
# OTLP logs — encode (out_opentelemetry) and decode (in_opentelemetry)
# --------------------------------------------------------------------------
def with_request_batches(
    df: DataFrame,
    records_per_request: int,
    id_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "req_batch",
) -> DataFrame:
    """Derive a SIZE-BOUNDED request-batch key for the encoder
    ``batch_col`` parameters: ``id_col div records_per_request``,
    optionally sub-keyed by ``group_cols`` (e.g. per-tenant routing).

    Why: a batch key with FIXED cardinality (a per-type or per-tenant
    batch) makes each encoded request row grow proportionally with the
    data — a multi-hundred-MB JSON string parsed in one task at scale,
    eventually an OOM. Bounding records-per-request keeps request rows
    constant-sized and lets request count (and the decode fan-out) scale
    with rows instead — the same discipline as the reference's ~2 MB
    chunk flush (src/flb_input_chunk.c:3344). Exact request sizes need a
    dense id; with sparse ids the bound still holds as a maximum. The
    batch key is integer FLOOR division (``div`` corrected for negative
    remainders), not float division: floats lose precision above 2^53 so
    boundaries drift, and truncation toward zero would merge the ids on
    either side of 0 into one double-sized batch — floor keeps the
    records-per-batch bound exact over the full long range."""
    if records_per_request < 1:
        raise ValueError("records_per_request must be >= 1")
    parts = [F.col(c).cast("string") for c in (group_cols or [])]
    n = int(records_per_request)
    iid = f"cast(`{id_col}` as bigint)"
    parts.append(
        F.expr(
            f"cast(({iid} div {n}) - (case when {iid} % {n} < 0 then 1 else 0 end)"
            " as string)"
        )
    )
    return df.withColumn(out_col, F.concat_ws(":", *parts))


def _otlp_attrs_to_map(c):
    """attributes array -> map<key, stringValue> (the four OTLP decoders
    share this — one definition so anyValue handling can't diverge)."""
    return F.map_from_entries(
        F.transform(c, lambda a: F.struct(a["key"], a["value"]["stringValue"]))
    )


def _otlp_attr(key, value_col):
    """One OTLP KeyValue: {key, value: {stringValue}} (anyValue collapsed to
    the string branch — fluent-bit's JSON OTLP path does the same for
    non-string scalars via msgpack->JSON stringification)."""
    return F.struct(
        F.lit(key).alias("key"),
        F.struct(value_col.cast("string").alias("stringValue")).alias("value"),
    )


def otlp_logs_encode(
    df: DataFrame,
    body_col: str,
    attr_cols: list[str] | None = None,
    resource_attributes: dict[str, str] | None = None,
    scope_name: str = "fluent-bit-spark",
    batch_col: str | None = None,
    ts_col: str = TS_COL,
) -> DataFrame:
    """Encode records as ExportLogsServiceRequest JSON lines.

    One output row per batch (batch_col grouping; default = one global
    resource — at scale pass the tag or a window as batch_col so the
    collect_list stays chunk-sized, mirroring the reference's
    chunk-granularity OTLP batches). All JVM-side: struct packing +
    collect_list + to_json.
    """
    attr_cols = attr_cols or []
    rec = F.struct(
        (F.unix_micros(F.col(ts_col).cast("timestamp")) * 1000).cast("string").alias("timeUnixNano"),
        F.struct(F.col(body_col).cast("string").alias("stringValue")).alias("body"),
        F.array(*[_otlp_attr(c, F.col(c)) for c in attr_cols]).alias("attributes"),
    )
    res_attrs = F.array(
        *[_otlp_attr(k, F.lit(v)) for k, v in (resource_attributes or {}).items()]
    )
    grouped = (
        df.groupBy(F.col(batch_col).alias("__batch") if batch_col else F.lit(0).alias("__batch"))
        .agg(F.collect_list(rec).alias("__recs"))
    )
    req = F.struct(
        F.array(
            F.struct(
                F.struct(res_attrs.alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                        F.col("__recs").alias("logRecords"),
                    )
                ).alias("scopeLogs"),
            )
        ).alias("resourceLogs")
    )
    return grouped.select(F.col("__batch").alias("batch"), F.to_json(req).alias("otlp_json"))


_OTLP_ATTR_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "value", T.StructType([T.StructField("stringValue", T.StringType())])
            ),
        ]
    )
)

OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _OTLP_ATTR_T)]),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [T.StructField("name", T.StringType())]
                                            ),
                                        ),
                                        T.StructField(
                                            "logRecords",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "timeUnixNano", T.StringType()
                                                        ),
                                                        T.StructField(
                                                            "severityText", T.StringType()
                                                        ),
                                                        T.StructField(
                                                            "body",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "stringValue",
                                                                        T.StringType(),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "attributes", _OTLP_ATTR_T
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def otlp_logs_decode(df: DataFrame, json_col: str = "otlp_json") -> DataFrame:
    """Decode OTLP/JSON log payloads into flat event rows (in_opentelemetry).

    Explodes resourceLogs -> scopeLogs -> logRecords; emits per record:
    timestamp (from timeUnixNano, nanos kept as micros — Spark ts is µs),
    body (string), severity, attributes + resource attributes as maps,
    scope name. Three generator expansions, zero shuffles, zero UDFs —
    the whole decode stays in one codegen stage per input partition.
    """
    parsed = df.select(F.from_json(F.col(json_col), OTLP_LOGS_SCHEMA).alias("r"))
    rl = parsed.select(F.explode("r.resourceLogs").alias("rl"))
    sl = rl.select(
        F.col("rl.resource.attributes").alias("__res_attrs"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    lr = sl.select(
        "__res_attrs",
        F.col("sl.scope.name").alias("scope_name"),
        F.explode("sl.logRecords").alias("lr"),
    )

    return lr.select(
        # integer div: a double-typed /1000 rounds 1.7e18-scale nanos
        F.timestamp_micros(
            F.expr("CAST(lr.timeUnixNano AS BIGINT) div 1000")
        ).alias(TS_COL),
        F.col("lr.body.stringValue").alias("body"),
        F.col("lr.severityText").alias("severity"),
        _otlp_attrs_to_map(F.col("lr.attributes")).alias("attributes"),
        _otlp_attrs_to_map(F.col("__res_attrs")).alias("resource"),
        "scope_name",
    )


# --------------------------------------------------------------------------
# avro — flb_avro.c object-container encode/decode
# --------------------------------------------------------------------------
def _avro_py(v, fschema):
    """One pandas cell -> the python value the avro codec expects."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return None
    s = fschema[1] if isinstance(fschema, list) and len(fschema) == 2 else fschema
    logical = s.get("logicalType") if isinstance(s, dict) else None
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        us = int(pd.Timestamp(v).value // 1000)
        if logical == "timestamp-micros":
            return us
        if logical == "timestamp-millis":
            # millis is its own logical type — whole seconds here would
            # read back 1000x off on any conforming Avro reader
            return us // 1000
        return us // 1_000_000
    if isinstance(v, np.generic):
        return v.item()
    return v


def avro_ocf_encode(df: DataFrame, schema: dict, bin_col: str = "avro", codec: str = "deflate") -> DataFrame:
    """Encode rows into Avro Object Container File blobs, one blob per
    Arrow batch (flb_avro.c record-to-avro parity; container per the public
    Avro spec). Columns map to the record schema's fields by name;
    ``["null", X]`` unions carry nullable columns; long fields with
    logicalType timestamp-micros carry timestamps.

    Map-side only — one Python pass per input partition, no shuffle; blob
    count scales with partitions, which is exactly what a Kafka/object-store
    avro sink wants at 100 TB."""
    from fluent_bit_spark.functions.avro_codec import ocf_bytes

    fields = {f["name"]: f["type"] for f in schema["fields"]}
    names = [f["name"] for f in schema["fields"]]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            records = [
                {n: _avro_py(rec[n], fields[n]) for n in names}
                for rec in pdf[names].to_dict("records")
            ]
            yield pd.DataFrame({bin_col: [ocf_bytes(schema, records, codec=codec)]})

    return df.mapInPandas(run, f"{bin_col} binary")


def avro_ocf_decode(df: DataFrame, ddl_schema: str, bin_col: str = "avro") -> DataFrame:
    """Decode Avro OCF blobs back into rows. ``ddl_schema`` names the
    output columns/types (subset of the record fields); long fields whose
    writer schema says timestamp-micros come back as timestamps. Same
    ingest-boundary shape as msgpack_events_decode: one pass per blob
    partition, no shuffle."""
    from fluent_bit_spark.functions.avro_codec import read_ocf

    out_schema = T._parse_datatype_string(ddl_schema)
    cols = [f.name for f in out_schema.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for payload in pdf[bin_col]:
                if payload is None:
                    continue
                wschema, records = read_ocf(bytes(payload))
                fields = {f["name"]: f["type"] for f in wschema["fields"]}
                for rec in records:
                    row = {}
                    for c in cols:
                        v = rec.get(c)
                        s = fields.get(c)
                        s = s[1] if isinstance(s, list) and len(s) == 2 else s
                        if v is not None and isinstance(s, dict):
                            logical = s.get("logicalType")
                            if logical == "timestamp-micros":
                                v = pd.to_datetime(v, unit="us")
                            elif logical == "timestamp-millis":
                                v = pd.to_datetime(v, unit="ms")
                        row[c] = v
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, out_schema)


# --------------------------------------------------------------------------
# out_influxdb — InfluxDB line protocol
# --------------------------------------------------------------------------
# Escape rules (plugins/out_influxdb/influxdb_bulk.c:31-44 influxdb_escape):
# unquoted positions (keys, tag values) prefix a backslash before any of
# isspace/','/'=' and before a literal backslash; quoted string values are
# first JSON-escaped (flb_utils_write_str_buf in influxdb.c:215-221) and then
# backslash-prefixed for '"' and '\'.
_INFLUX_KEY_ESC = r"([\\\s,=])"


def _influx_json_body_escape(c):
    """flb_utils_write_str_buf equivalent: JSON string-body escaping
    (backslash, quote, \\n\\r\\t\\b\\f named escapes, \\uXXXX for other
    control chars). Done in ONE JVM pass by borrowing Jackson via
    to_json(struct(x)) and slicing off the ``{"x":"`` envelope — measured
    ~6x faster than the 7-regexp_replace chain it replaces, and closer to
    the C semantics (the chain passed rare <0x20 chars through). One
    cosmetic deviation: Jackson renders ``\\uXXXX`` hex UPPERCASE where C's
    %.4x is lowercase."""
    j = F.to_json(F.struct(c.cast("string").alias("x")))
    return j.substr(F.lit(7), F.length(j) - 8)


def _influx_quote_escape(c):
    return F.regexp_replace(c, r'([\\"])', r"\\$1")


def influxdb_line(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    field_cols: list[str] | None = None,
    tag_keys: list[str] | None = None,
    auto_tags: bool = False,
    sequence_tag: str | None = None,
    seq_col: str | None = None,
    use_influxdb_integer: bool = False,
    dedupe_ts_order: str | None = None,
) -> DataFrame:
    """Encode records as InfluxDB line protocol
    (plugins/out_influxdb/influxdb.c:61-315 influxdb_format):

    ``<tag>[,<sequence_tag>=<n>][,tagk=tagv]* fieldk=fieldv[,..] <epoch_ns>``

    - measurement = the fluent-bit tag, unescaped (influxdb_bulk.c:98-135
      append_header copies it verbatim).
    - a key is a *tag* when it appears in ``tag_keys`` or when ``auto_tags``
      and its value is a string (influxdb.c:604-624 is_tagged_key).
    - values: nil skipped; bool TRUE/FALSE; integers bare (suffix ``i`` when
      ``use_influxdb_integer``); floats printf %f; strings JSON-escaped then
      quoted with '"'/backslash escaping (influxdb.c:160-221).
    - records whose field set is empty are dropped with a warning in the
      reference (influxdb.c:273-278) — dropped silently here.
    - the reference's per-flush ``_seq`` counter (influxdb.c:121-127, cyclic
      1..99999) is driver state; supply ``seq_col`` (e.g. the bucketed
      distributed prefix sum in model._with_global_seq) to reproduce it
      scale-safely. Off by default, matching ``sequence_tag off``.
    - duplicate-timestamp disambiguation (influxdb.c:43-55 influxdb_tsmod
      bumps ns until unique, sequential driver state): pass
      ``dedupe_ts_order`` to reproduce the monotonic bump per
      (measurement, tagset) — emitted_i = max(ns_i, emitted_{i-1}+1),
      expressed as rn_i + running_max(ns_j - rn_j) so a bumped value can
      never collide with a later point's GENUINE ns either (the r11
      rank-within-equal-ns shape could: bumping 100,100 to 100,101
      collided with a real 101). Windowed per tagset: bounded groups,
      distributed.
    """
    from pyspark.sql import Window

    fields = field_cols or [c for c in df.columns if c not in (tag_col, ts_col, seq_col)]
    tag_set = set(tag_keys or [])

    def is_tag(name: str) -> bool:
        if name in tag_set:
            return True
        return auto_tags and isinstance(df.schema[name].dataType, T.StringType)

    import re as _re

    def esc_key(name: str) -> str:
        return _re.sub(r"([\\\s,=])", r"\\\1", name)

    def field_value(name: str):
        dt = df.schema[name].dataType
        col = F.col(name)
        if isinstance(dt, T.BooleanType):
            return F.when(col, F.lit("TRUE")).otherwise(F.lit("FALSE"))
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            s = col.cast("string")
            return F.concat(s, F.lit("i")) if use_influxdb_integer else s
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return F.format_string("%f", col.cast("double"))
        # string/binary: JSON-escape then quote-escape, wrapped in quotes
        body = _influx_quote_escape(_influx_json_body_escape(col.cast("string")))
        return F.concat(F.lit('"'), body, F.lit('"'))

    def tag_value(name: str):
        dt = df.schema[name].dataType
        col = F.col(name)
        if isinstance(dt, (T.StringType, T.BinaryType)):
            # JSON-escaped (quote path ran first in the C loop), then
            # key-position escaping — no surrounding quotes for tag values.
            return F.regexp_replace(_influx_json_body_escape(col.cast("string")), _INFLUX_KEY_ESC, r"\\$1")
        return field_value(name)

    tag_frags, field_frags = [], []
    for name in fields:
        frag = F.concat(F.lit(esc_key(name) + "="), (tag_value if is_tag(name) else field_value)(name))
        frag = F.when(F.col(name).isNotNull(), frag)
        (tag_frags if is_tag(name) else field_frags).append(frag)

    ns = (F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)).cast("long")
    if dedupe_ts_order is not None:
        series = [F.col(tag_col)] + [F.col(n) for n in fields if is_tag(n)]
        w = Window.partitionBy(*series).orderBy(ns, F.col(dedupe_ts_order))
        rn = F.row_number().over(w) - F.lit(1)
        run = w.rowsBetween(Window.unboundedPreceding, 0)
        ns = rn + F.max(ns - rn).over(run)

    head = F.col(tag_col).cast("string")
    if sequence_tag is not None and seq_col is not None:
        head = F.concat(
            head,
            F.lit("," + esc_key(sequence_tag) + "="),
            # reference counter cycles 1..99999 and never emits 0
            # (plugins/out_influxdb/influxdb.c:119-127)
            ((F.col(seq_col).cast("long") % F.lit(99999)) + F.lit(1)).cast("string"),
        )
    if tag_frags:
        tag_part = F.array_join(F.array_compact(F.array(*tag_frags)), ",")
        head = F.when(tag_part == "", head).otherwise(F.concat(head, F.lit(","), tag_part))

    body = F.array_compact(F.array(*field_frags))
    # stage head/body/ns as named columns: the filter and the join both
    # consume body, and CollapseProject would otherwise inline (and
    # re-evaluate) the whole escape pipeline at each reference
    staged = df.select(
        head.alias("__head"), body.alias("__body"), ns.cast("string").alias("__ns")
    )
    line = F.concat(
        F.col("__head"), F.lit(" "), F.array_join(F.col("__body"), ","),
        F.lit(" "), F.col("__ns"),
    )
    return staged.where(F.size("__body") > 0).select(line.alias("line"))


# --------------------------------------------------------------------------
# out_datadog — Datadog logs intake payload
# --------------------------------------------------------------------------
def datadog_records(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    json_date_key: str = "timestamp",
    include_tag_key: bool = False,
    tag_key: str = "tagkey",
    dd_source: str | None = None,
    dd_service: str | None = None,
    dd_hostname: str | None = None,
    dd_tags: str | None = None,
    dd_message_key: str = "log",
    remap: bool = False,
    dedupe_ts_order: str | None = None,
) -> DataFrame:
    """Shape records for the Datadog logs intake API
    (plugins/out_datadog/datadog.c:93-340 datadog_format): per record emit
    ``timestamp`` (epoch ms), optional ``tagkey``/``ddsource``/``service``/
    ``hostname``/``ddtags`` metadata, the record attributes with
    ``dd_message_key`` renamed to ``message``, and — with ``remap`` (the
    ``provider ecs`` mode) — the six ECS attributes folded into ``ddtags``
    (datadog_remap.c:248-255 remapping table):

    - container_id / container_image -> ``<name>:<value>`` verbatim
    - container_name -> leading '/' stripped
    - ecs_cluster -> value after ``cluster/`` (verbatim if absent)
    - ecs_task_definition -> ``task_family:<fam>,task_version:<ver>`` on a
      ':' split (verbatim under its own name if malformed)
    - ecs_task_arn -> ``task_arn:<arn>`` + ``region`` parsed from the ARN +
      ``task_id`` after ``task/``

    The duplicate-ms bump (datadog.c:54-66 timestamp_format) is sequential
    driver state; ``dedupe_ts_order`` reproduces it as the monotonic
    emitted_i = max(ms_i, emitted_{i-1}+1) per tag (rn + running-max
    form — see influxdb_line; the old rank-within-equal-ms could
    collide a bumped value with a later genuine ms). Returns structured
    columns; ``to_json(struct(*))`` of a collected array is the request
    body.
    """
    from pyspark.sql import Window

    ms = (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000)).cast("long")
    if dedupe_ts_order is not None:
        w = Window.partitionBy(tag_col).orderBy(ms, F.col(dedupe_ts_order))
        rn = F.row_number().over(w) - F.lit(1)
        run = w.rowsBetween(Window.unboundedPreceding, 0)
        ms = rn + F.max(ms - rn).over(run)

    remap_rules = {
        "container_id",
        "container_name",
        "container_image",
        "ecs_cluster",
        "ecs_task_definition",
        "ecs_task_arn",
    }
    present_remaps = [c for c in df.columns if remap and c in remap_rules]

    def remap_frag(name: str):
        col = F.col(name).cast("string")
        if name == "container_name":
            val = F.concat(F.lit("container_name:"), F.regexp_replace(col, "^/", ""))
        elif name == "ecs_cluster":
            after = F.substring_index(col, "cluster/", -1)
            val = F.concat(F.lit("cluster_name:"), F.when(col.contains("cluster/"), after).otherwise(col))
        elif name == "ecs_task_definition":
            fam = F.substring_index(col, ":", 1)
            ver = F.substring_index(col, ":", -1)
            val = F.when(
                col.contains(":"),
                F.concat(F.lit("task_family:"), fam, F.lit(",task_version:"), ver),
            ).otherwise(F.concat(F.lit("ecs_task_definition:"), col))
        elif name == "ecs_task_arn":
            region = F.split(F.regexp_replace(col, "^arn:aws:ecs:", ""), ":").getItem(0)
            task_id = F.substring_index(col, "task/", -1)
            val = F.concat(
                F.lit("task_arn:"),
                col,
                F.when(col.startswith("arn:aws:ecs:"), F.concat(F.lit(",region:"), region)).otherwise(F.lit("")),
                F.lit(",task_id:"),
                F.when(col.contains("task/"), task_id).otherwise(col),
            )
        else:
            val = F.concat(F.lit(name + ":"), col)
        return F.when(F.col(name).isNotNull(), val)

    ddtags_parts = [remap_frag(c) for c in present_remaps]
    if dd_tags is not None:
        ddtags_parts.append(F.lit(dd_tags))
    ddtags = (
        F.array_join(F.array_compact(F.array(*ddtags_parts)), ",") if ddtags_parts else None
    )

    cols = [ms.alias(json_date_key)]
    if include_tag_key:
        cols.append(F.col(tag_col).cast("string").alias(tag_key))
    if dd_source is not None:
        cols.append(F.lit(dd_source).alias("ddsource"))
    if dd_service is not None:
        cols.append(F.lit(dd_service).alias("service"))
    if dd_hostname is not None:
        cols.append(F.lit(dd_hostname).alias("hostname"))
    skip = {tag_col, ts_col} | set(present_remaps)
    for c in df.columns:
        if c in skip:
            continue
        cols.append(F.col(c).alias("message") if c == dd_message_key else F.col(c))
    if ddtags is not None:
        cols.append(ddtags.alias("ddtags"))
    return df.select(*cols)


# --------------------------------------------------------------------------
# out_forward — fluentd forward protocol (wire encode)
# --------------------------------------------------------------------------
def forward_frames_encode(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    time_as_integer: bool = False,
    send_options: bool = False,
    events_per_frame: int = 1000,
) -> DataFrame:
    """Encode records as fluentd Forward-mode transport frames
    (plugins/out_forward/forward.c: ``[tag, [[time, record], ...]]``, plus
    an options map ``{"size": n}`` when ``send_options`` — forward.c:983-997).
    ``time`` is the EventTime ext type (fixext8 0x00, sec+nsec — the
    fluent-bit default) or a plain integer epoch when ``time_as_integer``
    (forward.c:974-979).

    The inverse of forward_frames_decode — the two roundtrip losslessly to
    µs precision. Framing mirrors the reference's chunking: one frame per
    (tag, ≤events_per_frame slice) within each Arrow batch, so frames are
    bounded like flush chunks and no shuffle is introduced; co-locate tags
    beforehand with repartition(tag) if single-frame-per-tag is wanted."""
    from fluent_bit_spark.functions.msgpack_codec import EventTime, pack

    other = [c for c in df.columns if c not in (tag_col, ts_col)]
    schema = T.StructType(
        [T.StructField("tag", T.StringType()), T.StructField("frame", T.BinaryType())]
    )

    def run(batches):
        import pandas as pd

        def native(v):
            if v is None or v != v:  # None / NaN
                return None
            if hasattr(v, "item"):  # numpy scalar
                return v.item()
            return v

        for pdf in batches:
            frames = []
            by_tag: dict = {}
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                tag, t = rec[tag_col], rec[ts_col]
                # integer nanos (.value): float .timestamp() truncates toward
                # zero, pairing a too-high sec with a positive nsec pre-1970
                sec, rem = divmod(t.value, 1_000_000_000)
                nsec = int(rem)
                sec = int(sec)
                ev_time = sec if time_as_integer else EventTime(sec, nsec)
                body = {
                    k: v for k in other if (v := native(rec[k])) is not None
                }
                by_tag.setdefault(tag, []).append([ev_time, body])
            for tag, entries in by_tag.items():
                for i in range(0, len(entries), events_per_frame):
                    chunk = entries[i : i + events_per_frame]
                    frame = [tag, chunk]
                    if send_options:
                        frame.append({"size": len(chunk)})
                    frames.append({"tag": tag, "frame": pack(frame)})
            yield pd.DataFrame(frames, columns=["tag", "frame"])

    return df.mapInPandas(run, schema)


# --------------------------------------------------------------------------
# out_cloudwatch_logs — PutLogEvents shaping
# --------------------------------------------------------------------------
def cloudwatch_events(
    df: DataFrame,
    log_group: str,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    log_stream_name: str | None = None,
    log_stream_prefix: str | None = None,
    log_key: str | None = None,
    max_event_len: int = 1_000_000,
) -> DataFrame:
    """Shape records for CloudWatch PutLogEvents
    (plugins/out_cloudwatch_logs/cloudwatch_api.c): per record emit
    ``log_group``, ``log_stream`` (explicit name with ``$TAG``/``$TAG[n]``
    substituted, or ``log_stream_prefix`` + tag — cloudwatch_logs.h:164-165),
    ``timestamp`` (epoch ms) and ``message`` — the ``log_key`` value alone
    when configured, else the full record as JSON — truncated to
    MAX_EVENT_LEN (cloudwatch_api.h:57, truncate_log at cloudwatch_api.c:630;
    character-based here vs C's bytes — equal for the ASCII-dominant
    payloads this models). Chronological ordering within a put batch is the
    uploader's concern; the ms key is emitted for it to sort on."""
    if log_stream_name is None and log_stream_prefix is None:
        raise ValueError("need log_stream_name or log_stream_prefix")
    tag = F.col(tag_col).cast("string")
    if log_stream_name is not None:
        # $TAG[n] parts then whole-$TAG, same accessor semantics as out_s3
        from fluent_bit_spark.accessor import tag_template

        stream = tag_template(log_stream_name, tag_col=tag_col, ts_col=ts_col)
    else:
        stream = F.concat(F.lit(log_stream_prefix), tag)

    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    message = (
        F.col(log_key).cast("string")
        if log_key
        else F.to_json(F.struct(*others))
    )
    ms = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000)).cast("long")
    return df.select(
        F.lit(log_group).alias("log_group"),
        stream.alias("log_stream"),
        ms.alias("timestamp"),
        F.substring(message, 1, max_event_len).alias("message"),
    )


# --------------------------------------------------------------------------
# out_stackdriver — Cloud Logging LogEntry shaping
# --------------------------------------------------------------------------
# plugins/out_stackdriver/stackdriver.c:1471-1520 validate_severity_level:
# case-insensitive aliases -> the numeric LogSeverity enum the plugin packs
# (msgpack_pack_int at stackdriver.c:2518).
_STACKDRIVER_SEVERITY = {
    "EMERGENCY": 800, "EMERG": 800,
    "A": 700, "ALERT": 700,
    "C": 600, "F": 600, "CRIT": 600, "FATAL": 600, "CRITICAL": 600,
    "E": 500, "ERR": 500, "ERROR": 500, "SEVERE": 500,
    "W": 400, "WARN": 400, "WARNING": 400,
    "N": 300, "NOTICE": 300,
    "I": 200, "INFO": 200,
    "D": 100, "DEBUG": 100, "TRACE": 100, "TRACE_INT": 100,
    "FINE": 100, "FINER": 100, "FINEST": 100, "CONFIG": 100,
    "DEFAULT": 0,
}


def stackdriver_severity(col: Column) -> Column:
    """Map a severity string to the Cloud Logging enum value, NULL when
    unrecognized (the reference then omits the field)."""
    m = F.create_map(
        *[F.lit(x) for kv in _STACKDRIVER_SEVERITY.items() for x in kv]
    )
    return F.element_at(m, F.upper(F.trim(col.cast("string"))))


def stackdriver_entries(
    df: DataFrame,
    project_id: str,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    severity_key: str = "severity",
    trace_key: str | None = None,
    span_id_key: str | None = None,
) -> DataFrame:
    """Shape records as Cloud Logging LogEntry rows
    (plugins/out_stackdriver/stackdriver.c:2343-2674): ``log_name`` =
    projects/<project>/logs/<tag>, ``severity`` = the numeric enum from the
    case-insensitive alias table (severity_key consumed from the body),
    ``timestamp`` = RFC3339 with 9-digit nanoseconds
    (FLB_STD_TIME_FMT + ".%09luZ", stackdriver.c:2663-2668), ``json_payload``
    = the remaining record as JSON, plus optional trace/span id promotion."""
    consumed = {tag_col, ts_col, severity_key} | {
        k for k in (trace_key, span_id_key) if k
    }
    others = [c for c in df.columns if c not in consumed]
    ts = F.col(ts_col).cast("timestamp")
    nanos = F.format_string(
        "%09d", (_tf.micros_of(ts) * 1000).cast("long")
    )
    cols = [
        F.concat(
            F.lit(f"projects/{project_id}/logs/"), F.col(tag_col).cast("string")
        ).alias("log_name"),
        (
            stackdriver_severity(F.col(severity_key))
            if severity_key in df.columns
            else F.lit(None).cast("int")
        ).alias("severity"),
        F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("."), nanos, F.lit("Z")
        ).alias("timestamp"),
        F.to_json(F.struct(*others)).alias("json_payload"),
    ]
    if trace_key:
        cols.append(F.col(trace_key).cast("string").alias("trace"))
    if span_id_key:
        cols.append(F.col(span_id_key).cast("string").alias("span_id"))
    return df.select(*cols)


# --------------------------------------------------------------------------
# out_bigquery — insertAll row shaping
# --------------------------------------------------------------------------
def bigquery_rows(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    insert_id_col: str | None = None,
) -> DataFrame:
    """Shape records for the BigQuery tabledata.insertAll body
    (plugins/out_bigquery/bigquery.c flb_bigquery_format: each record is
    ``{"json": {...record...}}``; the plugin sends no insertId — best-effort
    dedup off — so it is optional here too)."""
    others = [c for c in df.columns if c not in (tag_col, ts_col, insert_id_col)]
    cols = [F.to_json(F.struct(*others)).alias("json")]
    if insert_id_col:
        cols.insert(0, F.col(insert_id_col).cast("string").alias("insert_id"))
    return df.select(*cols)


# --------------------------------------------------------------------------
# out_kafka — message shaping for the Kafka producer
# --------------------------------------------------------------------------
def kafka_messages(
    df: DataFrame,
    topics: list[str],
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    timestamp_key: str = "@timestamp",
    timestamp_format: str = "double",
    message_key: str | None = None,
    message_key_field: str | None = None,
    topic_key: str | None = None,
    dynamic_topic: bool = False,
    raw_log_key: str | None = None,
) -> DataFrame:
    """Shape records into (topic, key, value) rows — the exact columns
    Spark's Kafka writer consumes — with out_kafka's semantics
    (plugins/out_kafka/kafka.c:187-300 produce_message):

    - ``value``: the record JSON with ``timestamp_key`` injected per
      ``timestamp_format`` (double | iso8601 µs | iso8601_ns; kafka.c:
      193-231). With ``raw_log_key`` the value is that field verbatim
      (FLB_KAFKA_FMT_RAW) and nothing is injected.
    - ``key``: the string value of ``message_key_field`` when present,
      else the static ``message_key`` (kafka.c:243-250).
    - ``topic``: the ``topic_key`` field's value when it names a configured
      topic; with ``dynamic_topic`` any value is accepted unless it has a
      comma or exceeds 249 chars (kafka.c:262-286); else the default
      (first) topic.

    Shuffle-free projection; at scale the Kafka writer partitions by key.
    Spark renders the ``double`` timestamp value textually differently
    than C's %.17g (value identical) — use iso8601 for byte parity."""
    if not topics:
        raise ValueError("need at least one topic")
    ts = F.col(ts_col).cast("timestamp")
    us = F.unix_micros(ts)
    micros = _tf.frac_micros(ts)
    if timestamp_format == "double":
        ts_val = us.cast("double") / F.lit(1e6)
    elif timestamp_format == "iso8601":
        ts_val = F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("."), micros, F.lit("Z")
        )
    elif timestamp_format == "iso8601_ns":
        ts_val = F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit("."), micros, F.lit("000Z"),
        )
    else:
        raise ValueError(f"unknown timestamp_format {timestamp_format!r}")

    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    if raw_log_key:
        value = F.col(raw_log_key).cast("string")
    else:
        value = F.to_json(F.struct(ts_val.alias(timestamp_key), *[F.col(c) for c in others]))

    key = F.lit(message_key).cast("string") if message_key else F.lit(None).cast("string")
    if message_key_field and message_key_field in df.columns:
        key = F.coalesce(F.col(message_key_field).cast("string"), key)

    topic = F.lit(topics[0])
    if topic_key and topic_key in df.columns:
        tv = F.col(topic_key).cast("string")
        known = tv.isin(topics)
        ok_dynamic = (
            F.lit(dynamic_topic)
            & tv.isNotNull()
            & ~tv.contains(",")
            & (F.length(tv) <= 249)
        )
        topic = F.when(known | ok_dynamic, tv).otherwise(topic)

    return df.select(topic.alias("topic"), key.alias("key"), value.alias("value"))


def kafka_sink(
    df: DataFrame,
    brokers: str,
    topics: list[str],
    checkpoint: str,
    **shape_opts,
):
    """Streaming Kafka delivery: kafka_messages shaping -> writeStream
    format("kafka") with checkpointed exactly-once-per-epoch delivery
    (the engine-side replacement for rdkafka's queue/retry machinery)."""
    msgs = kafka_messages(df, topics, **shape_opts)
    return (
        msgs.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )


# --------------------------------------------------------------------------
# out_kinesis_streams — PutRecords entry shaping
# --------------------------------------------------------------------------
_STRFTIME_MAP = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%j": "DDD", "%z": "Z", "%b": "MMM", "%y": "yy",
}


def _strftime_to_java(fmt: str) -> str:
    """strftime -> Java DateTimeFormatter, quoting literal runs so chars
    like 'T' aren't read as pattern letters."""
    out, lit = [], []

    def flush():
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(fmt):
        tok = fmt[i : i + 2]
        if tok in _STRFTIME_MAP:
            flush()
            out.append(_STRFTIME_MAP[tok])
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


def kinesis_records(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    log_key: str | None = None,
    time_key: str | None = None,
    time_key_format: str = "%Y-%m-%dT%H:%M:%S",
) -> DataFrame:
    """Shape records into Kinesis PutRecords entries
    (plugins/out_kinesis_streams/kinesis_api.c): ``data`` =
    base64(record JSON [+ ``time_key`` strftime] or the ``log_key`` value),
    ``partition_key`` = two mod-7919 hash fragments concatenated
    (kinesis_api.c:109-140 random_partition_key). The reference mixes
    wall-clock entropy into the key for shard spreading; a deterministic
    engine derives both fragments from (tag, ts, position) — the same
    uniform shard distribution, reproducible on retry."""
    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    ts = F.col(ts_col).cast("timestamp")
    if log_key:
        body = F.col(log_key).cast("string")
    else:
        fields = [F.col(c) for c in others]
        if time_key:
            fields.append(F.date_format(ts, _strftime_to_java(time_key_format)).alias(time_key))
        body = F.to_json(F.struct(*fields))
    h1 = F.pmod(F.xxhash64(F.col(tag_col)), F.lit(7919)).cast("string")
    h2 = F.pmod(F.xxhash64(F.col(tag_col), ts, body), F.lit(7919)).cast("string")
    # Spark's base64 is MIME-chunked (CRLF every 76 chars); the wire format
    # is the unchunked RFC 4648 form
    b64 = F.regexp_replace(F.base64(body.cast("binary")), "[\\r\\n]", "")
    return df.select(
        F.concat(h1, h2).alias("partition_key"),
        b64.alias("data"),
    )


# --------------------------------------------------------------------------
# out_azure — Log Analytics record shaping
# --------------------------------------------------------------------------
def azure_records(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    time_key: str = "@timestamp",
    time_generated: bool = False,
    log_type: str = "fluentbit",
    log_type_key: str | None = None,
) -> DataFrame:
    """Shape records for the Azure Log Analytics collector API
    (plugins/out_azure/azure.c:95-160): per record the body fields plus
    ``time_key`` — ISO8601 with milliseconds when ``time_generated``
    (azure.c:130-144, also sent as the time-generated-field header), else
    float seconds — and ``log_type`` resolved per record from
    ``log_type_key`` when configured (azure.c:105-120), else the static
    ``Log_Type``."""
    others = [
        c for c in df.columns if c not in (tag_col, ts_col, log_type_key)
    ]
    ts = F.col(ts_col).cast("timestamp")
    us = F.unix_micros(ts)
    if time_generated:
        ms = _tf.frac_millis(ts)
        t_val = F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("."), ms, F.lit("Z")
        )
    else:
        t_val = us.cast("double") / F.lit(1e6)
    lt = (
        F.coalesce(F.col(log_type_key).cast("string"), F.lit(log_type))
        if log_type_key and log_type_key in df.columns
        else F.lit(log_type)
    )
    return df.select(
        lt.alias("log_type"),
        t_val.alias(time_key),
        *[F.col(c) for c in others],
    )


# --------------------------------------------------------------------------
# in_http — HTTP JSON receiver decode
# --------------------------------------------------------------------------
def http_requests_decode(
    df: DataFrame,
    body_col: str = "body",
    uri_col: str | None = None,
    tag_key: str | None = None,
    default_tag: str = "http.0",
) -> DataFrame:
    """Decode in_http request bodies (plugins/in_http/http_prot.c:630-700):
    each body is one JSON object or a JSON array of objects; every object
    becomes a record. The tag is resolved per record — the ``tag_key``
    field when present and a string (http_prot.c:205-233), else the URI
    path with the leading '/' stripped, else the default.

    Catalyst-only: array bodies are exploded via from_json to
    array<string> (elements come back as their raw JSON text). Scale =
    shuffle-free; one explode per request row."""
    body = F.trim(F.col(body_col))
    arr = F.when(body.startswith("["), body).otherwise(
        F.concat(F.lit("["), body, F.lit("]"))
    )
    others = [c for c in df.columns if c != body_col]
    out = df.select(
        *others, F.explode(F.from_json(arr, "array<string>")).alias("record")
    )
    tag = F.lit(default_tag)
    if uri_col and uri_col in df.columns:
        uri_tag = F.regexp_replace(F.col(uri_col).cast("string"), "^/", "")
        tag = F.when(uri_tag != "", uri_tag).otherwise(tag)
    if tag_key:
        tag = F.coalesce(
            F.get_json_object(F.col("record"), f"$.{tag_key}"), tag
        )
    return out.select(tag.alias("tag"), "record", *[c for c in others])


# --------------------------------------------------------------------------
# out_td / out_nats / out_slack / out_logdna — remaining wire shapes
# --------------------------------------------------------------------------
def td_records(
    df: DataFrame, tag_col: str = "tag", ts_col: str = TS_COL
) -> DataFrame:
    """Treasure Data import shape (plugins/out_td/td.c:44-90 td_format):
    each record re-packed as a msgpack map with ``time`` = whole epoch
    seconds added. Emits one binary msgpack cell per record (concatenate a
    partition for the request body). Arrow-batched protocol adapter, like
    the forward encoder."""
    from fluent_bit_spark.functions.msgpack_codec import pack

    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    schema = T.StructType([T.StructField("msgpack", T.BinaryType())])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                t = rec[ts_col]
                body = {
                    k: (v.item() if hasattr(v, "item") else v)
                    for k, v in rec.items()
                    if k in others and v is not None and v == v
                }
                body["time"] = t.value // 1_000_000_000  # floor, exact pre-1970
                out.append({"msgpack": pack(body)})
            yield pd.DataFrame(out, columns=["msgpack"])

    return df.mapInPandas(run, schema)


def nats_body(
    df: DataFrame, tag_col: str = "tag", ts_col: str = TS_COL
) -> DataFrame:
    """out_nats payload (plugins/out_nats/nats.c:81-150 msgpack_to_json):
    per tag (the NATS subject) a JSON array of ``[epoch.nanos, record]``
    pairs. Entry order is (ts, record)-sorted — deterministic where the
    reference preserves chunk order. One shuffle on the subject key."""
    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    ts = F.col(ts_col).cast("timestamp")
    us = F.unix_micros(ts)
    epoch = F.concat(
        F.floor(us / 1_000_000).cast("long").cast("string"),
        F.lit("."),
        _tf.frac_micros(ts),
    )
    entry = F.concat(
        F.lit("["), epoch, F.lit(","),
        F.to_json(F.struct(*[F.col(c) for c in others])), F.lit("]"),
    )
    lines = df.select(
        F.col(tag_col).alias("subject"),
        F.struct(ts.alias("t"), entry.alias("e")).alias("x"),
    )
    return lines.groupBy("subject").agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("x")), lambda s: s["e"]), ","
            ),
            F.lit("]"),
        ).alias("body")
    )


def slack_text(
    df: DataFrame, tag_col: str = "tag", ts_col: str = TS_COL
) -> DataFrame:
    """out_slack webhook payload (plugins/out_slack/slack.c:158-232): all
    records rendered as ``[<epoch>.<micros>, <record>]`` lines folded into
    one ``{"text": ...}`` message per tag. The C prints records through
    msgpack_object_print (Ruby-ish ``=>`` maps); JSON rendering here —
    same content, cleaner consumers. Slack bodies are human-scale; the
    per-tag group is bounded by use."""
    others = [c for c in df.columns if c not in (tag_col, ts_col)]
    ts = F.col(ts_col).cast("timestamp")
    us = F.unix_micros(ts)
    line = F.concat(
        F.lit("["),
        F.floor(us / 1_000_000).cast("long").cast("string"),
        F.lit("."),
        _tf.frac_micros(ts),
        F.lit(", "),
        F.to_json(F.struct(*[F.col(c) for c in others])),
        F.lit("]"),
    )
    lines = df.select(
        F.col(tag_col).alias("tag"), F.struct(ts.alias("t"), line.alias("e")).alias("x")
    )
    return lines.groupBy("tag").agg(
        F.to_json(
            F.struct(
                F.array_join(
                    F.transform(F.array_sort(F.collect_list("x")), lambda s: s["e"]),
                    "\n",
                ).alias("text")
            )
        ).alias("payload")
    )


def logdna_lines(
    df: DataFrame,
    tag_col: str = "tag",
    ts_col: str = TS_COL,
    app: str = "Fluent Bit",
) -> DataFrame:
    """LogDNA ingestion lines (plugins/out_logdna/logdna.c:62-180): per
    record ``timestamp`` (epoch ms), promoted ``level``/``meta``/``file``/
    ``app`` keys when present (level falls back to severity, app to the
    static config), and ``line`` = the remaining record as JSON."""
    promoted = {"level", "severity", "meta", "file", "app"}
    others = [c for c in df.columns if c not in promoted | {tag_col, ts_col}]
    ms = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / 1000).cast("long")
    level = None
    if "level" in df.columns or "severity" in df.columns:
        cands = [F.col(c).cast("string") for c in ("level", "severity") if c in df.columns]
        level = F.coalesce(*cands) if len(cands) > 1 else cands[0]
    cols = [ms.alias("timestamp")]
    if level is not None:
        cols.append(level.alias("level"))
    for k in ("meta", "file"):
        if k in df.columns:
            cols.append(F.col(k).cast("string").alias(k))
    app_col = (
        F.coalesce(F.col("app").cast("string"), F.lit(app))
        if "app" in df.columns
        else F.lit(app)
    )
    cols.append(app_col.alias("app"))
    cols.append(F.to_json(F.struct(*[F.col(c) for c in others])).alias("line"))
    return df.select(*cols)


# --------------------------------------------------------------------------
# out_prometheus_remote_write — snappy'd protobuf WriteRequest
# --------------------------------------------------------------------------
def remote_write_encode(
    df: DataFrame,
    name_col: str = "metric",
    label_cols: list[str] | None = None,
    value_col: str = "value",
    ts_col: str = TS_COL,
    batch_col: str | None = None,
    compress: bool = True,
) -> DataFrame:
    """Encode metric samples as Prometheus remote-write request bodies
    (plugins/out_prometheus_remote_write + the cmetrics remote-write
    encoder): a snappy-block-compressed protobuf ``WriteRequest`` —
    repeated TimeSeries{labels: [__name__ + label cols], samples:
    [(double value, int64 epoch-ms)]} per (name, label-set) series,
    samples time-ordered. One body per ``batch_col`` group (default: the
    metric name — bounded series sets per request). Snappy is pyarrow's
    raw-block codec, the format the spec requires."""
    import pyarrow as pa

    from fluent_bit_spark.functions.msgpack_codec import pb_field, pb_len_delim, pb_varint

    labels = label_cols or []
    batch = batch_col or name_col
    out_schema = T.StructType(
        [T.StructField("batch", T.StringType()), T.StructField("body", T.BinaryType())]
    )
    import struct as _struct

    def encode_group(pdf):
        import pandas as pd

        series: dict = {}
        for rec in pdf.itertuples(index=False):
            rec = rec._asdict()
            key = (str(rec[name_col]),) + tuple(
                (l, "" if rec[l] is None else str(rec[l])) for l in labels
            )
            ms = rec[ts_col].value // 1_000_000  # integer ns → ms, exact
            series.setdefault(key, []).append((float(rec[value_col]), ms))
        ts_msgs = []
        for key, samples in sorted(series.items()):
            name, lbls = key[0], key[1:]
            # the remote-write spec requires labels sorted by name —
            # receivers validate and reject out-of-order label sets, so
            # __name__ must take its LEXICOGRAPHIC place (after an
            # uppercase-initial label like 'Region', before lowercase),
            # not a hardcoded first slot (r12 review)
            all_labels = sorted([("__name__", name), *lbls])
            parts = [
                pb_len_delim(
                    1,
                    pb_len_delim(1, ln.encode()) + pb_len_delim(2, lv.encode()),
                )
                for ln, lv in all_labels
            ]
            for v, ms in sorted(samples, key=lambda s: s[1]):
                sample = (
                    pb_field(1, 1) + _struct.pack("<d", v) + pb_field(2, 0) + pb_varint(ms)
                )
                parts.append(pb_len_delim(2, sample))
            ts_msgs.append(pb_len_delim(1, b"".join(parts)))
        body = b"".join(ts_msgs)
        if compress:
            body = bytes(pa.Codec("snappy").compress(body))
        return pd.DataFrame(
            [{"batch": str(pdf[batch].iloc[0]), "body": body}],
            columns=["batch", "body"],
        )

    return df.groupBy(batch).applyInPandas(encode_group, out_schema)


def remote_write_decode(
    df: DataFrame, bin_col: str = "body", compressed: bool = True
) -> DataFrame:
    """Decode remote-write bodies back into (metric, labels-json, value,
    timestamp) sample rows — the receiver side and the roundtrip check."""
    import json

    import pyarrow as pa

    from fluent_bit_spark.functions.msgpack_codec import pb_fields

    other = [c for c in df.columns if c != bin_col]
    schema = T.StructType(
        [df.schema[c] for c in other]
        + [
            T.StructField("metric", T.StringType()),
            T.StructField("labels", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField(TS_COL, T.TimestampType()),
        ]
    )
    import struct as _struct

    def run(batches):
        import datetime as dt

        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rec = rec._asdict()
                raw = rec.pop(bin_col)
                if raw is None:
                    continue
                raw = bytes(raw)
                if compressed:
                    # raw snappy's leading varint is the uncompressed size
                    from fluent_bit_spark.functions.msgpack_codec import pb_read_varint

                    size, _ = pb_read_varint(raw, 0)
                    raw = bytes(pa.Codec("snappy").decompress(raw, size))
                for fno, _, ts_msg in pb_fields(raw):
                    if fno != 1:
                        continue
                    name, lbls, samples = None, {}, []
                    for f2, _, v2 in pb_fields(ts_msg):
                        if f2 == 1:  # Label
                            ln = lv = None
                            for f3, _, v3 in pb_fields(v2):
                                if f3 == 1:
                                    ln = v3.decode()
                                elif f3 == 2:
                                    lv = v3.decode()
                            if ln == "__name__":
                                name = lv
                            else:
                                lbls[ln] = lv
                        elif f2 == 2:  # Sample
                            val = ms = None
                            for f3, wt3, v3 in pb_fields(v2):
                                if f3 == 1:
                                    val = _struct.unpack("<d", v3.to_bytes(8, "little"))[0]
                                elif f3 == 2:
                                    # int64 varint: sign-extend 10-byte
                                    # two's-complement negatives
                                    ms = v3 - (1 << 64) if v3 >= (1 << 63) else v3
                            samples.append((val, ms))
                    for val, ms in samples:
                        ts_v = _event_ts(ms // 1000, (ms % 1000) * 1000)
                        if ts_v is None:
                            continue  # out-of-range epoch: skip
                        rows.append(
                            {
                                **{c: rec[c] for c in other},
                                "metric": name,
                                "labels": json.dumps(lbls, sort_keys=True),
                                "value": val,
                                TS_COL: ts_v,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[*other, "metric", "labels", "value", TS_COL]
            )

    return df.mapInPandas(run, schema)


# --------------------------------------------------------------------------
# OTLP traces — ExportTraceServiceRequest JSON (ctraces analog)
# --------------------------------------------------------------------------
OTLP_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _OTLP_ATTR_T)]),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [T.StructField("name", T.StringType())]
                                            ),
                                        ),
                                        T.StructField(
                                            "spans",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                        T.StructField("parentSpanId", T.StringType()),
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("kind", T.LongType()),
                                                        T.StructField("startTimeUnixNano", T.StringType()),
                                                        T.StructField("endTimeUnixNano", T.StringType()),
                                                        T.StructField("attributes", _OTLP_ATTR_T),
                                                        T.StructField(
                                                            "status",
                                                            T.StructType(
                                                                [T.StructField("code", T.LongType())]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def otlp_traces_encode(
    df: DataFrame,
    trace_id_col: str = "trace_id",
    span_id_col: str = "span_id",
    parent_col: str | None = None,
    name_col: str = "name",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    kind_col: str | None = None,
    status_code_col: str | None = None,
    attr_cols: list[str] | None = None,
    resource_attributes: dict[str, str] | None = None,
    scope_name: str = "fluent-bit-spark",
    batch_col: str | None = None,
) -> DataFrame:
    """Encode span rows as ExportTraceServiceRequest JSON lines (the
    ctraces signal the reference carries for out_opentelemetry traces —
    lib/ctraces/ span model: trace/span/parent ids, name, kind,
    start/end ns, attributes, status). Same batch/collect_list shape as
    otlp_logs_encode: one request per ``batch_col`` group, all JVM-side.
    """
    attr_cols = attr_cols or []
    span = F.struct(
        F.col(trace_id_col).cast("string").alias("traceId"),
        F.col(span_id_col).cast("string").alias("spanId"),
        (F.col(parent_col) if parent_col else F.lit("")).cast("string").alias("parentSpanId"),
        F.col(name_col).cast("string").alias("name"),
        (F.col(kind_col) if kind_col else F.lit(1)).cast("long").alias("kind"),
        (F.unix_micros(F.col(start_col).cast("timestamp")) * 1000)
        .cast("string").alias("startTimeUnixNano"),
        (F.unix_micros(F.col(end_col).cast("timestamp")) * 1000)
        .cast("string").alias("endTimeUnixNano"),
        F.array(*[_otlp_attr(c, F.col(c)) for c in attr_cols]).alias("attributes"),
        F.struct(
            (F.col(status_code_col) if status_code_col else F.lit(0))
            .cast("long").alias("code")
        ).alias("status"),
    )
    res_attrs = F.array(
        *[_otlp_attr(k, F.lit(v)) for k, v in (resource_attributes or {}).items()]
    )
    grouped = (
        df.groupBy(
            F.col(batch_col).alias("__batch") if batch_col else F.lit(0).alias("__batch")
        ).agg(F.collect_list(span).alias("__spans"))
    )
    req = F.struct(
        F.array(
            F.struct(
                F.struct(res_attrs.alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                        F.col("__spans").alias("spans"),
                    )
                ).alias("scopeSpans"),
            )
        ).alias("resourceSpans")
    )
    return grouped.select(F.col("__batch").alias("batch"), F.to_json(req).alias("otlp_json"))


def otlp_traces_decode(df: DataFrame, json_col: str = "otlp_json") -> DataFrame:
    """Decode OTLP/JSON trace payloads into flat span rows: three
    generator expansions (resourceSpans -> scopeSpans -> spans), zero
    UDFs — mirrors otlp_logs_decode.

    Like otlp_metrics_decode, one repartition sits between the envelope
    explosion and the per-SPAN explosion: fused whole-stage codegen
    otherwise re-materializes the request-sized remaining subtree once
    per span (requests carry thousands of spans), and a handful of
    multi-MB request rows pins the whole decode to a few tasks. The
    shuffle moves pruned (resource attrs, scope name, spans array) rows
    only, then the span explode fans out across executors."""
    parsed = df.select(F.from_json(F.col(json_col), OTLP_TRACES_SCHEMA).alias("r"))
    rs = parsed.select(F.explode("r.resourceSpans").alias("rs"))
    ss = rs.select(
        F.col("rs.resource.attributes").alias("__res_attrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    )
    pruned = ss.select(
        "__res_attrs",
        F.col("ss.scope.name").alias("scope_name"),
        F.col("ss.spans").alias("__spans"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    sp = pruned.select(
        "__res_attrs",
        "scope_name",
        F.explode("__spans").alias("sp"),
    )

    return sp.select(
        F.col("sp.traceId").alias("trace_id"),
        F.col("sp.spanId").alias("span_id"),
        F.col("sp.parentSpanId").alias("parent_span_id"),
        F.col("sp.name").alias("name"),
        F.col("sp.kind").alias("kind"),
        F.timestamp_micros(
            F.expr("CAST(sp.startTimeUnixNano AS BIGINT) div 1000")
        ).alias("start_ts"),
        F.timestamp_micros(
            F.expr("CAST(sp.endTimeUnixNano AS BIGINT) div 1000")
        ).alias("end_ts"),
        F.col("sp.status.code").alias("status_code"),
        _otlp_attrs_to_map(F.col("sp.attributes")).alias("attributes"),
        _otlp_attrs_to_map(F.col("__res_attrs")).alias("resource"),
        "scope_name",
    )


# --------------------------------------------------------------------------
# OTLP metrics — ExportMetricsServiceRequest JSON (cmetrics analog)
# --------------------------------------------------------------------------
OTLP_METRICS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _OTLP_ATTR_T)]),
                        ),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [T.StructField("name", T.StringType())]
                                            ),
                                        ),
                                        T.StructField(
                                            "metrics",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("unit", T.StringType()),
                                                        T.StructField(
                                                            "gauge",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "dataPoints",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("timeUnixNano", T.StringType()),
                                                                                    T.StructField("asDouble", T.DoubleType()),
                                                                                    T.StructField("attributes", _OTLP_ATTR_T),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "sum",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "dataPoints",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("timeUnixNano", T.StringType()),
                                                                                    T.StructField("asDouble", T.DoubleType()),
                                                                                    T.StructField("attributes", _OTLP_ATTR_T),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    ),
                                                                    T.StructField("isMonotonic", T.BooleanType()),
                                                                    T.StructField("aggregationTemporality", T.LongType()),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def otlp_metrics_encode(
    df: DataFrame,
    name_col: str = "metric_name",
    value_col: str = "value",
    metric_type_col: str | None = None,
    label_cols: list[str] | None = None,
    unit: str = "1",
    resource_attributes: dict[str, str] | None = None,
    scope_name: str = "fluent-bit-spark",
    ts_col: str = TS_COL,
    batch_col: str | None = None,
) -> DataFrame:
    """Encode metric rows as ExportMetricsServiceRequest JSON — the
    cmetrics context the reference carries (cmetrics.h:26-30 counter/
    gauge types map to OTLP sum/gauge). One request per (metric name,
    ``batch_col`` group); each row becomes one data point with its labels
    as attributes. Counters (metric_type 'counter') emit monotonic
    cumulative sums, everything else gauges. All JVM-side.

    At scale ALWAYS pass ``batch_col`` (a label, tag, or time window):
    the per-group collect_list is the request body, so the batch key is
    what bounds a single request's size — the chunk-granularity batching
    the reference gets from its 2 MB chunks.
    """
    label_cols = label_cols or []
    mtype = (
        F.col(metric_type_col) if metric_type_col else F.lit("gauge")
    ).cast("string")
    dp = F.struct(
        (F.unix_micros(F.col(ts_col).cast("timestamp")) * 1000)
        .cast("string").alias("timeUnixNano"),
        F.col(value_col).cast("double").alias("asDouble"),
        F.array(*[_otlp_attr(c, F.col(c)) for c in label_cols]).alias("attributes"),
    )
    grouped = df.groupBy(
        F.col(name_col).alias("__name"),
        mtype.alias("__type"),
        (F.col(batch_col) if batch_col else F.lit(0)).alias("__batch"),
    ).agg(F.collect_list(dp).alias("__dps"))
    gauge = F.when(
        F.col("__type") != "counter",
        F.struct(F.col("__dps").alias("dataPoints")),
    )
    msum = F.when(
        F.col("__type") == "counter",
        F.struct(
            F.col("__dps").alias("dataPoints"),
            F.lit(True).alias("isMonotonic"),
            F.lit(2).cast("long").alias("aggregationTemporality"),  # CUMULATIVE
        ),
    )
    metric = F.struct(
        F.col("__name").alias("name"),
        F.lit(unit).alias("unit"),
        gauge.alias("gauge"),
        msum.alias("sum"),
    )
    res_attrs = F.array(
        *[_otlp_attr(k, F.lit(v)) for k, v in (resource_attributes or {}).items()]
    )
    req = F.struct(
        F.array(
            F.struct(
                F.struct(res_attrs.alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                        F.array(metric).alias("metrics"),
                    )
                ).alias("scopeMetrics"),
            )
        ).alias("resourceMetrics")
    )
    return grouped.select(
        F.col("__name").alias("metric"),
        F.col("__batch").alias("batch"),
        F.to_json(req).alias("otlp_json")
    )


def otlp_metrics_decode(df: DataFrame, json_col: str = "otlp_json") -> DataFrame:
    """Decode OTLP/JSON metric payloads into flat data-point rows
    (metric_name, metric_type, ts, value, attributes map).

    Unlike the logs/traces decoders, a repartition sits between the
    envelope explosion and the data-point explosion: whole-stage codegen
    otherwise fuses all four Generates into one stage whose per-row copy
    re-materializes the multi-MB remaining subtree once per data point —
    measured as a heap blowup on ~2 MB requests. The shuffle both breaks
    that fusion (the point explode then reads a pruned (metadata, points
    array) row) and spreads per-request decode across executors, which is
    the layout a scrape/ingest fleet wants anyway."""
    parsed = df.select(F.from_json(F.col(json_col), OTLP_METRICS_SCHEMA).alias("r"))
    rm = parsed.select(F.explode("r.resourceMetrics").alias("rm"))
    sm = rm.select(
        F.col("rm.resource.attributes").alias("__res_attrs"),
        F.explode("rm.scopeMetrics").alias("sm"),
    )
    mt = sm.select(
        "__res_attrs",
        F.col("sm.scope.name").alias("scope_name"),
        F.explode("sm.metrics").alias("m"),
    )
    pruned = mt.select(
        "__res_attrs",
        "scope_name",
        F.col("m.name").alias("metric_name"),
        F.col("m.unit").alias("unit"),
        F.when(F.col("m.sum").isNotNull(), "counter")
        .otherwise("gauge").alias("metric_type"),
        F.coalesce(F.col("m.sum.dataPoints"), F.col("m.gauge.dataPoints")).alias(
            "__dps"
        ),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    dps = pruned.select(
        "__res_attrs",
        "scope_name",
        "metric_name",
        "unit",
        "metric_type",
        F.explode("__dps").alias("dp"),
    )

    return dps.select(
        "metric_name",
        "metric_type",
        "unit",
        F.timestamp_micros(
            F.expr("CAST(dp.timeUnixNano AS BIGINT) div 1000")
        ).alias(TS_COL),
        F.col("dp.asDouble").alias("value"),
        _otlp_attrs_to_map(F.col("dp.attributes")).alias("attributes"),
        _otlp_attrs_to_map(F.col("__res_attrs")).alias("resource"),
        "scope_name",
    )


# --------------------------------------------------------------------------
# Prometheus text exposition — scrape-side parse (in_prometheus_scrape)
# --------------------------------------------------------------------------
_PROM_HEADER_RE = r"^# TYPE (\S+) (\S+)\s*$"
_PROM_SAMPLE_RE = r"^([^#{\s]+)(\{(.*)\})?\s+(\S+)(\s+(\S+))?\s*$"
_PROM_PAIR_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'


def _prom_unescape(c):
    # sentinel pass so an escaped backslash never re-combines with a
    # following quote/n escape
    s = F.regexp_replace(c, r"\\\\", "\u0000")
    s = F.regexp_replace(s, r'\\"', '"')
    s = F.regexp_replace(s, r"\\n", "\n")
    return F.regexp_replace(s, "\u0000", r"\\")


def _prom_labels(labels_col):
    """Parse a sample line's {k="v",...} body into a map, reversing the
    spec escaping."""
    keys = F.regexp_extract_all(labels_col, F.lit(_PROM_PAIR_RE), F.lit(1))
    vals = F.regexp_extract_all(labels_col, F.lit(_PROM_PAIR_RE), F.lit(2))
    return F.map_from_arrays(keys, F.transform(vals, _prom_unescape))


def prom_exposition_decode(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse Prometheus text-exposition pages back into metric rows — the
    scrape side of out_prometheus_exporter (the reference's
    in_prometheus_scrape consumes the same public format via cmetrics).

    Emits one row per sample line: (metric_name, metric_type from the
    page's ``# TYPE`` header, labels map, value double, ts_ms when the
    optional trailing timestamp is present). Pure Catalyst: regex
    extraction per line plus a broadcast join of the tiny header table
    onto the samples. Label values reverse the spec escaping (backslash,
    quote, newline) via a sentinel pass so ``\\\\`` before ``"`` decodes
    correctly.
    """
    l = F.col(line_col)
    lines = df.select(l.alias("__l"))
    headers = (
        lines.filter(F.col("__l").startswith("# TYPE "))
        .select(
            F.regexp_extract("__l", r"^# TYPE (\S+) (\S+)\s*$", 1).alias("metric_name"),
            F.regexp_extract("__l", r"^# TYPE (\S+) (\S+)\s*$", 2).alias("metric_type"),
        )
        .distinct()
    )
    raw = (
        lines.filter(
            ~F.col("__l").startswith("#") & (F.length(F.trim(F.col("__l"))) > 0)
        )
        .select(
            F.regexp_extract("__l", _PROM_SAMPLE_RE, 1).alias("metric_name"),
            F.regexp_extract("__l", _PROM_SAMPLE_RE, 3).alias("__labels"),
            F.regexp_extract("__l", _PROM_SAMPLE_RE, 4).alias("__val"),
            F.regexp_extract("__l", _PROM_SAMPLE_RE, 6).alias("__ts"),
        )
        # a line that fails the sample regex extracts to all-empty groups;
        # drop it rather than emit a nameless NULL-valued row
        .filter(F.col("metric_name") != "")
    )
    out = raw.select(
        "metric_name",
        _prom_labels(F.col("__labels")).alias("labels"),
        # try_cast: a malformed sample line degrades to a NULL value
        # instead of failing the scrape (and keeps the cast safe under
        # ANSI mode if the optimizer evaluates it speculatively)
        F.col("__val").try_cast("double").alias("value"),
        F.when(F.col("__ts") != "", F.col("__ts").try_cast("long")).alias("ts_ms"),
    )
    out = out.join(F.broadcast(headers), "metric_name", "left")
    # histogram/summary child series (name_bucket / name_sum / name_count)
    # carry their family's # TYPE header, which is keyed on the bare name —
    # strip the suffix and fall back to the family's type, but only when
    # the family is actually declared histogram/summary (a plain counter
    # legitimately named *_count must not inherit anything).
    fam_headers = headers.filter(
        F.col("metric_type").isin("histogram", "summary")
    ).select(
        F.col("metric_name").alias("__family"),
        F.col("metric_type").alias("__fam_type"),
    )
    out = out.withColumn(
        "__family", F.regexp_replace("metric_name", r"_(bucket|sum|count)$", "")
    ).join(F.broadcast(fam_headers), "__family", "left")
    return out.select(
        "metric_name",
        F.coalesce(
            "metric_type",
            F.when(F.col("metric_name") != F.col("__family"), F.col("__fam_type")),
        ).alias("metric_type"),
        "labels", "value", "ts_ms",
    )


def prom_exposition_decode_pages(
    df: DataFrame, page_col: str = "page"
) -> DataFrame:
    """STREAMING-shaped scrape decode: one input row per whole exposition
    PAGE (the unit a scrape actually produces), decoded without any join
    or aggregation — # TYPE headers become a per-row map literal, samples
    explode from the same row, so header scope is naturally the page and
    the plan is a stateless projection Structured Streaming accepts
    as-is (`readStream` the scrape dir with wholetext, then this).

    Same output contract as prom_exposition_decode, including
    histogram/summary child-series family typing. Per-page header maps
    also fix a subtle batch-mode hazard: the line-wise decoder's global
    header join would mix families if two scraped targets disagree on a
    metric's type — pages keep them separate."""
    lines = F.split(F.col(page_col), "\n")
    # the cast names the struct fields: aliases set INSIDE a higher-order
    # lambda don't survive analysis (they come out col1/col2), and the
    # first-wins dedup below needs e["key"] by name
    hdr_entries = F.array_distinct(
        F.transform(
            F.filter(lines, lambda l: l.startswith("# TYPE ")),
            lambda l: F.struct(
                F.regexp_extract(l, _PROM_HEADER_RE, 1).alias("key"),
                F.regexp_extract(l, _PROM_HEADER_RE, 2).alias("value"),
            ),
        )
    ).cast("array<struct<key:string,value:string>>")
    samples = F.filter(
        lines, lambda l: ~l.startswith("#") & (F.length(F.trim(l)) > 0)
    )
    rows = df.select(
        hdr_entries.alias("__hdrs"), F.explode(samples).alias("__l")
    ).select(
        "__hdrs",
        F.regexp_extract("__l", _PROM_SAMPLE_RE, 1).alias("metric_name"),
        F.regexp_extract("__l", _PROM_SAMPLE_RE, 3).alias("__labels"),
        F.regexp_extract("__l", _PROM_SAMPLE_RE, 4).alias("__val"),
        F.regexp_extract("__l", _PROM_SAMPLE_RE, 6).alias("__ts"),
    ).filter(F.col("metric_name") != "")
    # first declaration wins on duplicate # TYPE keys: map_from_entries
    # under the default mapKeyDedupPolicy=EXCEPTION would otherwise throw
    # on a page where a buggy exporter (or two concatenated targets)
    # declares the same metric twice — killing the whole streaming query
    # this decoder exists to keep alive
    hdr_keys = F.transform(F.col("__hdrs"), lambda e: e["key"])
    hmap = F.map_from_entries(
        F.filter(
            F.col("__hdrs"),
            lambda e, i: (F.array_position(hdr_keys, e["key"]) - 1) == i,
        )
    )
    family = F.regexp_replace("metric_name", r"_(bucket|sum|count)$", "")
    fam_type = F.element_at(hmap, family)
    return rows.select(
        "metric_name",
        F.coalesce(
            F.element_at(hmap, F.col("metric_name")),
            F.when(
                (F.col("metric_name") != family)
                & fam_type.isin("histogram", "summary"),
                fam_type,
            ),
        ).alias("metric_type"),
        _prom_labels(F.col("__labels")).alias("labels"),
        F.col("__val").try_cast("double").alias("value"),
        F.when(F.col("__ts") != "", F.col("__ts").try_cast("long")).alias("ts_ms"),
    )


def otlp_histogram_encode(
    df: DataFrame,
    buckets: tuple,
    name_col: str = "metric_name",
    label_cols: list[str] | None = None,
    count_col: str = "le_inf",
    sum_col: str = "sum_value",
    resource_attributes: dict[str, str] | None = None,
    scope_name: str = "fluent-bit-spark",
    ts_col: str | None = None,
    batch_col: str | None = None,
) -> DataFrame:
    """Encode log_to_metrics histogram rows (cumulative Prometheus-style
    le_* columns, cmetrics histogram type) as OTLP HistogramDataPoints:
    explicitBounds = the bucket boundaries, bucketCounts = the
    per-bucket (non-cumulative) counts derived by differencing the
    cumulative columns, count/sum carried through. One request per
    (metric name, ``batch_col`` group) — pass ``batch_col`` at scale so a
    hot metric's label sets don't accumulate into one giant request. All
    JVM-side arithmetic.
    """
    label_cols = label_cols or []

    def bname(b):
        return f"le_{b}".replace(".", "_")

    cum = [F.col(bname(b)) for b in buckets] + [F.col(count_col)]
    bucket_counts = [cum[0].cast("long").cast("string")] + [
        (cum[i] - cum[i - 1]).cast("long").cast("string")
        for i in range(1, len(cum))
    ]
    ts_expr = (
        (F.unix_micros(F.col(ts_col).cast("timestamp")) * 1000).cast("string")
        if ts_col
        else F.lit("0")
    )
    dp = F.struct(
        ts_expr.alias("timeUnixNano"),
        F.col(count_col).cast("long").cast("string").alias("count"),
        F.col(sum_col).cast("double").alias("sum"),
        F.array(*[F.lit(float(b)) for b in buckets]).alias("explicitBounds"),
        F.array(*bucket_counts).alias("bucketCounts"),
        F.array(*[_otlp_attr(c, F.col(c)) for c in label_cols]).alias("attributes"),
    )
    grouped = df.groupBy(
        F.col(name_col).alias("__name"),
        (F.col(batch_col) if batch_col else F.lit(0)).alias("__batch"),
    ).agg(F.collect_list(dp).alias("__dps"))
    res_attrs = F.array(
        *[_otlp_attr(k, F.lit(v)) for k, v in (resource_attributes or {}).items()]
    )
    metric = F.struct(
        F.col("__name").alias("name"),
        F.struct(
            F.col("__dps").alias("dataPoints"),
            F.lit(2).cast("long").alias("aggregationTemporality"),
        ).alias("histogram"),
    )
    req = F.struct(
        F.array(
            F.struct(
                F.struct(res_attrs.alias("attributes")).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit(scope_name).alias("name")).alias("scope"),
                        F.array(metric).alias("metrics"),
                    )
                ).alias("scopeMetrics"),
            )
        ).alias("resourceMetrics")
    )
    return grouped.select(
        F.col("__name").alias("metric"),
        F.col("__batch").alias("batch"),
        F.to_json(req).alias("otlp_json"),
    )


_OTLP_HIST_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "metrics",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField(
                                                            "histogram",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "dataPoints",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("timeUnixNano", T.StringType()),
                                                                                    T.StructField("count", T.StringType()),
                                                                                    T.StructField("sum", T.DoubleType()),
                                                                                    T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
                                                                                    T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                                                                    T.StructField("attributes", _OTLP_ATTR_T),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def otlp_histogram_decode(df: DataFrame, json_col: str = "otlp_json") -> DataFrame:
    """Decode OTLP histogram payloads into one row per (data point,
    boundary): (metric_name, attributes, le boundary or +Inf,
    cumulative_count) — re-accumulating the bucketCounts back to the
    Prometheus cumulative form the log_to_metrics operator emits."""
    parsed = df.select(F.from_json(F.col(json_col), _OTLP_HIST_SCHEMA).alias("r"))
    dp = (
        parsed.select(F.explode("r.resourceMetrics").alias("rm"))
        .select(F.explode("rm.scopeMetrics").alias("sm"))
        .select(F.explode("sm.metrics").alias("m"))
        .select(
            F.col("m.name").alias("metric_name"),
            F.explode("m.histogram.dataPoints").alias("dp"),
        )
    )

    counts = F.transform(F.col("dp.bucketCounts"), lambda c: c.cast("long"))
    bounds = F.concat(
        F.transform(F.col("dp.explicitBounds"), lambda b: b.cast("string")),
        F.array(F.lit("inf")),
    )
    # cumulative prefix over the (small, fixed-size) bucket array
    cum = F.transform(
        F.sequence(F.lit(1), F.size(counts)),
        lambda i: F.aggregate(
            F.slice(counts, 1, i), F.lit(0).cast("long"), lambda a, v: a + v
        ),
    )
    return dp.select(
        "metric_name",
        _otlp_attrs_to_map(F.col("dp.attributes")).alias("attributes"),
        F.col("dp.count").cast("long").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.explode(F.arrays_zip(bounds.alias("le"), cum.alias("cumulative"))).alias("z"),
    ).select(
        "metric_name",
        "attributes",
        "count",
        "sum",
        F.col("z.le").alias("le"),
        F.col("z.cumulative").alias("cumulative_count"),
    )
