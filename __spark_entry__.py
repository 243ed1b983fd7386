"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (Q1-style pricing summary
                  through the SP-dialect engine).
queries()      -> one callable per implemented operator from SURVEY.md §2
                  (+ the LLM-pipeline extensions); each (spark, sf_dir) ->
                  DataFrame.
oracle_sql()   -> equivalent DuckDB SQL per query — EVERY registry query
                  has one. Ops whose candidate generation depends on
                  engine-internal hashing (minhash/simhash/LSH/k-means)
                  emit invariant contracts (brute-force soundness and
                  exactness witnesses computed in-query) so their oracle
                  is a literal truth table; persistent homology replays
                  its SQL-expressible half (threshold-graph components)
                  and witnesses the sweep against an independent
                  reduction.

Determinism policy for oracle hash-matching:
- money/quantity sums go through DECIMAL(12,2)/(18,2) casts in BOTH engines
  (exact arithmetic -> bit-identical doubles after the final cast);
- averages are exact-decimal sums divided by counts, in double, both sides;
- genuinely float-accumulating results (regression forecast, cosine) are
  rounded to a tolerance far above both engines' accumulation error;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # module-level: stringified type hints on pandas UDFs
                     # (PEP 563 above) resolve against module globals

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluent_bit_spark.model import (
    TAG_COL,
    TS_COL,
    ensure_session_conf,
    events_as_stream_table,
    load_table,
)
from fluent_bit_spark.sp import SPContext

SF_SMOKE = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------
def _dec(col, p=12, s=2):
    return col.cast(f"decimal({p},{s})")


def _dsum(col, alias, p=18, s=2):
    """Exact decimal sum surfaced as double (matches DuckDB bit-for-bit)."""
    return F.sum(_dec(col, p, s)).cast("double").alias(alias)


def _events(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _sp_events_ctx(spark, sf_dir) -> SPContext:
    ctx = SPContext()
    ctx.register_stream("events", events_as_stream_table(spark, sf_dir))
    return ctx


def _docs(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a SMALL driver-of-work frame across the session's
    cores before an expensive Python (Arrow) derivation. The testdata
    parquet files are single-row-group — unsplittable — so every scan
    is ONE input partition, and a media mint + decode chain hung off it
    would run as a single task regardless of core count (guide §2.5
    input skew: "one huge unsplittable file ... repartition immediately
    after the read"; split-size knobs cannot help when the file has one
    row group). The exchange moves only the scan projection (ids or
    embedding rows); at production scale, where the input already has
    >= parallelism splits, this is a no-op."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the Phase-0 flagship): decimal-exact
    sums, group-by on two low-cardinality keys -> one shuffle with map-side
    partial aggregation; filter + 7-column projection push into the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(12,2)") - _dec(F.col("l_discount")))
    charge = disc_price * (F.lit(1).cast("decimal(12,2)") + _dec(F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec(F.col("l_discount"))).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_conf(spark)
    return q1_pricing_summary(spark, SF_SMOKE)


# --------------------------------------------------------------------------
# SP dialect queries
# --------------------------------------------------------------------------
def sp_projection(spark, sf_dir):
    ctx = SPContext()
    ctx.register_stream("lineitem", load_table(spark, sf_dir, "lineitem"))
    return ctx.sql(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM STREAM:lineitem "
        "WHERE l_quantity > 45;"
    )


def sp_where_coercion(spark, sf_dir):
    """Schemaless WHERE over a VariantType body: props JSON key compared
    numerically (fluent-bit string/number auto-conversion)."""
    ev = _events(spark, sf_dir).select(
        "event_id", F.lit("events").alias(TAG_COL), F.col("ts").alias(TS_COL),
        F.parse_json(F.col("props")).alias("body"),
    )
    ctx = SPContext()
    ctx.register_stream("ev", ev)
    return ctx.sql("SELECT event_id FROM STREAM:ev WHERE k > 50;")


def sp_projection_variant(spark, sf_dir):
    """Variant-body SELECT through the SP compiler's try_variant_get path
    (accessor.py:113-128, sp/compiler.py variant arms): the stream body is
    a parse_json VariantType holding scalars plus a nested map; the SP
    query projects top-level variant keys and a nested subkey with aliases
    and applies the numeric coercion grid on a variant leaf in WHERE.
    Variant outputs are cast to concrete types after the SP query (a
    presentation concern) so the DuckDB oracle replays from the source
    columns the JSON body was built from."""
    ev = _events(spark, sf_dir)
    body = F.parse_json(F.to_json(F.struct(
        F.col("event_type").alias("etype"),
        F.col("user_id").alias("uid"),
        F.struct(F.col("value").alias("v")).alias("meta"),
    )))
    src = ev.select(
        "event_id", F.lit("events").alias(TAG_COL), F.col("ts").alias(TS_COL),
        body.alias("body"),
    )
    ctx = SPContext()
    ctx.register_stream("ev", src)
    out = ctx.sql(
        "SELECT event_id, etype, uid, meta['v'] AS v "
        "FROM STREAM:ev WHERE uid >= 100;"
    )
    return out.select(
        "event_id",
        F.col("etype").try_cast("string").alias("etype"),
        F.col("uid").try_cast("long").alias("uid"),
        F.round(F.col("v").try_cast("double"), 6).alias("v"),
    )


def sp_tag_routing(spark, sf_dir):
    ctx = _sp_events_ctx(spark, sf_dir)
    return ctx.sql("SELECT event_id, user_id FROM TAG:'events.err*' WHERE value >= 10;")


def sp_window_tumbling(spark, sf_dir):
    ctx = _sp_events_ctx(spark, sf_dir)
    out = ctx.sql(
        "SELECT event_type, COUNT(*) AS cnt, SUM(value) AS sum_value "
        "FROM STREAM:events WINDOW TUMBLING (1 HOUR) GROUP BY event_type;"
    )
    return out.select(
        "window_start", "event_type", "cnt", F.round("sum_value", 6).alias("sum_value")
    )


def sp_window_hopping(spark, sf_dir):
    ctx = _sp_events_ctx(spark, sf_dir)
    out = ctx.sql(
        "SELECT COUNT(*) AS cnt FROM STREAM:events "
        "WINDOW HOPPING (1 HOUR, ADVANCE BY 30 MINUTE);"
    )
    return out.select("window_start", "cnt")


def sp_forecast(spark, sf_dir):
    ctx = _sp_events_ctx(spark, sf_dir)
    out = ctx.sql(
        "SELECT event_type, TIMESERIES_FORECAST(value, 3600) AS forecast "
        "FROM STREAM:events GROUP BY event_type;"
    )
    return out.select("event_type", F.round("forecast", 3).alias("forecast"))


def sp_snapshot_last(spark, sf_dir):
    ctx = _sp_events_ctx(spark, sf_dir)
    ctx.sql("CREATE SNAPSHOT recent AS SELECT * FROM STREAM:events LIMIT 100;")
    snap = ctx.sql("FLUSH SNAPSHOT recent AS SELECT * FROM STREAM:events WHERE value > 0;")
    return snap.select("event_id", "user_id", "event_type", "value")


def sp_create_stream_chain(spark, sf_dir):
    ctx = _sp_events_ctx(spark, sf_dir)
    ctx.sql(
        "CREATE STREAM hot WITH (tag='hot') AS "
        "SELECT user_id, value FROM TAG:'events.*' WHERE value > 100;"
    )
    return ctx.sql("SELECT user_id, COUNT(*) AS cnt, SUM(value) AS sv FROM STREAM:hot GROUP BY user_id;").select(
        "user_id", "cnt", F.round("sv", 6).alias("sv")
    )


# --------------------------------------------------------------------------
# operator queries
# --------------------------------------------------------------------------
def grep_filter(spark, sf_dir):
    from fluent_bit_spark.operators.grep import grep

    orders = load_table(spark, sf_dir, "orders")
    out = grep(
        orders,
        [("regex", "o_orderpriority", "^1-URGENT"), ("exclude", "o_orderstatus", "^F$")],
    )
    return out.select("o_orderkey", "o_orderpriority", "o_orderstatus")


def modify_rules(spark, sf_dir):
    from fluent_bit_spark.operators.modify import Condition, modify

    cust = load_table(spark, sf_dir, "customer")
    out = modify(
        cust,
        [
            ("rename", "c_name", "customer_name"),
            ("add", "channel", "retail"),
            ("copy", "c_mktsegment", "segment_copy"),
            ("remove", "c_nationkey"),
        ],
    )
    out = modify(
        out,
        [("set", "tier", "vip")],
        conds=[Condition("key_value_matches", "c_mktsegment", "^(BUILDING|MACHINERY)$")],
    )
    return out.select("c_custkey", "customer_name", "channel", "segment_copy", "tier")


def nest_lift_roundtrip(spark, sf_dir):
    from fluent_bit_spark.operators.nest import lift, nest

    cust = load_table(spark, sf_dir, "customer")
    nested = nest(cust, "c_a*", nest_under="profile", remove_prefix="c_")
    flat = lift(nested, "profile", add_prefix="p_")
    return flat.select("c_custkey", "p_acctbal")


def record_modifier_allowlist(spark, sf_dir):
    from fluent_bit_spark.operators.record_modifier import record_modifier

    sup = load_table(spark, sf_dir, "supplier")
    return record_modifier(
        sup, allowlist_keys=["s_suppkey", "s_name", "s_acctbal"], records={"env": "prod"}
    )


def parser_logfmt_roundtrip(spark, sf_dir):
    from fluent_bit_spark.functions.parsers import LogfmtParser
    from fluent_bit_spark.operators.parser_filter import parser_filter

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("id="), F.col("doc_id"), F.lit(" lang="), F.col("lang"),
            F.lit(" n="), F.col("n_chars"),
        ).alias("line"),
    )
    out = parser_filter(
        docs, "line", LogfmtParser(), fields=["id", "lang", "n"],
        types={"id": "int", "n": "int"}, reserve_data=True,
    )
    return out.select("doc_id", "id", "lang", "n")


def parser_ltsv_roundtrip(spark, sf_dir):
    from fluent_bit_spark.functions.parsers import LtsvParser
    from fluent_bit_spark.operators.parser_filter import parser_filter

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.concat_ws(
            "\t",
            F.concat(F.lit("user:"), F.col("user_id")),
            F.concat(F.lit("type:"), F.col("event_type")),
            F.concat(F.lit("val:"), F.col("value")),
        ).alias("line"),
    )
    out = parser_filter(
        ev, "line", LtsvParser(), fields=["user", "type", "val"],
        types={"user": "int", "val": "float"}, reserve_data=True,
    )
    return out.select("event_id", "user", "type", "val")


def parser_regex_access_log(spark, sf_dir):
    from fluent_bit_spark.functions.parsers import RegexParser
    from fluent_bit_spark.operators.parser_filter import parser_filter

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.concat(
            F.lit("10.0.0."), (F.col("user_id") % 256), F.lit(" - u"), F.col("user_id"),
            F.lit(' "GET /'), F.col("event_type"), F.lit('/'), F.col("event_id"),
            F.lit(' HTTP/1.0" '), F.when(F.col("value") > 100, 500).otherwise(200),
            F.lit(" "), F.col("event_id") % 4096,
        ).alias("line"),
    )
    pat = (
        r'(?P<remote>[^ ]+) - (?P<user>[^ ]+) "(?P<method>\S+) (?P<path>\S+) HTTP[^"]*" '
        r"(?P<code>\d+) (?P<size>\d+)"
    )
    out = parser_filter(
        ev, "line", RegexParser(pat, types={"code": "int", "size": "int"}),
        reserve_data=False,
    )
    return out.select("remote", "user", "method", "path", "code", "size")


def parser_json_props(spark, sf_dir):
    from fluent_bit_spark.functions.parsers import JsonParser
    from fluent_bit_spark.operators.parser_filter import parser_filter

    ev = _events(spark, sf_dir).select("event_id", "props")
    out = parser_filter(
        ev, "props", JsonParser(), fields=["k"], types={"k": "int"}, reserve_data=True
    )
    return out.select("event_id", "k")


def parser_syslog_preset(spark, sf_dir):
    """The shipped syslog-rfc5424 preset parser over synthesized lines."""
    from fluent_bit_spark.functions.parsers import preset_parser
    from fluent_bit_spark.operators.parser_filter import parser_filter

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.concat(
            F.lit("<"), (F.col("event_id") % 192), F.lit(">1 2024-01-01T10:00:00.000Z host"),
            F.col("user_id"), F.lit(" app"), F.col("user_id") % 7, F.lit(" "),
            F.col("event_id"), F.lit(" MSG"), F.col("event_id") % 10, F.lit(" - "),
            F.col("event_type"), F.lit(" value="), F.col("value"),
        ).alias("line"),
    )
    out = parser_filter(ev, "line", preset_parser("syslog-rfc5424"), reserve_data=True)
    return out.select("event_id", "pri", "host", "ident", F.col("pid").cast("long").alias("pid"), "msgid", "message")


def type_converter_casts(spark, sf_dir):
    from fluent_bit_spark.typecast import type_converter

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.lower(F.hex(F.col("n_chars"))).alias("hexval"),
        F.col("n_chars").cast("string").alias("n_str"),
    )
    out = type_converter(
        docs,
        [("n_str", "n_int", "int"), ("n_str", "n_float", "float"), ("hexval", "n_from_hex", "hex")],
    )
    return out.select("doc_id", "n_int", "n_float", "n_from_hex")


def throttle_rate(spark, sf_dir):
    from fluent_bit_spark.operators.throttle import throttle

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    out = throttle(ev, rate=5, interval_sec=3600, key="event_type", tiebreak=["event_id"])
    return out.select("event_id", "event_type")


def throttle_size_budget(spark, sf_dir):
    from fluent_bit_spark.operators.throttle import throttle_size

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    out = throttle_size(
        ev, max_bytes=40, size_col_expr=F.octet_length("props"),
        interval_sec=3600, key="event_type", tiebreak=["event_id"],
    )
    return out.select("event_id", "event_type")


def rewrite_tag_rules(spark, sf_dir):
    from fluent_bit_spark.operators.rewrite_tag import rewrite_tag

    ev = events_as_stream_table(spark, sf_dir)
    out = rewrite_tag(ev, [("event_type", "^(error|signup)$", "alert.$1", False)])
    return out.groupBy("tag").agg(F.count(F.lit(1)).alias("cnt"))


def log_to_metrics_counter(spark, sf_dir):
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    return log_to_metrics(
        ev, "counter", "events_total", label_keys=["event_type"], window_sec=3600
    )


def log_to_metrics_gauge(spark, sf_dir):
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    return log_to_metrics(ev, "gauge", "last_value", label_keys=["user_id"], value_field="value")


def log_to_metrics_histogram(spark, sf_dir):
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    return log_to_metrics(
        ev, "histogram", "value_hist", label_keys=["event_type"],
        value_field="value", buckets=(10.0, 50.0, 100.0),
    )


def cumulative_to_delta_q(spark, sf_dir):
    from fluent_bit_spark.operators.cumulative_to_delta import cumulative_to_delta

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    out = cumulative_to_delta(ev, "value", ["user_id"], time_col=TS_COL)
    return out.select("event_id", "user_id", F.round("value_delta", 6).alias("value_delta"))


def sampling_deterministic(spark, sf_dir):
    from fluent_bit_spark.operators.sampling import sample_probabilistic

    ev = _events(spark, sf_dir)
    out = sample_probabilistic(
        ev, 20, key="event_id",
        bucket_expr=(F.col("event_id") * F.lit(2654435761)) % F.lit(97),
    )
    return out.select("event_id", "event_type")


def sampling_tail_traces(spark, sf_dir):
    from fluent_bit_spark.operators.sampling import sample_tail

    ev = _events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("trace_id"),
        F.col("ts").cast("double").alias("start_ts"),
        (F.col("ts").cast("double") + F.col("value")).alias("end_ts"),
        F.when(F.col("event_type") == "error", "ERROR").otherwise("OK").alias("status"),
        "event_id",
    )
    out = sample_tail(ev, min_span_count=80, status_col="status")
    return out.select("event_id", "trace_id")


def checklist_watch(spark, sf_dir):
    from fluent_bit_spark.operators.lookup import checklist

    ev = _events(spark, sf_dir)
    watch = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") < 150)
    ).select(F.col("c_custkey").cast("string").alias("uid"))
    out = checklist(
        ev.withColumn("uid_str", F.col("user_id").cast("string")),
        watch, key="uid_str", list_key="uid", set_values={"watched": True},
    )
    return out.select("event_id", "user_id", F.coalesce(F.col("watched"), F.lit(False)).alias("watched"))


def enrich_broadcast_join(spark, sf_dir):
    from fluent_bit_spark.operators.lookup import enrich

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    joined = enrich(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), sup, on="s_suppkey",
        select_map={"s_name": "supplier_name"},
    )
    return joined.groupBy("supplier_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(12,2)") - _dec(F.col("l_discount")))
        ).cast("double").alias("revenue"),
    )


def multiline_sessionize(spark, sf_dir):
    from fluent_bit_spark.operators.multiline import multiline

    ev = _events(spark, sf_dir).select(
        F.col("event_id").alias("seq"),
        F.when(
            F.col("event_id") % 4 == 0, F.concat(F.lit("E "), F.col("event_type"))
        ).otherwise(F.concat(F.lit("  at "), F.col("event_type"))).alias("line"),
    )
    out = multiline(ev, line_col="line", seq_col="seq", start_pattern=r"^\S")
    return out.select("seq", "message", "n_lines")


def expect_assertions(spark, sf_dir):
    from fluent_bit_spark.operators.expect import expect

    li = load_table(spark, sf_dir, "lineitem")
    return expect(
        li, [("key_exists", "l_orderkey"), ("key_val_is_not_null", "l_shipdate")],
        action="count",
    )


def router_split(spark, sf_dir):
    from fluent_bit_spark.operators.routing import route
    from fluent_bit_spark.operators.conditions import Rule

    ev = events_as_stream_table(spark, sf_dir)
    routes = route(
        ev,
        {
            "errors": "events.error",
            "clicky": "events.c*",
            "big": ("*", [Rule("value", "gt", 150)]),
        },
    )
    parts = [
        df.select(F.lit(name).alias("route"), "event_id") for name, df in routes.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("route").agg(F.count(F.lit(1)).alias("cnt"))


def union_tag_merge(spark, sf_dir):
    ev = events_as_stream_table(spark, sf_dir)
    a = ev.filter(F.col(TAG_COL) == "events.error")
    b = ev.filter(F.col(TAG_COL) == "events.signup")
    return a.unionByName(b).groupBy(TAG_COL).agg(F.count(F.lit(1)).alias("cnt"))


def content_modifier_actions(spark, sf_dir):
    from fluent_bit_spark.operators.content_modifier import content_modifier

    ev = _events(spark, sf_dir).select("event_id", "event_type", "props")
    out = content_modifier(ev, "extract", "props", pattern=r'"k":\s*(?P<kstr>\d+)')
    out = content_modifier(out, "convert", "kstr", converted_type="int")
    out = content_modifier(out, "hash", "event_type")
    out = content_modifier(out, "upsert", "env", value="prod")
    return out.select(
        "event_id", F.col("kstr").alias("k_int"), F.col("event_type").alias("etype_sha"), "env"
    )


def labels_ops(spark, sf_dir):
    from fluent_bit_spark.operators.labels import (
        columns_to_labels,
        labels_modify,
        labels_to_columns,
    )
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    m = log_to_metrics(ev, "counter", "events_total", label_keys=["event_type"])
    m = columns_to_labels(m, ["event_type"])
    m = labels_modify(
        m,
        [
            ("insert", "env", "prod"),
            ("upsert", "job", "fb"),
            ("hash", "event_type"),
            ("delete", "metric_type"),
        ],
    )
    out = labels_to_columns(m, ["event_type", "env", "job"])
    return out.select(
        "metric_name", F.col("event_type").alias("etype_sha"), "env", "job", "value"
    )


def metrics_selector_q(spark, sf_dir):
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics
    from fluent_bit_spark.operators.metrics_selector import metrics_selector

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    counters = log_to_metrics(ev, "counter", "events_total", label_keys=["event_type"])
    gauges = log_to_metrics(ev, "gauge", "last_value", label_keys=["event_type"], value_field="value")
    both = counters.unionByName(gauges)
    sel = metrics_selector(both, "events_", operation_type="prefix")
    return sel.select("metric_name", "metric_type", "event_type", F.round("value", 6).alias("value"))


def otel_envelope_q(spark, sf_dir):
    from fluent_bit_spark.operators.otel_envelope import otel_envelope

    ev = _events(spark, sf_dir).select("event_id")
    out = otel_envelope(
        ev, resource_attributes={"service.name": "events-pipeline"},
        scope_name="fbs", scope_version="1.0",
    )
    return out.select(
        "event_id",
        F.col("group_metadata.resource_id").alias("resource_id"),
        F.col("resource").getItem("service.name").alias("service"),
        F.col("scope.name").alias("scope_name"),
    )


def log_to_metrics_summary(spark, sf_dir):
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    out = log_to_metrics(
        ev, "summary", "value_summary", label_keys=["event_type"],
        value_field="value", quantiles=(0.5, 0.9),
    )
    return out.select(
        "metric_name", "metric_type", "event_type",
        F.round("q_0_5", 6).alias("q_0_5"), F.round("q_0_9", 6).alias("q_0_9"),
        F.round("sum_value", 6).alias("sum_value"), "count_value",
    )


def anomaly_zscore(spark, sf_dir):
    from fluent_bit_spark.extensions.anomaly import anomaly_scores

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    out = anomaly_scores(
        ev, "value", ["user_id"], time_col=TS_COL,
        window_rows=10, z_threshold=2.5, tiebreak=["event_id"],
    )
    return out.select(
        "event_id", "user_id",
        F.round("z_score", 6).alias("z_score"),
        F.round("range_ratio", 6).alias("range_ratio"),
        "is_anomaly",
    )


def robust_anomaly_q(spark, sf_dir):
    """Median/MAD robust outlier scoring per user series (Iglewicz &
    Hoadley modified z-score) — the contamination-proof companion to
    the rolling z-score; exact quantile_cont replay in DuckDB."""
    from fluent_bit_spark.extensions.anomaly import robust_anomaly_scores

    ev = _events(spark, sf_dir)
    out = robust_anomaly_scores(ev, "value", ["user_id"], z_threshold=3.5)
    return out.select(
        "event_id", "user_id",
        F.round("med", 6).alias("med"),
        "mad", "robust_z", "is_anomaly",
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: tight filter + single global aggregate — the plan
    should be scan-with-pushed-filters -> partial sum -> one-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def udf_hook_q(spark, sf_dir):
    """Lua-hook parity surface: drop / keep / modify / split codes over an
    Arrow-batched Python callback (the designated escape hatch)."""
    from fluent_bit_spark.operators.udf_hook import DROP, KEEP, MODIFIED, SPLIT, record_hook

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")

    def cb(tag, ts, rec):
        if rec["value"] < 10:
            return DROP, None, None
        if rec["event_type"] == "error":
            return SPLIT, None, [rec, {**rec, "event_id": -rec["event_id"], "value": rec["value"] * 2}]
        if rec["event_type"] == "signup":
            return MODIFIED, None, {**rec, "value": rec["value"] + 1000}
        return KEEP, None, None

    out = record_hook(ev, cb, tag_col="event_type", ts_col="__none__")
    return out.select("event_id", "event_type", F.round("value", 6).alias("value"))


def alter_size_take(spark, sf_dir):
    from fluent_bit_spark.operators.misc import alter_size

    ev = _events(spark, sf_dir)
    out = alter_size(ev, n=100, op="take", key="event_type", order_by=["event_id"])
    return out.select("event_id", "event_type")


def session_window_gap(spark, sf_dir):
    """Session windows (SURVEY §2.9 extension): 30-minute-gap sessions per
    user — F.session_window, state-store backed in streaming mode."""
    ev = _events(spark, sf_dir)
    out = ev.groupBy(
        F.session_window(F.col("ts"), "30 minutes"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("sv"))
    return out.select(
        F.col("session_window.start").alias("session_start"), "user_id", "cnt", "sv"
    )


def doc_chunking_q(spark, sf_dir):
    from fluent_bit_spark.extensions.chunking import chunk_documents

    docs = _docs(spark, sf_dir)
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    return out.select(
        "doc_id", "chunk_idx", "n_chunk_tokens", F.md5(F.col("chunk_text")).alias("chunk_md5")
    )


def chunk_packing_q(spark, sf_dir):
    """chunking -> concat-and-cut packing pipeline over documents."""
    from fluent_bit_spark.extensions.chunking import chunk_documents, pack_chunks

    docs = _docs(spark, sf_dir)
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).withColumn(
        "seq", F.col("doc_id") * 4096 + F.col("chunk_idx")
    )
    out = pack_chunks(chunks, token_budget=256, seq_col="seq")
    return out.select("doc_id", "chunk_idx", "pack_id", "pack_offset")


# --------------------------------------------------------------------------
# Spark-natural relational extensions (beyond the reference surface)
# --------------------------------------------------------------------------
def window_rank_topk(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def asof_last_signup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marker = F.when(F.col("event_type") == "signup", F.col("ts"))
    return ev.select(
        "event_id", "user_id",
        F.last(marker, ignorenulls=True).over(w).alias("last_signup_ts"),
    )


def pivot_status_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d = _dec(F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", d)).cast("double").alias("rev_open"),
        F.sum(F.when(F.col("l_linestatus") == "F", d)).cast("double").alias("rev_filled"),
    )


def join_q3_shipping(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    rev = j.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(
            _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(12,2)") - _dec(F.col("l_discount")))
        ).cast("double").alias("revenue")
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


def join_q5_region(spark, sf_dir):
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(
            _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(12,2)") - _dec(F.col("l_discount")))
        ).cast("double").alias("revenue")
    )


# --------------------------------------------------------------------------
# LLM-pipeline extensions
# --------------------------------------------------------------------------
def _docs_with_copies(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("   ")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs.unionByName(copies)


def dedup_exact_q(spark, sf_dir):
    from fluent_bit_spark.extensions.dedup import exact_dedup

    return exact_dedup(_docs_with_copies(spark, sf_dir)).select("doc_id")


def dedup_minhash_raw(spark, sf_dir):
    """The bare MinHash+LSH dedup (kept doc ids) — the benched form; the
    registry query wraps it in a soundness invariant the oracle can check."""
    from fluent_bit_spark.extensions.dedup import minhash_dedup

    return minhash_dedup(
        _docs_with_copies(spark, sf_dir), num_hashes=32, num_bands=16,
        jaccard_threshold=0.9,
    ).select("doc_id")


def dedup_minhash_q(spark, sf_dir):
    """MinHash+LSH dedup, SOUNDNESS-gated: which docs survive depends on
    engine-internal hash seeds, but the output CONTRACT does not — a doc
    may only be dropped if some smaller-id doc with exact shingle-Jaccard
    >= threshold exists (chains drop via intermediate partners, so the
    witness search spans ALL smaller-id docs, not just kept ones). The
    query emits one row per input doc with that invariant as a boolean;
    the oracle is the literal truth table, so any false drop hash-fails.
    The witness join is brute-force on purpose (dropped × smaller-id): an
    independent recomputation, not a replay of the LSH candidate path."""
    from fluent_bit_spark.extensions.dedup import minhash_dedup, with_shingle_hashes

    all_docs = _docs_with_copies(spark, sf_dir)
    kept = minhash_dedup(
        all_docs, num_hashes=32, num_bands=16, jaccard_threshold=0.9
    ).select("doc_id")
    dropped = all_docs.select("doc_id").join(kept, "doc_id", "left_anti")
    sh = with_shingle_hashes(all_docs, "text", "sh", 3, keep=["doc_id"])
    d = sh.join(F.broadcast(dropped), "doc_id", "left_semi").select(
        F.col("doc_id").alias("id_d"), F.col("sh").alias("sh_d")
    )
    o = sh.select(F.col("doc_id").alias("id_o"), F.col("sh").alias("sh_o"))
    inter = F.size(F.array_intersect("sh_d", "sh_o")).cast("double")
    union = F.size(F.array_union("sh_d", "sh_o")).cast("double")
    witness = (
        o.join(F.broadcast(d), F.col("id_o") < F.col("id_d"))
        .filter(F.when(union > 0, inter / union).otherwise(F.lit(0.0)) >= 0.9)
        .select(F.col("id_d").alias("doc_id"))
        .distinct()
    )
    return (
        all_docs.select("doc_id")
        .join(kept.withColumn("__k", F.lit(True)), "doc_id", "left")
        .join(witness.withColumn("__w", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce("__k", F.lit(False)) | F.coalesce("__w", F.lit(False))).alias("sound"),
        )
    )


def dedup_simhash_raw(spark, sf_dir):
    """Bare SimHash dedup (kept doc ids) — the benched form."""
    from fluent_bit_spark.extensions.dedup import simhash_dedup

    return simhash_dedup(_docs_with_copies(spark, sf_dir), hamming_threshold=2).select("doc_id")


def dedup_simhash_q(spark, sf_dir):
    """SimHash dedup, EXACTNESS-gated: with num_bands (4) > threshold+1
    (3), pigeonhole banding is lossless, so the dropped set must equal the
    brute-force definition exactly — {doc | ∃ smaller-id doc within
    hamming<=2 of its simhash}. The query emits (doc_id, exact) for every
    input doc, comparing the engine's banded drop decision against an
    all-pairs recomputation; the oracle is the literal truth table."""
    from fluent_bit_spark.extensions.dedup import simhash, simhash_dedup

    all_docs = _docs_with_copies(spark, sf_dir)
    kept = simhash_dedup(all_docs, hamming_threshold=2).select("doc_id")
    sh = simhash(all_docs)
    l = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    r = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    brute_losers = (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 2)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        all_docs.select("doc_id")
        .join(kept.withColumn("__k", F.lit(True)), "doc_id", "left")
        .join(brute_losers.withColumn("__b", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            # engine dropped it  <=>  brute force says drop it
            (F.coalesce("__k", F.lit(False)) != F.coalesce("__b", F.lit(False))).alias("exact"),
        )
    )


def dedup_jaccard_pairs_q(spark, sf_dir):
    """Brute-force word-set Jaccard >= 0.8 pairs among doc_id < 60 —
    oracle-checkable exact form of the near-dup verifier."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60)
    words = docs.select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
        ).alias("ws"),
    )
    a = words.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("wa"))
    b = words.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("wb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    union = F.size(F.array_union("wa", "wb")).cast("double")
    return pairs.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= 0.8)


def _emb_with_copies(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dups = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    return emb.unionByName(dups)


def embedding_dedup_q(spark, sf_dir):
    """Embedding cosine near-dup removal, SOUNDNESS-gated: the LSH bucket
    layout is engine-internal, but a vec may only be dropped if a
    smaller-id vec with exact cosine >= threshold exists. Emits one row
    per input vec with that invariant as a boolean (brute-force witness
    recomputation over dropped × smaller-id, independent of the bucketed
    candidate path); the oracle is the literal truth table."""
    from fluent_bit_spark.extensions.dedup import embedding_dedup
    from fluent_bit_spark.extensions.similarity import cosine

    allv = _emb_with_copies(spark, sf_dir)
    kept = embedding_dedup(allv, threshold=0.999).select("vec_id")
    dropped = allv.select("vec_id").join(kept, "vec_id", "left_anti")
    d = allv.join(F.broadcast(dropped), "vec_id", "left_semi").select(
        F.col("vec_id").alias("id_d"), F.col("embedding").alias("v_d")
    )
    o = allv.select(F.col("vec_id").alias("id_o"), F.col("embedding").alias("v_o"))
    witness = (
        o.join(F.broadcast(d), F.col("id_o") < F.col("id_d"))
        .filter(cosine(F.col("v_d"), F.col("v_o")) >= 0.999)
        .select(F.col("id_d").alias("vec_id"))
        .distinct()
    )
    return (
        allv.select("vec_id")
        .join(kept.withColumn("__k", F.lit(True)), "vec_id", "left")
        .join(witness.withColumn("__w", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            (F.coalesce("__k", F.lit(False)) | F.coalesce("__w", F.lit(False))).alias("sound"),
        )
    )


def semantic_dedup_q(spark, sf_dir):
    """SemDeDup (k-means + within-cluster cosine prune), SOUNDNESS-gated
    like embedding_dedup: the cluster layout is engine-internal, but a
    vec may only be dropped if ANOTHER vec with exact cosine >= eps
    exists (brute-force witness recomputation over dropped x all,
    independent of the clustered path); the oracle is the truth table."""
    from fluent_bit_spark.extensions.dedup import semantic_dedup
    from fluent_bit_spark.extensions.similarity import cosine

    eps = 0.999
    allv = _emb_with_copies(spark, sf_dir)
    kept = semantic_dedup(allv, n_clusters=8, eps=eps).select("vec_id")
    dropped = allv.select("vec_id").join(kept, "vec_id", "left_anti")
    d = allv.join(F.broadcast(dropped), "vec_id", "left_semi").select(
        F.col("vec_id").alias("id_d"), F.col("embedding").alias("v_d")
    )
    o = allv.select(F.col("vec_id").alias("id_o"), F.col("embedding").alias("v_o"))
    witness = (
        o.join(F.broadcast(d), F.col("id_o") != F.col("id_d"))
        .filter(cosine(F.col("v_d"), F.col("v_o")) >= eps)
        .select(F.col("id_d").alias("vec_id"))
        .distinct()
    )
    return (
        allv.select("vec_id")
        .join(kept.withColumn("__k", F.lit(True)), "vec_id", "left")
        .join(witness.withColumn("__w", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            (F.coalesce("__k", F.lit(False)) | F.coalesce("__w", F.lit(False))).alias("sound"),
        )
    )


def similarity_topk_q(spark, sf_dir):
    from fluent_bit_spark.extensions.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=5)
    return out.select("query_id", "vec_id", "rank", F.round("cos", 4).alias("cos"))


def _emb_and_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return emb, queries


def _ann_gate(ann, exact, k=5, min_hits=1):
    """Reduce an ANN top-k result to its oracle-checkable contract, per
    query: exactly k rows returned, the query's own vector retrieved
    (queries are corpus members, so exact rank-1 is self at cos 1.0 — an
    ANN that can't find it has broken candidate generation), and
    recall@k against the exact brute-force top-k >= min_hits/k. The
    thresholds are deterministic for fixed seeds/data; the synthetic
    embeddings are near-uniform (all cosines cluster), so high recall@5
    is not achievable by ANY sublinear method — self-retrieval plus a
    recall floor is the invariant that separates working from broken."""
    agg = ann.groupBy("query_id").agg(
        F.count("*").alias("n_returned"),
        F.max((F.col("vec_id") == F.col("query_id")).cast("int")).alias("__self"),
    )
    hits = (
        ann.join(exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("__hits"))
    )
    return agg.join(hits, "query_id", "left").select(
        "query_id",
        "n_returned",
        (F.col("__self") == 1).alias("self_found"),
        (F.coalesce("__hits", F.lit(0)) >= min_hits).alias("recall_ok"),
    )


def similarity_lsh_ann_raw(spark, sf_dir):
    """Bare LSH ANN top-k — the benched form."""
    from fluent_bit_spark.extensions.similarity import lsh_topk

    emb, queries = _emb_and_queries(spark, sf_dir)
    out = lsh_topk(emb, queries, k=5, nbits=6, tables=4)
    return out.select("query_id", "vec_id", "rank", F.round("cos", 4).alias("cos"))


def similarity_lsh_ann_q(spark, sf_dir):
    """Multi-table hyperplane-LSH ANN, invariant-gated against the
    already-oracled exact brute force (see _ann_gate)."""
    from fluent_bit_spark.extensions.similarity import cosine_topk, lsh_topk

    emb, queries = _emb_and_queries(spark, sf_dir)
    ann = lsh_topk(emb, queries, k=5, nbits=6, tables=4)
    exact = cosine_topk(emb, queries, k=5)
    return _ann_gate(ann, exact)


def similarity_ivf_ann_q(spark, sf_dir):
    """IVF coarse-quantizer ANN, invariant-gated against the exact brute
    force (see _ann_gate; centroids come from engine-internal
    deterministic sampling + float Lloyd iteration, so the top-k rows
    themselves are not SQL-replayable — the contract is)."""
    from fluent_bit_spark.extensions.similarity import cosine_topk, ivf_topk

    emb, queries = _emb_and_queries(spark, sf_dir)
    ann = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4)
    exact = cosine_topk(emb, queries, k=5)
    return _ann_gate(ann, exact)


def ann_served_q(spark, sf_dir):
    """The PERSISTED vector-index path end to end (the bm25_served
    pattern for ANN): build an IVF index and a PQ index, save each to
    parquet (ivf_index_save partitions the inverted lists by cid;
    pq_index_save persists the compressed codes), reload, and SERVE from
    the reloaded artifacts — no k-means jobs, no encode pass, no corpus
    scan in the serve plans. Output is the contract as a truth table,
    per query: the reloaded serve is row-for-row identical to serving
    from the in-memory build (a lossy save layout, a centroid/codebook
    roundtrip error, or a reload that silently rebuilds all flip it
    false), plus the standard _ann_gate invariants on the served IVF
    result against the exact brute force."""
    import hashlib
    import tempfile

    from fluent_bit_spark.extensions.similarity import (
        cosine_topk,
        ivf_index,
        ivf_index_load,
        ivf_index_save,
        ivf_topk_indexed,
        pq_index,
        pq_index_load,
        pq_index_save,
        pq_topk_indexed,
    )

    from concurrent.futures import ThreadPoolExecutor

    emb, queries = _emb_and_queries(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]

    # each top-k result is query_count x k rows but feeds 2-3 consumers
    # below (gate + multiset diff) — checkpoint so every serve plan runs
    # exactly once. The IVF chain and the PQ chain are fully independent
    # (and within each, the in-memory and reloaded serves are independent
    # after the save): overlap them as concurrent driver jobs so each
    # chain's small sequential jobs back-fill the other's idle slots.
    def _ivf_chain():
        ivf = ivf_index(emb, n_centroids=16, iters=2)
        ivf_path = f"{tempfile.gettempdir()}/fbs_ivf_index_{tag}"
        ivf_index_save(ivf, ivf_path)
        with ThreadPoolExecutor(max_workers=2) as inner:
            fm = inner.submit(
                lambda: ivf_topk_indexed(
                    ivf, queries, k=5, nprobe=4
                ).localCheckpoint(eager=True)
            )
            fs = inner.submit(
                lambda: ivf_topk_indexed(
                    ivf_index_load(spark, ivf_path), queries, k=5, nprobe=4
                ).localCheckpoint(eager=True)
            )
            return fm.result(), fs.result()

    def _pq_chain():
        pq = pq_index(emb, m=8, ksub=16, iters=3, sample=1024)
        pq_path = f"{tempfile.gettempdir()}/fbs_pq_index_{tag}"
        pq_index_save(pq, pq_path)
        with ThreadPoolExecutor(max_workers=2) as inner:
            fm = inner.submit(
                lambda: pq_topk_indexed(pq, queries, k=5).localCheckpoint(
                    eager=True
                )
            )
            fs = inner.submit(
                lambda: pq_topk_indexed(
                    pq_index_load(spark, pq_path), queries, k=5
                ).localCheckpoint(eager=True)
            )
            return fm.result(), fs.result()

    with ThreadPoolExecutor(max_workers=2) as pool:
        fivf, fpq = pool.submit(_ivf_chain), pool.submit(_pq_chain)
        (ivf_mem, ivf_srv), (pq_mem, pq_srv) = fivf.result(), fpq.result()

    def mismatches(a, b, score_col, flag):
        # +1/-1 multiset diff on the full row contract: any row present a
        # different number of times on the two sides surfaces as d != 0
        cols = ["query_id", "vec_id", "rank", F.round(score_col, 9).alias("s")]
        u = a.select(*cols).withColumn("w", F.lit(1)).unionByName(
            b.select(*cols).withColumn("w", F.lit(-1))
        )
        bad = (
            u.groupBy("query_id", "vec_id", "rank", "s")
            .agg(F.sum("w").alias("d"))
            .filter(F.col("d") != 0)
            .groupBy("query_id")
            .agg(F.count("*").alias("__bad"))
        )
        return bad.select("query_id", F.lit(False).alias(flag))

    gate = _ann_gate(ivf_srv, cosine_topk(emb, queries, k=5))
    return (
        gate.join(mismatches(ivf_mem, ivf_srv, "cos", "ivf_roundtrip"), "query_id", "left")
        .join(mismatches(pq_mem, pq_srv, "adist", "pq_roundtrip"), "query_id", "left")
        .select(
            "query_id",
            "n_returned",
            "self_found",
            "recall_ok",
            F.coalesce("ivf_roundtrip", F.lit(True)).alias("ivf_roundtrip"),
            F.coalesce("pq_roundtrip", F.lit(True)).alias("pq_roundtrip"),
        )
    )


def cluster_balanced_q(spark, sf_dir):
    """Diversity-balanced sampling (SemDeDup/DataComp cluster balancing):
    k-means over the embeddings, at most 50 kept per cluster. Cluster ids
    come from float Lloyd iteration, so the kept SET is not
    SQL-replayable — the output is the operator's CONTRACT as a literal
    truth table (the _ann_gate pattern): per-cluster kept counts equal
    min(cap, cluster size) under an independently recomputed assignment,
    the kept rows are a distinct subset of the input, and no cluster
    exceeds the cap. Any quota, assignment, or duplication bug flips a
    row to false and hash-fails."""
    from fluent_bit_spark.extensions.similarity import (
        assign_clusters, cluster_balanced_sample, kmeans_centroids,
    )

    from concurrent.futures import ThreadPoolExecutor

    emb, _ = _emb_and_queries(spark, sf_dir)
    emb = emb.select("vec_id", "embedding")
    # the operator chain and the witness's independent k-means re-train
    # are disjoint job chains: overlap them (guide: concurrent driver
    # jobs back-fill idle executor slots). kept is checkpointed because
    # THREE contract checks below consume it — un-pinned, each would
    # replay the whole assign+quota subtree.
    with ThreadPoolExecutor(max_workers=2) as pool:
        fk = pool.submit(
            lambda: cluster_balanced_sample(
                emb, cap=50, n_clusters=8
            ).localCheckpoint(eager=True)
        )
        fc = pool.submit(lambda: kmeans_centroids(emb, 8, 3))
        kept, cents = fk.result(), fc.result()
    sizes = assign_clusters(emb, cents).groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_all")
    )
    ksz = kept.groupBy("cid").agg(F.count(F.lit(1)).alias("n_kept"))
    per = sizes.join(ksz, "cid", "left").select(
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"), "n_all"
    )
    c1 = per.agg(
        F.every(F.col("n_kept") == F.least(F.lit(50), F.col("n_all"))).alias("ok")
    ).select(F.lit("kept_eq_min_cap_size").alias("chk"), "ok")
    c2 = kept.agg(
        (
            (F.count(F.lit(1)) == F.count_distinct(F.col("vec_id")))
        ).alias("ok")
    ).select(F.lit("kept_distinct").alias("chk"), "ok")
    c3 = (
        kept.join(emb.select("vec_id"), "vec_id", "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("ok"))
        .select(F.lit("kept_subset_of_input").alias("chk"), "ok")
    )
    return c1.unionByName(c2).unionByName(c3)


def _fuzzy_decontam_inputs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    planted = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  extra tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs.unionByName(planted), bench


def fuzzy_decontaminate_raw(spark, sf_dir):
    """Bare fuzzy decontamination (kept doc ids) — the benched form; the
    registry query wraps it in the soundness invariant."""
    from fluent_bit_spark.extensions.decontam import fuzzy_decontaminate

    corpus, bench = _fuzzy_decontam_inputs(spark, sf_dir)
    return fuzzy_decontaminate(corpus, bench, jaccard_threshold=0.5).select("doc_id")


def fuzzy_decontaminate_q(spark, sf_dir):
    """GPT-3-style fuzzy decontamination, SOUNDNESS-gated: the corpus
    (documents + planted paraphrases of the benchmark slice) is scrubbed
    of near-duplicates of the doc_id%97==0 benchmark set via MinHash
    banding + exact-Jaccard verify. Candidate generation is
    engine-hash-dependent, so the query emits the contract per input
    doc: a doc may only be dropped if some benchmark doc with exact
    shingle-Jaccard >= threshold exists (brute-force witness over
    dropped x bench — an independent recomputation). Oracle = literal
    truth table."""
    from fluent_bit_spark.extensions.decontam import fuzzy_decontaminate
    from fluent_bit_spark.extensions.dedup import with_shingle_hashes

    corpus, bench = _fuzzy_decontam_inputs(spark, sf_dir)
    kept = fuzzy_decontaminate(
        corpus, bench, jaccard_threshold=0.5
    ).select("doc_id")
    dropped = corpus.select("doc_id").join(kept, "doc_id", "left_anti")
    dsh = with_shingle_hashes(
        corpus.join(F.broadcast(dropped), "doc_id", "left_semi"),
        "text", "sh_d", 3, keep=["doc_id"],
    )
    bsh = with_shingle_hashes(bench, "text", "sh_b", 3, keep=[])
    inter = F.size(F.array_intersect("sh_d", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_d", "sh_b")).cast("double")
    witness = (
        dsh.crossJoin(F.broadcast(bsh))
        .filter(F.when(union > 0, inter / union).otherwise(F.lit(0.0)) >= 0.5)
        .select("doc_id")
        .distinct()
    )
    return (
        corpus.select("doc_id")
        .join(kept.withColumn("__k", F.lit(True)), "doc_id", "left")
        .join(witness.withColumn("__w", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce("__k", F.lit(False)) | F.coalesce("__w", F.lit(False))).alias("sound"),
        )
    )


def text_langid_q(spark, sf_dir):
    from fluent_bit_spark.extensions.text import lang_id

    return _docs(spark, sf_dir).select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def text_quality_q(spark, sf_dir):
    from fluent_bit_spark.extensions.text import quality_score

    out = quality_score(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "q_chars", "q_tokens",
        F.round("q_punct_ratio", 6).alias("q_punct_ratio"),
        F.round("q_stop_ratio", 6).alias("q_stop_ratio"),
        F.round("q_mean_word_len", 6).alias("q_mean_word_len"),
        "quality",
    )


def gopher_quality_q(spark, sf_dir):
    """Gopher quality-rule filter (Rae et al. 2021 A1.1): the published
    heuristic set — word-count band, mean word length, symbol ratio,
    bullet/ellipsis line fractions, alphabetic-word fraction, 2-of-8
    stopwords — as per-rule booleans + conjunctive keep. Pure projection;
    full hash check against an exact DuckDB replica."""
    from fluent_bit_spark.extensions.text import gopher_quality

    out = gopher_quality(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "g_words", "r_word_count", "r_mean_word_len",
        "r_symbol_ratio", "r_bullet_lines", "r_ellipsis_lines",
        "r_alpha_words", "r_stopwords", "keep",
    )


def _messy_urls(ev):
    """(doc_id, url): messy crawl URLs synthesized from event fields —
    mixed case, default/explicit ports, tracking params, unsorted query,
    trailing slashes, fragments. Shared by url_canonicalize / domain_cap
    and mirrored by the ORACLE_MESSY_URL_CTE the oracles derive canonical
    forms from; keep all four in sync."""
    eid, uid, et = F.col("event_id"), F.col("user_id"), F.col("event_type")
    url = F.concat(
        F.when(eid % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://WWW."), F.upper(et), (uid % 3).cast("string"), F.lit(".Com"),
        F.when(eid % 7 == 0, F.lit(":8080"))
        .when(eid % 2 == 0, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/p"), (eid % 50).cast("string"),
        F.when(eid % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?b=2&utm_source=feed&a=1"),
        F.when(eid % 5 == 0, F.lit("&fbclid=x")).otherwise(F.lit("")),
        F.lit("#sec"),
    )
    return ev.select(eid.alias("doc_id"), url.alias("url"))


def url_canonicalize_q(spark, sf_dir):
    """URL hygiene stage (C4/RefinedWeb preprocessing): synthesize messy
    crawl URLs from event fields (mixed case, default/explicit ports,
    tracking params, unsorted query, trailing slashes, fragments), then
    normalize + extract registrable domain + blocklist-filter + keep one
    doc per canonical URL. The oracle does NOT replay the parser — it
    CONSTRUCTS each canonical form directly from the same event fields,
    so parser and normalizer are verified against an independent
    derivation."""
    from fluent_bit_spark.extensions.urls import url_filter_dedup

    ev = _spread(_events(spark, sf_dir))
    docs = _messy_urls(ev)
    out = url_filter_dedup(docs, blocklist=("error1.com", "view2.com"))
    return out.select("doc_id", "norm_url", "domain")


def domain_cap_q(spark, sf_dir):
    """Per-domain document quota on top of the URL stage (the
    Common-Crawl cap-per-domain pass): canonical-URL dedup, then at most
    50 docs per registrable domain by ascending doc id. cap_per_key
    ranks ONLY over-cap keys (count + broadcast semi/anti split), so the
    ranking shuffle moves just the heavy domains' rows."""
    from fluent_bit_spark.extensions.mixing import cap_per_key
    from fluent_bit_spark.extensions.urls import url_filter_dedup

    ev = _spread(_events(spark, sf_dir))
    docs = _messy_urls(ev)
    deduped = url_filter_dedup(docs, blocklist=("error1.com", "view2.com"))
    return cap_per_key(deduped, ["domain"], ["doc_id"], 50).select(
        "doc_id", "domain"
    )


def lm_quality_q(spark, sf_dir):
    """Unigram LM quality scoring (the CCNet LM-filter shape, unigram
    core): model the doc_id%7==0 slice as the trusted target corpus,
    score every document's mean token log-prob under it with add-one
    smoothing. Deterministic; hash-exact against the DuckDB replica."""
    from fluent_bit_spark.extensions.text import unigram_logprob

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("doc_id") % 7 == 0)
    out = unigram_logprob(docs, target)
    return out.select(
        "doc_id", F.round("avg_logp", 6).alias("avg_logp"), "n_tokens"
    )


def dsir_select_q(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    bag models over target (doc_id%7==0) vs raw, per-doc mean gram
    log-ratio, deterministic-Gumbel top-k sample. The md5 bucket hash and
    the md5-prefix Gumbel make the selected SET a pure function of the
    data — the DuckDB oracle replays the whole pipeline hash-exact."""
    from fluent_bit_spark.extensions.dsir import dsir_select

    docs = _spread(_docs(spark, sf_dir))
    target = docs.filter(F.col("doc_id") % 7 == 0)
    return dsir_select(docs, target, k=50, buckets=1024)


def lm_bigram_quality_q(spark, sf_dir):
    """Interpolated bigram LM scoring (CCNet fidelity step past the
    unigram filter; Jelinek-Mercer lam=0.5 so both mixture weights are
    float-exact across engines). Target = the doc_id%7==0 slice; the
    DuckDB oracle replays unigram + bigram + context tables and the
    interpolation arithmetic."""
    from fluent_bit_spark.extensions.text import bigram_logprob

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("doc_id") % 7 == 0)
    out = bigram_logprob(docs, target, interpolation=0.5)
    return out.select(
        "doc_id", F.round("avg_logp", 6).alias("avg_logp"), "n_tokens"
    )


def ccnet_buckets_q(spark, sf_dir):
    """CCNet head/middle/tail split: rank every doc by its bigram-LM
    score and cut at exact 1/3-2/3 percentiles (computed distributed,
    two scalars to the driver — no global window). The oracle recomputes
    the same quantile_cont cutoffs over the same rounded scores."""
    from fluent_bit_spark.extensions.text import bigram_logprob, perplexity_buckets

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("doc_id") % 7 == 0)
    scores = bigram_logprob(docs, target, interpolation=0.5)
    out = perplexity_buckets(scores)
    return out.select(
        "doc_id", "bucket", F.round("avg_logp", 6).alias("avg_logp")
    )


def bm25_topk_q(spark, sf_dir):
    """Exact BM25 top-10 retrieval (Okapi formulation, Lucene idf): the
    query set is derived from the corpus itself (every 100th doc's first
    8 normalized words), so the whole pipeline — tf, dl, avgdl,
    query-vocab df, idf, score, rank — is a pure function of the data and
    the DuckDB oracle replays it end-to-end."""
    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.retrieval import bm25_topk

    docs = _docs(spark, sf_dir)
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8)
        ).alias("text"),
    )
    return bm25_topk(docs, queries, k=10)


def bm25_indexed_q(spark, sf_dir):
    """Build-once/query-many BM25: the offline impact index (bm25_index,
    full-vocab df/contributions + per-term top-C + cutoffs) served
    through bm25_topk_indexed (candidate join + exactness certificate;
    certificate failures re-run dense on the contribution table).
    Results are provably identical to bm25_topk, so the oracle is the
    same end-to-end SQL replay — a wrong candidate set, a wrong cutoff
    bound, or a missed fallback all hash-fail the row."""
    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.retrieval import (
        bm25_index, bm25_topk_indexed,
    )

    docs = _docs(spark, sf_dir)
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8)
        ).alias("text"),
    )
    idx = bm25_index(docs, c=50)
    return bm25_topk_indexed(idx, queries, k=10)


def bm25_served_q(spark, sf_dir):
    """The PERSISTED build-once/serve-many path end to end: build the
    impact index, bm25_index_save it to parquet, bm25_index_load it
    back, and serve bm25_topk_indexed from the reloaded frames — so a
    broken save layout, a lossy meta roundtrip, or a reload that
    silently rebuilds would all hash-fail against the same bm25_topk
    oracle (results are provably identical to the in-memory path)."""
    import hashlib
    import tempfile

    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.retrieval import (
        bm25_index, bm25_index_load, bm25_index_save, bm25_topk_indexed,
    )

    docs = _docs(spark, sf_dir)
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8)
        ).alias("text"),
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/fbs_bm25_index_{tag}"
    bm25_index_save(bm25_index(docs, c=50), path)
    return bm25_topk_indexed(bm25_index_load(spark, path), queries, k=10)


def _bm25_serve_path(sf_dir):
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/fbs_bm25_serveonly_{tag}"


def bm25_serve_setup(spark, sf_dir):
    """Bench setup for bm25_serve_only: build + save the index OUTSIDE
    the timer, so the benched number is the reload+serve cost alone —
    the number a capacity planner quotes for the build-once/serve-many
    deployment (the build half amortizes across every later query
    batch; bm25_served times the full cycle and conflates the two)."""
    from fluent_bit_spark.extensions.retrieval import bm25_index, bm25_index_save

    bm25_index_save(bm25_index(_docs(spark, sf_dir), c=50), _bm25_serve_path(sf_dir))


def bm25_serve_only_raw(spark, sf_dir):
    """Reload + serve against the index bm25_serve_setup persisted (falls
    back to building it when run standalone). Same queries and k as
    bm25_served."""
    import os

    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.retrieval import bm25_index_load, bm25_topk_indexed

    path = _bm25_serve_path(sf_dir)
    if not os.path.isdir(path):
        bm25_serve_setup(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8)
        ).alias("text"),
    )
    return bm25_topk_indexed(bm25_index_load(spark, path), queries, k=10)


def _ann_serve_path(sf_dir):
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/fbs_ann_serveonly_{tag}"


def ann_serve_setup(spark, sf_dir):
    """Bench setup for ann_serve_only: build + persist the IVF index
    outside the timer (the k-means and list materialization amortize
    across serving jobs)."""
    from fluent_bit_spark.extensions.similarity import ivf_index, ivf_index_save

    emb, _ = _emb_and_queries(spark, sf_dir)
    ivf_index_save(ivf_index(emb, n_centroids=16, iters=2), _ann_serve_path(sf_dir))


def ann_serve_only_raw(spark, sf_dir):
    """Reload + serve the persisted IVF index: probe assignment is a
    map-side matmul, candidates come off the cid-partitioned lists — the
    vector-retrieval serving cost."""
    import os

    from fluent_bit_spark.extensions.similarity import ivf_index_load, ivf_topk_indexed

    path = _ann_serve_path(sf_dir)
    if not os.path.isdir(path):
        ann_serve_setup(spark, sf_dir)
    _, queries = _emb_and_queries(spark, sf_dir)
    return ivf_topk_indexed(ivf_index_load(spark, path), queries, k=5, nprobe=4)


def _append_scratch(sf_dir, kind):
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/fbs_{kind}_append_{tag}"


def _multiset_diff_ids(a, b, id_col):
    """(id_col, __bad=True) for every id owning a row whose multiset count
    differs between ``a`` and ``b`` — the same verdict as
    a.exceptAll(b) ∪ b.exceptAll(a) but in ONE +1/-1 union-aggregate
    (one shuffle) instead of two generate-rewritten exceptAll subtrees;
    both compare rows with null-safe equality, so the flagged id set is
    identical."""
    u = a.withColumn("__w", F.lit(1)).unionByName(
        b.withColumn("__w", F.lit(-1))
    )
    return (
        u.groupBy(*a.columns)
        .agg(F.sum("__w").alias("__d"))
        .filter(F.col("__d") != 0)
        .select(id_col)
        .distinct()
        .withColumn("__bad", F.lit(True))
    )


def bm25_appended_q(spark, sf_dir):
    """Incremental BM25 index append, oracle-gated (retrieval.py
    bm25_index_append): build + persist the index on the EVEN-doc_id
    half, append the odd half (no access to the even corpus — the
    append re-derives tc/kept/cutoffs from the persisted postings with
    exactly recomputed global stats), reload through the manifest
    pointer, and serve. REFERENCE = a full in-memory rebuild on the
    union corpus. Truth table per query: the appended index's top-k
    rows are multiset-identical to the rebuild's (ids, ranks, AND
    6-decimal scores) — integer tf/dl/df sums make the recomputed
    n_docs/avgdl/idf bit-identical, so this is exact equality, not a
    tolerance check."""
    import shutil

    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.retrieval import (
        bm25_index, bm25_index_append, bm25_index_load, bm25_index_save,
        bm25_topk_indexed,
    )

    from concurrent.futures import ThreadPoolExecutor

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    path = _append_scratch(sf_dir, "bm25")
    shutil.rmtree(path, ignore_errors=True)  # appends are stateful: fresh run
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8)
        ).alias("text"),
    ).localCheckpoint(eager=True)

    # the appended-index chain and the union-rebuild REFERENCE chain are
    # fully independent — run them as concurrent driver jobs so the
    # reference build back-fills executor slots the append chain's
    # small sequential jobs leave idle (guide: overlap independent jobs)
    def _appended():
        bm25_index_save(bm25_index(even, c=20), path)
        bm25_index_append(spark, path, odd)
        return bm25_topk_indexed(
            bm25_index_load(spark, path), queries, k=5
        ).localCheckpoint(eager=True)

    def _rebuilt():
        return bm25_topk_indexed(
            bm25_index(docs, c=20), queries, k=5
        ).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa, fb = pool.submit(_appended), pool.submit(_rebuilt)
        served, rebuilt = fa.result(), fb.result()
    bad = _multiset_diff_ids(served, rebuilt, "query_id")
    return queries.select("query_id").join(bad, "query_id", "left").select(
        "query_id",
        F.col("__bad").isNull().alias("append_equals_rebuild"),
    )


def _bm25_append_only_path(sf_dir):
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/fbs_bm25_appendonly_{tag}"


def bm25_append_setup(spark, sf_dir):
    """Bench setup for bm25_append_only: build + persist the even-half
    base index OUTSIDE the timer (it amortizes across every later
    append), so the benched number is the operational append-freshness
    cost alone. bm25_appended keeps the full gated form — its 13-14 s is
    dominated by the PROOF (a union rebuild + multiset equality), which
    capacity planning should not quote as the append cost."""
    import shutil

    from fluent_bit_spark.extensions.retrieval import bm25_index, bm25_index_save

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    path = _bm25_append_only_path(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    bm25_index_save(bm25_index(even, c=20), path)


def bm25_append_only_raw(spark, sf_dir):
    """The operational append alone: absorb the odd-doc_id half into the
    persisted even-half index (postings re-derive + manifest flip,
    retrieval.py bm25_index_append) with NO rebuild-equality proof —
    that exactness is bm25_appended's oracle-gated job. Re-run-safe: the
    append writes an immutable version dir + manifest pointer, so each
    run first drops the pointer and appended versions (millisecond local
    fs ops), restoring the pristine base."""
    import glob
    import os
    import shutil

    from fluent_bit_spark.extensions.retrieval import bm25_index_append

    path = _bm25_append_only_path(sf_dir)
    if not os.path.isdir(path):
        bm25_append_setup(spark, sf_dir)
    for mf in glob.glob(os.path.join(path, "MANIFEST*")):
        os.remove(mf)
    for v in glob.glob(os.path.join(path, "v[0-9]*")):
        shutil.rmtree(v, ignore_errors=True)
    odd = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") % 2 == 1
    )
    n = bm25_index_append(spark, path, odd)
    return spark.range(1).select(F.lit(int(n)).alias("n_appended"))


def pq_appended_q(spark, sf_dir):
    """Incremental PQ index append, oracle-gated (similarity.py
    pq_index_append): build + persist on the even-vec half, append the
    odd half encoded against the EXISTING codebooks, reload, serve
    top-5 ADC for the standard query trio. REFERENCE = an index holding
    the same codebooks with the WHOLE corpus encoded in one pass — ADC
    distances depend only on (codebooks, codes), so the appended serve
    must be row-identical (multiset over ids, ranks, distances)."""
    import shutil

    from fluent_bit_spark.extensions.similarity import (
        pq_encode, pq_index, pq_index_append, pq_index_load, pq_index_save,
        pq_topk_indexed,
    )

    from concurrent.futures import ThreadPoolExecutor

    emb, queries = _emb_and_queries(spark, sf_dir)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    path = _append_scratch(sf_dir, "pq")
    shutil.rmtree(path, ignore_errors=True)
    pq = pq_index(half_a, m=8, ksub=16, iters=2, sample=1024)

    # after the shared codebook train, the append chain and the
    # whole-corpus reference encode are independent: overlap them
    def _served():
        pq_index_save(pq, path)
        pq_index_append(spark, path, half_b.select("vec_id", "embedding"))
        return pq_topk_indexed(
            pq_index_load(spark, path), queries, k=5
        ).localCheckpoint(eager=True)

    def _rebuilt():
        ref = {
            "codebooks": pq["codebooks"],
            "codes": pq_encode(emb, pq["codebooks"], "vec_id", "embedding"),
            "m": 8, "ksub": 16, "id_col": "vec_id", "vec_col": "embedding",
        }
        return pq_topk_indexed(ref, queries, k=5).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa, fb = pool.submit(_served), pool.submit(_rebuilt)
        served, rebuilt = fa.result(), fb.result()
    bad = _multiset_diff_ids(served, rebuilt, "query_id")
    return queries.select("query_id").join(bad, "query_id", "left").select(
        "query_id",
        F.col("__bad").isNull().alias("append_equals_rebuild"),
    )


def repeated_spans_q(spark, sf_dir):
    """Span-level duplication stats (distributed ExactSubstr signal, Lee
    et al. 2022): corpus = documents plus full copies of every 11th doc,
    so copied docs report dup_frac 1.0 and originals report exactly the
    windows their copies re-emit. Hash-exact DuckDB replay of the whole
    derivation (md5 span hashes, corpus-wide counts, per-doc fractions)."""
    from fluent_bit_spark.extensions.text import repeated_span_stats

    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    return repeated_span_stats(corpus, window=10)


def exact_substr_trim_q(spark, sf_dir):
    """ExactSubstr span REMOVAL (Lee et al. 2022) — the trimming stage
    repeated_spans only detects: corpus = documents plus full copies of
    every 11th doc, window=10; copies trim to "" (their canonical copy
    keeps the text), partial overlaps cut only the shared token ranges.
    The whole derivation (md5 window hashes, first-occurrence-keeps
    policy, gaps-and-islands interval merge, positional token rebuild)
    replays hash-exact in DuckDB."""
    from fluent_bit_spark.extensions.text import exact_substr_trim

    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    return exact_substr_trim(corpus, window=10)


def span_decontaminate_q(spark, sf_dir):
    """Span-level decontamination (the span-granular cousin of the
    doc-drop `decontaminate`): benchmark = the first 12 normalized
    tokens of every 13th doc (stand-in eval prompts), window=10 — every
    corpus occurrence of a benchmark span is cut, contaminated docs keep
    their clean remainder. Broadcast benchmark-hash semi join: the corpus
    never shuffles on text."""
    from fluent_bit_spark.extensions.dedup import normalize_text
    from fluent_bit_spark.extensions.text import exact_substr_trim_against

    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))
    bench = docs.filter(F.col("doc_id") % 13 == 0).select(
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 12)
        ).alias("text")
    )
    return exact_substr_trim_against(docs, bench, window=10)


def token_budget_select_q(spark, sf_dir):
    """Greedy per-language token-budget realization (mixture weights ->
    actual selection): longest-docs-first priority, budget 20k chars for
    'en' / 8k for the rest; the crossing doc is included, under-budget
    languages keep everything. Exact prefix-sum replay in DuckDB."""
    from fluent_bit_spark.extensions.mixing import token_budget_select

    return token_budget_select(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        "lang",
        [F.col("n_chars").desc(), F.col("doc_id")],
        budget=8000,
        token_col="n_chars",
        budgets={"en": 20000},
    )


def shuffle_shards_q(spark, sf_dir):
    """Deterministic training-order reshuffle: every doc placed into one
    of 8 shards with an intra-shard position, a pure function of
    (doc_id, seed) — the md5-prefix shard + full-digest rank replayed
    verbatim by the oracle."""
    from fluent_bit_spark.extensions.mixing import shuffle_shards

    return shuffle_shards(
        _docs(spark, sf_dir).select("doc_id"), n_shards=8, seed="r6"
    )


def nb_quality_classifier_q(spark, sf_dir):
    """Seed-labeled quality classifier (the fastText wiki-vs-CC stage of
    CCNet/LLaMA/DCLM, as closed-form multinomial NB): train on the docs
    labeled 'en' vs 'de', score EVERY doc with the smoothed unigram
    log-likelihood ratio + class prior. Closed-form training keeps the
    scores exactly replayable in SQL (ln-ratio sums rounded to 6)."""
    from fluent_bit_spark.extensions.classifier import nb_train_score

    return nb_train_score(
        _docs(spark, sf_dir), "lang", "en", "de"
    )


def bpe_roundtrip_q(spark, sf_dir):
    """Real BPE tokenization (Sennrich et al. 2016, library-free):
    merge ranks trained on the deterministic sample, applied Arrow-batched
    to every document. The token stream itself depends on the learned
    merges (not SQL-replayable), so the query emits the contract: decode
    must reconstruct the normalized text EXACTLY (BPE is lossless), and
    token counts must sit in their structural bounds (>= words — every
    word is at least one token; <= chars + words — merges only shrink).
    Oracle = literal truth table; a single corrupted merge or off-by-one
    in the apply loop hash-fails its row."""
    from fluent_bit_spark.extensions.bpe import bpe_decode, bpe_encode, bpe_train
    from fluent_bit_spark.extensions.dedup import normalize_text

    docs = _spread(_docs(spark, sf_dir))
    merges = bpe_train(docs, num_merges=150, sample=512)
    enc = bpe_encode(docs, merges)
    norm = normalize_text(F.col("text"))
    joined = docs.select("doc_id", norm.alias("__norm")).join(enc, "doc_id")
    n_words = F.when(F.length("__norm") == 0, F.lit(0)).otherwise(
        F.size(F.split(F.col("__norm"), " "))
    )
    return joined.select(
        "doc_id",
        (bpe_decode(F.col("tokens")) == F.col("__norm")).alias("roundtrip_ok"),
        (
            (F.col("n_tokens") >= n_words)
            & (F.col("n_tokens") <= F.length("__norm") + n_words)
        ).alias("tokens_bounded"),
    )


def text_token_counts_q(spark, sf_dir):
    from fluent_bit_spark.extensions.text import bpe_ish_token_count, token_count

    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def pii_redaction_q(spark, sf_dir):
    from fluent_bit_spark.extensions.text import redact_pii

    # single-row-group scan → pre-spread so the regex map runs on all cores
    ev = _events(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)
    text = F.concat(
        F.lit("contact u"), F.col("user_id"), F.lit("@example.com or 10.0."),
        (F.col("user_id") % 256).cast("string"), F.lit("."),
        (F.col("event_id") % 256).cast("string"),
    )
    return ev.select("event_id", redact_pii(text, kinds=("email", "ipv4")).alias("redacted"))


def image_neardup_q(spark, sf_dir):
    """PIXEL-level image near-dup on codec-free formats: each embedding
    row becomes a real 9x8 binary PGM (quantized embedding values as the
    raster); every 25th image gets a perturbed copy (one corner pixel
    flipped — at most ONE dHash bit moves, since the corner cell feeds a
    single adjacent comparison). image_neardup_join must find every
    planted (orig, copy) pair — its (max_hamming+1)-band split of the
    64-bit dHash makes recall within the Hamming radius TOTAL by
    pigeonhole — and the WITNESS contract recomputes each returned
    pair's Hamming distance brute-force from the decoded pixel grids
    (bypassing the hash packing, banding, xor and bit_count) and demands
    equality. CROSS-CODEC planted pairs: every 50th vec also gets a
    baseline-JPEG rendition (the same grid as 8x8 constant blocks at
    quality 100, which the pure-numpy Huffman+IDCT decoder roundtrips
    EXACTLY — multimodal.py _decode_jpeg_gray), whose dHash equals the
    PGM original's bit-for-bit, so the join must pair them at hamming 0
    across container formats — every 75th vec a PNG rendition
    (stdlib-zlib decode, LOSSLESS, cycling through all five scanline
    filter types AND the Adam7-interlace / 16-bit-depth envelope —
    every other planted PNG interlaced, every third 16-bit, both
    lossless so the truth table is unchanged), every 100th a GIF
    rendition (pure-Python LZW,
    lossless through the gray palette), and every 125th a PROGRESSIVE
    JPEG rendition (SOF2 spectral-selection + successive-approximation
    scans, THREE interleaved-DC components, same constant-block q100
    trick so the multi-scan reconstruction is exact), all pairing the
    same way. Output truth table: per planted id, found +
    pair_witnessed + {jpeg,png,gif,prog}_found +
    {jpeg,png,gif,prog}_pair_witnessed + the global all_pairs_witnessed
    (covers incidental non-planted pairs too)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import (
        _gray_grid,
        decode_pixels,
        image_neardup_join,
        make_gif_pixels,
        make_jpeg_pixels,
        make_jpeg_progressive_pixels,
        make_pgm,
        make_png_pixels,
        to_media_frame,
    )

    emb = load_table(spark, sf_dir, "embeddings")

    def _grid(v):
        a = np.asarray(v, dtype="float64")
        px = (np.floor(np.abs(a) * 997.0) % 256).astype(np.uint8)
        return np.concatenate([px, px[:8]]).reshape(8, 9).copy()

    @pandas_udf("binary")
    def to_pgm(vecs: pd.Series, flips: pd.Series) -> pd.Series:
        out = []
        for v, fl in zip(vecs, flips):
            grid = _grid(v)
            if fl:
                grid[0, 0] ^= 0x80
            out.append(make_pgm(9, 8, grid.tobytes()))
        return pd.Series(out)

    @pandas_udf("binary")
    def to_jpeg(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            big = np.kron(_grid(v), np.ones((8, 8), dtype=np.uint8))
            out.append(make_jpeg_pixels(72, 64, big.tobytes(), quality=100))
        return pd.Series(out)

    @pandas_udf("binary")
    def to_png(vecs: pd.Series, ids: pd.Series) -> pd.Series:
        # the PNG family cycles the envelope: every other planted PNG is
        # Adam7-INTERLACED, every third 16-BIT — both lossless, so the
        # truth table is unchanged while the decode paths are exercised
        # at registry scale
        out = []
        for v, i in zip(vecs, ids):
            i = int(i) // 75
            out.append(
                make_png_pixels(
                    9, 8, _grid(v).tobytes(), 1, filters=[0, 1, 2, 3, 4],
                    interlace=bool(i % 2), bit_depth=16 if i % 3 == 0 else 8,
                )
            )
        return pd.Series(out)

    @pandas_udf("binary")
    def to_gif(vecs: pd.Series) -> pd.Series:
        return pd.Series(
            [make_gif_pixels(9, 8, _grid(v).tobytes(), 1) for v in vecs]
        )

    @pandas_udf("binary")
    def to_prog(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            big = np.kron(_grid(v), np.ones((8, 8), dtype=np.uint8))
            out.append(
                make_jpeg_progressive_pixels(
                    72, 64, big.tobytes(), quality=100, channels=3
                )
            )
        return pd.Series(out)

    base = emb.select(
        F.col("vec_id").alias("media_id"),
        to_pgm(F.col("embedding"), F.lit(False)).alias("content"),
    )
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("media_id"),
        to_pgm(F.col("embedding"), F.lit(True)).alias("content"),
    )
    jpeg_copies = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("media_id"),
        to_jpeg(F.col("embedding")).alias("content"),
    )
    png_copies = emb.filter(F.col("vec_id") % 75 == 0).select(
        (F.col("vec_id") + 3_000_000).alias("media_id"),
        to_png(F.col("embedding"), F.col("vec_id")).alias("content"),
    )
    gif_copies = emb.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + 4_000_000).alias("media_id"),
        to_gif(F.col("embedding")).alias("content"),
    )
    prog_copies = emb.filter(F.col("vec_id") % 125 == 0).select(
        (F.col("vec_id") + 5_000_000).alias("media_id"),
        to_prog(F.col("embedding")).alias("content"),
    )
    from concurrent.futures import ThreadPoolExecutor

    # mint the corpus ONCE: un-pinned, the Arrow encode branches re-ran
    # for the near-dup join AND for each witness decode side (3x)
    media = to_media_frame(
        base.unionByName(copies).unionByName(jpeg_copies)
        .unionByName(png_copies).unionByName(gif_copies)
        .unionByName(prog_copies),
        "media_id", F.col("content"), "image",
    ).localCheckpoint(eager=True)

    # the operator's banded join and the witness pixel decode are
    # independent chains over the pinned corpus: overlap them
    with ThreadPoolExecutor(max_workers=2) as pool:
        fp = pool.submit(
            lambda: image_neardup_join(media, max_hamming=3).localCheckpoint(
                eager=True
            )
        )
        fx = pool.submit(
            lambda: decode_pixels(media).select(
                "media_id", "width", "height", "channels", "pixels"
            ).localCheckpoint(eager=True)
        )
        pairs, pix = fp.result(), fx.result()

    @pandas_udf("int")
    def brute_hamming(
        pa: pd.Series, wa: pd.Series, ha: pd.Series, ca: pd.Series,
        pb: pd.Series, wb: pd.Series, hb: pd.Series, cb: pd.Series,
    ) -> pd.Series:
        out = []
        for a, aw, ah, ac, b, bw, bh, bc in zip(pa, wa, ha, ca, pb, wb, hb, cb):
            ga = _gray_grid(bytes(a), int(aw), int(ah), int(ac))
            gb = _gray_grid(bytes(b), int(bw), int(bh), int(bc))
            out.append(
                int(((ga[:, 1:] > ga[:, :-1]) != (gb[:, 1:] > gb[:, :-1])).sum())
            )
        return pd.Series(out)

    def side(tag):
        return pix.select(
            F.col("media_id").alias(f"id_{tag}"),
            F.col("pixels").alias(f"__p{tag}"),
            F.col("width").alias(f"__w{tag}"),
            F.col("height").alias(f"__h{tag}"),
            F.col("channels").alias(f"__c{tag}"),
        )

    wit = (
        pairs.join(F.broadcast(side("a")), "id_a")
        .join(F.broadcast(side("b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            brute_hamming(
                "__pa", "__wa", "__ha", "__ca", "__pb", "__wb", "__hb", "__cb"
            ).alias("w_h"),
        )
        .localCheckpoint(eager=True)
    )
    all_ok = wit.filter(F.col("hamming") != F.col("w_h")).count() == 0
    wit_planted = wit.where(F.col("id_b") == F.col("id_a") + 1_000_000).select(
        F.col("id_a").alias("vec_id"),
        (F.col("hamming") == F.col("w_h")).alias("pair_witnessed"),
    )
    wit_jpeg = wit.where(F.col("id_b") == F.col("id_a") + 2_000_000).select(
        F.col("id_a").alias("vec_id"),
        ((F.col("hamming") == F.col("w_h")) & (F.col("hamming") == 0)).alias(
            "jpeg_pair_witnessed"
        ),
    )
    wit_png = wit.where(F.col("id_b") == F.col("id_a") + 3_000_000).select(
        F.col("id_a").alias("vec_id"),
        ((F.col("hamming") == F.col("w_h")) & (F.col("hamming") == 0)).alias(
            "png_pair_witnessed"
        ),
    )
    wit_gif = wit.where(F.col("id_b") == F.col("id_a") + 4_000_000).select(
        F.col("id_a").alias("vec_id"),
        ((F.col("hamming") == F.col("w_h")) & (F.col("hamming") == 0)).alias(
            "gif_pair_witnessed"
        ),
    )
    wit_prog = wit.where(F.col("id_b") == F.col("id_a") + 5_000_000).select(
        F.col("id_a").alias("vec_id"),
        ((F.col("hamming") == F.col("w_h")) & (F.col("hamming") == 0)).alias(
            "prog_pair_witnessed"
        ),
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select("vec_id")
    return (
        planted.join(wit_planted, "vec_id", "left")
        .join(wit_jpeg, "vec_id", "left")
        .join(wit_png, "vec_id", "left")
        .join(wit_gif, "vec_id", "left")
        .join(wit_prog, "vec_id", "left")
        .select(
            "vec_id",
            F.col("pair_witnessed").isNotNull().alias("found"),
            F.coalesce("pair_witnessed", F.lit(False)).alias("pair_witnessed"),
            F.col("jpeg_pair_witnessed").isNotNull().alias("jpeg_found"),
            F.coalesce("jpeg_pair_witnessed", F.lit(False)).alias(
                "jpeg_pair_witnessed"
            ),
            F.col("png_pair_witnessed").isNotNull().alias("png_found"),
            F.coalesce("png_pair_witnessed", F.lit(False)).alias(
                "png_pair_witnessed"
            ),
            F.col("gif_pair_witnessed").isNotNull().alias("gif_found"),
            F.coalesce("gif_pair_witnessed", F.lit(False)).alias(
                "gif_pair_witnessed"
            ),
            F.col("prog_pair_witnessed").isNotNull().alias("prog_found"),
            F.coalesce("prog_pair_witnessed", F.lit(False)).alias(
                "prog_pair_witnessed"
            ),
            F.lit(bool(all_ok)).alias("all_pairs_witnessed"),
        )
    )


def attribution_q(spark, sf_dir):
    """Marketing attribution over the events table: purchases credited
    to preceding view/click/signup touches of the same user within a
    3-day lookback, all three models (last_touch, first_touch, linear)
    unioned under a model column; untouched purchases credit
    '(direct)'. Hash-exact DuckDB window replay of every rule —
    including the deterministic (tts, channel) tie-breaks."""
    from fluent_bit_spark.extensions.funnel import attribution

    ev = _events(spark, sf_dir)
    parts = []
    for mdl in ("last_touch", "first_touch", "linear"):
        parts.append(
            attribution(
                ev,
                conversion="purchase",
                touch_types=["view", "click", "signup"],
                lookback=3 * 86400.0,
                model=mdl,
            ).select(F.lit(mdl).alias("model"), "channel", "credit", "attributed_value")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def video_headers_q(spark, sf_dir):
    """Video container parsing over real codec-free fixtures: every
    document mints one AVI (RIFF avih/strh/strf headers around DIB
    frames) and one MP4 (ISO BMFF mvhd/tkhd/mdhd/stsd/stts/stsz boxes,
    codec 'mp4v', constant sample delta) with dimensions, frame count,
    and timing all derived arithmetically from doc_id — so the oracle
    recomputes codec/width/height/n_frames/fps_x1000/duration_ms in
    pure SQL while Spark round-trips them through the actual byte-level
    writers and parsers (video.py make_avi/parse_avi, make_mp4/
    parse_mp4)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.video import (
        extract_video_headers,
        make_avi,
        make_mp4,
    )
    from fluent_bit_spark.extensions.multimodal import to_media_frame

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    @pandas_udf("binary")
    def to_avi(ids: pd.Series) -> pd.Series:
        out = []
        for did in ids:
            did = int(did)
            w, h = 8 + did % 4, 8
            n = 2 + did % 3
            fr = [
                bytes(bytearray((did + i + j) % 256 for j in range(w * h)))
                for i in range(n)
            ]
            out.append(make_avi(w, h, fr, fps_num=10 + did % 15))
        return pd.Series(out)

    @pandas_udf("binary")
    def to_mp4(ids: pd.Series) -> pd.Series:
        out = []
        for did in ids:
            did = int(did)
            n = 3 + did % 4
            ts = 600 * (1 + did % 3)
            delta = 20 + did % 5
            out.append(
                make_mp4(
                    16 + did % 8, 16, [delta] * n,
                    [40 + (did + i) % 9 for i in range(n)],
                    keyframes=list(range(1, n + 1, 2)), timescale=ts,
                )
            )
        return pd.Series(out)

    avi = docs.select(
        F.col("doc_id").alias("media_id"), to_avi("doc_id").alias("content")
    )
    mp4 = docs.select(
        (F.col("doc_id") + 1_000_000).alias("media_id"),
        to_mp4("doc_id").alias("content"),
    )
    media = to_media_frame(
        avi.unionByName(mp4), "media_id", F.col("content"), "video"
    )
    return extract_video_headers(media)


def video_frame_plan_q(spark, sf_dir):
    """The distributed frame-extraction plan from MP4 sample tables:
    per document an MP4 whose stts carries TWO delta runs (first half
    slow, second half double-speed), per-sample sizes varying mod 7,
    keyframes at the odd samples, two samples per chunk (so stsc/stco
    chunk resolution is exercised, not just contiguity), CTTS
    composition offsets of ((doc_id + i) % 2) * 10 units (presentation
    = decode + offset, the B-frame reorder path, order-preserving by
    construction), odd doc_ids on CO64 64-bit chunk offsets (the >4 GB
    layout — byte-identical plan, different box format), and 100 ms
    first-of-bucket sampling. The oracle rebuilds every row —
    timestamps from the two-run arithmetic plus the ctts term, offsets
    as the running sum of prior sizes, the selected flag from the
    lagged tick bucket — in pure SQL. rel_offset is the byte offset
    within the sample data region (absolute minus the first sample's),
    which is what the SQL can state without replaying the box writer."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.video import make_mp4, video_frame_plan
    from fluent_bit_spark.extensions.multimodal import to_media_frame

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    @pandas_udf("binary")
    def to_mp4(ids: pd.Series) -> pd.Series:
        out = []
        for did in ids:
            did = int(did)
            n = 4 + did % 3
            d1 = 30 + (did % 3) * 10
            half = n // 2
            deltas = [d1] * half + [2 * d1] * (n - half)
            sizes = [50 + ((did + i) % 7) * 10 for i in range(n)]
            out.append(
                make_mp4(
                    16, 16, deltas, sizes,
                    keyframes=list(range(1, n + 1, 2)),
                    timescale=1000, samples_per_chunk=2,
                    co64=bool(did % 2),
                    ctts_offsets=[((did + i) % 2) * 10 for i in range(n)],
                )
            )
        return pd.Series(out)

    media = to_media_frame(
        docs.select(
            F.col("doc_id").alias("media_id"), to_mp4("doc_id").alias("content")
        ),
        "media_id", F.col("content"), "video",
    )
    plan = video_frame_plan(media, every_ms=100)
    w = Window.partitionBy("media_id")
    return plan.select(
        "media_id", "frame_idx", "ts_ms", "sample_size",
        (F.col("sample_offset") - F.min("sample_offset").over(w)).alias(
            "rel_offset"
        ),
        "keyframe", "selected",
    )


def _video_avi_corpus(spark, sf_dir):
    """The video_neardup corpus: per embedding a 6-frame 9x8 DIB AVI
    (frame f = the quantized-embedding grid rolled f columns), a
    trimmed+perturbed copy every 25th vec (media_id + 1M), and a
    quality-100 MJPG rendition every 50th (media_id + 2M, frames
    kron-upscaled 8x to constant blocks so the pure-numpy JPEG codec
    round-trips them exactly)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import make_avi

    emb = load_table(spark, sf_dir, "embeddings")

    def _grid(v):
        a = np.asarray(v, dtype="float64")
        px = (np.floor(np.abs(a) * 997.0) % 256).astype(np.uint8)
        return np.concatenate([px, px[:8]]).reshape(8, 9).copy()

    def _frames(v):
        g = _grid(v)
        return [np.roll(g, f, axis=1).copy() for f in range(6)]

    @pandas_udf("binary")
    def to_avi(vecs: pd.Series, variant: pd.Series) -> pd.Series:
        out = []
        for v, var in zip(vecs, variant):
            fr = _frames(v)
            if var == 1:  # trimmed + perturbed copy
                g = fr[1]
                if g[0, 1] > g[0, 0]:
                    g[0, 0], g[0, 1] = 255, 0
                else:
                    g[0, 0], g[0, 1] = 0, 255
                fr = fr[1:]
                out.append(make_avi(9, 8, [f.tobytes() for f in fr]))
            elif var == 2:  # MJPG rendition, 8x constant blocks, q100
                big = [
                    np.kron(f, np.ones((8, 8), dtype=np.uint8)).tobytes()
                    for f in fr
                ]
                out.append(make_avi(72, 64, big, codec="MJPG", quality=100))
            else:
                out.append(make_avi(9, 8, [f.tobytes() for f in fr]))
        return pd.Series(out)

    base = emb.select(
        F.col("vec_id").alias("media_id"),
        to_avi(F.col("embedding"), F.lit(0)).alias("content"),
    )
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("media_id"),
        to_avi(F.col("embedding"), F.lit(1)).alias("content"),
    )
    mjpg = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 2_000_000).alias("media_id"),
        to_avi(F.col("embedding"), F.lit(2)).alias("content"),
    )
    return to_media_frame(
        base.unionByName(copies).unionByName(mjpg),
        "media_id", F.col("content"), "video",
    )


def video_neardup_raw(spark, sf_dir):
    """Bench-only bare operator: video_neardup_join on the same corpus
    the registry query verifies — the witness harness is what the
    oracle gate needs, not what BASELINE.md timings should include."""
    from fluent_bit_spark.extensions.video import video_neardup_join

    return video_neardup_join(_video_avi_corpus(spark, sf_dir), max_hamming=3)


def video_neardup_paired_raw(spark, sf_dir):
    """Bench-only scale form: video_neardup_join with pair_probe=True —
    the consecutive-frame probe key that collapses the uniform-corpus
    candidate mass (the measured alpha pocket of the exact single-frame
    contract), on the same corpus."""
    from fluent_bit_spark.extensions.video import video_neardup_join

    return video_neardup_join(
        _video_avi_corpus(spark, sf_dir), max_hamming=3, pair_probe=True
    )


def video_neardup_guarded_raw(spark, sf_dir):
    """Bench-only production-config form: video_neardup_join with the
    max_bucket hot-band stop-list engaged — the guard for structured
    rasters whose regular dHash bit patterns (gradients, synthetic
    grids) mint hot (band, value) buckets. At sf3 the stop-list keeps
    every verified pair (4800 == exact) while cutting the candidate-
    bound verify 77.6s -> 15.7s."""
    from fluent_bit_spark.extensions.video import video_neardup_join

    return video_neardup_join(
        _video_avi_corpus(spark, sf_dir), max_hamming=3, max_bucket=32
    )


def video_neardup_q(spark, sf_dir):
    """FRAME-level video near-dup with alignment: each embedding row
    becomes a 6-frame 9x8 DIB AVI (frame f = the quantized-embedding
    grid cyclically rolled f columns); every 25th vec gets a TRIMMED
    PERTURBED copy (first frame dropped — so the true alignment offset
    is -1 — and one dHash comparison of the next frame deterministically
    inverted, moving at most 2 bits on 1 of the 5 overlapping frames);
    every 50th an MJPG rendition (the same frames kron-upscaled 8x to
    constant 8x8 blocks, quality-100 motion-JPEG — the pure-numpy codec
    round-trips those exactly, so every frame dHash matches bit-for-bit
    at offset 0 ACROSS codecs). video_neardup_join must surface every
    planted pair at its true offset, and the WITNESS recomputes each
    returned pair's aligned mean Hamming brute-force from the decoded
    frame grids (bypassing hash packing, banding, slicing, xor and
    bit_count) and demands equality. Truth table per planted vec:
    found + pair_witnessed + offset_ok, mjpg_* the same for the
    cross-codec pairs, and the global all_pairs_witnessed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import _gray_grid
    from fluent_bit_spark.extensions.video import (
        decode_video_frames,
        video_neardup_join,
    )

    from concurrent.futures import ThreadPoolExecutor

    emb = load_table(spark, sf_dir, "embeddings")
    # mint the AVI corpus ONCE (un-pinned it re-ran for the join and for
    # each witness decode side), then overlap the independent operator
    # join and witness frame-decode chains as concurrent driver jobs
    media = _video_avi_corpus(spark, sf_dir).localCheckpoint(eager=True)
    with ThreadPoolExecutor(max_workers=2) as pool:
        fp_ = pool.submit(
            lambda: video_neardup_join(media, max_hamming=3).localCheckpoint(
                eager=True
            )
        )
        fc = pool.submit(
            lambda: decode_video_frames(media)
            .groupBy("media_id")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct("frame_idx", "width", "height", "pixels")
                    )
                ).alias("frames")
            )
            .localCheckpoint(eager=True)
        )
        pairs, clips = fp_.result(), fc.result()

    @pandas_udf("double")
    def brute_mean(fa: pd.Series, fb: pd.Series, off: pd.Series) -> pd.Series:
        out = []
        for a, b, o in zip(fa, fb, off):
            o = int(o)
            bits_a = [
                (
                    lambda g: (g[:, 1:] > g[:, :-1])
                )(_gray_grid(bytes(r["pixels"]), int(r["width"]),
                             int(r["height"]), 1))
                for r in a
            ]
            bits_b = [
                (
                    lambda g: (g[:, 1:] > g[:, :-1])
                )(_gray_grid(bytes(r["pixels"]), int(r["width"]),
                             int(r["height"]), 1))
                for r in b
            ]
            tot = cnt = 0
            for ia in range(len(bits_a)):
                ib = ia + o
                if 0 <= ib < len(bits_b):
                    tot += int((bits_a[ia] != bits_b[ib]).sum())
                    cnt += 1
            out.append(round(tot / cnt, 6) if cnt else float("nan"))
        return pd.Series(out)

    wit = (
        pairs.join(
            F.broadcast(
                clips.select(
                    F.col("media_id").alias("id_a"),
                    F.col("frames").alias("__fa"),
                )
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                clips.select(
                    F.col("media_id").alias("id_b"),
                    F.col("frames").alias("__fb"),
                )
            ),
            "id_b",
        )
        .select(
            "id_a", "id_b", "offset", "mean_hamming",
            brute_mean("__fa", "__fb", "offset").alias("w_m"),
        )
        .localCheckpoint(eager=True)
    )
    all_ok = (
        wit.filter(
            F.abs(F.col("mean_hamming") - F.col("w_m")) > 1e-9
        ).count()
        == 0
    )
    # a pair may surface at several offsets (all verified); aggregate so
    # the truth table stays one row per planted vec
    wit_copy = (
        wit.where(F.col("id_b") == F.col("id_a") + 1_000_000)
        .groupBy(F.col("id_a").alias("vec_id"))
        .agg(
            F.bool_and(
                F.abs(F.col("mean_hamming") - F.col("w_m")) <= 1e-9
            ).alias("pair_witnessed"),
            F.bool_or(F.col("offset") == -1).alias("offset_ok"),
        )
    )
    wit_mjpg = (
        wit.where(F.col("id_b") == F.col("id_a") + 2_000_000)
        .groupBy(F.col("id_a").alias("vec_id"))
        .agg(
            F.bool_and(
                (F.abs(F.col("mean_hamming") - F.col("w_m")) <= 1e-9)
                & (F.col("mean_hamming") == 0.0)
            ).alias("mjpg_pair_witnessed"),
            F.bool_or(F.col("offset") == 0).alias("mjpg_offset_ok"),
        )
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select("vec_id")
    return (
        planted.join(wit_copy, "vec_id", "left")
        .join(wit_mjpg, "vec_id", "left")
        .select(
            "vec_id",
            F.col("pair_witnessed").isNotNull().alias("found"),
            F.coalesce("pair_witnessed", F.lit(False)).alias("pair_witnessed"),
            F.coalesce("offset_ok", F.lit(False)).alias("offset_ok"),
            F.col("mjpg_pair_witnessed").isNotNull().alias("mjpg_found"),
            F.coalesce("mjpg_pair_witnessed", F.lit(False)).alias(
                "mjpg_pair_witnessed"
            ),
            F.coalesce("mjpg_offset_ok", F.lit(False)).alias("mjpg_offset_ok"),
            F.lit(bool(all_ok)).alias("all_pairs_witnessed"),
        )
    )


def video_scene_sample_q(spark, sf_dir):
    """Shot-boundary detection + per-scene frame sampling: each document
    mints an AVI of three PLANTED scenes (ramp-up / ramp-down /
    alternating column rasters — consecutive-scene dHash Hamming is 64
    and 32 by construction, within-scene 0, so threshold 16 separates
    them DETERMINISTICALLY, no statistical margin), scene length 2 +
    doc_id % 3 frames at 10 fps. scene_sample_plan must recover the
    planted segmentation exactly: scene_idx = i // L, scene start at
    L*100ms multiples, selected = each scene's first frame. The oracle
    rebuilds every row arithmetically."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import make_avi, scene_sample_plan

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    @pandas_udf("binary")
    def to_clip(ids: pd.Series) -> pd.Series:
        up = np.tile(np.arange(9, dtype=np.uint8) * 16, (8, 1))
        alt = np.tile(
            np.where(np.arange(9) % 2 == 1, 200, 40).astype(np.uint8), (8, 1)
        )
        pats = [up.tobytes(), (128 - up).tobytes(), alt.tobytes()]
        out = []
        for did in ids:
            L = 2 + int(did) % 3
            frames = []
            for p in pats:
                frames.extend([p] * L)
            out.append(make_avi(9, 8, frames, fps_num=10))
        return pd.Series(out)

    media = to_media_frame(
        docs.select(
            F.col("doc_id").alias("media_id"), to_clip("doc_id").alias("content")
        ),
        "media_id", F.col("content"), "video",
    )
    return scene_sample_plan(media, threshold=16).select(
        "media_id", "scene_idx", "scene_start_ms", "frame_idx", "ts_ms",
        "selected",
    )


def mkv_headers_q(spark, sf_dir):
    """Matroska/WebM (EBML) header parsing: every document mints one
    matroska clip (V_UNCOMPRESSED) and one webm clip (V_VP9) with
    dimensions and duration derived from doc_id — and the webm fixture
    stores its Duration float under a NON-default TimecodeScale (100 us
    units), so the parser's TimecodeScale * Duration reconstruction is
    exercised, not just the default path. The oracle recomputes every
    field arithmetically."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import (
        extract_video_headers,
        make_mkv,
    )

    docs = _docs(spark, sf_dir).select("doc_id")

    @pandas_udf("binary")
    def to_mkv(ids: pd.Series, webm: pd.Series) -> pd.Series:
        out = []
        for d, wb in zip(ids, webm):
            d = int(d)
            if wb:
                out.append(
                    make_mkv(
                        320 + d % 16, 180 + d % 9, 1000 + d % 7 * 250,
                        codec_id="V_VP9", doctype="webm",
                        timecode_scale=100_000,
                    )
                )
            else:
                out.append(
                    make_mkv(
                        8 + d % 4, 8, 100 * (2 + d % 5),
                        codec_id="V_UNCOMPRESSED",
                    )
                )
        return pd.Series(out)

    mk = docs.select(
        F.col("doc_id").alias("media_id"),
        to_mkv("doc_id", F.lit(False)).alias("content"),
    )
    wb = docs.select(
        (F.col("doc_id") + 1_000_000).alias("media_id"),
        to_mkv("doc_id", F.lit(True)).alias("content"),
    )
    media = to_media_frame(
        mk.unionByName(wb), "media_id", F.col("content"), "video"
    )
    return extract_video_headers(media).select(
        "media_id", "container", "codec", "width", "height", "duration_ms"
    )


def caption_frames_q(spark, sf_dir):
    """Vision-language pairing: each document mints an MP4 (constant
    100 ms samples) AND a caption track — SRT for even doc_ids, WebVTT
    for odd (both grammars exercised at scale) — with two cues whose
    windows derive from doc_id: cue 0 covers [0, 100 + 100*(doc_id%2)),
    cue 1 covers [200, 400). align_captions_to_frames joins each
    planned frame to the cue covering its timestamp (equi-join on the
    clip + residual range filter — co-partitioned, no interval
    machinery); the oracle replays the coverage arithmetic in SQL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import (
        align_captions_to_frames,
        extract_captions,
        make_mp4,
        video_frame_plan,
    )

    docs = _docs(spark, sf_dir).select("doc_id")

    @pandas_udf("binary")
    def to_mp4(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_mp4(16, 16, [100] * (4 + int(d) % 3), [40] * (4 + int(d) % 3))
                for d in ids
            ]
        )

    @pandas_udf("string")
    def to_track(ids: pd.Series) -> pd.Series:
        out = []
        for d in ids:
            d = int(d)
            e0 = 100 + 100 * (d % 2)
            if d % 2 == 0:
                out.append(
                    f"1\n00:00:00,000 --> 00:00:00,{e0:03d}\nd{d} c0\n\n"
                    f"2\n00:00:00,200 --> 00:00:00,400\nd{d} c1\n"
                )
            else:
                out.append(
                    "WEBVTT\n\n"
                    f"00:00.000 --> 00:00.{e0:03d} align:start\nd{d} c0\n\n"
                    f"00:00.200 --> 00:00.400\nd{d} c1\n"
                )
        return pd.Series(out)

    media = to_media_frame(
        docs.select(
            F.col("doc_id").alias("media_id"), to_mp4("doc_id").alias("content")
        ),
        "media_id", F.col("content"), "video",
    )
    plan = video_frame_plan(media)
    cues = extract_captions(
        docs.select(
            F.col("doc_id").alias("media_id"),
            to_track("doc_id").alias("caption_text"),
        )
    )
    return align_captions_to_frames(cues, plan).select(
        "media_id", "frame_idx", "ts_ms", "cue_idx", "caption"
    )


def mkv_frame_plan_q(spark, sf_dir):
    """The Matroska frame-extraction plan (video.py mkv_block_table),
    content-exact: every document mints TWO fixtures — (a) a multi-
    cluster block file, SimpleBlocks for even doc_ids and
    BlockGroup-wrapped Blocks for odd (keyframe = no ReferenceBlock,
    the spec's rule), blocks at 400 ms steps with sizes varying mod 5;
    and (b) at media_id + 1M a LACED SimpleBlock (mode cycles
    xiph/fixed/ebml by doc_id%3; fixed gets equal sizes as the mode
    requires). The output md5s the ACTUAL bytes each plan row's
    (offset, size) range-reads out of the container, and the oracle
    recomputes that md5 from the payload-construction arithmetic alone
    (md5(repeat(chr(65+i), size))) — so a wrong offset, a size off by
    one, a lace split at the wrong boundary, or a keyframe flag read
    from the wrong bit all hash-fail. This is the query-level proof the
    100 TB range-read fan-out reads the right bytes."""
    import hashlib

    import pandas as pd

    from fluent_bit_spark.extensions.video import (
        make_mkv_blocks,
        make_mkv_laced,
        mkv_block_table,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 4 + d % 3
                blocks = [
                    (i * 400, bytes([65 + i]) * (10 + (d + i) % 5), i % 2 == 0)
                    for i in range(n)
                ]
                out.append(
                    (d, make_mkv_blocks(
                        16, 8, blocks, cluster_ms=1000,
                        blockgroup=bool(d % 2),
                    ))
                )
                mode = ("xiph", "fixed", "ebml")[d % 3]
                k = 2 + d % 3
                frames = [
                    bytes([65 + j]) * (
                        (8 + d % 5) if mode == "fixed" else (8 + (d + j) % 5)
                    )
                    for j in range(k)
                ]
                out.append(
                    (d + 1_000_000,
                     make_mkv_laced(16, 8, (d * 7) % 30_000, frames, mode=mode))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(gen, schema="media_id long, content binary")

    def plan(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "payload_md5",
                "keyframe"]
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for idx, ts, sz, off, key in mkv_block_table(b) or []:
                    out.append((
                        mid, idx, ts, sz,
                        hashlib.md5(b[off : off + sz]).hexdigest(), key,
                    ))
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        plan,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "payload_md5 string, keyframe boolean",
    )


def exif_orientation_q(spark, sf_dir):
    """EXIF orientation baking (multimodal.py _exif_orientation +
    _jpeg_apply_orientation): every document renders an ASCII-safe
    8x9-cell constant-block raster (quality-100 baseline JPEG
    roundtrips it exactly), stored PRE-ROTATED under EXIF orientation
    1 + doc_id%8 with the matching APP1 tag (all eight transforms
    exercised corpus-wide, one per document — the pure-Python q100
    encode is the expensive half, so the fixture budget is one image
    per doc, repartitioned for fan-out) — the decoder must bake the
    display transform so every document decodes to the IDENTICAL
    upright 64x72 raster. Output is (doc_id, orientation, width,
    height, pixels_md5); the oracle recomputes the md5 from the
    kron-expansion arithmetic alone — a wrong transform, a swapped
    width/height, or a missed APP1 parse hash-fails. This is what makes a rotated-by-metadata photo
    perceptually match its rotated-by-pixels copy in image dedup."""
    import hashlib

    import numpy as np
    import pandas as pd

    from fluent_bit_spark.extensions.multimodal import (
        _decode_jpeg_gray,
        make_jpeg_pixels,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))
    inv = {
        1: lambda a: a, 2: lambda a: a[:, ::-1], 3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1, :], 5: lambda a: a.T,
        6: lambda a: np.rot90(a, 1),
        7: lambda a: a.T[::-1, ::-1],  # transverse is self-inverse
        8: lambda a: np.rot90(a, -1),
    }

    def run(batches):
        cols = ["doc_id", "orientation", "width", "height", "pixels_md5"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                o = 1 + d % 8
                grid = np.array(
                    [32 + (d * 31 + 17 * g) % 96 for g in range(72)],
                    dtype=np.uint8,
                ).reshape(8, 9)
                up = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
                stored = np.ascontiguousarray(inv[o](up))
                sh, sw = stored.shape
                jb = make_jpeg_pixels(
                    sw, sh, stored.tobytes(), quality=100,
                    exif_orientation=o,
                )
                got = _decode_jpeg_gray(jb)
                if got is None:
                    continue
                w2, h2, _nch, px = got
                out.append((d, o, w2, h2, hashlib.md5(px).hexdigest()))
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(
        run,
        schema="doc_id bigint, orientation int, width int, height int, "
               "pixels_md5 string",
    )


def fmp4_frame_plan_q(spark, sf_dir):
    """Fragmented-MP4 frame extraction (video.py mp4_fragment_table via
    the unified mp4_sample_table dispatch) — the DASH/HLS segment
    layout streamed web video ships in, where the sample table arrives
    per-fragment in moof/tfhd/tfdt/trun instead of one stbl: every
    document mints a TWO-fragment file (5 samples total, counts split
    2+3 or 3+2 by doc_id parity, constant per-doc duration, sizes
    varying mod 5, keyframes at even samples via trun sample_flags,
    fragment 1's tfdt continuing fragment 0's decode time). The output
    md5s the bytes each plan row range-reads; the oracle restates the
    payload construction, the tfdt/duration timing, and the sync flags
    arithmetically — wrong trun offsets, a broken default-base-is-moof
    base, or a tfdt discontinuity all hash-fail."""
    import hashlib

    import pandas as pd

    from fluent_bit_spark.extensions.video import (
        make_fmp4,
        mp4_sample_table,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                dur = 40 + 10 * (d % 3)
                n0 = 2 + d % 2
                sizes = [8 + (d + g) % 5 for g in range(5)]
                keys = [g % 2 == 0 for g in range(5)]
                frag0 = [(dur, sizes[g], keys[g]) for g in range(n0)]
                frag1 = [(dur, sizes[g], keys[g]) for g in range(n0, 5)]
                out.append(
                    (d, make_fmp4(320, 180, [(0, frag0), (n0 * dur, frag1)]))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(gen, schema="media_id long, content binary")

    def plan(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "payload_md5",
                "keyframe"]
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for idx, ts, sz, off, key in mp4_sample_table(b) or []:
                    out.append((
                        mid, idx, ts, sz,
                        hashlib.md5(b[off : off + sz]).hexdigest(), key,
                    ))
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        plan,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "payload_md5 string, keyframe boolean",
    )


def elst_frame_plan_q(spark, sf_dir):
    """MP4 edit lists (video.py _elst_media_time via mp4_sample_table):
    every document mints a 6-sample mp4 whose ctts lifts every
    composition time by a constant 100 and whose elst starts the
    presentation at media_time 25 + 5*(doc_id%4) — the initial-offset
    layout real camera/editor output carries, which shifts EVERY
    presentation timestamp; odd doc_ids additionally carry a leading
    EMPTY edit (media_time -1, a presentation delay) that the parser
    must SKIP, not take as offset 0. The output restates ts_ms, size,
    and the relative byte offset; the oracle derives all three from
    doc_id arithmetic alone — a missed elst, a wrongly-applied empty
    edit, or a moved byte range hash-fails (ISO BMFF 8.6.5-8.6.6)."""
    import pandas as pd

    from fluent_bit_spark.extensions.video import (
        make_mp4,
        mp4_sample_table,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def run(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "rel_offset",
                "keyframe"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                delta = 40 + 10 * (d % 3)
                sizes = [20 + (d + g) % 7 for g in range(6)]
                b = make_mp4(
                    320, 180, [delta] * 6, sizes, keyframes=[1, 4],
                    ctts_offsets=[100] * 6,
                    elst_media_time=25 + 5 * (d % 4),
                    elst_lead_empty=500 if d % 2 else None,
                )
                rows = mp4_sample_table(b) or []
                base = rows[0][3] if rows else 0
                for idx, ts, sz, off, key in rows:
                    out.append((d, idx, ts, sz, off - base, key))
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(
        run,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "rel_offset bigint, keyframe boolean",
    )


def mp3_frame_plan_q(spark, sf_dir):
    """The AUDIO member of the frame-plan family (multimodal.py
    mp3_frame_table): every document mints a 5-frame MPEG-1 Layer III
    stream — sample rate cycling 44100/48000/32000, bitrate cycling
    96/128/160/192, per-frame padding bits from doc_id%32, an ID3v2 tag
    (26 bytes, must be skipped by its syncsafe size) on even doc_ids
    and an ID3v1 'TAG' trailer (must stop the walk, not crash it) on
    every 5th — and the plan derives each frame's (ts_ms, size,
    absolute offset) from header arithmetic alone (ISO/IEC 11172-3:
    len = 144*bitrate/rate + pad, 1152 samples/frame). The output md5s
    each frame's codec payload; the oracle restates length, cumulative
    offset (including the ID3 skip), sample-accurate timestamps, and
    the filler bytes arithmetically — a wrong bitrate table, a missed
    padding bit, or an unskipped tag hash-fails. Same 100 TB shape as
    mp4_sample_table: independent (offset, size) range-read decode
    tasks."""
    import hashlib

    import pandas as pd

    from fluent_bit_spark.extensions.multimodal import (
        make_mp3_frames,
        mp3_frame_table,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def run(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "offset",
                "payload_md5"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                b = make_mp3_frames(
                    5,
                    sample_rate=(44100, 48000, 32000)[d % 3],
                    bitrate_kbps=(96, 128, 160, 192)[d % 4],
                    pad_pattern=d % 32,
                    id3_size=16 if d % 2 == 0 else None,
                    id3v1_trailer=(d % 5 == 0),
                )
                for idx, ts, sz, off in mp3_frame_table(b) or []:
                    out.append((
                        d, idx, ts, sz, off,
                        hashlib.md5(b[off + 4 : off + sz]).hexdigest(),
                    ))
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(
        run,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "offset bigint, payload_md5 string",
    )


def fmp4_multitrack_plan_q(spark, sf_dir):
    """Muxed audio+video fragmented MP4 (video.py mp4_fragment_table):
    every document mints a TWO-fragment DASH segment where each moof
    carries an AUDIO traf (track_ID 2) FIRST and the video traf second,
    with the audio samples laid out before the video samples in mdat —
    the interleaved layout real muxed segments use. The plan must keep
    only the video track's trafs (tfhd track_ID filter + per-track trex
    defaults): the output md5s the bytes each plan row range-reads, and
    audio filler is lowercase while video filler is uppercase, so a
    plan that absorbs an audio traf or miscomputes the shared-mdat
    offsets hash-fails. The oracle restates the video-only timing/size/
    payload arithmetic."""
    import hashlib

    import pandas as pd

    from fluent_bit_spark.extensions.video import (
        make_fmp4,
        mp4_sample_table,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                dur = 30 + 10 * (d % 4)
                n0 = 2 + (d + 1) % 2
                sizes = [9 + (d + 2 * g) % 6 for g in range(5)]
                keys = [g % 3 == 0 for g in range(5)]
                frag0 = [(dur, sizes[g], keys[g]) for g in range(n0)]
                frag1 = [(dur, sizes[g], keys[g]) for g in range(n0, 5)]
                a0 = [(21, 6 + (d + g) % 4, True) for g in range(2)]
                a1 = [(21, 6 + (d + g) % 4, True) for g in range(2, 4)]
                out.append((d, make_fmp4(
                    320, 180,
                    [(0, frag0), (n0 * dur, frag1)],
                    audio_fragments=[(0, a0), (42, a1)],
                )))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(gen, schema="media_id long, content binary")

    def plan(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "payload_md5",
                "keyframe"]
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for idx, ts, sz, off, key in mp4_sample_table(b) or []:
                    out.append((
                        mid, idx, ts, sz,
                        hashlib.md5(b[off : off + sz]).hexdigest(), key,
                    ))
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        plan,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "payload_md5 string, keyframe boolean",
    )


def fmp4_audio_track_plan_q(spark, sf_dir):
    """The AUDIO track of a muxed DASH segment (video.py
    mp4_sample_table(track='audio')): the same interleaved audio+video
    fixture shape as fmp4_multitrack_plan — two moofs, audio traf
    (track_ID 2) first, audio samples before video in each mdat — but
    planned for the soun trak: its track_ID selects the trafs and trex
    defaults, ts accumulates the 21-unit audio durations, and the
    output md5s the bytes each plan row range-reads (audio filler is
    lowercase chr(97+g), video uppercase, so absorbing a video traf or
    miscomputing the shared-mdat offsets hash-fails). Odd doc_ids write
    the audio TRAK first in moov — selection must go by hdlr, not trak
    order. Completes the muxed-container story: one segment now plans
    BOTH tracks independently (r11 verdict task)."""
    import hashlib

    import pandas as pd

    from fluent_bit_spark.extensions.video import (
        make_fmp4,
        mp4_sample_table,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                dur = 30 + 10 * (d % 4)
                n0 = 2 + (d + 1) % 2
                sizes = [9 + (d + 2 * g) % 6 for g in range(5)]
                keys = [g % 3 == 0 for g in range(5)]
                frag0 = [(dur, sizes[g], keys[g]) for g in range(n0)]
                frag1 = [(dur, sizes[g], keys[g]) for g in range(n0, 5)]
                a0 = [(21, 6 + (d + g) % 4, True) for g in range(2)]
                a1 = [(21, 6 + (d + g) % 4, True) for g in range(2, 4)]
                out.append((d, make_fmp4(
                    320, 180,
                    [(0, frag0), (n0 * dur, frag1)],
                    audio_fragments=[(0, a0), (42, a1)],
                    audio_trak_first=(d % 2 == 1),
                )))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(gen, schema="media_id long, content binary")

    def plan(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "payload_md5",
                "keyframe"]
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for idx, ts, sz, off, key in (
                    mp4_sample_table(b, track="audio") or []
                ):
                    out.append((
                        mid, idx, ts, sz,
                        hashlib.md5(b[off : off + sz]).hexdigest(), key,
                    ))
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(
        plan,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "payload_md5 string, keyframe boolean",
    )


def aac_frame_plan_q(spark, sf_dir):
    """ADTS/AAC frame plans (multimodal.py adts_frame_table) — the
    raw-stream AAC sibling of mp3_frame_plan, covering the audio format
    real crawls carry alongside MP3: every document mints a 6-frame
    ADTS stream — sample rate cycling 44100/48000/32000/22050 via the
    sampling-frequency-index table, payload sizes 50+(doc_id+g)%9, a
    per-frame CRC (9-byte header) when bit g of doc_id%64 is set, an
    ID3v2 tag (14 payload bytes) skipped on even doc_ids — and the plan
    reads each frame's length DIRECTLY from the 13-bit
    aac_frame_length field (header included) with ts accumulating 1024
    samples per frame. The output md5s each frame's codec payload; the
    oracle restates length (incl. the CRC header growth), cumulative
    offset, timestamps, and filler arithmetically. Same 100 TB shape:
    independent (offset, size) range-read decode tasks."""
    import hashlib

    import pandas as pd

    from fluent_bit_spark.extensions.multimodal import (
        adts_frame_table,
        make_adts_frames,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def run(batches):
        cols = ["media_id", "frame_idx", "ts_ms", "size", "offset",
                "payload_md5"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                crc_pattern = d % 64
                b = make_adts_frames(
                    6,
                    sample_rate=(44100, 48000, 32000, 22050)[d % 4],
                    payload_size=[50 + (d + g) % 9 for g in range(6)],
                    crc_pattern=crc_pattern,
                    id3_size=14 if d % 2 == 0 else None,
                )
                for idx, ts, sz, off in adts_frame_table(b) or []:
                    hdr = 9 if (crc_pattern >> idx) & 1 else 7
                    out.append((
                        d, idx, ts, sz, off,
                        hashlib.md5(b[off + hdr : off + sz]).hexdigest(),
                    ))
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(
        run,
        schema="media_id long, frame_idx int, ts_ms bigint, size bigint, "
               "offset bigint, payload_md5 string",
    )


def warc_quality_pipeline_q(spark, sf_dir):
    """The crawl-bucket composition gate (html.py warc_gz_records ->
    warc_parse -> text.py quality_score): every document's text ships
    as the HTTP payload of a one-response .warc.gz (canonical
    member-per-record for even doc_ids, whole-stream member for odd),
    is recovered through member inflate -> Content-Length framing ->
    WARC/HTTP header split, and the recovered body feeds the SAME
    quality stack the documents table feeds directly — so the oracle is
    text_quality's own SQL over documents.text verbatim. Any byte lost
    or added anywhere in the source chain shifts q_chars/q_tokens and
    hash-fails. This is the source-layer elevation the r10 verdict
    asked for: binaryFile-shaped crawl payloads to quality metrics in
    one declarative chain."""
    import pandas as pd

    from fluent_bit_spark.extensions.html import (
        make_warc_gz,
        make_warc_record,
        warc_gz_records,
        warc_parse,
    )
    from fluent_bit_spark.extensions.text import quality_score

    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(did)
                rec = make_warc_record(
                    "response", f"https://crawl.example/d{d}", str(text),
                    http_status=200, content_type="text/plain",
                )
                out.append(
                    (d, make_warc_gz([rec], per_record_members=(d % 2 == 0)))
                )
            yield pd.DataFrame(out, columns=["doc_id", "content"])

    gz = docs.mapInPandas(gen, schema="doc_id long, content binary")
    parsed = warc_parse(warc_gz_records(gz), raw_col="raw", id_col="doc_id")
    scored = quality_score(parsed.select("doc_id", F.col("body").alias("text")))
    return scored.select(
        "doc_id", "q_chars", "q_tokens",
        F.round("q_punct_ratio", 6).alias("q_punct_ratio"),
        F.round("q_stop_ratio", 6).alias("q_stop_ratio"),
        F.round("q_mean_word_len", 6).alias("q_mean_word_len"),
        "quality",
    )


def warc_fetch_windows_q(spark, sf_dir):
    """Crawl EVENT TIME (streaming.sources.warc_event_time, the
    ts_from='warc_date' derivation warc_source stamps the envelope
    with): every document ships as a one-response .warc.gz whose
    WARC-Date is 2024-05-01T10:00:00Z + (doc_id*7 % 600) seconds —
    fractional '.250' seconds on every 3rd doc (WARC 1.1), the
    '+00:00' offset spelling instead of 'Z' on every 5th — and
    per-minute fetch-rate windows aggregate over the PARSED crawl time
    (count, distinct URIs, max ts). The oracle restates the timestamps
    arithmetically (never parsing the strings), so a wrong format
    pattern, a dropped fraction, or a TZ mishandling shifts
    last_fetch/fetches and hash-fails. This is the event-time
    windowed-analytics surface the r11 verdict asked for: downsampling
    a crawl stream by when pages were FETCHED, not when the archive was
    replayed."""
    import pandas as pd

    from fluent_bit_spark.extensions.html import (
        make_warc_gz,
        make_warc_record,
        warc_gz_records,
        warc_parse,
    )
    from fluent_bit_spark.streaming.sources import warc_event_time

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                sec = d * 7 % 600
                frac = ".250" if d % 3 == 0 else ""
                tz = "+00:00" if d % 5 == 0 else "Z"
                date = f"2024-05-01T10:{sec // 60:02d}:{sec % 60:02d}{frac}{tz}"
                rec = make_warc_record(
                    "response", f"https://crawl.example/d{d}", f"fetch {d}",
                    content_type="text/plain", date=date,
                )
                out.append(
                    (d, make_warc_gz([rec], per_record_members=(d % 2 == 0)))
                )
            yield pd.DataFrame(out, columns=["doc_id", "content"])

    gz = docs.mapInPandas(gen, schema="doc_id long, content binary")
    parsed = warc_parse(warc_gz_records(gz), raw_col="raw", id_col="doc_id")
    return (
        parsed.withColumn("ts", warc_event_time())
        .groupBy(F.window("ts", "1 minute"))
        .agg(
            F.count("*").alias("fetches"),
            F.countDistinct("target_uri").alias("uris"),
            F.max("ts").alias("last_fetch"),
        )
        .select(F.col("window.start").alias("w"), "fetches", "uris",
                "last_fetch")
    )


def boilerplate_blocks_q(spark, sf_dir):
    """jusText-style block classification (html.py html_blocks): every
    document mints a page with a 3-link nav div (5 tokens, link density
    0.6 -> 'boilerplate') and four paragraphs of 5/10/15 tokens by
    (doc_id+g)%3 ('short' under 10 tokens, else 'good') — the
    block-level chrome-vs-prose separation corpus pipelines run between
    WET extraction and quality scoring (Pomikálek 2011's two core
    signals as pure Catalyst). The oracle restates every block's text,
    token/link counts, density, and label from doc_id arithmetic — a
    wrong split position, a fused tag, or a flipped label rule
    hash-fails."""
    from fluent_bit_spark.extensions.html import html_blocks

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))
    nav = ('<div>nav <a href="u">go</a> <a href="u">go</a> '
           '<a href="u">go</a> menu</div>')
    paras = F.concat(*[
        F.concat(
            F.lit("<p>"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(4) + ((F.col("doc_id") + g) % 3) * 5),
                    lambda i: F.concat(
                        F.lit("t"), F.col("doc_id").cast("string"),
                        F.lit(f"_{g}_"), i.cast("string"),
                    ),
                ),
            ),
            F.lit("</p>"),
        )
        for g in range(4)
    ])
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body>" + nav), paras, F.lit("</body></html>")
        ).alias("html"),
    )
    return html_blocks(pages)


def boilerplate_context_q(spark, sf_dir):
    """jusText's CONTEXT-SENSITIVE pass (html.py revise_block_labels
    over html_blocks(near_good_tokens=15)) — the absorption rules that
    were documented out of envelope until r12: every document mints a
    10-block page planting each rule — a short block whose fate flips
    with doc parity (bridged to good through a near_good block on even
    docs; pinned boilerplate when that slot is a nav on odd docs), the
    SAME parity flipping the near_good slot itself, a near_good between
    good and boilerplate (kept), and a near_good surrounded by navs
    (absorbed INTO boilerplate). The oracle restates every context-free
    class AND final label from doc_id arithmetic — a wrong neighbour
    walk (not skipping short blocks, missing the ignore-neargood
    distinction, boundary not counting as boilerplate) flips labels and
    hash-fails. Pure Catalyst: two window frames over one (doc,
    block_idx) exchange."""
    from fluent_bit_spark.extensions.html import (
        html_blocks,
        revise_block_labels,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))
    nav = ('<div>nav <a href="u">go</a> <a href="u">go</a> '
           '<a href="u">go</a> menu</div>')

    def para(blk, n):
        return F.concat(
            F.lit("<p>"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n - 1)),
                    lambda i: F.concat(
                        F.lit("t"), F.col("doc_id").cast("string"),
                        F.lit(f"_{blk}_"), i.cast("string"),
                    ),
                ),
            ),
            F.lit("</p>"),
        )

    slot4 = F.when(F.col("doc_id") % 2 == 0, para(4, 12)).otherwise(
        F.lit(nav)
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body>" + nav),
            para(2, 20), para(3, 3), slot4, F.lit(nav),
            para(6, 20), para(7, 12), F.lit(nav), para(9, 12),
            F.lit(nav + "</body></html>"),
        ).alias("html"),
    )
    blocks = html_blocks(pages, near_good_tokens=15)
    return revise_block_labels(blocks).select(
        "doc_id", "block_idx", "n_tokens", "cf_label", "label"
    )


def warc_gz_roundtrip_q(spark, sf_dir):
    """The ON-DISK crawl layout (html.py warc_gz_records): every
    document mints a 3-record .warc.gz — a response (status cycling
    200/404/301, HTML body), a request (no HTTP block -> NULL status),
    and a text/plain 500 response — gzip-compressed one member per
    record for even doc_ids (the canonical random-access layout) and as
    ONE whole-stream member for odd (the non-canonical layout some
    writers emit; Content-Length framing splits it identically). The
    records flow through member inflate -> Content-Length split ->
    warc_parse, and the oracle restates every field from doc_id
    arithmetic — a framing bug (separator scan instead of
    Content-Length, torn member, wrong body slice) hash-fails."""
    import pandas as pd

    from fluent_bit_spark.extensions.html import (
        make_warc_gz,
        make_warc_record,
        warc_gz_records,
        warc_parse,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                status = (200, 404, 301)[d % 3]
                recs = [
                    make_warc_record(
                        "response", f"https://ex.com/d{d}/0",
                        f"<html><p>doc {d} body</p></html>",
                        http_status=status,
                    ),
                    make_warc_record(
                        "request", f"https://ex.com/d{d}/0",
                        f"GET /d{d}", http_status=None,
                    ),
                    make_warc_record(
                        "response", f"https://ex.com/d{d}/2",
                        f"plain {d}", http_status=500,
                        content_type="text/plain",
                    ),
                ]
                out.append(
                    (d, make_warc_gz(recs, per_record_members=(d % 2 == 0)))
                )
            yield pd.DataFrame(out, columns=["doc_id", "content"])

    gz = docs.mapInPandas(gen, schema="doc_id long, content binary")
    recs = warc_gz_records(gz).withColumn(
        "rk", F.col("doc_id") * 4 + F.col("record_idx")
    )
    parsed = warc_parse(recs, raw_col="raw", id_col="rk")
    return parsed.select(
        (F.col("rk") / 4).cast("long").alias("doc_id"),
        F.pmod(F.col("rk"), F.lit(4)).cast("int").alias("record_idx"),
        "warc_type", "target_uri", "http_status", "content_type", "body",
    )


def mojibake_repair_q(spark, sf_dir):
    """ftfy-style Unicode hygiene (text.py fix_mojibake_str via
    normalize_unicode): every document gets a non-ASCII suffix (curly
    quotes, dashes, currency, CJK — the testdata corpus is pure ASCII,
    so the suffix makes the repair path real work), then the text is
    MANGLED the way broken pipelines do it — UTF-8 bytes re-read as
    latin-1 ('café' -> 'cafÃ©'), DOUBLE-mangled for every 3rd doc —
    and the operator must recover the original exactly (the oracle is
    the plain documents.text plus the literal suffix). The repair is
    self-limiting: it fires only when the strict re-encode/re-decode
    roundtrip succeeds AND shrinks, so genuine accented text never
    corrupts (unit-tested)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.text import normalize_unicode

    suffix = " café № Ω — ₤5 “quoted” 日本語"
    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))

    @pandas_udf("string")
    def mangle(ids: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for d, t in zip(ids, texts):
            s = (str(t) + suffix).encode("utf-8").decode("latin-1")
            if int(d) % 3 == 0:  # double-encoded payload
                s = s.encode("utf-8").decode("latin-1")
            out.append(s)
        return pd.Series(out)

    broken = docs.select(
        "doc_id", mangle("doc_id", "text").alias("text")
    )
    return normalize_unicode(broken).select("doc_id", "text")


def media_sniff_extended_q(spark, sf_dir):
    """Extended media triage (multimodal.py parse_media_header): the
    crawled-corpus formats beyond the PNG/JPEG/GIF/BMP/WAV five — every
    document mints a WebP (variant cycling lossy VP8 / lossless VP8L /
    extended VP8X by doc_id%3), a FLAC STREAMINFO (rate/channels/bits/
    duration all doc_id-derived), an MPEG-1 Layer III frame header
    (alternating stereo/mono, every other one behind an ID3v2 tag — the
    tag-skip path), and a TIFF IFD (alternating little/big endian,
    SHORT and LONG tag types). The oracle recomputes every field
    arithmetically, so a bit-packing mistake in any of the four parsers
    hash-fails its rows."""
    import pandas as pd

    from fluent_bit_spark.extensions.multimodal import (
        extract_media_headers,
        make_flac,
        make_mp3,
        make_tiff,
        make_webp,
        to_media_frame,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                out.append((d, make_webp(
                    16 + d % 600, 16 + d % 400,
                    ("vp8", "vp8l", "vp8x")[d % 3],
                )))
                rate = 8000 + (d % 5) * 4000
                out.append((d + 1_000_000, make_flac(
                    rate, 1 + d % 2, 16 + (d % 2) * 8, rate * (1 + d % 4),
                )))
                out.append((d + 2_000_000, make_mp3(
                    (44100, 48000, 32000)[d % 3],
                    stereo=(d % 2 == 0), id3=(d % 4 < 2),
                )))
                out.append((d + 3_000_000, make_tiff(
                    1 + d % 640, 1 + d % 480, 8 + (d % 2) * 8, 1 + d % 3,
                    big_endian=bool(d % 2),
                )))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = to_media_frame(
        docs.mapInPandas(gen, schema="media_id long, content binary"),
        "media_id", F.col("content"), "image",
    )
    return extract_media_headers(media).select(
        "media_id", "format", "width", "height", "channels", "bit_depth",
        "sample_rate", "duration_ms",
    )


def adpcm_roundtrip_q(spark, sf_dir):
    """IMA-ADPCM WAV decode (multimodal.py _ima_decode via
    decode_wav_samples — format tag 0x11, the common compressed-WAV
    layout): every document synthesizes a deterministic int16 signal,
    encodes it to ADPCM (mono block_align=64 for even doc_ids, STEREO
    block_align=72 for odd — the 4-byte channel-group interleave path),
    and decodes through the public operator. ADPCM is lossy, but
    encoder and decoder run the same public state machine, so the
    decoded stream must equal the encoder's own reconstruction
    BIT-EXACTLY — that equality is the truth column, and n_samples
    comes from the block arithmetic the oracle restates in SQL
    (121 samples/block mono, 65 stereo)."""
    import numpy as np
    import pandas as pd

    from fluent_bit_spark.extensions.multimodal import (
        decode_wav_samples,
        make_wav_ima_adpcm,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def run(batches):
        cols = ["doc_id", "n_samples", "decode_matches_encoder"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                d = int(did)
                k = 1 + d % 3
                stereo = bool(d % 2)
                spb = 65 if stereo else 121
                sig = np.array(
                    [((d * 13 + i * i) % 20_000) - 10_000
                     for i in range(spb * k)],
                    dtype=np.int64,
                )
                wav, recon = make_wav_ima_adpcm(
                    8000, sig, channels=2 if stereo else 1,
                    block_align=72 if stereo else 64,
                )
                got = decode_wav_samples(wav)
                ok = False
                n = 0
                if got is not None:
                    dec16 = np.round(got[1] * 32768).astype(np.int64)
                    n = len(dec16)
                    ok = n == len(recon) and bool(
                        (dec16 == recon.astype(np.int64)).all()
                    )
                out.append((d, n, ok))
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(
        run,
        schema="doc_id bigint, n_samples bigint, "
               "decode_matches_encoder boolean",
    )


def gif_animation_q(spark, sf_dir):
    """Animated-GIF frame COMPOSITION (multimodal.py
    gif_animation_frames): every document mints a GIF89a with a full
    base frame (canvas value at linear pixel i = (doc_id*31 + 17i) %
    256 on the identity gray palette) plus 2-4 one-by-two patch frames,
    each patch's SECOND pixel transparent (index 255) so composition
    must keep the underlying canvas there, patches at distinct linear
    positions 2(f-1) with value (doc_id + 91f) % 255, delays of f+1
    centiseconds, disposal keep. The output row per composed frame is
    (frame_idx, ts_ms = cumulative prior delays, delay_ms, px_sum =
    sum of the red channel over the whole canvas) — and the oracle
    recomputes px_sum as base-sum plus the running patch deltas in pure
    SQL, so a mis-composed transparent pixel, a wrong patch offset, a
    dropped frame, or delay/timestamp arithmetic errors all hash-fail."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import (
        gif_animation_frames,
        make_gif_animation,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    @pandas_udf("binary")
    def to_gif(ids: pd.Series) -> pd.Series:
        out = []
        for did in ids:
            d = int(did)
            base = bytes((d * 31 + 17 * i) % 256 for i in range(72))
            frames = [(0, 0, 9, 8, base, 1, 1, None)]
            for f in range(1, 3 + d % 3):
                p = 2 * (f - 1)
                y, x = divmod(p, 9)
                newv = (d + 91 * f) % 255
                frames.append(
                    (x, y, 2, 1, bytes([newv, 255]), f + 1, 1, 255)
                )
            out.append(make_gif_animation(9, 8, frames))
        return pd.Series(out)

    media = docs.select(
        F.col("doc_id").alias("media_id"), to_gif("doc_id").alias("content")
    )
    frames = gif_animation_frames(media)

    @pandas_udf("long")
    def red_sum(px: pd.Series) -> pd.Series:
        return pd.Series(
            [int(np.frombuffer(p, np.uint8)[0::3].sum()) for p in px]
        )

    return frames.select(
        "media_id", "frame_idx", "ts_ms", "delay_ms",
        red_sum("pixels").alias("px_sum"),
    )


def caption_coverage_q(spark, sf_dir):
    """Caption COVERAGE accounting (r9 verdict task #8): the same
    fixtures as caption_frames, but aligned with ``uncovered=True`` —
    the LEFT-join mode that emits NULL-cue rows for frames no cue
    covers — then folded to per-clip coverage (n_frames, n_covered,
    coverage). The oracle replays the cue-window arithmetic in SQL, so
    a dropped uncovered frame (the inner join's failure mode) or a
    double-counted covered frame hash-fails the row. Every clip here
    has uncovered frames by construction (the last 1-2 samples fall
    past cue 1's 400 ms end, and even doc_ids leave a 100-200 ms gap)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import to_media_frame
    from fluent_bit_spark.extensions.video import (
        align_captions_to_frames,
        extract_captions,
        make_mp4,
        video_frame_plan,
    )

    docs = _docs(spark, sf_dir).select("doc_id")

    @pandas_udf("binary")
    def to_mp4(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_mp4(16, 16, [100] * (4 + int(d) % 3), [40] * (4 + int(d) % 3))
                for d in ids
            ]
        )

    @pandas_udf("string")
    def to_track(ids: pd.Series) -> pd.Series:
        out = []
        for d in ids:
            d = int(d)
            e0 = 100 + 100 * (d % 2)
            if d % 2 == 0:
                out.append(
                    f"1\n00:00:00,000 --> 00:00:00,{e0:03d}\nd{d} c0\n\n"
                    f"2\n00:00:00,200 --> 00:00:00,400\nd{d} c1\n"
                )
            else:
                out.append(
                    "WEBVTT\n\n"
                    f"00:00.000 --> 00:00.{e0:03d} align:start\nd{d} c0\n\n"
                    f"00:00.200 --> 00:00.400\nd{d} c1\n"
                )
        return pd.Series(out)

    media = to_media_frame(
        docs.select(
            F.col("doc_id").alias("media_id"), to_mp4("doc_id").alias("content")
        ),
        "media_id", F.col("content"), "video",
    )
    plan = video_frame_plan(media)
    cues = extract_captions(
        docs.select(
            F.col("doc_id").alias("media_id"),
            to_track("doc_id").alias("caption_text"),
        )
    )
    aligned = align_captions_to_frames(cues, plan, uncovered=True)
    return aligned.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.count("cue_idx").alias("n_covered"),
        F.round(F.count("cue_idx") / F.count(F.lit(1)), 6).alias("coverage"),
    )


def tar_shard_roundtrip_q(spark, sf_dir):
    """WebDataset-layout terminal step: every document becomes a
    two-member sample (<key>.txt = the text, <key>.cls = the label
    digit), written into 16 deterministic tar shards (stdlib tarfile,
    mtime-0 reproducible bytes, tmp+rename publication, same-key
    co-location by hash-of-key) and read BACK through the binaryFile
    source — the output is the re-read member table (key, ext, n_bytes,
    md5), which the oracle recomputes from the documents table alone,
    so a corrupted write, a lost member, or a content mutation anywhere
    in the tar cycle hash-fails the row."""
    import tempfile

    from fluent_bit_spark.extensions.shards import (
        read_tar_shards,
        write_tar_shards,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    members = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
        F.lit("txt").alias("ext"),
        F.encode("text", "UTF-8").alias("content"),
    ).unionByName(
        docs.select(
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
            F.lit("cls").alias("ext"),
            F.encode((F.col("doc_id") % 10).cast("string"), "UTF-8").alias(
                "content"
            ),
        )
    )
    out_dir = tempfile.mkdtemp(prefix="fbs_tar_shards_")
    write_tar_shards(members, out_dir, 16).collect()  # materialize the write
    back = read_tar_shards(spark, out_dir)
    return back.select(
        "key", "ext",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


def _audio_wav_corpus(spark, sf_dir):
    """The audio_neardup corpus: each embedding row rendered as a real
    16-bit mono WAV (a deterministic step-wave from the quantized
    embedding values); every 25th clip gets a 2x-volume copy at id +
    1,000,000 — exactly representable in int16. Shared by the witnessed
    registry query and the guarded bench form so both time the same
    decode load. NOTE this corpus is degenerate BY CONSTRUCTION: every
    clip is the same 62.5 Hz step comb (values repeat 128x at 8 kHz)
    at slightly varying heights, i.e. uniformly near-constant — hot
    subfingerprint buckets here are corpus-wide similarity, not
    low-energy noise (measured: the hottest buckets' AC-RMS
    distribution matches the corpus's, BASELINE.md r9)."""
    import struct

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings")

    @pandas_udf("binary")
    def to_wav(vecs: pd.Series, gains: pd.Series) -> pd.Series:
        out = []
        for v, gain in zip(vecs, gains):
            a = np.asarray(v, dtype="float64")
            q = (np.floor(np.abs(a) * 997.0) % 8000.0) - 4000.0
            samples = (np.repeat(q, 128) * int(gain)).astype("<i2")
            data = samples.tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
            out.append(
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
        return pd.Series(out)

    base = emb.select(
        F.col("vec_id").alias("media_id"),
        to_wav(F.col("embedding"), F.lit(1)).alias("content"),
    )
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("media_id"),
        to_wav(F.col("embedding"), F.lit(2)).alias("content"),
    )
    return base.unionByName(copies).localCheckpoint(eager=True)


def audio_neardup_guarded_raw(spark, sf_dir):
    """Bench-only bare operator: audio_neardup_join with BOTH
    quadratic-pocket guards engaged — max_bucket=200 (frequency
    stop-list) and energy_floor=1e-3 (-60 dBFS probe gate) — on the
    same corpus as the witnessed registry query. This is the
    production configuration for an untrusted corpus; scale_check
    measures its 30x alpha next to the exact default's."""
    from fluent_bit_spark.extensions.multimodal import (
        audio_neardup_join, to_media_frame,
    )

    corpus = _audio_wav_corpus(spark, sf_dir)
    media = to_media_frame(corpus, "media_id", F.col("content"), "audio")
    return audio_neardup_join(
        media, max_ber=0.25, max_bucket=200, energy_floor=1e-3
    )


def audio_neardup_q(spark, sf_dir):
    """SAMPLE-level audio near-dup on codec-free WAV PCM: each embedding
    row becomes a real 16-bit mono WAV (a deterministic step-wave from
    the quantized embedding values); every 25th clip gets a 2x-volume
    copy — exactly representable in int16, and the Haitsma-Kalker
    subfingerprint is a sign pattern of band-energy DIFFERENCES, so the
    copy's fingerprint is bit-identical and audio_neardup_join must find
    every planted pair at offset 0 with BER 0 via its exact-match
    lookup-table probe. The WITNESS recomputes each returned pair's BER
    brute-force from the decoded samples (re-fingerprinting both clips
    in Python and xor-counting at the pair's offset, bypassing the JVM
    slice/zip_with/bit_count path) and demands equality. Truth table per
    planted id: found + pair_witnessed + global all_pairs_witnessed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from fluent_bit_spark.extensions.multimodal import (
        audio_neardup_join,
        audio_subfingerprints,
        decode_wav_samples,
        to_media_frame,
    )

    from concurrent.futures import ThreadPoolExecutor

    emb = load_table(spark, sf_dir, "embeddings")
    # mint the WAV corpus ONCE: un-pinned, the Arrow synth pass re-ran
    # for the operator join AND the witness fingerprint pass
    corpus = _audio_wav_corpus(spark, sf_dir).localCheckpoint(eager=True)
    media = to_media_frame(corpus, "media_id", F.col("content"), "audio")

    # witness fingerprints: one decode+FFT pass PER CLIP (not per pair
    # side — a clip appears in many pairs), still fully independent of
    # the operator's exploded-table/JVM-xor path
    @pandas_udf("array<long>")
    def brute_fp(cs: pd.Series) -> pd.Series:
        return pd.Series(
            [audio_subfingerprints(decode_wav_samples(bytes(c))[1]) for c in cs]
        )

    # operator join and witness FFT are independent chains over the
    # pinned corpus: overlap them as concurrent driver jobs
    with ThreadPoolExecutor(max_workers=2) as pool:
        fp_ = pool.submit(
            lambda: audio_neardup_join(media, max_ber=0.25).localCheckpoint(
                eager=True
            )
        )
        fw = pool.submit(
            lambda: corpus.select(
                "media_id", brute_fp("content").alias("__fp")
            ).localCheckpoint(eager=True)
        )
        pairs, wfp = fp_.result(), fw.result()

    @pandas_udf("double")
    def brute_ber(fa_s: pd.Series, fb_s: pd.Series, offs: pd.Series) -> pd.Series:
        out = []
        for fa, fb, off in zip(fa_s, fb_s, offs):
            fa, fb, off = list(fa), list(fb), int(off)
            ai = max(0, -off)
            bi = max(0, off)
            n = min(len(fa) - ai, len(fb) - bi)
            bits = sum(
                bin(fa[ai + i] ^ fb[bi + i]).count("1") for i in range(n)
            )
            # UNROUNDED: python round() is banker's and disagrees with the
            # join's HALF_UP F.round at exact half-way values (x.xxx5);
            # the comparison below rounds both sides the same way
            out.append(bits / (n * 32.0) if n > 0 else None)
        return pd.Series(out)

    def side(tag):
        return wfp.select(
            F.col("media_id").alias(f"id_{tag}"),
            F.col("__fp").alias(f"__f{tag}"),
        )

    wit = (
        pairs.join(F.broadcast(side("a")), "id_a")
        .join(F.broadcast(side("b")), "id_b")
        .select(
            "id_a", "id_b", "offset", "ber",
            brute_ber("__fa", "__fb", "offset").alias("w_ber"),
        )
        .localCheckpoint(eager=True)
    )
    all_ok = wit.filter(
        F.col("w_ber").isNull()
        | (F.abs(F.col("ber") - F.round(F.col("w_ber"), 6)) > 1e-9)
    ).count() == 0
    wit_planted = (
        wit.where((F.col("id_b") == F.col("id_a") + 1_000_000) & (F.col("offset") == 0))
        .select(
            F.col("id_a").alias("vec_id"),
            ((F.col("ber") == 0.0) & (F.col("w_ber") == 0.0)).alias("pair_witnessed"),
        )
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select("vec_id")
    return planted.join(wit_planted, "vec_id", "left").select(
        "vec_id",
        F.col("pair_witnessed").isNotNull().alias("found"),
        F.coalesce("pair_witnessed", F.lit(False)).alias("pair_witnessed"),
        F.lit(bool(all_ok)).alias("all_pairs_witnessed"),
    )


def multimodal_headers_q(spark, sf_dir):
    """Real container-header decode: synthesize valid PNG/JPEG/GIF/BMP/WAV
    payloads from doc_id arithmetic, then parse dimensions/channels/rate
    back out of the raw bytes (extensions/multimodal.py parse_media_header).
    The oracle recomputes the expected metadata arithmetically, so the
    encode->decode path is fully hash-checked."""
    import pandas as pd

    from fluent_bit_spark.extensions.multimodal import (
        extract_media_headers, make_bmp, make_gif, make_jpeg, make_png, make_wav,
    )

    docs = _spread(_docs(spark, sf_dir).select("doc_id"))

    def build(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                m, w, h = i % 5, (i % 640) + 1, (i % 480) + 1
                if m == 0:
                    b = make_png(w, h)
                elif m == 1:
                    b = make_jpeg(w, h)
                elif m == 2:
                    b = make_gif(w, h)
                elif m == 3:
                    b = make_bmp(w, h)
                else:
                    b = make_wav((i % 2) + 1, 8000, 16, ((i % 100) + 1) * 8)
                rows.append({"media_id": i, "kind": "media", "content": b})
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    media = docs.mapInPandas(
        build, "media_id bigint, kind string, content binary"
    )
    return extract_media_headers(media).select(
        "media_id", "format", "width", "height", "channels",
        "bit_depth", "sample_rate", "duration_ms",
    )


def doc_fingerprint_q(spark, sf_dir):
    from fluent_bit_spark.extensions.text import fingerprint

    return _docs(spark, sf_dir).select("doc_id", fingerprint(F.col("text")).alias("fp"))


def multimodal_metadata_q(spark, sf_dir):
    from fluent_bit_spark.extensions.multimodal import extract_media_metadata, to_media_frame

    media = to_media_frame(
        _docs(spark, sf_dir), "doc_id", F.encode(F.col("text"), "utf-8"), "image"
    )
    return extract_media_metadata(media)


def pack_sequences_q(spark, sf_dir):
    """Token-stream packing on INTEGER token ids with the zero-merge
    (character) tokenizer so the whole pipeline is SQL-replayable: each
    doc's token stream is its normalized text with spaces as word-end
    markers, ids are positions in the sorted corpus vocabulary
    (bpe_vocab), the global id stream is the doc_id-ordered
    concatenation, and sequences are fixed 256-token cuts. The oracle
    derives the same vocabulary independently (distinct chars of the
    rebuilt stream, binary-collation sorted) and checks every sequence's
    id-stream hash and document-start slots — so a wrong id assignment,
    not just a wrong cut, fails the row."""
    from fluent_bit_spark.extensions.bpe import bpe_vocab, pack_token_sequences

    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))
    vocab = bpe_vocab(docs, [])
    out = pack_token_sequences(docs, [], seq_len=256, vocab=vocab)
    return out.select(
        "seq_id",
        "n_tokens",
        F.md5(
            F.array_join(
                F.transform("tokens", lambda t: t.cast("string")), ","
            )
        ).alias("seq_hash"),
        F.array_join(
            F.transform("doc_starts", lambda s: s.cast("string")), ","
        ).alias("doc_starts"),
    )


def pack_ffd_q(spark, sf_dir):
    """Document-aware FFD packing contract (char tokenizer so the
    numeric witnesses replay in SQL): no sequence overflows, every doc
    piece is packed exactly once (count replayed from the text itself),
    tokens are conserved (total replayed), and the sequence count is
    within the FFD waste bound. The full doc-integrity property (each
    sequence equals the concatenation of its docs' encodings) is
    pytest-gated (test_pack_sequences_ffd_document_aware)."""
    from fluent_bit_spark.extensions.bpe import pack_sequences_ffd
    from fluent_bit_spark.extensions.dedup import normalize_text

    L, G = 256, 8
    docs = _spread(_docs(spark, sf_dir).select("doc_id", "text"))
    seqs = pack_sequences_ffd(docs, [], seq_len=L, num_groups=G)
    seqs = seqs.localCheckpoint(eager=True)  # reused by 4 checks
    # expected totals in pure Catalyst: under the zero-merge (char)
    # tokenizer n_tokens == length(normalized text) + 1 word-end marker
    # per word == length(norm)+1 for non-empty docs — the SAME stream-form
    # arithmetic the DuckDB oracle replays (replace(norm,' ',chr(30)) ||
    # chr(30)), so the scan-side aggregate replaces a full second Arrow
    # encode pass of the corpus (guide: prefer built-ins over the Python
    # boundary) without touching the witnessed values
    # word-split form rather than length(norm)+1: the two agree when
    # every separator in norm is a single ASCII space (this corpus), but
    # the encoder's Python .split() also breaks on Unicode whitespace
    # that Java's ASCII-only \s+ collapse leaves in the text, so the
    # robust expression sums len(word)+1 over the SAME word set the
    # encoder sees (each word emits its chars + one end marker); the
    # DuckDB oracle's stream-form replay is unchanged and agrees on
    # ASCII corpora
    norm = normalize_text(F.col("text"))
    words = F.filter(
        F.split(norm, r"[\s\p{Z}\x1c-\x1f\x85]+"), lambda w: w != ""
    )
    ntok = F.coalesce(
        F.aggregate(
            words, F.lit(0), lambda a, w: a + F.length(w) + F.lit(1)
        ),
        F.lit(0),
    )
    exp = docs.agg(
        F.sum(ntok).cast("long").alias("total"),
        F.sum(
            F.when(ntok > 0, F.ceil(ntok / F.lit(float(L))))
        ).cast("long").alias("n_pieces"),
    ).collect()[0]
    got = seqs.agg(
        F.every(F.col("n_tokens") <= L).alias("no_overflow"),
        F.sum("n_tokens").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
    ).collect()[0]
    pieces = seqs.select(F.explode("doc_ids").alias("p"))
    pc = pieces.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct(F.col("p")).cast("long").alias("n_d"),
    ).collect()[0]
    # SOUND waste bound (the 11/9 FFD guarantee is over OPT, which the
    # output can't witness — substituting the volume lower bound for OPT
    # false-fails when docs just over L/2 dominate). First-fit invariant:
    # no two bins in a group both end <= L/2 full, so at most G bins are
    # <= half full and the rest each hold > L/2 tokens:
    #   n_seqs < 2*total/L + G ; and trivially n_seqs <= n_pieces.
    bound = min(2 * (exp["total"] or 0) / L + G, float(exp["n_pieces"] or 0))
    rows = [
        ("no_overflow", bool(got["no_overflow"]), None),
        ("doc_pieces_once", pc["n"] == pc["n_d"] == exp["n_pieces"], int(exp["n_pieces"])),
        ("token_conservation", got["total"] == exp["total"], int(exp["total"])),
        ("ffd_bound", got["n_seqs"] <= bound, None),
    ]
    return spark.createDataFrame(rows, "chk string, ok boolean, val bigint")


def stratified_sample_q(spark, sf_dir):
    """Deterministic per-language sampling (en=1.0, de=0.5, fr=0.25,
    default 0.1): membership is a pure md5 function of (doc_id, seed), so
    the DuckDB oracle replays the exact kept set — the reproducibility
    DataFrame.sampleBy can't give."""
    from fluent_bit_spark.extensions.mixing import stratified_sample

    docs = _docs(spark, sf_dir)
    out = stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.5, "fr": 0.25},
        default_fraction=0.1,
    )
    return out.select("doc_id", "lang")


def dataset_diff_q(spark, sf_dir):
    """Corpus-release diff: new = old minus the %7==3 band, with the
    %5==0 band's text modified and a %11==0 band re-added under new ids.
    The oracle derives every row's status from that arithmetic —
    independent of the hash-compare implementation."""
    from fluent_bit_spark.storage import dataset_diff

    old = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    kept = old.filter(F.col("doc_id") % 7 != 3)
    modified = kept.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"),
        "lang",
    )
    added = old.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text", "lang"
    )
    new = modified.unionByName(added)
    return dataset_diff(old, new)


def html_extract_q(spark, sf_dir):
    """WET-creation extraction over deterministic HTML built from the
    documents table (title with an entity, script/style/comment noise,
    two differently-cased links wrapping the doc text). The oracle
    derives the expected title/body/link-count from the SOURCE columns —
    fully independent of the extraction regexes."""
    from fluent_bit_spark.extensions.html import html_extract

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            " &amp; more</title><script>var x = 1 < 2;</script>"
            "<style>p { color: red; }</style></head><body><!-- note --><p>"
        ),
        F.col("text"),
        F.lit('</p><a href="/a">x</a><A HREF="/b">y</A></body></html>'),
    )
    return html_extract(docs.select("doc_id", html.alias("html")))


def robots_compliance_q(spark, sf_dir):
    """Crawl compliance end-to-end: per-domain robots.txt (three
    deterministic regimes — full /p/ disallow, longest-match Allow
    override, non-'*' group only) parsed by parse_robots and applied by
    robots_filter with RFC 9309 longest-match precedence. The oracle
    derives the surviving URL set from the generating arithmetic,
    independent of both the parser and the matcher."""
    from fluent_bit_spark.extensions.urls import parse_robots, robots_filter

    ev = _events(spark, sf_dir)
    url = F.concat(
        F.lit("http://d"), (F.col("user_id") % 10).cast("string"),
        F.lit(".example/p/"), (F.col("event_id") % 100).cast("string"),
    )
    urls = ev.select(F.col("event_id").alias("doc_id"), url.alias("url"))
    doms = spark.range(10).select(
        F.concat(F.lit("d"), F.col("id").cast("string"), F.lit(".example")).alias("domain"),
        F.when(F.col("id") % 3 == 0, "User-agent: *\nDisallow: /p/")
        .when(F.col("id") % 3 == 1, "User-agent: *\nDisallow: /p/\nAllow: /p/1")
        .otherwise("User-agent: googlebot\nDisallow: /")
        .alias("robots_txt"),
    )
    return robots_filter(urls, parse_robots(doms))


def warc_wet_q(spark, sf_dir):
    """The crawl front door end-to-end: deterministic WARC response
    records (WARC headers + HTTP headers + HTML payload templated from
    documents) -> warc_parse -> html_extract = the WARC->WET step. The
    oracle derives every output from the source columns, independent of
    both parsers."""
    from fluent_bit_spark.extensions.html import html_extract, warc_parse

    docs = _spread(_docs(spark, sf_dir))
    raw = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
              "http://site"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example/p/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n\r\n"
              "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
              "\r\n<html><head><title>T</title></head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    recs = warc_parse(docs.select("doc_id", raw.alias("raw")))
    pages = html_extract(
        recs.filter(F.col("http_status") == 200).select(
            "doc_id", "target_uri", F.col("body").alias("html")
        ),
        html_col="html",
    )
    return recs.select(
        "doc_id", "warc_type", "target_uri", "http_status", "content_type"
    ).join(pages.select("doc_id", F.col("body").alias("page_text")), "doc_id")


def pagerank_nodes_q(spark, sf_dir):
    """Fixed-iteration PageRank over a deterministic 40-node graph derived
    from events (src = user%40, dst = (user+event)%40). The DuckDB oracle
    replays all 10 power iterations in one recursive CTE — nodes with no
    in-edges stay alive via synthetic zero-contribution self-edges (a
    recursive term may reference the working table only once, so the
    completeness left-join folds into the edge list instead)."""
    from fluent_bit_spark.extensions.graph import pagerank

    ev = _events(spark, sf_dir)
    edges = ev.select(
        (F.col("user_id") % 40).alias("src"),
        F.pmod(F.col("user_id") + F.col("event_id"), F.lit(40)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    pr = pagerank(edges, iterations=10)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def triangle_count_q(spark, sf_dir):
    """Per-node triangle counts (degree-oriented wedge join, WWW'11
    shape) over a deterministic ~80-node graph derived from events
    (src = user%80, dst = (user*7+event)%80). The oracle brute-forces
    the canonical edge list's a<b<c closed wedges and re-derives every
    node's count — a wrong orientation, a double-counted triangle, or a
    dropped zero-triangle node all hash-fail."""
    from fluent_bit_spark.extensions.graph import triangle_count

    ev = _events(spark, sf_dir)
    edges = ev.select(
        (F.col("user_id") % 80).alias("src"),
        F.pmod(F.col("user_id") * 7 + F.col("event_id"), F.lit(80)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return triangle_count(edges)


def skew_profile_q(spark, sf_dir):
    """Shuffle-key skew diagnostic over lineitem's l_suppkey: top-10
    hottest keys with row share plus total/distinct/max-share summary
    rows — the pre-join planning numbers. Full-value SQL replay
    (counts, shares, deterministic (rows desc, key) tie-break)."""
    from fluent_bit_spark.extensions.sketches import skew_profile

    li = load_table(spark, sf_dir, "lineitem")
    return skew_profile(li, "l_suppkey", top_n=10)


def heavy_hitters_q(spark, sf_dir):
    """Exact-verified heavy hitters over a deliberately skewed derived
    key (30% of events collapse onto the 4 event types; the rest spread
    across thousands of per-user cold keys): the Misra-Gries candidate
    pass must surface exactly the keys above n/k and phase 2 must report
    their exact counts — which is precisely what the GROUP BY ... HAVING
    oracle states."""
    from fluent_bit_spark.extensions.sketches import heavy_hitters

    ev = _events(spark, sf_dir)
    keyed = ev.select(
        F.when(
            F.col("user_id") % 10 < 3, F.col("event_type")
        ).otherwise(
            F.concat_ws("_", "event_type", F.col("user_id").cast("string"))
        ).alias("k")
    )
    return heavy_hitters(keyed, "k", k=50)


def winsorize_q(spark, sf_dir):
    """Percentile clipping of o_totalprice at [0.05, 0.95] — outlier
    taming via the two-driver-scalar exact-percentile pattern (no global
    sort). The oracle recomputes the same quantile_cont cuts and clips;
    values are rounded so the comparison is on the shared 6-decimal
    grid."""
    from fluent_bit_spark.extensions.sketches import winsorize

    orders = load_table(spark, sf_dir, "orders")
    out = winsorize(orders, "o_totalprice", 0.05, 0.95, out_col="clipped")
    return out.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round("clipped", 6).alias("clipped"),
    )


def table_profile_q(spark, sf_dir):
    """Dataset profiling pass (one-agg long-format column profile). The
    exact fields (rows/nulls/type-native min-max surfaced as strings)
    replay directly in DuckDB; the HLL distinct estimate is witnessed
    in-query against the exact distinct count (invariant contract:
    within 10% — far outside the 2% rsd, so a broken sketch fails the
    hash while a healthy one never does)."""
    from fluent_bit_spark.extensions.sketches import profile_columns

    cols = ["event_id", "event_type", "user_id", "value"]
    ev = _events(spark, sf_dir)
    prof = profile_columns(ev, cols)
    exact = ev.agg(*[
        F.count_distinct(F.col(c)).alias(c) for c in cols
    ]).select(
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("column"), F.col(c).alias("exact_distinct"))
                for c in cols
            ])
        ).alias("e")
    ).select("e.*")
    return prof.join(F.broadcast(exact), "column").select(
        "column", "n_rows", "n_nulls", "min_value", "max_value",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.1
        ).alias("distinct_ok"),
    )


def media_resize_grid_q(spark, sf_dir):
    """Image-pipeline plumbing chain: payload -> resize (Arrow-batched
    binary mapInPandas; pixel step is the deterministic stand-in, the
    plan is the deployment plan) -> REAL header re-parse of the emitted
    PNG -> ViT patch grid. The oracle replays the structure exactly:
    every doc yields a 64x48 PNG whose parsed dims are the targets, and
    a 16px grid over 64x48 is 4x3=12 patches with fixed offsets."""
    from fluent_bit_spark.extensions.multimodal import (
        extract_media_headers, image_patch_grid, resize_images, to_media_frame,
    )

    media = to_media_frame(
        _spread(_docs(spark, sf_dir)), "doc_id", F.encode(F.col("text"), "utf-8"), "image"
    )
    resized = resize_images(media, 64, 48)
    headers = extract_media_headers(resized).select(
        "media_id", "format", "width", "height"
    )
    patches = image_patch_grid(headers, patch=16)
    return patches.join(headers, "media_id").select(
        "media_id", "format", "width", "height",
        "patch_row", "patch_col", "x0", "y0",
    )


def es_bulk_encode(spark, sf_dir):
    """out_es bulk shaping: logstash index rotation + Id_Key extraction +
    doc serialization, all codegen'd expressions over the scan — no shuffle
    at any scale (plugins/out_es/es.c:744-838)."""
    from fluent_bit_spark.connectors import es_bulk

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    return es_bulk(
        ev,
        logstash_format=True,
        logstash_prefix="logs",
        id_key="event_id",
        doc_cols=["event_id", "event_type", "user_id"],
    )


def splunk_hec_shape(spark, sf_dir):
    """out_splunk HEC envelopes: static metadata + key promotion (the
    promoted key leaves the event body), exact-micros time
    (plugins/out_splunk/splunk.c:351-470)."""
    from fluent_bit_spark.connectors import splunk_hec

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    return splunk_hec(
        ev,
        event_cols=["event_id", "user_id", "event_type"],
        host="spark-host",
        sourcetype="_json",
        index="main",
        source_key="event_type",
    )


def otlp_logs_roundtrip(spark, sf_dir):
    """in/out_opentelemetry: encode events into ExportLogsServiceRequest
    JSON (one request per event_type batch), decode back through the
    three-level explode, recover the original rows bit-exactly. The encode
    shuffles once on the batch key; the decode is shuffle-free."""
    from fluent_bit_spark.connectors import otlp_logs_decode, otlp_logs_encode

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    enc = otlp_logs_encode(
        ev,
        body_col="event_type",
        attr_cols=["event_id", "user_id"],
        resource_attributes={"service.name": "events"},
        batch_col="event_type",
    )
    dec = otlp_logs_decode(enc)
    return dec.select(
        F.col("attributes").getItem("event_id").cast("long").alias("event_id"),
        F.col("body"),
        F.unix_micros(F.col(TS_COL).cast("timestamp")).alias("time_us"),
        F.col("resource").getItem("service.name").alias("service"),
    )


def es_bulk_roundtrip(spark, sf_dir):
    """in_elasticsearch bulk receiver: pack events into multi-record NDJSON
    bulk bodies (one per rotated index), decode via indexed-lambda line
    pairing (no posexplode+re-pair shuffle), recover action metadata + doc
    fields (plugins/in_elasticsearch/in_elasticsearch_bulk_conn.c)."""
    from fluent_bit_spark.connectors import es_bulk, es_bulk_decode

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    enc = es_bulk(
        ev,
        logstash_format=True,
        logstash_prefix="logs",
        id_key="event_id",
        doc_cols=["event_id", "event_type", "user_id"],
    )
    bodies = enc.groupBy("_index").agg(
        F.concat_ws(
            "\n", F.collect_list(F.concat_ws("\n", "action_line", "doc_line"))
        ).alias("bulk_body")
    ).drop("_index")
    dec = es_bulk_decode(bodies)
    return dec.select(
        "op",
        "es_index",
        F.col("es_id").cast("long").alias("event_id"),
        F.get_json_object("doc", "$.event_type").alias("event_type"),
        F.get_json_object("doc", "$.user_id").cast("long").alias("user_id"),
    )


def splunk_hec_roundtrip(spark, sf_dir):
    """in_splunk HEC receiver: wrap events as HEC JSON envelopes, decode
    back (fractional epoch time -> exact micros, metadata + raw event text)
    — both directions shuffle-free (plugins/in_splunk/splunk_prot.c)."""
    from fluent_bit_spark.connectors import splunk_hec, splunk_hec_decode

    ev = _events(spark, sf_dir).withColumnRenamed("ts", TS_COL)
    enc = splunk_hec(
        ev,
        event_cols=["event_id", "user_id", "event_type"],
        host="spark-host",
        sourcetype="_json",
        index="main",
        source_key="event_type",
    )
    hec = enc.select(
        F.to_json(
            F.struct(
                (F.col("time_us") / 1_000_000).alias("time"),
                "host",
                "source",
                "sourcetype",
                "index",
                "event",
            )
        ).alias("hec_json")
    )
    dec = splunk_hec_decode(hec)
    return dec.select(
        F.unix_micros(F.col(TS_COL).cast("timestamp")).alias("time_us"),
        "host",
        "source",
        "sourcetype",
        "index",
        F.get_json_object("event", "$.event_id").cast("long").alias("event_id"),
        F.get_json_object("event", "$.user_id").cast("long").alias("user_id"),
    )


def ml_inference_scores(spark, sf_dir):
    """filter_tensorflow-role batch inference: executor-cached stub model
    over Arrow-batched embeddings (pyspark.ml.functions.predict_batch_udf),
    thresholded into a predicted flag. Scan-parallel, shuffle-free."""
    from fluent_bit_spark.extensions.inference import predict_batch

    emb = load_table(spark, sf_dir, "embeddings")
    out = predict_batch(emb, "embedding", dim=64, threshold=0.5)
    return out.select(
        "vec_id", "label", F.round("score", 6).alias("score"), "predicted"
    )


def ml_inference_mlp_q(spark, sf_dir):
    """Serialized-checkpoint inference: a 64->4 (ReLU) ->1 (sigmoid) numpy
    MLP written to an .npz file, loaded once per executor by
    predict_batch_udf, scored over Arrow-batched embeddings. The weights are
    deterministic so the oracle recomputes every score in SQL."""
    import os
    import tempfile

    from fluent_bit_spark.extensions.inference import (
        make_demo_mlp, make_npz_mlp_predict_fn, predict_batch, save_mlp_npz,
    )

    path = os.path.join(tempfile.gettempdir(), "fbs_demo_mlp_64x4.npz")
    if not os.path.exists(path):
        save_mlp_npz(path, make_demo_mlp(64, 4))
    emb = load_table(spark, sf_dir, "embeddings")
    out = predict_batch(
        emb, "embedding", dim=64, make_predict_fn=make_npz_mlp_predict_fn(path)
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


def kubernetes_enrich(spark, sf_dir):
    """filter_kubernetes parity: kube_tag_prefix LENGTH-skip +
    KUBE_TAG_TO_REGEX derivation + broadcast pod-metadata join +
    search_workload deployment collapse. Reference:
    plugins/filter_kubernetes/kube_regex.h:25-30, kube_meta.c:1786-1800
    (tag parse), kube_meta.c:886-976 (workload priority)."""
    from fluent_bit_spark.operators.kubernetes import kubernetes_filter

    ev = _events(spark, sf_dir)
    eid = F.col("event_id").cast("string")
    did = F.concat(F.md5(eid), F.md5(F.concat(eid, F.lit("x"))))  # 64 hex chars
    pod = F.concat(F.lit("app-"), (F.col("event_id") % 20).cast("string"))
    tag = F.concat(
        F.lit("kube.var.log.containers."), pod, F.lit("_"), F.col("event_type"),
        F.lit("_main-"), did, F.lit(".log"),
    )
    logs = ev.select("event_id", tag.alias("tag"))
    pm = (
        ev.select(
            F.col("event_type").alias("namespace_name"),
            F.concat(F.lit("app-"), (F.col("event_id") % 20).cast("string")).alias("pod_name"),
        )
        .distinct()
        .select(
            "*",
            F.concat(
                F.lit("uid-"), F.col("namespace_name"), F.lit(":"), F.col("pod_name")
            ).alias("pod_id"),
            F.concat(F.lit("node-"), F.substring(F.col("pod_name"), 5, 10)).alias("host"),
            F.lit("ReplicaSet").alias("owner_kind"),
            F.concat(F.col("pod_name"), F.lit("-7bf9dd")).alias("owner_name"),
        )
    )
    out = kubernetes_filter(logs, pm)
    return out.select(
        "event_id",
        F.col("kubernetes.pod_name").alias("pod_name"),
        F.col("kubernetes.namespace_name").alias("namespace"),
        F.col("kubernetes.container_name").alias("container"),
        F.col("kubernetes.docker_id").alias("docker_id"),
        F.col("kubernetes.pod_id").alias("pod_id"),
        F.col("kubernetes.host").alias("host"),
        F.col("kubernetes.workload").alias("workload"),
    )


def geoip_enrich_q(spark, sf_dir):
    """filter_geoip2 parity (geoip2.c:50-66): IP lookup_key -> range table
    attributes. The mmdb is modeled as [start,end] u32 intervals (here /16
    blocks keyed by nation); the join is a broadcast HASH join on a coarse
    IP bucket + residual BETWEEN — not a nested loop — so it survives
    GeoLite-sized tables. ~1/6 of IPs fall outside every range and keep
    NULL attributes (lookup-miss path)."""
    from fluent_bit_spark.operators.lookup import geoip_enrich

    ev = _events(spark, sf_dir)
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("user_id") % 30).cast("string"),
        (F.col("user_id") % 256).cast("string"),
        (F.col("event_id") % 256).cast("string"),
    )
    logs = ev.select("event_id", ip.alias("ip"))
    nation = load_table(spark, sf_dir, "nation")
    base = F.lit(10 * (1 << 24)).cast("long")
    ranges = nation.select(
        (base + F.col("n_nationkey").cast("long") * 65536).alias("range_start"),
        (base + F.col("n_nationkey").cast("long") * 65536 + 65535).alias("range_end"),
        F.col("n_name").alias("geo_name"),
    )
    return geoip_enrich(logs, ranges, "ip")


def msgpack_roundtrip(spark, sf_dir):
    """in_forward / flb_pack parity: events packed as V2 msgpack chunks
    ([[EventTime-ext, metadata], body], flb_log_event.h:29-61) then decoded
    by the stream decoder (flb_log_event_decoder.c semantics; validated
    against tests/internal/data/pack goldens in pytest). The oracle is the
    plain events table — the roundtrip must be lossless to µs."""
    import pandas as pd

    from fluent_bit_spark.connectors import msgpack_events_decode
    from fluent_bit_spark.functions.msgpack_codec import EventTime, pack

    ev = _events(spark, sf_dir).select("event_id", "ts", "event_type", "user_id")

    def mk(pdf):
        buf = b"".join(
            pack(
                [
                    [
                        EventTime(
                            int(pd.Timestamp(t).value // 10**9),
                            int(pd.Timestamp(t).value % 10**9),
                        ),
                        {"tag": "ev"},
                    ],
                    {"event_id": int(i), "event_type": et, "user_id": int(u)},
                ]
            )
            for i, t, et, u in zip(pdf.event_id, pdf.ts, pdf.event_type, pdf.user_id)
        )
        return pd.DataFrame({"chunk": [buf]})

    chunks = (
        ev.withColumn("__g", F.col("event_id") % 32)
        .groupBy("__g")
        .applyInPandas(mk, "chunk binary")
    )
    dec = msgpack_events_decode(chunks, "chunk")
    return dec.select(
        F.get_json_object("body", "$.event_id").cast("long").alias("event_id"),
        F.col(TS_COL).alias("ts"),
        F.get_json_object("body", "$.event_type").alias("event_type"),
        F.get_json_object("body", "$.user_id").cast("long").alias("user_id"),
    )


def avro_roundtrip(spark, sf_dir):
    """flb_avro.c parity: events encoded against an Avro record schema into
    Object Container File blobs (deflate blocks, spec wire format from
    functions/avro_codec.py) then decoded back. Oracle is the plain events
    table — the roundtrip must be lossless to µs/double precision."""
    from fluent_bit_spark.connectors import avro_ocf_decode, avro_ocf_encode

    schema = {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "value", "type": "double"},
        ],
    }
    ev = _events(spark, sf_dir).select("event_id", "ts", "event_type", "value")
    blobs = avro_ocf_encode(ev, schema)
    return avro_ocf_decode(blobs, "event_id long, ts timestamp, event_type string, value double")


def loki_push_shape(spark, sf_dir):
    """out_loki parity (plugins/out_loki/loki.c): records grouped by their
    label set into push-API streams — (labels, [(epoch-ns, line), ...]) with
    values numerically time-ordered and ns exact (unix_micros*1000, no
    double round-trip). Flattened back out via posexplode so the oracle can
    hash-match the full stream contents."""
    from fluent_bit_spark.sinks import loki_streams

    ev = _events(spark, sf_dir)
    streams = loki_streams(ev, ["event_type"], line_col="props", ts_col="ts")
    return (
        streams.select(
            F.col("stream")["event_type"].alias("label_event_type"),
            F.posexplode("values").alias("pos", "v"),
        )
        .select(
            "label_event_type",
            F.col("pos").cast("long").alias("pos"),
            F.col("v")[0].alias("ts_ns"),
            F.col("v")[1].alias("line"),
        )
    )


def _naive_vr_sweep(dist, min_persist):
    """Independent witness for the quantile sweep: ONE boundary matrix over
    the full interleaved filtration (vertices, edges, triangles in diameter
    order) — the textbook ELZ reduction, a separate code path from
    extensions/tda.py's per-dimension reduction — then the tda.c:948-995
    best-quantile selection replayed over its bars. Returns
    (betti0, betti1, best_q)."""
    import itertools

    import numpy as np

    from fluent_bit_spark.extensions.tda import Q_CANDIDATES, _quantile_threshold

    n = dist.shape[0]
    iu, ju = np.triu_indices(n, 1)
    tri = dist[iu, ju]
    thrs = [_quantile_threshold(tri, q) for q in Q_CANDIDATES]
    threshold = max(thrs)

    simp = [(0.0, (v,)) for v in range(n)]
    for i, j in itertools.combinations(range(n), 2):
        if dist[i, j] <= threshold:
            simp.append((float(dist[i, j]), (i, j)))
    for c in itertools.combinations(range(n), 3):
        d = max(dist[a][b] for a, b in itertools.combinations(c, 2))
        if d <= threshold:
            simp.append((float(d), c))
    simp.sort(key=lambda s: (s[0], len(s[1]), s[1]))
    index = {s: k for k, (_, s) in enumerate(simp)}
    diam = [d for d, _ in simp]
    bars = {0: [], 1: []}
    pivot_owner = {}
    for k, (_, s) in enumerate(simp):
        col = 0
        if len(s) > 1:
            for f in itertools.combinations(s, len(s) - 1):
                col |= 1 << index[f]
        while col:
            low = col.bit_length() - 1
            if low not in pivot_owner:
                pivot_owner[low] = col
                birth, death = diam[low], diam[k]
                if death > birth:
                    bars[len(simp[low][1]) - 1].append((birth, death))
                break
            col ^= pivot_owner[low]

    best_b0 = best_b1 = 0
    best_q = 0.0
    for q, thr in zip(Q_CANDIDATES, thrs):
        b0, b1 = (
            sum(1 for b, d in bars[dim] if d <= thr and d - b >= min_persist)
            for dim in (0, 1)
        )
        if b1 > best_b1:
            best_b1, best_b0, best_q = b1, b0, q
        elif best_b1 == 0 and b0 > best_b0:
            best_b0, best_q = b0, q
    return best_b0, best_b1, best_q


def tda_betti_windows(spark, sf_dir):
    """processor_tda parity (plugins/processor_tda/tda.c:767-1182 +
    src/ripser/flb_ripser_wrapper.cpp): per event_type series, full
    32-sample windows of `value` are delay-embedded (m=2, tau=4) and run
    through the exact Vietoris-Rips reduction. Invariant-contract form
    (the technique that made the dedup/ANN rows hash-green):

    - event_type/window_id/n_raw/n_embed are structural — the oracle
      replays the row_number windowing from the raw table;
    - b0_q90 is Betti-0 at the FIXED 0.90-quantile threshold, which IS
      SQL-expressible: finite H0 bars are single-linkage merges, so the
      count in [1e-3, thr] equals C(<1e-3) - C(<=thr) where C() is the
      component count of the distance-threshold graph — the DuckDB oracle
      rebuilds the embedding, the C-rule quantile (idx round(0.9*377)=339
      on the 378 off-diagonal distances), and the components via a
      recursive-CTE transitive closure;
    - sweep_indep_ok replays the full 9-quantile sweep against an
      INDEPENDENT single-matrix ELZ reduction (_naive_vr_sweep) and
      compares (betti0, betti1, best_q) — the oracle is the literal truth
      table, so a single disagreeing window hash-fails the row."""
    import numpy as np
    import pandas as pd

    from fluent_bit_spark.extensions.tda import MIN_PERSIST, tda_window_betti

    ev = _events(spark, sf_dir)
    seq = F.row_number().over(
        Window.partitionBy("event_type").orderBy("ts", "event_id")
    ) - 1
    win = ev.select("event_type", "ts", "event_id", "value").withColumn(
        "__win", (seq / 32).cast("long")
    )
    cols = ["event_type", "window_id", "n_raw", "n_embed", "b0_q90",
            "sweep_indep_ok"]
    schema = ("event_type string, window_id long, n_raw int, n_embed int, "
              "b0_q90 int, sweep_indep_ok boolean")

    def run(key, pdf):
        if len(pdf) < 32:  # partial tail window: not oracle-replayable len
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(["ts", "event_id"])
        vals = pdf[["value"]].to_numpy(dtype=float)
        fixed = tda_window_betti(vals, embed_dim=2, embed_delay=4,
                                 threshold=0.9)
        sweep = tda_window_betti(vals, embed_dim=2, embed_delay=4)
        # independent embedding + distance matrix for the witness
        emb = np.hstack([vals[4:32], vals[0:28]])
        diff = emb[:, None, :] - emb[None, :, :]
        dist = np.sqrt((diff * diff).sum(axis=2))
        nb0, nb1, nq = _naive_vr_sweep(dist, MIN_PERSIST)
        ok = (
            sweep["betti0"] == nb0
            and sweep["betti1"] == nb1
            and abs(sweep["best_q"] - nq) < 1e-12
        )
        return pd.DataFrame([{
            "event_type": key[0], "window_id": int(key[1]),
            "n_raw": len(pdf), "n_embed": int(fixed["n_embed"]),
            "b0_q90": int(fixed["betti0"]), "sweep_indep_ok": bool(ok),
        }])

    return (
        win.groupBy("event_type", "__win")
        .applyInPandas(run, schema)
        .orderBy("event_type", "window_id")
    )


def text_repetition_q(spark, sf_dir):
    """Gopher-style repetition screens (Rae et al. 2021 A1) on documents:
    duplicate-line fraction/char-fraction, top 2-gram char coverage,
    repeated 5-gram char coverage. Pure Catalyst + two keyed explode
    aggregations; hash-checked against the DuckDB re-derivation."""
    from fluent_bit_spark.extensions.text import repetition_signals

    # pre-spread the single-row-group scan before the explode-heavy map side
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    out = repetition_signals(docs, gram_n=2, rep_n=5)
    return out.select(
        "doc_id", "n_lines",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.round("top_gram_char_frac", 6).alias("top_gram_char_frac"),
        F.round("rep_gram_char_frac", 6).alias("rep_gram_char_frac"),
    )


def statsd_decode_q(spark, sf_dir):
    """in_statsd wire parse (plugins/in_statsd/statsd.c:114-201): statsd
    lines synthesized deterministically from events (int values so string
    forms are engine-portable), decoded by the Catalyst parser. The oracle
    re-derives the RESULT semantically from the same modular arithmetic —
    an independent check of the parse, not a second string parser."""
    from fluent_bit_spark.functions.statsd import statsd_decode

    ev = _events(spark, sf_dir)
    mtype = F.element_at(
        F.array(F.lit("c"), F.lit("g"), F.lit("ms"), F.lit("s")),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    sign = F.when((F.col("event_id") % 7 == 0) & (F.col("event_id") % 4 == 1), "+").otherwise("")
    rate = F.when(F.col("event_id") % 5 == 0, "|@0.25").otherwise("")
    lines = ev.select(
        "event_id",
        F.concat(
            F.col("event_type"), F.lit(":"), sign, F.col("user_id").cast("string"),
            F.lit("|"), mtype, rate,
        ).alias("line"),
    )
    out = statsd_decode(lines)
    return out.select(
        "event_id", "metric_type", "bucket", "value", "value_str",
        "sample_rate", "incremental",
    )


def prom_exposition_q(spark, sf_dir):
    """out_prometheus_exporter page shape: per-event_type counters rendered
    as exposition text (one # TYPE header + labeled sample lines, static
    add_label, spec escaping)."""
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics
    from fluent_bit_spark.sinks import prometheus_exposition

    ev = _events(spark, sf_dir)
    metrics = log_to_metrics(ev, "counter", "fbs_events_total", label_keys=["event_type"])
    return prometheus_exposition(
        metrics, label_cols=["event_type"], add_labels={"env": "bench"}, value_fmt="long"
    )


def prom_scrape_roundtrip_q(spark, sf_dir):
    """in_prometheus_scrape counterpart: the exposition page rendered by
    out_prometheus_exporter parsed back into metric rows — TYPE headers
    re-attached via broadcast join, labels unescaped, values recovered
    exactly."""
    from fluent_bit_spark.connectors import prom_exposition_decode
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics
    from fluent_bit_spark.sinks import prometheus_exposition

    ev = _events(spark, sf_dir)
    metrics = log_to_metrics(
        ev, "counter", "fbs_events_total", label_keys=["event_type"]
    )
    page = prometheus_exposition(
        metrics, label_cols=["event_type"], add_labels={"env": "bench"},
        value_fmt="long",
    )
    dec = prom_exposition_decode(page)
    return dec.select(
        "metric_name",
        "metric_type",
        F.col("labels").getItem("event_type").alias("event_type"),
        F.col("labels").getItem("env").alias("env"),
        "value",
    )


def prom_pages_roundtrip_q(spark, sf_dir):
    """Whole-PAGE scrape decode (the streaming-legal shape): the
    exposition page rendered by out_prometheus_exporter is assembled
    into one string per scrape target (here: one page per event_type
    bucket) and decoded via per-page header maps — no joins, so the
    same plan runs under readStream. Values recover exactly; full hash
    check."""
    from fluent_bit_spark.connectors import prom_exposition_decode_pages
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics
    from fluent_bit_spark.sinks import prometheus_exposition

    ev = _events(spark, sf_dir)
    metrics = log_to_metrics(
        ev, "counter", "fbs_events_total", label_keys=["event_type"]
    )
    lines = prometheus_exposition(
        metrics, label_cols=["event_type"], value_fmt="long"
    )
    # one page per metric: headers first, then samples in a stable order
    pages = (
        lines.groupBy("metric")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("kind", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("page")
        )
    )
    dec = prom_exposition_decode_pages(pages, "page")
    return dec.select(
        "metric_name",
        "metric_type",
        F.col("labels").getItem("event_type").alias("event_type"),
        "value",
    )


def similarity_pq_join_q(spark, sf_dir):
    """The DISTRIBUTED PQ query path (pq_topk_join: executor-side ADC
    tables + chunked broadcast scoring — query vectors never reach the
    driver), held to the same invariant contract as the collect-path PQ
    query (see _ann_gate)."""
    from fluent_bit_spark.extensions.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk_join,
        pq_train,
    )

    emb, queries = _emb_and_queries(spark, sf_dir)
    books = pq_train(emb, m=8, ksub=16, iters=3, sample=1024)
    codes = pq_encode(emb, books)
    ann = pq_topk_join(codes, queries, books, k=5, num_chunks=2)
    exact = cosine_topk(emb, queries, k=5)
    return _ann_gate(ann, exact)


def otlp_histogram_roundtrip_q(spark, sf_dir):
    """cmetrics histogram -> OTLP HistogramDataPoint roundtrip: the
    log_to_metrics cumulative le_* buckets difference into OTLP
    bucketCounts on encode and re-accumulate on decode, recovering the
    Prometheus cumulative form bit-exactly per (type, boundary)."""
    from fluent_bit_spark.connectors import (
        otlp_histogram_decode,
        otlp_histogram_encode,
    )
    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    buckets = (50.0, 100.0, 150.0)
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    hist = log_to_metrics(
        ev, "histogram", "fbs_value_hist", label_keys=["event_type"],
        value_field="value", buckets=buckets,
    )
    enc = otlp_histogram_encode(hist, buckets, label_cols=["event_type"])
    dec = otlp_histogram_decode(enc)
    return dec.select(
        "metric_name",
        F.col("attributes").getItem("event_type").alias("event_type"),
        "count",
        "le",
        "cumulative_count",
    )


def domain_mix_q(spark, sf_dir):
    """Training-data mixing: per-language deterministic keep rates via the
    portable multiplicative id-hash (no RNG — reproducible across engines
    and re-runs, which is what a 100 TB corpus rebuild needs)."""
    from fluent_bit_spark.extensions.mixing import domain_mix

    docs = load_table(spark, sf_dir, "documents")
    out = domain_mix(docs, "lang", {"en": 0.4, "de": 0.8, "fr": 0.2}, default_rate=1.0)
    return out.select("doc_id", "lang", "source")


def mix_temperature_q(spark, sf_dir):
    """Temperature-flattened domain weights (p_d ~ n_d^tau, tau=0.7 — the
    mBERT/XLM-R sampling rule) derived from observed per-source counts;
    keep_rate normalized so the most-upweighted source keeps everything."""
    from fluent_bit_spark.extensions.mixing import mix_weights_temperature

    docs = load_table(spark, sf_dir, "documents")
    out = mix_weights_temperature(docs, "source", tau=0.7)
    return out.select(
        "strata", "n",
        F.round("p_obs", 6).alias("p_obs"),
        F.round("p_target", 6).alias("p_target"),
        F.round("keep_rate", 6).alias("keep_rate"),
    )


def dedup_clusters_q(spark, sf_dir):
    """Transitive near-dup cluster consolidation: exact word-set Jaccard
    >= 0.7 edges over doc_id < 60 plus two synthesized copies per tenth doc
    (guaranteed 3-node cliques), resolved to min-id components by hash-min
    label propagation (extensions/graph.py). Oracle re-derives connectivity
    with a recursive CTE — the rare case where an iterative algorithm IS
    SQL-expressible, so this gets the full hash check."""
    from fluent_bit_spark.extensions.graph import dedup_clusters

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    c1 = tenth.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("   ")).alias("text"),
    )
    c2 = tenth.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit(" "), F.col("text")).alias("text"),
    )
    all3 = docs.unionByName(c1).unionByName(c2)
    all3, pairs = _neardup_pairs(all3)
    out = dedup_clusters(all3, pairs)
    return out.select("doc_id", "component", "is_representative")


def _neardup_pairs(all3):
    """Exact word-set Jaccard >= 0.7 edge list over a small doc frame
    (shared by dedup_clusters / leakage_safe_split queries)."""
    # the 180-row frame inherits the full documents-scan partitioning
    # (dozens of mostly-empty partitions at high SF); a cartesian product
    # multiplies partition counts (n x m tasks), so coalesce the tiny
    # frame FIRST — at sf3 this is the difference between 16 and ~9k
    # cartesian tasks
    all3 = all3.coalesce(4)
    words = all3.select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
        ).alias("ws"),
    )
    a = words.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("wa"))
    b = words.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    union = F.size(F.array_union("wa", "wb")).cast("double")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(inter / union >= 0.7)
        .select("id_a", "id_b")
    )
    return all3, pairs


def leakage_safe_split_q(spark, sf_dir):
    """Leakage-safe 80/20 split: the dedup_clusters corpus (doc_id < 60
    plus two near-copies of every 10th doc — guaranteed 3-node cliques)
    split by a Knuth bucket of the COMPONENT id, so every near-dup
    clique lands wholly in one split. Oracle re-derives components with
    the recursive CTE and replays the bucket arithmetic — a split that
    separates any clique hash-fails."""
    from fluent_bit_spark.extensions.mixing import leakage_safe_split

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    c1 = tenth.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("   ")).alias("text"),
    )
    c2 = tenth.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit(" "), F.col("text")).alias("text"),
    )
    all3, pairs = _neardup_pairs(docs.unionByName(c1).unionByName(c2))
    bucket = (
        (F.col("component") * F.lit(2654435761)) % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    out = leakage_safe_split(
        all3, pairs, {"train": 0.8, "test": 0.2}, bucket_expr=bucket
    )
    return out.select("doc_id", "component", "split")


def fuzzy_join_trigram_q(spark, sf_dir):
    """pg_trgm-style trigram-Jaccard fuzzy self-join on part names
    (record linkage / entity resolution — extension surface, no fluent-bit
    counterpart): distinct char-3-grams of the normalized padded name,
    one gram-keyed candidate shuffle, exact array_intersect verification.
    Full-value oracle: the naive lateral-grams SQL replays gram
    extraction, pairing, and the Jaccard score."""
    from fluent_bit_spark.extensions.linkage import fuzzy_join_trigram

    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 3)
    out = fuzzy_join_trigram(
        part, part, "p_partkey", "p_name", "p_partkey", "p_name",
        threshold=0.62,
    )
    return out.where(F.col("l_p_partkey") < F.col("r_p_partkey")).select(
        "l_p_partkey", "r_p_partkey", "sim"
    )


def entity_resolution_q(spark, sf_dir):
    """End-to-end entity resolution on part names: trigram fuzzy
    self-join for the edge list, hash-min connected components for the
    transitive closure, every row mapped to its canonical entity_id
    (min member id; singletons map to themselves). Oracle replays the
    whole flow — naive gram SQL for pairs, recursive CTE for the
    closure — so a wrong edge OR a wrong component hash-fails."""
    from fluent_bit_spark.extensions.linkage import resolve_entities

    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 3)
    return resolve_entities(part, "p_partkey", "p_name", threshold=0.62)


def edit_distance_join_q(spark, sf_dir):
    """EDJoin on part names (VLDB'08 prefix bound: k edits destroy at
    most k*q q-grams, so qualifying pairs collide inside both records'
    k*q+1 rarest grams): candidates from the prefix join, exact
    levenshtein verify. Oracle replays the whole thing brute-force —
    DuckDB levenshtein over all filtered pairs — so a missed candidate
    OR a wrong distance hash-fails."""
    from fluent_bit_spark.extensions.linkage import edit_distance_join

    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 3)
    out = edit_distance_join(
        part, part, "p_partkey", "p_name", "p_partkey", "p_name", max_dist=2
    )
    return out.where(F.col("l_p_partkey") < F.col("r_p_partkey"))


def funnel_levels_q(spark, sf_dir):
    """view -> click -> purchase funnel within a 3-day window of the
    first view (greedy-earliest chain, one groupBy + Catalyst fold).
    Oracle replays the chain as chained conditional mins + a window
    CASE — deterministic because with monotone timestamps the earliest
    candidate is always optimal under a window anchored at step 1."""
    from fluent_bit_spark.extensions.funnel import funnel_levels

    ev = _events(spark, sf_dir)
    return funnel_levels(
        ev, ["view", "click", "purchase"], window=3 * 86400
    )


def cohort_retention_q(spark, sf_dir):
    """Daily cohort retention matrix: users bucketed by first-seen
    date, distinct active users per (cohort, day offset). Two keyed
    map-side-combinable aggregations."""
    from fluent_bit_spark.extensions.funnel import cohort_retention

    return cohort_retention(_events(spark, sf_dir))


def active_users_window_q(spark, sf_dir):
    """Rolling 7-day distinct active users per activity day: (user,day)
    dedup once, explode to contributing window ends, one distinct-count
    shuffle. Oracle replays it as a date-range join."""
    from fluent_bit_spark.extensions.funnel import active_users_window

    return active_users_window(_events(spark, sf_dir), window_days=7)


def top_session_paths_q(spark, sf_dir):
    """Top-20 session-opening event paths (30-min gap sessionization,
    first 5 steps): lag + running-sum session ids, session-keyed path
    assembly, deterministic (count desc, path asc) top-k. Oracle
    replays the same window functions in DuckDB."""
    from fluent_bit_spark.extensions.funnel import top_session_paths

    return top_session_paths(_events(spark, sf_dir), gap=1800, max_steps=5, k=20)


def event_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix between event types within
    30-min gap sessions, with per-src probabilities. Oracle replays the
    identical sessionization windows + lag + count + ratio."""
    from fluent_bit_spark.extensions.funnel import event_transitions

    return event_transitions(_events(spark, sf_dir), gap=1800)


def rfm_segments_q(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary metrics +
    deterministic ntile(5) scores (user-id tie-break). Oracle replays
    the aggregates and the same ntile windows in DuckDB."""
    from fluent_bit_spark.extensions.funnel import rfm_segments

    return rfm_segments(_events(spark, sf_dir))


def session_summaries_q(spark, sf_dir):
    """First-class session table (30-min gap): per-session start,
    duration, event count, distinct types. Oracle replays the identical
    sessionization windows + aggregation."""
    from fluent_bit_spark.extensions.funnel import session_summaries

    return session_summaries(_events(spark, sf_dir), gap=1800)


def experiment_stats_q(spark, sf_dir):
    """A/B conversion stats with a deterministic assignment (variant =
    user_id % 2 stands in for the experiment's bucketing): per-variant
    users/converters/rate + pooled two-proportion z vs the control
    (lowest variant). Oracle replays the closed form."""
    from fluent_bit_spark.extensions.funnel import experiment_stats

    ev = _events(spark, sf_dir).withColumn(
        "variant", (F.col("user_id") % 2).cast("int")
    )
    return experiment_stats(ev, target="purchase")


def log_templates_q(spark, sf_dir):
    """Log template discovery (simplified Drain, two-level) over
    synthesized log lines with three known shapes; the 'user <*> did
    <event_type>' shape level-2-splits on the event_type position (few
    distinct values at an early position), so the miner recovers one
    template per event_type there plus the two wildcarded shapes. The
    oracle builds the same lines and replays the full mining — split
    selection included — with generate_subscripts/unnest + per-position
    distinct counts."""
    from fluent_bit_spark.extensions.logmine import log_templates

    ev = _events(spark, sf_dir)
    msg = (
        F.when(
            F.col("event_type") == "purchase",
            F.concat_ws(
                " ",
                F.lit("user"), F.col("user_id"),
                F.lit("purchased item"), F.col("event_id"),
            ),
        )
        .when(
            F.col("event_type") == "error",
            F.concat_ws(
                " ",
                F.lit("error"), F.col("event_id"),
                F.lit("reported by user"), F.col("user_id"),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ", F.lit("user"), F.col("user_id"),
                F.lit("did"), F.col("event_type"),
            )
        )
    )
    return log_templates(ev.select(msg.alias("message")))


def decontaminate_q(spark, sf_dir):
    """Benchmark decontamination: every 37th document plays the held-out
    eval set; corpus docs sharing any distinct word 8-gram with it are
    flagged. Broadcast blocklist + one corpus explode, per the published
    GPT-3/PaLM/Llama cleaning procedure."""
    from fluent_bit_spark.extensions.decontam import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    out = decontaminate(docs, bench, n=8, min_hits=1)
    return out.select("doc_id", "contam_hits", "contaminated")


def influxdb_lines_q(spark, sf_dir):
    """out_influxdb line-protocol encode (plugins/out_influxdb/influxdb.c:
    61-315 influxdb_format + influxdb_bulk.c escaping): measurement from the
    tag, event_type as a tag-set entry, integers i-suffixed, doubles %f,
    strings JSON-then-quote escaped, epoch-ns timestamps. The oracle
    re-derives every line with DuckDB printf/replace — a full-string hash
    check of the wire format."""
    from fluent_bit_spark.connectors import influxdb_line

    ev = _events(spark, sf_dir).select(
        F.lit("app.events").alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "event_type",
        "user_id",
        "value",
        "props",
    )
    # single-row-group input parquet pins the scan to one task; pre-spread
    # before the string-heavy projection (the minhash_signatures pattern —
    # measured 1.16s -> 0.78s at sf0.1)
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    return influxdb_line(ev, tag_keys=["event_type"], use_influxdb_integer=True)


def datadog_shape_q(spark, sf_dir):
    """out_datadog intake shaping with ECS remapping (plugins/out_datadog/
    datadog.c:93-340 + datadog_remap.c:248-255): epoch-ms timestamp, tag
    key, ddsource/service metadata, dd_message_key renamed to message, and
    synthesized container/task attributes folded into ddtags exactly as the
    remap table specifies (family/version split, region + task_id parsed
    from the ARN)."""
    from fluent_bit_spark.connectors import datadog_records

    ev = _events(spark, sf_dir).select(
        F.lit("app").alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        F.col("props").alias("log"),
        F.concat(F.lit("c-"), F.col("event_id")).alias("container_id"),
        F.concat(F.lit("/"), F.col("event_type")).alias("container_name"),
        F.concat(
            F.col("event_type"), F.lit(":"), (F.col("user_id") % 5).cast("string")
        ).alias("ecs_task_definition"),
        F.concat(
            F.lit("arn:aws:ecs:us-east-1:111:task/"), F.col("event_id").cast("string")
        ).alias("ecs_task_arn"),
    )
    return datadog_records(
        ev,
        include_tag_key=True,
        dd_source="spark",
        dd_service="events",
        dd_tags="env:bench",
        dd_message_key="log",
        remap=True,
    )


def forward_wire_roundtrip(spark, sf_dir):
    """out_forward -> in_forward loop closed on the wire: events encoded as
    Forward-mode frames ([tag, [[EventTime, record], ...], {size}],
    plugins/out_forward/forward.c) by forward_frames_encode, then decoded
    by the in_forward frame decoder. Oracle is the plain events table —
    lossless to µs through the EventTime ext type."""
    from fluent_bit_spark.connectors import forward_frames_decode, forward_frames_encode

    ev = _events(spark, sf_dir).select(
        F.concat(F.lit("ev."), F.col("event_type")).alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "user_id",
    )
    # pre-spread the single-row-group scan so the Python protocol adapter
    # runs one Arrow batch per core (measured 3.6s -> 1.2s at sf0.1)
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    frames = forward_frames_encode(ev, send_options=True, events_per_frame=256)
    dec = forward_frames_decode(frames.select("frame"))
    return dec.select(
        F.get_json_object("body", "$.event_id").cast("long").alias("event_id"),
        F.col(TS_COL).alias("ts"),
        F.expr("substring(tag, 4)").alias("event_type"),
        F.get_json_object("body", "$.user_id").cast("long").alias("user_id"),
    )


def cloudwatch_shape_q(spark, sf_dir):
    """out_cloudwatch_logs PutLogEvents shaping (plugins/out_cloudwatch_logs/
    cloudwatch_api.c): $TAG[n]-templated stream names, epoch-ms timestamps,
    log_key message extraction. Pure Catalyst; hash-checked end to end."""
    from fluent_bit_spark.connectors import cloudwatch_events

    ev = _events(spark, sf_dir).select(
        F.concat(F.lit("app."), F.col("event_type")).alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "props",
    )
    out = cloudwatch_events(
        ev,
        "fbs-group",
        log_stream_name="stream-$TAG[1]",
        log_key="props",
    )
    return out


def stackdriver_shape_q(spark, sf_dir):
    """out_stackdriver LogEntry shaping (plugins/out_stackdriver/
    stackdriver.c:2343-2674): severity parsed through the case-insensitive
    alias table (mixed-case aliases synthesized from event_type), 9-digit
    nano RFC3339 timestamps, jsonPayload of the remaining body."""
    from fluent_bit_spark.connectors import stackdriver_entries

    sev = (
        F.when(F.col("event_type") == "error", "eRr")
        .when(F.col("event_type") == "purchase", "warn")
        .when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "view", "debug")
        .otherwise("Notice")
    )
    ev = _events(spark, sf_dir).select(
        F.lit("app").alias("tag"),
        F.col("ts").alias("timestamp"),
        sev.alias("severity"),
        "event_id",
        "props",
    )
    return stackdriver_entries(ev, "proj-bench")


def bigquery_shape_q(spark, sf_dir):
    """out_bigquery insertAll row shaping (plugins/out_bigquery/bigquery.c:
    961-970): one {"json": {...}} row per record, optional insert_id."""
    from fluent_bit_spark.connectors import bigquery_rows

    ev = _events(spark, sf_dir).select(
        F.lit("bq").alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "event_type",
        "user_id",
    )
    return bigquery_rows(ev, insert_id_col="event_id")


def _c4_docs(spark, sf_dir):
    """Synthesized multi-line corpus exercising every C4 rule: a long
    punctuated line (keep), a short line, a boilerplate line, and — for
    every 7th doc — a brace line that triggers the doc-level drop."""
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(".\ntoo short.\nthis line mentions terms of use policy here."),
        F.when(F.col("doc_id") % 7 == 0, F.lit("\n{ brace }")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", synth.alias("text"))


def remote_write_roundtrip_q(spark, sf_dir):
    """out_prometheus_remote_write loop: samples encoded as snappy'd
    protobuf WriteRequests (hand-rolled wire format, pyarrow raw-snappy)
    then decoded back. Oracle re-derives the sample set with ms-truncated
    timestamps — the wire's precision."""
    from fluent_bit_spark.connectors import remote_write_decode, remote_write_encode

    ev = _events(spark, sf_dir).select(
        F.concat(F.lit("fbs_"), F.col("event_type")).alias("metric"),
        (F.col("user_id") % 4).cast("string").alias("shard"),
        F.col("ts").alias("timestamp"),
        "value",
    )
    bodies = remote_write_encode(ev, label_cols=["shard"])
    dec = remote_write_decode(bodies.select("body"))
    return dec.select(
        "metric",
        F.get_json_object("labels", "$.shard").alias("shard"),
        "value",
        F.col(TS_COL).alias("ts_ms"),
    )


def logdna_shape_q(spark, sf_dir):
    """out_logdna line shaping (plugins/out_logdna/logdna.c:62-180):
    epoch-ms timestamp, severity promoted to level, static app fallback,
    the rest folded into the JSON line."""
    from fluent_bit_spark.connectors import logdna_lines

    ev = _events(spark, sf_dir).select(
        F.lit("ld").alias("tag"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("severity"),
        "event_id",
        "props",
    )
    return logdna_lines(ev, app="bench")


def nats_body_q(spark, sf_dir):
    """out_nats subject payloads (plugins/out_nats/nats.c:81-150): JSON
    arrays of [epoch.micros, record] pairs per subject, (ts, entry)
    sorted."""
    from fluent_bit_spark.connectors import nats_body

    ev = _events(spark, sf_dir).select(
        F.concat(F.lit("ev."), F.col("event_type")).alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "user_id",
    )
    return nats_body(ev)


def http_requests_q(spark, sf_dir):
    """in_http receiver roundtrip (plugins/in_http/http_prot.c:630-700):
    events framed into per-type JSON-array request bodies, decoded back to
    records with the tag from the URI path. Oracle is the plain table."""
    from fluent_bit_spark.connectors import http_requests_decode

    ev = _events(spark, sf_dir)
    bodies = (
        ev.select(
            "event_type",
            F.to_json(F.struct("event_id", "user_id")).alias("j"),
        )
        .groupBy("event_type")
        .agg(
            F.concat(
                F.lit("["), F.array_join(F.collect_list("j"), ","), F.lit("]")
            ).alias("body")
        )
        .select(F.concat(F.lit("/"), F.col("event_type")).alias("uri"), "body")
    )
    dec = http_requests_decode(bodies, uri_col="uri")
    return dec.select(
        F.col("tag").alias("event_type"),
        F.get_json_object("record", "$.event_id").cast("long").alias("event_id"),
        F.get_json_object("record", "$.user_id").cast("long").alias("user_id"),
    )


def kinesis_shape_q(spark, sf_dir):
    """out_kinesis_streams data shaping (kinesis_api.c): base64(record JSON
    + strftime time_key). The partition key uses engine-side xxhash64
    (pytest-checked) so the oracle checks the data payload."""
    from fluent_bit_spark.connectors import kinesis_records

    ev = _events(spark, sf_dir).select(
        F.lit("kin").alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "event_type",
    )
    return kinesis_records(ev, time_key="time").select("data")


def azure_shape_q(spark, sf_dir):
    """out_azure Log Analytics shaping (azure.c:95-160): ISO-ms time_key
    (time_generated mode), per-record log_type resolution."""
    from fluent_bit_spark.connectors import azure_records

    ev = _events(spark, sf_dir).select(
        F.lit("az").alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")).alias("lt"),
        "props",
    )
    out = azure_records(
        ev, time_generated=True, log_type="fbs", log_type_key="lt"
    )
    return out.withColumnRenamed("@timestamp", "time_gen")


def similarity_pq_ann_q(spark, sf_dir):
    """Product-quantization ANN (Jegou et al. 2011): per-subspace L2
    codebooks on a deterministic bounded sample, uint8 codes (32x smaller
    scan), ADC table-lookup top-k. Invariant-gated against the exact
    cosine brute force (see _ann_gate) — the codebooks depend on float
    k-means iteration, so the top-k rows themselves are not
    SQL-replayable; recall vs exact search is additionally asserted in
    tests/test_extensions.py."""
    from fluent_bit_spark.extensions.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb, queries = _emb_and_queries(spark, sf_dir)
    books = pq_train(emb, m=8, ksub=16, iters=3, sample=1024)
    codes = pq_encode(emb, books)
    ann = pq_topk(codes, queries, books, k=5)
    exact = cosine_topk(emb, queries, k=5)
    return _ann_gate(ann, exact)


def kafka_messages_q(spark, sf_dir):
    """out_kafka message shaping (plugins/out_kafka/kafka.c:187-300):
    iso8601 timestamp injection, message_key_field, topic_key routing with
    a configured topic list. Shuffle-free projection; full hash check."""
    from fluent_bit_spark.connectors import kafka_messages

    ev = _events(spark, sf_dir).select(
        F.lit("ev").alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        F.col("event_type").alias("dest"),
        F.col("user_id").cast("string").alias("uid"),
    )
    return kafka_messages(
        ev,
        ["events_default", "error", "purchase"],
        timestamp_format="iso8601",
        message_key_field="uid",
        topic_key="dest",
    )


def plot_lines_q(spark, sf_dir):
    """out_plot gnuplot feed (plugins/out_plot/plot.c:181-196): %f epoch +
    value per record. Full-string oracle."""
    from fluent_bit_spark.sinks import plot_lines

    ev = _events(spark, sf_dir).select(F.col("ts").alias("timestamp"), "value")
    return plot_lines(ev, "value")


def http_body_q(spark, sf_dir):
    """out_http NDJSON bodies (plugins/out_http/http.c) with iso8601
    json_date_format (src/flb_pack.c:1414): one body per tag batch,
    records (ts, json)-sorted. Full-string oracle via ordered string_agg."""
    from fluent_bit_spark.sinks import http_payload

    ev = _events(spark, sf_dir).select(
        F.concat(F.lit("ev."), F.col("event_type")).alias("tag"),
        F.col("ts").alias("timestamp"),
        "event_id",
        "props",
    )
    return http_payload(
        ev, "json_lines", json_date_key="date", json_date_format="iso8601"
    )


def c4_line_filter_q(spark, sf_dir):
    """C4 line-level cleaning signals (Raffel et al. 2020 §2.2) over the
    synthesized multi-line corpus: per line, the keep verdict plus the
    doc-level brace/lorem flags. One tagged explode, no extra shuffle."""
    from fluent_bit_spark.extensions.text import c4_line_signals

    return c4_line_signals(_c4_docs(spark, sf_dir))


def c4_clean_docs_q(spark, sf_dir):
    """Full C4 procedure: doc-level drops + line filter + rejoin. One
    groupBy on the uniform doc id."""
    from fluent_bit_spark.extensions.text import c4_clean

    return c4_clean(_c4_docs(spark, sf_dir))


def line_dedup_q(spark, sf_dir):
    """Corpus-level duplicate-line removal (RefinedWeb §3.2 / Dolma
    paragraph dedup) over the synthesized multi-line corpus: lines present
    in more than 2 distinct documents (the injected boilerplate) are
    stripped everywhere. Two shuffles — the global line-frequency groupBy
    and the join back — both keyed on the line text."""
    from fluent_bit_spark.extensions.text import corpus_line_dedup

    return corpus_line_dedup(_c4_docs(spark, sf_dir), max_docs=2)


def embedding_quantize_q(spark, sf_dir):
    """Scalar int8 quantization of the embedding corpus: per-dimension
    min/max stats (model-sized aggregate) then a JVM-side transform()
    quantize pass. Output keeps scalar integrity columns (sum/min/max of
    each code vector) for exact oracle comparison."""
    from fluent_bit_spark.extensions.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(emb).select("vec_id", "code_sum", "code_min", "code_max")


def sketch_distinct_q(spark, sf_dir):
    """Distinct users per event type via native HLL sketches — map-side
    combinable, KB-bounded per-group state (vs the distinct-set shuffle an
    exact COUNT(DISTINCT) needs). Exact in the sparse regime the gate
    runs in; published error bounds at scale."""
    from fluent_bit_spark.extensions.sketches import distinct_counts

    ev = _events(spark, sf_dir)
    return distinct_counts(ev, ["event_type"], "user_id")


def sketch_rollup_q(spark, sf_dir):
    """Mergeable-sketch rollup: per-(type, hour) HLL sketches unioned up
    to per-hour distinct users — the coarse slice derives from the fine
    sketches without rescanning raw data (pre-aggregated sketch tables)."""
    from fluent_bit_spark.extensions.sketches import distinct_rollup

    ev = _events(spark, sf_dir).withColumn("hour", F.date_trunc("hour", "ts"))
    return distinct_rollup(
        ev, ["event_type", "hour"], ["hour"], "user_id"
    )


def sketch_quantiles_q(spark, sf_dir):
    """Per-group quantiles, scale-independent contract: the VALUE columns
    are exact continuous percentiles (F.percentile == DuckDB
    quantile_cont bit-for-bit); the KLL sketch estimates are witnessed in
    rank space — the exact inclusive rank of each sketch item must sit
    within 2% of its target quantile (k=8192's normalized rank error is
    ~0.3%, so a healthy sketch never trips this while a broken one hash-
    fails). Unlike the old value-equality oracle this stays green at any
    sf, not just below the sketch's exact-regime threshold."""
    from fluent_bit_spark.extensions.sketches import quantile_summary

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    sk = quantile_summary(ev, ["event_type"], "value")
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.percentile("value", F.lit(q)), 6).alias(f"p{round(q*100):02d}_exact")
            for q in (0.5, 0.95, 0.99)
        ],
    )
    j = ev.join(F.broadcast(sk), "event_type")
    witness = j.groupBy("event_type").agg(
        *[
            F.avg((F.col("value") <= F.col(f"p{round(q*100):02d}")).cast("double")).alias(f"__r{round(q*100):02d}")
            for q in (0.5, 0.95, 0.99)
        ]
    )
    return exact.join(witness, "event_type").select(
        "event_type", "n", "p50_exact", "p95_exact", "p99_exact",
        *[
            (F.abs(F.col(f"__r{p}") - F.lit(q)) <= 0.02).alias(f"sk{p}_ok")
            for p, q in (("50", 0.5), ("95", 0.95), ("99", 0.99))
        ],
    )


def sketch_overlap_q(spark, sf_dir):
    """Audience overlap via theta sketch set algebra: engaged users
    (>= 8 events of a type) per segment, then pairwise union/intersection/
    difference estimates from the KB-sized per-segment sketches — raw data
    is scanned once and never self-joined."""
    from fluent_bit_spark.extensions.sketches import segment_overlap

    ev = _events(spark, sf_dir)
    engaged = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 8)
    )
    return segment_overlap(engaged, "event_type", "user_id")


def ts_downsample_q(spark, sf_dir):
    """Continuous-aggregate downsample: per (event_type, 5-minute bucket)
    count and mean — one shuffle on the uniform composite key, exact
    integer bucket arithmetic (extensions/timeseries.py)."""
    from fluent_bit_spark.extensions.timeseries import downsample

    ev = _events(spark, sf_dir)
    return downsample(
        ev.filter(F.col("value").isNotNull()),
        ["event_type"],
        "ts",
        300,
        [
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        ],
    )


def ts_gapfill_locf_q(spark, sf_dir):
    """Gap-filled sparse series: a 1-in-13 sample of events downsampled to
    minute buckets leaves holes; gap_fill materializes each series' full
    bucket spine and carries the last observation forward. Windows
    partition by series — the canonical scale-out layout."""
    from fluent_bit_spark.extensions.timeseries import downsample, gap_fill

    ev = _events(spark, sf_dir).filter(
        F.col("value").isNotNull() & (F.col("event_id") % 13 == 0)
    )
    d = downsample(
        ev, ["event_type"], "ts", 60, [F.round(F.avg("value"), 6).alias("avg_v")]
    )
    return gap_fill(d, ["event_type"], 60, ["avg_v"], method="locf")


def ts_rate_q(spark, sf_dir):
    """PromQL-style rate() over a wrapping cumulative counter (running
    per-type event count mod 500, so resets exercise the
    cumulative_to_delta reset rule): per-series lag window, one shuffle
    on the series key."""
    from pyspark.sql import Window

    from fluent_bit_spark.extensions.timeseries import downsample, rate

    ev = _events(spark, sf_dir)
    d = downsample(ev, ["event_type"], "ts", 60, [F.count(F.lit(1)).alias("n")])
    w = Window.partitionBy("event_type").orderBy("bucket")
    c = d.select(
        "event_type",
        "bucket",
        (F.sum("n").over(w) % 500).alias("counter"),
    )
    return rate(c, ["event_type"], "counter", "bucket").select(
        "event_type", "bucket", "counter", F.round("rate", 6).alias("rate")
    )


def interval_band_join_q(spark, sf_dir):
    """Generic bucketed range join (the geoip2 interval technique on an
    arbitrary numeric domain): every event's value matched to its width-8
    band via bucket-equality hash join + residual bound check — no
    nested loop."""
    from fluent_bit_spark.operators.lookup import interval_join

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_id", "value"
    )
    bands = spark.range(62).select(
        (F.col("id") * 8.0).alias("lo"),
        ((F.col("id") + 1) * 8.0).alias("hi"),
        F.col("id").alias("band"),
    )
    return interval_join(ev, bands, "value", closed="left").select(
        "event_id", "value", "band"
    )


def sketch_ranks_q(spark, sf_dir):
    """Inverse quantiles, scale-independent contract: the VALUE columns
    are the exact inclusive-rank fractions (pure Catalyst avg, replayed
    by the oracle at any sf); the KLL sketch's rank answers are witnessed
    against them within the 2% band — a sketch regression hash-fails
    without tying the oracle to the sketch's exact-regime threshold."""
    from fluent_bit_spark.extensions.sketches import rank_summary

    probes = (50.0, 100.0, 150.0)
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    sk = rank_summary(ev, ["event_type"], "value", probes)
    exact = ev.groupBy("event_type").agg(
        *[
            F.round(
                F.avg((F.col("value") <= F.lit(v)).cast("double")), 9
            ).alias(f"rank_at_{str(v).replace('.', '_')}")
            for v in probes
        ]
    )
    names = [f"rank_at_{str(v).replace('.', '_')}" for v in probes]
    j = exact.join(
        sk.select("event_type", *[F.col(n).alias(f"__sk_{n}") for n in names]),
        "event_type",
    )
    return j.select(
        "event_type", *names,
        *[
            (F.abs(F.col(f"__sk_{n}") - F.col(n)) <= 0.02).alias(f"sk_{i}_ok")
            for i, n in enumerate(names)
        ],
    )


def dataset_split_q(spark, sf_dir):
    """Deterministic train/val/test split of the corpus (80/10/10): a
    Knuth multiplicative hash of doc_id (reproducible in any engine)
    places each doc in exactly one split — shuffle-free, stable under
    re-partitioning. Output: per-split doc counts and char volume."""
    from fluent_bit_spark.extensions.mixing import hash_split

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    out = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, bucket_expr=bucket
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def otlp_traces_roundtrip_q(spark, sf_dir):
    """out/in_opentelemetry traces (ctraces span model): synthesize spans
    from events, encode to ExportTraceServiceRequest JSON in SIZE-BOUNDED
    requests (~4k spans — the exporter discipline; an unbounded per-type
    batch grows a single JSON string row-proportionally, which at sf3 is
    a 100 MB from_json per row and at 100 TB is an OOM), decode through
    the three-level explode, recover the span fields bit-exactly. The
    decoded row set is independent of the batching, so the oracle replay
    is unchanged. One shuffle (the batch collect), decode shuffle-free."""
    from fluent_bit_spark.connectors import (
        otlp_traces_decode, otlp_traces_encode, with_request_batches,
    )

    ev = with_request_batches(
        _spread(_events(spark, sf_dir)), 4096, "event_id", group_cols=["event_type"]
    )
    spans = ev.select(
        F.col("req_batch"),
        F.lower(F.lpad(F.hex(F.col("user_id")), 32, "0")).alias("trace_id"),
        F.lower(F.lpad(F.hex(F.col("event_id")), 16, "0")).alias("span_id"),
        F.col("event_type").alias("name"),
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts")) + F.col("event_id") % 1000000
        ).alias("end_ts"),
        (F.col("event_id") % 3).alias("status"),
        F.col("user_id"),
        F.col("event_type"),
    )
    enc = otlp_traces_encode(
        spans,
        status_code_col="status",
        attr_cols=["user_id"],
        resource_attributes={"service.name": "events"},
        batch_col="req_batch",
    )
    dec = otlp_traces_decode(enc)
    return dec.select(
        "trace_id",
        "span_id",
        "name",
        "start_ts",
        "end_ts",
        "status_code",
        F.col("attributes").getItem("user_id").cast("long").alias("user_id"),
        F.col("resource").getItem("service.name").alias("service"),
    )


def otlp_metrics_roundtrip_q(spark, sf_dir):
    """out/in_opentelemetry metrics (cmetrics counter -> OTLP monotonic
    sum): per-(type, minute) event counts encoded as one
    ExportMetricsServiceRequest per metric, decoded back to flat data
    points bit-exactly. Composes the downsample rollup with the OTLP
    wire shape."""
    from fluent_bit_spark.connectors import otlp_metrics_decode, otlp_metrics_encode
    from fluent_bit_spark.extensions.timeseries import downsample

    ev = _events(spark, sf_dir)
    pts = downsample(
        ev, ["event_type"], "ts", 60, [F.count(F.lit(1)).alias("value")]
    ).select(
        F.lit("events_total").alias("metric_name"),
        F.lit("counter").alias("mtype"),
        F.col("bucket").alias("timestamp"),
        F.col("value").cast("double").alias("value"),
        "event_type",
    )
    enc = otlp_metrics_encode(
        pts,
        metric_type_col="mtype",
        label_cols=["event_type"],
        resource_attributes={"service.name": "events"},
        batch_col="event_type",
    )
    dec = otlp_metrics_decode(enc)
    return dec.select(
        "metric_name",
        "metric_type",
        F.col("timestamp").alias("bucket"),
        "value",
        F.col("attributes").getItem("event_type").alias("event_type"),
    )


def syslog_5424_q(spark, sf_dir):
    """out_syslog RFC5424 encode (plugins/out_syslog/syslog.c:229-380):
    severity/facility resolved through the digit-or-name tables, µs
    timestamps, SD params escaped, BOM-prefixed MSG. Full-string oracle."""
    from fluent_bit_spark.sinks import syslog_encode

    sev = (
        F.when(F.col("event_type") == "error", "Err")
        .when(F.col("event_type") == "purchase", "warning")
        .when(F.col("event_type") == "signup", "info")
        .when(F.col("event_type") == "view", "7")
        .otherwise("notice")
    )
    fac = F.when(F.col("user_id") % 2 == 0, "local0").otherwise("daemon")
    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("timestamp"),
        sev.alias("sev"),
        fac.alias("fac"),
        F.concat(F.lit("host-"), (F.col("user_id") % 8).cast("string")).alias("host"),
        F.col("event_type").alias("app"),
        F.col("event_id").cast("string").alias("procid"),
        F.create_map(
            F.lit("k"), F.get_json_object("props", "$.k")
        ).alias("meta"),
        F.col("props").alias("msg"),
    )
    # pre-spread the single-row-group scan before the string-heavy encode
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    return syslog_encode(
        ev,
        format="rfc5424",
        message_key="msg",
        hostname_key="host",
        appname_key="app",
        procid_key="procid",
        sd_keys=["meta"],
        severity_key="sev",
        facility_key="fac",
    )


def syslog_3164_q(spark, sf_dir):
    """out_syslog RFC3164 encode (syslog.c:382-460): BSD header with
    space-padded day, app[procid]: body, preset PRI fallbacks."""
    from fluent_bit_spark.sinks import syslog_encode

    ev = _events(spark, sf_dir).select(
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("host-"), (F.col("user_id") % 8).cast("string")).alias("host"),
        F.col("event_type").alias("app"),
        F.col("event_id").cast("string").alias("procid"),
        F.col("props").alias("msg"),
    )
    return syslog_encode(
        ev,
        format="rfc3164",
        message_key="msg",
        hostname_key="host",
        appname_key="app",
        procid_key="procid",
    )


def flowcounter_q(spark, sf_dir):
    """out_flowcounter per-minute throughput counters (plugins/
    out_flowcounter/out_flowcounter.c:100-125): counts/bytes per tumbling
    tick keyed by the closing epoch, with integer per-unit rates. One
    shuffle on the time-uniform window key."""
    from fluent_bit_spark.sinks import flowcounter

    ev = _events(spark, sf_dir).select(F.col("ts").alias("timestamp"), "props")
    return flowcounter(ev, unit="minute", size_col=F.octet_length("props"))


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
# The driver's correctness gate verifies the FIRST 50 registry entries in dict
# order.  Rounds 1-2 verified the same 50; round 3 rotated 50 never-checked
# LLM-pipeline/connector queries to the front (all green, CORRECTNESS_r03).
#
# ROUND-4 WINDOW: (a) the 23 queries that have never had a driver row — the
# r3 window's own tail plus every round-3 addition; (b) the 6 previously
# rows-only dedup/ANN queries, re-verified now that they emit invariant
# contracts with real oracles; (b') the 8 round-4 additions; (c) the 13
# stalest r01/r02-era core names (registry order) as re-verification
# backfill — 23+6+8+13 = 50. The 37 remaining r02-era names rotate in
# next round.
#
# ROUND-5 WINDOW: (a) all 15 never driver-checked queries (the round-5
# additions and the two registered after the r4 report regen); (b)
# tda_betti_windows re-verified under its new invariant oracle (its only
# row was rows-only); (c) 34 of the 37 r02-era names whose last driver
# rows are round 2 — 15+1+34 = 50.
#
# ROUND-6 WINDOW: gate-freshness rotation — the window holds the 50
# STALEST queries per tools/verify_window.py's (last-passing-round, name)
# order over the CORRECTNESS_r0*.json union: all 8 never-driver-checked
# round-6 additions, the 4 remaining r02-era rows, and the 38
# alphabetically-first of the 44 r03-era rows (the 6 dropped r03 names
# lead the round-7 rotation).
#
# ROUND-7 WINDOW: the 50 stalest by the same (last-passing-round, name)
# round-8 rotation (tools/verify_window.py ranking): the 2 never-
# driver-checked round-8 additions (ann_served, image_neardup) lead;
# then the 23 remaining r04-era rows; then the 25 alphabetically-first
# r05-era rows — exactly the 50 stalest per the staleness histogram.
#
# ROUND-9 WINDOW: the 50 stalest again: the 6 never-driver-checked
# round-9 additions (bm25_appended, pq_appended, the four video
# queries, caption_frames, tar_shard_roundtrip, and mkv_headers)
# lead; then the 28 remaining r05-era rows; then the 13
# alphabetically-first r06-era rows (dedup_jaccard_pairs,
# doc_fingerprint, domain_mix, edit_distance_join, entity_resolution,
# es_bulk_encode, es_bulk_roundtrip spill to the next rotation).
# The round-9 semantic changes to already-green queries (image_neardup's
# jpeg truth columns, attribution's duplicate-conversion scaling,
# audio_neardup's refactored verify) are re-verified by the full
# two-scale ORACLE_*_r09 reports regenerated after the change.
#
# ROUND-10 WINDOW: the 50 stalest by the same (last-passing-round, name)
# ranking: the 9 never-driver-checked round-10 additions
# (caption_coverage, mkv_frame_plan, gif_animation, adpcm_roundtrip,
# media_sniff_extended, mojibake_repair, warc_gz_roundtrip,
# fmp4_frame_plan, exif_orientation) lead; then the 37 remaining
# r06-era rows; then the 4 alphabetically-first r07-era rows
# (dataset_split, dedup_minhash, dedup_simhash, domain_cap,
# embedding_dedup, embedding_quantize, fuzzy_decontaminate,
# gopher_quality, grep_filter, heavy_hitters, interval_band_join,
# kinesis_shape, line_dedup, ... spill to the next rotation). The round-10 semantic changes to already-green queries
# (image_neardup's progressive-JPEG truth columns, tar_shard_roundtrip's
# pyarrow-fs publication path, caption_frames' refactored join) are
# re-verified by the full two-scale ORACLE_*_r10 reports regenerated
# after the change.
#
# ROUND-12 WINDOW: the 4 never-driver-checked round-12 additions
# (aac_frame_plan, fmp4_audio_track_plan, warc_fetch_windows,
# boilerplate_context) lead; then the 46 stalest rows — winsorize (last
# driver-checked r7, the one row the r11 rotation couldn't fit) and the
# alphabetically-first 45 of the 50 r08-era rows. The 5 spilled r08
# rows (sp_window_tumbling, ts_downsample, ts_gapfill_locf, ts_rate,
# url_canonicalize) lead the r13 rotation — they stay hash-green in the
# full-registry reports regenerated at this round's snapshot. The
# round-12 semantic changes to already-green queries (warc_gz_records'
# truncated column is projected away by warc_parse in every consumer;
# embedding_dedup's null-safe dim probe) are re-verified by those same
# reports.
_DRIVER_WINDOW = [
    "aac_frame_plan", "fmp4_audio_track_plan", "warc_fetch_windows",
    "boilerplate_context",
    "winsorize",
    "alter_size_take", "ann_served", "anomaly_zscore", "attribution",
    "audio_neardup", "bm25_topk", "ccnet_buckets", "checklist_watch",
    "chunk_packing", "content_modifier_actions", "cumulative_to_delta",
    "dataset_diff", "doc_chunking", "dsir_select",
    "enrich_broadcast_join", "expect_assertions", "html_extract",
    "image_neardup", "labels_ops", "lm_bigram_quality",
    "log_to_metrics_counter", "log_to_metrics_gauge",
    "log_to_metrics_histogram", "log_to_metrics_summary",
    "media_resize_grid", "metrics_selector", "q1_pricing_summary",
    "record_modifier_allowlist", "robust_anomaly", "similarity_ivf_ann",
    "similarity_lsh_ann", "similarity_pq_ann", "similarity_pq_join",
    "sketch_distinct", "sketch_overlap", "sketch_quantiles",
    "sketch_ranks", "sketch_rollup", "sp_create_stream_chain",
    "sp_forecast", "sp_projection", "sp_snapshot_last",
    "sp_tag_routing", "sp_where_coercion", "sp_window_hopping",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _query_registry()
    ordered = {name: base[name] for name in _DRIVER_WINDOW}
    ordered.update({name: fn for name, fn in base.items() if name not in ordered})
    return ordered


def _query_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "sp_projection": sp_projection,
        "sp_where_coercion": sp_where_coercion,
        "sp_projection_variant": sp_projection_variant,
        "sp_tag_routing": sp_tag_routing,
        "sp_window_tumbling": sp_window_tumbling,
        "sp_window_hopping": sp_window_hopping,
        "sp_forecast": sp_forecast,
        "sp_snapshot_last": sp_snapshot_last,
        "sp_create_stream_chain": sp_create_stream_chain,
        "grep_filter": grep_filter,
        "modify_rules": modify_rules,
        "nest_lift_roundtrip": nest_lift_roundtrip,
        "record_modifier_allowlist": record_modifier_allowlist,
        "parser_logfmt_roundtrip": parser_logfmt_roundtrip,
        "parser_ltsv_roundtrip": parser_ltsv_roundtrip,
        "parser_regex_access_log": parser_regex_access_log,
        "parser_json_props": parser_json_props,
        "parser_syslog_preset": parser_syslog_preset,
        "type_converter_casts": type_converter_casts,
        "throttle_rate": throttle_rate,
        "throttle_size_budget": throttle_size_budget,
        "rewrite_tag_rules": rewrite_tag_rules,
        "log_to_metrics_counter": log_to_metrics_counter,
        "log_to_metrics_gauge": log_to_metrics_gauge,
        "log_to_metrics_histogram": log_to_metrics_histogram,
        "cumulative_to_delta": cumulative_to_delta_q,
        "sampling_deterministic": sampling_deterministic,
        "sampling_tail_traces": sampling_tail_traces,
        "checklist_watch": checklist_watch,
        "enrich_broadcast_join": enrich_broadcast_join,
        "content_modifier_actions": content_modifier_actions,
        "labels_ops": labels_ops,
        "metrics_selector": metrics_selector_q,
        "otel_envelope": otel_envelope_q,
        "udf_hook": udf_hook_q,
        "log_to_metrics_summary": log_to_metrics_summary,
        "anomaly_zscore": anomaly_zscore,
        "robust_anomaly": robust_anomaly_q,
        "q6_forecast_revenue": q6_forecast_revenue,
        "alter_size_take": alter_size_take,
        "session_window_gap": session_window_gap,
        "doc_chunking": doc_chunking_q,
        "chunk_packing": chunk_packing_q,
        "multiline_sessionize": multiline_sessionize,
        "expect_assertions": expect_assertions,
        "router_split": router_split,
        "union_tag_merge": union_tag_merge,
        "window_rank_topk": window_rank_topk,
        "asof_last_signup": asof_last_signup,
        "pivot_status_revenue": pivot_status_revenue,
        "join_q3_shipping": join_q3_shipping,
        "join_q5_region": join_q5_region,
        "dedup_exact": dedup_exact_q,
        "dedup_minhash": dedup_minhash_q,
        "dedup_simhash": dedup_simhash_q,
        "dedup_jaccard_pairs": dedup_jaccard_pairs_q,
        "embedding_dedup": embedding_dedup_q,
        "semantic_dedup": semantic_dedup_q,
        "similarity_topk": similarity_topk_q,
        "similarity_lsh_ann": similarity_lsh_ann_q,
        "similarity_ivf_ann": similarity_ivf_ann_q,
        "ann_served": ann_served_q,
        "text_langid": text_langid_q,
        "text_quality": text_quality_q,
        "text_token_counts": text_token_counts_q,
        "gopher_quality": gopher_quality_q,
        "url_canonicalize": url_canonicalize_q,
        "domain_cap": domain_cap_q,
        "lm_quality": lm_quality_q,
        "fuzzy_decontaminate": fuzzy_decontaminate_q,
        "dsir_select": dsir_select_q,
        "bm25_topk": bm25_topk_q,
        "bm25_indexed": bm25_indexed_q,
        "bm25_served": bm25_served_q,
        "bm25_appended": bm25_appended_q,
        "pq_appended": pq_appended_q,
        "cluster_balanced": cluster_balanced_q,
        "pack_ffd": pack_ffd_q,
        "repeated_spans": repeated_spans_q,
        "exact_substr_trim": exact_substr_trim_q,
        "nb_quality_classifier": nb_quality_classifier_q,
        "token_budget_select": token_budget_select_q,
        "shuffle_shards": shuffle_shards_q,
        "span_decontaminate": span_decontaminate_q,
        "leakage_safe_split": leakage_safe_split_q,
        "fuzzy_join_trigram": fuzzy_join_trigram_q,
        "entity_resolution": entity_resolution_q,
        "edit_distance_join": edit_distance_join_q,
        "funnel_levels": funnel_levels_q,
        "cohort_retention": cohort_retention_q,
        "active_users_window": active_users_window_q,
        "top_session_paths": top_session_paths_q,
        "event_transitions": event_transitions_q,
        "rfm_segments": rfm_segments_q,
        "session_summaries": session_summaries_q,
        "experiment_stats": experiment_stats_q,
        "log_templates": log_templates_q,
        "lm_bigram_quality": lm_bigram_quality_q,
        "ccnet_buckets": ccnet_buckets_q,
        "media_resize_grid": media_resize_grid_q,
        "table_profile": table_profile_q,
        "pagerank_nodes": pagerank_nodes_q,
        "triangle_count": triangle_count_q,
        "skew_profile": skew_profile_q,
        "heavy_hitters": heavy_hitters_q,
        "winsorize": winsorize_q,
        "html_extract": html_extract_q,
        "warc_wet": warc_wet_q,
        "robots_compliance": robots_compliance_q,
        "stratified_sample": stratified_sample_q,
        "dataset_diff": dataset_diff_q,
        "pack_sequences": pack_sequences_q,
        "bpe_roundtrip": bpe_roundtrip_q,
        "prom_pages_roundtrip": prom_pages_roundtrip_q,
        "similarity_pq_join": similarity_pq_join_q,
        "doc_fingerprint": doc_fingerprint_q,
        "pii_redaction": pii_redaction_q,
        "multimodal_metadata": multimodal_metadata_q,
        "multimodal_headers": multimodal_headers_q,
        "image_neardup": image_neardup_q,
        "audio_neardup": audio_neardup_q,
        "attribution": attribution_q,
        "video_headers": video_headers_q,
        "video_frame_plan": video_frame_plan_q,
        "video_neardup": video_neardup_q,
        "video_scene_sample": video_scene_sample_q,
        "caption_frames": caption_frames_q,
        "caption_coverage": caption_coverage_q,
        "mkv_frame_plan": mkv_frame_plan_q,
        "gif_animation": gif_animation_q,
        "adpcm_roundtrip": adpcm_roundtrip_q,
        "media_sniff_extended": media_sniff_extended_q,
        "mojibake_repair": mojibake_repair_q,
        "warc_gz_roundtrip": warc_gz_roundtrip_q,
        "fmp4_frame_plan": fmp4_frame_plan_q,
        "elst_frame_plan": elst_frame_plan_q,
        "fmp4_multitrack_plan": fmp4_multitrack_plan_q,
        "fmp4_audio_track_plan": fmp4_audio_track_plan_q,
        "aac_frame_plan": aac_frame_plan_q,
        "warc_fetch_windows": warc_fetch_windows_q,
        "boilerplate_context": boilerplate_context_q,
        "warc_quality_pipeline": warc_quality_pipeline_q,
        "mp3_frame_plan": mp3_frame_plan_q,
        "boilerplate_blocks": boilerplate_blocks_q,
        "exif_orientation": exif_orientation_q,
        "mkv_headers": mkv_headers_q,
        "tar_shard_roundtrip": tar_shard_roundtrip_q,
        "es_bulk_encode": es_bulk_encode,
        "splunk_hec_shape": splunk_hec_shape,
        "otlp_logs_roundtrip": otlp_logs_roundtrip,
        "es_bulk_roundtrip": es_bulk_roundtrip,
        "splunk_hec_roundtrip": splunk_hec_roundtrip,
        "ml_inference_scores": ml_inference_scores,
        "kubernetes_enrich": kubernetes_enrich,
        "geoip_enrich": geoip_enrich_q,
        "msgpack_roundtrip": msgpack_roundtrip,
        "loki_push_shape": loki_push_shape,
        "avro_roundtrip": avro_roundtrip,
        "tda_betti_windows": tda_betti_windows,
        "text_repetition": text_repetition_q,
        "decontaminate": decontaminate_q,
        "dedup_clusters": dedup_clusters_q,
        "domain_mix": domain_mix_q,
        "mix_temperature": mix_temperature_q,
        "statsd_decode": statsd_decode_q,
        "prom_exposition": prom_exposition_q,
        "influxdb_lines": influxdb_lines_q,
        "datadog_shape": datadog_shape_q,
        "flowcounter_rates": flowcounter_q,
        "forward_wire_roundtrip": forward_wire_roundtrip,
        "cloudwatch_shape": cloudwatch_shape_q,
        "stackdriver_shape": stackdriver_shape_q,
        "bigquery_shape": bigquery_shape_q,
        "syslog_5424_lines": syslog_5424_q,
        "syslog_3164_lines": syslog_3164_q,
        "c4_line_filter": c4_line_filter_q,
        "c4_clean_docs": c4_clean_docs_q,
        "http_body": http_body_q,
        "plot_lines": plot_lines_q,
        "kafka_messages": kafka_messages_q,
        "ml_inference_mlp": ml_inference_mlp_q,
        "similarity_pq_ann": similarity_pq_ann_q,
        "kinesis_shape": kinesis_shape_q,
        "azure_shape": azure_shape_q,
        "http_requests": http_requests_q,
        "logdna_shape": logdna_shape_q,
        "nats_body": nats_body_q,
        "remote_write_roundtrip": remote_write_roundtrip_q,
        "line_dedup": line_dedup_q,
        "embedding_quantize": embedding_quantize_q,
        "sketch_distinct": sketch_distinct_q,
        "sketch_rollup": sketch_rollup_q,
        "sketch_quantiles": sketch_quantiles_q,
        "sketch_overlap": sketch_overlap_q,
        "ts_downsample": ts_downsample_q,
        "ts_gapfill_locf": ts_gapfill_locf_q,
        "ts_rate": ts_rate_q,
        "interval_band_join": interval_band_join_q,
        "sketch_ranks": sketch_ranks_q,
        "dataset_split": dataset_split_q,
        "otlp_traces_roundtrip": otlp_traces_roundtrip_q,
        "otlp_metrics_roundtrip": otlp_metrics_roundtrip_q,
        "prom_scrape_roundtrip": prom_scrape_roundtrip_q,
        "otlp_histogram_roundtrip": otlp_histogram_roundtrip_q,
    }


def _mlp_oracle_sql(dim: int = 64, hidden: int = 4) -> str:
    """Recompute the demo MLP (extensions/inference.py make_demo_mlp) as
    explicit SQL: one list_dot_product per hidden unit, ReLU via greatest,
    sigmoid output — weights from the same deterministic formula."""
    from fluent_bit_spark.extensions.inference import mlp_bias, mlp_weight

    terms = []
    for j in range(hidden):
        w = ", ".join(repr(mlp_weight(i, j)) for i in range(dim))
        w1 = ((j * 5) % 9 - 4) / 10.0
        terms.append(
            f"greatest(0.0, list_dot_product(emb, [{w}]) + {mlp_bias(j)!r}) * {w1!r}"
        )
    z = " + ".join(terms) + " + 0.05"
    return (
        "SELECT vec_id, ROUND(1.0 / (1.0 + exp(-(" + z + "))), 6) AS score "
        "FROM (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)"
    )


def oracle_sql() -> dict[str, str]:
    dec = "DECIMAL(12,2)"
    disc = f"CAST(l_extendedprice AS {dec}) * (1 - CAST(l_discount AS {dec}))"
    # canonical-form derivation of _messy_urls(ev), shared by the
    # url_canonicalize and domain_cap oracles (independent construction,
    # not a parser replay) — keep in sync with _messy_urls
    messy_url_cte = (
        "WITH n AS (SELECT event_id, "
        "(CASE WHEN event_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://www.' || "
        "lower(event_type) || CAST(user_id % 3 AS VARCHAR) || '.com' || "
        "(CASE WHEN event_id % 7 = 0 THEN ':8080' ELSE '' END) || "
        "'/p' || CAST(event_id % 50 AS VARCHAR) || '?a=1&b=2' AS norm_url, "
        "lower(event_type) || CAST(user_id % 3 AS VARCHAR) || '.com' AS domain "
        "FROM events)"
    )
    docs_with_copies = (
        "SELECT * FROM documents UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, text || '   ' AS text, lang, source, n_chars "
        "FROM documents WHERE doc_id % 10 = 0"
    )
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    # interpolated bigram LM over documents, target = doc_id%7==0 slice —
    # shared by lm_bigram_quality and ccnet_buckets
    _BIGRAM_LM_CTE = (
        f"d AS (SELECT doc_id, list_filter(string_split({norm}, ' '), w -> w <> '') AS ws "
        "FROM documents), "
        "pr AS (SELECT doc_id, ws[i] AS word, CASE WHEN i > 1 THEN ws[i - 1] END AS prev "
        "FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t), "
        "tc AS (SELECT word, COUNT(*) AS c FROM pr WHERE doc_id % 7 = 0 GROUP BY word), "
        "st AS (SELECT CAST(SUM(c) + COUNT(*) AS DOUBLE) AS denom FROM tc), "
        "big AS (SELECT prev, word, COUNT(*) AS cb FROM pr "
        "WHERE doc_id % 7 = 0 AND prev IS NOT NULL GROUP BY prev, word), "
        "ctx AS (SELECT prev, SUM(cb) AS cc FROM big GROUP BY prev), "
        "sc AS (SELECT p.doc_id, CASE "
        "WHEN p.prev IS NULL THEN coalesce((tc.c + 1) / st.denom, 1.0 / st.denom) "
        "WHEN ctx.prev IS NOT NULL THEN 0.5 * coalesce(big.cb / ctx.cc, 0.0) "
        "+ 0.5 * coalesce((tc.c + 1) / st.denom, 1.0 / st.denom) "
        "ELSE coalesce((tc.c + 1) / st.denom, 1.0 / st.denom) END AS prob "
        "FROM pr p CROSS JOIN st LEFT JOIN tc ON p.word = tc.word "
        "LEFT JOIN big ON p.prev = big.prev AND p.word = big.word "
        "LEFT JOIN ctx ON p.prev = ctx.prev), "
        "lm AS (SELECT doc_id, ROUND(AVG(ln(prob)), 6) AS avg_logp, "
        "COUNT(*) AS n_tokens FROM sc GROUP BY doc_id)"
    )
    markers = {
        "en": ["the", "and", "of", "to", "a", "in", "is"],
        "es": ["el", "la", "de", "que", "y", "los"],
        "de": ["der", "die", "und", "das", "ist", "ein"],
        "fr": ["le", "la", "les", "et", "des", "un"],
        "zh": ["的", "是", "了", "在", "我"],
    }

    def hits(lang):
        ws = f"string_split({norm}, ' ')"
        # non-ASCII (CJK) markers match by substring — unsegmented text
        # never token-EQUALS a single-character marker (mirrors
        # text.py _marker_hits)
        return "(" + " + ".join(
            (
                f"CASE WHEN list_contains({ws}, '{m}') THEN 1 ELSE 0 END"
                if m.isascii()
                else f"CASE WHEN contains({norm}, '{m}') THEN 1 ELSE 0 END"
            )
            for m in markers[lang]
        ) + ")"

    # argmax with tie -> first language in sorted order (matches lang_id)
    langid_expr = "CASE "
    prev = []
    for lang in sorted(markers):
        cond = f"{hits(lang)} > 0"
        beats = " AND ".join(
            [f"{hits(lang)} > {hits(p)}" for p in prev] or ["TRUE"]
        )
        not_beaten = " AND ".join(
            [f"{hits(nxt)} <= {hits(lang)}" for nxt in sorted(markers) if nxt > lang] or ["TRUE"]
        )
        langid_expr += f"WHEN {cond} AND {beats} AND {not_beaten} THEN '{lang}' "
        prev.append(lang)
    langid_expr += "ELSE 'und' END"

    sql = {
        "q1_pricing_summary": Q1_ORACLE,
        "sp_projection": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45"
        ),
        "sp_where_coercion": (
            "SELECT event_id FROM events "
            "WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50"
        ),
        # sp_projection_variant: the variant body is built from these very
        # columns, so the oracle replays from the source — an independent
        # check that the JSON->variant->cast path is value-preserving
        "sp_projection_variant": (
            "SELECT event_id, event_type AS etype, user_id AS uid, "
            "ROUND(value, 6) AS v FROM events WHERE user_id >= 100"
        ),
        "sp_tag_routing": (
            "SELECT event_id, user_id FROM events "
            "WHERE regexp_matches('events.' || event_type, '^events\\.err.*$') AND value >= 10"
        ),
        "sp_window_tumbling": (
            "SELECT date_trunc('hour', ts) AS window_start, event_type, "
            "COUNT(*) AS cnt, ROUND(SUM(value), 6) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "sp_window_hopping": (
            "SELECT ws AS window_start, COUNT(*) AS cnt FROM ("
            "  SELECT time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes') AS ws, ts"
            "  FROM events, unnest(generate_series(0, 1)) AS t(k)"
            ") WHERE ts >= ws AND ts < ws + INTERVAL '60 minutes' GROUP BY ws"
        ),
        "sp_forecast": (
            "SELECT event_type, ROUND("
            "regr_intercept(value, epoch(ts)) + regr_slope(value, epoch(ts)) * "
            "(MAX(epoch(ts)) + 3600), 3) AS forecast FROM events GROUP BY event_type"
        ),
        "sp_snapshot_last": (
            "SELECT event_id, user_id, event_type, value FROM events "
            "WHERE value > 0 ORDER BY ts DESC LIMIT 100"
        ),
        "sp_create_stream_chain": (
            "SELECT user_id, COUNT(*) AS cnt, ROUND(SUM(value), 6) AS sv "
            "FROM events WHERE value > 100 GROUP BY user_id"
        ),
        "grep_filter": (
            "SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders "
            "WHERE regexp_matches(o_orderpriority, '^1-URGENT') "
            "AND NOT regexp_matches(o_orderstatus, '^F$')"
        ),
        "modify_rules": (
            "SELECT c_custkey, c_name AS customer_name, 'retail' AS channel, "
            "c_mktsegment AS segment_copy, "
            "CASE WHEN regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)$') "
            "THEN 'vip' ELSE NULL END AS tier FROM customer"
        ),
        "nest_lift_roundtrip": "SELECT c_custkey, c_acctbal AS p_acctbal FROM customer",
        "record_modifier_allowlist": (
            "SELECT s_suppkey, s_name, s_acctbal, 'prod' AS env FROM supplier"
        ),
        "parser_logfmt_roundtrip": (
            "SELECT doc_id, doc_id AS id, lang, n_chars AS n FROM documents"
        ),
        "parser_ltsv_roundtrip": (
            "SELECT event_id, user_id AS user, event_type AS type, value AS val FROM events"
        ),
        "parser_regex_access_log": (
            "SELECT '10.0.0.' || (user_id % 256) AS remote, 'u' || user_id AS user, "
            "'GET' AS method, '/' || event_type || '/' || event_id AS path, "
            "CASE WHEN value > 100 THEN 500 ELSE 200 END AS code, "
            "event_id % 4096 AS size FROM events"
        ),
        "parser_json_props": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"
        ),
        "parser_syslog_preset": (
            "SELECT event_id, CAST(event_id % 192 AS BIGINT) AS pri, "
            "'host' || user_id AS host, 'app' || (user_id % 7) AS ident, "
            "CAST(event_id AS BIGINT) AS pid, 'MSG' || (event_id % 10) AS msgid, "
            "event_type || ' value=' || value AS message FROM events"
        ),
        "type_converter_casts": (
            "SELECT doc_id, n_chars AS n_int, CAST(n_chars AS DOUBLE) AS n_float, "
            "n_chars AS n_from_hex FROM documents"
        ),
        "throttle_rate": (
            "SELECT event_id, event_type FROM events "
            "QUALIFY row_number() OVER (PARTITION BY CAST(floor(epoch(ts)/3600) AS BIGINT), "
            "event_type ORDER BY ts, event_id) <= 5"
        ),
        # greedy admit (only KEPT records charge the budget —
        # throttle_size.c add_load()s on keep only), restated as a
        # recursive fold over row_number within each (pane, key) group
        "throttle_size_budget": (
            "WITH RECURSIVE base AS ("
            "SELECT event_id, event_type, strlen(props) AS sz, "
            "CAST(floor(epoch(ts)/3600) AS BIGINT) AS pane, "
            "row_number() OVER (PARTITION BY "
            "CAST(floor(epoch(ts)/3600) AS BIGINT), event_type "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "fold AS ("
            "SELECT event_id, event_type, pane, rn, "
            "CASE WHEN sz <= 40 THEN sz ELSE 0 END AS total, "
            "sz <= 40 AS keep FROM base WHERE rn = 1 "
            "UNION ALL "
            "SELECT b.event_id, b.event_type, b.pane, b.rn, "
            "CASE WHEN f.total + b.sz <= 40 THEN f.total + b.sz "
            "ELSE f.total END, f.total + b.sz <= 40 "
            "FROM fold f JOIN base b "
            "ON b.pane = f.pane AND b.event_type = f.event_type "
            "AND b.rn = f.rn + 1) "
            "SELECT event_id, event_type FROM fold WHERE keep"
        ),
        "rewrite_tag_rules": (
            "SELECT CASE WHEN regexp_matches(event_type, '^(error|signup)$') "
            "THEN 'alert.' || event_type ELSE 'events.' || event_type END AS tag, "
            "COUNT(*) AS cnt FROM events GROUP BY 1"
        ),
        "log_to_metrics_counter": (
            "SELECT date_trunc('hour', ts) AS window_start, "
            "date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end, "
            "'events_total' AS metric_name, 'counter' AS metric_type, event_type, "
            "CAST(COUNT(*) AS DOUBLE) AS value FROM events GROUP BY 1, 2, 5"
        ),
        "log_to_metrics_gauge": (
            "SELECT 'last_value' AS metric_name, 'gauge' AS metric_type, user_id, "
            "CAST(arg_max(value, ts) AS DOUBLE) AS value FROM events GROUP BY user_id"
        ),
        "log_to_metrics_histogram": (
            "SELECT 'value_hist' AS metric_name, 'histogram' AS metric_type, event_type, "
            "CAST(SUM(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END) AS DOUBLE) AS le_10_0, "
            "CAST(SUM(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) AS DOUBLE) AS le_50_0, "
            "CAST(SUM(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS DOUBLE) AS le_100_0, "
            "CAST(COUNT(*) AS DOUBLE) AS le_inf, SUM(value) AS sum_value "
            "FROM events GROUP BY event_type"
        ),
        "cumulative_to_delta": (
            "SELECT event_id, user_id, ROUND(CASE "
            "WHEN lag(value) OVER w IS NULL THEN value "
            "WHEN value - lag(value) OVER w < 0 THEN value "
            "ELSE value - lag(value) OVER w END, 6) AS value_delta "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)"
        ),
        "sampling_deterministic": (
            "SELECT event_id, event_type FROM events WHERE (event_id * 2654435761) % 97 < 20"
        ),
        "sampling_tail_traces": (
            "WITH spans AS (SELECT CAST(user_id AS VARCHAR) AS trace_id, epoch(ts) AS start_ts, "
            "epoch(ts) + value AS end_ts, CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'OK' END AS status, "
            "event_id FROM events), "
            "stats AS (SELECT trace_id, COUNT(*) AS n, "
            "MAX(CASE WHEN status = 'ERROR' THEN 1 ELSE 0 END) AS has_err FROM spans GROUP BY trace_id) "
            "SELECT s.event_id, s.trace_id FROM spans s JOIN stats t ON s.trace_id = t.trace_id "
            "WHERE t.n >= 80 OR t.has_err = 1"
        ),
        "checklist_watch": (
            "SELECT e.event_id, e.user_id, "
            "CASE WHEN w.uid IS NOT NULL THEN TRUE ELSE FALSE END AS watched "
            "FROM events e LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS uid "
            "FROM customer WHERE c_custkey % 7 = 0 AND c_custkey < 150) w "
            "ON CAST(e.user_id AS VARCHAR) = w.uid"
        ),
        "content_modifier_actions": (
            "SELECT event_id, "
            "CAST(CASE WHEN regexp_matches(props, '\"k\":\\s*(\\d+)') "
            "THEN regexp_extract(props, '\"k\":\\s*(\\d+)', 1) END AS BIGINT) AS k_int, "
            "sha256(event_type) AS etype_sha, 'prod' AS env FROM events"
        ),
        "labels_ops": (
            "SELECT 'events_total' AS metric_name, sha256(event_type) AS etype_sha, "
            "'prod' AS env, 'fb' AS job, CAST(COUNT(*) AS DOUBLE) AS value "
            "FROM events GROUP BY event_type"
        ),
        "metrics_selector": (
            "SELECT 'events_total' AS metric_name, 'counter' AS metric_type, event_type, "
            "ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS value FROM events GROUP BY event_type"
        ),
        "otel_envelope": (
            "SELECT event_id, CAST(0 AS BIGINT) AS resource_id, "
            "'events-pipeline' AS service, 'fbs' AS scope_name FROM events"
        ),
        "log_to_metrics_summary": (
            "SELECT 'value_summary' AS metric_name, 'summary' AS metric_type, event_type, "
            "ROUND(quantile_cont(value, 0.5), 6) AS q_0_5, "
            "ROUND(quantile_cont(value, 0.9), 6) AS q_0_9, "
            "ROUND(SUM(value), 6) AS sum_value, CAST(COUNT(*) AS DOUBLE) AS count_value "
            "FROM events GROUP BY event_type"
        ),
        "anomaly_zscore": (
            "SELECT event_id, user_id, "
            "ROUND(CASE WHEN n >= 3 AND sd > 0 THEN abs(value - mu) / sd ELSE 0 END, 6) AS z_score, "
            "ROUND(CASE WHEN n >= 3 THEN greatest(mn - value, value - mx, 0) / "
            "(CASE WHEN mx - mn > 0 THEN mx - mn ELSE 1 END) ELSE 0 END, 6) AS range_ratio, "
            "(CASE WHEN n >= 3 AND sd > 0 THEN abs(value - mu) / sd ELSE 0 END) > 2.5 AS is_anomaly "
            "FROM (SELECT event_id, user_id, value, "
            "COUNT(value) OVER w AS n, AVG(value) OVER w AS mu, STDDEV_SAMP(value) OVER w AS sd, "
            "MIN(value) OVER w AS mn, MAX(value) OVER w AS mx FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))"
        ),
        "robust_anomaly": (
            "WITH v AS (SELECT event_id, user_id, ROUND(value, 6) AS r FROM events), "
            "m AS (SELECT user_id, quantile_disc(r, 0.5) AS med "
            "FROM v GROUP BY user_id), "
            "d AS (SELECT v.event_id, v.user_id, v.r, m.med, abs(v.r - m.med) AS adev "
            "FROM v JOIN m USING (user_id)), "
            "md AS (SELECT user_id, quantile_disc(adev, 0.5) AS mad "
            "FROM d GROUP BY user_id) "
            "SELECT d.event_id, d.user_id, ROUND(d.med, 6) AS med, md.mad, "
            "CASE WHEN md.mad > 0 THEN "
            "FLOOR(0.6745 * d.adev / md.mad * 1000000 + 0.5) / 1000000 "
            "ELSE 0 END AS robust_z, "
            "CASE WHEN md.mad > 0 THEN "
            "FLOOR(0.6745 * d.adev / md.mad * 1000000 + 0.5) / 1000000 > 3.5 "
            "ELSE d.adev > 0 END AS is_anomaly "
            "FROM d JOIN md USING (user_id)"
        ),
        "q6_forecast_revenue": (
            f"SELECT CAST(SUM(CAST(l_extendedprice AS {dec}) * CAST(l_discount AS {dec})) AS DOUBLE) "
            "AS revenue, COUNT(*) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount >= 0.02 AND l_discount <= 0.08 AND l_quantity < 24"
        ),
        "alter_size_take": (
            "SELECT event_id, event_type FROM events "
            "QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY event_id) <= 100"
        ),
        "session_window_gap": (
            "WITH s AS (SELECT user_id, ts, value, CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s) "
            "SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS cnt, "
            "ROUND(SUM(value), 6) AS sv FROM g GROUP BY user_id, sid"
        ),
        "doc_chunking": (
            "WITH w AS (SELECT doc_id, "
            "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS ws FROM documents), "
            "m AS (SELECT doc_id, ws, len(ws) AS n, "
            "greatest(CAST(ceil((len(ws) - 16) / 48.0) AS INT), 1) AS nc FROM w) "
            "SELECT doc_id, i AS chunk_idx, "
            "CAST(least(n - i * 48, 64) AS INT) AS n_chunk_tokens, "
            "md5(array_to_string(ws[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_md5 "
            "FROM m, unnest(generate_series(0, nc - 1)) AS t(i)"
        ),
        "chunk_packing": (
            "WITH w AS (SELECT doc_id, "
            "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS ws FROM documents), "
            "m AS (SELECT doc_id, len(ws) AS n, "
            "greatest(CAST(ceil((len(ws) - 16) / 48.0) AS INT), 1) AS nc FROM w), "
            "c AS (SELECT doc_id, i AS chunk_idx, "
            "CAST(least(n - i * 48, 64) AS BIGINT) AS t "
            "FROM m, unnest(generate_series(0, nc - 1)) AS t(i)), "
            "r AS (SELECT doc_id, chunk_idx, "
            "SUM(t) OVER (ORDER BY doc_id, chunk_idx ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) - t AS start FROM c) "
            "SELECT doc_id, chunk_idx, CAST(start // 256 AS BIGINT) AS pack_id, "
            "CAST(start % 256 AS BIGINT) AS pack_offset FROM r"
        ),
        "udf_hook": (
            "WITH base AS (SELECT event_id, event_type, value FROM events WHERE value >= 10) "
            "SELECT event_id, event_type, "
            "ROUND(CASE WHEN event_type = 'signup' THEN value + 1000 ELSE value END, 6) AS value "
            "FROM base WHERE event_type <> 'error' "
            "UNION ALL SELECT event_id, event_type, ROUND(value, 6) FROM base WHERE event_type = 'error' "
            "UNION ALL SELECT -event_id, event_type, ROUND(value * 2, 6) FROM base WHERE event_type = 'error'"
        ),
        "enrich_broadcast_join": (
            f"SELECT s.s_name AS supplier_name, COUNT(*) AS n_items, "
            f"CAST(SUM({disc}) AS DOUBLE) AS revenue "
            "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "GROUP BY s.s_name"
        ),
        "multiline_sessionize": (
            "SELECT MIN(event_id) AS seq, string_agg("
            "CASE WHEN event_id % 4 = 0 THEN 'E ' || event_type ELSE '  at ' || event_type END, "
            "chr(10) ORDER BY event_id) AS message, COUNT(*) AS n_lines "
            "FROM events GROUP BY CAST(floor(event_id / 4) AS BIGINT)"
        ),
        "expect_assertions": (
            "SELECT COUNT(*) AS records, CAST(SUM(CASE WHEN l_orderkey IS NULL OR "
            "l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM lineitem"
        ),
        "router_split": (
            "WITH tagged AS (SELECT event_id, 'events.' || event_type AS tag, value FROM events) "
            "SELECT route, COUNT(*) AS cnt FROM ("
            "SELECT 'errors' AS route, event_id FROM tagged WHERE tag = 'events.error' "
            "UNION ALL SELECT 'clicky', event_id FROM tagged WHERE regexp_matches(tag, '^events\\.c.*$') "
            "UNION ALL SELECT 'big', event_id FROM tagged WHERE value > 150"
            ") GROUP BY route"
        ),
        "union_tag_merge": (
            "SELECT 'events.' || event_type AS tag, COUNT(*) AS cnt FROM events "
            "WHERE event_type IN ('error', 'signup') GROUP BY 1"
        ),
        "window_rank_topk": (
            "SELECT o_custkey, o_orderkey, rnk FROM ("
            "SELECT o_custkey, o_orderkey, row_number() OVER "
            "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders"
            ") WHERE rnk <= 3"
        ),
        "asof_last_signup": (
            "SELECT event_id, user_id, last_value("
            "CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS last_signup_ts FROM events"
        ),
        "pivot_status_revenue": (
            f"SELECT l_returnflag, "
            f"CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS {dec}) END) AS DOUBLE) AS rev_open, "
            f"CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS {dec}) END) AS DOUBLE) AS rev_filled "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "join_q3_shipping": (
            f"SELECT o_orderkey, o_orderdate, CAST(SUM({disc}) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10"
        ),
        "join_q5_region": (
            f"SELECT n_name, CAST(SUM({disc}) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name"
        ),
        "dedup_exact": (
            f"WITH all_docs AS ({docs_with_copies}), "
            f"keyed AS (SELECT doc_id, md5({norm}) AS h FROM all_docs) "
            "SELECT MIN(doc_id) AS doc_id FROM keyed GROUP BY h"
        ),
        # tda_betti_windows (invariant contract): Betti-0 at a FIXED
        # threshold IS SQL-expressible — H0 finite bars are single-linkage
        # merges, so b0 in [1e-3, thr] = C(<1e-3) - C(<=thr) with C() the
        # threshold-graph component count (recursive-CTE closure below).
        # The full quantile sweep (betti1 needs the GF(2) reduction) is
        # witnessed Spark-side against an independent single-matrix ELZ
        # reduction and emitted as the truth-table column sweep_indep_ok.
        "tda_betti_windows": (
            "WITH RECURSIVE "
            "ev AS (SELECT event_type, value, "
            "row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS rn "
            "FROM events), "
            "w AS (SELECT event_type, rn // 32 AS win, rn % 32 AS pos, value FROM ev), "
            "fullw AS (SELECT event_type, win FROM w "
            "GROUP BY event_type, win HAVING COUNT(*) = 32), "
            "x AS (SELECT w.* FROM w JOIN fullw USING (event_type, win)), "
            # delay embedding m=2 tau=4: point j = (value[j+4], value[j])
            "pts AS (SELECT a.event_type, a.win, a.pos - 4 AS j, "
            "a.value AS c0, b.value AS c1 "
            "FROM x a JOIN x b ON a.event_type = b.event_type "
            "AND a.win = b.win AND a.pos = b.pos + 4), "
            "edges AS (SELECT p.event_type, p.win, p.j AS a, q.j AS b, "
            "sqrt((p.c0 - q.c0) * (p.c0 - q.c0) + (p.c1 - q.c1) * (p.c1 - q.c1)) AS d "
            "FROM pts p JOIN pts q ON p.event_type = q.event_type "
            "AND p.win = q.win AND p.j < q.j), "
            # the C-rule 0.90 quantile: idx = round(0.9 * 377) = 339 -> rank 340
            "thr AS (SELECT event_type, win, d AS thr FROM ("
            "SELECT event_type, win, d, "
            "row_number() OVER (PARTITION BY event_type, win ORDER BY d) AS rk "
            "FROM edges) WHERE rk = 340), "
            "lab AS (SELECT 't' AS tag, e.event_type, e.win, e.a, e.b "
            "FROM edges e JOIN thr USING (event_type, win) WHERE e.d <= thr.thr "
            "UNION ALL "
            "SELECT 'e' AS tag, event_type, win, a, b FROM edges WHERE d < 0.001), "
            "sym AS (SELECT * FROM lab UNION ALL "
            "SELECT tag, event_type, win, b AS a, a AS b FROM lab), "
            "reach AS (SELECT tags.tag, p.event_type, p.win, p.j AS a, p.j AS b "
            "FROM pts p CROSS JOIN (VALUES ('t'), ('e')) tags(tag) "
            "UNION "
            "SELECT r.tag, r.event_type, r.win, r.a, s.b "
            "FROM reach r JOIN sym s ON r.tag = s.tag "
            "AND r.event_type = s.event_type AND r.win = s.win AND r.b = s.a), "
            "comp AS (SELECT tag, event_type, win, a, MIN(b) AS label "
            "FROM reach GROUP BY tag, event_type, win, a), "
            "ncomp AS (SELECT tag, event_type, win, COUNT(DISTINCT label) AS c "
            "FROM comp GROUP BY tag, event_type, win) "
            "SELECT f.event_type, f.win AS window_id, 32 AS n_raw, 28 AS n_embed, "
            "CAST(ce.c - ct.c AS INT) AS b0_q90, TRUE AS sweep_indep_ok "
            "FROM fullw f "
            "JOIN ncomp ct ON ct.tag = 't' AND ct.event_type = f.event_type "
            "AND ct.win = f.win "
            "JOIN ncomp ce ON ce.tag = 'e' AND ce.event_type = f.event_type "
            "AND ce.win = f.win "
            "ORDER BY f.event_type, window_id"
        ),
        # dedup_minhash / dedup_simhash / embedding_dedup / similarity_*_ann:
        # candidate generation depends on engine-internal hash functions
        # (xxhash64 / hyperplane seeds / float k-means), so the queries emit
        # their INVARIANT CONTRACT per input row (soundness witness /
        # banded-vs-brute exactness / self-retrieval + recall floor) and the
        # oracle is the literal truth table — a single false drop or lost
        # candidate hash-fails the row.
        "dedup_minhash": (
            f"WITH all_docs AS ({docs_with_copies}) "
            "SELECT doc_id, TRUE AS sound FROM all_docs"
        ),
        "dedup_simhash": (
            f"WITH all_docs AS ({docs_with_copies}) "
            "SELECT doc_id, TRUE AS exact FROM all_docs"
        ),
        "embedding_dedup": (
            "WITH allv AS (SELECT vec_id FROM embeddings UNION ALL "
            "SELECT vec_id + 1000000 AS vec_id FROM embeddings WHERE vec_id % 25 = 0) "
            "SELECT vec_id, TRUE AS sound FROM allv"
        ),
        "semantic_dedup": (
            "WITH allv AS (SELECT vec_id FROM embeddings UNION ALL "
            "SELECT vec_id + 1000000 AS vec_id FROM embeddings WHERE vec_id % 25 = 0) "
            "SELECT vec_id, TRUE AS sound FROM allv"
        ),
        "similarity_lsh_ann": (
            "SELECT query_id, CAST(5 AS BIGINT) AS n_returned, TRUE AS self_found, "
            "TRUE AS recall_ok FROM (VALUES (0), (1), (2)) t(query_id)"
        ),
        "similarity_ivf_ann": (
            "SELECT query_id, CAST(5 AS BIGINT) AS n_returned, TRUE AS self_found, "
            "TRUE AS recall_ok FROM (VALUES (0), (1), (2)) t(query_id)"
        ),
        "ann_served": (
            "SELECT query_id, CAST(5 AS BIGINT) AS n_returned, TRUE AS self_found, "
            "TRUE AS recall_ok, TRUE AS ivf_roundtrip, TRUE AS pq_roundtrip "
            "FROM (VALUES (0), (1), (2)) t(query_id)"
        ),
        "pq_appended": (
            "SELECT vec_id AS query_id, TRUE AS append_equals_rebuild "
            "FROM embeddings WHERE vec_id IN (0, 1, 2)"
        ),
        "bm25_appended": (
            "SELECT doc_id AS query_id, TRUE AS append_equals_rebuild "
            "FROM documents WHERE doc_id % 100 = 0"
        ),
        "similarity_pq_ann": (
            "SELECT query_id, CAST(5 AS BIGINT) AS n_returned, TRUE AS self_found, "
            "TRUE AS recall_ok FROM (VALUES (0), (1), (2)) t(query_id)"
        ),
        "dedup_jaccard_pairs": (
            f"WITH ws AS (SELECT doc_id, list_distinct(string_split({norm}, ' ')) AS w "
            "FROM documents WHERE doc_id < 60) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "ROUND(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / "
            "len(list_distinct(list_concat(a.w, b.w))), 6) AS jaccard "
            "FROM ws a JOIN ws b ON a.doc_id < b.doc_id "
            "WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / "
            "len(list_distinct(list_concat(a.w, b.w))) >= 0.8"
        ),
        "similarity_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings "
            "WHERE vec_id IN (0, 1, 2)), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos FROM embeddings e, q) "
            "SELECT query_id, vec_id, rank, ROUND(cos, 4) AS cos FROM ("
            "SELECT query_id, vec_id, cos, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored"
            ") WHERE rank <= 5"
        ),
        "text_langid": f"SELECT doc_id, {langid_expr} AS lang_pred FROM documents",
        "text_quality": (
            f"WITH f AS (SELECT doc_id, length(text) AS q_chars, "
            "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS q_tokens, "
            "len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct, "
            f"{hits('en')} AS n_stop FROM documents) "
            "SELECT doc_id, q_chars, q_tokens, "
            "ROUND(CAST(n_punct AS DOUBLE) / greatest(q_chars, 1), 6) AS q_punct_ratio, "
            "ROUND(CAST(n_stop AS DOUBLE) / greatest(q_tokens, 1), 6) AS q_stop_ratio, "
            "ROUND(CAST(q_chars AS DOUBLE) / greatest(q_tokens, 1), 6) AS q_mean_word_len, "
            "ROUND((CASE WHEN q_chars BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.4 END) * "
            "(CASE WHEN CAST(n_punct AS DOUBLE) / greatest(q_chars, 1) <= 0.2 THEN 1.0 ELSE 0.5 END) * "
            "(CASE WHEN CAST(n_stop AS DOUBLE) / greatest(q_tokens, 1) >= 0.05 THEN 1.0 ELSE 0.7 END), 4) "
            "AS quality FROM f"
        ),
        "text_token_counts": (
            "SELECT doc_id, "
            "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws_tokens, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens "
            "FROM documents"
        ),
        "gopher_quality": (
            "WITH f AS (SELECT doc_id, text, "
            "CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words, "
            "string_split_regex(trim(text), '\\s+') AS words, "
            "list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), "
            "x -> len(x) > 0) AS lines FROM documents), "
            "g AS (SELECT doc_id, n_words, "
            "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) "
            "/ greatest(n_words, 1) AS mean_wl, "
            "CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE) "
            "/ greatest(n_words, 1) AS sym_ratio, "
            "CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*•](\\s|$)'))) AS DOUBLE) "
            "/ greatest(len(lines), 1) AS bullet_frac, "
            "CAST(len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)$'))) AS DOUBLE) "
            "/ greatest(len(lines), 1) AS ellipsis_frac, "
            "CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) "
            "/ greatest(n_words, 1) AS alpha_frac, "
            + " + ".join(
                f"(CASE WHEN regexp_matches(lower(text), '\\b{s}\\b') THEN 1 ELSE 0 END)"
                for s in ("the", "be", "to", "of", "and", "that", "have", "with")
            )
            + " AS stop_hits FROM f) "
            "SELECT doc_id, n_words AS g_words, "
            "n_words BETWEEN 50 AND 100000 AS r_word_count, "
            "mean_wl BETWEEN 3.0 AND 10.0 AS r_mean_word_len, "
            "sym_ratio <= 0.1 AS r_symbol_ratio, "
            "bullet_frac <= 0.9 AS r_bullet_lines, "
            "ellipsis_frac <= 0.3 AS r_ellipsis_lines, "
            "alpha_frac >= 0.8 AS r_alpha_words, "
            "stop_hits >= 2 AS r_stopwords, "
            "(n_words BETWEEN 50 AND 100000) AND (mean_wl BETWEEN 3.0 AND 10.0) "
            "AND sym_ratio <= 0.1 AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3 "
            "AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep FROM g"
        ),
        "url_canonicalize": (
            # independent derivation: canonical URL built straight from the
            # event fields the Spark side synthesized its messy URL from
            f"{messy_url_cte} "
            "SELECT MIN(event_id) AS doc_id, norm_url, domain FROM n "
            "WHERE domain NOT IN ('error1.com', 'view2.com') "
            "GROUP BY norm_url, domain"
        ),
        "domain_cap": (
            f"{messy_url_cte}, "
            "d AS (SELECT MIN(event_id) AS doc_id, norm_url, domain FROM n "
            "WHERE domain NOT IN ('error1.com', 'view2.com') "
            "GROUP BY norm_url, domain) "
            "SELECT doc_id, domain FROM d "
            "QUALIFY row_number() OVER (PARTITION BY domain ORDER BY doc_id) <= 50"
        ),
        "lm_quality": (
            f"WITH tw AS (SELECT unnest(string_split({norm}, ' ')) AS word "
            "FROM documents WHERE doc_id % 7 = 0), "
            "tc AS (SELECT word, COUNT(*) AS c FROM tw WHERE word <> '' GROUP BY word), "
            "st AS (SELECT CAST(SUM(c) + COUNT(*) AS DOUBLE) AS denom FROM tc), "
            f"dw AS (SELECT doc_id, unnest(string_split({norm}, ' ')) AS word FROM documents), "
            "sc AS (SELECT d.doc_id, "
            "coalesce(ln((tc.c + 1) / st.denom), ln(1.0 / st.denom)) AS lp "
            "FROM dw d CROSS JOIN st LEFT JOIN tc ON d.word = tc.word "
            "WHERE d.word <> '') "
            "SELECT doc_id, ROUND(AVG(lp), 6) AS avg_logp, COUNT(*) AS n_tokens "
            "FROM sc GROUP BY doc_id"
        ),
        "dsir_select": (
            # full replay of the DSIR pipeline: hashed unigram+bigram bag
            # models (md5-prefix buckets, add-one smoothing), per-doc mean
            # gram log-ratio, deterministic-Gumbel top-50.
            f"WITH dw AS (SELECT doc_id, string_split({norm}, ' ') AS ws FROM documents), "
            "uni AS (SELECT doc_id, unnest(ws) AS g FROM dw), "
            "bi AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g "
            "FROM dw CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws))) AS i) t), "
            "grams AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS bucket "
            "FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) WHERE g <> ''), "
            "tcnt AS (SELECT bucket, COUNT(*) AS ct FROM grams WHERE doc_id % 7 = 0 GROUP BY bucket), "
            "rcnt AS (SELECT bucket, COUNT(*) AS cr FROM grams GROUP BY bucket), "
            "tots AS (SELECT (SELECT CAST(coalesce(SUM(ct), 0) + 1024 AS DOUBLE) FROM tcnt) AS dt, "
            "(SELECT CAST(SUM(cr) + 1024 AS DOUBLE) FROM rcnt) AS dr), "
            "model AS (SELECT r.bucket, "
            "ln((coalesce(t.ct, 0) + 1) / tots.dt) - ln((r.cr + 1) / tots.dr) AS logratio "
            "FROM rcnt r LEFT JOIN tcnt t USING (bucket) CROSS JOIN tots), "
            "docw AS (SELECT g.doc_id, SUM(m.logratio) / COUNT(*) AS base "
            "FROM grams g JOIN model m USING (bucket) GROUP BY g.doc_id), "
            "scored AS (SELECT doc_id, ROUND(base + "
            "-ln(-ln(((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)"
            " / 4294967296.0))), 6) AS score "
            "FROM docw) "
            "SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank "
            "FROM scored ORDER BY score DESC, doc_id LIMIT 50"
        ),
        "fuzzy_decontaminate": (
            "WITH corpus AS (SELECT doc_id FROM documents UNION ALL "
            "SELECT doc_id + 2000000 AS doc_id FROM documents WHERE doc_id % 97 = 0) "
            "SELECT doc_id, TRUE AS sound FROM corpus"
        ),
        # lm_bigram_quality / ccnet_buckets: interpolated bigram LM replay
        # (pairs from the word arrays, target unigram/bigram/context
        # tables, lam=0.5 mixture) + quantile_cont head/middle/tail cuts
        "lm_bigram_quality": (
            "WITH " + _BIGRAM_LM_CTE
            + " SELECT doc_id, avg_logp, n_tokens FROM lm"
        ),
        "ccnet_buckets": (
            "WITH " + _BIGRAM_LM_CTE + ", "
            "r AS (SELECT doc_id, avg_logp AS s FROM lm), "
            f"cuts AS (SELECT quantile_cont(s, {1 - 1 / 3!r}) AS c_head, "
            f"quantile_cont(s, {1 - 2 / 3!r}) AS c_mid FROM r) "
            "SELECT r.doc_id, CASE WHEN r.s >= cuts.c_head THEN 'head' "
            "WHEN r.s >= cuts.c_mid THEN 'middle' ELSE 'tail' END AS bucket, "
            "r.s AS avg_logp FROM r CROSS JOIN cuts"
        ),
        # bm25_topk: full Okapi BM25 replay — tf/dl/avgdl, query-vocab df,
        # Lucene idf, score, per-query rank; queries are the corpus's own
        # every-100th docs' first 8 normalized words
        "bm25_topk": (
            f"WITH d AS (SELECT doc_id, string_split({norm}, ' ') AS ws FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS term FROM d), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok "
            "WHERE term <> '' GROUP BY doc_id, term), "
            "dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id), "
            "stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n, "
            "(SELECT AVG(dl) FROM dl) AS avgdl), "
            "qt AS (SELECT DISTINCT doc_id AS query_id, unnest(ws[1:8]) AS term "
            "FROM d WHERE doc_id % 100 = 0), "
            "qterm AS (SELECT * FROM qt WHERE term <> ''), "
            "dfq AS (SELECT term, COUNT(*) AS df FROM tf "
            "WHERE term IN (SELECT DISTINCT term FROM qterm) GROUP BY term), "
            "idf AS (SELECT term, ln((stats.n - df + 0.5) / (df + 0.5) + 1) AS idf "
            "FROM dfq CROSS JOIN stats), "
            "sc AS (SELECT q.query_id, tf.doc_id, "
            "ROUND(SUM(idf.idf * tf.tf * 2.2 / "
            "(tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 6) AS score "
            "FROM qterm q JOIN idf USING (term) JOIN tf USING (term) "
            "JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats "
            "GROUP BY q.query_id, tf.doc_id) "
            "SELECT query_id, doc_id, score, rank FROM ("
            "SELECT sc.*, row_number() OVER (PARTITION BY query_id "
            "ORDER BY score DESC, doc_id) AS rank FROM sc) WHERE rank <= 10"
        ),
        # repeated_spans: md5 10-token window hashes counted corpus-wide
        "repeated_spans": (
            "WITH corpus AS (SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0), "
            f"d AS (SELECT doc_id, list_filter(string_split({norm}, ' '), w -> w <> '') AS ws "
            "FROM corpus), "
            "spans AS (SELECT doc_id, "
            "md5(array_to_string(ws[i:i+9], ' ')) AS h "
            "FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) - 8)) AS i) t "
            "WHERE len(ws) >= 10), "
            "cnt AS (SELECT h, COUNT(*) AS c FROM spans GROUP BY h), "
            "per_doc AS (SELECT s.doc_id, COUNT(*) AS n_windows, "
            "SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS dup_windows "
            "FROM spans s JOIN cnt USING (h) GROUP BY s.doc_id) "
            "SELECT d.doc_id, len(d.ws) AS n_tokens, "
            "coalesce(p.n_windows, 0) AS n_windows, "
            "CAST(coalesce(p.dup_windows, 0) AS BIGINT) AS dup_windows, "
            "ROUND(coalesce(CAST(p.dup_windows AS DOUBLE) / nullif(p.n_windows, 0), 0.0), 6) AS dup_frac "
            "FROM d LEFT JOIN per_doc p USING (doc_id)"
        ),
        # exact_substr_trim: full replay of the removal policy —
        # row_number picks the canonical (first) occurrence per dup hash,
        # window functions merge cut ranges into islands, a positional
        # anti-join rebuilds the kept token stream
        "exact_substr_trim": (
            "WITH corpus AS (SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0), "
            f"d AS (SELECT doc_id, list_filter(string_split({norm}, ' '), w -> w <> '') AS ws "
            "FROM corpus), "
            "spans AS (SELECT doc_id, i - 1 AS pos, "
            "md5(array_to_string(ws[i:i+9], ' ')) AS h "
            "FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) - 8)) AS i) t "
            "WHERE len(ws) >= 10), "
            "agg AS (SELECT h, COUNT(*) AS c FROM spans GROUP BY h), "
            "ranked AS (SELECT s.doc_id, s.pos, s.h, a.c, "
            "row_number() OVER (PARTITION BY s.h ORDER BY s.doc_id, s.pos) AS rn "
            "FROM spans s JOIN agg a USING (h) WHERE a.c >= 2), "
            "cuts AS (SELECT doc_id, pos AS s, pos + 10 AS e FROM ranked WHERE rn > 1), "
            "flags AS (SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER ("
            "PARTITION BY doc_id ORDER BY s, e "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS f "
            "FROM cuts), "
            "isl AS (SELECT doc_id, s, e, SUM(f) OVER (PARTITION BY doc_id ORDER BY s, e "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM flags), "
            "merged AS (SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e "
            "FROM isl GROUP BY doc_id, island), "
            "toks AS (SELECT doc_id, ws[i] AS w, i - 1 AS pos "
            "FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t), "
            "kept AS (SELECT t.doc_id, t.w, t.pos FROM toks t LEFT JOIN merged m "
            "ON t.doc_id = m.doc_id AND t.pos >= m.s AND t.pos < m.e WHERE m.s IS NULL), "
            "rebuilt AS (SELECT doc_id, COUNT(*) AS kept_tokens, "
            "string_agg(w, ' ' ORDER BY pos) AS trimmed_text FROM kept GROUP BY doc_id), "
            "ncut AS (SELECT doc_id, COUNT(*) AS n_cut_spans FROM merged GROUP BY doc_id) "
            "SELECT d.doc_id, len(d.ws) AS n_tokens, "
            "coalesce(r.kept_tokens, 0) AS kept_tokens, "
            "coalesce(nc.n_cut_spans, 0) AS n_cut_spans, "
            "coalesce(r.trimmed_text, '') AS trimmed_text "
            "FROM d LEFT JOIN rebuilt r USING (doc_id) LEFT JOIN ncut nc USING (doc_id)"
        ),
        # nb_quality_classifier: closed-form NB replayed end-to-end —
        # token counts per seed class, Laplace-smoothed ln-ratio, class
        # prior from doc counts, per-doc LLR sum rounded to 6
        "nb_quality_classifier": (
            "WITH toks AS (SELECT doc_id, lang, "
            f"unnest(list_filter(string_split({norm}, ' '), w -> w <> '')) AS w "
            "FROM documents), "
            "model AS (SELECT w, "
            "SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp, "
            "SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS cn "
            "FROM toks WHERE lang IN ('en', 'de') GROUP BY w), "
            "tot AS (SELECT SUM(cp) AS tp, SUM(cn) AS tn, COUNT(*) AS v FROM model), "
            "pri AS (SELECT ln(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE) "
            "- ln(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE) AS prior "
            "FROM documents), "
            "scored AS (SELECT t.doc_id, COUNT(*) AS n_tokens, "
            "SUM(CASE WHEN m.w IS NULL "
            "THEN ln(1.0 / (tot.tp + tot.v)) - ln(1.0 / (tot.tn + tot.v)) "
            "ELSE ln((m.cp + 1.0) / (tot.tp + tot.v)) - ln((m.cn + 1.0) / (tot.tn + tot.v)) "
            "END) AS s "
            "FROM toks t LEFT JOIN model m USING (w) CROSS JOIN tot GROUP BY t.doc_id) "
            "SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens, "
            "ROUND(coalesce(sc.s, 0.0) + pri.prior, 6) AS score, "
            "CASE WHEN coalesce(sc.s, 0.0) + pri.prior > 0 THEN 'en' ELSE 'de' END AS pred "
            "FROM documents d CROSS JOIN pri LEFT JOIN scored sc USING (doc_id)"
        ),
        # leakage_safe_split: the dedup_clusters recursive-CTE component
        # derivation + Knuth bucket arithmetic on the component id
        "leakage_safe_split": (
            "WITH RECURSIVE docs3 AS (SELECT doc_id, text FROM documents WHERE doc_id < 60 "
            "UNION ALL SELECT doc_id + 1000000, text || '   ' FROM documents "
            "WHERE doc_id < 60 AND doc_id % 10 = 0 "
            "UNION ALL SELECT doc_id + 2000000, ' ' || text FROM documents "
            "WHERE doc_id < 60 AND doc_id % 10 = 0), "
            "ws AS (SELECT doc_id, list_distinct(string_split("
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w FROM docs3), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM ws a JOIN ws b "
            "ON a.doc_id < b.doc_id WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) "
            "/ len(list_distinct(list_concat(a.w, b.w))) >= 0.7), "
            "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs), "
            "reach AS (SELECT src AS id, src AS lbl FROM edges "
            "UNION SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id), "
            "comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id) "
            "SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, "
            "CASE WHEN ((COALESCE(c.component, d.doc_id) * 2654435761) % 4294967296) "
            "/ 4294967296.0 < 0.8 THEN 'train' ELSE 'test' END AS split "
            "FROM docs3 d LEFT JOIN comp c ON c.id = d.doc_id"
        ),
        # span_decontaminate: benchmark window hashes from the first 12
        # tokens of every 13th doc; every corpus occurrence cut, same
        # islands/rebuild replay as exact_substr_trim
        "span_decontaminate": (
            f"WITH d AS (SELECT doc_id, list_filter(string_split({norm}, ' '), w -> w <> '') AS ws "
            "FROM documents), "
            "b AS (SELECT ws[1:12] AS bs FROM d WHERE doc_id % 13 = 0), "
            "bh AS (SELECT DISTINCT md5(array_to_string(bs[i:i+9], ' ')) AS h "
            "FROM b CROSS JOIN LATERAL (SELECT unnest(range(1, len(bs) - 8)) AS i) t "
            "WHERE len(bs) >= 10), "
            "spans AS (SELECT doc_id, i - 1 AS pos, "
            "md5(array_to_string(ws[i:i+9], ' ')) AS h "
            "FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) - 8)) AS i) t "
            "WHERE len(ws) >= 10), "
            "cuts AS (SELECT s.doc_id, s.pos AS s, s.pos + 10 AS e "
            "FROM spans s JOIN bh USING (h)), "
            "flags AS (SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER ("
            "PARTITION BY doc_id ORDER BY s, e "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS f "
            "FROM cuts), "
            "isl AS (SELECT doc_id, s, e, SUM(f) OVER (PARTITION BY doc_id ORDER BY s, e "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM flags), "
            "merged AS (SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e "
            "FROM isl GROUP BY doc_id, island), "
            "toks AS (SELECT doc_id, ws[i] AS w, i - 1 AS pos "
            "FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t), "
            "kept AS (SELECT t.doc_id, t.w, t.pos FROM toks t LEFT JOIN merged m "
            "ON t.doc_id = m.doc_id AND t.pos >= m.s AND t.pos < m.e WHERE m.s IS NULL), "
            "rebuilt AS (SELECT doc_id, COUNT(*) AS kept_tokens, "
            "string_agg(w, ' ' ORDER BY pos) AS trimmed_text FROM kept GROUP BY doc_id), "
            "ncut AS (SELECT doc_id, COUNT(*) AS n_cut_spans FROM merged GROUP BY doc_id) "
            "SELECT d.doc_id, len(d.ws) AS n_tokens, "
            "coalesce(r.kept_tokens, 0) AS kept_tokens, "
            "coalesce(nc.n_cut_spans, 0) AS n_cut_spans, "
            "coalesce(r.trimmed_text, '') AS trimmed_text "
            "FROM d LEFT JOIN rebuilt r USING (doc_id) LEFT JOIN ncut nc USING (doc_id)"
        ),
        # token_budget_select: two-phase in Spark (under-budget bypass +
        # over-budget prefix window) but semantically ONE window — the
        # oracle replays the plain form
        "token_budget_select": (
            "WITH pre AS (SELECT doc_id, lang, n_chars, "
            "coalesce(SUM(n_chars) OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC, doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before "
            "FROM documents) "
            "SELECT doc_id, lang, n_chars FROM pre "
            "WHERE before < CASE lang WHEN 'en' THEN 20000 ELSE 8000 END"
        ),
        # shuffle_shards: md5-prefix shard + full-digest intra-shard rank,
        # replayed verbatim
        "shuffle_shards": (
            "WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR || ':r6') AS hh "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST((('0x' || substr(hh, 1, 8))::BIGINT % 8) AS INT) AS shard, "
            "row_number() OVER (PARTITION BY ('0x' || substr(hh, 1, 8))::BIGINT % 8 "
            "ORDER BY hh, doc_id) - 1 AS pos "
            "FROM h"
        ),
        "prom_pages_roundtrip": (
            "SELECT 'fbs_events_total' AS metric_name, "
            "'counter' AS metric_type, event_type, "
            "CAST(COUNT(*) AS DOUBLE) AS value FROM events GROUP BY event_type"
        ),
        "similarity_pq_join": (
            "SELECT query_id, CAST(5 AS BIGINT) AS n_returned, TRUE AS self_found, "
            "TRUE AS recall_ok FROM (VALUES (0), (1), (2)) t(query_id)"
        ),
        "bpe_roundtrip": (
            "SELECT doc_id, TRUE AS roundtrip_ok, TRUE AS tokens_bounded "
            "FROM documents"
        ),
        "doc_fingerprint": f"SELECT doc_id, md5({norm}) AS fp FROM documents",
        "pii_redaction": (
            "SELECT event_id, regexp_replace(regexp_replace("
            "'contact u' || user_id || '@example.com or 10.0.' || (user_id % 256) || '.' || (event_id % 256), "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[REDACTED:email]', 'g'), "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[REDACTED:ipv4]', 'g') AS redacted FROM events"
        ),
        # html_extract: expectations derived from the SOURCE columns the
        # HTML was templated from — independent of the extraction regexes
        "html_extract": (
            "SELECT doc_id, "
            "'Doc ' || doc_id || ' & more' AS title, "
            f"trim(regexp_replace(text, '\\s+', ' ', 'g')) || ' x y' AS body, "
            "2 AS n_links FROM documents"
        ),
        # pack_sequences: the char-tokenizer stream rebuilt with string
        # surgery, then mapped to ids via an INDEPENDENTLY derived
        # vocabulary (distinct chars, binary sort) — seq id-stream hashes
        # + doc-start slots replay exactly
        "pack_sequences": (
            f"WITH d AS (SELECT doc_id, CASE WHEN trim({norm}) = '' THEN '' "
            f"ELSE replace({norm}, ' ', chr(30)) || chr(30) END AS s FROM documents), "
            "o AS (SELECT doc_id, s, CAST(coalesce(SUM(length(s)) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off "
            "FROM d), "
            "stream AS (SELECT string_agg(s, '' ORDER BY doc_id) AS st FROM d), "
            "vocab AS (SELECT ch, row_number() OVER (ORDER BY ch) - 1 AS id "
            "FROM (SELECT DISTINCT unnest(string_split(st, '')) AS ch FROM stream)), "
            "tot AS (SELECT length(st) // 256 AS nseq FROM stream), "
            "seqs AS (SELECT k AS seq_id, substr(stream.st, k * 256 + 1, 256) AS sq "
            "FROM stream CROSS JOIN tot "
            "CROSS JOIN (SELECT unnest(range(0, (SELECT nseq FROM tot))) AS k) t), "
            "pos AS (SELECT unnest(range(1, 257)) AS p), "
            "mapped AS (SELECT s.seq_id, pos.p, v.id FROM seqs s CROSS JOIN pos "
            "JOIN vocab v ON v.ch = substr(s.sq, pos.p, 1)), "
            "hashes AS (SELECT seq_id, md5(string_agg(id::VARCHAR, ',' ORDER BY p)) "
            "AS seq_hash FROM mapped GROUP BY seq_id), "
            "starts AS (SELECT off // 256 AS seq_id, off % 256 AS slot "
            "FROM o WHERE length(s) > 0), "
            "st2 AS (SELECT seq_id, array_to_string(array_agg(slot ORDER BY slot), ',') "
            "AS doc_starts FROM starts GROUP BY seq_id) "
            "SELECT h.seq_id, 256 AS n_tokens, h.seq_hash, "
            "coalesce(st2.doc_starts, '') AS doc_starts "
            "FROM hashes h LEFT JOIN st2 USING (seq_id)"
        ),
        # stratified_sample: exact replay of the md5-prefix membership
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "(('0x' || substr(md5(doc_id::VARCHAR || ':strat'), 1, 8))::BIGINT + 0.5) "
            "/ 4294967296.0 < CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 "
            "WHEN 'fr' THEN 0.25 ELSE 0.1 END"
        ),
        # dataset_diff: statuses derived from the construction arithmetic,
        # independent of the hash-compare implementation
        "dataset_diff": (
            "SELECT doc_id, CASE "
            "WHEN doc_id % 7 = 3 THEN 'removed' "
            "WHEN doc_id % 5 = 0 THEN 'modified' "
            "ELSE 'unchanged' END AS status FROM documents "
            "UNION ALL "
            "SELECT doc_id + 90000 AS doc_id, 'added' AS status "
            "FROM documents WHERE doc_id % 11 = 0"
        ),
        # robots_compliance: the surviving set derived from the generating
        # arithmetic (domain regime + longest-match precedence), fully
        # independent of the robots parser and matcher
        "robots_compliance": (
            "SELECT event_id AS doc_id, "
            "'http://d' || (user_id % 10) || '.example/p/' || (event_id % 100) AS url "
            "FROM events "
            "WHERE (user_id % 10) % 3 = 2 "
            "OR ((user_id % 10) % 3 = 1 "
            "AND CAST(event_id % 100 AS VARCHAR) LIKE '1%')"
        ),
        # warc_wet: WARC->WET chain replayed from the template's source
        # columns, independent of both parsers
        "warc_wet": (
            "SELECT doc_id, 'response' AS warc_type, "
            "'http://site' || (doc_id % 20) || '.example/p/' || doc_id AS target_uri, "
            "200 AS http_status, 'text/html' AS content_type, "
            "trim(regexp_replace(text, '\\s+', ' ', 'g')) AS page_text "
            "FROM documents"
        ),
        # pagerank_nodes: 10 power iterations in one recursive CTE; the
        # base literal is the Python-double value of (1-0.85)/N's numerator
        # so both engines run identical float arithmetic
        "pagerank_nodes": (
            "WITH RECURSIVE raw AS (SELECT DISTINCT user_id % 40 AS src, "
            "(user_id + event_id) % 40 AS dst FROM events "
            "WHERE user_id % 40 <> (user_id + event_id) % 40), "
            "nodes AS (SELECT DISTINCT n FROM "
            "(SELECT src AS n FROM raw UNION SELECT dst FROM raw) u), "
            "deg AS (SELECT src, COUNT(*) AS d FROM raw GROUP BY src), "
            "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes), "
            "e2 AS (SELECT src, dst, FALSE AS selfed FROM raw "
            "UNION ALL SELECT n, n, TRUE FROM nodes), "
            "pr(it, node, rank) AS ("
            "SELECT 0, nodes.n, 1.0 / nn.n FROM nodes CROSS JOIN nn "
            "UNION ALL "
            f"SELECT p.it + 1, e2.dst, {1 - 0.85!r} / nn.n "
            "+ 0.85 * SUM(CASE WHEN e2.selfed THEN 0 "
            "ELSE p.rank / deg.d END) "
            "FROM pr p JOIN e2 ON e2.src = p.node "
            "LEFT JOIN deg ON deg.src = e2.src CROSS JOIN nn "
            "WHERE p.it < 10 GROUP BY p.it + 1, e2.dst, nn.n) "
            "SELECT node, ROUND(rank, 6) AS rank FROM pr WHERE it = 10"
        ),
        # triangle_count: brute-force a<b<c closed-wedge enumeration on
        # the canonical edge list, exploded back to per-node counts —
        # independent of the Spark side's degree orientation
        "triangle_count": (
            "WITH raw AS (SELECT DISTINCT "
            "LEAST(user_id % 80, (user_id * 7 + event_id) % 80) AS a, "
            "GREATEST(user_id % 80, (user_id * 7 + event_id) % 80) AS b "
            "FROM events WHERE user_id % 80 <> (user_id * 7 + event_id) % 80), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM raw e1 JOIN raw e2 ON e2.a = e1.b "
            "JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "pern AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS t FROM ("
            "SELECT x AS n FROM tri UNION ALL SELECT y FROM tri "
            "UNION ALL SELECT z FROM tri) u GROUP BY n), "
            "nodes AS (SELECT DISTINCT n FROM "
            "(SELECT a AS n FROM raw UNION SELECT b FROM raw) v) "
            "SELECT nodes.n AS node, COALESCE(pern.t, 0) AS triangles "
            "FROM nodes LEFT JOIN pern ON pern.n = nodes.n"
        ),
        # skew_profile: counts/shares + summary rows, same (rows desc,
        # key) tie-break and 6-decimal share grid
        "skew_profile": (
            "WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS k, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1), "
            "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, "
            "CAST(COUNT(*) AS BIGINT) AS nkeys, "
            "CAST(MAX(cnt) AS BIGINT) AS maxc FROM c) "
            "SELECT * FROM ("
            "SELECT 'key' AS kind, k AS key, cnt AS rows, "
            "ROUND(cnt / (SELECT CAST(total AS DOUBLE) FROM t), 6) AS share, "
            "CAST(NULL AS DOUBLE) AS value "
            "FROM c ORDER BY cnt DESC, k LIMIT 10"
            ") UNION ALL SELECT 'total_rows', NULL, total, 1.0, NULL FROM t "
            "UNION ALL SELECT 'distinct_keys', NULL, nkeys, NULL, NULL FROM t "
            "UNION ALL SELECT 'max_key_share', NULL, NULL, "
            "ROUND(maxc / CAST(total AS DOUBLE), 6), CAST(maxc AS DOUBLE) FROM t"
        ),
        # heavy_hitters: the two-phase MG + exact-verify operator's
        # CONTRACT is exactly GROUP BY ... HAVING count > n/k
        "heavy_hitters": (
            "WITH keyed AS (SELECT CASE WHEN user_id % 10 < 3 "
            "THEN event_type "
            "ELSE event_type || '_' || CAST(user_id AS VARCHAR) END AS k "
            "FROM events), "
            "t AS (SELECT COUNT(*) AS n FROM keyed) "
            "SELECT k AS key, CAST(COUNT(*) AS BIGINT) AS count FROM keyed "
            "GROUP BY k HAVING COUNT(*) > (SELECT n / 50.0 FROM t)"
        ),
        # winsorize: identical quantile_cont cuts on the rounded values,
        # stateless clip, shared 6-decimal grid
        "winsorize": (
            "WITH r AS (SELECT o_orderkey, ROUND(o_totalprice, 2) AS op, "
            "CAST(o_totalprice AS DOUBLE) AS vraw, "
            "ROUND(CAST(o_totalprice AS DOUBLE), 6) AS v FROM orders), "
            "q AS (SELECT quantile_cont(v, 0.05) AS lo, "
            "quantile_cont(v, 0.95) AS hi FROM r) "
            # cuts compute on the 6-dec grid (replayable); the CLIP
            # applies to the raw value — in-range rows pass untouched
            "SELECT o_orderkey, op AS o_totalprice, "
            "ROUND(LEAST(GREATEST(vraw, q.lo), q.hi), 6) AS clipped "
            "FROM r CROSS JOIN q"
        ),
        # table_profile: exact fields replayed; the HLL estimate is an
        # in-query invariant vs exact distinct -> literal truth column
        "table_profile": (
            "SELECT \"column\", n_rows, n_nulls, min_value, max_value, TRUE AS distinct_ok "
            "FROM (VALUES "
            "('event_id', (SELECT COUNT(*) FROM events), "
            "(SELECT COUNT(*) FROM events WHERE event_id IS NULL), "
            "(SELECT CAST(MIN(event_id) AS VARCHAR) FROM events), "
            "(SELECT CAST(MAX(event_id) AS VARCHAR) FROM events)), "
            "('event_type', (SELECT COUNT(*) FROM events), "
            "(SELECT COUNT(*) FROM events WHERE event_type IS NULL), "
            "(SELECT CAST(MIN(event_type) AS VARCHAR) FROM events), "
            "(SELECT CAST(MAX(event_type) AS VARCHAR) FROM events)), "
            "('user_id', (SELECT COUNT(*) FROM events), "
            "(SELECT COUNT(*) FROM events WHERE user_id IS NULL), "
            "(SELECT CAST(MIN(user_id) AS VARCHAR) FROM events), "
            "(SELECT CAST(MAX(user_id) AS VARCHAR) FROM events)), "
            "('value', (SELECT COUNT(*) FROM events), "
            "(SELECT COUNT(*) FROM events WHERE value IS NULL), "
            "(SELECT CAST(MIN(value) AS VARCHAR) FROM events), "
            "(SELECT CAST(MAX(value) AS VARCHAR) FROM events))"
            ") t(\"column\", n_rows, n_nulls, min_value, max_value)"
        ),
        # media_resize_grid: structural replay — 64x48 PNG targets parsed
        # back by the real header sniffer, 16px grid = 4x3 fixed patches
        "media_resize_grid": (
            "SELECT doc_id AS media_id, 'png' AS format, 64 AS width, 48 AS height, "
            "pr AS patch_row, pc AS patch_col, pc * 16 AS x0, pr * 16 AS y0 "
            "FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 3)) AS pr) r "
            "CROSS JOIN (SELECT unnest(range(0, 4)) AS pc) c"
        ),
        "multimodal_metadata": (
            "SELECT doc_id AS media_id, 'image' AS kind, "
            "CAST(octet_length(encode(text)) AS INT) AS n_bytes, "
            "CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width, "
            "CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height, "
            "CAST((octet_length(encode(text)) * 7) % 10000 AS INT) AS fake_duration_ms, "
            "sha256(text) AS sha FROM documents"
        ),
        "image_neardup": (
            "SELECT vec_id, TRUE AS found, TRUE AS pair_witnessed, "
            "vec_id % 50 = 0 AS jpeg_found, "
            "vec_id % 50 = 0 AS jpeg_pair_witnessed, "
            "vec_id % 75 = 0 AS png_found, "
            "vec_id % 75 = 0 AS png_pair_witnessed, "
            "vec_id % 100 = 0 AS gif_found, "
            "vec_id % 100 = 0 AS gif_pair_witnessed, "
            "vec_id % 125 = 0 AS prog_found, "
            "vec_id % 125 = 0 AS prog_pair_witnessed, "
            "TRUE AS all_pairs_witnessed FROM embeddings WHERE vec_id % 25 = 0"
        ),
        "audio_neardup": (
            "SELECT vec_id, TRUE AS found, TRUE AS pair_witnessed, "
            "TRUE AS all_pairs_witnessed FROM embeddings WHERE vec_id % 25 = 0"
        ),
        "video_headers": (
            "SELECT doc_id AS media_id, 'avi' AS container, 'DIB' AS codec, "
            "CAST(8 + doc_id % 4 AS INT) AS width, 8 AS height, "
            "CAST(2 + doc_id % 3 AS INT) AS n_frames, "
            "CAST((10 + doc_id % 15) * 1000 AS BIGINT) AS fps_x1000, "
            "CAST((2 + doc_id % 3) * 1000 // (10 + doc_id % 15) AS BIGINT) "
            "AS duration_ms FROM documents "
            "UNION ALL "
            "SELECT doc_id + 1000000, 'mp4', 'mp4v', "
            "CAST(16 + doc_id % 8 AS INT), 16, "
            "CAST(3 + doc_id % 4 AS INT), "
            "CAST((3 + doc_id % 4) * 1000000 // "
            "((3 + doc_id % 4) * (20 + doc_id % 5) * 1000 "
            "// (600 * (1 + doc_id % 3))) AS BIGINT), "
            "CAST((3 + doc_id % 4) * (20 + doc_id % 5) * 1000 "
            "// (600 * (1 + doc_id % 3)) AS BIGINT) FROM documents"
        ),
        "video_frame_plan": (
            "WITH base AS (SELECT doc_id, (4 + doc_id % 3) // 2 AS half, "
            "30 + (doc_id % 3) * 10 AS d1, i "
            "FROM documents CROSS JOIN (SELECT unnest(range(0, 6)) AS i) gi "
            "WHERE i < 4 + doc_id % 3), "
            "r AS (SELECT doc_id, i, "
            "LEAST(i, half) * d1 + GREATEST(i - half, 0) * 2 * d1 "
            "+ ((doc_id + i) % 2) * 10 AS ts_ms, "
            "50 + ((doc_id + i) % 7) * 10 AS sz, i % 2 = 0 AS keyframe "
            "FROM base) "
            "SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx, "
            "CAST(ts_ms AS BIGINT) AS ts_ms, CAST(sz AS INT) AS sample_size, "
            "CAST(COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
            "AS rel_offset, keyframe, "
            "COALESCE(ts_ms // 100 > LAG(ts_ms // 100) OVER "
            "(PARTITION BY doc_id ORDER BY i), TRUE) AS selected FROM r"
        ),
        "video_scene_sample": (
            "WITH base AS (SELECT doc_id, 2 + doc_id % 3 AS L, i "
            "FROM documents CROSS JOIN (SELECT unnest(range(0, 12)) AS i) gi "
            "WHERE i < 3 * (2 + doc_id % 3)) "
            "SELECT doc_id AS media_id, CAST(i // L AS INT) AS scene_idx, "
            "CAST((i // L) * L * 100 AS BIGINT) AS scene_start_ms, "
            "CAST(i AS INT) AS frame_idx, CAST(i * 100 AS BIGINT) AS ts_ms, "
            "i % L = 0 AS selected FROM base"
        ),
        "mkv_headers": (
            "SELECT doc_id AS media_id, 'matroska' AS container, "
            "'V_UNCOMPRESSED' AS codec, CAST(8 + doc_id % 4 AS INT) AS width, "
            "8 AS height, CAST(100 * (2 + doc_id % 5) AS BIGINT) AS duration_ms "
            "FROM documents "
            "UNION ALL "
            "SELECT doc_id + 1000000, 'webm', 'V_VP9', "
            "CAST(320 + doc_id % 16 AS INT), CAST(180 + doc_id % 9 AS INT), "
            "CAST(1000 + doc_id % 7 * 250 AS BIGINT) FROM documents"
        ),
        "tar_shard_roundtrip": (
            "SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS key, 'txt' AS ext, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "md5(text) AS content_md5 FROM documents "
            "UNION ALL "
            "SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0'), 'cls', "
            "CAST(octet_length(encode(CAST(doc_id % 10 AS VARCHAR))) AS BIGINT), "
            "md5(CAST(doc_id % 10 AS VARCHAR)) FROM documents"
        ),
        "exif_orientation": (
            "WITH px AS (SELECT doc_id, i, "
            "chr(CAST(32 + (doc_id * 31 + 17 * (((i // 72) // 8) * 9 "
            "+ (i % 72) // 8)) % 96 AS INT)) AS ch "
            "FROM documents CROSS JOIN "
            "(SELECT unnest(range(0, 4608)) AS i) gi) "
            "SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS orientation, "
            "72 AS width, 64 AS height, "
            "md5(string_agg(ch, '' ORDER BY i)) AS pixels_md5 "
            "FROM px GROUP BY doc_id"
        ),
        "fmp4_frame_plan": (
            "WITH f AS (SELECT doc_id, g FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 5)) AS g) gg) "
            "SELECT doc_id AS media_id, CAST(g AS INT) AS frame_idx, "
            "CAST(g * (40 + 10 * (doc_id % 3)) AS BIGINT) AS ts_ms, "
            "CAST(8 + (doc_id + g) % 5 AS BIGINT) AS size, "
            "md5(repeat(chr(CAST(65 + g % 26 AS INT)), "
            "CAST(8 + (doc_id + g) % 5 AS INT))) AS payload_md5, "
            "g % 2 = 0 AS keyframe FROM f"
        ),
        # ts = g*delta + ctts lift 100 - elst media_time (leading empty
        # edit on odd doc_ids must be SKIPPED, or every odd row's ts
        # gains the media_time back and hash-fails); ranges are the
        # cumulative sizes, untouched by the edit list
        "elst_frame_plan": (
            "WITH f AS (SELECT doc_id, 40 + 10 * (doc_id % 3) AS delta, "
            "25 + 5 * (doc_id % 4) AS m, g FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 6)) AS g) gg) "
            "SELECT doc_id AS media_id, CAST(g AS INT) AS frame_idx, "
            "CAST(g * delta + 100 - m AS BIGINT) AS ts_ms, "
            "CAST(20 + (doc_id + g) % 7 AS BIGINT) AS size, "
            "CAST(COALESCE(SUM(20 + (doc_id + g) % 7) OVER "
            "(PARTITION BY doc_id ORDER BY g "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS rel_offset, "
            "g IN (0, 3) AS keyframe FROM f"
        ),
        # the nav block is a constant; each paragraph's text, counts,
        # density, and label restate from (doc_id+g)%3 arithmetic
        "boilerplate_blocks": (
            "WITH p AS (SELECT doc_id, g, "
            "5 + ((doc_id + g) % 3) * 5 AS n FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 4)) AS g) gg), "
            "t AS (SELECT doc_id, g, n, x.text FROM p CROSS JOIN LATERAL "
            "(SELECT string_agg('t' || doc_id || '_' || g || '_' || i, "
            "' ' ORDER BY i) AS text "
            "FROM unnest(range(0, n)) AS tt(i)) x) "
            "SELECT doc_id, 1 AS block_idx, "
            "'nav go go go menu' AS text, 5 AS n_tokens, 3 AS n_links, "
            "0.6 AS link_density, 'boilerplate' AS label FROM documents "
            "UNION ALL SELECT doc_id, CAST(g + 2 AS INT), text, "
            "CAST(n AS INT), 0, 0.0, "
            "CASE WHEN n < 10 THEN 'short' ELSE 'good' END FROM t"
        ),
        # pure header arithmetic: frame length 144*br/sr + padding bit,
        # 1152 samples/frame timestamps, offsets cumulative past the
        # 26-byte ID3v2 tag on even doc_ids; payload filler restated
        "mp3_frame_plan": (
            "WITH f AS (SELECT doc_id, "
            "CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 "
            "ELSE 32000 END AS sr, "
            "CASE doc_id % 4 WHEN 0 THEN 96 WHEN 1 THEN 128 "
            "WHEN 2 THEN 160 ELSE 192 END AS br, g FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 5)) AS g) gg), "
            "s AS (SELECT doc_id, g, sr, "
            "144 * br * 1000 // sr + (((doc_id % 32) >> g) & 1) AS size "
            "FROM f) "
            "SELECT doc_id AS media_id, CAST(g AS INT) AS frame_idx, "
            "CAST(g * 1152 * 1000 // sr AS BIGINT) AS ts_ms, "
            "CAST(size AS BIGINT) AS size, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 26 ELSE 0 END "
            "+ COALESCE(SUM(size) OVER (PARTITION BY doc_id ORDER BY g "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS offset, "
            "md5(repeat(chr(CAST(65 + g % 26 AS INT)), "
            "CAST(size - 4 AS INT))) AS payload_md5 FROM s"
        ),
        # video-only arithmetic: the muxed file's audio trafs/samples
        # must vanish from the plan; video filler is uppercase
        # chr(65+g), audio lowercase, so absorbing audio hash-fails
        "fmp4_multitrack_plan": (
            "WITH f AS (SELECT doc_id, g FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 5)) AS g) gg) "
            "SELECT doc_id AS media_id, CAST(g AS INT) AS frame_idx, "
            "CAST(g * (30 + 10 * (doc_id % 4)) AS BIGINT) AS ts_ms, "
            "CAST(9 + (doc_id + 2 * g) % 6 AS BIGINT) AS size, "
            "md5(repeat(chr(CAST(65 + g % 26 AS INT)), "
            "CAST(9 + (doc_id + 2 * g) % 6 AS INT))) AS payload_md5, "
            "g % 3 = 0 AS keyframe FROM f"
        ),
        # the muxed segment's AUDIO track: 4 samples of 21-unit duration,
        # sizes 6+(doc_id+g)%4, lowercase filler chr(97+g) — reading any
        # video byte (uppercase) or a wrong shared-mdat offset hash-fails
        "fmp4_audio_track_plan": (
            "WITH f AS (SELECT doc_id, g FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 4)) AS g) gg) "
            "SELECT doc_id AS media_id, CAST(g AS INT) AS frame_idx, "
            "CAST(g * 21 AS BIGINT) AS ts_ms, "
            "CAST(6 + (doc_id + g) % 4 AS BIGINT) AS size, "
            "md5(repeat(chr(CAST(97 + g % 26 AS INT)), "
            "CAST(6 + (doc_id + g) % 4 AS INT))) AS payload_md5, "
            "TRUE AS keyframe FROM f"
        ),
        # ADTS: frame length is the 13-bit header field (7- or 9-byte
        # header per the CRC bit), ts = 1024 samples/frame over the
        # sfi-table rate, offsets cumulative past the 24-byte ID3v2 tag
        # on even doc_ids; payload filler restated
        "aac_frame_plan": (
            "WITH f AS (SELECT doc_id, "
            "CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000 "
            "WHEN 2 THEN 32000 ELSE 22050 END AS sr, g FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 6)) AS g) gg), "
            "s AS (SELECT doc_id, g, sr, "
            "50 + (doc_id + g) % 9 AS psize, "
            "7 + 2 * (((doc_id % 64) >> g) & 1) "
            "+ 50 + (doc_id + g) % 9 AS size FROM f) "
            "SELECT doc_id AS media_id, CAST(g AS INT) AS frame_idx, "
            "CAST(g * 1024 * 1000 // sr AS BIGINT) AS ts_ms, "
            "CAST(size AS BIGINT) AS size, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 0 END "
            "+ COALESCE(SUM(size) OVER (PARTITION BY doc_id ORDER BY g "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS offset, "
            "md5(repeat(chr(CAST(65 + g % 26 AS INT)), "
            "CAST(psize AS INT))) AS payload_md5 FROM s"
        ),
        # both the context-free class and the revised label restated
        # from the planted 10-block pattern: slot 4 is near_good on
        # even docs (bridging slot 3's short to good) and a nav on odd
        # (pinning both to boilerplate); slot 9's near_good sits
        # between navs and absorbs into boilerplate
        "boilerplate_context": (
            "WITH m AS (SELECT * FROM (VALUES "
            "(1, 'nav', 5), (2, 'para', 20), (3, 'para', 3), "
            "(4, 'mix', 12), (5, 'nav', 5), (6, 'para', 20), "
            "(7, 'para', 12), (8, 'nav', 5), (9, 'para', 12), "
            "(10, 'nav', 5)) AS t(blk, kind, n)) "
            "SELECT d.doc_id, CAST(m.blk AS INT) AS block_idx, "
            "CAST(CASE WHEN m.kind = 'mix' AND d.doc_id % 2 = 1 "
            "THEN 5 ELSE m.n END AS INT) AS n_tokens, "
            "CASE WHEN m.kind = 'nav' "
            "OR (m.kind = 'mix' AND d.doc_id % 2 = 1) THEN 'boilerplate' "
            "WHEN m.n >= 15 THEN 'good' "
            "WHEN m.n >= 10 THEN 'near_good' ELSE 'short' END AS cf_label, "
            "CASE m.blk WHEN 2 THEN 'good' WHEN 6 THEN 'good' "
            "WHEN 7 THEN 'good' "
            "WHEN 3 THEN CASE WHEN d.doc_id % 2 = 0 THEN 'good' "
            "ELSE 'boilerplate' END "
            "WHEN 4 THEN CASE WHEN d.doc_id % 2 = 0 THEN 'good' "
            "ELSE 'boilerplate' END "
            "ELSE 'boilerplate' END AS label "
            "FROM documents d CROSS JOIN m"
        ),
        # timestamps restated ARITHMETICALLY (base + doc_id*7%600 s +
        # 250 ms on every 3rd doc) — the Spark side must parse the
        # Z / +00:00 / fractional WARC-Date spellings to match
        "warc_fetch_windows": (
            "WITH f AS (SELECT doc_id, "
            "TIMESTAMP '2024-05-01 10:00:00' "
            "+ INTERVAL ((doc_id * 7) % 600) SECOND "
            "+ CASE WHEN doc_id % 3 = 0 THEN INTERVAL 250 MILLISECOND "
            "ELSE INTERVAL 0 MILLISECOND END AS ts FROM documents) "
            "SELECT time_bucket(INTERVAL '1 minute', ts) AS w, "
            "COUNT(*) AS fetches, "
            "COUNT(DISTINCT 'https://crawl.example/d' || doc_id) AS uris, "
            "MAX(ts) AS last_fetch FROM f GROUP BY 1"
        ),
        "warc_gz_roundtrip": (
            "SELECT doc_id, 0 AS record_idx, 'response' AS warc_type, "
            "'https://ex.com/d' || doc_id || '/0' AS target_uri, "
            "CAST(CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 404 "
            "ELSE 301 END AS INT) AS http_status, "
            "'text/html' AS content_type, "
            "'<html><p>doc ' || doc_id || ' body</p></html>' AS body "
            "FROM documents "
            "UNION ALL SELECT doc_id, 1, 'request', "
            "'https://ex.com/d' || doc_id || '/0', CAST(NULL AS INT), "
            "CAST(NULL AS VARCHAR), 'GET /d' || doc_id FROM documents "
            "UNION ALL SELECT doc_id, 2, 'response', "
            "'https://ex.com/d' || doc_id || '/2', 500, 'text/plain', "
            "'plain ' || doc_id FROM documents"
        ),
        "mojibake_repair": (
            "SELECT doc_id, text || ' café № Ω — ₤5 “quoted” 日本語' AS text "
            "FROM documents"
        ),
        "media_sniff_extended": (
            "SELECT doc_id AS media_id, 'webp' AS format, "
            "CAST(16 + doc_id % 600 AS INT) AS width, "
            "CAST(16 + doc_id % 400 AS INT) AS height, "
            "CAST(3 AS INT) AS channels, CAST(8 AS INT) AS bit_depth, "
            "CAST(NULL AS INT) AS sample_rate, "
            "CAST(NULL AS INT) AS duration_ms FROM documents "
            "UNION ALL SELECT doc_id + 1000000, 'flac', NULL, NULL, "
            "CAST(1 + doc_id % 2 AS INT), CAST(16 + (doc_id % 2) * 8 AS INT), "
            "CAST(8000 + (doc_id % 5) * 4000 AS INT), "
            "CAST((1 + doc_id % 4) * 1000 AS INT) FROM documents "
            "UNION ALL SELECT doc_id + 2000000, 'mp3', NULL, NULL, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT), NULL, "
            "CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 "
            "ELSE 32000 END AS INT), NULL FROM documents "
            "UNION ALL SELECT doc_id + 3000000, 'tiff', "
            "CAST(1 + doc_id % 640 AS INT), CAST(1 + doc_id % 480 AS INT), "
            "CAST(1 + doc_id % 3 AS INT), CAST(8 + (doc_id % 2) * 8 AS INT), "
            "NULL, NULL FROM documents"
        ),
        "adpcm_roundtrip": (
            "SELECT doc_id, CAST(CASE WHEN doc_id % 2 = 0 "
            "THEN 121 * (1 + doc_id % 3) ELSE 65 * (1 + doc_id % 3) END "
            "AS BIGINT) AS n_samples, TRUE AS decode_matches_encoder "
            "FROM documents"
        ),
        "gif_animation": (
            "WITH fr AS (SELECT doc_id, f FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 5)) AS f) g "
            "WHERE f < 3 + doc_id % 3), "
            "base AS (SELECT doc_id, "
            "SUM((doc_id * 31 + i * 17) % 256) AS s0 FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 72)) AS i) gi "
            "GROUP BY doc_id), "
            "delta AS (SELECT doc_id, f, CASE WHEN f = 0 THEN 0 ELSE "
            "(doc_id + 91 * f) % 255 "
            "- (doc_id * 31 + 17 * (2 * (f - 1))) % 256 END AS d_ FROM fr) "
            "SELECT fr.doc_id AS media_id, CAST(fr.f AS INT) AS frame_idx, "
            "CAST(5 * fr.f * (fr.f + 1) AS BIGINT) AS ts_ms, "
            "CAST(10 * (fr.f + 1) AS BIGINT) AS delay_ms, "
            "CAST(s0 + SUM(d_) OVER (PARTITION BY fr.doc_id ORDER BY fr.f) "
            "AS BIGINT) AS px_sum "
            "FROM fr JOIN base ON fr.doc_id = base.doc_id "
            "JOIN delta ON fr.doc_id = delta.doc_id AND fr.f = delta.f"
        ),
        "mkv_frame_plan": (
            "WITH f AS (SELECT doc_id, i FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 6)) AS i) gi "
            "WHERE i < 4 + doc_id % 3), "
            "base AS (SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx, "
            "CAST(i * 400 AS BIGINT) AS ts_ms, "
            "CAST(10 + (doc_id + i) % 5 AS BIGINT) AS size, "
            "md5(repeat(chr(CAST(65 + i AS INT)), "
            "CAST(10 + (doc_id + i) % 5 AS INT))) AS payload_md5, "
            "i % 2 = 0 AS keyframe FROM f), "
            "lf AS (SELECT doc_id, j FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 5)) AS j) gj "
            "WHERE j < 2 + doc_id % 3), "
            "laced AS (SELECT doc_id + 1000000 AS media_id, "
            "CAST(j AS INT) AS frame_idx, "
            "CAST(doc_id * 7 % 30000 AS BIGINT) AS ts_ms, "
            "CAST(CASE WHEN doc_id % 3 = 1 THEN 8 + doc_id % 5 "
            "ELSE 8 + (doc_id + j) % 5 END AS BIGINT) AS size, "
            "md5(repeat(chr(CAST(65 + j AS INT)), "
            "CAST(CASE WHEN doc_id % 3 = 1 THEN 8 + doc_id % 5 "
            "ELSE 8 + (doc_id + j) % 5 END AS INT))) AS payload_md5, "
            "TRUE AS keyframe FROM lf) "
            "SELECT * FROM base UNION ALL SELECT * FROM laced"
        ),
        "caption_coverage": (
            "WITH f AS (SELECT doc_id, i FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 6)) AS i) gi "
            "WHERE i < 4 + doc_id % 3), "
            "m AS (SELECT doc_id, i, i * 100 AS ts, "
            "CASE WHEN i = 0 THEN 0 "
            "WHEN i = 1 AND doc_id % 2 = 1 THEN 0 "
            "WHEN i * 100 >= 200 AND i * 100 < 400 THEN 1 END AS cue "
            "FROM f) "
            "SELECT doc_id AS media_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_frames, "
            "CAST(COUNT(cue) AS BIGINT) AS n_covered, "
            "ROUND(COUNT(cue) * 1.0 / COUNT(*), 6) AS coverage "
            "FROM m GROUP BY doc_id"
        ),
        "caption_frames": (
            "WITH f AS (SELECT doc_id, i FROM documents "
            "CROSS JOIN (SELECT unnest(range(0, 6)) AS i) gi "
            "WHERE i < 4 + doc_id % 3), "
            "m AS (SELECT doc_id, i, i * 100 AS ts, "
            "CASE WHEN i = 0 THEN 0 "
            "WHEN i = 1 AND doc_id % 2 = 1 THEN 0 "
            "WHEN i * 100 >= 200 AND i * 100 < 400 THEN 1 END AS cue "
            "FROM f) "
            "SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx, "
            "CAST(ts AS BIGINT) AS ts_ms, CAST(cue AS INT) AS cue_idx, "
            "'d' || doc_id || ' c' || cue AS caption "
            "FROM m WHERE cue IS NOT NULL"
        ),
        "video_neardup": (
            "SELECT vec_id, TRUE AS found, TRUE AS pair_witnessed, "
            "TRUE AS offset_ok, "
            "vec_id % 50 = 0 AS mjpg_found, "
            "vec_id % 50 = 0 AS mjpg_pair_witnessed, "
            "vec_id % 50 = 0 AS mjpg_offset_ok, "
            "TRUE AS all_pairs_witnessed "
            "FROM embeddings WHERE vec_id % 25 = 0"
        ),
        "attribution": (
            "WITH conv AS (SELECT user_id AS u, epoch_us(ts) AS cts, "
            "SUM(COALESCE(value, 0)) AS cval, CAST(COUNT(*) AS DOUBLE) AS n "
            "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), "
            "touch AS (SELECT user_id AS u, epoch_us(ts) AS tts, event_type AS channel "
            "FROM events WHERE event_type IN ('view', 'click', 'signup')), "
            "j AS (SELECT conv.u, conv.cts, conv.cval, conv.n, touch.tts, touch.channel "
            "FROM conv JOIN touch USING (u) "
            "WHERE tts < cts AND cts - tts <= 259200000000), "
            "direct AS (SELECT '(direct)' AS channel, n AS credit, cval AS val "
            "FROM conv WHERE NOT EXISTS (SELECT 1 FROM j "
            "WHERE j.u = conv.u AND j.cts = conv.cts)), "
            "lastc AS (SELECT channel, n AS credit, cval AS val FROM ("
            "SELECT *, row_number() OVER (PARTITION BY u, cts "
            "ORDER BY tts DESC, channel DESC) AS rn FROM j) WHERE rn = 1 "
            "UNION ALL SELECT * FROM direct), "
            "firstc AS (SELECT channel, n AS credit, cval AS val FROM ("
            "SELECT *, row_number() OVER (PARTITION BY u, cts "
            "ORDER BY tts ASC, channel ASC) AS rn FROM j) WHERE rn = 1 "
            "UNION ALL SELECT * FROM direct), "
            "linc AS (SELECT channel, n / cnt AS credit, cval / cnt AS val FROM ("
            "SELECT *, COUNT(*) OVER (PARTITION BY u, cts) AS cnt FROM j) "
            "UNION ALL SELECT * FROM direct) "
            "SELECT 'last_touch' AS model, channel, ROUND(SUM(credit), 6) AS credit, "
            "ROUND(SUM(val), 6) AS attributed_value FROM lastc GROUP BY channel "
            "UNION ALL SELECT 'first_touch', channel, ROUND(SUM(credit), 6), "
            "ROUND(SUM(val), 6) FROM firstc GROUP BY channel "
            "UNION ALL SELECT 'linear', channel, ROUND(SUM(credit), 6), "
            "ROUND(SUM(val), 6) FROM linc GROUP BY channel"
        ),
        "multimodal_headers": (
            "SELECT doc_id AS media_id, "
            "CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
            "WHEN 2 THEN 'gif' WHEN 3 THEN 'bmp' ELSE 'wav' END AS format, "
            "CAST(CASE WHEN doc_id % 5 <= 3 THEN (doc_id % 640) + 1 END AS INT) AS width, "
            "CAST(CASE WHEN doc_id % 5 <= 3 THEN (doc_id % 480) + 1 END AS INT) AS height, "
            "CAST(CASE WHEN doc_id % 5 IN (0, 1) THEN 3 "
            "WHEN doc_id % 5 = 4 THEN (doc_id % 2) + 1 END AS INT) AS channels, "
            "CAST(CASE doc_id % 5 WHEN 3 THEN 24 WHEN 4 THEN 16 ELSE 8 END AS INT) AS bit_depth, "
            "CAST(CASE WHEN doc_id % 5 = 4 THEN 8000 END AS INT) AS sample_rate, "
            "CAST(CASE WHEN doc_id % 5 = 4 THEN (doc_id % 100) + 1 END AS INT) AS duration_ms "
            "FROM documents"
        ),
        "es_bulk_encode": (
            "SELECT 'logs-' || strftime(ts, '%Y.%m.%d') AS _index, "
            "CAST(event_id AS VARCHAR) AS _id, "
            "to_json({'index': {'_index': 'logs-' || strftime(ts, '%Y.%m.%d'), "
            "'_id': CAST(event_id AS VARCHAR)}}) AS action_line, "
            "to_json({'event_id': event_id, 'event_type': event_type, "
            "'user_id': user_id}) AS doc_line FROM events"
        ),
        "splunk_hec_shape": (
            "SELECT epoch_us(ts) AS time_us, 'spark-host' AS host, "
            "event_type AS source, '_json' AS sourcetype, 'main' AS \"index\", "
            "to_json({'event_id': event_id, 'user_id': user_id}) AS event FROM events"
        ),
        "otlp_logs_roundtrip": (
            "SELECT event_id, event_type AS body, epoch_us(ts) AS time_us, "
            "'events' AS service FROM events"
        ),
        "es_bulk_roundtrip": (
            "SELECT 'index' AS op, 'logs-' || strftime(ts, '%Y.%m.%d') AS es_index, "
            "event_id, event_type, user_id FROM events"
        ),
        "splunk_hec_roundtrip": (
            # decode parses `time` as an IEEE double of epoch seconds; Spark's
            # double->bigint cast truncates, so trunc() explicitly here
            "SELECT CAST(trunc(CAST(epoch_us(ts) AS DOUBLE) / 1000000 * 1000000) "
            "AS BIGINT) AS time_us, "
            "'spark-host' AS host, event_type AS source, '_json' AS sourcetype, "
            "'main' AS \"index\", event_id, user_id FROM events"
        ),
        "ml_inference_scores": (
            # the stub model: sigmoid(dot(embedding, w)), w_i=((i*31)%7-3)/10
            "SELECT vec_id, label, "
            "ROUND(1.0 / (1.0 + exp(-list_dot_product("
            "list_transform(embedding, x -> CAST(x AS DOUBLE)), "
            "list_transform(range(0, len(embedding)), i -> ((i*31) % 7 - 3) / 10.0)))), 6) "
            "AS score, "
            "(1.0 / (1.0 + exp(-list_dot_product("
            "list_transform(embedding, x -> CAST(x AS DOUBLE)), "
            "list_transform(range(0, len(embedding)), i -> ((i*31) % 7 - 3) / 10.0)))) > 0.5) "
            "AS predicted FROM embeddings"
        ),
        "ml_inference_mlp": _mlp_oracle_sql(64, 4),
        "kubernetes_enrich": (
            # independent re-derivation: same tag synthesis, RE2 extraction
            # (vs Spark's java.util.regex), same dimension join
            "WITH logs AS (SELECT event_id, "
            "'kube.var.log.containers.app-' || CAST(event_id % 20 AS VARCHAR) || '_' || "
            "event_type || '_main-' || md5(CAST(event_id AS VARCHAR)) || "
            "md5(CAST(event_id AS VARCHAR) || 'x') || '.log' AS tag FROM events), "
            "ext AS (SELECT event_id, "
            "regexp_extract(substr(tag, 25), '([a-z0-9](?:[-a-z0-9]*[a-z0-9])?"
            "(?:\\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)_([^_]+)_(.+)-([a-z0-9]{64})\\.log$', 1) AS pod_name, "
            "regexp_extract(substr(tag, 25), '([a-z0-9](?:[-a-z0-9]*[a-z0-9])?"
            "(?:\\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)_([^_]+)_(.+)-([a-z0-9]{64})\\.log$', 2) AS namespace, "
            "regexp_extract(substr(tag, 25), '([a-z0-9](?:[-a-z0-9]*[a-z0-9])?"
            "(?:\\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)_([^_]+)_(.+)-([a-z0-9]{64})\\.log$', 3) AS container, "
            "regexp_extract(substr(tag, 25), '([a-z0-9](?:[-a-z0-9]*[a-z0-9])?"
            "(?:\\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)_([^_]+)_(.+)-([a-z0-9]{64})\\.log$', 4) AS docker_id "
            "FROM logs), "
            "pm AS (SELECT DISTINCT event_type AS namespace_name, "
            "'app-' || CAST(event_id % 20 AS VARCHAR) AS pod_name FROM events) "
            "SELECT e.event_id, e.pod_name, e.namespace, e.container, e.docker_id, "
            "'uid-' || p.namespace_name || ':' || p.pod_name AS pod_id, "
            "'node-' || substr(p.pod_name, 5) AS host, "
            "regexp_extract(p.pod_name || '-7bf9dd', "
            "'^(.+)-([bcdfghjklmnpqrstvwxz2456789]{6,10})$', 1) AS workload "
            "FROM ext e LEFT JOIN pm p "
            "ON e.namespace = p.namespace_name AND e.pod_name = p.pod_name"
        ),
        "geoip_enrich": (
            # independent derivation: string_split octet arithmetic + a
            # plain interval join (DuckDB IEJoin) vs Spark's bucketed hash
            "WITH logs AS (SELECT event_id, "
            "'10.' || CAST(user_id % 30 AS VARCHAR) || '.' || "
            "CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) AS ip "
            "FROM events), "
            "ranges AS (SELECT 167772160 + CAST(n_nationkey AS BIGINT) * 65536 AS range_start, "
            "167772160 + CAST(n_nationkey AS BIGINT) * 65536 + 65535 AS range_end, "
            "n_name AS geo_name FROM nation), "
            "ints AS (SELECT event_id, ip, "
            "CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 + "
            "CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 + "
            "CAST(string_split(ip, '.')[3] AS BIGINT) * 256 + "
            "CAST(string_split(ip, '.')[4] AS BIGINT) AS ipint FROM logs) "
            "SELECT i.event_id, i.ip, r.geo_name FROM ints i "
            "LEFT JOIN ranges r ON i.ipint BETWEEN r.range_start AND r.range_end"
        ),
        "msgpack_roundtrip": (
            "SELECT event_id, ts, event_type, user_id FROM events"
        ),
        "loki_push_shape": (
            # independent re-derivation: row_number over the same numeric
            # (ns, line) sort the sink's array_sort applies per stream
            "SELECT event_type AS label_event_type, "
            "CAST(row_number() OVER (PARTITION BY event_type "
            "ORDER BY epoch_us(ts) * 1000, props) - 1 AS BIGINT) AS pos, "
            "CAST(epoch_us(ts) * 1000 AS VARCHAR) AS ts_ns, "
            "props AS line FROM events"
        ),
        "avro_roundtrip": (
            "SELECT event_id, ts, event_type, value FROM events"
        ),
        "text_repetition": (
            "WITH base AS (SELECT doc_id, text, "
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents), "
            "ch AS (SELECT doc_id, length(norm) AS chars FROM base), "
            "lines AS (SELECT doc_id, trim(l) AS line FROM base, "
            "unnest(string_split(text, chr(10))) AS u(l) WHERE length(trim(l)) > 0), "
            "ls AS (SELECT doc_id, line, COUNT(*) AS c, length(line) AS ln "
            "FROM lines GROUP BY doc_id, line), "
            "la AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines, "
            "1.0 - COUNT(*)::DOUBLE / SUM(c) AS dup_line_frac, "
            "SUM(CASE WHEN c > 1 THEN c*ln ELSE 0 END)::DOUBLE / SUM(c*ln) AS dup_line_char_frac "
            "FROM ls GROUP BY doc_id), "
            "wt AS (SELECT doc_id, string_split(norm, ' ') AS w FROM base), "
            "g2 AS (SELECT doc_id, g FROM wt, unnest(CASE WHEN len(w) >= 2 THEN "
            "list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' ')) "
            "ELSE []::VARCHAR[] END) AS u(g)), "
            "g2s AS (SELECT doc_id, g, COUNT(*) AS c, length(g) AS ln FROM g2 GROUP BY doc_id, g), "
            "t2 AS (SELECT doc_id, c * ln AS top_chars FROM "
            "(SELECT doc_id, c, ln, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY c DESC, ln DESC) AS rn FROM g2s) WHERE rn = 1), "
            "g5 AS (SELECT doc_id, g FROM wt, unnest(CASE WHEN len(w) >= 5 THEN "
            "list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' ')) "
            "ELSE []::VARCHAR[] END) AS u(g)), "
            "g5s AS (SELECT doc_id, g, COUNT(*) AS c, length(g) AS ln FROM g5 GROUP BY doc_id, g), "
            "r5 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c*ln ELSE 0 END) AS rep_chars "
            "FROM g5s GROUP BY doc_id) "
            "SELECT b.doc_id, COALESCE(la.n_lines, 0) AS n_lines, "
            "ROUND(COALESCE(la.dup_line_frac, 0), 6) AS dup_line_frac, "
            "ROUND(COALESCE(la.dup_line_char_frac, 0), 6) AS dup_line_char_frac, "
            "ROUND(CASE WHEN ch.chars > 0 THEN COALESCE(t2.top_chars, 0)::DOUBLE / ch.chars "
            "ELSE 0 END, 6) AS top_gram_char_frac, "
            "ROUND(CASE WHEN ch.chars > 0 THEN COALESCE(r5.rep_chars, 0)::DOUBLE / ch.chars "
            "ELSE 0 END, 6) AS rep_gram_char_frac "
            "FROM base b JOIN ch USING (doc_id) LEFT JOIN la USING (doc_id) "
            "LEFT JOIN t2 USING (doc_id) LEFT JOIN r5 USING (doc_id)"
        ),
        "statsd_decode": (
            # semantic re-derivation from the same modular arithmetic that
            # BUILT the lines — independent of the string parser under test
            "SELECT event_id, "
            "CASE event_id % 4 WHEN 0 THEN 'counter' WHEN 1 THEN 'gauge' "
            "WHEN 2 THEN 'timer' ELSE 'set' END AS metric_type, "
            "event_type AS bucket, "
            "CASE WHEN event_id % 4 = 3 THEN NULL "
            "ELSE CAST(user_id AS DOUBLE) END AS value, "
            "CASE WHEN event_id % 4 = 3 THEN CAST(user_id AS VARCHAR) "
            "ELSE NULL END AS value_str, "
            "CASE WHEN event_id % 4 IN (0, 2) THEN "
            "(CASE WHEN event_id % 5 = 0 THEN 0.25 ELSE 1.0 END) "
            "ELSE NULL END AS sample_rate, "
            "CASE WHEN event_id % 4 = 1 THEN "
            "(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) "
            "ELSE NULL END AS incremental "
            "FROM events"
        ),
        "prom_exposition": (
            "WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type) "
            "SELECT 0 AS kind, 'fbs_events_total' AS metric, "
            "'# TYPE fbs_events_total counter' AS line "
            "UNION ALL "
            "SELECT 1, 'fbs_events_total', "
            "concat('fbs_events_total{event_type=\"', event_type, "
            "'\",env=\"bench\"} ', CAST(n AS VARCHAR)) FROM c"
        ),
        "domain_mix": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE (doc_id * 2654435761) % 10000 < CAST(round("
            "(CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.8 WHEN 'fr' THEN 0.2 "
            "ELSE 1.0 END) * 10000) AS BIGINT)"
        ),
        "mix_temperature": (
            "WITH c AS (SELECT source AS strata, COUNT(*) AS n FROM documents GROUP BY source), "
            "t AS (SELECT SUM(n) AS tot, SUM(pow(n, 0.7)) AS tot_pow FROM c), "
            "s AS (SELECT strata, n, n / tot AS p_obs, pow(n, 0.7) / tot_pow AS p_target "
            "FROM c, t), "
            "mx AS (SELECT MAX(p_target / p_obs) AS m FROM s) "
            "SELECT strata, CAST(n AS BIGINT) AS n, ROUND(p_obs, 6) AS p_obs, "
            "ROUND(p_target, 6) AS p_target, "
            "ROUND((p_target / p_obs) / m, 6) AS keep_rate FROM s, mx"
        ),
        "dedup_clusters": (
            "WITH RECURSIVE docs3 AS ("
            "SELECT doc_id, text FROM documents WHERE doc_id < 60 "
            "UNION ALL SELECT doc_id + 1000000, text || '   ' FROM documents "
            "WHERE doc_id < 60 AND doc_id % 10 = 0 "
            "UNION ALL SELECT doc_id + 2000000, ' ' || text FROM documents "
            "WHERE doc_id < 60 AND doc_id % 10 = 0), "
            "ws AS (SELECT doc_id, list_distinct(string_split("
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w FROM docs3), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM ws a JOIN ws b ON a.doc_id < b.doc_id "
            "WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / "
            "len(list_distinct(list_concat(a.w, b.w))) >= 0.7), "
            "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs), "
            "reach AS (SELECT src AS id, src AS lbl FROM edges "
            "UNION SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id), "
            "comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id) "
            "SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, "
            "d.doc_id = COALESCE(c.component, d.doc_id) AS is_representative "
            "FROM docs3 d LEFT JOIN comp c ON c.id = d.doc_id"
        ),
        "decontaminate": (
            "WITH base AS (SELECT doc_id, "
            "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents), "
            "wt AS (SELECT doc_id, string_split(norm, ' ') AS w FROM base), "
            "grams AS (SELECT doc_id, g FROM wt, unnest(CASE WHEN len(w) >= 8 THEN "
            "list_distinct(list_transform(range(1, len(w) - 6), "
            "i -> array_to_string(w[i:i+7], ' '))) ELSE []::VARCHAR[] END) AS u(g)), "
            "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0), "
            "hits AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS contam_hits "
            "FROM grams c JOIN bench USING (g) GROUP BY c.doc_id) "
            "SELECT b.doc_id, COALESCE(h.contam_hits, 0) AS contam_hits, "
            "COALESCE(h.contam_hits, 0) >= 1 AS contaminated "
            "FROM base b LEFT JOIN hits h USING (doc_id)"
        ),
        "influxdb_lines": (
            # full-string re-derivation of the line protocol: JSON-escape
            # then quote-escape for the string field, %f doubles, i-suffixed
            # ints, epoch-ns tail
            "SELECT 'app.events,event_type=' || event_type || "
            "' event_id=' || event_id || 'i,user_id=' || user_id || "
            "'i,value=' || printf('%f', value) || ',props=\"' || "
            "regexp_replace(replace(replace(props, '\\', '\\\\'), '\"', '\\\"'), "
            "'([\\\\\"])', '\\\\\\0', 'g') || '\"' || ' ' || "
            "CAST(epoch_us(ts) * 1000 AS VARCHAR) AS line FROM events"
        ),
        "datadog_shape": (
            'SELECT epoch_us(ts) // 1000 AS "timestamp", '
            "'app' AS tagkey, 'spark' AS ddsource, 'events' AS service, "
            "event_id, props AS message, "
            "'container_id:c-' || event_id || "
            "',container_name:' || event_type || "
            "',task_family:' || event_type || ',task_version:' || user_id % 5 || "
            "',task_arn:arn:aws:ecs:us-east-1:111:task/' || event_id || "
            "',region:us-east-1,task_id:' || event_id || ',env:bench' AS ddtags "
            "FROM events"
        ),
        "flowcounter_rates": (
            "SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) * 60 + 60 AS until, "
            "CAST(COUNT(*) AS BIGINT) AS counts, "
            "CAST(SUM(strlen(props)) AS BIGINT) AS bytes, "
            "COUNT(*) // 60 AS counts_per_minute, "
            "CAST(SUM(strlen(props)) AS BIGINT) // 60 AS bytes_per_minute "
            "FROM events GROUP BY 1"
        ),
        "forward_wire_roundtrip": (
            "SELECT event_id, ts, event_type, user_id FROM events"
        ),
        "cloudwatch_shape": (
            "SELECT 'fbs-group' AS log_group, "
            "'stream-' || event_type AS log_stream, "
            'epoch_us(ts) // 1000 AS "timestamp", '
            "props AS message FROM events"
        ),
        "stackdriver_shape": (
            # independent re-derivation: severity from the SAME event_type
            # rule that synthesized the mixed-case aliases, nanos via lpad
            "SELECT 'projects/proj-bench/logs/app' AS log_name, "
            "CASE event_type WHEN 'error' THEN 500 WHEN 'purchase' THEN 400 "
            "WHEN 'signup' THEN 200 WHEN 'view' THEN 100 ELSE 300 END AS severity, "
            "strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' || "
            "lpad(CAST((epoch_us(ts) % 1000000) * 1000 AS VARCHAR), 9, '0') || 'Z' "
            'AS "timestamp", '
            "'{\"event_id\":' || event_id || ',\"props\":' || to_json(props) || '}' "
            "AS json_payload FROM events"
        ),
        "bigquery_shape": (
            "SELECT CAST(event_id AS VARCHAR) AS insert_id, "
            "'{\"event_type\":' || to_json(event_type) || "
            "',\"user_id\":' || user_id || '}' AS json FROM events"
        ),
        "syslog_5424_lines": (
            # independent re-derivation from the same synth rules; BOM via
            # chr(65279); props values have no SD-escapable chars
            "SELECT '<' || CAST("
            "(CASE WHEN user_id % 2 = 0 THEN 16 ELSE 3 END) * 8 + "
            "(CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 4 "
            "WHEN 'signup' THEN 6 WHEN 'view' THEN 7 ELSE 5 END) AS VARCHAR) "
            "|| '>1 ' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' || "
            "lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z ' || "
            "'host-' || user_id % 8 || ' ' || event_type || ' ' || event_id || "
            "' - [meta k=\"' || json_extract_string(props, '$.k') || '\"] ' || "
            "chr(65279) || props AS line FROM events"
        ),
        "syslog_3164_lines": (
            "SELECT '<14>' || strftime(ts, '%b') || ' ' || "
            "lpad(CAST(day(ts) AS VARCHAR), 2, ' ') || ' ' || "
            "strftime(ts, '%H:%M:%S') || ' ' || 'host-' || user_id % 8 || ' ' || "
            "event_type || '[' || event_id || ']: ' || props AS line FROM events"
        ),
        "c4_line_filter": (
            "WITH synth AS (SELECT doc_id, text || '.' || chr(10) || 'too short.' "
            "|| chr(10) || 'this line mentions terms of use policy here.' || "
            "CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{ brace }' ELSE '' END AS text "
            "FROM documents), "
            "base AS (SELECT doc_id, string_split(text, chr(10)) AS parts, "
            "contains(lower(text), '{') AS doc_has_brace, "
            "contains(lower(text), 'lorem ipsum') AS doc_has_lorem FROM synth), "
            "l AS (SELECT doc_id, doc_has_brace, doc_has_lorem, "
            "CAST(i - 1 AS INT) AS line_no, trim(parts[i]) AS line "
            "FROM base, unnest(range(1, len(parts) + 1)) AS r(i)) "
            "SELECT doc_id, line_no, line, doc_has_brace, doc_has_lorem, "
            "regexp_matches(line, '[.!?\"]$') "
            "AND len(regexp_split_to_array(line, '\\s+')) >= 5 "
            "AND NOT (contains(lower(line), 'lorem ipsum') "
            "OR contains(lower(line), 'javascript') "
            "OR contains(lower(line), 'terms of use') "
            "OR contains(lower(line), 'privacy policy') "
            "OR contains(lower(line), 'cookie policy') "
            "OR contains(lower(line), 'uses cookies')) AS keep FROM l"
        ),
        "c4_clean_docs": (
            "WITH synth AS (SELECT doc_id, text || '.' || chr(10) || 'too short.' "
            "|| chr(10) || 'this line mentions terms of use policy here.' || "
            "CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{ brace }' ELSE '' END AS text "
            "FROM documents), "
            "base AS (SELECT doc_id, string_split(text, chr(10)) AS parts, "
            "contains(lower(text), '{') AS doc_has_brace, "
            "contains(lower(text), 'lorem ipsum') AS doc_has_lorem FROM synth), "
            "l AS (SELECT doc_id, doc_has_brace, doc_has_lorem, "
            "CAST(i - 1 AS INT) AS line_no, trim(parts[i]) AS line "
            "FROM base, unnest(range(1, len(parts) + 1)) AS r(i)), "
            "kept AS (SELECT * FROM l WHERE NOT doc_has_brace AND NOT doc_has_lorem "
            "AND regexp_matches(line, '[.!?\"]$') "
            "AND len(regexp_split_to_array(line, '\\s+')) >= 5 "
            "AND NOT (contains(lower(line), 'lorem ipsum') "
            "OR contains(lower(line), 'javascript') "
            "OR contains(lower(line), 'terms of use') "
            "OR contains(lower(line), 'privacy policy') "
            "OR contains(lower(line), 'cookie policy') "
            "OR contains(lower(line), 'uses cookies'))) "
            "SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS clean_text, "
            "CAST(COUNT(*) AS BIGINT) AS n_kept_lines FROM kept "
            "GROUP BY doc_id HAVING COUNT(*) >= 1"
        ),
        "http_body": (
            "WITH rec AS (SELECT 'ev.' || event_type AS batch, ts, "
            "'{\"date\":\"' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' || "
            "lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z\"' || "
            "',\"event_id\":' || event_id || ',\"props\":' || to_json(props) || '}' "
            "AS j FROM events) "
            "SELECT batch, string_agg(j, chr(10) ORDER BY ts, j) AS body "
            "FROM rec GROUP BY batch"
        ),
        "plot_lines": (
            "SELECT printf('%f', epoch_us(ts) / 1000000.0) || ' ' || "
            "printf('%f', value) AS line FROM events WHERE value IS NOT NULL"
        ),
        "kafka_messages": (
            "SELECT CASE WHEN event_type IN ('error', 'purchase') "
            "THEN event_type ELSE 'events_default' END AS topic, "
            "CAST(user_id AS VARCHAR) AS key, "
            "'{\"@timestamp\":\"' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' || "
            "lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || 'Z\"' || "
            "',\"event_id\":' || event_id || "
            "',\"dest\":' || to_json(event_type) || "
            "',\"uid\":\"' || user_id || '\"}' AS value FROM events"
        ),
        "kinesis_shape": (
            "SELECT to_base64(encode('{\"event_id\":' || event_id || "
            "',\"event_type\":' || to_json(event_type) || "
            "',\"time\":\"' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '\"}')) "
            "AS data FROM events"
        ),
        "azure_shape": (
            "SELECT CASE WHEN event_id % 3 = 0 THEN event_type ELSE 'fbs' END "
            "AS log_type, "
            "strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.' || "
            "lpad(CAST(epoch_us(ts) % 1000000 // 1000 AS VARCHAR), 3, '0') || 'Z' "
            "AS time_gen, event_id, props FROM events"
        ),
        "http_requests": (
            "SELECT event_type, event_id, user_id FROM events"
        ),
        "logdna_shape": (
            'SELECT epoch_us(ts) // 1000 AS "timestamp", '
            "event_type AS level, 'bench' AS app, "
            "'{\"event_id\":' || event_id || ',\"props\":' || to_json(props) || '}' "
            "AS line FROM events"
        ),
        "nats_body": (
            "WITH rec AS (SELECT 'ev.' || event_type AS subject, ts, "
            "'[' || (epoch_us(ts) // 1000000) || '.' || "
            "lpad(CAST(epoch_us(ts) % 1000000 AS VARCHAR), 6, '0') || ',' || "
            "'{\"event_id\":' || event_id || ',\"user_id\":' || user_id || '}]' AS e "
            "FROM events) "
            "SELECT subject, '[' || string_agg(e, ',' ORDER BY ts, e) || ']' AS body "
            "FROM rec GROUP BY subject"
        ),
        "remote_write_roundtrip": (
            "SELECT 'fbs_' || event_type AS metric, "
            "CAST(user_id % 4 AS VARCHAR) AS shard, value, "
            "make_timestamp(epoch_us(ts) // 1000 * 1000) AS ts_ms FROM events"
        ),
        "line_dedup": (
            "WITH synth AS (SELECT doc_id, text || '.' || chr(10) || 'too short.' "
            "|| chr(10) || 'this line mentions terms of use policy here.' || "
            "CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{ brace }' ELSE '' END AS text "
            "FROM documents), "
            "base AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM synth), "
            "l AS (SELECT doc_id, CAST(i - 1 AS INT) AS line_no, trim(parts[i]) AS line "
            "FROM base, unnest(range(1, len(parts) + 1)) AS r(i)), "
            "freq AS (SELECT line FROM l WHERE len(line) >= 1 "
            "GROUP BY line HAVING COUNT(DISTINCT doc_id) > 2), "
            "m AS (SELECT l.doc_id, l.line_no, l.line, "
            "(len(l.line) >= 1 AND l.line IN (SELECT line FROM freq)) AS dropped FROM l) "
            "SELECT doc_id, COALESCE(string_agg(line, chr(10) ORDER BY line_no) "
            "FILTER (WHERE NOT dropped), '') AS clean_text, "
            "COUNT(*) FILTER (WHERE NOT dropped) AS n_kept_lines, "
            "COUNT(*) FILTER (WHERE dropped) AS n_dropped_lines "
            "FROM m GROUP BY doc_id"
        ),
        "embedding_quantize": (
            "WITH d AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim, "
            "CAST(embedding[i] AS DOUBLE) AS val "
            "FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)), "
            "s AS (SELECT dim, min(val) AS lo, max(val) AS hi FROM d GROUP BY dim), "
            "sc AS (SELECT dim, lo, CASE WHEN hi > lo THEN (hi - lo) / 255.0 "
            "ELSE 1.0 END AS scale FROM s), "
            "c AS (SELECT vec_id, CAST(round((val - lo) / scale) AS INT) AS code "
            "FROM d JOIN sc USING (dim)) "
            "SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum, "
            "MIN(code) AS code_min, MAX(code) AS code_max FROM c GROUP BY vec_id"
        ),
        "sketch_distinct": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct "
            "FROM events GROUP BY event_type"
        ),
        "sketch_rollup": (
            "SELECT date_trunc('hour', ts) AS hour, "
            "COUNT(DISTINCT user_id) AS n_distinct FROM events GROUP BY 1"
        ),
        "sketch_quantiles": (
            "SELECT event_type, COUNT(*) AS n, "
            "ROUND(quantile_cont(value, 0.5), 6) AS p50_exact, "
            "ROUND(quantile_cont(value, 0.95), 6) AS p95_exact, "
            "ROUND(quantile_cont(value, 0.99), 6) AS p99_exact, "
            "TRUE AS sk50_ok, TRUE AS sk95_ok, TRUE AS sk99_ok "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type"
        ),
        "sketch_overlap": (
            "WITH s AS (SELECT event_type AS t, user_id AS u FROM events "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 8), "
            "c AS (SELECT t, COUNT(*) AS n FROM s GROUP BY t), "
            "i AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS nb "
            "FROM s a JOIN s b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2) "
            "SELECT ca.t AS seg_a, cb.t AS seg_b, "
            "CAST(ca.n + cb.n - COALESCE(i.nb, 0) AS BIGINT) AS n_union, "
            "CAST(COALESCE(i.nb, 0) AS BIGINT) AS n_both, "
            "CAST(ca.n - COALESCE(i.nb, 0) AS BIGINT) AS n_only_a "
            "FROM c ca JOIN c cb ON ca.t < cb.t "
            "LEFT JOIN i ON i.ta = ca.t AND i.tb = cb.t"
        ),
        "ts_downsample": (
            "SELECT event_type, "
            "make_timestamp((epoch_us(ts) // 1000000 // 300) * 300 * 1000000) "
            "AS bucket, CAST(COUNT(*) AS BIGINT) AS n, "
            "ROUND(AVG(value), 6) AS avg_value FROM events "
            "WHERE value IS NOT NULL GROUP BY 1, 2"
        ),
        "ts_gapfill_locf": (
            "WITH d AS (SELECT event_type, "
            "make_timestamp((epoch_us(ts) // 1000000 // 60) * 60 * 1000000) "
            "AS bucket, ROUND(AVG(value), 6) AS avg_v FROM events "
            "WHERE value IS NOT NULL AND event_id % 13 = 0 GROUP BY 1, 2), "
            "r AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi "
            "FROM d GROUP BY 1), "
            "sp AS (SELECT event_type, "
            "unnest(generate_series(lo, hi, INTERVAL 60 SECOND)) AS bucket FROM r), "
            "j AS (SELECT sp.event_type, sp.bucket, d.avg_v, "
            "d.avg_v IS NULL AS is_gap "
            "FROM sp LEFT JOIN d ON d.event_type = sp.event_type "
            "AND d.bucket = sp.bucket) "
            "SELECT event_type, bucket, "
            "last_value(avg_v IGNORE NULLS) OVER (PARTITION BY event_type "
            "ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS avg_v, is_gap FROM j"
        ),
        "ts_rate": (
            "WITH d AS (SELECT event_type, "
            "make_timestamp((epoch_us(ts) // 1000000 // 60) * 60 * 1000000) "
            "AS bucket, COUNT(*) AS n FROM events GROUP BY 1, 2), "
            "c AS (SELECT event_type, bucket, "
            "CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket) % 500 "
            "AS BIGINT) AS counter FROM d), "
            "r AS (SELECT event_type, bucket, counter, "
            "lag(counter) OVER (PARTITION BY event_type ORDER BY bucket) AS pv, "
            "epoch_us(bucket) // 1000000 - lag(epoch_us(bucket) // 1000000) "
            "OVER (PARTITION BY event_type ORDER BY bucket) AS el FROM c) "
            "SELECT event_type, bucket, counter, "
            "ROUND(CASE WHEN pv IS NULL OR el <= 0 THEN NULL "
            "WHEN counter >= pv THEN (counter - pv) / CAST(el AS DOUBLE) "
            "ELSE counter / CAST(el AS DOUBLE) END, 6) AS rate FROM r"
        ),
        "interval_band_join": (
            "WITH bands AS (SELECT k * 8.0 AS lo, (k + 1) * 8.0 AS hi, "
            "k AS band FROM range(62) r(k)) "
            "SELECT e.event_id, e.value, b.band FROM events e "
            "JOIN bands b ON e.value >= b.lo AND e.value < b.hi "
            "WHERE e.value IS NOT NULL"
        ),
        "sketch_ranks": (
            "SELECT event_type, "
            "ROUND(COUNT(*) FILTER (WHERE value <= 50.0) * 1.0 / COUNT(*), 9) "
            "AS rank_at_50_0, "
            "ROUND(COUNT(*) FILTER (WHERE value <= 100.0) * 1.0 / COUNT(*), 9) "
            "AS rank_at_100_0, "
            "ROUND(COUNT(*) FILTER (WHERE value <= 150.0) * 1.0 / COUNT(*), 9) "
            "AS rank_at_150_0, "
            "TRUE AS sk_0_ok, TRUE AS sk_1_ok, TRUE AS sk_2_ok "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type"
        ),
        "dataset_split": (
            "WITH b AS (SELECT *, "
            "((doc_id * 2654435761) % 4294967296) / 4294967296.0 AS bkt "
            "FROM documents) "
            "SELECT CASE WHEN bkt < 0.8 THEN 'train' "
            "WHEN bkt < 0.9 THEN 'val' ELSE 'test' END AS split, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM b GROUP BY 1"
        ),
        "otlp_traces_roundtrip": (
            "SELECT lower(lpad(hex(user_id), 32, '0')) AS trace_id, "
            "lower(lpad(hex(event_id), 16, '0')) AS span_id, "
            "event_type AS name, "
            "ts AS start_ts, "
            "make_timestamp(epoch_us(ts) + event_id % 1000000) AS end_ts, "
            "CAST(event_id % 3 AS BIGINT) AS status_code, "
            "user_id, 'events' AS service FROM events"
        ),
        "otlp_metrics_roundtrip": (
            "SELECT 'events_total' AS metric_name, 'counter' AS metric_type, "
            "make_timestamp((epoch_us(ts) // 1000000 // 60) * 60 * 1000000) "
            "AS bucket, CAST(COUNT(*) AS DOUBLE) AS value, event_type "
            "FROM events GROUP BY 3, 5"
        ),
        "prom_scrape_roundtrip": (
            "SELECT 'fbs_events_total' AS metric_name, "
            "'counter' AS metric_type, event_type, 'bench' AS env, "
            "CAST(COUNT(*) AS DOUBLE) AS value FROM events GROUP BY event_type"
        ),
        "otlp_histogram_roundtrip": (
            "WITH b AS (SELECT unnest(['50.0', '100.0', '150.0', 'inf']) AS le), "
            "g AS (SELECT event_type, COUNT(*) AS total FROM events "
            "WHERE value IS NOT NULL GROUP BY 1) "
            "SELECT 'fbs_value_hist' AS metric_name, g.event_type, "
            "CAST(g.total AS BIGINT) AS count, b.le, "
            "CAST((SELECT COUNT(*) FROM events e WHERE e.value IS NOT NULL "
            "AND e.event_type = g.event_type "
            "AND (b.le = 'inf' OR e.value <= CAST(b.le AS DOUBLE))) AS BIGINT) "
            "AS cumulative_count "
            "FROM g CROSS JOIN b"
        ),
    }
    # the indexed serving path returns IDENTICAL rows to bm25_topk —
    # same end-to-end SQL replay
    sql["bm25_indexed"] = sql["bm25_topk"]
    # bm25_served: the persisted-index serve path is provably identical
    # to bm25_topk — same end-to-end SQL replay gates save/load/serve
    sql["bm25_served"] = sql["bm25_topk"]
    # cluster_balanced: invariant-contract truth table (the _ann_gate
    # pattern) — cluster ids come from float Lloyd iteration, so the
    # contract rows are the oracle
    sql["cluster_balanced"] = (
        "SELECT 'kept_eq_min_cap_size' AS chk, TRUE AS ok "
        "UNION ALL SELECT 'kept_distinct', TRUE "
        "UNION ALL SELECT 'kept_subset_of_input', TRUE"
    )
    # pack_ffd: contract truth table with the two numeric witnesses
    # (piece count, token total) derived from the text itself — the char
    # tokenizer's token count per doc is exactly length(stream form)
    norm6 = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    sql["pack_ffd"] = (
        f"WITH d AS (SELECT CASE WHEN {norm6} = '' THEN '' "
        f"ELSE replace({norm6}, ' ', chr(30)) || chr(30) END AS s FROM documents), "
        "st AS (SELECT CAST(SUM(length(s)) AS BIGINT) AS total, "
        "CAST(SUM(CASE WHEN length(s) > 0 THEN CEIL(length(s) / 256.0) END) AS BIGINT) "
        "AS n_pieces FROM d) "
        "SELECT 'no_overflow' AS chk, TRUE AS ok, CAST(NULL AS BIGINT) AS val FROM st "
        "UNION ALL SELECT 'doc_pieces_once', TRUE, n_pieces FROM st "
        "UNION ALL SELECT 'token_conservation', TRUE, total FROM st "
        "UNION ALL SELECT 'ffd_bound', TRUE, CAST(NULL AS BIGINT) FROM st"
    )
    # fuzzy_join_trigram: the naive lateral-grams replay — normalize +
    # pad exactly as linkage.char_trigrams, lateral-extract distinct
    # 3-grams, pair on shared grams, exact Jaccard
    trgnorm = "trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g'))"
    sql["fuzzy_join_trigram"] = (
        f"WITH base AS (SELECT p_partkey AS id, "
        f"'  ' || {trgnorm} || ' ' AS p FROM part "
        f"WHERE p_size <= 3 AND length({trgnorm}) > 0), "
        "g AS (SELECT id, unnest(list_distinct([substr(p, CAST(i AS INT), 3) "
        "for i in generate_series(1, length(p) - 2)])) AS gram FROM base), "
        "n AS (SELECT id, COUNT(*) AS n FROM g GROUP BY id), "
        "pairs AS (SELECT a.id AS lid, b.id AS rid, COUNT(*) AS common "
        "FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id "
        "GROUP BY a.id, b.id) "
        "SELECT p.lid AS l_p_partkey, p.rid AS r_p_partkey, "
        "CAST(p.common AS DOUBLE) / (nl.n + nr.n - p.common) AS sim "
        "FROM pairs p JOIN n nl ON nl.id = p.lid JOIN n nr ON nr.id = p.rid "
        "WHERE CAST(p.common AS DOUBLE) / (nl.n + nr.n - p.common) >= 0.62"
    )
    # edit_distance_join: brute-force levenshtein over all filtered pairs
    # (141 rows at sf0.01) — completeness of the Spark-side EDJoin prefix
    # bound is exactly what the brute-force replay checks
    sql["edit_distance_join"] = (
        f"WITH base AS (SELECT p_partkey AS id, {trgnorm} AS s FROM part "
        f"WHERE p_size <= 3 AND length({trgnorm}) > 0) "
        "SELECT a.id AS l_p_partkey, b.id AS r_p_partkey, "
        "CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist "
        "FROM base a JOIN base b ON a.id < b.id "
        "WHERE levenshtein(a.s, b.s) <= 2"
    )
    # funnel_levels: chained conditional mins replay the greedy-earliest
    # chain; the CASE truncates at the first window violation (monotone
    # timestamps make the earliest candidate optimal, so chain-then-
    # truncate == the Spark fold)
    sql["funnel_levels"] = (
        "WITH u AS (SELECT DISTINCT user_id FROM events), "
        "s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN s1 ON s1.user_id = e.user_id "
        "WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id), "
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN s2 ON s2.user_id = e.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id) "
        "SELECT u.user_id, CAST(CASE "
        "WHEN s1.t1 IS NULL THEN 0 "
        "WHEN s2.t2 IS NULL OR epoch_us(s2.t2) - epoch_us(s1.t1) > 259200000000 THEN 1 "
        "WHEN s3.t3 IS NULL OR epoch_us(s3.t3) - epoch_us(s1.t1) > 259200000000 THEN 2 "
        "ELSE 3 END AS INT) AS funnel_level "
        "FROM u LEFT JOIN s1 ON s1.user_id = u.user_id "
        "LEFT JOIN s2 ON s2.user_id = u.user_id "
        "LEFT JOIN s3 ON s3.user_id = u.user_id"
    )
    # cohort_retention: first-seen-date buckets x day offsets
    sql["cohort_retention"] = (
        "WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort "
        "FROM events GROUP BY user_id), "
        "a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) "
        "SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort, "
        "CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset, "
        "CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users "
        "FROM a JOIN f ON f.user_id = a.user_id GROUP BY 1, 2"
    )
    # active_users_window: date-range-join replay of the explode form
    sql["active_users_window"] = (
        "WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), "
        "days AS (SELECT DISTINCT d FROM a) "
        "SELECT strftime(days.d, '%Y-%m-%d') AS window_end, "
        "CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users "
        "FROM days JOIN a ON a.d BETWEEN days.d - 6 AND days.d "
        "GROUP BY 1"
    )
    # top_session_paths: identical lag/running-sum sessionization in
    # DuckDB window functions (ROWS vs Spark's RANGE running sum agree
    # because tied (ts,type) peers always carry a 0 new-session flag)
    sql["top_session_paths"] = (
        "WITH s AS (SELECT user_id, ts, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
        "THEN 1 ELSE 0 END AS nw FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)), "
        "s2 AS (SELECT user_id, ts, event_type, "
        "SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_type "
        "ROWS UNBOUNDED PRECEDING) AS sess FROM s), "
        "s3 AS (SELECT user_id, ts, event_type, sess, "
        "row_number() OVER (PARTITION BY user_id, sess "
        "ORDER BY ts, event_type) AS rn FROM s2), "
        "pp AS (SELECT user_id, sess, "
        "string_agg(event_type, '>' ORDER BY ts, event_type) AS path "
        "FROM s3 WHERE rn <= 5 GROUP BY user_id, sess), "
        "c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS sessions "
        "FROM pp GROUP BY path) "
        "SELECT path, sessions FROM c ORDER BY sessions DESC, path ASC LIMIT 20"
    )
    # event_transitions: same sessionization + lag replay; prob via a
    # per-src window sum ratio
    sql["event_transitions"] = (
        "WITH s AS (SELECT user_id, ts, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
        "THEN 1 ELSE 0 END AS nw FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)), "
        "s2 AS (SELECT user_id, ts, event_type, "
        "SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_type "
        "ROWS UNBOUNDED PRECEDING) AS sess FROM s), "
        "s3 AS (SELECT event_type AS dst, "
        "lag(event_type) OVER (PARTITION BY user_id, sess "
        "ORDER BY ts, event_type) AS src FROM s2), "
        "c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS transitions "
        "FROM s3 WHERE src IS NOT NULL GROUP BY src, dst) "
        "SELECT src, dst, transitions, "
        "CAST(transitions AS DOUBLE) / SUM(transitions) OVER (PARTITION BY src) "
        "AS prob FROM c"
    )
    # rfm_segments: aggregate + identical deterministic ntile windows
    sql["rfm_segments"] = (
        "WITH pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_d, "
        "CAST(COUNT(*) AS BIGINT) AS frequency, "
        "COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0.0) "
        "AS monetary FROM events GROUP BY user_id), "
        "mx AS (SELECT max(last_d) AS m FROM pu) "
        "SELECT pu.user_id, "
        "CAST(date_diff('day', pu.last_d, mx.m) AS INT) AS recency_days, "
        "pu.frequency, pu.monetary, "
        "CAST(ntile(5) OVER (ORDER BY date_diff('day', pu.last_d, mx.m) ASC, "
        "pu.user_id ASC) AS INT) AS r, "
        "CAST(ntile(5) OVER (ORDER BY pu.frequency DESC, pu.user_id ASC) "
        "AS INT) AS f, "
        "CAST(ntile(5) OVER (ORDER BY pu.monetary DESC, pu.user_id ASC) "
        "AS INT) AS m "
        "FROM pu, mx"
    )
    # session_summaries: identical sessionization replay + aggregation
    sql["session_summaries"] = (
        "WITH s AS (SELECT user_id, ts, event_type, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
        "THEN 1 ELSE 0 END AS nw FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)), "
        "s2 AS (SELECT user_id, ts, event_type, "
        "CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_type "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM s) "
        "SELECT user_id, sess AS session, min(ts) AS session_start, "
        "(epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_s, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types "
        "FROM s2 GROUP BY user_id, sess"
    )
    # experiment_stats: closed-form two-proportion z replay
    sql["experiment_stats"] = (
        "WITH pu AS (SELECT user_id % 2 AS variant, user_id, "
        "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv "
        "FROM events GROUP BY 1, 2), "
        "pv AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS users, "
        "CAST(SUM(conv) AS BIGINT) AS converters FROM pu GROUP BY variant), "
        "c AS (SELECT users AS cu, converters AS cc FROM pv "
        "ORDER BY variant LIMIT 1) "
        "SELECT pv.variant, pv.users, pv.converters, "
        "pv.converters / pv.users AS conv_rate, "
        "CASE WHEN sqrt(((pv.converters + c.cc) / (pv.users + c.cu)) * "
        "(1 - (pv.converters + c.cc) / (pv.users + c.cu)) * "
        "(1 / pv.users + 1 / c.cu)) > 0 THEN "
        "((pv.converters / pv.users) - (c.cc / c.cu)) / "
        "sqrt(((pv.converters + c.cc) / (pv.users + c.cu)) * "
        "(1 - (pv.converters + c.cc) / (pv.users + c.cu)) * "
        "(1 / pv.users + 1 / c.cu)) ELSE 0.0 END AS z_vs_baseline "
        "FROM pv, c"
    )
    # log_templates: same line synthesis + full mining replay
    sql["log_templates"] = (
        "WITH m AS (SELECT CASE "
        "WHEN event_type = 'purchase' THEN "
        "'user ' || user_id || ' purchased item ' || event_id "
        "WHEN event_type = 'error' THEN "
        "'error ' || event_id || ' reported by user ' || user_id "
        "ELSE 'user ' || user_id || ' did ' || event_type END AS msg "
        "FROM events), "
        "b AS (SELECT string_split(trim(regexp_replace(msg, '\\s+', ' ', 'g')), ' ') "
        "AS l FROM m), "
        "b2 AS (SELECT l, len(l) AS n, l[1] AS first FROM b "
        "WHERE len(l) > 0 AND l[1] <> ''), "
        # level-2 split: most-constant early position with 2..8 distinct
        "p AS (SELECT n, first, generate_subscripts(l, 1) - 1 AS pos, "
        "unnest(l) AS tok FROM b2), "
        "e AS (SELECT n, first, pos, COUNT(DISTINCT tok) AS d, COUNT(*) AS c "
        "FROM p WHERE pos BETWEEN 1 AND 4 GROUP BY 1, 2, 3), "
        "sp AS (SELECT n, first, pos AS spos FROM ("
        "SELECT n, first, pos, ROW_NUMBER() OVER (PARTITION BY n, first "
        "ORDER BY d, pos) AS rn FROM e "
        "WHERE d BETWEEN 2 AND 8 AND d * 2 <= c) WHERE rn = 1), "
        "b3 AS (SELECT b2.l, b2.n, b2.first, "
        "COALESCE(b2.l[sp.spos + 1], '') AS skey "
        "FROM b2 LEFT JOIN sp ON b2.n = sp.n AND b2.first = sp.first), "
        "p2 AS (SELECT n, first, skey, generate_subscripts(l, 1) - 1 AS pos, "
        "unnest(l) AS tok FROM b3), "
        "a AS (SELECT n, first, skey, pos, COUNT(DISTINCT tok) AS d, "
        "MIN(tok) AS one FROM p2 GROUP BY 1, 2, 3, 4), "
        "tm AS (SELECT n, first, skey, string_agg(CASE WHEN d = 1 THEN one "
        "ELSE '<*>' END, ' ' ORDER BY pos) AS template FROM a "
        "GROUP BY n, first, skey), "
        "c AS (SELECT n, first, skey, CAST(COUNT(*) AS BIGINT) AS n_lines "
        "FROM b3 GROUP BY n, first, skey) "
        "SELECT tm.template, c.n_lines FROM tm "
        "JOIN c ON tm.n = c.n AND tm.first = c.first AND tm.skey = c.skey"
    )
    # entity_resolution: the fuzzy pairs feed a recursive-CTE transitive
    # closure; entity_id = min reachable id, singletons map to themselves
    sql["entity_resolution"] = (
        f"WITH RECURSIVE base AS (SELECT p_partkey AS id, "
        f"'  ' || {trgnorm} || ' ' AS p FROM part "
        f"WHERE p_size <= 3 AND length({trgnorm}) > 0), "
        "g AS (SELECT id, unnest(list_distinct([substr(p, CAST(i AS INT), 3) "
        "for i in generate_series(1, length(p) - 2)])) AS gram FROM base), "
        "n AS (SELECT id, COUNT(*) AS n FROM g GROUP BY id), "
        "cand AS (SELECT a.id AS lid, b.id AS rid, COUNT(*) AS common "
        "FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id "
        "GROUP BY a.id, b.id), "
        "pairs AS (SELECT lid, rid FROM cand "
        "JOIN n nl ON nl.id = lid JOIN n nr ON nr.id = rid "
        "WHERE CAST(common AS DOUBLE) / (nl.n + nr.n - common) >= 0.62), "
        "edges AS (SELECT lid AS src, rid AS dst FROM pairs "
        "UNION SELECT rid, lid FROM pairs), "
        "reach AS (SELECT src AS id, src AS lbl FROM edges "
        "UNION SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id), "
        "comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id) "
        "SELECT t.p_partkey, COALESCE(c.component, t.p_partkey) AS entity_id "
        "FROM part t LEFT JOIN comp c ON c.id = t.p_partkey "
        "WHERE t.p_size <= 3"
    )
    # the crawl-source composition gate recovers documents.text EXACTLY
    # through gzip-member inflate + Content-Length framing + WARC/HTTP
    # header split, so its quality metrics are text_quality's own oracle
    # verbatim — any byte lost or added in the source chain hash-fails
    sql["warc_quality_pipeline"] = sql["text_quality"]
    return sql
