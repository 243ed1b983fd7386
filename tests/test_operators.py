"""Operator-library tests mirroring the reference runtime tests
(tests/runtime/filter_*.c cases: grep AND/OR, modify conditions, nest/lift
roundtrip, throttle drop counts, rewrite_tag capture refs, ...).
"""

import pytest
from pyspark.sql import Row, functions as F

from fluent_bit_spark.operators.grep import grep
from fluent_bit_spark.operators.modify import Condition, modify
from fluent_bit_spark.operators.nest import lift, nest
from fluent_bit_spark.operators.record_modifier import record_modifier
from fluent_bit_spark.operators.content_modifier import content_modifier
from fluent_bit_spark.operators.conditions import Rule, conditions
from fluent_bit_spark.operators.expect import expect
from fluent_bit_spark.operators.routing import route
from fluent_bit_spark.operators.rewrite_tag import rewrite_tag
from fluent_bit_spark.operators.lookup import checklist, enrich
from fluent_bit_spark.typecast import type_converter


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        Row(tag="app.access", level="info", msg="GET /index 200", host="web1", size="1024"),
        Row(tag="app.access", level="warn", msg="GET /admin 403", host="web2", size="55"),
        Row(tag="app.error", level="error", msg="boom NullPointerException", host="web1", size="0"),
        Row(tag="db.query", level="info", msg="SELECT ok", host="db1", size="77"),
    ]
    return spark.createDataFrame(rows)


def test_grep_keep_and_exclude(logs):
    assert grep(logs, [("regex", "msg", "GET")]).count() == 2
    assert grep(logs, [("exclude", "level", "error")]).count() == 3
    # AND of keep+exclude
    assert grep(logs, [("regex", "msg", "GET"), ("exclude", "level", "warn")]).count() == 1
    # OR
    assert grep(logs, [("regex", "level", "error"), ("regex", "host", "db1")], "OR").count() == 2
    # missing key never matches
    assert grep(logs, [("regex", "nope", ".*")]).count() == 0
    assert grep(logs, [("exclude", "nope", ".*")]).count() == 4


def test_modify_rules(logs):
    out = modify(
        logs,
        [
            ("rename", "host", "hostname"),
            ("add", "service", "web"),
            ("set", "level", "normalized"),
            ("copy", "msg", "msg_copy"),
            ("remove", "size"),
        ],
    )
    assert "hostname" in out.columns and "host" not in out.columns
    assert "size" not in out.columns
    r = out.filter(F.col("tag") == "db.query").collect()[0]
    assert r.service == "web" and r.level == "normalized" and r.msg_copy == "SELECT ok"


def test_modify_conditional(logs):
    out = modify(
        logs,
        [("set", "flag", "errorish")],
        conds=[Condition("key_value_equals", "level", "error")],
    )
    got = {r.tag: r.flag for r in out.collect()}
    assert got["app.error"] == "errorish"
    assert got["db.query"] is None


def test_modify_remove_wildcard(logs):
    out = modify(logs, [("remove_wildcard", "ms")])
    assert "msg" not in out.columns


def test_nest_lift_roundtrip(logs):
    nested = nest(logs, "m*", nest_under="meta")
    assert "msg" not in nested.columns and "meta" in nested.columns
    back = lift(nested, "meta")
    assert set(back.columns) == set(logs.columns)
    assert back.count() == logs.count()


def test_nest_prefix_handling(logs):
    nested = nest(logs, "host", "h", add_prefix="x_")
    assert nested.select(F.col("h.x_host")).count() == 4


def test_record_modifier(logs):
    out = record_modifier(
        logs, allowlist_keys=["tag", "msg"], records={"env": "prod"}, uuid_key="rid"
    )
    assert set(out.columns) == {"tag", "msg", "env", "rid"}
    assert out.filter(F.length("rid") == 36).count() == 4


def test_type_converter(logs):
    out = type_converter(logs, [("size", "size_int", "int"), ("size", "size_f", "float")])
    r = out.filter(F.col("tag") == "app.access").orderBy("size").collect()
    assert r[0].size_int == 1024 and isinstance(r[0].size_f, float)


def test_content_modifier_chain(logs):
    out = content_modifier(logs, "hash", "host")
    assert out.filter(F.length("host") == 64).count() == 4
    out2 = content_modifier(
        logs, "extract", "msg", pattern=r"(?P<verb>GET|POST) (?P<path>\S+)"
    )
    got = out2.filter(F.col("verb") == "GET").count()
    assert got == 2
    out3 = content_modifier(logs, "convert", "size", converted_type="int")
    assert dict(out3.dtypes)["size"] == "bigint"


def test_conditions_engine(logs):
    c = conditions(logs, [Rule("level", "in", ["warn", "error"]), Rule("msg", "regex", "GET")], "AND")
    assert logs.filter(c).count() == 1
    c2 = conditions(logs, [Rule("size", "gt", 100)])  # string "1024" > 100 via coercion
    assert logs.filter(c2).count() == 1


def test_expect(logs):
    out = expect(logs, [("key_exists", "msg")], action="count").collect()[0]
    assert out.records == 4 and out.violations == 0
    with pytest.raises(AssertionError):
        expect(logs, [("key_val_eq", "level", "info")], action="exit")


def test_routing(logs):
    routes = route(logs, {"all_app": "app.*", "errors": ("*", [Rule("level", "eq", "error")])})
    assert routes["all_app"].count() == 3
    assert routes["errors"].count() == 1


def test_rewrite_tag_with_captures(logs):
    out = rewrite_tag(logs, [("msg", r"GET (/\w+)", "http.$1", False)])
    tags = {r.msg: r.tag for r in out.collect()}
    assert tags["GET /index 200"] == "http./index"
    assert tags["boom NullPointerException"] == "app.error"  # unmatched keeps tag
    # keep=True duplicates the matched records under the original tag
    kept = rewrite_tag(logs, [("msg", r"GET (/\w+)", "http.$1", True)])
    assert kept.count() == 6


def test_checklist_and_enrich(spark, logs):
    wl = spark.createDataFrame([Row(v="web1"), Row(v="web9")])
    out = checklist(logs, wl, key="host", list_key="v", set_values={"watched": True})
    got = {r.host: r.watched for r in out.collect()}
    assert got["web1"] is True and got["web2"] is None
    dim = spark.createDataFrame([Row(host="web1", dc="us-east"), Row(host="web2", dc="eu-west")])
    enriched = enrich(logs, dim, on="host", select_map={"dc": "datacenter"})
    assert enriched.filter(F.col("datacenter") == "us-east").count() == 2


def test_labels_modify(spark):
    from fluent_bit_spark.operators.labels import (
        columns_to_labels,
        labels_modify,
        labels_to_columns,
    )

    rows = [Row(metric_name="up", host="web1", value=1.0)]
    df = columns_to_labels(spark.createDataFrame(rows), ["host"])
    out = labels_modify(
        df,
        [
            ("insert", "env", "prod"),        # absent -> added
            ("insert", "host", "nope"),       # present -> untouched
            ("update", "missing", "x"),       # absent -> no-op
            ("upsert", "region", "eu"),
            ("hash", "host"),
        ],
    )
    r = labels_to_columns(out, ["env", "host", "region", "missing"]).collect()[0]
    assert r.env == "prod" and r.region == "eu" and r.missing is None
    assert len(r.host) == 64 and r.host != "web1"  # sha256 hex
    out2 = labels_modify(df, [("delete", "host")])
    assert out2.collect()[0].labels == {}


def test_metrics_selector(spark):
    from fluent_bit_spark.operators.metrics_selector import delete_label_value, metrics_selector

    rows = [
        Row(metric_name="http_requests_total", labels={"job": "api"}, value=1.0),
        Row(metric_name="http_errors_total", labels={"job": "api"}, value=2.0),
        Row(metric_name="node_cpu_seconds", labels={"job": "node"}, value=3.0),
    ]
    df = spark.createDataFrame(rows)
    assert metrics_selector(df, "http_", operation_type="prefix").count() == 2
    assert metrics_selector(df, "http_", operation_type="prefix", action="exclude").count() == 1
    assert metrics_selector(df, "errors", operation_type="substring").count() == 1
    assert metrics_selector(df, "^node_.*_seconds$").count() == 1
    assert delete_label_value(df, "job", "node").count() == 2


def test_otel_envelope(spark):
    from fluent_bit_spark.operators.otel_envelope import explode_groups, otel_envelope

    df = spark.createDataFrame([Row(msg="a"), Row(msg="b")])
    out = otel_envelope(df, resource_attributes={"service.name": "svc"}, scope_name="lib")
    r = out.collect()[0]
    assert r.group_metadata.resource_id == 0 and r.scope.name == "lib"
    assert r.resource["service.name"] == "svc"
    g = explode_groups(out).collect()
    assert len(g) == 1 and g[0].n_records == 2


def test_record_hook_codes(spark):
    from fluent_bit_spark.operators.udf_hook import DROP, KEEP, MODIFIED, SPLIT, record_hook

    rows = [
        Row(tag="t", v=1, name="drop-me"),
        Row(tag="t", v=5, name="keep"),
        Row(tag="t", v=10, name="double"),
        Row(tag="t", v=20, name="split"),
    ]

    def cb(tag, ts, rec):
        if rec["name"] == "drop-me":
            return DROP, None, None
        if rec["name"] == "double":
            return MODIFIED, None, {**rec, "v": rec["v"] * 2}
        if rec["name"] == "split":
            return SPLIT, None, [rec, {**rec, "v": rec["v"] + 1}]
        return KEEP, None, None

    out = record_hook(spark.createDataFrame(rows), cb, ts_col="none")
    got = sorted((r.name, r.v) for r in out.collect())
    assert got == [("double", 20), ("keep", 5), ("split", 20), ("split", 21)]


def test_alter_size_and_static_metadata(spark):
    from fluent_bit_spark.operators.misc import alter_size, static_metadata

    rows = [Row(tag="a", i=i) for i in range(5)] + [Row(tag="b", i=i) for i in range(3)]
    df = spark.createDataFrame(rows)
    assert alter_size(df, 2, "take", order_by=["i"]).count() == 4
    dropped = alter_size(df, 2, "drop", order_by=["i"])
    assert dropped.count() == 4
    assert dropped.filter(F.col("tag") == "b").collect()[0].i == 2
    meta = static_metadata(df, {"az": "us-east-1a", "instance": "i-123"}, prefix="aws_")
    r = meta.collect()[0]
    assert r.aws_az == "us-east-1a" and r.aws_instance == "i-123"


def test_chunk_documents(spark):
    from fluent_bit_spark.extensions.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([Row(doc_id=1, text=text), Row(doc_id=2, text="short")])
    out = chunk_documents(df, chunk_tokens=4, overlap=1).orderBy("doc_id", "chunk_idx").collect()
    d1 = [r for r in out if r.doc_id == 1]
    assert len(d1) == 3  # starts at 0, 3, 6 -> ceil((10-1)/3)=3
    assert d1[0].chunk_text == "w0 w1 w2 w3" and d1[0].n_chunk_tokens == 4
    assert d1[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert d1[2].n_chunk_tokens == 4
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "short" and d2[0].n_chunk_tokens == 1


def test_pack_chunks(spark):
    from fluent_bit_spark.extensions.chunking import pack_chunks

    rows = [Row(seq=i, n_chunk_tokens=t) for i, t in enumerate([6, 6, 6, 2, 10, 4])]
    out = pack_chunks(spark.createDataFrame(rows), token_budget=10).orderBy("seq").collect()
    # cumulative starts: 0,6,12,18,20,30 -> packs 0,0,1,1,2,3
    assert [r.pack_id for r in out] == [0, 0, 1, 1, 2, 3]
    assert [r.pack_offset for r in out] == [0, 6, 2, 8, 0, 0]


def test_typecast_uint_converter_wraps_like_strtoumax(spark):
    """flb_typecast.c:111 strtoumax: a negative input WRAPS mod 2^64 to a
    huge nonzero uint64 (success); C isspace() also skips \\r \\v \\f."""
    from decimal import Decimal

    from fluent_bit_spark.typecast import cast_column

    df = spark.createDataFrame(
        [("-1",), ("-5",), ("42",), ("\r\x0b\f 7",), ("0",), ("junk",)], ["v"]
    )
    got = [r.u for r in df.select(cast_column(F.col("v"), "uint", mode="converter").alias("u")).collect()]
    assert got == [
        Decimal(2**64 - 1),
        Decimal(2**64 - 5),
        Decimal(42),
        Decimal(7),
        None,  # parsed 0 == conversion error
        None,
    ]


def test_loki_streams_exact_ns_and_numeric_sort(spark):
    """Epoch-ns must be exact (micros*1000, not a double round-trip) and
    values sorted numerically — a pre-2002 ts has a shorter ns string and
    must still sort first."""
    from fluent_bit_spark.sinks import loki_streams

    rows = [
        Row(timestamp="2024-01-01 00:00:00.000001", app="x", msg="late"),
        Row(timestamp="2001-01-01 00:00:00", app="x", msg="early"),
    ]
    df = spark.createDataFrame(rows).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    out = loki_streams(df, label_keys=["app"]).collect()
    assert len(out) == 1
    vals = out[0]["values"]
    assert [v[1] for v in vals] == ["early", "late"]
    assert vals[0][0] == "978307200000000000"  # 2001-01-01 exact ns
    assert vals[1][0] == "1704067200000001000"  # µs preserved exactly


def test_kubernetes_filter_tag_and_journal(spark):
    """filter_kubernetes parity (kube_regex.h:25-30, kube_meta.c:1786-1800,
    886-976): tag prefix skipped by length, meta regex-derived, pod metadata
    broadcast-joined, workload priority honored."""
    from fluent_bit_spark.operators.kubernetes import (
        kube_journal_meta,
        kubernetes_filter,
    )

    did = "0123456789abcdef" * 4
    df = spark.createDataFrame(
        [
            Row(tag=f"kube.var.log.containers.web-5c9f7b-abcde_prod_nginx-{did}.log", m="a"),
            Row(tag="kube.short", m="b"),  # <= prefix: filter skipped
            Row(tag=f"kube.var.log.containers.db-0_staging_postgres-{did}.log", m="c"),
            Row(tag=f"kube.var.log.containers.solo_dev_app-{did}.log", m="d"),  # no API entry
        ]
    )
    pm = spark.createDataFrame(
        [
            Row(namespace_name="prod", pod_name="web-5c9f7b-abcde", pod_id="u1",
                owner_kind="ReplicaSet", owner_name="web-5c9f7b"),
            Row(namespace_name="staging", pod_name="db-0", pod_id="u2",
                owner_kind="StatefulSet", owner_name="db"),
        ]
    )
    out = {r.m: r.kubernetes for r in kubernetes_filter(df, pm).collect()}
    assert out["b"] is None
    k = out["a"]
    assert (k.pod_name, k.namespace_name, k.container_name) == ("web-5c9f7b-abcde", "prod", "nginx")
    assert k.docker_id == did and k.pod_id == "u1"
    assert k.workload == "web"  # ReplicaSet owner collapsed by DEPLOYMENT_REGEX
    assert out["c"].workload == "db"  # non-ReplicaSet owner passes through
    assert out["d"].workload == "solo" and out["d"].pod_id is None  # podname fallback
    # journald mode: CONTAINER_NAME key, optional .hash segment
    j = spark.createDataFrame(
        [
            Row(CONTAINER_NAME="k8s_app.cafe01_pod-1_ns1_uid_0"),
            Row(CONTAINER_NAME="k8s_app_pod-2_ns2_uid_0"),
        ]
    )
    rows = kube_journal_meta(j).orderBy("pod_name").collect()
    assert [(r.container_name, r.container_hash, r.pod_name, r.namespace_name) for r in rows] == [
        ("app", "cafe01", "pod-1", "ns1"),
        ("app", None, "pod-2", "ns2"),
    ]


def test_geoip_range_enrich(spark):
    """filter_geoip2-shaped interval lookup (geoip2.c:50-66): bucketed
    broadcast hash join, miss keeps NULL attrs, bad IPs parse to NULL."""
    from fluent_bit_spark.operators.lookup import geoip_enrich, ip_to_int

    ranges = spark.createDataFrame(
        [
            (int("0A000000", 16), int("0A00FFFF", 16), "net-a"),  # 10.0.0.0/16
            (int("C0A80000", 16), int("C0A800FF", 16), "net-b"),  # 192.168.0.0/24
        ],
        "range_start long, range_end long, net string",
    )
    df = spark.createDataFrame(
        [
            Row(ip="10.0.3.7", m="a"),
            Row(ip="192.168.0.200", m="b"),
            Row(ip="192.168.1.1", m="c"),  # outside both ranges
            Row(ip="999.1.2.3", m="d"),  # malformed
        ]
    )
    out = {r.m: r.net for r in geoip_enrich(df, ranges, "ip").collect()}
    assert out == {"a": "net-a", "b": "net-b", "c": None, "d": None}
    # spanning a bucket boundary still matches (range wider than 2^16)
    wide = spark.createDataFrame(
        [(int("0A000000", 16), int("0A02FFFF", 16), "wide")],
        "range_start long, range_end long, net string",
    )
    got = geoip_enrich(spark.createDataFrame([Row(ip="10.2.0.1", m="w")]), wide, "ip").collect()
    assert got[0].net == "wide"
    vals = spark.createDataFrame([Row(ip="1.2.3.4")]).select(ip_to_int(F.col("ip")).alias("v"))
    assert vals.collect()[0].v == 16909060


def test_flowcounter_minute_buckets(spark):
    """out_flowcounter (plugins/out_flowcounter/out_flowcounter.c:100-125):
    per-tick record/byte counters with integer per-unit rates, keyed by the
    interval's closing epoch."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fluent_bit_spark.sinks import flowcounter

    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 10), "aaaa"),
        (dt.datetime(2024, 1, 1, 0, 0, 50), "bb"),
        (dt.datetime(2024, 1, 1, 0, 1, 5), "cccccc"),
    ]
    df = spark.createDataFrame(rows, "timestamp timestamp, payload string")
    out = {
        r.until: r
        for r in flowcounter(
            df, unit="minute", size_col=F.octet_length("payload")
        ).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    first, second = out[base + 60], out[base + 120]
    assert (first.counts, first.bytes) == (2, 6)
    assert (second.counts, second.bytes) == (1, 6)
    assert first.counts_per_minute == 0  # integer division by the tick
    assert first.bytes_per_minute == 0
    with pytest.raises(ValueError):
        flowcounter(df, unit="fortnight")


def test_syslog_encode_rfc5424(spark):
    """out_syslog RFC5424 (plugins/out_syslog/syslog.c:229-380): PRI from
    name/digit severity+facility, µs timestamp, field truncation, NILVALUE,
    SD rendering with name sanitization + value escaping, BOM before MSG."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fluent_bit_spark.sinks import syslog_encode

    t0 = dt.datetime(2024, 1, 5, 10, 0, 0, 123456)
    df = spark.createDataFrame(
        [("Err", "local0", "h1", "myapp", "77", "ID1", "disk ]full\\", {"k=y": 'v"1'})],
        "sev string, fac string, host string, app string, procid string, "
        "msgid string, msg string, meta map<string,string>",
    ).withColumn("timestamp", F.lit(t0))
    line = syslog_encode(
        df, format="rfc5424", message_key="msg", hostname_key="host",
        appname_key="app", procid_key="procid", msgid_key="msgid",
        sd_keys=["meta"], severity_key="sev", facility_key="fac",
    ).collect()[0].line
    # pri = 16*8 + 3 = 131; '=' in param name -> '_'; '"' escaped; BOM
    assert line == (
        '<131>1 2024-01-05T10:00:00.123456Z h1 myapp 77 ID1 '
        '[meta k_y="v\\"1"] ﻿disk ]full\\'
    )


def test_syslog_encode_rfc3164_and_presets(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from fluent_bit_spark.sinks import syslog_encode

    t0 = dt.datetime(2024, 3, 7, 9, 5, 6)
    df = spark.createDataFrame(
        [("web-1", "nginx", "12", "boot ok")],
        "host string, app string, pid string, msg string",
    ).withColumn("timestamp", F.lit(t0))
    line = syslog_encode(
        df, format="rfc3164", message_key="msg", hostname_key="host",
        appname_key="app", procid_key="pid",
    ).collect()[0].line
    # presets: facility 1, severity 6 -> <14>; day %2d space-padded
    assert line == "<14>Mar  7 09:05:06 web-1 nginx[12]: boot ok"

    # pre-formatted messages pass through verbatim
    raw = spark.createDataFrame(
        [("<34>1 2003-10-11T22:14:15.003Z mach su - - - raw",)], "msg string"
    ).withColumn("timestamp", F.lit(t0))
    assert (
        syslog_encode(raw, message_key="msg").collect()[0].line
        == "<34>1 2003-10-11T22:14:15.003Z mach su - - - raw"
    )

    with pytest.raises(ValueError):
        syslog_encode(df, format="rfc9999")


def test_http_payload_formats(spark):
    """out_http body framing (plugins/out_http/http.c) + the flb_pack
    json_date_format value grid (src/flb_pack.c:1395-1427)."""
    import datetime as dt
    import json as _json

    from pyspark.sql import functions as F

    from fluent_bit_spark.sinks import http_payload, json_date_value

    t0 = dt.datetime(2024, 1, 1, 0, 0, 1, 250000)
    df = spark.createDataFrame(
        [("a", t0, "m1"), ("a", t0 + dt.timedelta(seconds=1), "m2"), ("b", t0, "m3")],
        "tag string, timestamp timestamp, msg string",
    )
    out = {r.batch: r.body for r in http_payload(
        df, "json", json_date_format="iso8601"
    ).collect()}
    arr = _json.loads(out["a"])
    assert [e["msg"] for e in arr] == ["m1", "m2"]
    assert arr[0]["date"] == "2024-01-01T00:00:01.250000Z"
    assert _json.loads(out["b"]) == [
        {"date": "2024-01-01T00:00:01.250000Z", "msg": "m3"}
    ]

    nd = {r.batch: r.body for r in http_payload(
        df, "json_lines", json_date_format="epoch_ms"
    ).collect()}
    l1, l2 = nd["a"].split("\n")
    assert _json.loads(l1) == {"date": 1704067201250, "msg": "m1"}
    assert _json.loads(l2)["date"] == 1704067202250

    stream = {r.batch: r.body for r in http_payload(
        df, "json_stream", json_date_key=None
    ).collect()}
    assert stream["a"] == '{"msg":"m1"}{"msg":"m2"}'

    grid = df.select(
        json_date_value(F.col("timestamp"), "double").alias("d"),
        json_date_value(F.col("timestamp"), "epoch").alias("e"),
        json_date_value(F.col("timestamp"), "java_sql_timestamp").alias("j"),
    ).collect()[0]
    assert grid.d == 1704067201.25 and grid.e == 1704067201
    assert grid.j == "2024-01-01 00:00:01.250000"

    with pytest.raises(ValueError):
        http_payload(df, "msgpack_v9")
    with pytest.raises(ValueError):
        json_date_value(F.col("timestamp"), "stardate")


def test_plot_lines(spark):
    import datetime as dt

    from fluent_bit_spark.sinks import plot_lines

    t0 = dt.datetime(2024, 1, 1, 0, 0, 1, 500000)
    df = spark.createDataFrame(
        [(t0, 3, 0.5), (t0, None, 1.0)],
        "timestamp timestamp, n long, v double",
    )
    ints = plot_lines(df, "n").collect()
    assert len(ints) == 1 and ints[0].line == "1704067201.500000 3"
    floats = sorted(r.line for r in plot_lines(df, "v").collect())
    assert floats == ["1704067201.500000 0.500000", "1704067201.500000 1.000000"]


def test_http_payload_per_partition_bound(spark):
    """per_partition=True bounds body size by input partition (hot-key
    safety); total record coverage is unchanged."""
    import datetime as dt
    import json as _json

    from fluent_bit_spark.sinks import http_payload

    t0 = dt.datetime(2024, 1, 1)
    rows = [("hot", t0 + dt.timedelta(seconds=i), f"m{i}") for i in range(40)]
    df = spark.createDataFrame(
        rows, "tag string, timestamp timestamp, msg string"
    ).repartition(4)
    out = http_payload(df, "json_lines", per_partition=True).collect()
    assert len(out) > 1                    # hot key split across partitions
    msgs = [
        _json.loads(l)["msg"] for r in out for l in r.body.split("\n")
    ]
    assert sorted(msgs, key=lambda m: int(m[1:])) == [f"m{i}" for i in range(40)]
    assert all(r.batch == "hot" for r in out)


def test_salted_join_spreads_hot_keys(spark):
    """Explicit skew salting: (key, salt) join equals the plain join while
    spreading a hot key over `salt` reducers."""
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.lookup import salted_join

    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 0)], "k string, n long"
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, label string"
    )
    got = salted_join(big, dim, "k", salt=8)
    assert got.count() == 501
    assert got.filter("label IS NULL").count() == 0
    plain = big.join(dim, "k", "left")
    assert (
        got.groupBy("k", "label").count().orderBy("k").collect()
        == plain.groupBy("k", "label").count().orderBy("k").collect()
    )
    with pytest.raises(ValueError):
        salted_join(big, dim, "k", salt=0)


def test_log_to_metrics_summary_approx(spark):
    """approx_quantiles uses the GK sketch — bounded state per group; on
    clean data the q50 must land on the true median."""
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.log_to_metrics import log_to_metrics

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 102)], "g string, v double"
    ).withColumn("timestamp", F.current_timestamp())
    out = log_to_metrics(
        df, "summary", "lat", label_keys=["g"], value_field="v",
        approx_quantiles=True,
    ).collect()[0]
    assert out.q_0_5 == 51.0
    assert out.count_value == 101.0


def test_interval_join_modes_and_overlaps(spark):
    from fluent_bit_spark.operators.lookup import interval_join

    pts = spark.createDataFrame([(1, 5.0), (2, 10.0), (3, 25.0)], ["pid", "x"])
    iv = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 20.0, "b"), (4.0, 6.0, "c")],
        ["lo", "hi", "name"],
    )
    both = {(r["pid"], r["name"]) for r in
            interval_join(pts, iv, "x", bucket_width=8).collect()}
    # x=10 hits both [0,10] and [10,20]; x=5 hits [0,10] and the overlap [4,6]
    assert both == {(1, "a"), (1, "c"), (2, "a"), (2, "b")}
    left = {(r["pid"], r["name"]) for r in
            interval_join(pts, iv, "x", bucket_width=8, closed="left").collect()}
    assert left == {(1, "a"), (1, "c"), (2, "b")}
    import pytest as _pt
    with _pt.raises(ValueError):
        interval_join(pts, iv, "x", closed="open")
    with _pt.raises(ValueError):
        interval_join(pts, iv, "x", bucket_width=0)


def test_interval_join_left_keeps_unmatched_points(spark):
    """Non-inner semantics: the residual bound is part of the join
    condition, so a left join null-extends unmatched points instead of
    silently behaving as inner (the pre-fix failure mode)."""
    from fluent_bit_spark.operators.lookup import interval_join

    pts = spark.createDataFrame([(1, 5.0), (2, 99.0)], ["pid", "x"])
    iv = spark.createDataFrame([(0.0, 10.0, "a")], ["lo", "hi", "name"])
    rows = {r["pid"]: r for r in
            interval_join(pts, iv, "x", bucket_width=8, how="left").collect()}
    assert rows[1]["name"] == "a"
    assert rows[2]["name"] is None and rows[2]["lo"] is None
    anti = [r["pid"] for r in
            interval_join(pts, iv, "x", bucket_width=8, how="left_anti").collect()]
    assert anti == [2]
    semi = [r["pid"] for r in
            interval_join(pts, iv, "x", bucket_width=8, how="left_semi").collect()]
    assert semi == [1]
    import pytest as _pt
    with _pt.raises(ValueError):
        interval_join(pts, iv, "x", how="full")


def test_modify_conditions_snapshot_pre_mutation(spark):
    """r12 review fix: the reference evaluates every condition against
    the record BEFORE applying any rule (modify.c:1486) — a 'set' that
    rewrites a condition key must not disable later rules for the same
    record, and remove_regex must not be able to eat the internal gate
    column."""
    from fluent_bit_spark.operators.modify import Condition, modify

    df = spark.createDataFrame(
        [("debug", "x"), ("info", "y")], "level string, secret string"
    )
    out = modify(
        df,
        [("set", "level", "redacted"), ("remove", "secret")],
        conds=[Condition("key_value_equals", "level", "debug")],
    )
    assert out.columns == ["level", "secret"]
    rows = {r.level: r.secret for r in out.collect()}
    assert rows == {"redacted": None, "info": "y"}
    wiped = modify(
        df, [("remove_regex", ".")],
        conds=[Condition("key_value_equals", "level", "debug")],
    )
    assert wiped.columns == ["level", "secret"]
    assert {(r.level, r.secret) for r in wiped.collect()} == {
        (None, None), ("info", "y")
    }


def test_rewrite_tag_short_tag_parts(spark):
    """r12 review fix: $TAG[n] past the tag's dot-part count renders ''
    (F.get + coalesce), not an ANSI INVALID_ARRAY_INDEX abort and not a
    NULLed-out concat."""
    from fluent_bit_spark.operators.rewrite_tag import rewrite_tag

    df = spark.createDataFrame(
        [("app", "hello"), ("a.b.c", "hello")], "tag string, msg string"
    )
    out = rewrite_tag(df, [("msg", "hell", "new.$TAG[2]", False)])
    tags = sorted(r.tag for r in out.collect())
    assert tags == ["new.", "new.c"]


def test_content_modifier_extract_mixed_groups(spark):
    """r12 review fix: extract maps named groups through _group_indexes
    so unnamed capturing groups don't shift later named captures onto
    the wrong index."""
    from fluent_bit_spark.operators.content_modifier import content_modifier

    df = spark.createDataFrame([("xy42",)], "v string")
    out = content_modifier(
        df, "extract", key="v", pattern="(?<a>x(y|z))(?<b>[0-9]+)"
    ).collect()[0]
    assert out.a == "xy" and out.b == "42"


def test_kube_tag_meta_prefix_boundary(spark):
    """r12 review fix: one character after the kube tag prefix is
    enough for the regex attempt (C: tag_len > prefix_len), while a tag
    of exactly prefix length stays all-NULL."""
    from fluent_bit_spark.operators.kubernetes import (
        DEFAULT_KUBE_TAG_PREFIX, kube_tag_meta,
    )

    p = DEFAULT_KUBE_TAG_PREFIX
    df = spark.createDataFrame(
        [(p,), (p + "x",),
         (p + "app-1_ns_ctr-abcdef0123456789abcdef0123456789"
            "abcdef0123456789abcdef0123456789.log",)],
        "tag string",
    )
    rows = kube_tag_meta(df).collect()
    by_tag = {r.tag: r for r in rows}
    assert by_tag[p].pod_name is None
    # one char past the prefix: regex attempted (no match -> NULL, but
    # the substring path engaged rather than being length-gated away)
    assert by_tag[p + "x"].pod_name is None
    long = [r for r in rows if r.tag.endswith(".log")][0]
    assert long.namespace_name == "ns" and long.pod_name == "app-1"
