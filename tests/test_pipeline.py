"""End-to-end YAML pipeline: inputs -> parser -> grep -> modify ->
rewrite_tag -> stream task -> routed outputs. The fluent-bit
'config is the plan' equivalence."""

import json

from pyspark.sql import functions as F

from fluent_bit_spark.pipeline import load_pipeline


def test_yaml_pipeline_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "app.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({
                "msg": f"GET /page{i % 3} {'500' if i % 5 == 0 else '200'}",
                "host": f"web{i % 2}", "ms": i * 1.5,
            }) + "\n")

    out_dir = tmp_path / "out"
    conf = {
        "parsers": [{
            "name": "access",
            "format": "regex",
            "regex": r"(?P<verb>\S+) (?P<path>\S+) (?P<code>\d+)",
            "types": {"code": "int"},
        }],
        "pipeline": {
            "inputs": [{
                "name": "tail", "format": "json", "path": str(src), "tag": "app.access",
                "schema": "msg string, host string, ms double",
            }],
            "filters": [
                {"name": "parser", "match": "app.*", "parser": "access", "key_name": "msg",
                 "reserve_data": True},
                {"name": "grep", "match": "app.*", "rules": [["regex", "verb", "^GET$"]]},
                {"name": "modify", "match": "*", "rules": [["add", "env", "prod"]]},
                {"name": "rewrite_tag", "match": "app.*",
                 "rules": [["code", "^5..$", "alert.http", "false"]]},
            ],
        },
        "stream_tasks": [
            {"name": "t1",
             "exec": "CREATE STREAM codes AS SELECT code, COUNT(*) AS cnt "
                     "FROM STREAM:pipeline GROUP BY code;"},
        ],
    }
    conf["pipeline"]["outputs"] = [
        {"name": "file", "match": "alert.*", "path": str(out_dir / "alerts"), "format": "json"},
        {"name": "counter", "match": "app.*"},
    ]

    pipe = load_pipeline(spark, conf)
    written = pipe.run_outputs()
    assert written["alert.*"] == 4   # i in {0,5,10,15} -> 500s
    assert written["app.*"] == 16

    alerts = spark.read.json(str(out_dir / "alerts"))
    assert alerts.count() == 4
    assert set(alerts.select("env").distinct().toPandas()["env"]) == {"prod"}

    codes = pipe.sp.sql("SELECT code, cnt FROM STREAM:codes;").collect()
    got = {r.code: r.cnt for r in codes}
    assert got == {200: 16, 500: 4}


def test_conditional_output_routes(spark):
    conf = {
        "pipeline": {
            "inputs": [
                {"name": "dummy", "tag": "svc.a",
                 "records": [{"level": "error", "ms": 900.0},
                             {"level": "info", "ms": 5.0},
                             {"level": "error", "ms": 10.0}]},
            ],
            "outputs": [
                {"name": "counter", "match": "svc.*",
                 "conditions": [["level", "eq", "error"], ["ms", "gt", 100]],
                 "condition_op": "AND"},
                {"name": "counter", "match": "svc.*"},
            ],
        },
    }
    pipe = load_pipeline(spark, conf)
    # first route: error AND ms>100 -> 1; second: everything -> 3
    written = pipe.run_outputs()
    assert written == {"svc.*": 1, "svc.*+": 3}


def test_connector_output_plugins(spark, tmp_path):
    """es/splunk/opentelemetry/loki outputs write their wire payloads
    (file-backed stand-ins for the HTTP push)."""
    import json as _json

    conf = {
        "pipeline": {
            "inputs": [
                {"name": "dummy", "tag": "svc.logs",
                 "records": [{"msg": "boot ok", "level": "info", "event_id": 1},
                             {"msg": "disk full", "level": "error", "event_id": 2}]},
            ],
            "outputs": [
                {"name": "es", "match": "*", "path": str(tmp_path / "es"),
                 "logstash_format": True, "logstash_prefix": "svc", "id_key": "event_id"},
                {"name": "splunk", "match": "*", "path": str(tmp_path / "hec"),
                 "sourcetype": "_json", "source_key": "level"},
                {"name": "opentelemetry", "match": "*", "path": str(tmp_path / "otlp"),
                 "body_key": "msg", "attribute_keys": ["level"]},
                {"name": "loki", "match": "*", "path": str(tmp_path / "loki"),
                 "labels": ["level"], "line_key": "msg"},
            ],
        },
    }
    pipe = load_pipeline(spark, conf)
    written = pipe.run_outputs()
    assert all(n == 2 for n in written.values())

    bulk = [ln for ln in spark.read.text(str(tmp_path / "es")).toPandas()["value"]]
    actions = [_json.loads(l) for l in bulk if '"index"' in l and "_index" in l]
    assert {a["index"]["_id"] for a in actions} == {"1", "2"}
    assert all(a["index"]["_index"].startswith("svc-") for a in actions)

    hec = spark.read.json(str(tmp_path / "hec"))
    assert {r.source for r in hec.collect()} == {"info", "error"}

    from fluent_bit_spark.connectors import otlp_logs_decode
    dec = otlp_logs_decode(spark.read.text(str(tmp_path / "otlp")), "value")
    assert {r.body for r in dec.collect()} == {"boot ok", "disk full"}

    loki = [_json.loads(l) for l in spark.read.text(str(tmp_path / "loki")).toPandas()["value"]]
    assert {s["stream"]["level"] for s in loki} == {"info", "error"}


def test_round2_filters_in_yaml(spark, tmp_path):
    """kubernetes / geoip2 / nightfall / multiline / throttle_size wired
    through the config loader — the user-facing parity surface for the
    round-2 operators."""
    import json as _json

    pods = tmp_path / "pods.json"
    with open(pods, "w") as f:
        f.write(_json.dumps({
            "namespace_name": "prod", "pod_name": "api-1",
            "pod_id": "uid-1", "host": "node-a",
        }) + "\n")
    geodb = tmp_path / "geo.json"
    with open(geodb, "w") as f:
        # 10.0.0.0 - 10.0.0.255
        f.write(_json.dumps({
            "range_start": 167772160, "range_end": 167772415,
            "country_iso": "DE", "city": "Berlin",
        }) + "\n")

    conf = {
        "pipeline": {
            "inputs": [{
                "name": "dummy", "format": "dummy",
                "tag": "kube.var.log.containers.api-1_prod_app-" + "c0ffee01" * 8 + ".log",
                "records": [
                    {"msg": "login ok mail bob@corp.io", "client_ip": "10.0.0.7"},
                    {"msg": "health check", "client_ip": "192.168.9.9"},
                ],
            }],
            "filters": [
                {"name": "kubernetes", "match": "kube.*", "pod_metadata": str(pods)},
                {"name": "geoip2", "match": "*", "database": str(geodb),
                 "lookup_key": "client_ip"},
                {"name": "nightfall", "match": "*", "key": "msg", "flag_key": "pii"},
            ],
        },
    }
    from fluent_bit_spark.pipeline.config import load_pipeline

    pipe = load_pipeline(spark, conf)
    rows = pipe.source().orderBy("client_ip").collect()
    assert len(rows) == 2
    r0 = rows[0]  # 10.0.0.7
    assert r0.kubernetes.namespace_name == "prod" and r0.kubernetes.pod_name == "api-1"
    assert r0.kubernetes.pod_id == "uid-1"
    assert r0.country_iso == "DE" and r0.city == "Berlin"
    assert r0.msg == "login ok mail [REDACTED:email]" and r0.pii == ["email"]
    r1 = rows[1]  # 192.168.9.9 — no geo range, clean text
    assert r1.country_iso is None and r1.pii == []


def test_statsd_input_in_yaml(spark, tmp_path):
    src = tmp_path / "statsd_in"
    src.mkdir()
    with open(src / "datagrams.txt", "w") as f:
        f.write("gorets:1|c\ngaugor:+33|g\nuniques:765|s\nbad-line\n")
    from fluent_bit_spark.pipeline.config import load_pipeline

    pipe = load_pipeline(spark, {
        "pipeline": {"inputs": [{"name": "statsd", "format": "statsd",
                                 "path": str(src), "tag": "metrics.statsd"}]},
    })
    rows = {r.bucket: r for r in pipe.source().collect()}
    assert set(rows) == {"gorets", "gaugor", "uniques"}
    assert rows["gaugor"].incremental == 1 and rows["uniques"].value_str == "765"


def test_telemetry_output_plugins(spark, tmp_path):
    """influxdb/datadog/flowcounter outputs write their wire payloads
    (file-backed stand-ins, same pattern as the es/splunk routes)."""
    import json as _json

    conf = {
        "pipeline": {
            "inputs": [
                {"name": "dummy", "tag": "metrics.cpu",
                 "records": [{"host": "a", "load": 0.5, "n": 3},
                             {"host": "b", "load": 1.5, "n": 4}]},
            ],
            "outputs": [
                {"name": "influxdb", "match": "*", "path": str(tmp_path / "influx"),
                 "tag_keys": ["host"], "add_integer_suffix": True},
                {"name": "datadog", "match": "*", "path": str(tmp_path / "dd"),
                 "dd_source": "spark", "include_tag_key": True,
                 "dd_message_key": "host"},
                {"name": "flowcounter", "match": "*", "path": str(tmp_path / "fc"),
                 "unit": "second"},
            ],
        },
    }
    pipe = load_pipeline(spark, conf)
    written = pipe.run_outputs()
    assert all(n == 2 for n in written.values())

    lines = sorted(spark.read.text(str(tmp_path / "influx")).toPandas()["value"])
    assert lines[0].startswith("metrics.cpu,host=a ")
    assert "load=0.500000" in lines[0] and "n=3i" in lines[0]

    dd = spark.read.json(str(tmp_path / "dd"))
    rows = dd.collect()
    assert {r.message for r in rows} == {"a", "b"}
    assert all(r.ddsource == "spark" and r.tagkey == "metrics.cpu" for r in rows)

    fc = spark.read.json(str(tmp_path / "fc")).collect()
    assert sum(r.counts for r in fc) == 2


def test_syslog_output_plugin(spark, tmp_path):
    conf = {
        "pipeline": {
            "inputs": [
                {"name": "dummy", "tag": "sys.app",
                 "records": [{"message": "hello", "host": "h1", "level": "err"}]},
            ],
            "outputs": [
                {"name": "syslog", "match": "*", "path": str(tmp_path / "sl"),
                 "syslog_format": "rfc3164", "syslog_hostname_key": "host",
                 "syslog_severity_key": "level"},
            ],
        },
    }
    pipe = load_pipeline(spark, conf)
    assert all(n == 1 for n in pipe.run_outputs().values())
    line = spark.read.text(str(tmp_path / "sl")).collect()[0].value
    assert line.startswith("<11>") and line.endswith(" h1 hello")


def test_exec_input_opt_in(spark, tmp_path):
    """[INPUT] Name exec runs only with Allow_Exec true in the config."""
    import pytest as _pytest

    conf = {
        "pipeline": {
            "inputs": [{"name": "exec", "command": "printf 'x\\ny\\n'",
                        "allow_exec": True, "tag": "cmd.out"}],
            "outputs": [{"name": "null", "match": "*"}],
        },
    }
    pipe = load_pipeline(spark, conf)
    assert pipe.run_outputs() == {"*": 2}

    conf["pipeline"]["inputs"][0]["allow_exec"] = False
    with _pytest.raises(PermissionError):
        load_pipeline(spark, conf)


def test_syslog_sd_key_string_normalized(spark, tmp_path):
    """Classic .conf delivers list options as bare strings; a lone string in
    sd_keys must select the named column, not iterate its characters
    (regression: structured data silently became '-')."""
    conf = {
        "pipeline": {
            "inputs": [
                {"name": "dummy", "tag": "sys.app",
                 "records": [{"message": "hi", "sdid": {"k": "v"}}]},
            ],
            "outputs": [
                {"name": "syslog", "match": "*", "path": str(tmp_path / "sl"),
                 "syslog_format": "rfc5424", "syslog_sd_key": "sdid"},
            ],
        },
    }
    pipe = load_pipeline(spark, conf)
    counts = pipe.run_outputs()
    assert all(n == 1 for n in counts.values())
    line = spark.read.text(str(tmp_path / "sl")).collect()[0].value
    assert "sdid" in line or "x@1" in line  # SD present, not '-'


def test_classic_conf_end_to_end(spark, tmp_path, monkeypatch):
    """Classic-mode .conf (src/config_format/flb_cf_fluentbit.c): sections,
    repeated filter keys -> rule lists, @SET/@INCLUDE/${} expansion, the
    [STREAM_TASK] hookup, and a [PARSER] from parsers.conf."""
    monkeypatch.setenv("APP_TAG", "svc.app")

    (tmp_path / "parsers.conf").write_text(
        "[PARSER]\n"
        "    Name    kvpairs\n"
        "    Format  logfmt\n"
        "    Fields  level size\n"
    )
    conf = tmp_path / "fluent-bit.conf"
    conf.write_text(
        "@SET out_dir=" + str(tmp_path) + "\n"
        "@INCLUDE parsers.conf\n"
        "# comment line\n"
        "[SERVICE]\n"
        "    Flush        1\n"
        "[INPUT]\n"
        "    Name    dummy\n"
        "    Tag     ${APP_TAG}\n"
        "    Dummy   {\"log\": \"level=info size=42\", \"n\": 1}\n"
        "    Samples 3\n"
        "[FILTER]\n"
        "    Name    parser\n"
        "    Match   svc.*\n"
        "    Key_Name log\n"
        "    Parser  kvpairs\n"
        "    Reserve_Data true\n"
        "[FILTER]\n"
        "    Name    grep\n"
        "    Match   *\n"
        "    Regex   level info\n"
        "[FILTER]\n"
        "    Name    modify\n"
        "    Match   *\n"
        "    Set     env prod\n"
        "    Rename  size bytes\n"
        "[OUTPUT]\n"
        "    Name    file\n"
        "    Match   *\n"
        "    Path    ${out_dir}/out\n"
        "    Format  json\n"
    )
    pipe = load_pipeline(spark, str(conf))
    written = pipe.run_outputs()
    assert all(n == 3 for n in written.values())
    rows = spark.read.json(str(tmp_path / "out")).collect()
    assert len(rows) == 3
    r = rows[0]
    assert r.level == "info" and r.env == "prod" and r.bytes == "42"
    assert r.tag == "svc.app" and r.n == 1


def test_classic_conf_rewrite_and_stream_task(spark, tmp_path):
    conf = (
        "[INPUT]\n"
        "    Name    dummy\n"
        "    Tag     app.a\n"
        "    Dummy   {\"msg\": \"x\", \"value\": 10}\n"
        "    Samples 4\n"
        "[STREAM_TASK]\n"
        "    Name    agg\n"
        "    Exec    CREATE STREAM agg AS SELECT SUM(value) AS total FROM STREAM:pipeline;\n"
    )
    pipe = load_pipeline(spark, conf)
    got = pipe.sp.streams["agg"].collect()
    assert got[0].total == 40.0


def test_classic_multiline_parser_custom_rules(spark, tmp_path):
    """[MULTILINE_PARSER] rule tables (flb_ml_rule.c) flow from classic
    config into the state-machine reassembler."""
    conf = (
        "[MULTILINE_PARSER]\n"
        "    Name          exc\n"
        "    Type          regex\n"
        '    Rule "start_state" "/^BEGIN/" "body"\n'
        '    Rule "body" "/^  /" "body"\n'
        "[INPUT]\n"
        "    Name    dummy\n"
        "    Tag     app.ml\n"
        '    Dummy   {"seq": 1, "line": "BEGIN trace"}\n'
        "[FILTER]\n"
        "    Name              multiline\n"
        "    Match             *\n"
        "    multiline.parser  exc\n"
        "    Key_content       line\n"
        "    Seq_key           seq\n"
        "[OUTPUT]\n"
        "    Name   null\n"
        "    Match  *\n"
    )
    from fluent_bit_spark.pipeline.config import load_pipeline as lp

    pipe = lp(spark, conf)
    assert [r.message for r in pipe.source().collect()] == ["BEGIN trace"]

    lines = spark.createDataFrame(
        [(1, "BEGIN trace"), (2, "  frame a"), (3, "  frame b"), (4, "BEGIN other")],
        "seq long, line string",
    )
    from fluent_bit_spark.operators.multiline import MLRule, multiline_rules

    from fluent_bit_spark.pipeline.classic import classic_to_dict

    d = classic_to_dict(conf)
    mlp = d["multiline_parsers"][0]
    assert mlp["name"] == "exc"
    assert mlp["rules"] == [
        ["start_state", "^BEGIN", "body"], ["body", "^  ", "body"],
    ]
    table = [MLRule((r[0],), r[1], r[2]) for r in mlp["rules"]]
    msgs = [r.message for r in multiline_rules(lines, table).orderBy("seq").collect()]
    assert msgs == ["BEGIN trace\n  frame a\n  frame b", "BEGIN other"]


def test_cloud_output_plugins(spark, tmp_path):
    """kinesis/azure/logdna/nats/slack/td/remote_write/plot routes write
    their wire payloads (file-backed stand-ins)."""
    conf = {
        "pipeline": {
            "inputs": [
                {"name": "dummy", "tag": "m.cpu",
                 "records": [{"metric": "load", "value": 0.5, "host": "a"},
                             {"metric": "load", "value": 1.5, "host": "b"}]},
            ],
            "outputs": [
                {"name": "kinesis_streams", "match": "*", "path": str(tmp_path / "kin")},
                {"name": "azure", "match": "*", "path": str(tmp_path / "az"),
                 "time_generated": True},
                {"name": "logdna", "match": "*", "path": str(tmp_path / "ld"), "app": "x"},
                {"name": "nats", "match": "*", "path": str(tmp_path / "nats")},
                {"name": "slack", "match": "*", "path": str(tmp_path / "sl")},
                {"name": "td", "match": "*", "path": str(tmp_path / "td")},
                {"name": "prometheus_remote_write", "match": "*",
                 "path": str(tmp_path / "rw"), "label_keys": ["host"]},
                {"name": "plot", "match": "*", "path": str(tmp_path / "plot"),
                 "key": "value"},
            ],
        },
    }
    pipe = load_pipeline(spark, conf)
    written = pipe.run_outputs()
    assert all(n == 2 for n in written.values())
    assert spark.read.json(str(tmp_path / "kin")).count() == 2
    az = spark.read.json(str(tmp_path / "az")).collect()
    assert all(r.log_type == "fluentbit" for r in az)
    assert spark.read.json(str(tmp_path / "ld")).collect()[0].app == "x"
    assert spark.read.json(str(tmp_path / "nats")).count() == 1  # one subject
    assert spark.read.text(str(tmp_path / "sl")).count() == 1
    assert spark.read.parquet(str(tmp_path / "td")).count() == 2
    from fluent_bit_spark.connectors import remote_write_decode

    rw = remote_write_decode(spark.read.parquet(str(tmp_path / "rw")).select("body"))
    assert rw.count() == 2
    lines = [r.value for r in spark.read.text(str(tmp_path / "plot")).collect()]
    assert sorted(l.split(" ")[1] for l in lines) == ["0.500000", "1.500000"]


def test_content_modifier_and_log_to_metrics_routes(spark):
    from fluent_bit_spark.pipeline import load_pipeline

    conf = {
        "pipeline": {
            "inputs": [
                {
                    "name": "parquet",
                    "path": "/root/testdata/sf0.001/events.parquet",
                    "tag": "ev.app",
                    "time_key": "ts",
                }
            ],
            "filters": [
                {
                    "name": "content_modifier",
                    "match": "ev.*",
                    "action": "insert",
                    "key": "source",
                    "value": "edge",
                },
                {
                    "name": "log_to_metrics",
                    "match": "ev.*",
                    "metric_mode": "counter",
                    "metric_name": "events_total",
                    "label_field": "event_type",
                },
            ],
            "outputs": [{"name": "null", "match": "*"}],
        }
    }
    pipe = load_pipeline(spark, conf)
    rows = pipe.source().collect()
    # filter replaced log records with one metric record per event_type
    assert {r["metric_name"] for r in rows} == {"events_total"}
    assert {r["metric_type"] for r in rows} == {"counter"}
    assert sum(r["value"] for r in rows) == 1000
    assert len(rows) == 5
    counts = pipe.run_outputs()
    assert counts["*"] == 5


def test_yaml_processors_section(spark):
    """Entry point C: processors attached to an input run in config order
    before filters; output-attached processors run on the routed stream."""
    from fluent_bit_spark.pipeline import load_pipeline

    conf = {
        "pipeline": {
            "inputs": [
                {
                    "name": "parquet",
                    "path": "/root/testdata/sf0.001/events.parquet",
                    "tag": "ev.app",
                    "time_key": "ts",
                    "processors": {
                        "logs": [
                            {"name": "content_modifier", "action": "insert",
                             "key": "stage", "value": "ingest"},
                            {"name": "sql",
                             "query": "SELECT event_id, event_type, stage "
                                      "FROM STREAM:stream WHERE event_type = 'error';"},
                        ]
                    },
                }
            ],
            "outputs": [
                {
                    "name": "null",
                    "match": "*",
                    "processors": {
                        "logs": [
                            {"name": "sampling", "percentage": 50.0,
                             "key": "event_id"}
                        ]
                    },
                }
            ],
        }
    }
    pipe = load_pipeline(spark, conf)
    src = pipe.source()
    assert set(src.columns) >= {"event_id", "event_type", "stage"}
    n_src = src.count()
    assert n_src == 201                      # error records only
    assert src.filter(F.col("stage") == "ingest").count() == n_src
    counts = pipe.run_outputs()
    assert 0 < counts["*"] < n_src           # ~50% deterministic sample

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown processor"):
        load_pipeline(spark, {
            "pipeline": {"inputs": [{
                "name": "parquet",
                "path": "/root/testdata/sf0.001/events.parquet",
                "tag": "t", "time_key": "ts",
                "processors": {"logs": [{"name": "bogus"}]},
            }], "outputs": []}
        })


def test_prometheus_exporter_output_route(spark, tmp_path):
    """log_to_metrics filter feeding the prometheus_exporter output: the
    full fluent-bit log->metric->exposition chain from one config."""
    from fluent_bit_spark.pipeline import load_pipeline

    out_dir = str(tmp_path / "prom")
    conf = {
        "pipeline": {
            "inputs": [{
                "name": "parquet",
                "path": "/root/testdata/sf0.001/events.parquet",
                "tag": "ev.app", "time_key": "ts",
            }],
            "filters": [{
                "name": "log_to_metrics", "match": "ev.*",
                "metric_mode": "counter", "metric_name": "ev_total",
                "label_field": "event_type", "tag": "metrics.ev",
            }],
            "outputs": [{
                "name": "prometheus_exporter", "match": "metrics.*",
                "path": out_dir, "label_keys": "event_type",
                "add_label": "env prod", "value_format": "long",
            }],
        }
    }
    pipe = load_pipeline(spark, conf)
    pipe.run_outputs()
    lines = sorted(r.value for r in spark.read.text(out_dir).collect())
    assert "# TYPE ev_total counter" in lines
    samples = [l for l in lines if not l.startswith("#")]
    assert len(samples) == 5
    assert all('env="prod"' in s and s.startswith("ev_total{") for s in samples)
    total = sum(int(s.rsplit(" ", 1)[1]) for s in samples)
    assert total == 1000
