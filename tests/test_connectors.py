"""Connector payload-shaping tests: out_es bulk, out_splunk HEC, OTLP logs
encode/decode roundtrip (plugins/out_es, plugins/out_splunk,
plugins/{in,out}_opentelemetry)."""

import json

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark import get_spark
from fluent_bit_spark.connectors import (
    es_bulk,
    otlp_logs_decode,
    otlp_logs_encode,
    splunk_hec,
)


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (1, "2024-01-05 10:00:00.123456", "error", "disk full", "hostA"),
            (2, "2024-02-07 11:30:00.500000", "info", "ok", "hostB"),
        ],
        "event_id long, ts string, level string, msg string, host string",
    ).withColumn("timestamp", F.to_timestamp("ts")).drop("ts")


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_es_bulk_logstash_rotation_and_id(ev):
    out = es_bulk(
        ev, logstash_format=True, logstash_prefix="logs", id_key="event_id"
    ).orderBy("_id")
    rows = out.collect()
    assert rows[0]._index == "logs-2024.01.05"
    assert rows[1]._index == "logs-2024.02.07"
    action = json.loads(rows[0].action_line)
    assert action == {"index": {"_index": "logs-2024.01.05", "_id": "1"}}
    doc = json.loads(rows[0].doc_line)
    assert doc["msg"] == "disk full" and doc["level"] == "error"
    assert "timestamp" not in doc  # ts_col excluded from the doc by default


def test_es_bulk_static_index_no_id(ev):
    rows = es_bulk(ev, index="fixed").collect()
    for r in rows:
        assert r._index == "fixed"
        assert json.loads(r.action_line) == {"index": {"_index": "fixed"}}


def test_splunk_hec_promotion(ev):
    rows = (
        splunk_hec(
            ev, source="app", sourcetype="_json", host_key="host", index="main"
        )
        .orderBy("time_us")
        .collect()
    )
    r = rows[0]
    assert r.host == "hostA" and r.source == "app" and r["index"] == "main"
    assert r.time_us == 1704448800123456
    body = json.loads(r.event)
    assert body["msg"] == "disk full"
    assert "host" not in body  # promoted key removed from event body


def test_splunk_send_raw(ev):
    rows = splunk_hec(ev, send_raw=True).collect()
    assert set(rows[0].asDict()) == {"raw"}
    assert json.loads(rows[0].raw)["event_id"] in (1, 2)


def test_otlp_roundtrip(ev):
    enc = otlp_logs_encode(
        ev,
        body_col="msg",
        attr_cols=["event_id", "level"],
        resource_attributes={"service.name": "svc"},
        scope_name="scope1",
        batch_col="level",
    )
    assert enc.count() == 2  # one request per batch key
    dec = otlp_logs_decode(enc).orderBy("timestamp")
    rows = dec.collect()
    assert [r.body for r in rows] == ["disk full", "ok"]
    assert rows[0].attributes == {"event_id": "1", "level": "error"}
    assert rows[0].resource == {"service.name": "svc"}
    assert rows[0].scope_name == "scope1"
    # microsecond-exact timestamp survives the nano encode
    src = ev.orderBy("timestamp").collect()
    assert [r.timestamp for r in rows] == [r.timestamp for r in src]
