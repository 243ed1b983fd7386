"""Dataset-layout tests: partition pruning, file sizing, row-group sort."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from fluent_bit_spark.model import load_table
from fluent_bit_spark.storage import with_date_bucket, write_dataset

SF_DIR = "/root/testdata/sf0.001"


def test_write_dataset_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "ds")
    ev = with_date_bucket(load_table(spark, SF_DIR, "events"))
    write_dataset(
        ev,
        out,
        partition_by=["dt", "event_type"],
        sort_by=["ts"],
        target_rows_per_file=200,
    )
    # layout: dt=.../event_type=... directories exist
    assert glob.glob(os.path.join(out, "dt=*", "event_type=*", "*.parquet"))

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # a filter on the partition columns must prune at listing time
    q = back.filter((F.col("event_type") == "error") & (F.col("dt") >= "2024-01-01"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = q._jdf.queryExecution().explainString(mode)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in pf and "dt" in pf
    assert q.count() == ev.filter(F.col("event_type") == "error").count()


def test_write_dataset_file_sizing_and_sort(spark, tmp_path):
    out = str(tmp_path / "sized")
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "value")
    write_dataset(ev, out, sort_by=["ts"], target_rows_per_file=1000)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files, "no files written"
    # every file respects the cap
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 1000
    # rows inside each file are time-sorted (row-group stats usable)
    for f in files[:3]:
        ts = [r["ts"] for r in spark.read.parquet(f).select("ts").collect()]
        assert ts == sorted(ts)


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    import re

    from fluent_bit_spark.storage import write_bucketed_table

    ev = load_table(spark, SF_DIR, "events")
    write_bucketed_table(
        ev.select("event_id", "user_id", "value"), "ev_b", ["user_id"], 8
    )
    write_bucketed_table(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")), "usr_b", ["user_id"], 8
    )
    try:
        j = spark.table("ev_b").join(spark.table("usr_b"), "user_id")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        # co-located: the sort-merge join reads both bucketed scans with
        # zero runtime exchanges
        assert not re.findall(r"\(\d+\) Exchange", plan), plan
        assert j.count() == ev.count()
        # aggregation on the bucket key also skips its shuffle
        agg = spark.table("ev_b").groupBy("user_id").agg(F.sum("value"))
        aplan = agg._jdf.queryExecution().explainString(mode)
        assert not re.findall(r"\(\d+\) Exchange", aplan), aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS usr_b")


def test_zorder_key_matches_python_morton(spark):
    from fluent_bit_spark.storage import zorder_key

    def morton(a, b, bits=16):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    rows = [(i, (i * 7919) % 65536, (i * 104729) % 65536) for i in range(200)]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = {r["i"]: r["z"] for r in df.select("i", zorder_key("a", "b").alias("z")).collect()}
    for i, a, b in rows:
        assert got[i] == morton(a, b)

    # locality: sorting by z clusters both dimensions into bounded ranges
    import pytest as _pt
    with _pt.raises(ValueError):
        zorder_key("a", "b", bits=0)
