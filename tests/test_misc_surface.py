"""Behavioral coverage for the small utility surface that larger suites
only exercise indirectly — every public function a migrating user can
call gets at least one direct contract check."""

import json

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.model import TAG_COL, TS_COL, load_all, with_tag

SF = "/root/testdata/sf0.001"


def test_load_all_and_with_tag(spark):
    tables = load_all(spark, SF)
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    assert tables["region"].count() == 5
    tagged = with_tag(tables["region"], "dim.region")
    assert tagged.select(TAG_COL).distinct().collect()[0][0] == "dim.region"


def test_debug_stdout_passthrough(spark, capsys):
    from fluent_bit_spark.operators.misc import debug_stdout

    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = debug_stdout(df, n=1)
    assert out is df                       # identity, not a copy
    assert "x" in capsys.readouterr().out  # sample actually printed


def test_stream_sink_writes_checkpointed_files(spark, tmp_path):
    from fluent_bit_spark.sinks import stream_sink
    from fluent_bit_spark.streaming.sources import tail_source

    d = tmp_path / "in"
    d.mkdir()
    with open(d / "in.json", "w") as f:
        for i in range(5):
            f.write(json.dumps({"v": i}) + "\n")
    sdf = tail_source(spark, str(d), fmt="json", schema="v long")
    q = stream_sink(
        sdf.select("v"), str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"), trigger_once=True,
    )  # returns an already-started StreamingQuery
    q.awaitTermination(120)
    assert sorted(
        r.v for r in spark.read.parquet(str(tmp_path / "out")).collect()
    ) == [0, 1, 2, 3, 4]
    assert (tmp_path / "ck").exists()      # offsets survive for resume


def test_kafka_source_and_sink_wiring(spark, tmp_path):
    """No broker/connector jar in this container: the functions must fail
    at the Spark DataSource boundary (provider lookup / broker connect),
    proving the envelope wiring is reached — not with a Python-side error
    in our code."""
    from fluent_bit_spark.connectors import kafka_sink
    from fluent_bit_spark.streaming.sources import kafka_source

    try:
        df = kafka_source(spark, "localhost:9092", "t")
        # connector jar present: envelope columns must be standardized
        assert {TAG_COL, TS_COL, "key", "value"} <= set(df.columns)
    except Exception as ex:
        assert "kafka" in str(ex).lower()

    from fluent_bit_spark.streaming.sources import dummy_source

    ev = dummy_source(spark).select(
        "tag", F.col("timestamp"), F.col("seq").alias("event_id"),
        F.lit("t").alias("dest"),
    )
    try:
        w = kafka_sink(
            ev, "localhost:9092", ["t"], str(tmp_path / "ck"),
            topic_key="dest",
        )
        w.start().awaitTermination(5)
    except Exception as ex:
        assert "kafka" in str(ex).lower()


def test_real_decode_and_ngram_wrapper(spark):
    from fluent_bit_spark.extensions.dedup import ngram_jaccard_dedup
    from fluent_bit_spark.extensions.multimodal import make_png, real_decode

    meta = real_decode(make_png(12, 34), "image")
    assert (meta["format"], meta["width"], meta["height"]) == ("png", 12, 34)
    assert real_decode(b"", "image")["format"] == "unknown"

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "one two three four five six "),   # whitespace twin
            (3, "totally different words here now"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in ngram_jaccard_dedup(docs, threshold=0.8).collect())
    assert kept == [1, 3]


def test_profile_columns_single_pass(spark):
    """One-agg long-format profile: exact rows/nulls/min/max per column,
    HLL distinct within tolerance, no per-column jobs (the plan holds a
    single aggregate), and empty column lists refuse."""
    import pytest
    from pyspark.sql import functions as F

    from fluent_bit_spark.extensions.sketches import profile_columns

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, None, 2.5), (4, "a", None)],
        ["id", "s", "v"],
    )
    out = {r.column: r for r in profile_columns(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["s"].n_nulls == 1 and out["v"].n_nulls == 2
    assert out["id"].min_value == "1" and out["id"].max_value == "4"
    assert out["s"].min_value == "a" and out["s"].max_value == "b"
    # ordering is type-native, not lexicographic over the string form:
    # a [9, 10] column must profile as min=9 / max=10
    two = spark.createDataFrame([(9,), (10,)], ["x"])
    px = {r.column: r for r in profile_columns(two).collect()}
    assert px["x"].min_value == "9" and px["x"].max_value == "10"
    # small cardinalities are exact under HLL
    assert out["s"].approx_distinct == 2
    assert out["id"].approx_distinct == 4
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(df, [])
    # single aggregation: exactly one HashAggregate pair in the plan
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    import re
    n_aggs = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    assert n_aggs <= 4, plan[:1500]
