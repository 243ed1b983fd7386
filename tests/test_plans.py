"""Physical-plan regression guards for the 100 TB scale properties.

Correctness tests prove the operators compute the right answer at small
SF; these prove the *plans* keep the shape that survives a 1000-executor
cluster: filters reach the parquet scan, small join sides broadcast, no
cartesian products sneak in, and the pure-Catalyst operators stay free of
row/batch Python eval nodes. A refactor that silently turns a broadcast
join into a shuffle join, or drops a pushed filter, fails here — not in a
benchmark three rounds later.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


# operators whose contract is "pure Catalyst, whole-stage codegen, no
# Python in the plan" — the scan-speed tier
PURE_JVM = [
    "q1_pricing_summary",
    "sp_projection",
    "sp_window_tumbling",
    "grep_filter",
    "text_quality",
    "text_langid",
    "doc_fingerprint",
    "pii_redaction",
    "text_repetition",
    "c4_clean_docs",
    "line_dedup",
    "dedup_exact",
    "similarity_topk",
    "throttle_rate",
    "cumulative_to_delta",
    "influxdb_lines",
    "syslog_5424_lines",
    "sketch_distinct",
    "sketch_rollup",
    "sketch_quantiles",
    "sketch_overlap",
    "ts_downsample",
    "ts_gapfill_locf",
    "ts_rate",
    "sketch_ranks",
    "interval_band_join",
    "gopher_quality",
    "url_canonicalize",
    "lm_quality",
]

PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


@pytest.mark.parametrize("name", PURE_JVM)
def test_no_python_eval_nodes(spark, name):
    plan = plan_of(spark, name)
    hits = [n for n in PY_NODES if n in plan]
    assert not hits, f"{name}: Python eval nodes {hits} in physical plan"


@pytest.mark.parametrize("name", PURE_JVM)
def test_whole_stage_codegen_present(spark, name):
    # formatted explain marks fused operators with "[codegen id : N]";
    # under AQE the annotation only materializes at execution time, so an
    # AdaptiveSparkPlan root is accepted as codegen-eligible (the
    # no-Python-nodes test above is the strong guard either way)
    plan = plan_of(spark, name)
    assert "codegen id" in plan or "AdaptiveSparkPlan" in plan


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # the shipdate predicate must reach the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]
    # column pruning: comment/name columns must not be read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema


@pytest.mark.parametrize(
    "name",
    ["join_q3_shipping", "join_q5_region", "checklist_watch", "kubernetes_enrich",
     "geoip_enrich", "enrich_broadcast_join", "decontaminate"],
)
def test_joins_broadcast_not_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan, (
        f"{name}: no broadcast join and a nested-loop fallback present"
    )


@pytest.mark.parametrize("name", ["join_q3_shipping", "join_q5_region"])
def test_tpch_joins_use_broadcast(spark, name):
    # dims (customer/region/nation) are explicitly broadcast
    assert "BroadcastHashJoin" in plan_of(spark, name)


def _exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_line_dedup_bounded_shuffles(spark):
    # frequency pass (partial-agg exchange), join-back exchange on the
    # shared line key, and the doc-id rebuild exchange; more means a lost
    # co-partitioning
    plan = plan_of(spark, "line_dedup")
    assert _exchanges(plan) <= 4, plan


def test_exact_dedup_single_agg_shuffle(spark):
    plan = plan_of(spark, "dedup_exact")
    # one hash-partitioned exchange for the hash groupBy; a second for the
    # min-id tie-break join at most
    assert _exchanges(plan) <= 3, plan


def test_minhash_dedup_runtime_exchange_reuse(spark):
    """RUNTIME guard for the dedup_minhash plan bet: on a file-scan source
    the signature subtree appears once per band in the STATIC plan (dozens
    of exchanges), and we deliberately rely on AQE's ReusedExchange —
    measured faster than an explicit persist in this regime — to collapse
    them at execution. If a refactor or a conf change ever breaks that
    reuse, the static plan would silently materialize for real; this
    asserts the EXECUTED adaptive plan still contains ReusedExchange
    nodes. clearCache() first: any cached table whose plan overlaps the
    query defeats exchange canonicalization (see the cached-source test
    below) and would make this guard test the wrong regime."""
    import re

    spark.catalog.clearCache()

    def reuse_count():
        df = entry.dedup_minhash_raw(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # reuse surfaces two ways in the final adaptive plan depending on
        # when stages materialize relative to replanning: an explicit
        # ReusedExchange node, or the SAME query-stage id at multiple sites
        stages = re.findall(r"(ShuffleQueryStage|BroadcastQueryStage) (\d+)", plan)
        return plan.count("ReusedExchange") + (len(stages) - len(set(stages)))

    # one retry: identical exchanges racing to materialize can defeat reuse
    # detection on a single run (timing, not structure). A DETERMINISTIC
    # regression — reuse conf off, canonicalization broken — fails twice.
    assert reuse_count() >= 1 or reuse_count() >= 1, (
        "AQE no longer reuses the repeated signature exchange — "
        "re-measure persist vs reuse before shipping this plan"
    )


def test_minhash_dedup_survives_cached_source(spark):
    """The cliff the reuse bet falls off: a .cache()d source substitutes
    InMemoryTableScan into every signature reference, which breaks AQE's
    canonical plan equality — measured, the 6 reused exchanges become ~80
    independently-executed stages, re-running the Arrow signature pass
    once per band. minhash_dedup(signature_reuse='auto') must detect the
    cached source and switch to an eagerly-materialized local checkpoint
    of the signature frame, so the executed plan reads signature blocks
    instead of recomputing the subtree per band."""
    import re

    from fluent_bit_spark.model import load_table

    cached = load_table(spark, SF_DIR, "documents").cache()
    cached.count()
    try:
        df = entry.dedup_minhash_raw(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # signature columns served from the materialized checkpoint RDD
        assert re.search(r"Scan ExistingRDD[^\n]*\bsig#", plan), plan[:2000]
        # and the Arrow signature UDF is GONE from the executed query
        assert "ArrowEvalPython" not in plan
    finally:
        cached.unpersist()
        spark.catalog.clearCache()
