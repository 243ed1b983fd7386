"""Log template mining: cluster raw log lines into message templates.

Simplified Drain (He et al., "Drain: An Online Log Parsing Approach
with Fixed Depth Tree", ICWS'17 — public research; the simplification
keeps its two strongest signals): lines group by (token count, first
token), and within a group each token position becomes either the
single constant token observed there or the ``<*>`` wildcard. The
output is the template table a log-analytics user builds dashboards
on — the capability layer above the engine's parser family
(fluent-bit parses known formats; this discovers unknown ones).

Spark-first shape: tokenize in the scan, ONE posexplode shuffle keyed
by (group, position) for the per-position distinct counts, then a
group-keyed template assembly — no Python, no iteration, deterministic
(wildcard iff a position saw >1 distinct token). At 100 TB the
shuffle rows are (group key, position, token) triples; the raw line
never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(col, r"\s+", " ")), " ")


def log_templates(
    df: DataFrame,
    msg_col: str = "message",
) -> DataFrame:
    """(template, n_lines): discovered message templates and their
    support. Lines group by (token count, first token); a position is
    kept verbatim iff every line in the group agrees on it, else it
    becomes ``<*>``. Empty messages are dropped."""
    base = (
        df.select(_tokens(F.col(msg_col).cast("string")).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .where((F.col("__n") > 0) & (F.col("__toks")[0] != ""))
        .withColumn("__first", F.col("__toks")[0])
    )
    pos = base.select(
        "__n", "__first", F.posexplode("__toks").alias("__pos", "__tok")
    )
    per_pos = pos.groupBy("__n", "__first", "__pos").agg(
        F.countDistinct("__tok").alias("__d"),
        F.min("__tok").alias("__one"),
    )
    tmpl = per_pos.groupBy("__n", "__first").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "__pos",
                            F.when(F.col("__d") == 1, F.col("__one"))
                            .otherwise(F.lit("<*>"))
                            .alias("__t"),
                        )
                    )
                ),
                lambda s: s["__t"],
            ),
            " ",
        ).alias("template")
    )
    counts = base.groupBy("__n", "__first").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    return tmpl.join(counts, ["__n", "__first"]).select("template", "n_lines")
