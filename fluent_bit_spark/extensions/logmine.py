"""Log template mining: cluster raw log lines into message templates.

Simplified Drain (He et al., "Drain: An Online Log Parsing Approach
with Fixed Depth Tree", ICWS'17 — public research; the simplification
keeps its strongest signals): lines group by (token count, first
token), then — level 2, mirroring Drain's fixed-depth token tree — each
group is sub-split on its most-CONSTANT early token position (the
position with the fewest distinct tokens among those with 2..max_branch
distinct values; parameter positions with many distinct values are
never chosen). Within a refined group each token position becomes
either the single constant token observed there or the ``<*>``
wildcard. The output is the template table a log-analytics user builds
dashboards on — the capability layer above the engine's parser family
(fluent-bit parses known formats; this discovers unknown ones).

Spark-first shape: tokenize in the scan; a SMALL posexplode shuffle
over only the first ``split_max_pos`` positions picks each group's
split position; then one full posexplode shuffle keyed by (group,
split-token, position) for the per-position distinct counts, and a
group-keyed template assembly — no Python, no iteration, deterministic
(the split rule and the wildcard rule are both pure functions of
distinct counts, so the whole mining replays in portable SQL). At
100 TB the shuffled rows are (group key, position, token) triples; the
raw line never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(col, r"\s+", " ")), " ")


def log_templates(
    df: DataFrame,
    msg_col: str = "message",
    split_max_branch: int = 8,
    split_max_pos: int = 4,
) -> DataFrame:
    """(template, n_lines): discovered message templates and their
    support. Lines group by (token count, first token); each group is
    then sub-split on its most-constant early position — the position
    in 1..``split_max_pos`` with the fewest distinct tokens, considered
    only when that count is in 2..``split_max_branch`` AND at most half
    the group's line count (a split must at least halve the group on
    average; ties: smallest position; no qualifying position: no
    sub-split). This separates
    genuinely different templates that share length and first token
    (e.g. ``conn <host> opened`` vs ``conn <host> closed``) without ever
    splitting on a parameter position, whose distinct count exceeds
    ``split_max_branch``. A position is kept verbatim iff every line in
    the refined group agrees on it, else it becomes ``<*>``. Empty
    messages are dropped. ``split_max_branch=0`` disables level 2
    (the pure (count, first-token) grouping).
    """
    base = (
        df.select(_tokens(F.col(msg_col).cast("string")).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .where((F.col("__n") > 0) & (F.col("__toks")[0] != ""))
        .withColumn("__first", F.col("__toks")[0])
    )
    if split_max_branch > 0:
        # level-2 split selection: distinct counts over EARLY positions
        # only (a few tokens per line shuffle, not the full explode)
        # slice BEFORE exploding: pass A generates only the candidate
        # positions (split_max_pos tokens/line), not the full token list
        early = (
            base.select(
                "__n",
                "__first",
                F.posexplode(
                    F.slice(F.col("__toks"), 2, split_max_pos)
                ).alias("__p0", "__tok"),
            )
            .select(
                "__n", "__first", (F.col("__p0") + 1).alias("__pos"), "__tok"
            )
            .groupBy("__n", "__first", "__pos")
            .agg(
                F.countDistinct("__tok").alias("__d"),
                F.count(F.lit(1)).alias("__c"),  # = group line count
            )
        )
        splitpos = (
            early.where(
                (F.col("__d") >= 2)
                & (F.col("__d") <= split_max_branch)
                & (F.col("__d") * 2 <= F.col("__c"))
            )
            .groupBy("__n", "__first")
            .agg(F.min(F.struct("__d", "__pos")).alias("__s"))
            .select("__n", "__first", F.col("__s.__pos").alias("__sp"))
        )
        # left join: groups without a qualifying position keep one
        # sub-group (empty split key). splitpos is one row per level-1
        # group — AQE broadcasts it when small; the key matches the
        # downstream grouping so a shuffle join stays co-partitioned.
        base = base.join(splitpos, ["__n", "__first"], "left").withColumn(
            "__skey",
            F.when(
                F.col("__sp").isNotNull(),
                F.element_at("__toks", F.col("__sp") + F.lit(1)),
            ).otherwise(F.lit("")),
        )
    else:
        base = base.withColumn("__skey", F.lit(""))
    pos = base.select(
        "__n", "__first", "__skey", F.posexplode("__toks").alias("__pos", "__tok")
    )
    per_pos = pos.groupBy("__n", "__first", "__skey", "__pos").agg(
        F.countDistinct("__tok").alias("__d"),
        F.min("__tok").alias("__one"),
        # every line contributes one token per position, so any
        # position's row count IS the group's line count — deriving
        # n_lines here saves a third pass over the tokenized scan
        F.count(F.lit(1)).alias("__c"),
    )
    return per_pos.groupBy("__n", "__first", "__skey").agg(
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
        ).alias("template"),
        F.max("__c").alias("n_lines"),
    ).select("template", "n_lines")
