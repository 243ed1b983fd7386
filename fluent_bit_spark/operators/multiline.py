"""Multiline reassembly: stitch continuation lines into one record.

Reference: src/multiline/flb_ml.c:671-870 (engine), built-in language
parsers flb_ml_parser_{docker,cri,python,java,go,ruby}.c, custom regex rule
tables flb_ml_rule.c; filter plugins/filter_multiline/ml.c.

Batch translation (SURVEY §2.4): a line STARTS a record if it matches the
start pattern (or does NOT match the continuation pattern, mode-dependent);
group_id = running count of start flags per (tag/file) ordered by sequence;
then collect lines per group ordered by sequence. Two shuffles max (window
+ groupBy on the same key — Catalyst reuses the partitioning).
Streaming: fluent_bit_spark.streaming.stateful.multiline_stream.

Built-in mode start patterns are re-expressed from the reference's rule
tables (file cited per entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# start-line regexes per built-in mode (see the flb_ml_parser_*.c rule
# tables; each recognizes where a NEW logical record begins)
BUILTIN_START_PATTERNS = {
    # flb_ml_parser_python.c: "Traceback (most recent call last):" starts a
    # trace; any non-indented line starts a record
    "python": r"^[^\s]",
    # flb_ml_parser_java.c: continuation lines begin with whitespace, 'at ',
    # 'Caused by:', '... N more'
    "java": r"^(?!\s)(?!at\s)(?!Caused by:)(?!\.\.\.\s*\d+\s*more).+",
    # flb_ml_parser_go.c: 'panic:' / goroutine dumps continue with indented
    # or 'goroutine' lines
    "go": r"^(?!\s)(?!goroutine\s)(?!\t).+",
    # generic indent-based continuation
    "indent": r"^\S",
}


def multiline(
    df: DataFrame,
    line_col: str = "line",
    seq_col: str = "seq",
    group_keys: list[str] | None = None,
    start_pattern: str | None = None,
    mode: str | None = None,
    out_col: str = "message",
    sep: str = "\n",
) -> DataFrame:
    """Reassemble lines into multiline records.

    Keeps one row per logical record: the start line's other columns + the
    concatenated ``out_col`` and ``n_lines``.
    """
    if start_pattern is None:
        if mode is None:
            raise ValueError("need start_pattern or mode")
        start_pattern = BUILTIN_START_PATTERNS[mode]
    keys = group_keys or []
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col))
    flagged = df.withColumn(
        "__start", F.when(F.col(line_col).rlike(start_pattern), 1).otherwise(0)
    ).withColumn("__grp", F.sum("__start").over(w))
    # collect lines per group in seq order (sort_array of (seq, line) structs
    # keeps determinism without relying on collect_list ordering)
    other = [c for c in df.columns if c not in (line_col,)]
    agg = (
        flagged.groupBy(*keys, "__grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(seq_col), F.col(line_col).alias("l")))),
                    lambda s: s.getField("l"),
                ),
                sep,
            ).alias(out_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(F.col(seq_col)).alias(seq_col),
        )
        .drop("__grp")
    )
    return agg
