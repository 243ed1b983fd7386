"""Multiline reassembly: stitch continuation lines into one record.

Reference: src/multiline/flb_ml.c:671-870 (engine), rule engine
src/multiline/flb_ml_rule.c (state machine: rules are
(from_states, regex, to_state); a rule whose from_states contains
'start_state' is a START rule, flb_ml_rule.c:79-82; continuation matching
skips start rules, flb_ml_rule.c:260-270), built-in language parsers
flb_ml_parser_{python,java,go,ruby}.c, CRI partial-flag mode
flb_ml_parser_cri.c:25 (F=full / P=partial), Docker ENDSWITH mode
flb_ml_parser_docker.c:63-100 (a 'log' value ending in newline completes
the record); filter plugins/filter_multiline/ml.c.

Three batch strategies, increasing fidelity/cost:

1. ``multiline(start_pattern=...)`` — single start regex; group id is a
   running count of start flags. Fully declarative, no Python in the loop.
   With ``group_keys`` (per-file / per-tag, the normal case) the running
   count is a keyed window — fully parallel. WITHOUT keys a naive
   ``Window.orderBy(seq)`` would move the whole table to ONE partition, so
   the global running count is a distributed prefix sum instead: bucket
   rows by ``seq div bucket_size`` (monotone in seq, so bucket order ==
   global order), aggregate per-bucket flag counts (tiny), prefix-sum that
   aggregate, broadcast the per-bucket offsets back, and window only
   WITHIN each bucket. Records spanning bucket boundaries get the correct
   global group id because the offset carries the count across buckets.
2. ``reassemble_cri`` / ``reassemble_docker`` — partial-FLAG semantics
   (record *ends* on F / trailing newline): same prefix-sum machinery on
   the end flag, exclusive.
3. ``multiline_rules(rules=...)`` — the full state machine for rule
   tables; inherently sequential per stream, so it runs as
   ``applyInPandas`` per group key (scale = one task per log stream,
   which is exactly the reference's per-stream model).

Streaming: fluent_bit_spark.streaming.stateful.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# simple one-regex start patterns (convenience modes; the faithful rule
# tables are BUILTIN_RULES below)
BUILTIN_START_PATTERNS = {
    "python": r"^[^\s]",
    "java": r"^(?!\s)(?!at\s)(?!Caused by:)(?!\.\.\.\s*\d+\s*more).+",
    "go": r"^(?!\s)(?!goroutine\s)(?!\t).+",
    "indent": r"^\S",
}

START_STATE = "start_state"


@dataclass(frozen=True)
class MLRule:
    """One multiline state-machine rule (flb_ml_rule.c:flb_ml_rule_create).

    ``from_states`` is a tuple of state names; a rule listing
    ``start_state`` is a START rule (begins a new buffered record)."""

    from_states: tuple[str, ...]
    regex: str
    to_state: str

    @property
    def is_start(self) -> bool:
        return START_STATE in self.from_states


# Built-in rule tables, re-expressed from the reference's parsers (each
# regex translated Oniguruma -> Python; quirks preserved deliberately,
# e.g. java's unescaped '... N more' dots).
BUILTIN_RULES: dict[str, list[MLRule]] = {
    # flb_ml_parser_python.c:60-82
    "python": [
        MLRule((START_STATE,), r"^Traceback \(most recent call last\):$", "python"),
        MLRule(("python",), r"^[\t ]+File ", "python_code"),
        MLRule(("python_code",), r"[^\t ]", "python"),
        MLRule(("python",), r"^(?:[^\s.():]+\.)*[^\s.():]+:", START_STATE),
    ],
    # flb_ml_parser_java.c:60-140
    "java": [
        MLRule(
            (START_STATE, "java_start_exception"),
            r"(.)(?:Exception|Error|Throwable|V8 errors stack trace)[:\r\n]",
            "java_after_exception",
        ),
        MLRule(("java_after_exception",), r"^[\t ]*nested exception is:[\t ]*", "java_start_exception"),
        MLRule(("java_after_exception",), r"^[\r\n]*$", "java_after_exception"),
        MLRule(("java_after_exception", "java"), r"^[\t ]+(?:eval )?at ", "java"),
        MLRule(
            ("java_after_exception", "java"),
            r"^[\t ]+--- End of inner exception stack trace ---$",
            "java",
        ),
        MLRule(
            ("java_after_exception", "java"),
            r"^--- End of stack trace from previous location where exception was thrown ---$",
            "java",
        ),
        MLRule(("java_after_exception", "java"), r"^[\t ]*(?:Caused by|Suppressed):", "java_after_exception"),
        MLRule(("java_after_exception", "java"), r"^[\t ]*... \d+ (?:more|common frames omitted)", "java"),
    ],
    # flb_ml_parser_go.c:58-126
    "go": [
        MLRule((START_STATE,), r"\bpanic: ", "go_after_panic"),
        MLRule((START_STATE,), r"http: panic serving", "go_goroutine"),
        MLRule(("go_after_panic",), r"^$", "go_goroutine"),
        MLRule(("go_after_panic", "go_after_signal", "go_frame_1"), r"^$", "go_goroutine"),
        MLRule(("go_after_panic",), r"^\[signal ", "go_after_signal"),
        MLRule(("go_goroutine",), r"^goroutine \d+ \[[^\]]+\]:$", "go_frame_1"),
        MLRule(("go_frame_1",), r"^(?:[^\s.:]+\.)*[^\s.():]+\(|^created by ", "go_frame_2"),
        MLRule(("go_frame_2",), r"^\s", "go_frame_1"),
    ],
    # flb_ml_parser_ruby.c
    "ruby": [
        MLRule((START_STATE, "ruby_start_exception"), r"^.+:\d+:in\s+.*", "ruby_after_exception"),
        MLRule(("ruby_after_exception", "ruby"), r"^\s+from\s+.*:\d+:in\s+.*", "ruby"),
    ],
}


def _with_running_sum(
    df: DataFrame,
    flag_col: str,
    seq_col: str,
    keys: list[str],
    out: str,
    bucket_size: int,
) -> DataFrame:
    """Inclusive running sum of ``flag_col`` over global ``seq_col`` order
    (within ``keys`` if given), scalable: keyed window when keys exist,
    bucketed distributed prefix sum otherwise."""
    if keys:
        w = Window.partitionBy(*keys).orderBy(F.col(seq_col))
        return df.withColumn(out, F.sum(flag_col).over(w))
    df = df.withColumn("__b", (F.col(seq_col).cast("long") / bucket_size).cast("long"))
    per_bucket = df.groupBy("__b").agg(F.sum(flag_col).alias("__bs"))
    # the offsets table has n/bucket_size rows — a single-partition window
    # over it is intentional and cheap. The key is a data-derived constant
    # zero (b & 0): a literal would constant-fold into an UNPARTITIONED
    # WindowExec and trip the "No Partition Defined" warning, drowning the
    # signal for real single-partition regressions.
    wb = (
        Window.partitionBy(F.col("__b").bitwiseAND(F.lit(0)))
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select("__b", F.coalesce(F.sum("__bs").over(wb), F.lit(0)).alias("__off"))
    win = Window.partitionBy("__b").orderBy(F.col(seq_col))
    return (
        df.join(F.broadcast(offsets), "__b")
        .withColumn(out, F.col("__off") + F.sum(flag_col).over(win))
        .drop("__b", "__off")
    )


def _assemble(
    flagged: DataFrame,
    keys: list[str],
    seq_col: str,
    line_col: str,
    out_col: str,
    sep: str,
) -> DataFrame:
    """groupBy(__grp) -> one row per logical record, lines in seq order."""
    return (
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


def multiline(
    df: DataFrame,
    line_col: str = "line",
    seq_col: str = "seq",
    group_keys: list[str] | None = None,
    start_pattern: str | None = None,
    mode: str | None = None,
    out_col: str = "message",
    sep: str = "\n",
    bucket_size: int = 65536,
) -> DataFrame:
    """Reassemble lines into multiline records by start-line regex.

    Keeps one row per logical record: group keys + the concatenated
    ``out_col``, ``n_lines`` and the record's first ``seq_col``.
    """
    if start_pattern is None:
        if mode is None:
            raise ValueError("need start_pattern or mode")
        start_pattern = BUILTIN_START_PATTERNS[mode]
    keys = group_keys or []
    flagged = df.withColumn(
        "__start", F.when(F.col(line_col).rlike(start_pattern), 1).otherwise(0)
    )
    flagged = _with_running_sum(flagged, "__start", seq_col, keys, "__grp", bucket_size).drop(
        "__start"
    )
    return _assemble(flagged, keys, seq_col, line_col, out_col, sep)


def reassemble_cri(
    df: DataFrame,
    log_col: str = "log",
    flag_col: str = "flag",
    seq_col: str = "seq",
    group_keys: list[str] | None = None,
    out_col: str = "message",
    bucket_size: int = 65536,
) -> DataFrame:
    """CRI partial-flag mode (flb_ml_parser_cri.c:25,67): a record is the
    concatenation of consecutive P(artial) lines up to and including the
    next F(ull) line. ``flag_col`` holds 'F' or 'P'. Group per
    (group_keys,) which should include the container stream."""
    keys = group_keys or []
    flagged = df.withColumn("__end", F.when(F.col(flag_col) == "F", 1).otherwise(0))
    flagged = _with_running_sum(flagged, "__end", seq_col, keys, "__run", bucket_size)
    # exclusive count of prior ends -> lines AFTER an F open a new group
    flagged = flagged.withColumn("__grp", F.col("__run") - F.col("__end")).drop("__run", "__end")
    return _assemble(flagged, keys, seq_col, log_col, out_col, sep="")


def reassemble_docker(
    df: DataFrame,
    log_col: str = "log",
    seq_col: str = "seq",
    group_keys: list[str] | None = None,
    out_col: str = "message",
    bucket_size: int = 65536,
) -> DataFrame:
    """Docker ENDSWITH mode (flb_ml_parser_docker.c:63-100): a 'log'
    value ending with a newline completes the record; 16KB-split partials
    in between are concatenated verbatim."""
    keys = group_keys or []
    flagged = df.withColumn("__end", F.when(F.col(log_col).endswith("\n"), 1).otherwise(0))
    flagged = _with_running_sum(flagged, "__end", seq_col, keys, "__run", bucket_size)
    flagged = flagged.withColumn("__grp", F.col("__run") - F.col("__end")).drop("__run", "__end")
    return _assemble(flagged, keys, seq_col, log_col, out_col, sep="")


def multiline_rules(
    df: DataFrame,
    rules: list[MLRule] | str,
    line_col: str = "line",
    seq_col: str = "seq",
    group_keys: list[str] | None = None,
    out_col: str = "message",
    sep: str = "\n",
) -> DataFrame:
    """Full state-machine reassembly (flb_ml_rule.c:flb_ml_rule_process).

    Per line: if a record is buffering, try the rules reachable from the
    current state that are NOT start rules (flb_ml_rule.c:266); on match
    the line joins the record and the state advances. On miss the line is
    retried against start rules; a start match flushes the open record and
    begins a new one. A TOTAL miss (flb_ml_rule_process returns -1) emits
    the stray line as its own record while the buffered record and state
    stay INTACT — an interleaved stray line does not split an open trace.
    After any match, if a START rule is reachable from the new state, the
    buffer flushes eagerly (try_flushing_buffer, flb_ml_rule.c:245-278 —
    e.g. python's final ``Error:`` line emits the trace immediately); the
    state survives the flush, which matters for custom rule tables whose
    states mix start and non-start outgoing rules.

    Sequential per stream, so it runs as ``applyInPandas`` per
    ``group_keys`` — one task per log stream, the reference's own
    concurrency model. Without keys it degrades to a single task (fine
    for fixtures; give keys at scale).
    """
    if isinstance(rules, str):
        rules = BUILTIN_RULES[rules]
    compiled = [(set(r.from_states), re.compile(r.regex), r.to_state, r.is_start) for r in rules]
    # try_flushing_buffer's check: does any rule reachable from this state
    # carry the start flag? (to_state_map membership = state in from_states)
    eager_flush = {
        to: any(is_start for froms, _rx, _to, is_start in compiled if to in froms)
        for _f, _r, to, _s in compiled
    }
    keys = list(group_keys or [])
    key_fields = [df.schema[k] for k in keys]
    seq_type = df.schema[seq_col].dataType
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField(out_col, T.StringType()),
            T.StructField("n_lines", T.LongType()),
            T.StructField(seq_col, seq_type),
        ]
    )

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(seq_col, ignore_index=True)
        key_vals = [pdf[k].iloc[0] for k in keys]
        records = []  # (message, n_lines, first_seq)
        buf: list[tuple] = []  # (seq, line)
        state: str | None = None

        def flush():
            if buf:
                records.append((sep.join(l for _, l in buf), len(buf), buf[0][0]))
                buf.clear()

        for s, line in zip(pdf[seq_col], pdf[line_col]):
            line = "" if line is None else str(line)
            new_state = None
            if state is not None:
                for froms, rx, to, is_start in compiled:
                    if state in froms and not is_start and rx.search(line):
                        buf.append((s, line))
                        new_state = to
                        break
            if new_state is None:
                for froms, rx, to, is_start in compiled:
                    if is_start and rx.search(line):
                        flush()  # start match closes any open record
                        buf.append((s, line))
                        new_state = to
                        break
            if new_state is not None:
                state = new_state
                # eager flush when a start state is reachable next; the
                # state itself survives the flush (reference parity)
                if eager_flush.get(new_state) and buf:
                    flush()
            else:
                # total miss: stray line is its own record; buf/state kept
                records.append((line, 1, s))
        flush()
        return pd.DataFrame(
            [(*key_vals, m, n, fs) for m, n, fs in records],
            columns=[*keys, out_col, "n_lines", seq_col],
        )

    src = df.select(*keys, seq_col, line_col)
    if keys:
        return src.groupBy(*keys).applyInPandas(run, out_schema)
    return src.groupBy(F.lit(0).alias("__g")).applyInPandas(
        lambda pdf: run(pdf.drop(columns="__g", errors="ignore")), out_schema
    )
