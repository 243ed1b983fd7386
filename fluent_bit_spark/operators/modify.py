"""filter_modify: row rewrite rules gated by conditions.

Reference: plugins/filter_modify/modify.h:29-53 (rule + condition enums),
exec modify.c:1486-1669. Rules: RENAME, HARD_RENAME, ADD, SET, REMOVE,
REMOVE_WILDCARD, REMOVE_REGEX, COPY, HARD_COPY, MOVE_TO_START, MOVE_TO_END.
Conditions: KEY_EXISTS, KEY_DOES_NOT_EXIST, A_KEY_MATCHES, NO_KEY_MATCHES,
KEY_VALUE_EQUALS(±), KEY_VALUE_MATCHES(±), MATCHING_KEYS_HAVE_MATCHING_VALUES(±).

Columnar translation: fluent-bit mutates each record's key set; a DataFrame
has one schema, so per-row conditional renames become "write the new column
where cond, NULL the old where cond" — same observable record contents.
Unconditional structural ops (rename/remove) are plain schema ops so
Catalyst can still prune columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Condition:
    kind: str  # key_exists | key_does_not_exist | a_key_matches | no_key_matches
    #            key_value_equals | key_value_does_not_equal
    #            key_value_matches | key_value_does_not_match
    key: str | None = None  # key name or regex (for *_matches kinds)
    value: object | None = None


def _cond_col(df: DataFrame, c: Condition) -> Column:
    kind = c.kind.lower()
    if kind == "key_exists":
        return F.lit(c.key in df.columns) & (
            F.col(c.key).isNotNull() if c.key in df.columns else F.lit(True)
        )
    if kind == "key_does_not_exist":
        return ~_cond_col(df, Condition("key_exists", c.key))
    if kind == "a_key_matches":
        rx = re.compile(str(c.key))
        return F.lit(any(rx.search(col) for col in df.columns))
    if kind == "no_key_matches":
        return ~_cond_col(df, Condition("a_key_matches", c.key))
    if kind in ("key_value_equals", "key_value_does_not_equal"):
        if c.key not in df.columns:
            return F.lit(False)
        eq = F.coalesce(F.col(c.key).cast("string") == F.lit(str(c.value)), F.lit(False))
        return ~eq if kind == "key_value_does_not_equal" else eq
    if kind in ("key_value_matches", "key_value_does_not_match"):
        if c.key not in df.columns:
            return F.lit(False)
        m = F.coalesce(F.col(c.key).cast("string").rlike(str(c.value)), F.lit(False))
        return ~m if kind == "key_value_does_not_match" else m
    raise ValueError(f"unknown modify condition {c.kind!r}")


def modify(
    df: DataFrame,
    rules: list[tuple],
    conds: list[Condition] | None = None,
) -> DataFrame:
    """Apply modify rules; conds (all must hold, modify.c:1486) gate
    per-row value rules and per-frame structural rules.

    rules: (op, args...) —
      ('rename', old, new) ('hard_rename', old, new)
      ('add', key, value) ('set', key, value)
      ('remove', key) ('remove_wildcard', prefix) ('remove_regex', pattern)
      ('copy', src, dst) ('hard_copy', src, dst)
      ('move_to_start', key) ('move_to_end', key)
    """
    gate = None
    tmp = "__modify_gate__"
    if conds:
        g = _cond_col(df, conds[0])
        for c in conds[1:]:
            g = g & _cond_col(df, c)
        # materialize ONCE against the pre-modification record: the
        # reference evaluates every condition before applying any rule
        # (modify.c:1486), so a rule that rewrites a condition key must
        # not re-gate the rules after it
        df = df.withColumn(tmp, g)
        gate = F.col(tmp)

    def gated(new: Column, old: Column) -> Column:
        return F.when(gate, new).otherwise(old) if gate is not None else new

    for rule in rules:
        op = rule[0].lower()
        if op in ("rename", "hard_rename"):
            _, old, new = rule
            if old not in df.columns:
                continue
            if new in df.columns:
                if op == "rename":  # RENAME only if target absent
                    continue
                df = df.withColumn(new, gated(F.col(old), F.col(new)))
                df = df.withColumn(old, gated(F.lit(None).cast(dict(df.dtypes)[old]), F.col(old)))
            elif gate is None:
                df = df.withColumnRenamed(old, new)
            else:
                df = df.withColumn(new, gated(F.col(old), F.lit(None)))
                df = df.withColumn(old, gated(F.lit(None).cast(dict(df.dtypes)[old]), F.col(old)))
        elif op == "add":  # only if key absent
            _, key, value = rule
            if key not in df.columns:
                df = df.withColumn(key, gated(F.lit(value), F.lit(None)))
        elif op == "set":
            _, key, value = rule
            old = F.col(key) if key in df.columns else F.lit(None)
            df = df.withColumn(key, gated(F.lit(value), old))
        elif op == "remove":
            _, key = rule
            if key in df.columns:
                if gate is None:
                    df = df.drop(key)
                else:
                    df = df.withColumn(key, gated(F.lit(None).cast(dict(df.dtypes)[key]), F.col(key)))
        elif op in ("remove_wildcard", "remove_regex"):
            _, pat = rule
            if op == "remove_wildcard":
                hit = [c for c in df.columns
                       if c != tmp and c.startswith(pat)]
            else:
                rx = re.compile(pat)
                hit = [c for c in df.columns if c != tmp and rx.search(c)]
            for c in hit:
                if gate is None:
                    df = df.drop(c)
                else:
                    df = df.withColumn(c, gated(F.lit(None).cast(dict(df.dtypes)[c]), F.col(c)))
        elif op in ("copy", "hard_copy"):
            _, src, dst = rule
            if src not in df.columns:
                continue
            if dst in df.columns and op == "copy":
                continue
            old = F.col(dst) if dst in df.columns else F.lit(None)
            df = df.withColumn(dst, gated(F.col(src), old))
        elif op in ("move_to_start", "move_to_end"):
            _, key = rule
            if key in df.columns and gate is None:
                others = [c for c in df.columns if c != key]
                order = [key] + others if op == "move_to_start" else others + [key]
                df = df.select(*order)
        else:
            raise ValueError(f"unknown modify rule {rule[0]!r}")
    if conds:
        df = df.drop(tmp)
    return df
