"""in_statsd line decoder (plugins/in_statsd/statsd.c:114-201).

Wire format: ``bucket:value|type|@sample_rate``. Parse rules matched to the
C reference:

- bucket = text before the FIRST ':'; a line without ':' or without '|'
  after it is dropped (statsd.c:163-181 error paths);
- type from the first char after '|': g=gauge, s=set, c=counter,
  m followed by s=timer; anything else counts as counter
  (get_statsd_type, statsd.c:59-74);
- counter/timer: value parsed as double, sample_rate from the ``|@`` tail
  (absent or zero -> 1.0, statsd.c:193-200);
- gauge: value as double plus ``incremental`` = 1 when the value begins
  with '+' or '-' (is_incremental, statsd.c:76-79); no sample_rate;
- set: value kept as a raw string.

Deviation, documented: the C switch falls through from TIMER into SET
(missing break, statsd.c:121-146), so reference timer records also carry a
duplicate set-typed body; the msgpack->JSON dup-key removal then keeps one.
Here a timer is just a timer.

Everything is Catalyst string expressions — scan-speed, no UDF, and
replicable in ANSI SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM_PREFIX = r"^([+-]?[0-9]*\.?[0-9]+(?:[eE][+-]?[0-9]+)?)"


def _atof_prefix(col: Column) -> Column:
    """C atof/strtod: parse the leading numeric prefix, 0.0 when none."""
    return F.coalesce(F.regexp_extract(col, _NUM_PREFIX, 1).cast("double"), F.lit(0.0))


def statsd_decode(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Decode statsd lines into typed metric records: adds ``metric_type``,
    ``bucket``, ``value`` (double; NULL for set), ``value_str`` (set only),
    ``sample_rate`` (counter/timer; 1.0 default), ``incremental`` (gauge
    only). Malformed lines (no ':' or no '|') are dropped."""
    line = F.col(line_col)
    ok = line.contains(":") & F.expr(
        f"instr(substring({line_col}, instr({line_col}, ':') + 1), '|') > 0"
    )
    bucket = F.substring_index(line, ":", 1)
    rest = F.expr(f"substring({line_col}, instr({line_col}, ':') + 1)")
    raw_value = F.substring_index(rest, "|", 1)
    type_tail = F.expr(
        f"substring(substring({line_col}, instr({line_col}, ':') + 1), "
        f"instr(substring({line_col}, instr({line_col}, ':') + 1), '|') + 1)"
    )
    first = F.substring(type_tail, 1, 1)
    second = F.substring(type_tail, 2, 1)
    mtype = (
        F.when(first == "g", "gauge")
        .when(first == "s", "set")
        .when(first == "c", "counter")
        .when((first == "m") & (second == "s"), "timer")
        .otherwise("counter")
    )
    at_pos = F.expr("instr(__tt, '|@')")
    rate_raw = _atof_prefix(F.expr("substring(__tt, instr(__tt, '|@') + 2)"))
    sample_rate = F.when((at_pos == 0) | (rate_raw == 0.0), 1.0).otherwise(rate_raw)

    return (
        df.filter(ok)
        .withColumn("__tt", type_tail)
        .select(
            "*",
            mtype.alias("metric_type"),
            bucket.alias("bucket"),
            F.when(mtype != "set", _atof_prefix(raw_value)).alias("value"),
            F.when(mtype == "set", raw_value).alias("value_str"),
            F.when(mtype.isin("counter", "timer"), sample_rate).alias("sample_rate"),
            F.when(
                mtype == "gauge", F.substring(raw_value, 1, 1).isin("+", "-").cast("long")
            ).alias("incremental"),
        )
        .drop("__tt")
    )
