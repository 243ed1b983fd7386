"""Shared sub-second rendering for the timestamp-formatting encoders.

Every sink/connector that prints ``<date_format seconds>.<fraction>``
needs the fraction as a NON-NEGATIVE remainder: Spark's ``%`` keeps the
dividend's sign (Java semantics), so ``unix_micros % 1_000_000`` is
negative for pre-1970 timestamps and ``format_string('%06d', -500000)``
renders ``.-500000`` — wrong sign AND wrong value (the wall-clock
fraction of 1969-12-31T23:59:59.5 is .500000, exactly ``pmod``). The
``date_format`` seconds part floors correctly on its own, so pmod is
the whole fix. One helper so the encoders can't drift (stackdriver had
the fix inline; six siblings didn't — r12 review)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micros_of(ts: Column) -> Column:
    """Non-negative microsecond fraction [0, 1_000_000) of a timestamp."""
    return F.pmod(F.unix_micros(ts), F.lit(1_000_000))


def frac_micros(ts: Column) -> Column:
    """'%06d' microsecond fraction string (.SSSSSS encoders)."""
    return F.format_string("%06d", micros_of(ts).cast("int"))


def frac_millis(ts: Column) -> Column:
    """'%03d' millisecond fraction string (.SSS encoders)."""
    return F.format_string("%03d", (micros_of(ts) / 1000).cast("int"))


def frac_nanos(ts: Column) -> Column:
    """'%09d' nanosecond fraction string (µs-resolution source)."""
    return F.format_string("%09d", (micros_of(ts) * 1000).cast("long"))
