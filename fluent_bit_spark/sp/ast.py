"""AST for the stream-processor SQL dialect.

Mirrors struct flb_sp_cmd (include/fluent-bit/stream_processor/
flb_sp_parser.h:54-200): keys list with aggregation function + alias,
source, condition expression tree, window spec, group-by keys, limit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

from fluent_bit_spark.accessor import RecordAccessor

AGG_FUNCS = ("AVG", "SUM", "COUNT", "MIN", "MAX", "TIMESERIES_FORECAST")
TIME_FUNCS = ("NOW", "UNIX_TIMESTAMP")
RECORD_FUNCS = ("RECORD_TAG", "RECORD_TIME")


# --- expressions (WHERE) ----------------------------------------------------
@dataclass(frozen=True)
class Lit:
    value: object  # int | float | str | bool | None


@dataclass(frozen=True)
class KeyRef:
    accessor: RecordAccessor


@dataclass(frozen=True)
class RecordFunc:
    name: str  # CONTAINS | TIME  (@record.contains(key) / @record.time())
    key: Optional[RecordAccessor] = None


@dataclass(frozen=True)
class Cmp:
    op: str  # = != <> < <= > >=
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Logic:
    op: str  # AND | OR
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Not:
    operand: "Expr"


@dataclass(frozen=True)
class IsNull:
    operand: "Expr"
    negated: bool = False


Expr = Union[Lit, KeyRef, RecordFunc, Cmp, Logic, Not, IsNull]


# --- projection keys --------------------------------------------------------
@dataclass(frozen=True)
class SelectKey:
    """One projected key: bare key, aggregate, or time/record function."""

    kind: str  # 'key' | 'agg' | 'func' | 'star'
    accessor: Optional[RecordAccessor] = None
    func: Optional[str] = None  # AVG/SUM/... or NOW/UNIX_TIMESTAMP/RECORD_TAG/RECORD_TIME
    alias: Optional[str] = None
    forecast_offset: Optional[float] = None  # TIMESERIES_FORECAST(key, t)
    count_star: bool = False

    def out_name(self) -> str:
        if self.alias:
            return self.alias
        if self.kind == "agg":
            inner = "*" if self.count_star else (self.accessor.display() if self.accessor else "")
            return f"{self.func}({inner})"
        if self.kind == "func":
            return f"{self.func}()"
        return self.accessor.display() if self.accessor else "*"


# --- window / source / command ----------------------------------------------
@dataclass(frozen=True)
class WindowSpec:
    kind: str  # 'tumbling' | 'hopping'
    size_sec: int
    advance_sec: Optional[int] = None


@dataclass(frozen=True)
class Source:
    kind: str  # 'stream' | 'tag'
    name: str  # stream name or tag wildcard pattern


@dataclass(frozen=True)
class Select:
    keys: list[SelectKey]
    source: Source
    where: Optional[Expr] = None
    window: Optional[WindowSpec] = None
    group_by: list[RecordAccessor] = field(default_factory=list)
    limit: Optional[int] = None

    @property
    def has_aggregates(self) -> bool:
        return any(k.kind == "agg" for k in self.keys)

    @property
    def star(self) -> bool:
        return any(k.kind == "star" for k in self.keys)


@dataclass(frozen=True)
class Command:
    """Top-level statement.

    kind: 'select' | 'create_stream' | 'create_snapshot' | 'flush_snapshot'
    """

    kind: str
    select: Select
    name: Optional[str] = None
    props: dict = field(default_factory=dict)  # WITH (k='v', ...)
