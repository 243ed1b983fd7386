"""SPContext — the stream-processor task registry.

Mirrors the reference's task lifecycle (flb_sp.c:58-155 config,
flb_sp_task_create :434) minus the event loop: streams are named
DataFrames; CREATE STREAM re-registers its result as a new source
(reference re-ingests via plugins/in_stream_processor/sp.c:43-85 — here it
is simply a chained DataFrame, so Catalyst can fuse the whole cascade into
one plan); snapshots hold a bounded buffer (flb_sp_snapshot.c:46-277).

TAG:'pattern' sources match against every registered stream that carries a
``tag`` column (router semantics, src/flb_router.c:140).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark.model import TAG_COL, TS_COL
from fluent_bit_spark.sp import ast
from fluent_bit_spark.sp.compiler import compile_select, tag_pattern_to_regex
from fluent_bit_spark.sp.parser import parse_sql

MAX_CHAIN_DEPTH = 32  # bound CREATE STREAM re-ingestion loops (SURVEY §7)


@dataclass
class Snapshot:
    df: DataFrame
    limit: int | None
    time_limit_sec: int | None


class SPContext:
    def __init__(self, time_col: str = TS_COL, tag_col: str = TAG_COL, str_conv: bool = True):
        self.streams: dict[str, DataFrame] = {}
        self.snapshots: dict[str, Snapshot] = {}
        self.time_col = time_col
        self.tag_col = tag_col
        self.str_conv = str_conv
        self._depth = 0

    # -- catalog -----------------------------------------------------------
    def register_stream(self, name: str, df: DataFrame) -> None:
        self.streams[name] = df

    def _resolve_source(self, src: ast.Source) -> DataFrame:
        if src.kind == "stream":
            if src.name not in self.streams:
                raise KeyError(f"unknown stream {src.name!r}")
            return self.streams[src.name]
        # TAG: union every tagged stream, filter by wildcard
        regex = tag_pattern_to_regex(src.name)
        tagged = [df for df in self.streams.values() if self.tag_col in df.columns]
        if not tagged:
            raise KeyError("no tagged streams registered for TAG: source")
        base = tagged[0]
        for other in tagged[1:]:
            base = base.unionByName(other, allowMissingColumns=True)
        return base.filter(F.col(self.tag_col).rlike(regex))

    # -- execution -----------------------------------------------------------
    def sql(self, text: str) -> DataFrame | None:
        """Parse + compile one SP statement. SELECT / FLUSH return a
        DataFrame; CREATE STREAM/SNAPSHOT register and return the stream."""
        cmd = parse_sql(text)
        return self.execute(cmd)

    def execute(self, cmd: ast.Command) -> DataFrame | None:
        if cmd.kind == "select":
            return self._compile(cmd.select)
        if cmd.kind == "create_stream":
            if self._depth >= MAX_CHAIN_DEPTH:
                raise RecursionError("CREATE STREAM chain too deep")
            self._depth += 1
            try:
                out = self._compile(cmd.select)
                tag = cmd.props.get("tag", cmd.name)
                out = out.withColumn(self.tag_col, F.lit(tag))
                self.register_stream(cmd.name, out)
                return out
            finally:
                self._depth -= 1
        if cmd.kind == "create_snapshot":
            sel = cmd.select
            # snapshots buffer RAW records (flb_sp_snapshot.c stores the
            # arriving msgpack chunks) — an aggregated select would
            # otherwise reach the compiler with its GROUP BY stripped
            # and die in a raw KeyError
            if sel.has_aggregates or sel.group_by:
                raise ValueError(
                    "SP analysis error: CREATE SNAPSHOT buffers records —"
                    " aggregates/GROUP BY are not allowed in its SELECT"
                )
            base = self._compile(
                ast.Select(keys=sel.keys, source=sel.source, where=sel.where)
            )
            limit = sel.limit
            tl = cmd.props.get("time_limit")
            tl_sec = _parse_time_limit(tl) if tl else None
            buf = _snapshot_tail(base, self.time_col, limit, tl_sec)
            self.snapshots[cmd.name] = Snapshot(df=buf, limit=limit, time_limit_sec=tl_sec)
            return buf
        if cmd.kind == "flush_snapshot":
            # batch analog: if any record matches the flush condition, emit
            # the buffered snapshot contents (flb_sp.c:1692-1700). The
            # existence trigger is a LAZY broadcast semi-join against a
            # limit(1) aggregate — no driver-side job at plan time (an
            # eager count() here serialized an extra job per flush).
            snap = self.snapshots.get(cmd.name)
            if snap is None:
                raise KeyError(f"unknown snapshot {cmd.name!r}")
            trigger_one = self._compile(cmd.select).limit(1).select(F.lit(1).alias("__trig"))
            return snap.df.join(F.broadcast(trigger_one), F.lit(True), "left_semi")
        raise ValueError(f"unknown command kind {cmd.kind}")

    def _compile(self, sel: ast.Select) -> DataFrame:
        df = self._resolve_source(sel.source)
        return compile_select(
            sel, df, time_col=self.time_col, tag_col=self.tag_col, str_conv=self.str_conv
        )


def _snapshot_tail(
    df: DataFrame, time_col: str, limit: int | None, time_limit_sec: int | None
) -> DataFrame:
    """Bounded 'last-N / last-T-seconds' buffer, batch form
    (flb_sp_snapshot.c:70-92 eviction)."""
    out = df
    if time_limit_sec is not None and time_col in df.columns:
        # scalar max(ts) + broadcast crossJoin: an empty-spec window here
        # (max over Window.partitionBy()) would move the WHOLE stream to
        # one partition; the 1-row aggregate broadcast keeps the filter
        # fully parallel at any scale
        mx = df.agg(F.max(F.col(time_col)).alias("__max_ts"))
        out = (
            out.crossJoin(F.broadcast(mx))
            .filter(
                F.col(time_col)
                >= F.col("__max_ts") - F.make_dt_interval(secs=F.lit(time_limit_sec))
            )
            .drop("__max_ts")
        )
    if limit is not None and time_col in df.columns:
        out = out.orderBy(F.col(time_col).desc()).limit(limit)
    elif limit is not None:
        out = out.limit(limit)
    return out


def _parse_time_limit(v: str) -> int:
    v = str(v).strip().lower()
    for suffix, mult in (("s", 1), ("m", 60), ("h", 3600)):
        if v.endswith(suffix):
            return int(v[:-1]) * mult
    return int(v)
