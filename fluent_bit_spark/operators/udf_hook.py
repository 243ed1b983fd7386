"""filter_lua / filter_wasm equivalent: an arbitrary per-record hook.

Reference: plugins/filter_lua/lua.c:774-812 — the script's callback is
``cb(tag, timestamp, record) -> (code, timestamp, record)`` where code
-1 drops the record, 0 keeps it unchanged, 1 replaces timestamp+record,
and 2 means ``record`` is a LIST of records (one-to-many split, the UDTF
case). filter_wasm (plugins/filter_wasm/filter_wasm.c:376) exposes the
same event-in/event-out contract.

Spark mapping (SURVEY §2.10): Python is the scripting surface; records
cross to Python in Arrow batches via ``mapInPandas`` and the hook runs
per record inside the batch. This is the designated ESCAPE HATCH — the
slow path by design; anything expressible as built-in Columns should not
come through here.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DROP, KEEP, MODIFIED, SPLIT = -1, 0, 1, 2


def record_hook(
    df: DataFrame,
    cb: Callable,
    schema: T.StructType | str | None = None,
    tag_col: str = "tag",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Run ``cb(tag, ts, record: dict) -> (code, ts, record)`` per record.

    ``schema`` is the output schema (default: same as input — codes 1/2
    may then only change values, not shape). Records flow as dicts keyed
    by column name; ``tag``/``timestamp`` are passed separately when the
    columns exist, mirroring the reference callback signature.
    """
    in_cols = df.columns
    out_schema = schema if schema is not None else df.schema
    if isinstance(out_schema, str):
        out_schema = T.StructType.fromDDL(out_schema)
    out_cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for rec in pdf.to_dict("records"):
                tag = rec.get(tag_col)
                ts = rec.get(ts_col)
                code, new_ts, new_rec = cb(tag, ts, rec)
                if code == DROP:
                    continue
                if code == KEEP:
                    out_rows.append(rec)
                elif code == MODIFIED:
                    if new_ts is not None:
                        new_rec = {**new_rec, ts_col: new_ts}
                    out_rows.append(new_rec)
                elif code == SPLIT:
                    for r in new_rec:
                        out_rows.append(r)
                else:
                    raise ValueError(f"hook returned unknown code {code!r}")
            yield pd.DataFrame(
                [{c: r.get(c) for c in out_cols} for r in out_rows], columns=out_cols
            )

    return df.mapInPandas(run, out_schema)
