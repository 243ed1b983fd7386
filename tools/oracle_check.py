"""Local replica of the driver's t2 correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at a given SF,
compare row count, schema width, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [only_query ...] [--report FILE]

--report FILE additionally writes a markdown report (the ORACLE_LOCAL_r*
artifact) with totals and the per-query result block.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.astype(str)
        else:
            try:
                df[c] = s.astype("int64")
            except (TypeError, ValueError):
                df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    args = sys.argv[1:]
    report_path = None
    if "--report" in args:
        i = args.index("--report")
        if i + 1 >= len(args):
            print("usage: oracle_check.py [sf_dir] [only_query ...] --report FILE")
            return 2
        report_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from fluent_bit_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures, rows_only, lines = [], [], []

    def emit(line: str) -> None:
        lines.append(line)
        print(line)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            emit(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            rows_only.append((name, len(got)))
            emit(f"rows {name}: {len(got)} rows (no oracle, by design)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            emit(f"FAIL {name}: oracle error {str(ex)[:200]}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rowcount {len(got)} != {len(want)}"))
            emit(f"FAIL {name}: rowcount {len(got)} != {len(want)}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append((name, f"columns {sorted(got.columns)} != {sorted(want.columns)}"))
            emit(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            continue
        g, w = canon(got), canon(want)
        if not g.equals(w):
            diff_cols = [c for c in g.columns if not g[c].equals(w[c])]
            failures.append((name, f"values differ in {diff_cols}"))
            emit(f"FAIL {name}: values differ in {diff_cols}")
            neq = ~(g[diff_cols[0]] == w[diff_cols[0]])
            print("  spark:", g.loc[neq, diff_cols].head(3).to_dict("records"))
            print("  duck :", w.loc[neq, diff_cols].head(3).to_dict("records"))
            continue
        emit(f"OK   {name}: {len(got)} rows")

    print(f"\n{len(failures)} failures, {len(rows_only)} rows-only")
    if report_path:
        # stamp the verified tree state: the report text is otherwise
        # deterministic, so a regeneration on an unchanged-result tree
        # would be byte-identical and invisible to report_guard's
        # git-commit freshness check
        try:
            import subprocess

            sha = subprocess.run(
                ["git", "-C", str(Path(__file__).resolve().parents[1]),
                 "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        except Exception:
            sha = "unknown"
        n_ok = sum(1 for l in lines if l.startswith("OK"))
        body = (
            "# Local oracle verification (driver t2-gate replica)\n\n"
            f"Verified tree: commit `{sha}` (+ this report commit).\n\n"
            f"`python tools/oracle_check.py {sf_dir} --report ...` — every\n"
            "registry query run on Spark vs its DuckDB oracle on the same\n"
            "parquet (row count, schema width, order-insensitive values).\n\n"
            "| | count |\n|---|---|\n"
            f"| hash-green (rows + schema + values) | {n_ok} |\n"
            f"| rows-only (no oracle, by documented policy) | {len(rows_only)} |\n"
            f"| failures | {len(failures)} |\n\n"
            f"## Per-query results ({sf_dir})\n\n```\n"
            + "\n".join(lines) + "\n```\n"
        )
        Path(report_path).write_text(body)
        print(f"report written: {report_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
