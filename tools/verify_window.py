"""Gate-window invariant check for query rotations.

The driver's correctness gate reads the FIRST 50 entries of queries() in
dict order. When rotating the window between rounds, three invariants
keep coverage honest:

1. every window name exists in the registry (no typos strand a slot);
2. the window holds the names with the FEWEST driver rows — i.e. no
   never-checked query sits behind an already-verified one;
3. the NEWEST checked-in ORACLE_LOCAL_r*.md report covers the whole
   registry — a query registered after the report regen has no current
   local verification on record (the round-4 dsir_select/semantic_dedup
   slip); report regen must be the last pre-snapshot step. This check
   FAILS, not warns.

Usage: python tools/verify_window.py [CORRECTNESS_r*.json ...]
(pass every prior round's file; defaults to all CORRECTNESS_r*.json in
the repo root).
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry


def report_covers_registry(registry: set[str]) -> list[str]:
    """Names in the registry missing from the newest ORACLE_LOCAL report
    (empty when covered, or when no report exists yet)."""
    reports = sorted(
        glob.glob(str(Path(__file__).resolve().parents[1] / "ORACLE_LOCAL_r*.md"))
    )
    if not reports:
        return []
    text = Path(reports[-1]).read_text()
    seen = set(re.findall(r"^(?:OK|rows|FAIL)\s+(\S+):", text, re.M))
    return sorted(registry - seen)


def staleness(files: list[str]) -> dict[str, int]:
    """Latest round with a PASSING driver row per query (0 = never)."""
    latest: dict[str, int] = {}
    for f in files:
        m = re.search(r"r0*(\d+)", Path(f).name)
        rnd = int(m.group(1)) if m else 0
        for q, row in json.load(open(f)).items():
            if row.get("hash_match") or row.get("rows_match"):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def main() -> int:
    files = sys.argv[1:] or sorted(
        glob.glob(str(Path(__file__).resolve().parents[1] / "CORRECTNESS_r*.json"))
    )
    verified: set[str] = set()
    for f in files:
        verified |= set(json.load(open(f)))
    # invariant 1 checks the DECLARED window list against the registry
    # BEFORE touching entry.queries() — queries() itself indexes the
    # registry with the declared names, so a typo would raise a bare
    # KeyError there and this check must run first to fail usefully.
    registry = set(entry._query_registry())
    declared = list(getattr(entry, "_DRIVER_WINDOW", []))
    missing = [n for n in declared if n not in registry]
    if missing:
        print(f"ERROR: window names missing from registry: {missing}")
        print("FAIL")
        return 1
    # the gate reads EXACTLY 50 entries: an over-long window silently
    # pushes its tail outside the gate; a short one wastes slots on
    # whatever registry order happens to follow
    if len(declared) != 50:
        print(f"ERROR: _DRIVER_WINDOW has {len(declared)} entries, gate reads 50")
        print("FAIL")
        return 1
    if len(set(declared)) != len(declared):
        dupes = sorted({n for n in declared if declared.count(n) > 1})
        print(f"ERROR: duplicate window entries: {dupes}")
        print("FAIL")
        return 1

    names = list(entry.queries())
    window, tail = names[:50], names[50:]
    never_checked_behind = [
        n for n in tail if n not in verified and any(w in verified for w in window)
    ]
    window_already_verified = [n for n in window if n in verified]

    print(f"registry: {len(names)} queries; prior driver rows: {len(verified)}")
    print(f"window[0:50]: {len(window_already_verified)} already verified")
    print(f"tail: {len([n for n in tail if n not in verified])} never checked")
    ok = True
    # staleness histogram: rounds since each query's last passing driver
    # row — the rotation target is "window = the 50 stalest"
    latest = staleness(files)
    hist: dict[int, int] = {}
    for n in names:
        hist[latest.get(n, 0)] = hist.get(latest.get(n, 0), 0) + 1
    print("staleness histogram (last passing round -> queries):",
          dict(sorted(hist.items())))
    stalest = sorted(names, key=lambda n: (latest.get(n, 0), n))[:50]
    stale_outside = sorted(set(stalest) - set(window))
    if stale_outside:
        print(
            f"WARN: {len(stale_outside)} of the 50 stalest queries sit "
            f"OUTSIDE the window: {stale_outside[:10]}..."
        )
    # invariant 3: the newest checked-in report must cover the registry
    uncovered = report_covers_registry(registry)
    if uncovered:
        print(
            f"ERROR: newest ORACLE_LOCAL report misses {len(uncovered)} "
            f"registry queries: {uncovered[:10]} — regenerate the report "
            "(tools/oracle_check.py --report) as the LAST pre-snapshot step"
        )
        ok = False
    if window_already_verified and never_checked_behind:
        print(
            "WARN: window wastes slots on already-verified queries while "
            f"{len(never_checked_behind)} never-checked wait in the tail: "
            f"{never_checked_behind[:10]}..."
        )
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
