"""Artifact-ordering guard (r11 verdict task #2): the checked-in
full-registry oracle reports (ORACLE_LOCAL_r*.md / ORACLE_SF01_r*.md)
and PLAN_AUDIT.md must describe HEAD — regenerate them as the LAST
pre-snapshot step, after the final code commit. Round 11 inverted this:
five code commits landed after the 201/201 reports were generated, so
the reports described a stale tree (per-query re-verification held, but
the judge had to re-derive that).

The check is git-based (mtimes don't survive clones): FAIL when any
source path (the package, __spark_entry__.py, or the oracle harness)
has a commit NEWER than the newest report's last commit, or has
uncommitted changes. Run it right before the final snapshot commit;
exit 0 = reports are fresh.

Usage: python tools/report_guard.py
"""

from __future__ import annotations

import glob
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SOURCE_PATHS = ["fluent_bit_spark", "__spark_entry__.py", "tools/oracle_check.py"]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(ROOT), *args],
        capture_output=True, text=True, check=True,
    ).stdout.strip()


def latest_report(pattern: str) -> str | None:
    """Highest-round artifact matching e.g. ORACLE_LOCAL_r*.md."""
    best, best_n = None, -1
    for p in glob.glob(str(ROOT / pattern)):
        m = re.search(r"_r(\d+)\.md$", p)
        n = int(m.group(1)) if m else 0
        if n > best_n:
            best, best_n = p, n
    return best


def main() -> int:
    reports = [
        latest_report("ORACLE_LOCAL_r*.md"),
        latest_report("ORACLE_SF01_r*.md"),
        str(ROOT / "PLAN_AUDIT.md"),
    ]
    reports = [r for r in reports if r and Path(r).exists()]
    if len(reports) < 3:
        print("FAIL: missing report artifacts (need ORACLE_LOCAL_r*, "
              "ORACLE_SF01_r*, PLAN_AUDIT.md)")
        return 1

    dirty = _git("status", "--porcelain", "--", *SOURCE_PATHS)
    problems: list[str] = []
    if dirty:
        problems.append("uncommitted source changes:\n  " +
                        "\n  ".join(dirty.splitlines()))

    for rep in reports:
        rel = str(Path(rep).relative_to(ROOT))
        rep_commit = _git("log", "-1", "--format=%H", "--", rel)
        if not rep_commit:
            problems.append(f"{rel}: not committed yet")
            continue
        # ancestry, not timestamps: back-to-back commits share a second
        newer = _git(
            "rev-list", "--oneline", f"{rep_commit}..HEAD",
            "--", *SOURCE_PATHS,
        )
        if newer:
            problems.append(
                f"{rel}: source commits landed after its last commit:\n  "
                + "\n  ".join(newer.splitlines()[:10])
            )

    if problems:
        print("FAIL: reports do not describe HEAD — regenerate "
              "ORACLE_LOCAL/ORACLE_SF01 (tools/oracle_check.py --report) "
              "and PLAN_AUDIT (tools/plan_audit.py) as the LAST "
              "pre-snapshot step, then commit them.\n")
        for p in problems:
            print("-", p)
        return 1
    print("OK: oracle/plan artifacts are at least as new as the last "
          "source commit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
