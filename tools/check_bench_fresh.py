#!/usr/bin/env python
"""Fail if the committed benchmark record is STALE — older than the
last commit touching engine code (pandas_spark/ or bench.py).

Round-6 verdict #2: BASELINE.md's engine column was refreshed ~46
commits before the round's final kernel commits, so the committed
numbers (q1 0.532 s) were fiction at HEAD (~1.0 s measured). The gate
now refuses to pass until the bench record is re-taken AFTER the last
engine change.

The record is ``BENCH_HEAD.json`` at the repo root, written by
``python bench.py --record``: it stores the engine tree hash it was
measured at plus bench.py's JSON line. Freshness = its stored tree
hash matches the CURRENT git tree hash of (pandas_spark/, bench.py,
__spark_entry__.py) — commit-count- and wall-clock-independent, so
doc-only or test-only commits never invalidate a valid record.
BASELINE.md's engine column must be regenerated from the same record
(its numbers are prose; the gate checks the machine-readable twin).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE_PATHS = ["pandas_spark", "bench.py", "__spark_entry__.py"]


def engine_tree_hash() -> str:
    """One hash over the COMMITTED content of the engine paths
    (HEAD tree objects, not mtimes)."""
    out = subprocess.run(
        ["git", "ls-tree", "HEAD", "--", *ENGINE_PATHS],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout
    import hashlib

    return hashlib.sha256(out.encode()).hexdigest()[:16]


def dirty_engine() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", *ENGINE_PATHS],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout
    return [l for l in out.splitlines() if l.strip()]


def main() -> int:
    rec_path = os.path.join(ROOT, "BENCH_HEAD.json")
    cur = engine_tree_hash()
    dirty = dirty_engine()
    if dirty:
        print("bench-fresh: FAIL — uncommitted engine changes:")
        for l in dirty[:10]:
            print("  " + l)
        print("commit them, then re-run `python bench.py --record`.")
        return 1
    if not os.path.exists(rec_path):
        print("bench-fresh: FAIL — no BENCH_HEAD.json. "
              "Run `python bench.py --record` at HEAD.")
        return 1
    with open(rec_path) as f:
        rec = json.load(f)
    if rec.get("engine_tree") != cur:
        print(f"bench-fresh: FAIL — BENCH_HEAD.json was measured at engine "
              f"tree {rec.get('engine_tree')}, HEAD is {cur}. "
              "Re-run `python bench.py --record`.")
        return 1
    print(f"bench-fresh: OK (engine tree {cur}, "
          f"suite {rec.get('result', {}).get('value')}s at "
          f"sf={rec.get('result', {}).get('sf')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
