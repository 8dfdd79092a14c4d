#!/usr/bin/env python
"""Regenerate COVERAGE.md's suite-entry counter from the live
registry (round-6 verdict missing #5: the prose said 234 while
suite.queries() registered 255 — doc counts must not drift).

Rewrites the `N suite entries` token in COVERAGE.md's header to the
actual count and prints both. --check exits non-zero on mismatch
without writing (gate mode).
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    import __spark_entry__ as entry

    n = len(entry.queries())
    n_oracle = len(entry.oracle_sql())
    path = os.path.join(ROOT, "COVERAGE.md")
    with open(path) as f:
        text = f.read()
    pat = re.compile(r"\b\d+ suite entries")
    m = pat.search(text)
    if not m:
        print("COVERAGE.md: no 'N suite entries' token found")
        return 1
    current = int(m.group(0).split()[0])
    rows_only = n - n_oracle
    print(f"registry: {n} queries, {n_oracle} oracled, {rows_only} rows-only; "
          f"COVERAGE.md says {current}")
    if current == n:
        return 0
    if "--check" in sys.argv:
        print("MISMATCH — run tools/update_coverage_count.py to fix")
        return 1
    text = pat.sub(f"{n} suite entries", text, count=1)
    with open(path, "w") as f:
        f.write(text)
    print(f"COVERAGE.md updated: {current} -> {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
