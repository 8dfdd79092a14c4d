#!/usr/bin/env bash
# Full end-of-round gate. MUST be run (and pass) after the last substantive
# commit of every round, in a fresh shell with no ambient SPARK_GRAFT_* env.
#
#   bash tools/gate.sh            # pytest + oracle (--ansi), the judge's bar
#   bash tools/gate.sh --fast     # oracle only (used mid-round)
#
# Exits non-zero on any failure. Scrubs bench/decade env vars itself so a
# shell that previously exported SPARK_GRAFT_DRIVER_MEM etc. can't skew the run
# (the same scrubbing conftest.py and verify_oracle.py perform).
set -euo pipefail
cd "$(dirname "$0")/.."

for v in $(env | grep -o '^SPARK_GRAFT_[A-Z_]*' || true); do unset "$v"; done
unset PYSPARK_SUBMIT_ARGS 2>/dev/null || true

echo "== gate: verify_oracle --ansi =="
python tools/verify_oracle.py --ansi

if [[ "${1:-}" != "--fast" ]]; then
  echo "== gate: pytest (fresh default env) =="
  python -m pytest tests/ -q

  # Benchmark artifacts must postdate the last engine commit (round-6
  # verdict #2: a BASELINE.md refreshed 46 commits before the final
  # kernel commit claimed numbers that no longer reproduced at HEAD).
  echo "== gate: bench freshness =="
  python tools/check_bench_fresh.py

  echo "== gate: COVERAGE.md counter =="
  python tools/update_coverage_count.py --check
fi

echo "== gate: PASS =="
