"""Worker half of the cross-tree interleaved A/B (tools/ab_trees.py).

Started with cwd = the tree to measure; builds one engine session and
then serves `run <query>` commands from stdin, one timed noop-sink run
per command, printing `TIME <query> <seconds>` per run. The parent
interleaves commands between two workers (ABBA) so both trees share
every box moment.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pandas_spark import get_spark
    from pandas_spark import suite

    spark = get_spark("ab_worker")
    qs = suite.queries()
    print("READY", flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line or line == "exit":
            break
        cmd, name = line.split(None, 1)
        if cmd == "warm":
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            print(f"WARM {name}", flush=True)
        elif cmd == "run":
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            print(f"TIME {name} {time.time() - t0:.4f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
