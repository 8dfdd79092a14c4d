"""Interleaved same-moment A/B of two ENGINE TREES (git worktrees).

Box calib swings large factors within hours here, so sequential runs of
two trees measure the box, not the code. This starts one resident
engine session per tree (tools/ab_worker.py with cwd=tree) and
alternates single timed runs between them in ABBA order per query —
both trees share every box moment, and linear drift cancels.

Usage:
    python tools/ab_trees.py /tmp/wt_r10 /root/repo \
        --queries join_left,resample_1h [--pairs 6]
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def start(tree: str) -> subprocess.Popen:
    p = subprocess.Popen(
        [sys.executable, os.path.join(HERE, "ab_worker.py")],
        cwd=tree,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
    )
    for line in p.stdout:
        if line.startswith("READY"):
            return p
    raise RuntimeError(f"worker in {tree} died before READY")


def ask(p: subprocess.Popen, cmd: str, name: str) -> float | None:
    p.stdin.write(f"{cmd} {name}\n")
    p.stdin.flush()
    for line in p.stdout:
        if line.startswith("WARM"):
            return None
        if line.startswith("TIME"):
            return float(line.split()[2])
    raise RuntimeError("worker died")


def main() -> None:
    args = sys.argv[1:]
    tree_a, tree_b = args[0], args[1]
    names = []
    pairs = 6
    i = 2
    while i < len(args):
        if args[i] == "--queries":
            names = args[i + 1].split(",")
            i += 2
        elif args[i] == "--pairs":
            pairs = int(args[i + 1])
            i += 2
        else:
            i += 1

    pa, pb = start(tree_a), start(tree_b)
    print(f"A={tree_a}  B={tree_b}  pairs={pairs}")
    for name in names:
        ask(pa, "warm", name)
        ask(pb, "warm", name)
        ta, tb = [], []
        for k in range(pairs):
            if k % 2 == 0:  # AB
                ta.append(ask(pa, "run", name))
                tb.append(ask(pb, "run", name))
            else:  # BA
                tb.append(ask(pb, "run", name))
                ta.append(ask(pa, "run", name))
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"{name:24s} A_med={ma:.3f} B_med={mb:.3f} B/A={mb / ma:.2f}  "
            f"A={[round(t, 3) for t in ta]} B={[round(t, 3) for t in tb]}",
            flush=True,
        )
    for p in (pa, pb):
        try:
            p.stdin.write("exit\n")
            p.stdin.flush()
            p.wait(timeout=30)
        except Exception:
            p.kill()


if __name__ == "__main__":
    main()
