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
measured at plus bench.py's JSON line. Freshness = its stored hash
matches the CURRENT SEMANTIC hash of (pandas_spark/, bench.py,
__spark_entry__.py): each .py file is parsed and hashed as its
docstring-stripped AST (``ast.dump``, no line/col attributes), so
comment-only and docstring-only commits never invalidate a valid
record (round-9 verdict #1a: a docstring edit after the record left
the gate red over a substantively identical engine). Non-.py files
and unparseable files hash as raw bytes. The dirty check uses the
same semantic hash (worktree vs HEAD), so doc-only local edits don't
block --record either. BASELINE.md's engine column must be
regenerated from the same record (its numbers are prose; the gate
checks the machine-readable twin).
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE_PATHS = ["pandas_spark", "bench.py", "__spark_entry__.py"]


def _semantic_bytes(path: str, blob: bytes) -> bytes:
    """Docstring-stripped AST dump for .py files; raw bytes otherwise.

    ast.parse drops comments; we additionally drop the leading string
    constant of every module/class/function body (the docstring).
    ast.dump without attributes is line/col-independent, so pure
    formatting moves don't change the hash either — only executable
    structure does.
    """
    if not path.endswith(".py"):
        return blob
    try:
        tree = ast.parse(blob)
    except SyntaxError:
        return blob
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                              ast.AsyncFunctionDef))
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return ast.dump(tree).encode()


def _engine_files() -> list[str]:
    """Tracked + untracked (non-ignored) files under the engine paths."""
    tracked = subprocess.run(
        ["git", "ls-files", "--", *ENGINE_PATHS],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard", "--",
         *ENGINE_PATHS],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    return sorted({p for p in tracked + untracked if p.strip()})


def _hash_files(read_blob) -> str:
    h = hashlib.sha256()
    for path in _engine_files():
        blob = read_blob(path)
        if blob is None:  # deleted in this source (worktree or HEAD)
            continue
        h.update(path.encode() + b"\0")
        h.update(_semantic_bytes(path, blob) + b"\0")
    return h.hexdigest()[:16]


def _read_head(path: str) -> bytes | None:
    r = subprocess.run(["git", "show", f"HEAD:{path}"], cwd=ROOT,
                       capture_output=True)
    return r.stdout if r.returncode == 0 else None


def _read_worktree(path: str) -> bytes | None:
    full = os.path.join(ROOT, path)
    if not os.path.isfile(full):
        return None
    with open(full, "rb") as f:
        return f.read()


def engine_tree_hash() -> str:
    """Semantic hash over the COMMITTED engine content at HEAD."""
    return _hash_files(_read_head)


def dirty_engine() -> list[str]:
    """Engine files whose SEMANTICS differ between worktree and HEAD.

    Doc/comment/formatting-only edits are not dirty — the bench
    record stays valid across them by construction.
    """
    out = []
    for path in _engine_files():
        head, work = _read_head(path), _read_worktree(path)
        if head == work:
            continue
        sem_head = None if head is None else _semantic_bytes(path, head)
        sem_work = None if work is None else _semantic_bytes(path, work)
        if sem_head != sem_work:
            out.append(path)
    return out


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
