"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
canonicalize (sort columns by name, round floats, sort rows), compare.

Usage:
    python tools/parity.py [sf_dir] [query_name ...]
    python tools/parity.py --changed [sf_dir]   # only queries whose
        registry blocks overlap `git diff HEAD` line ranges; a change
        OUTSIDE every @query block (imports/shared helpers) selects
        the whole file's queries. Changes to operators/ or other
        non-registry modules are NOT traced — run the full gate after
        touching shared operator code.
"""
from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype.kind == "f":
            pdf[c] = col.round(6)
        elif col.dtype.kind == "M":
            pdf[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            pdf[c] = col.map(lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v)
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="first", kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        ac, bc = a[c], b[c]
        if ac.dtype.kind == "f" or bc.dtype.kind == "f":
            ok = np.allclose(
                pd.to_numeric(ac, errors="coerce").fillna(-9e18),
                pd.to_numeric(bc, errors="coerce").fillna(-9e18),
                rtol=0, atol=1.5e-6,
            )
        else:
            ok = ac.astype(str).equals(bc.astype(str))
        if not ok:
            diffs = (ac.astype(str) != bc.astype(str))
            idx = diffs[diffs].index[:3].tolist()
            problems.append(f"col {c!r} differs at rows {idx}: spark={ac.iloc[idx].tolist() if idx else '?'} duck={bc.iloc[idx].tolist() if idx else '?'}")
    # dtype advisory (driver may compare schemas)
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            problems.append(f"DTYPE-WARN col {c!r}: spark={a[c].dtype} duck={b[c].dtype}")
    return problems


_REGISTRY_FILES = [
    "patterns_devkit_spark/queries.py",
    "patterns_devkit_spark/queries_ext.py",
    "patterns_devkit_spark/queries_curation.py",
    "patterns_devkit_spark/queries_analytics.py",
    "patterns_devkit_spark/queries_pipeline.py",
    "patterns_devkit_spark/queries_scale.py",
    "patterns_devkit_spark/queries_sketch.py",
    "patterns_devkit_spark/queries_corpus.py",
    "patterns_devkit_spark/queries_profiling.py",
    "patterns_devkit_spark/queries_stats.py",
]


def _query_blocks(path: str) -> list[tuple[str, int, int]]:
    """(query_name, start_line, end_line) for each @query block —
    decorator line through the line before the next decorator."""
    import re as _re

    lines = open(path).read().splitlines()
    starts = []
    for i, line in enumerate(lines, 1):
        m = _re.match(r"\s*@query\(\s*$", line) or _re.match(r"\s*@query\(", line)
        if m:
            # name may sit on this line or the next
            m2 = _re.search(r"[\"\']([a-z0-9_]+)[\"\']", line) or _re.search(
                r"[\"\']([a-z0-9_]+)[\"\']", lines[i] if i < len(lines) else ""
            )
            if m2:
                starts.append((m2.group(1), i))
    blocks = []
    for j, (name, start) in enumerate(starts):
        end = starts[j + 1][1] - 1 if j + 1 < len(starts) else len(lines)
        blocks.append((name, start, end))
    return blocks


def _changed_query_names() -> set[str]:
    """Query names whose blocks overlap `git diff HEAD` hunks in the
    registry files (CLAUDE.md: run parity after ANY registry change —
    this selects exactly the affected queries)."""
    import re as _re
    import subprocess

    names: set[str] = set()
    untracked = set(
        subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard"],
            capture_output=True, text=True, cwd=".",
        ).stdout.split()
    )
    for path in _REGISTRY_FILES:
        if path in untracked:
            # brand-new registry file: git diff HEAD shows nothing —
            # every block in it is by definition changed
            names.update(n for n, _, _ in _query_blocks(path))
            continue
        diff = subprocess.run(
            ["git", "diff", "HEAD", "-U0", "--", path],
            capture_output=True, text=True, cwd=".",
        ).stdout
        hunks = []
        for m in _re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, _re.M):
            start = int(m.group(1))
            count = int(m.group(2)) if m.group(2) is not None else 1
            hunks.append((start, start + max(count, 1) - 1))
        if not hunks:
            continue
        blocks = _query_blocks(path)
        file_selected = False
        for hs, he in hunks:
            hit = [n for n, bs, be in blocks if hs <= be and he >= bs]
            if hit:
                names.update(hit)
            else:
                # change outside every block (imports/helpers): the
                # whole file is suspect
                file_selected = True
        if file_selected:
            names.update(n for n, _, _ in blocks)
    return names


def main() -> int:
    argv = list(sys.argv[1:])
    changed_mode = "--changed" in argv
    if changed_mode:
        argv.remove("--changed")
    budget = None
    for a in list(argv):
        # --budget=SECONDS: per-query wall budget for large generated
        # tiers — the SPARK side always runs to completion; if spark +
        # oracle would exceed the budget the DUCKDB side is interrupted
        # and the query reported as BUDGET (checked at a smaller tier
        # instead). Keeps a full-registry sf1 sweep finite when a
        # single-node oracle replay (exact pairwise, O(N^2) baselines)
        # is the slow half.
        if a.startswith("--budget="):
            budget = float(a.split("=", 1)[1])
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if changed_mode:
        only = _changed_query_names()
        if not only:
            print("no registry changes vs HEAD; nothing to check")
            return 0
        print(f"--changed: {len(only)} queries: {' '.join(sorted(only))}")

    from patterns_devkit_spark.queries import ORACLES, QUERIES
    from patterns_devkit_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    import os as _os

    for tb in TABLES:
        path = f"{sf_dir}/{tb}.parquet"
        # multi-file tables (generated tiers, sf1+) are DIRECTORIES
        # named <table>.parquet — duckdb needs the glob form there
        src = f"{path}/*.parquet" if _os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{src}')")

    n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        timer = None
        timed_out = []
        if budget is not None:
            import threading as _th

            remaining = max(5.0, budget - (time.time() - t0))
            timer = _th.Timer(remaining, lambda: (timed_out.append(1), con.interrupt()))
            timer.start()
        try:
            dpdf = con.sql(ORACLES[name]).df()
        except Exception as e:
            if timer is not None:
                timer.cancel()
            if timed_out:
                print(f"BUDGET {name}: oracle exceeded {budget}s (spark side: {len(spdf)} rows) [{time.time()-t0:.1f}s]")
                continue
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if timer is not None:
            timer.cancel()
        problems = compare(name, spdf, dpdf)
        hard = [p for p in problems if not p.startswith("DTYPE-WARN")]
        if hard:
            print(f"FAIL  {name} ({len(spdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
            n_fail += 1
        else:
            warn = "".join(f"\n      - {p}" for p in problems)
            print(f"OK    {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]{warn}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
