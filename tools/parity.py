"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
canonicalize (sort columns by name, round floats, sort rows), compare.

Usage:
    python tools/parity.py [sf_dir] [query_name ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from patterns_devkit_spark.queries import ORACLES, QUERIES
    from patterns_devkit_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for tb in TABLES:
        con.sql(f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")

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
        try:
            dpdf = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
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
