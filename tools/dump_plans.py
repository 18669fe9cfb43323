"""Dump `.explain("formatted")` for bench queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <out_dir> <suffix> [names...]
Defaults to every bench query when no names are given.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.plans.inspect import explain_str  # noqa: E402
from patterns_devkit_spark.queries import QUERIES  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df, "formatted"))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
