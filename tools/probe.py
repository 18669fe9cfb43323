"""Per-query phase probe: construction (driver actions inside the query
function) vs final-plan execution (noop sink, guide §1.4), warm.

Usage: PYTHONPATH=. python tools/probe.py q264_ivfpq_ann [reps=3] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.queries import QUERIES  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]
    # warm-up (untimed)
    df = fn(spark, sf_dir)
    df.count()
    df.limit(10).collect()
    for i in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        n = df.count()
        t3 = time.time()
        df.limit(10).collect()
        t4 = time.time()
        print(
            f"rep{i}: construct={t1-t0:.3f}s noop={t2-t1:.3f}s "
            f"count={t3-t2:.3f}s collect10={t4-t3:.3f}s total_benchlike={(t1-t0)+(t3-t2)+(t4-t3):.3f}s rows={n}"
        )


if __name__ == "__main__":
    main()
