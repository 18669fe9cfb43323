"""Standalone query timing probe: one untimed warm-up then best-of-N
noop materializations per named query (bench.py methodology, isolated).
Usage: PYTHONPATH=. python tools/probe.py q01_pricing_summary [more...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROBE_REPS (default 3)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.queries import QUERIES  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "3"))
    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q18_topk"](spark, sf_dir).collect()
    for name in sys.argv[1:]:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()  # same honesty rule as bench.py: no cross-rep cache reuse
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: best={min(times):.3f}s all={[round(x, 3) for x in times]}")


if __name__ == "__main__":
    main()
