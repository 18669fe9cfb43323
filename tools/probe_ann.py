"""Phase-split probe for the ANN training chains (VERDICT r6 item 1).

Runs one query's construction with per-phase wall timers and Spark job
counts (job-group bookkeeping), then materializes the result via the
noop sink. Usage:

    PYTHONPATH=. python tools/probe_ann.py q264 [sf_dir] [reps]

Job counts come from StatusTracker.getJobIdsForGroup on a per-phase
group id, so each line reads: phase name, seconds, #jobs it launched.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark.queries import QUERIES, t  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402


class Phase:
    """Context manager: wall time + job count for one labelled phase."""

    def __init__(self, sc, name: str):
        self.sc, self.name = sc, name

    def __enter__(self):
        self.gid = f"probe:{self.name}:{time.time()}"
        self.sc.setJobGroup(self.gid, self.name)
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        try:
            n_jobs = len(self.sc.statusTracker().getJobIdsForGroup(self.gid))
        except Exception:
            n_jobs = -1
        print(f"  {self.name:<38} {dt:7.3f}s  jobs={n_jobs}")
        self.sc.setJobGroup(None, None)
        return False


def probe_query(spark, name: str, sf_dir: str, reps: int) -> None:
    sc = spark.sparkContext
    fn = QUERIES.get(name) or QUERIES[next(k for k in QUERIES if k.startswith(name))]
    # warm-up (untimed), mirroring bench.py
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        spark.catalog.clearCache()
        print(f"-- {name} rep {rep} --")
        t0 = time.time()
        with Phase(sc, "construct (driver-side jobs)"):
            df = fn(spark, sf_dir)
        with Phase(sc, "final noop materialize"):
            df.write.format("noop").mode("overwrite").save()
        print(f"  {'TOTAL':<38} {time.time() - t0:7.3f}s")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("probe_ann")
    spark.sparkContext.setLogLevel("ERROR")
    for n in name.split(","):
        probe_query(spark, n, sf_dir, reps)


if __name__ == "__main__":
    main()
