"""Plan audit: one-line physical-plan summary per bench query —
join strategies, exchange count, pushed filters, codegen spans,
cartesian warnings. Usage: python tools/explain_all.py [sf_dir]."""
from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from patterns_devkit_spark.plans.inspect import explain_str  # noqa: E402
from patterns_devkit_spark.queries import QUERIES  # noqa: E402
from patterns_devkit_spark.session import get_spark  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in BENCH_QUERIES:
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "simple")
        joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
        shuffles = len(re.findall(r"Exchange (?:hash|range)partitioning|Exchange SinglePartition", plan))
        fplan = explain_str(df, "formatted")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", fplan))
        wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        flags = []
        if "CartesianProduct" in joins:
            flags.append("CARTESIAN!")
        if "Exchange SinglePartition" in plan and "TakeOrdered" not in plan:
            flags.append("single-partition-exchange")
        if "InMemoryTableScan" in plan:
            flags.append("cached")
        print(
            f"{name:26s} joins={'/'.join(joins) or '-':60s} shuffles={shuffles} "
            f"scansWithPushdown={pushed} codegenSpans={wsc} {' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
