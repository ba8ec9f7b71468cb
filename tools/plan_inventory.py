"""Print a physical-plan feature inventory for every declared query.

Usage: python tools/plan_inventory.py [sf_dir]

Columns: exchanges (shuffles), broadcast hash joins, sort-merge joins,
Arrow stages (vectorized Python), top-k heap, hazards (cartesian /
nested-loop / row-Python).  Counts are physical operator nodes from
``.explain("formatted")`` (the tree section only, so each node counts
once).  Feeds SCALING.md §4 and round-over-round plan regression checks.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_data_lakehouse_spark import entry_queries as eq
from e_commerce_data_lakehouse_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_inventory", master="local[8]",
                      shuffle_partitions=8)
    header = f"{'query':34} {'xchg':>4} {'bhj':>3} {'smj':>3} {'arrow':>5} topk/hazards"
    print(header)
    print("-" * len(header))
    for name in sorted(eq.QUERIES):
        df = eq.QUERIES[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # keep only the tree section (details section repeats each node)
        tree = buf.getvalue().split("\n\n")[0]
        flags = []
        if "TakeOrderedAndProject" in tree:
            flags.append("topk-heap")
        for hazard in ("CartesianProduct", "BroadcastNestedLoopJoin",
                       "BatchEvalPython"):
            if hazard in tree:
                flags.append(f"!{hazard}")
        print(
            f"{name:34} {tree.count('Exchange'):>4} "
            f"{tree.count('BroadcastHashJoin'):>3} "
            f"{tree.count('SortMergeJoin'):>3} "
            f"{tree.count('ArrowEvalPython') + tree.count('MapInPandas'):>5} "
            f"{' '.join(flags)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
