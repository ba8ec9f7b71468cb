"""Dump .explain("formatted") for headline queries to plans/<tag>/.

Usage: python tools/explain_dump.py <tag> [query ...]

With no query names, dumps every bench.py HEADLINE query.  Each query's
DataFrame is CONSTRUCTED (fn(spark, sf_dir)) and its formatted plan
written to plans/<tag>/<query>_<suffix>.txt; pipeline-style queries
(global DW / corpus DAG / streaming) execute their build during
construction, so this also serves as a smoke run.  The suffix is
"before" unless SPARK_GRAFT_EXPLAIN_SUFFIX overrides it.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_data_lakehouse_spark import entry_queries as eq
from e_commerce_data_lakehouse_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    suffix = os.environ.get("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    ok = bad = 0
    for name in names:
        spark.catalog.clearCache()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = eq.QUERIES[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as fh:
                fh.write(plan)
            ok += 1
        except Exception:
            with open(path, "w") as fh:
                fh.write("EXPLAIN FAILED\n" + traceback.format_exc())
            bad += 1
            print(f"FAILED: {name}", file=sys.stderr)
    print(f"explain_dump: {ok} ok, {bad} failed -> {outdir}")
    spark.stop()


if __name__ == "__main__":
    main()
