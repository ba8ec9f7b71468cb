"""Per-query job/stage profile: where does each headline query's time go?

Usage: python tools/profile_queries.py <query> [<query> ...] [--sf=DIR]

For each named query (default: the bench pair's slowest twelve), runs the
query cold + warm against the noop sink exactly like ``bench.py``, with the
Spark UI's REST API enabled, and prints per-run:

- wall seconds,
- the jobs the run submitted (duration, description, stage count),
- per-stage shuffle read/write bytes and task-time breakdown for the
  slowest stages.

This is the guide's §1 loop (empirical: find the slowest stage, decide
whether it is shuffle, compute, or scheduling) made scriptable — the
sandbox has no live UI, so the REST snapshot is the stage page.
Profiling only; bench.py remains the timing of record.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_data_lakehouse_spark import entry_queries as eq
from e_commerce_data_lakehouse_spark.session import get_spark

DEFAULT = [
    "streaming_corpus_ingest",
    "global_dw_catalog",
    "robust_price_outliers",
    "part_pagerank",
    "rfm_segments",
    "incremental_dup_clusters",
    "corpus_gold_train_by_lang",
    "containment_dup_flags",
    "late_sole_supplier",
    "leakage_safe_split_counts",
    "dedup_keep_best",
    "dup_clusters_cc",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)
    names = names or DEFAULT

    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4959",
            "spark.ui.retainedJobs": "2000",
            "spark.ui.retainedStages": "4000",
        },
    )
    sc = spark.sparkContext
    base = f"http://localhost:4959/api/v1/applications/{sc.applicationId}"

    # bench.py's warmup: codegen, python workers, parquet footers
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(32).repartition(32).select(_warm("id")).collect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).limit(1).count()

    for name in names:
        spark.catalog.clearCache()
        fn = eq.QUERIES[name].spark_fn
        for run in ("cold", "warm"):
            before_ids = {j["jobId"] for j in _api(base, "/jobs")}
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            jobs = [
                j for j in _api(base, "/jobs") if j["jobId"] not in before_ids
            ]
            jobs.sort(key=lambda j: j["jobId"])
            total_job_ms = 0.0
            lines = []
            for j in jobs:
                sub = j.get("submissionTime", "")
                done = j.get("completionTime", "")
                dur = _dur_ms(sub, done)
                total_job_ms += dur
                desc = (j.get("description") or j.get("name") or "")[:90]
                lines.append(
                    f"    job {j['jobId']:>5} {dur/1000:7.3f}s "
                    f"stages={len(j.get('stageIds', []))} {desc}"
                )
            print(
                f"{name} [{run}] wall={wall:.3f}s jobs={len(jobs)} "
                f"job_time_sum={total_job_ms/1000:.3f}s "
                f"sched_gap={wall - total_job_ms/1000:.3f}s"
            )
            for ln in lines:
                print(ln)
            if run == "warm":
                _stage_detail(base, jobs)
        sys.stdout.flush()
    spark.stop()


def _dur_ms(sub: str, done: str) -> float:
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        a = datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        b = datetime.strptime(done.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        return (b - a).total_seconds() * 1000
    except Exception:
        return 0.0


def _stage_detail(base: str, jobs: list) -> None:
    """Shuffle/task breakdown for the warm run's 5 slowest stages."""
    stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
    stages = []
    for sid in stage_ids:
        try:
            for att in _api(base, f"/stages/{sid}"):
                stages.append(att)
        except Exception:
            pass
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    for s in stages[:5]:
        print(
            f"    stage {s['stageId']:>5} runTime={s.get('executorRunTime', 0)/1000:7.2f}s "
            f"tasks={s.get('numCompleteTasks')} "
            f"in={s.get('inputBytes', 0)/1e6:8.1f}MB "
            f"shufR={s.get('shuffleReadBytes', 0)/1e6:8.1f}MB "
            f"shufW={s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB  "
            f"{(s.get('description') or s.get('name') or '')[:70]}"
        )


if __name__ == "__main__":
    main()
