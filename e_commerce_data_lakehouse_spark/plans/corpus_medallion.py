"""Corpus medallion: the training-data half of the lakehouse lifecycle.

The reference's medallion chain curates TRANSACTIONS
(``Airflow Dags/lakehouse_pipeline_dag.py`` — raw → bronze → silver →
gold, one Airflow DAG of shell stages); this module runs the same
lifecycle over the DOCUMENT corpus, because at 100 TB the corpus is the
asset the pipeline exists to produce:

- **bronze** — raw ingest of every document, annotated once with the
  stateless per-row facts every later stage needs (quality score,
  normalized-content fingerprint, whitespace token count) so no
  downstream stage re-derives them from text;
- **silver_curated** — the benchmark set (``doc_id % 97 = 0``, the
  repo-wide held-out convention) is EXCLUDED, low-quality docs
  (< 0.5) are dropped, and exact near-copies collapse to the lowest
  doc_id per fingerprint (one shuffle on the high-cardinality fp key);
- **silver_clean** — benchmark decontamination: any curated doc sharing
  a distinct word 4-gram with a benchmark doc is removed
  (``corpus.ngram_overlap`` — gram equi-join, never doc×doc);
- **gold** — deterministic content-hash train/val/test split
  (``corpus.dataset_split`` — stable under re-runs and insertions) plus
  the stage CATALOG (per-stage doc and token counts), the table a
  corpus owner actually reads.

Stages run as a dependency DAG through :mod:`plans.scheduler` (retries,
timeouts, upstream-failed propagation — the in-process Airflow
contract), each materialized as a :class:`ManagedTable` snapshot so
every intermediate is time-travelable and re-runs are idempotent
overwrite commits.

Scale notes: every stage is one codegen scan + at most one shuffle on a
high-cardinality key (fp, gram, doc_id); the benchmark gram side is
~1/97 of the corpus, deduplicated before the broadcast join; the
catalog is built from six 1-row aggregates — no data rows ever reach
the driver.  At 100 TB the gold write gains ``partitionBy(split,
lang)`` and the ManagedTable snapshots swap for Delta/Iceberg commits
(SCALING.md §6).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from e_commerce_data_lakehouse_spark.functions import text as tx
from e_commerce_data_lakehouse_spark.operators import corpus as cp
from e_commerce_data_lakehouse_spark.plans.medallion import StageResult
from e_commerce_data_lakehouse_spark.plans.scheduler import Dag
from e_commerce_data_lakehouse_spark.sources.sinks import ManagedTable

BENCH_MOD = 97  # doc_id % 97 == 0 -> held-out benchmark (repo convention)
QUALITY_FLOOR = 0.5
DECON_NGRAM = 4  # word n-gram size (synthetic corpus: 4, prod default 8)


def _stage(name: str, table: ManagedTable, t0: float) -> StageResult:
    return StageResult(
        name, table.read().count(), round(time.monotonic() - t0, 3)
    )


def ingest_bronze(docs: DataFrame, bronze: ManagedTable) -> StageResult:
    """Raw → bronze: annotate once (quality, fingerprint, token count) —
    stateless codegen expressions, map-only."""
    t0 = time.monotonic()
    text = F.col("text")
    bronze.overwrite(
        docs.select(
            "doc_id",
            "lang",
            "text",
            tx.quality_score(text).alias("quality"),
            tx.fingerprint(text).alias("fp"),
            tx.whitespace_token_count(text).alias("n_tok"),
        )
    )
    return _stage("ingest_bronze", bronze, t0)


def curate_silver(
    bronze: ManagedTable, silver_curated: ManagedTable
) -> StageResult:
    """Bronze → silver_curated: hold out the benchmark, gate on quality,
    collapse exact near-copies to the lowest doc_id per fingerprint."""
    t0 = time.monotonic()
    src = bronze.read().filter(
        (F.col("doc_id") % BENCH_MOD != 0)
        & (F.col("quality") >= QUALITY_FLOOR)
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    silver_curated.overwrite(
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return _stage("curate_silver", silver_curated, t0)


def decontaminate_silver(
    bronze: ManagedTable,
    silver_curated: ManagedTable,
    silver_clean: ManagedTable,
) -> StageResult:
    """silver_curated → silver_clean: drop every doc sharing a distinct
    word 4-gram with the benchmark set (GPT-3 appendix-C shape via
    ``corpus.ngram_overlap`` — gram equi-join, then one anti join)."""
    t0 = time.monotonic()
    bench = bronze.read().filter(F.col("doc_id") % BENCH_MOD == 0)
    curated = silver_curated.read()
    contaminated = cp.ngram_overlap(curated, bench, n=DECON_NGRAM).select(
        "doc_id"
    )
    silver_clean.overwrite(curated.join(contaminated, "doc_id", "left_anti"))
    return _stage("decontaminate", silver_clean, t0)


def publish_gold(
    silver_clean: ManagedTable, gold: ManagedTable
) -> StageResult:
    """silver_clean → gold: deterministic content-hash split column.
    (At 100 TB: ``partitionBy(split, lang)`` on the write.)"""
    t0 = time.monotonic()
    gold.overwrite(
        cp.dataset_split(silver_clean.read(), "doc_id", val_pct=10,
                         test_pct=10)
    )
    return _stage("publish_gold", gold, t0)


def build_catalog(
    tables: dict[str, ManagedTable], catalog: ManagedTable
) -> StageResult:
    """Stage catalog: (stage, n_docs, n_tokens) — six 1-row aggregates
    (bounded), unioned and snapshotted; the corpus owner's dashboard."""
    t0 = time.monotonic()

    def stat(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
        )

    gold_df = tables["gold"].read()
    out = (
        stat("bronze", tables["bronze"].read())
        .unionByName(stat("silver_curated", tables["silver_curated"].read()))
        .unionByName(stat("silver_clean", tables["silver_clean"].read()))
        .unionByName(stat("gold_train", gold_df.filter(F.col("split") == "train")))
        .unionByName(stat("gold_val", gold_df.filter(F.col("split") == "val")))
        .unionByName(stat("gold_test", gold_df.filter(F.col("split") == "test")))
    )
    catalog.overwrite(out)
    return _stage("catalog", catalog, t0)


def corpus_dag(
    spark: SparkSession, sf_dir: str, workdir: str
) -> tuple[Dag, dict[str, ManagedTable]]:
    """The corpus curation chain as a scheduler DAG (same contract as
    ``medallion.orders_dag``: retries=1, 1800 s per-task timeout,
    linear dependencies, every stage an idempotent overwrite commit)."""
    from e_commerce_data_lakehouse_spark.entry_queries import load

    tables = {
        name: ManagedTable(spark, os.path.join(workdir, name))
        for name in (
            "bronze",
            "silver_curated",
            "silver_clean",
            "gold",
            "catalog",
        )
    }
    docs = load(spark, sf_dir, "documents")["documents"]
    dag = Dag("corpus_lakehouse", schedule="0 2 * * *")
    dag.add(
        "ingest_bronze",
        lambda: ingest_bronze(docs, tables["bronze"]),
        retries=1,
        timeout=1800,
    )
    dag.add(
        "curate_silver",
        lambda: curate_silver(tables["bronze"], tables["silver_curated"]),
        deps=["ingest_bronze"],
        retries=1,
        timeout=1800,
    )
    dag.add(
        "decontaminate",
        lambda: decontaminate_silver(
            tables["bronze"], tables["silver_curated"], tables["silver_clean"]
        ),
        deps=["curate_silver"],
        retries=1,
        timeout=1800,
    )
    dag.add(
        "publish_gold",
        lambda: publish_gold(tables["silver_clean"], tables["gold"]),
        deps=["decontaminate"],
        retries=1,
        timeout=1800,
    )
    dag.add(
        "catalog",
        lambda: build_catalog(tables, tables["catalog"]),
        deps=["publish_gold"],
        retries=1,
        timeout=1800,
    )
    return dag, tables
