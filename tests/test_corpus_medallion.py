"""Corpus medallion DAG: stage invariants, idempotence, failure paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.plans.corpus_medallion import (
    BENCH_MOD,
    QUALITY_FLOOR,
    corpus_dag,
)

SF = "/root/testdata/sf0.001"


def _run(spark, tmp_path):
    dag, tables = corpus_dag(spark, SF, str(tmp_path))
    runs = dag.run(spark)
    return runs, tables


def test_all_stages_succeed_and_funnel_narrows(spark, tmp_path):
    runs, tables = _run(spark, tmp_path)
    assert [r.status for r in runs] == ["success"] * 5
    assert [r.name for r in runs] == [
        "ingest_bronze",
        "curate_silver",
        "decontaminate",
        "publish_gold",
        "catalog",
    ]
    cat = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in tables["catalog"].read().collect()
    }
    assert set(cat) == {
        "bronze",
        "silver_curated",
        "silver_clean",
        "gold_train",
        "gold_val",
        "gold_test",
    }
    # the funnel only narrows, and gold partitions the clean set exactly
    assert cat["bronze"][0] >= cat["silver_curated"][0]
    assert cat["silver_curated"][0] >= cat["silver_clean"][0]
    assert cat["silver_clean"][0] == (
        cat["gold_train"][0] + cat["gold_val"][0] + cat["gold_test"][0]
    )
    assert cat["silver_clean"][1] == (
        cat["gold_train"][1] + cat["gold_val"][1] + cat["gold_test"][1]
    )
    assert cat["silver_clean"][0] > 0  # non-vacuous at sf0.001


def test_silver_invariants(spark, tmp_path):
    _, tables = _run(spark, tmp_path)
    silver = tables["silver_curated"].read()
    # benchmark held out, quality gated, fingerprints unique
    assert silver.filter(F.col("doc_id") % BENCH_MOD == 0).count() == 0
    assert silver.filter(F.col("quality") < QUALITY_FLOOR).count() == 0
    n = silver.count()
    assert silver.select("fp").distinct().count() == n
    # dedup kept the LOWEST doc_id per fingerprint
    bronze = tables["bronze"].read().filter(
        (F.col("doc_id") % BENCH_MOD != 0)
        & (F.col("quality") >= QUALITY_FLOOR)
    )
    expected = bronze.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    assert silver.join(expected, ["fp", "doc_id"]).count() == n


def test_clean_set_shares_no_gram_with_benchmark(spark, tmp_path):
    from e_commerce_data_lakehouse_spark.operators import corpus as cp

    _, tables = _run(spark, tmp_path)
    bench = tables["bronze"].read().filter(F.col("doc_id") % BENCH_MOD == 0)
    clean = tables["silver_clean"].read()
    assert cp.ngram_overlap(clean, bench, n=4).count() == 0


def test_rerun_is_idempotent(spark, tmp_path):
    runs1, tables = _run(spark, tmp_path)
    cat1 = sorted(
        map(tuple, tables["catalog"].read().collect()), key=repr
    )
    dag2, tables2 = corpus_dag(spark, SF, str(tmp_path))
    runs2 = dag2.run(spark)
    assert [r.status for r in runs2] == ["success"] * 5
    cat2 = sorted(
        map(tuple, tables2["catalog"].read().collect()), key=repr
    )
    assert cat1 == cat2
    # overwrite commits bump the snapshot version — time travel works
    assert len(tables2["catalog"].history()) >= 2


def test_stage_failure_propagates(spark, tmp_path):
    dag, tables = corpus_dag(spark, SF, str(tmp_path))

    def boom():
        raise RuntimeError("planted curation failure")

    dag.tasks["curate_silver"].fn = boom
    dag.tasks["curate_silver"].retries = 0
    runs = {r.name: r for r in dag.run(spark)}
    assert runs["ingest_bronze"].status == "success"
    assert runs["curate_silver"].status == "failed"
    assert runs["decontaminate"].status == "upstream_failed"
    assert runs["publish_gold"].status == "upstream_failed"
    assert runs["catalog"].status == "upstream_failed"
    assert not tables["silver_clean"].exists()
