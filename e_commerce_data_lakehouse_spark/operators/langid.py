"""N-gram-profile language identification (training-data pipeline op).

Extends the reference's script-block language ID (the `detect_script`
expression; reference keeps a `lang`-style field at
`social_to_deltalake_table.py:296-327`) into the classic n-gram-profile
classifier: build a per-language character-trigram profile from a labeled
corpus, then classify documents by trigram overlap with each profile.

Scale design (100 TB):
- Trigram extraction is `explode(sequence(...))` + `substr` — pure codegen,
  no Python, no arrays materialized per row (the substr runs lazily per
  exploded index).  This beat higher-order-function pipelines ~5x in the
  MinHash work; same shape reused here.
- The per-doc trigram count table is the only shuffle (groupBy doc_id,
  trigram) and is reused by BOTH the profile build and the scoring join, so
  callers persist it once instead of recomputing the explode twice.
- The learned profile is tiny (n_languages x top_n rows) and is explicitly
  `broadcast()` into the scoring join — classification is a map-side join +
  one aggregation, never a shuffle of the corpus against the profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trigram_counts(df: DataFrame, key_cols: list[str], text_col: str) -> DataFrame:
    """Per-key character-trigram counts of lowercased text.

    Docs shorter than 3 chars produce no rows (same as the oracle's
    `generate_series` yielding an empty range).  The guard also keeps
    Spark's `sequence` from producing a *descending* range when
    ``length - 2 < 1`` (sequence infers step -1 when start > stop).
    """
    t = F.lower(F.col(text_col))
    return (
        df.filter(F.length(F.col(text_col)) >= 3)
        .select(*key_cols, t.alias("_t"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.lit(1), F.length("_t") - 2)).alias("_i"),
            F.col("_t"),
        )
        .select(*key_cols, F.col("_t").substr(F.col("_i"), F.lit(3)).alias("trigram"))
        .groupBy(*key_cols, "trigram")
        .agg(F.count(F.lit(1)).alias("tg_count"))
    )


def language_profiles(
    doc_trigrams: DataFrame, lang_col: str, top_n: int = 50
) -> DataFrame:
    """Top-N trigrams per language by corpus frequency.

    Input is the output of :func:`trigram_counts` keyed by (doc, lang).
    Deterministic rank tiebreak: count desc, then trigram asc.
    """
    by_lang = doc_trigrams.groupBy(lang_col, "trigram").agg(
        F.sum("tg_count").alias("lang_count")
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("lang_count"), F.asc("trigram")
    )
    return (
        by_lang.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col(lang_col).alias("profile_lang"),
            "trigram",
            F.col("lang_count").cast("long").alias("lang_count"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def classify(
    doc_trigrams: DataFrame, profiles: DataFrame, id_cols: list[str]
) -> DataFrame:
    """Assign each document the language whose profile it overlaps most.

    Score = sum of the document's trigram multiplicities over trigrams in
    that language's profile.  The profile side is broadcast (tiny); argmax
    tiebreak is language name asc.  Documents sharing no trigram with any
    profile drop out (inner join) — deterministic on both engines.
    """
    scores = (
        doc_trigrams.join(F.broadcast(profiles), "trigram")
        .groupBy(*id_cols, "profile_lang")
        .agg(F.sum("tg_count").cast("long").alias("score"))
    )
    w = Window.partitionBy(*id_cols).orderBy(
        F.desc("score"), F.asc("profile_lang")
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*id_cols, F.col("profile_lang").alias("predicted_lang"), "score")
    )
