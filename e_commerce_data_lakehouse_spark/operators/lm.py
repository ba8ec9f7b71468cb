"""N-gram language-model quality scoring (Stupid Backoff, integer log space).

The CCNet / KenLM recipe for pretraining-corpus quality filtering: train a
small n-gram LM on an in-domain slice, score every document's
log-probability, and drop (or bucket) the high-perplexity tail.  This module
is that recipe re-expressed as pure Catalyst relational algebra — counts are
hash aggregates, scoring is a fan of vocab-sized left joins — with one twist
that makes it *oracle-checkable*: all log-probabilities live in a quantized
integer log2 domain, so Spark and an ANSI-SQL engine produce bit-identical
scores (no float log, no cross-engine libm drift).

Quantized log2 (``P`` = 10 fractional bits)::

    qlog2(c) = k * 2^P + floor(c * 2^P / 2^k) - 2^P     where k = floor(log2(c))

i.e. the exponent plus a linear interpolation of the mantissa in 1/1024
steps — max error vs true log2 is ~0.086 bits, far below what a perplexity
*filter* can distinguish.  ``floor(log2(c))`` on a BIGINT count is exact in
both engines: within an octave the true log2 is at least ~1e-12 from the
next integer while libm log2 is faithful to ~1e-15 (probed bit-identical
Spark vs DuckDB across the count range in ``tests/test_lm.py``).

Stupid Backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") with backoff factor alpha = 1/2 — chosen over the paper's 0.4
because log2(1/2) = -1 is *exact* in the integer domain (one backoff step
subtracts exactly ``2^P``); the paper itself notes the constant is not
sensitive.  Score of token w at position i (contexts u = w[i-2], v = w[i-1]):

    S = qlog2(c3(uvw)) - qlog2(c2(uv))              if the trigram was seen
      | -B*(m-2) + qlog2(c2(vw)) - qlog2(c1(v))     elif the bigram was seen
      | -B*(m-1) + qlog2(c1(w))  - qlog2(N)         elif the unigram was seen
      | -B*(m-1) - qlog2(N)                         else (OOV: count clamps to 1)

where ``B = 2^P``, ``m`` = highest order available at this position (1 for
the first token, 2 for the second, 3 otherwise) and ``N`` = total training
tokens.  Counts are raw corpus counts, so every ratio is <= 1 and every
score <= 0; the chain is total because c2(uv) / c1(v) are provably non-null
whenever the higher-order count is (any trigram occurrence contains its
context bigram one position earlier).

Scale shape (the 100 TB story):

- the token-position stream is a single projection + explode off the
  documents scan — never shuffled, never persisted (re-derived per pass;
  persisting a corpus-sized token stream measured slower at gen-sf1, see
  the vocab-persist note on ``langid``);
- the three count tables are map-side-combined hash aggregates that
  collapse to *vocab* size, then persist (in production they'd be written
  once as the trained-LM table and reused across scoring runs);
- scoring joins are vocab-sized build sides — AQE broadcasts them at bench
  scale and degrades to gram-key shuffle joins when the trigram vocab
  outgrows broadcast (the standard sharded-LM scoring layout), with no
  hint pinning either strategy;
- the per-doc rollup aggregates rows that are still partitioned by their
  source document, so map-side combine does nearly all of it.

No reference-repo counterpart (this is the beyond-reference LLM-pipeline
family); the tokenization is pinned to the repo-wide ``normalize_text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.caching import tracked_persist
from e_commerce_data_lakehouse_spark.operators.corpus import hash_bucket
from e_commerce_data_lakehouse_spark.operators.dedup import normalize_text

P_BITS = 10
BACKOFF = 1 << P_BITS  # alpha = 1/2 per skipped order, exactly 2^P in qlog2


def qlog2_sql(c: str) -> str:
    """Spark-SQL fragment: quantized integer log2 of BIGINT expression ``c``.

    Exact-integer except for ``floor(log2(c))``, which is exact for counts
    (see module docstring).  ``c`` must be >= 1.
    """
    k = f"CAST(floor(log2({c})) AS BIGINT)"
    # CAST(c AS BIGINT) before the 2^P multiply: when ``c`` arrives as an
    # INT expression (e.g. a driver-embedded corpus-total literal), the
    # mantissa product runs in int32 and overflows past c ~ 2.1e6 —
    # caught by the r8 gen-sf10 sweep at total = 23.6M tokens (ANSI
    # throw); invisible at sf0.01
    return (
        f"(({k}) * {1 << P_BITS}"
        f" + (CAST(({c}) AS BIGINT) * {1 << P_BITS})"
        f" div shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT))"
        f" - {1 << P_BITS})"
    )


def token_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per token position: (id, pos, t, t1, t2).

    ``t1``/``t2`` are the previous / previous-previous tokens (NULL where
    the position has no such context), built with an array ``transform`` in
    the same projection as the tokenization — no window, no self-join, no
    shuffle.  Tokenization = repo-wide ``normalize_text`` + space split.
    """
    return (
        docs.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
        )
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w)), i -> struct("
                    "  i AS pos,"
                    "  element_at(__w, i) AS t,"
                    "  IF(i >= 2, element_at(__w, i - 1), NULL) AS t1,"
                    "  IF(i >= 3, element_at(__w, i - 2), NULL) AS t2))"
                )
            ).alias("__p"),
        )
        .select(id_col, "__p.pos", "__p.t", "__p.t1", "__p.t2")
    )


def ngram_counts(
    stream: DataFrame, persist: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(trigram, bigram, unigram) count tables from a token-position stream.

    All three orders come out of ONE pass over the stream: a single hash
    aggregate at full (t2, t1, t) granularity — NULL contexts kept as
    their own groups — then the bigram and unigram tables are rollups of
    that *vocab-sized* frame (every position with a previous token appears
    in exactly one (t2, t1, t) group, so summing trigram counts over t2
    reproduces the bigram count, including positions whose t2 is NULL).
    The tokenize+explode scan runs once instead of three times and, unlike
    a GROUPING SETS formulation, nothing triples the pre-combine row
    stream (Expand on the corpus-sized stream measured *slower* than three
    scans at sf0.1).  The full-granularity frame persists — it is the
    trained model, and all three tables plus the five scoring probes
    derive from it.
    """
    counts = stream.groupBy("t2", "t1", "t").agg(F.count("*").alias("c"))
    if persist:
        counts = tracked_persist(counts)
    tri = counts.filter(F.col("t2").isNotNull()).select(
        "t2", "t1", "t", F.col("c").alias("c3")
    )
    bi = (
        counts.filter(F.col("t1").isNotNull())
        .groupBy("t1", "t")
        .agg(F.sum("c").cast("long").alias("c2"))
    )
    uni = counts.groupBy("t").agg(F.sum("c").cast("long").alias("c1"))
    return tri, bi, uni


def score_positions(
    stream: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
) -> DataFrame:
    """Stupid-Backoff qlog2 score per token position.

    Adds ``q`` (BIGINT score, <= 0) and ``is_oov`` to the stream.  The
    score is a PURE FUNCTION of the ``(t2, t1, t)`` triple — the five
    count probes, the backoff order ``m`` and the OOV flag all derive
    from the triple alone — so it is computed once per DISTINCT triple
    (the five probe joins and the qlog2 arithmetic run over the
    vocab-sized triple table) and attached to the corpus-sized stream by
    ONE null-safe lookup join.  The previous form ran all five probe
    joins over the position stream itself: five corpus-sized join passes
    (shuffles, once the gram tables outgrow broadcast — measured 40 s at
    gen-sf10 where this was the registry's slowest non-quadratic row)
    and the heavyweight qlog2 expression per POSITION instead of per
    distinct triple (guide §2.3: aggregate before you shuffle / compute
    on the deduplicated domain).  The total token count ``N`` is a
    bounded driver-side scalar off the (persisted, vocab-sized) unigram
    table, plugged in as a literal — a scalar-subquery cross join would
    put a BroadcastNestedLoopJoin in the hot path for a value that is
    one number.
    """
    n_tok = int(uni.agg(F.sum("c1")).first()[0] or 1)  # empty train -> N=1
    triples = stream.select("t2", "t1", "t").distinct()
    probed = (
        triples.join(tri, ["t2", "t1", "t"], "left")
        .join(bi, ["t1", "t"], "left")
        .join(
            bi.select(
                F.col("t1").alias("t2"),
                F.col("t").alias("t1"),
                F.col("c2").alias("c2ctx"),
            ),
            ["t2", "t1"],
            "left",
        )
        .join(uni, ["t"], "left")
        .join(
            uni.select(F.col("t").alias("t1"), F.col("c1").alias("c1ctx")),
            ["t1"],
            "left",
        )
    )
    m = "(1 + IF(t1 IS NOT NULL, 1, 0) + IF(t2 IS NOT NULL, 1, 0))"
    qn = qlog2_sql(str(n_tok))
    score = (
        "CASE"
        f" WHEN c3 IS NOT NULL THEN {qlog2_sql('c3')} - {qlog2_sql('c2ctx')}"
        f" WHEN c2 IS NOT NULL THEN -{BACKOFF} * ({m} - 2)"
        f"   + {qlog2_sql('c2')} - {qlog2_sql('c1ctx')}"
        f" WHEN c1 IS NOT NULL THEN -{BACKOFF} * ({m} - 1)"
        f"   + {qlog2_sql('c1')} - {qn}"
        f" ELSE -{BACKOFF} * ({m} - 1) - {qn}"
        " END"
    )
    lut = probed.selectExpr(
        "t2 AS __t2",
        "t1 AS __t1",
        "t AS __t",
        f"CAST({score} AS BIGINT) AS q",
        "c1 IS NULL AS is_oov",
    )
    # null-safe equi-join: t1/t2 are NULL at the first two positions of
    # every document, and the triple table keeps those NULL-context rows
    # as their own entries; EqualNullSafe keys still plan as hash joins.
    # Inner join is exact — every stream triple is in `triples` by
    # construction, and `triples` is unique-keyed, so row multiplicity
    # is preserved.
    return stream.join(
        lut,
        stream["t2"].eqNullSafe(lut["__t2"])
        & stream["t1"].eqNullSafe(lut["__t1"])
        & stream["t"].eqNullSafe(lut["__t"]),
        "inner",
    ).drop("__t2", "__t1", "__t")


def lm_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_buckets: int = 80,
) -> DataFrame:
    """Train on the deterministic hash-bucket slice, score every document.

    Returns (id, n_tokens, qlp_total, n_oov, above_avg): total quantized
    log2-probability, OOV count, and the multiplied-through integer
    comparison of the doc's per-token score against the corpus average —
    the boolean a quality filter keys on.  Train membership is
    ``hash_bucket(id) < train_buckets`` (stable under re-runs/insertions,
    same split family as ``dataset_split``), so held-out docs are scored by
    a model that never saw them.
    """
    stream = token_positions(docs, id_col, text_col)
    train = stream.filter(hash_bucket(F.col(id_col)) < train_buckets)
    tri, bi, uni = ngram_counts(train)  # one pass, shared persisted frame
    per_doc = (
        score_positions(stream, tri, bi, uni)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("q").cast("long").alias("qlp_total"),
            F.sum(F.col("is_oov").cast("long")).cast("long").alias("n_oov"),
        )
    )
    # doc-count rows (tiny); two consumers — the corpus-totals scalar and
    # the returned frame — must not re-run the scoring pipeline each
    per_doc = tracked_persist(per_doc)
    # corpus totals: bounded scalars off the persisted per-doc frame
    tt, tq = per_doc.agg(
        F.sum("n_tokens").cast("long"), F.sum("qlp_total").cast("long")
    ).first()
    return per_doc.withColumn(
        "above_avg",
        F.col("qlp_total").cast("decimal(38,0)") * F.lit(int(tt or 0))
        >= F.lit(int(tq or 0)).cast("decimal(38,0)") * F.col("n_tokens"),
    )
