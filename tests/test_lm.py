"""Stupid-Backoff n-gram LM (operators/lm.py): scores pinned against an
independent pure-Python reference implementation, plus the exactness probe
for the quantized-log primitive the whole domain rests on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators import lm

P = 1 << lm.P_BITS  # 1024


def qlog2_ref(c: int) -> int:
    k = c.bit_length() - 1
    return k * P + (c * P) // (1 << k) - P


def ref_doc_scores(texts: dict[int, str], train_ids: set[int]):
    """Independent Python scorer (dict counts, no Spark/SQL)."""
    toks = {i: t.lower().split() for i, t in texts.items()}
    tri: dict = {}
    bi: dict = {}
    uni: dict = {}
    for i in train_ids:
        w = toks[i]
        for j, t in enumerate(w):
            uni[t] = uni.get(t, 0) + 1
            if j >= 1:
                bi[(w[j - 1], t)] = bi.get((w[j - 1], t), 0) + 1
            if j >= 2:
                key = (w[j - 2], w[j - 1], t)
                tri[key] = tri.get(key, 0) + 1
    n = sum(uni.values())
    out = {}
    for i, w in toks.items():
        total, oov = 0, 0
        for j, t in enumerate(w):
            m = 1 + (j >= 1) + (j >= 2)
            c3 = tri.get((w[j - 2], w[j - 1], t)) if j >= 2 else None
            c2 = bi.get((w[j - 1], t)) if j >= 1 else None
            c1 = uni.get(t)
            if c3:
                q = qlog2_ref(c3) - qlog2_ref(bi[(w[j - 2], w[j - 1])])
            elif c2:
                q = -P * (m - 2) + qlog2_ref(c2) - qlog2_ref(uni[w[j - 1]])
            elif c1:
                q = -P * (m - 1) + qlog2_ref(c1) - qlog2_ref(n)
            else:
                q = -P * (m - 1) - qlog2_ref(n)
                oov += 1
            total += q
        out[i] = (len(w), total, oov)
    return out


def test_qlog2_exact_across_count_range(spark):
    """floor(log2(c)) + linear-mantissa interp must equal the pure-integer
    reference for counts spanning every octave boundary up to 2^45."""
    vals = []
    for k in range(0, 46):
        for d in (-1, 0, 1):
            c = (1 << k) + d
            if c >= 1:
                vals.append(c)
    vals += [3, 5, 7, 999, 1000003, 999999999999]
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "c long")
    got = {
        r.c: r.q
        for r in df.selectExpr(
            "c", f"CAST({lm.qlog2_sql('c')} AS BIGINT) AS q"
        ).collect()
    }
    for c, q in got.items():
        assert q == qlog2_ref(c), c
        # quantization error vs true log2 stays under 2^-3 bits
        assert abs(q / P - math.log2(c)) < 0.125


def test_lm_scores_match_python_reference(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the hat",
        3: "the dog sat on the mat",
        4: "a completely unseen zebra phrase",  # OOV-heavy
        5: "the",  # single token: unigram path only
        6: "the cat",  # two tokens: bigram path max
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    # force a known split: train on ALL docs (train_buckets=100)
    got = {
        r.doc_id: (r.n_tokens, r.qlp_total, r.n_oov)
        for r in lm.lm_doc_scores(docs, train_buckets=100).collect()
    }
    want = ref_doc_scores(texts, train_ids=set(texts))
    assert got == want


def test_lm_heldout_docs_scored_by_unseen_model(spark):
    """With a partial train split, held-out-only vocabulary is OOV."""
    from e_commerce_data_lakehouse_spark.operators.corpus import hash_bucket

    texts = {i: f"shared words plus unique{i} token" for i in range(20)}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    buckets = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    train_ids = {i for i, b in buckets.items() if b < 50}
    assert 0 < len(train_ids) < 20
    got = {
        r.doc_id: (r.n_tokens, r.qlp_total, r.n_oov)
        for r in lm.lm_doc_scores(docs, train_buckets=50).collect()
    }
    want = ref_doc_scores(texts, train_ids)
    assert got == want
    # every held-out doc has exactly one OOV token (its unique{i});
    # train docs have zero
    for i in texts:
        assert got[i][2] == (0 if i in train_ids else 1)


def test_above_avg_flag_is_mean_split(spark):
    texts = {
        1: "common common common common",
        2: "common common common common",
        3: "rare1 rare2 rare3 rare4",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm.lm_doc_scores(docs, train_buckets=100).collect()}
    tq = sum(r.qlp_total for r in rows.values())
    tt = sum(r.n_tokens for r in rows.values())
    for i, r in rows.items():
        assert r.above_avg == (r.qlp_total * tt >= tq * r.n_tokens), i
    assert rows[1].above_avg and not rows[3].above_avg
