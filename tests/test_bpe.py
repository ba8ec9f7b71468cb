"""BPE tokenizer invariants (operators/bpe.py) — the pytest stand-in for a
SQL oracle, since the iterative merge loop is not SQL-expressible."""

from __future__ import annotations

from e_commerce_data_lakehouse_spark.operators import bpe as bp


def _train_on(spark, texts, n_merges=50, sample_size=1000):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return df, bp.bpe_train(df, "text", n_merges=n_merges, sample_size=sample_size)


def test_bpe_train_is_deterministic(spark):
    texts = ["the cat sat on the mat", "the cat ate the rat", "low lower lowest"] * 5
    _, m1 = _train_on(spark, texts)
    _, m2 = _train_on(spark, texts)
    assert m1 == m2 and len(m1) > 0


def test_bpe_roundtrip_lossless_including_unicode(spark):
    # byte-level alphabet must cover any UTF-8 input, not just ASCII
    words = ["hello", "naïve", "straße", "数据", "héllo-wörld", "a"]
    texts = [" ".join(words)] * 4
    df, merges = _train_on(spark, texts)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        toks = bp._encode_word(w, ranks)
        assert bp.detokenize(toks) == w, w


def test_bpe_vocab_growth_bounded_and_merges_compress(spark):
    texts = ["aa ab aa ab ba bb aa", "aa aa ab ba ba"] * 6
    df, merges = _train_on(spark, texts, n_merges=20)
    ranks_all = {p: i for i, p in enumerate(merges)}
    # token count is monotonically non-increasing as merges are added
    prev = None
    for k in range(0, len(merges) + 1):
        ranks = {p: i for i, p in enumerate(merges[:k])}
        n = sum(len(bp._encode_word(w, ranks)) for w in ["aa", "ab", "ba", "bb"])
        if prev is not None:
            assert n <= prev
        prev = n
    # with enough merges the frequent word collapses to one token
    assert len(bp._encode_word("aa", ranks_all)) == 1
    # vocab growth is bounded by the merge count
    toks = set()
    for w in ["aa", "ab", "ba", "bb"]:
        toks.update(bp._encode_word(w, ranks_all))
    assert len(toks) <= 2 + 1 + len(merges)  # bytes {a,b} + EOW + merges


def test_bpe_roundtrip_lossless_with_literal_marker_text(spark):
    """Input that literally contains '</w>' (or any marker-ish substring)
    must round-trip: the end-of-word marker lives outside the latin-1
    byte alphabet, so encoded input bytes can never collide with it."""
    words = ["</w>", "a</w>b", "<w>", "</w></w>", bp.EOW + "x"]
    texts = [" ".join(words)] * 4
    df, merges = _train_on(spark, texts)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        toks = bp._encode_word(w, ranks)
        assert bp.detokenize(toks) == w, w


def test_bpe_apply_matches_driver_encoding(spark):
    texts = ["spark batch line order", "order line batch spark spark"] * 3
    df, merges = _train_on(spark, texts, n_merges=30)
    out = {
        r["doc_id"]: r
        for r in bp.bpe_apply(df, "doc_id", "text", merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        want = []
        for w in t.split(" "):
            want.extend(bp._encode_word(w, ranks))
        assert out[i]["tokens"] == want
        assert out[i]["n_tokens"] == len(want)
        # round-trip through the distributed path too
        assert bp.detokenize(out[i]["tokens"]) == t


def test_bpe_token_stats_query_shape(spark):
    from e_commerce_data_lakehouse_spark import entry_queries as eq

    df = eq.QUERIES["bpe_token_stats"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    docs = eq.load(spark, "/root/testdata/sf0.001", "documents")["documents"]
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r["n_tokens"] >= 1
        assert 1 <= r["n_distinct_tokens"] <= r["n_tokens"]


def test_bpe_training_sample_partitioning_independent(spark):
    """Learned merges must not depend on physical partitioning (the old
    sample().limit() draw raced on partition arrival order)."""
    texts = [f"doc {i} common words repeat {i % 7}" for i in range(200)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    m1 = bp.bpe_train(df.repartition(1), "text", n_merges=30, sample_size=50)
    m2 = bp.bpe_train(df.repartition(11), "text", n_merges=30, sample_size=50)
    assert m1 == m2 and len(m1) > 0
