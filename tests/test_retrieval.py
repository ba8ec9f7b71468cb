"""Hybrid retrieval (RRF fusion) invariants."""

from __future__ import annotations

from e_commerce_data_lakehouse_spark import entry_queries as eq
from tests.conftest import SF_SMALL


def test_rrf_scores_are_exact_rank_fusion(spark):
    rows = (
        eq.QUERIES["hybrid_search_rrf"].spark_fn(spark, SF_SMALL).collect()
    )
    assert 0 < len(rows) <= 20
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            want += 1_000_000_000 // (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            want += 1_000_000_000 // (60 + r["sem_rank"])
        assert r["rrf_score"] == want
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
    # fusion must actually fuse: a doc holding BOTH ranks outranks a doc
    # holding only a deep single-arm rank whenever both exist in the list
    both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
    assert both, "expected at least one doc ranked by both arms in top-20"
