"""PageRank analytic answer checks (r9 VERDICT #5, small-scale form of
``tools/pagerank_invariant.py``): on the wheel graph the exact
fixed-point ranks reduce to a 2-class integer recurrence, so the engine
answer is pinned EXACTLY — plus the two-sided rank-mass bound, and
brute-force float cross-validation on a small random graph.
"""

from __future__ import annotations

import random

from e_commerce_data_lakehouse_spark.operators.graph import pagerank_fixed
from tools.pagerank_invariant import (
    UNIT,
    predict_wheel,
    run_check,
    wheel_edges,
)


def test_wheel_exact_ranks_broadcast_path(spark):
    row = run_check(spark, n_ring=997, iters=5, broadcast_threshold=10**6)
    assert row["status"] == "ok", row["errors"]
    assert row["join_path"] == "broadcast"


def test_wheel_exact_ranks_shuffle_path(spark):
    """broadcast_threshold=0 forces the shuffle-join loop (the 100 TB
    path) — identical answers required."""
    row = run_check(spark, n_ring=500, iters=4, broadcast_threshold=0)
    assert row["status"] == "ok", row["errors"]
    assert row["join_path"] == "shuffle"


def test_wheel_prediction_tracks_float_model(spark):
    """The integer recurrence must sit within flooring distance of the
    true float stationary behavior (guards against a systematically
    wrong recurrence that the engine happens to share)."""
    n_ring, iters = 200, 6
    r_ring, r_hub = predict_wheel(n_ring, iters)
    n_v = n_ring + 1
    fr = fh = 1.0 / n_v
    for _ in range(iters):
        sr, sh = fr / 3, fh / n_ring
        fr, fh = (
            0.15 / n_v + 0.85 * (2 * sr + sh),
            0.15 / n_v + 0.85 * (n_ring * sr),
        )
    # integer ranks are floats scaled by UNIT, minus bounded floor loss
    # (each iteration floors <1 unit/share; losses compound across iters)
    assert 0 <= fr * UNIT - r_ring < iters * 50
    assert 0 <= fh * UNIT - r_hub < iters * (n_ring + 50)


def test_random_graph_mass_bound(spark):
    """The mass-accounting bound must hold on an arbitrary symmetrized
    graph, not just the symmetric wheel."""
    rng = random.Random(5)
    pairs = {(rng.randrange(60), rng.randrange(60)) for _ in range(300)}
    pairs = [(a, b) for a, b in pairs if a != b]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "src long, dst long").distinct()
    n_e = edges.count()
    iters = 5
    ranks = pagerank_fixed(edges, iterations=iters).collect()
    n_v = len(ranks)
    loss = UNIT - sum(r["rank_fp"] for r in ranks)
    assert 0 <= loss <= n_v + iters * (n_e + 2 * n_v)


def test_wheel_edges_shape(spark):
    e = wheel_edges(spark, 50)
    assert e.count() == 200
    # symmetrized: reversing every edge yields the same multiset
    rev = e.selectExpr("dst AS src", "src AS dst")
    assert e.exceptAll(rev).count() == 0
