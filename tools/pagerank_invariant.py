"""In-engine PageRank answer check at gen-sf1 scale (r9 VERDICT #5).

``part_pagerank``'s unrolled-CTE DuckDB oracle spills >64 GB at gen-sf1,
so the ≥sf1 answer evidence comes from invariants strong enough to catch
any arithmetic or join defect, run on a CONSTRUCTED 24M-edge graph whose
exact fixed-point ranks are computable driver-side:

Graph: a "wheel" — ring of N vertices (i ↔ i+1 mod N) plus one hub
adjacent to every ring vertex; symmetrized, 4N directed edges.  By
symmetry every ring vertex has degree 3 and the identical rank at every
iteration, so the whole 2-class system reduces to an integer recurrence
(`predict_wheel`) replaying pagerank_fixed's exact BIGINT arithmetic:

    share_r = r_ring div 3          share_h = r_hub div N
    r_ring' = base + (d*(2*share_r + share_h)) div 100
    r_hub'  = base + (d*(N*share_r)) div 100

Checks (all EXACT, no tolerances):
1. the engine's 24M-edge result has EXACTLY two distinct rank values,
   equal to the predicted (ring, hub) pair — any dropped/duplicated
   edge, wrong degree, or off-by-one in the damping arithmetic breaks
   this for the whole vertex set at once;
2. rank-mass accounting: total mass starts at ``unit`` (r0 = unit div
   N_v per vertex) and teleport conserves it on a dangling-free graph,
   so ``0 ≤ unit − Σ rank_fp ≤ N_v + k·(|E| + 2·N_v)`` (initial split
   loss + per-iteration flooring: <1 unit per edge share, <1 per vertex
   damping div, <1 per vertex base).

Usage: python tools/pagerank_invariant.py [--ring 6000000] [--iters 5]
           [--out artifacts/pagerank_invariant.jsonl]
Exit 0 iff every check holds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_data_lakehouse_spark.operators.graph import (  # noqa: E402
    pagerank_fixed,
)
from e_commerce_data_lakehouse_spark.session import get_spark  # noqa: E402

DAMPING = 85
UNIT = 10**12


def predict_wheel(n_ring: int, iters: int) -> tuple[int, int]:
    """Exact driver-side replay of pagerank_fixed's integer arithmetic on
    the wheel graph's 2-class reduction.  Returns (ring_rank, hub_rank)."""
    n_v = n_ring + 1
    r0 = UNIT // n_v
    base = ((100 - DAMPING) * r0) // 100
    r_ring, r_hub = r0, r0
    for _ in range(iters):
        share_r = r_ring // 3
        share_h = r_hub // n_ring
        nr = base + (DAMPING * (2 * share_r + share_h)) // 100
        nh = base + (DAMPING * (n_ring * share_r)) // 100
        r_ring, r_hub = nr, nh
    return r_ring, r_hub


def wheel_edges(spark, n_ring: int):
    """Symmetrized wheel: 4·n_ring directed (src, dst) edges."""
    ring = spark.range(n_ring).selectExpr(
        "id AS src", f"(id + 1) % {n_ring} AS dst"
    )
    hub = spark.range(n_ring).selectExpr(
        f"CAST({n_ring} AS BIGINT) AS src", "id AS dst"
    )
    fwd = ring.unionAll(hub)
    rev = fwd.selectExpr("dst AS src", "src AS dst")
    return fwd.unionAll(rev)


def run_check(spark, n_ring: int, iters: int, broadcast_threshold: int):
    n_v, n_e = n_ring + 1, 4 * n_ring
    t0 = time.monotonic()
    ranks = pagerank_fixed(
        wheel_edges(spark, n_ring),
        iterations=iters,
        damping_pct=DAMPING,
        unit=UNIT,
        broadcast_threshold=broadcast_threshold,
    )
    # bounded driver data: distinct (deg, rank) classes + totals
    classes = {
        (r["deg"], r["rank_fp"]): r["n"]
        for r in ranks.groupBy("deg", "rank_fp")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(deg_rank[1] * n for deg_rank, n in classes.items())
    wall = round(time.monotonic() - t0, 1)

    exp_ring, exp_hub = predict_wheel(n_ring, iters)
    errors = []
    if classes.get((3, exp_ring)) != n_ring:
        errors.append(
            f"ring class mismatch: expected {n_ring}x rank {exp_ring}, "
            f"classes={dict(list(classes.items())[:4])}"
        )
    if classes.get((n_ring, exp_hub)) != 1:
        errors.append(f"hub class mismatch: expected rank {exp_hub}")
    if len(classes) != 2 and not errors:
        errors.append(f"expected exactly 2 rank classes, got {len(classes)}")
    loss = UNIT - total
    loss_bound = n_v + iters * (n_e + 2 * n_v)
    if not (0 <= loss <= loss_bound):
        errors.append(f"mass loss {loss} outside [0, {loss_bound}]")
    return {
        "n_ring": n_ring,
        "n_vertices": n_v,
        "n_edges": n_e,
        "iterations": iters,
        "join_path": (
            "broadcast" if n_v <= broadcast_threshold else "shuffle"
        ),
        "ring_rank": exp_ring,
        "hub_rank": exp_hub,
        "mass_loss_units": loss,
        "mass_loss_bound": loss_bound,
        "wall_sec": wall,
        "status": "ok" if not errors else "FAIL",
        "errors": errors,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--ring", type=int, default=6_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--out", default=f"{root}/artifacts/pagerank_invariant.jsonl"
    )
    args = ap.parse_args()
    spark = get_spark(app_name="pagerank_invariant")
    # the gen-sf1-scale run exercises the SHUFFLE join path (n_v > the
    # 1M broadcast threshold), i.e. the billion-host-web-graph shape
    row = run_check(spark, args.ring, args.iters, 1_000_000)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()
    sys.exit(0 if row["status"] == "ok" else 1)


if __name__ == "__main__":
    main()
