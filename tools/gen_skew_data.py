"""Deliberately skewed tables for the proactive skew-robustness sweep
(r9 VERDICT #8).

Every salting/prefix-filter defense in the repo was built REACTIVELY
after a Zipf head bit a specific query; this generator plants the bite
up front so the join/groupBy operator family can be swept against it
continuously.  Shapes (seed 43, bit-stable, schemas identical to the
driver testdata so every operator applies unchanged):

- ``events_skew``  — n = 1M·SF rows; ONE user (``user_id = 7``) owns 20%
  of all rows, the rest Zipf(1.3) over 100k·SF users.  ``event_type``
  likewise has a 40% head value.
- ``orders_skew``  — n = 1.5M·SF rows; ONE customer (``o_custkey = 7``)
  owns 20% of all orders; the rest uniform over 150k·SF customers
  (joinable against the matching gen-sf customer table).

Usage: python tools/gen_skew_data.py SF [--out DIR]
Writes DIR/skew{SF}/<table>.parquet (default .scaledata/, gitignored).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_KEY = 7
HOT_FRAC = 0.20

EPOCH_2024 = np.int64(1704067200) * 1_000_000  # 2024-01-01 in micros


def _zipf_keys(rng: np.random.Generator, n: int, n_keys: int, a: float):
    """Zipf-ish draw bounded to [0, n_keys): inverse-CDF over a
    truncated power law (np.random.zipf is unbounded)."""
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    probs = ranks ** (-a)
    probs /= probs.sum()
    return rng.choice(n_keys, size=n, p=probs)


def gen_events_skew(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(1_000_000 * sf)
    n_users = max(1000, int(100_000 * sf))
    n_hot = int(n * HOT_FRAC)
    users = np.empty(n, dtype=np.int64)
    users[:n_hot] = HOT_KEY
    users[n_hot:] = _zipf_keys(rng, n - n_hot, n_users, 1.3) + 10
    perm = rng.permutation(n)
    users = users[perm]

    types = np.array(["view", "click", "cart", "purchase", "refund"])
    t_idx = rng.choice(5, size=n, p=[0.40, 0.25, 0.15, 0.15, 0.05])
    ts = EPOCH_2024 + rng.integers(0, 90 * 86400, size=n) * 1_000_000
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "user_id": pa.array(users),
            "event_type": pa.array(types[t_idx]),
            "value": pa.array(np.round(rng.uniform(0, 500, size=n), 2)),
            "props": pa.array(np.full(n, "{}", dtype=object)),
        }
    )


def gen_orders_skew(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(1_500_000 * sf)
    n_cust = max(1500, int(150_000 * sf))
    n_hot = int(n * HOT_FRAC)
    cust = np.empty(n, dtype=np.int64)
    cust[:n_hot] = HOT_KEY
    cust[n_hot:] = rng.integers(1, n_cust + 1, size=n - n_hot)
    cust = cust[rng.permutation(n)]

    status = np.array(["O", "F", "P"])
    prio = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )
    odate = EPOCH_2024 + rng.integers(0, 365 * 86400, size=n) * 1_000_000
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "o_custkey": pa.array(cust),
            "o_orderstatus": pa.array(status[rng.integers(0, 3, size=n)]),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900, 500_000, size=n), 2)
            ),
            "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(prio[rng.integers(0, 5, size=n)]),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", ".scaledata"),
    )
    args = ap.parse_args()
    sf_name = f"{args.sf:g}"
    out_dir = os.path.join(args.out, f"skew{sf_name}")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(43)
    sizes = {}
    for name, gen in (
        ("events_skew", gen_events_skew),
        ("orders_skew", gen_orders_skew),
    ):
        t = gen(args.sf, rng)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(t, path, row_group_size=200_000)
        sizes[name] = round(os.path.getsize(path) / 1e6, 1)
    print(f"skew{sf_name}: {out_dir} {sizes} MB")


if __name__ == "__main__":
    main()
