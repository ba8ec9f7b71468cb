"""entity.py: deletion-neighborhood blocked edit-distance pairs must be
EXACT — identical to the all-pairs block join — on adversarial inputs
(insertions, deletions, substitutions, shared prefixes, short strings)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.operators import entity as ent


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_variants_known_string(spark):
    """'abc' with k=2: the string, 3 single deletions, 3 double deletions
    (all distinct here) — and every variant is a real <=2-deletion
    subsequence."""
    row = spark.range(1).select(
        F.expr(ent.deletion_variants_sql("'abc'", 2)).alias("v")
    ).first()
    got = set(row["v"])
    assert got == {"abc", "bc", "ac", "ab", "c", "b", "a"}


def test_deletion_variants_edge_lengths(spark):
    """Empty / 1-char / 2-char strings must not error (sequence bounds are
    clamped) and must contain the string itself."""
    for s, must in [("", ""), ("x", "x"), ("xy", "xy")]:
        row = spark.range(1).select(
            F.expr(ent.deletion_variants_sql(f"'{s}'", 2)).alias("v")
        ).first()
        assert must in set(row["v"])


@pytest.mark.parametrize("max_dist", [1, 2])
def test_blocked_pairs_match_bruteforce(spark, max_dist):
    """Seeded adversarial corpus: base names with a universal prefix (the
    PassJoin killer), planted typos of every edit kind, cross-block decoys
    with identical names.  The blocked operator must equal the brute
    force exactly — pairs AND distances."""
    rng = random.Random(11)
    rows = []
    rid = 0
    for i in range(60):
        base = f"Customer#{rng.randrange(10**6):06d}"
        block = rng.choice([1, 2, 3])
        rows.append((rid, block, base))
        rid += 1
        for _ in range(rng.randrange(3)):  # 0-2 typo variants
            name = list(base)
            for _ in range(rng.randrange(1, 4)):  # 1-3 edits (some exceed k)
                op = rng.choice(["sub", "ins", "del"])
                p = rng.randrange(len(name)) if name else 0
                ch = rng.choice("0123456789#X")
                if op == "sub" and name:
                    name[p] = ch
                elif op == "ins":
                    name.insert(p, ch)
                elif name:
                    del name[p]
            # same block usually, sometimes another (must NOT pair)
            blk = block if rng.random() < 0.8 else rng.choice([1, 2, 3])
            rows.append((rid, blk, "".join(name)))
            rid += 1
    df = spark.createDataFrame(rows, ["id", "blk", "name"])

    want = {}
    for (xa, ba, na), (xb, bb, nb) in itertools.combinations(rows, 2):
        if ba != bb:
            continue
        ia, ib = (xa, xb) if xa < xb else (xb, xa)
        d = _lev(na, nb)
        if d <= max_dist:
            want[(ia, ib)] = d

    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in ent.edit_distance_pairs_blocked(
            df, "id", "name", ["blk"], max_dist=max_dist
        ).collect()
    }
    assert got == want
    assert len(want) > 10  # the guarantee is exercised, not vacuous
