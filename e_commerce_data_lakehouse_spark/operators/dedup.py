"""Deduplication operators.

Covers the reference's dedup-keep-latest (W1:
``iot_bronze_to_silver.py:178-205``, ``image_bronze_to_silver.py:175-201``)
and generalizes it into the dedup family a large-scale training-data pipeline
needs: exact content dedup, MinHash-LSH, SimHash, n-gram/token Jaccard, and
embedding-cosine near-dup.

Scale design notes (100 TB):
- ``keep_latest`` is one shuffle on the dedup key (window function).  The
  reference's tie on equal timestamps is nondeterministic (SURVEY §7.4-4);
  we always require a total order via ``tiebreakers``.
- Pairwise similarity is NEVER computed all-pairs.  Every near-dup operator
  first *blocks* (LSH bands / simhash bands / cheap blocking key) so the join
  is an equi-join on the block key — a hash shuffle, not a cross join.
- All hashing is Spark-built-in (``xxhash64``/``hash``/``md5``) — JVM-side,
  codegen-friendly; no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# W1: dedup keep-latest
# ---------------------------------------------------------------------------
def keep_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep the most recent row per key.

    Mirrors ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC) = 1``
    (``iot_bronze_to_silver.py:178-181``) but adds deterministic tiebreakers
    so results are reproducible (the reference's plain timestamp order is
    not, SURVEY §7.4-4).
    """
    order = [F.col(order_col).desc()] + [
        F.col(t).desc() for t in (tiebreakers or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Exact content dedup (hash-groupBy)
# ---------------------------------------------------------------------------
def normalize_text(col: Column) -> Column:
    """Canonical form for content hashing: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """One survivor (min id) per distinct normalized text.

    Adds ``dup_count`` (group size).  Single hash-aggregate shuffle on the
    md5 fingerprint — the canonical exact-dedup plan at any scale.
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# Token-Jaccard near-dup with explicit blocking (oracle-expressible)
# ---------------------------------------------------------------------------
def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float,
) -> DataFrame:
    """Candidate near-dup pairs by token-set Jaccard within a blocking key.

    Blocking keeps this an equi-join (shuffle on the block key) instead of a
    quadratic cross join; the block key here is caller-provided (e.g. lang +
    first token).  For probabilistic blocking at scale use
    :func:`minhash_lsh_pairs`.
    """
    toks = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    base = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols], toks.alias("toks")
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    inter = F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
    union = F.size(F.array_union("a.toks", "b.toks")).cast("double")
    jac = F.round(inter / union, 6)
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path for fuzzy dedup)
# ---------------------------------------------------------------------------
def shingle_array(text_col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text, built with
    sequence+transform (pure Catalyst expressions, whole-stage codegen)."""
    s = normalize_text(text_col)
    length = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n))))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> list[Column]:
    """num_hashes min-hash values: one xxhash64 of each shingle STRING, then
    the hash family derives by re-hashing that 8-byte long with a seed column
    (xxhash64(long, i)) — far cheaper than hashing the string per seed, and
    overflow-free under ANSI mode (a multiplicative family would throw)."""
    base = F.transform(shingles, lambda sh: F.xxhash64(sh))

    def seeded_min(i: int) -> Column:
        return F.array_min(
            F.transform(base, lambda h: F.xxhash64(h, F.lit(i)))
        )

    return [seeded_min(i).alias(f"mh_{i}") for i in range(num_hashes)]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy-dup candidate pairs via MinHash banding, verified by true
    shingle Jaccard.

    Plan shape (scale-critical):
      1. map-only: shingles -> num_hashes minhashes per row;
      2. explode to ``bands`` rows, band key = hash of the band's rows/band
         minhashes (map-only);
      3. self equi-join on (band_id, band_key) — shuffle on band key only;
      4. distinct candidate pairs, then one verify join back to shingle sets.

    No cross join anywhere; skew is bounded because identical band keys
    imply near-identical docs.
    """
    rows_per_band = num_hashes // bands

    def _seeded_min(i: int) -> Column:
        return F.array_min(
            F.transform(F.col("__bh"), lambda h: F.xxhash64(h, F.lit(i)))
        )

    sig = (
        df.select(
            F.col(id_col).alias("__id"),
            shingle_array(F.col(text_col), shingle_n).alias("__sh"),
        )
        # hash every shingle once; all minhash functions derive from __bh
        .withColumn("__bh", F.transform(F.col("__sh"), lambda sh: F.xxhash64(sh)))
        .select(
            "__id",
            "__sh",
            *[
                F.xxhash64(
                    *[
                        _seeded_min(b * rows_per_band + r)
                        for r in range(rows_per_band)
                    ]
                ).alias(f"band_{b}")
                for b in range(bands)
            ],
        )
    )
    sig = sig.persist()
    bands_long = sig.select(
        "__id",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_id", "band_key"
        ),
    )
    a = bands_long.alias("a")
    b_ = bands_long.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    sh = sig.select("__id", "__sh")
    inter = F.size(F.array_intersect("sa.__sh", "sb.__sh")).cast("double")
    union = F.size(F.array_union("sa.__sh", "sb.__sh")).cast("double")
    verified = (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col("sa.__id"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb.__id"))
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------
def simhash64(text_col: Column) -> Column:
    """64-bit SimHash of the token set, as pure Catalyst expressions.

    For each bit position: sum over tokens of (+1 if hash bit set else -1);
    bit = 1 if the vote is positive.  Uses xxhash64 token hashes and
    aggregate() over the token array — map-only, no shuffle.
    """
    toks = F.array_distinct(F.split(normalize_text(text_col), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def _voter(mask):
        # closure (not default arg): PySpark infers HOF arity from the
        # lambda signature, so it must stay two-parameter
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    bits = []
    for bit in range(64):
        mask = F.shiftleft(F.lit(1).cast("long"), bit)  # JVM shift: bit 63 ok
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _voter(mask))
        bits.append(F.when(vote > 0, mask).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Banding: split the 64-bit simhash into ``bands`` 16-bit chunks; by
    pigeonhole any pair within hamming distance < bands shares at least one
    exact chunk, so candidates come from equi-joins on (chunk_id, chunk).
    """
    width = 64 // bands
    sh = df.select(F.col(id_col).alias("__id"), simhash64(F.col(text_col)).alias("__sim"))
    sh = sh.persist()
    chunks = sh.select(
        "__id",
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sim"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias(f"c{b}")
                    for b in range(bands)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    a, b_ = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sim").alias("sim_a"),
            F.col("b.__sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
