"""Deterministic scale-series generator for the sf1/sf3 scale-proof.

`/root/testdata` stops at sf0.1, so every 100 TB design claim was verified
by plan inspection only (VERDICT r3, "Next round #1").  This script
generates every table the engine reads — ``documents``/``embeddings``
for the dedup/ANN family plus the full TPC-H-ish relational set
(``customer orders lineitem events part supplier nation region``) — at
arbitrary scale factors with the SAME schemas and the same
workload-relevant characteristics as the driver testdata (profiled from
sf0.01/sf0.1):

- documents: Zipf-drawn word sequences over a 5,000-word vocab (30
  frequent head words + syllable-composite tail; see VOCAB below), 8-110
  words (avg ~330 chars), langs weighted en~41% / de,es,fr,zh ~15% each, 20
  sources, ~6% near-duplicate docs (1-3 word mutations of an earlier doc)
  and ~0.2% exact duplicates — matching the ~4-8% near-dup involvement
  measured in the driver data (216 shared-80-char-prefix groups / 5000
  docs at sf0.1).
- embeddings: 64-dim unit-norm float32 vectors around 10 cluster centers
  (labels ~uniform), plus ~2% tight near-dup perturbations so
  embedding-level dedup has work to do.

Scaling-factor measurements MUST compare runs of THIS generator at two
scales (e.g. gen-sf0.1 vs gen-sf1), never a driver dir against a
generated dir — same generator at both points is what makes the ratio an
honest data-scaling factor.  ``tools/bench_scale.py`` enforces that.

Row counts: documents = 50_000 * sf, embeddings = 20_000 * sf,
orders = 1.5M * sf, lineitem ~= 6M * sf, events = 1M * sf,
customer = 150k * sf (the driver testdata's exact ratios).  Seeded
per-sf from seed 42; output is bit-stable across runs, and the
relational seeds are spawned AFTER the doc/vec seeds so pre-existing
documents/embeddings points stay bit-identical.

Usage: python tools/gen_scale_data.py SF [SF ...] [--out DIR]
       [--only-missing]
Writes DIR/sf{SF}/<table>.parquet (default .scaledata/ at the repo
root, gitignored).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# --- vocabulary -----------------------------------------------------------
# r6 VERDICT: the original ~30-word vocab made token-SET similarity
# DEGENERATE at scale — any 60+-word doc contains nearly the whole vocab,
# so all long docs collapse to near-identical token sets and the
# containment/Jaccard pair set grows output-quadratically (976 s sweep
# point measured the artifact, not the operator).  The r7 vocabulary is
# 5,000 words drawn Zipf-style: the original 30 words stay as the
# most-frequent head (stopword-ish overlap between unrelated docs), the
# tail is deterministic syllable composites.  Unrelated docs now share
# only head words (token-Jaccard ~0.2 — below every dedup threshold)
# while the planted 1-3-word mutations stay above them, which is the
# real-corpus shape.  Changing ONLY gen_documents: each table draws from
# its own fresh rng, so embeddings + all relational tables remain
# bit-identical to the r4-r6 vintage.
_HEAD_WORDS = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group agg filter query a big key window row table stream merge "
    "data vector customer join the".split()
)
_SYLLS = (
    "ra ti ne qua lor ven dis mar sol tek bri cam dur fen gal hon jin "
    "kel lum nor pax rem sam tor ul vex win yor zen ost".split()
)


def _make_vocab(size: int = 5000) -> np.ndarray:
    words = list(_HEAD_WORDS)
    i = 0
    while len(words) < size:
        a = _SYLLS[i % 30]
        b = _SYLLS[(i // 30) % 30]
        c = _SYLLS[(i // 900) % 30] if i >= 900 else ""
        words.append(a + b + c)
        i += 1
    return np.array(words)


VOCAB = _make_vocab()
# Zipf(1.07) over rank (+2.7 shift): head word ~4.3%, rank-100 ~0.5%
_VOCAB_W = 1.0 / (np.arange(1, len(VOCAB) + 1) + 2.7) ** 1.07
VOCAB_CDF = np.cumsum(_VOCAB_W / _VOCAB_W.sum())


def _draw_words(rng: np.random.Generator, size: int) -> np.ndarray:
    """Zipf-distributed vocab indexes (inverse-CDF via searchsorted —
    O(size·log V), no per-call cdf rebuild like rng.choice(p=...))."""
    return np.searchsorted(VOCAB_CDF, rng.random(size))


LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_W = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
SOURCES = np.array([f"src{i}" for i in range(20)])

DOCS_PER_SF = 50_000
VECS_PER_SF = 20_000
DIM = 64
N_CLUSTERS = 10


def gen_documents(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(round(DOCS_PER_SF * sf))
    lengths = rng.integers(8, 111, size=n)
    texts: list[str] = []
    langs = rng.choice(LANGS, size=n, p=LANG_W)
    sources = SOURCES[rng.integers(0, len(SOURCES), size=n)]
    # mutation plan drawn up-front so the doc loop stays branch-cheap
    kind = rng.random(n)  # <0.06 near-dup, <0.062 exact dup (if base exists)
    for i in range(n):
        if i > 0 and kind[i] < 0.062:
            base = int(rng.integers(0, i))
            words = texts[base].split(" ")
            if kind[i] < 0.06:  # near-dup: mutate 1-3 positions
                for _ in range(int(rng.integers(1, 4))):
                    pos = int(rng.integers(0, len(words)))
                    words[pos] = str(VOCAB[int(_draw_words(rng, 1)[0])])
                texts.append(" ".join(words))
            else:  # exact dup
                texts.append(texts[base])
            langs[i] = langs[base]
        else:
            idx = _draw_words(rng, int(lengths[i]))
            texts.append(" ".join(VOCAB[idx]))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "source": pa.array(sources.tolist(), type=pa.string()),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_embeddings(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(round(VECS_PER_SF * sf))
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_CLUSTERS, size=n).astype(np.int32)
    vecs = centers[labels] * 0.8 + rng.standard_normal((n, DIM)) * 0.35
    # ~2% tight near-dups of an earlier vector (paraphrase-level pairs)
    n_dup = max(1, n // 50)
    dup_pos = rng.choice(np.arange(1, n), size=n_dup, replace=False)
    for p in dup_pos:
        base = int(rng.integers(0, p))
        vecs[p] = vecs[base] + rng.standard_normal(DIM) * 0.02
        labels[p] = labels[base]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1), type=pa.float32()), DIM
    ).cast(pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(labels),
        }
    )


# ---------------------------------------------------------------------------
# Relational tables (r4 extension): the TPC-H-ish star + event stream at
# arbitrary sf, matching /root/testdata schemas, dtypes, row-count ratios
# (orders 1.5M/sf, lineitem ~6M/sf, events 1M/sf, customer 150k/sf,
# part 200k/sf, supplier 10k/sf, users = 15k/sf over a fixed 30-day event
# window) and value ranges profiled from the driver data — so the
# relational/window/sessionization queries get the same honest
# same-generator-both-ends scaling measurement the dedup family has.
# ---------------------------------------------------------------------------
CUST_PER_SF = 150_000
ORDERS_PER_SF = 1_500_000
EVENTS_PER_SF = 1_000_000
USERS_PER_SF = 15_000
PART_PER_SF = 200_000
SUPP_PER_SF = 10_000

MKTSEGMENTS = np.array(
    ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
)
ORDERSTATUS = np.array(["F", "O", "P"])
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
RF_LS = np.array(["A|F", "N|F", "N|O", "R|F", "R|O"])
EVENT_TYPES = np.array(["click", "error", "purchase", "signup", "view"])
PART_ADJ = np.array(
    "large hot small cold steel brass tin plated polished burnished "
    "anodized economy standard promo".split()
)
PART_NOUN = np.array(
    "ring bolt screw washer nut gear shaft plate rod tube wire clip".split()
)
PART_TYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])


def _dict_str(idx: np.ndarray, values: np.ndarray) -> pa.Array:
    """Vectorized categorical string column (no python-list round trip)."""
    return pa.DictionaryArray.from_arrays(
        pa.array(idx.astype(np.int32)), pa.array(values.tolist())
    ).cast(pa.string())


def _ts_us(epoch_us: np.ndarray) -> pa.Array:
    return pa.array(epoch_us.astype("datetime64[us]"))


def gen_customer(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(round(CUST_PER_SF * sf))
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, n), 2)
            ),
            "c_mktsegment": _dict_str(rng.integers(0, 5, n), MKTSEGMENTS),
        }
    )


def gen_orders(
    sf: float, rng: np.random.Generator
) -> tuple[pa.Table, np.ndarray]:
    n = int(round(ORDERS_PER_SF * sf))
    n_cust = int(round(CUST_PER_SF * sf))
    day0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    dates_us = day0 + rng.integers(0, 2405, n) * 86_400_000_000
    tbl = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n)),
            "o_orderstatus": _dict_str(rng.integers(0, 3, n), ORDERSTATUS),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, n), 2)
            ),
            "o_orderdate": _ts_us(dates_us),
            "o_orderpriority": _dict_str(rng.integers(0, 5, n), PRIORITIES),
        }
    )
    return tbl, dates_us


def gen_lineitem(
    sf: float, rng: np.random.Generator, order_dates_us: np.ndarray
) -> pa.Table:
    n_orders = len(order_dates_us)
    n_part = int(round(PART_PER_SF * sf))
    n_supp = int(round(SUPP_PER_SF * sf))
    # 1-7 lines per order, mean ~4 (driver: 4.07)
    lines = rng.integers(1, 8, n_orders)
    okey = np.repeat(np.arange(n_orders, dtype=np.int64), lines)
    linenum = (
        np.arange(len(okey), dtype=np.int64)
        - np.repeat(np.cumsum(lines) - lines, lines)
        + 1
    ).astype(np.int32)
    n = len(okey)
    qty = rng.integers(1, 51, n).astype(np.float64)
    pkey = rng.integers(0, n_part, n)
    unit = 900.0 + (pkey % 1200) + np.round(rng.uniform(0, 1, n), 2)
    combo = rng.integers(0, 5, n)
    rf = np.array([c.split("|")[0] for c in RF_LS])
    ls = np.array([c.split("|")[1] for c in RF_LS])
    ship_us = (
        np.repeat(order_dates_us, lines)
        + rng.integers(1, 96, n) * 86_400_000_000
    )
    return pa.table(
        {
            "l_orderkey": pa.array(okey),
            "l_partkey": pa.array(pkey),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n)),
            "l_linenumber": pa.array(linenum),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(np.round(qty * unit, 2)),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n) / 100.0, 2)
            ),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n) / 100.0, 2)),
            "l_returnflag": _dict_str(combo, rf),
            "l_linestatus": _dict_str(combo, ls),
            "l_shipdate": _ts_us(ship_us),
        }
    )


def gen_events(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(round(EVENTS_PER_SF * sf))
    n_users = int(round(USERS_PER_SF * sf))
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ts_us = np.sort(t0 + rng.integers(0, 30 * 86_400_000_000, n))
    k = rng.integers(0, 100, n)
    props = _dict_str(k, np.array([f'{{"k": {i}}}' for i in range(100)]))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": _ts_us(ts_us),
            "user_id": pa.array(rng.integers(0, n_users, n)),
            "event_type": _dict_str(rng.integers(0, 5, n), EVENT_TYPES),
            "value": pa.array(
                np.minimum(np.round(rng.exponential(50.0, n), 2), 999.99)
            ),
            "props": props,
        }
    )


def gen_static_dims(sf: float, rng: np.random.Generator) -> dict[str, pa.Table]:
    n_part = int(round(PART_PER_SF * sf))
    n_supp = int(round(SUPP_PER_SF * sf))
    adj = rng.integers(0, len(PART_ADJ), n_part)
    noun = rng.integers(0, len(PART_NOUN), n_part)
    names = np.array(
        [f"{a} {b}" for a in PART_ADJ for b in PART_NOUN]
    )
    name_idx = adj * len(PART_NOUN) + noun
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
            "p_name": _dict_str(name_idx, names),
            "p_brand": _dict_str(
                rng.integers(0, 25, n_part),
                np.array([f"Brand#{i}" for i in range(25)]),
            ),
            "p_type": _dict_str(rng.integers(0, 6, n_part), PART_TYPES),
            "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
            "p_retailprice": pa.array(
                np.round(
                    900.0
                    + (np.arange(n_part) % 1200)
                    + rng.uniform(0, 1, n_part),
                    2,
                )
            ),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp).astype(np.int32)
            ),
            "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array(
                (np.arange(25) % 5).astype(np.int64)
            ),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
            ),
        }
    )
    return {
        "part": part,
        "supplier": supplier,
        "nation": nation,
        "region": region,
    }


def _write_split(table: "pa.Table", path: str) -> None:
    """Write with >= 64 row groups (bounded below at 8192 rows/group).

    pyarrow's default is one ~1Mi-row group, and a parquet ROW GROUP is the
    unit of split — Spark plans byte-range splits but every split except
    the one containing the group's start offset yields ZERO rows, so a
    single-group documents/embeddings file scans as ONE task no matter how
    many cores the cluster has (caught live in the r8 gen-sf10 sweep: a
    500k-row single-group documents.parquet held one straggler task for
    >8 min of single-core expression work while 31 cores idled, and fooled
    ``ensure_parallelism``'s planned-partition probe).  64 groups give the
    32-core test sessions 2x task elasticity; real multi-file tables at
    100 TB already have thousands of groups.  Layout only — the table
    CONTENT (row order included) is byte-identical to a one-group write,
    so data vintage is unchanged while scan timings become honest.
    """
    rows = table.num_rows
    pq.write_table(
        table, path, row_group_size=max(8192, (rows + 63) // 64)
    )


def generate(
    sf: float,
    out_root: str,
    only_missing: bool = False,
    tables: list[str] | None = None,
) -> str:
    d = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(d, exist_ok=True)
    # per-sf child seeds: sf0.1 data is NOT a prefix of sf1 data, matching
    # how the driver testdata scales (independent draws per sf).
    # SeedSequence children depend only on their spawn index, so adding
    # relational seeds after doc/vec keeps documents/embeddings bit-stable.
    root = np.random.SeedSequence(42)
    doc_seed, vec_seed, cust_seed, ord_seed, ev_seed, dim_seed = root.spawn(6)
    sf_key = int(round(sf * 1000))

    def _rng(seed_seq):
        return np.random.default_rng([seed_seq.entropy, sf_key])

    def _want(name: str) -> bool:
        return tables is None or name in tables

    def _write(name: str, build):
        path = os.path.join(d, f"{name}.parquet")
        if not _want(name) or (only_missing and os.path.exists(path)):
            return
        _write_split(build(), path)

    _write("documents", lambda: gen_documents(sf, _rng(doc_seed)))
    _write("embeddings", lambda: gen_embeddings(sf, _rng(vec_seed)))
    _write("customer", lambda: gen_customer(sf, _rng(cust_seed)))
    ord_path = os.path.join(d, "orders.parquet")
    li_path = os.path.join(d, "lineitem.parquet")
    if (_want("orders") or _want("lineitem")) and not (
        only_missing and os.path.exists(ord_path) and os.path.exists(li_path)
    ):
        rng_o = _rng(ord_seed)
        orders, dates_us = gen_orders(sf, rng_o)
        _write_split(orders, ord_path)
        del orders
        _write_split(gen_lineitem(sf, rng_o, dates_us), li_path)
    _write("events", lambda: gen_events(sf, _rng(ev_seed)))
    dims_missing = [
        t
        for t in ("part", "supplier", "nation", "region")
        if _want(t)
        and not (
            only_missing and os.path.exists(os.path.join(d, f"{t}.parquet"))
        )
    ]
    if dims_missing:
        dims = gen_static_dims(sf, _rng(dim_seed))
        for t in dims_missing:
            _write_split(dims[t], os.path.join(d, f"{t}.parquet"))
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sfs", nargs="+", type=float)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
        ),
    )
    ap.add_argument(
        "--tables",
        nargs="+",
        default=None,
        help="regenerate only these tables (others untouched even if "
        "missing) — used when a generator change affects a subset, e.g. "
        "the r7 vocab widening touches only documents",
    )
    ap.add_argument(
        "--only-missing",
        action="store_true",
        help="skip tables whose parquet already exists (documents/"
        "embeddings are bit-stable, so this is safe for extending "
        "existing points with the relational tables)",
    )
    args = ap.parse_args()
    for sf in args.sfs:
        d = generate(
            sf, args.out, only_missing=args.only_missing, tables=args.tables
        )
        sizes = {
            f: round(os.path.getsize(os.path.join(d, f)) / 1e6, 1)
            for f in sorted(os.listdir(d))
        }
        print(f"sf{sf:g}: {d} {sizes} MB")


if __name__ == "__main__":
    main()
