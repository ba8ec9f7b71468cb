"""Deterministic scale-series generator for the sf1/sf3 scale-proof.

`/root/testdata` stops at sf0.1, so every 100 TB design claim was verified
by plan inspection only (VERDICT r3, "Next round #1").  This script
generates the two tables the dedup/ANN family reads — ``documents`` and
``embeddings`` — at arbitrary scale factors with the SAME schemas and the
same workload-relevant characteristics as the driver testdata (profiled
from sf0.01/sf0.1):

- documents: random word sequences over a ~30-word vocab, 8-110 words
  (avg ~300 chars), langs weighted en~41% / de,es,fr,zh ~15% each, 20
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

Row counts: documents = 50_000 * sf, embeddings = 20_000 * sf (the
driver testdata's exact ratios).  Seeded per-sf from seed 42; output is
bit-stable across runs.

Usage: python tools/gen_scale_data.py SF [SF ...] [--out DIR]
Writes DIR/sf{SF}/{documents,embeddings}.parquet (default
.scaledata/ at the repo root, gitignored).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "spark batch part line column order small sort fast value scan hash "
    "slow group agg filter query a big key window row table stream merge "
    "data vector customer join the".split()
)
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
                    words[pos] = str(VOCAB[int(rng.integers(0, len(VOCAB)))])
                texts.append(" ".join(words))
            else:  # exact dup
                texts.append(texts[base])
            langs[i] = langs[base]
        else:
            idx = rng.integers(0, len(VOCAB), size=int(lengths[i]))
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


def generate(sf: float, out_root: str) -> str:
    d = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(d, exist_ok=True)
    # per-sf child seeds: sf0.1 data is NOT a prefix of sf1 data, matching
    # how the driver testdata scales (independent draws per sf)
    root = np.random.SeedSequence(42)
    doc_seed, vec_seed = root.spawn(2)
    sf_key = int(round(sf * 1000))
    rng_d = np.random.default_rng([doc_seed.entropy, sf_key])
    rng_e = np.random.default_rng([vec_seed.entropy, sf_key])
    pq.write_table(gen_documents(sf, rng_d), os.path.join(d, "documents.parquet"))
    pq.write_table(gen_embeddings(sf, rng_e), os.path.join(d, "embeddings.parquet"))
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
    args = ap.parse_args()
    for sf in args.sfs:
        d = generate(sf, args.out)
        sizes = {
            f: round(os.path.getsize(os.path.join(d, f)) / 1e6, 1)
            for f in sorted(os.listdir(d))
        }
        print(f"sf{sf:g}: {d} {sizes} MB")


if __name__ == "__main__":
    main()
