"""Byte-pair-encoding tokenizer: bounded-sample training + distributed apply.

The tokenizer-building step of an LLM data pipeline (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016;
the byte-level variant popularized by GPT-2's public tokenizer).  Two
halves, shaped the way production pipelines actually run them:

- :func:`bpe_train` — learn the merge list from a BOUNDED corpus sample,
  driver-side.  Real tokenizers (sentencepiece, tiktoken's training
  scripts) train on a sample regardless of corpus size, so driver memory
  and time are O(sample), never O(corpus) — the same contract as the IVF
  centroid trainers in ``operators/similarity.py``.
- :func:`bpe_apply` — tokenize the full corpus with the learned merges as
  one Arrow ``mapInPandas`` pass.  The merge table (a few KB) rides the
  UDF closure exactly like a broadcast; the corpus is touched map-only,
  so the op scales with a plain scan.

Determinism: training is seeded sampling + lexicographic tie-breaks on
equal pair counts, so the merge list — and therefore every token id — is
reproducible run-over-run and process-over-process.  A DuckDB oracle
would have to replay the iterative merge loop (not expressible in one
SQL query), so queries over this operator are declared rows-only and the
invariants are pinned by pytest instead: round-trip losslessness
(detokenize == normalized input), vocab size == 256 + n_merges, and
monotone token-count reduction as merges apply.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# End-of-word marker.  A single char OUTSIDE latin-1 (the byte alphabet is
# latin-1-decoded UTF-8 bytes, all < U+0100), so no input text — including
# text that literally contains "</w>" — can encode to a symbol sequence
# that collides with the marker.  GPT-2's public tokenizer makes the same
# move: its byte alphabet is remapped into printable unicode so control
# symbols stay outside the data alphabet.
EOW = "Ā"


def _word_counts_sample(
    df: DataFrame, text_col: str, sample_size: int, seed: int
) -> Counter:
    """Seeded bounded sample -> whitespace-word frequency table (BPE trains
    on word frequencies, not raw text: cost per merge is O(distinct words),
    not O(corpus)).

    The sample is the ``sample_size`` docs smallest by seeded content
    hash — deterministic in (data, seed, sample_size) regardless of
    partitioning.  (``sample().limit()`` raced on which partitions fill
    the limit, so the learned merges varied run to run on
    multi-partition input — same defect class as the k-means trainer in
    ``similarity._sample_vectors``.)"""
    from e_commerce_data_lakehouse_spark.operators.dedup import normalize_text

    # hash the RAW text for the order key — the per-partition TakeOrdered
    # heap then never pays the normalization regex (measured 2x on the
    # whole train step at gen-sf10); only the sample_size winners are
    # normalized.  Equal raw texts tie on the key and are interchangeable.
    rows = (
        df.select(F.col(text_col))
        .orderBy(F.xxhash64(F.lit(seed), F.col(text_col)))
        .limit(sample_size)
        .select(normalize_text(F.col(text_col)).alias("__t"))
        .collect()
    )
    words: Counter = Counter()
    for r in rows:
        words.update((r[0] or "").split(" "))
    words.pop("", None)
    return words


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    sample_size: int = 10_000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded seeded sample.

    Byte-level alphabet (latin-1 units, so every UTF-8 byte is coverable
    like GPT-2's tokenizer) with an end-of-word marker; each round merges
    the most frequent adjacent symbol pair, ties broken lexicographically
    for full determinism.
    """
    words = _word_counts_sample(df, text_col, sample_size, seed)
    # symbol sequences per distinct word (byte-level + end-of-word mark)
    seqs: dict[str, list[str]] = {
        w: [*(c for c in w.encode("utf-8").decode("latin-1")), EOW]
        for w in words
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            c = words[w]
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        if top < 2:
            break  # nothing left that actually repeats
        # deterministic tie-break: lexicographically smallest pair
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        for w, seq in seqs.items():
            i, out = 0, []
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    seq = [*(c for c in word.encode("utf-8").decode("latin-1")), EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: one Arrow
    ``mapInPandas`` pass, map-only (the merge table rides the closure; a
    per-batch word cache makes the cost O(distinct words per batch), the
    property that makes BPE apply cheap on natural text).

    Returns ``(id, n_tokens, tokens array<string>)``.
    """
    from e_commerce_data_lakehouse_spark.operators.dedup import (
        ensure_parallelism,
        normalize_text,
    )

    ranks = {p: i for i, p in enumerate(merges)}
    base = ensure_parallelism(df).select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__t")
    )

    def tok(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks, counts = [], []
            for t in pdf["__t"]:
                out: list[str] = []
                for w in (t or "").split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pd.Series(counts, dtype="int64"),
                    "tokens": toks,
                }
            )

    id_type = base.schema[id_col].dataType.simpleString()
    return base.mapInPandas(
        tok, f"{id_col} {id_type}, n_tokens long, tokens array<string>"
    )


def detokenize(tokens: list[str]) -> str:
    """Inverse of the byte-level encoding (for the losslessness tests).

    Lossless for ANY input, including text containing the literal string
    "</w>": the marker :data:`EOW` is outside the latin-1 byte alphabet,
    so the substring replace can only ever hit real word boundaries."""
    return (
        "".join(tokens)
        .replace(EOW, " ")
        .strip(" ")
        .encode("latin-1")
        .decode("utf-8")
    )
