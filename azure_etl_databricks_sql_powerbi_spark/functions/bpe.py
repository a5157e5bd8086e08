"""Byte-pair-encoding tokenization: bounded driver-side merge learning,
distributed Arrow-batched apply.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units" (ACL 2016): learn a merge table by repeatedly fusing the
most frequent adjacent symbol pair over a word-frequency dictionary;
tokenize by replaying merges in learned order (equivalently: greedily
applying the lowest-rank applicable merge, the GPT-2 ``bpe()`` shape).

Spark split mirrors the ANN trainers (``similarity/ivf.train_centroids``):

- ``train_bpe`` collects a BOUNDED sample (Bernoulli sample + CollectLimit,
  never a full scan) and learns merges driver-side — the model is
  ``n_merges`` string pairs, KBs of state, independent of corpus size;
- ``apply_bpe`` broadcasts the merge-rank dict into an Arrow
  ``pandas_udf`` and tokenizes corpus-side — a scan-stage map with ZERO
  shuffles, linear in corpus bytes, embarrassingly parallel at any
  cluster width. Per-word results are memoized per batch (Zipf reuse).

No SQL oracle exists (greedy iterative merges are not SQL-expressible);
the contract query is rows-only by design and the algorithm is pinned by
units: the paper's ``low/lower/newest/widest`` corpus reproduces the
published first merges, tokenization roundtrips (concat of word tokens ==
word), and training is deterministic for a fixed seed/sample.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens

END = "</w>"  # end-of-word marker (Sennrich §3.2) — lets merges learn
# word-final subwords distinct from word-internal ones


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def learn_merges(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """The paper's algorithm over an in-memory word-frequency dict.
    Deterministic: ties on pair frequency break lexicographically."""
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): c for w, c in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        fused = pair[0] + pair[1]
        out: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            if pair[0] not in syms:
                out[syms] = out.get(syms, 0) + cnt
                continue
            new: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    new.append(fused)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            t = tuple(new)
            out[t] = out.get(t, 0) + cnt
        vocab = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge replay for one word (GPT-2 ``bpe()``
    shape — equivalent to applying merges in learned order)."""
    if not word:
        return []
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    sample_size: int = 2048,
    sample_fraction: float = 0.25,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a BOUNDED corpus sample.

    Sample shape is the ``train_centroids`` contract: Bernoulli sample
    (map-side filter) + ``limit`` (CollectLimit — executes partitions
    incrementally until ``sample_size`` docs arrive, never a full scan),
    with a plain-limit re-read if the corpus is smaller than the sample.
    Each candidate sample is materialized in ONE action (an unordered
    ``limit`` re-executed across actions may pick different rows, which
    would break training determinism).
    """
    base = df.select(tokens(text_col).alias("__toks"))
    rows = base.sample(fraction=sample_fraction, seed=seed).limit(sample_size).collect()
    if len(rows) < sample_size:
        rows = base.limit(sample_size).collect()
    freqs = Counter(w for r in rows for w in r["__toks"])
    return learn_merges(freqs, n_merges)


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: appends
    ``out_col`` (``array<string>``) — one Arrow ``pandas_udf`` in the
    scan stage, zero shuffles. The merge-rank dict rides the closure
    (KBs); per-word tokenizations are memoized per batch so the Zipf
    head is encoded once per batch, not once per occurrence."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pkg_parent = _PKG_PARENT  # closure LOCAL: serialized by value, so the
    # executor can bootstrap sys.path before any engine-module import

    @pandas_udf("array<string>")
    def bpe_udf(texts: pd.Series) -> pd.Series:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        from azure_etl_databricks_sql_powerbi_spark.functions.bpe import encode_word

        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in str(text).split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, bpe_udf(F.col(text_col)))


def _pkg_parent() -> str:
    import os

    import azure_etl_databricks_sql_powerbi_spark as _pkg

    return os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))


_PKG_PARENT = _pkg_parent()


def strip_word_marker(col: Column | str) -> Column:
    """Remove the end-of-word marker from a token array column —
    ``concat_ws('', strip_word_marker(tokens))`` reconstructs the
    original whitespace-stripped text (the roundtrip unit)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda t: F.regexp_replace(t, END, ""))


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge table (the tokenizer's entire trained
    state — KBs) as ``{path}/merges.json``: day-N jobs tokenize with
    yesterday's tokenizer instead of re-sampling the corpus, and every
    pipeline stage sees the IDENTICAL vocabulary (retraining on a
    different sample would silently shift token boundaries mid-corpus —
    the tokenizer-version pinning every production pipeline needs). The
    ``save_corpus_state`` / ``similarity.index.save_index`` persisted-
    trained-state contract, applied to the last trained operator that
    lacked it."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "merges.json"), "w") as fh:
        json.dump([list(p) for p in merges], fh)


def load_merges(path: str) -> list[tuple[str, str]]:
    """Load a ``save_merges`` table; merge ORDER is the model (ranks are
    list positions), so the roundtrip preserves it exactly."""
    import json
    import os

    with open(os.path.join(path, "merges.json")) as fh:
        return [tuple(p) for p in json.load(fh)]
