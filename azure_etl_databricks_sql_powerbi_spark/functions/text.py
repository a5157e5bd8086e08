"""Text-analysis column functions (north-star F10 surface).

Everything here is a Column expression built from ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen'd, zero Python in the hot path. At 100 TB
these run at scan speed with full column pruning; there is no UDF fallback
because none is needed.

Semantics are pinned to be DuckDB-replicable (the oracle): tokenization is
whitespace-split of trimmed text with an explicit empty-string guard
(Spark's split('') returns [], DuckDB's returns [''] — the guard makes both
produce 0 tokens).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword profiles for the n-gram/stopword language
# heuristic. Order matters: ties resolve in PROFILE order (en beats es...).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de": ("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
}


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty/blank text -> empty array."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def char_count(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.length(c)


def punct_count(c: Column | str) -> Column:
    """Number of sentence-punctuation chars [.!?,;:]."""
    c = F.col(c) if isinstance(c, str) else c
    return F.length(F.regexp_replace(c, r"[^.!?,;:]", ""))


def punct_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return punct_count(c) / F.greatest(F.length(c), F.lit(1))


def avg_token_len(c: Column | str) -> Column:
    """Mean token length = non-whitespace chars / token count."""
    c = F.col(c) if isinstance(c, str) else c
    non_ws = F.length(F.regexp_replace(c, r"\s", ""))
    return non_ws / F.greatest(token_count(c), F.lit(1))


def stopword_hits(c: Column | str, words: Sequence[str]) -> Column:
    """How many tokens (lowercased) are in ``words``."""
    return F.size(F.filter(tokens(c), lambda t: F.lower(t).isin(*words)))


def stopword_ratio(c: Column | str, words: Sequence[str]) -> Column:
    return stopword_hits(c, words) / F.greatest(token_count(c), F.lit(1))


def quality_score(c: Column | str, stopwords: Sequence[str] = LANG_PROFILES["en"]) -> Column:
    """Composite document-quality heuristic in [0,1]:

    0.3 * min(tokens/50, 1)            (enough content)
    + 0.3 * (1 - min(punct_ratio*5,1)) (not punctuation soup)
    + 0.4 * min(stopword_ratio*4, 1)   (natural-language-like)

    The exact formula is arbitrary but pinned — the oracle replicates it
    term for term.
    """
    length_term = F.least(token_count(c) / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(c, stopwords) * 4, F.lit(1.0))
    # UNROUNDED: every term is pure IEEE arithmetic over exact counts,
    # identical expression-for-expression in the DuckDB twin — rounding
    # only added the half-at-6dp hazard (r12 sweep)
    return 0.3 * length_term + 0.3 * punct_term + 0.4 * stop_term


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    return {lang: stopword_hits(c, words) for lang, words in LANG_PROFILES.items()}


def lang_id(c: Column | str) -> Column:
    """Argmax language with deterministic tiebreak in PROFILE order
    (a CASE chain — identical logic is expressible in ANSI SQL)."""
    scores = lang_scores(c)
    langs = list(LANG_PROFILES)
    expr = F.lit(langs[-1])
    # build CASE from the back: lang_i wins if >= all later langs
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for later in langs[i + 1 :]:
            c_i = scores[langs[i]] >= scores[later]
            cond = c_i if cond is None else (cond & c_i)
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return expr


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alphanumerics
    collapsed to single spaces, trimmed."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def fingerprint_md5(c: Column | str) -> Column:
    """Content fingerprint, oracle-replicable (DuckDB md5())."""
    return F.md5(normalize_text(c))


def fingerprint_xxhash(c: Column | str, seed: int = 42) -> Column:
    """64-bit content fingerprint for the scale path (8 bytes/doc instead
    of a 32-char string; joins/aggregates on longs, not strings)."""
    return F.xxhash64(normalize_text(c), F.lit(seed))


def word_ngrams(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (input to MinHash/Jaccard).

    Built with sequence+transform+slice — pure Catalyst expressions.
    Docs shorter than n words get a single shingle = the whole text.
    """
    toks = tokens(c)
    joined = F.array_join(toks, " ")
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) <= n, F.array(joined)).otherwise(ngrams)


def gopher_quality_flags(
    c: Column | str,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    stopwords: Sequence[str] = LANG_PROFILES["en"],
) -> dict[str, Column]:
    """Gopher-style quality rules (Rae et al. 2021 §A1.1, adapted):
    per-document boolean flags plus the composite ``keep`` decision —
    the standard pre-training corpus filter set, each rule a pure Column
    expression over exact counts so the oracle replicates it verbatim.

    Returns {n_words, mean_word_len, symbol_ratio, flag_word_count,
    flag_mean_word_len, flag_symbol_ratio, flag_stopwords, keep}.
    ``mean_word_len``/``symbol_ratio`` are raw long/long IEEE divisions
    (bit-identical across engines, never rounded); flags are ints.
    """
    c = F.col(c) if isinstance(c, str) else c
    n_words = token_count(c)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = F.length(F.regexp_replace(c, r"\s", "")) / safe_n
    # '#' and ellipsis runs per word — Gopher's symbol-to-word screen
    n_symbols = F.length(F.regexp_replace(c, r"[^#…]", "")) + F.regexp_count(
        c, F.lit(r"\.\.\.")
    )
    symbol_ratio = n_symbols / safe_n
    flag_wc = ((n_words >= min_words) & (n_words <= max_words)).cast("int")
    flag_mwl = (
        (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ).cast("int")
    flag_sym = (symbol_ratio <= max_symbol_ratio).cast("int")
    flag_stop = (stopword_hits(c, stopwords) >= min_stopword_hits).cast("int")
    keep = (
        (flag_wc == 1) & (flag_mwl == 1) & (flag_sym == 1) & (flag_stop == 1)
    ).cast("int")
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "flag_word_count": flag_wc,
        "flag_mean_word_len": flag_mwl,
        "flag_symbol_ratio": flag_sym,
        "flag_stopwords": flag_stop,
        "keep": keep,
    }


# PII patterns kept deliberately simple and engine-portable (same regex
# dialect subset works in Java regex and DuckDB's RE2): training-data
# scrubbing wants high recall on the common shapes, not RFC compliance.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def pii_counts(c: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_urls) occurrence counts — JVM regex, one scan."""
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(c, F.lit(URL_RE)),
    )


def scrub_pii(c: Column | str) -> Column:
    """Replace emails/URLs with typed placeholders (<EMAIL>, <URL>) —
    the standard pre-training redaction pass, pure ``regexp_replace``
    (URLs first: an email-shaped userinfo inside a URL should scrub as
    part of the URL, not leave a dangling <EMAIL> inside it)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(
        F.regexp_replace(c, URL_RE, "<URL>"), EMAIL_RE, "<EMAIL>"
    )


def top_ngram_share(df, n: int = 2, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition signal: the share of a doc's word n-grams
    taken by its single most frequent n-gram (1.0 = pure repetition or a
    doc too short to have n of them). explode -> two hash aggregates, all
    codegen; the shuffle carries (id, gram hash-sized strings)."""
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    per = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy(id_col).agg(
        # UNROUNDED max/sum quotient of exact integers: one IEEE division,
        # bit-identical in every engine (ROUND(q, 6) is the dyadic-half
        # hazard — the r12 sweep)
        (F.max("c") / F.sum("c")).alias(f"top_{n}gram_share"),
        F.sum("c").alias(f"n_{n}grams"),
    )


def unigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
):
    """CCNet-style unigram quality score (Wenzek et al. 2020 §4.3,
    adapted: corpus-derived unigram LM instead of a pretrained one): each
    document scores the mean log-probability of its tokens under the
    corpus's top-``vocab_size`` unigram distribution; low scores flag
    boilerplate/garbage, high scores flag fluent head-vocabulary text.

    Cross-engine-exact by construction: per-token log-probabilities are
    quantized ONCE to integer micro-nats (``floor(ln(cnt/total)*1e6)`` as
    BIGINT, computed over the tiny vocab relation), so the per-document
    aggregation is an exact integer SUM — immune to float summation-order
    divergence between engines — and the final score is a single raw IEEE
    division of exact integers (the ``gopher_quality_docs`` precedent:
    never round a computed float, never accumulate doubles).

    Scale shape: one explode+groupBy builds the corpus counts (the only
    corpus-sized shuffle); the vocab is a TakeOrdered of ``vocab_size``
    rows broadcast to the scoring join; OOV tokens take the
    ``ln(1/total)`` floor penalty. The corpus ``total`` is one bounded
    1-row aggregate collect (QC-agg contract, operators/qc.py:100).

    Returns (id_col, n_tokens, n_oov, mean_logprob) — one row per input
    row; token-less docs get (0, 0, 0.0).
    """
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # documented bounded collect: a single scalar off a 1-row aggregate
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 1
    logp_m = F.floor(F.ln(F.col("cnt") / F.lit(float(total))) * 1e6).cast("long")
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token", logp_m.alias("logp_m"))
    )
    oov_m = F.floor(F.ln(F.lit(1.0) / F.lit(float(total))) * 1e6).cast("long")
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    per_doc = (
        toks.join(F.broadcast(vocab), on="token", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("logp_m").isNull().cast("long")).alias("n_oov"),
            F.sum(F.coalesce(F.col("logp_m"), oov_m)).alias("sum_m"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.col("n_tokens") > 0,
                F.col("sum_m") / (F.lit(1e6) * F.col("n_tokens")),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_logprob"),
        )
    )


def bigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    bigram_vocab_size: int = 4000,
    lam: float = 0.7,
    lam_c: float = 0.3,
):
    """Interpolated bigram LM quality score — the next rung above
    ``unigram_logprob_scores`` toward CCNet's KenLM 5-gram filter
    (Wenzek et al. 2020 §4.3): each document scores the mean token
    log-probability under a Jelinek-Mercer-interpolated bigram model

        P(cur | prev) = lam * cnt(prev,cur)/cnt(prev)
                      + lam_c * cnt(cur)/total

    with the first token scored by the pure unigram, unseen bigrams
    backing off to ``lam_c * P_uni(cur)``, and OOV tokens taking the
    ``1/total`` floor. Fluent text rides the bigram head (high
    ``n_bigram_hits``); shuffled/garbage text with plausible unigrams
    drops to the backoff tier — exactly the failure mode a unigram
    score cannot see.

    ``lam_c`` is passed EXPLICITLY rather than computed as ``1 - lam``:
    the score must be bit-identical to the DuckDB oracle, and the IEEE
    double ``1 - 0.7`` (0.30000000000000004) differs from the literal
    ``0.3`` an oracle query would naturally write.

    Cross-engine-exact the same way as the unigram score: every
    log-probability is quantized ONCE to integer micro-nats over the
    small vocab relations (top-``bigram_vocab_size`` bigrams joined to
    full unigram context counts; top-``vocab_size`` unigrams), per-doc
    aggregation is an exact integer SUM, and the final score is one raw
    IEEE division.

    Scale shape: two corpus-sized explode+groupBy shuffles (unigram and
    bigram counts — bigrams come from an in-array ``transform``, no
    positional self-join), TakeOrdered vocabs broadcast to the scoring
    joins, one groupBy(id) shuffle for the doc aggregate. Linear in
    corpus size; vocab state is bounded by the two K knobs.

    Returns (id_col, n_tokens, n_bigram_hits, mean_logprob).
    """
    t = tokens(text_col)
    base = df.select(F.col(id_col), t.alias("__toks"))
    # consecutive (prev, cur) pairs via in-array transform: pairs[i] =
    # (toks[i], toks[i+1]); the out-of-bounds last struct has cur NULL
    # and is filtered — zero joins, stays inside the scan stage.
    pair_col = F.expr(
        "filter(transform(__toks, (x, i) -> struct(x AS prev, get(__toks, i + 1) AS cur)),"
        " p -> p.cur IS NOT NULL)"
    )

    uni = (
        base.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # documented bounded collect: a single scalar off a 1-row aggregate
    total = float(uni.agg(F.sum("cnt")).collect()[0][0] or 1)

    big = (
        base.select(F.explode(pair_col).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_pc"))
    )
    big_vocab = (
        big.orderBy(F.col("c_pc").desc(), F.col("prev").asc(), F.col("cur").asc())
        .limit(bigram_vocab_size)
        .join(uni.select(F.col("token").alias("prev"), F.col("cnt").alias("c_prev")), "prev")
        .join(uni.select(F.col("token").alias("cur"), F.col("cnt").alias("c_cur")), "cur")
        .select(
            "prev",
            "cur",
            F.floor(
                F.ln(
                    F.lit(lam) * (F.col("c_pc") / F.col("c_prev").cast("double"))
                    + F.lit(lam_c) * (F.col("c_cur") / F.lit(total))
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("big_m"),
        )
    )
    uni_vocab = (
        uni.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select(
            "token",
            F.floor(F.ln(F.col("cnt") / F.lit(total)) * F.lit(1e6))
            .cast("long")
            .alias("uni0_m"),
            F.floor(F.ln(F.lit(lam_c) * (F.col("cnt") / F.lit(total))) * F.lit(1e6))
            .cast("long")
            .alias("fb_m"),
        )
    )
    oov0_m = F.floor(F.ln(F.lit(1.0) / F.lit(total)) * F.lit(1e6)).cast("long")
    oov_fb_m = F.floor(
        F.ln(F.lit(lam_c) * (F.lit(1.0) / F.lit(total))) * F.lit(1e6)
    ).cast("long")

    first_s = (
        base.where(F.size("__toks") > 0)
        .select(F.col(id_col), F.col("__toks")[0].alias("token"))
        .join(F.broadcast(uni_vocab), "token", "left")
        .select(
            F.col(id_col),
            F.coalesce("uni0_m", oov0_m).alias("m"),
            F.lit(0).cast("long").alias("hit"),
        )
    )
    rest_s = (
        base.select(F.col(id_col), F.explode(pair_col).alias("p"))
        .select(F.col(id_col), F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .join(F.broadcast(big_vocab), ["prev", "cur"], "left")
        .join(
            F.broadcast(uni_vocab.select(F.col("token").alias("cur"), "fb_m")),
            "cur",
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce("big_m", "fb_m", oov_fb_m).alias("m"),
            F.col("big_m").isNotNull().cast("long").alias("hit"),
        )
    )
    per_doc = (
        first_s.unionByName(rest_s)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("hit").alias("n_bigram_hits"),
            F.sum("m").alias("sum_m"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_bigram_hits", F.lit(0)).cast("long").alias("n_bigram_hits"),
            F.when(
                F.col("n_tokens") > 0,
                F.col("sum_m") / (F.lit(1e6) * F.col("n_tokens")),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_logprob"),
        )
    )
