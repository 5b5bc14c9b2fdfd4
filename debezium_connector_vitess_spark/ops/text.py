"""Text analysis: tokenization, language ID, quality scoring, fingerprinting,
PII scrub, paragraph dedup, HTML extraction, winnowing, exact-substring
duplicate spans, corpus profiling.

Per-document signals are pure Catalyst expressions (JVM-side, whole-stage
codegen) — at 100 TB they run as a single narrow projection over the scan:
no shuffle, no Python. Two ops are deliberate Arrow-batched ``mapInPandas``
seams because no efficient Catalyst form exists: zlib compression-ratio
(DEFLATE) and winnowing's rolling-window minimum (staged gram arrays get
inlined by the optimizer into quadratic re-evaluation — measured; see
``with_winnow_fingerprints``). Corpus-level passes (paragraph dedup,
winnow pair joins, ``corpus_profile``) shuffle only hashes/coordinates,
never document text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"
# BPE-ish word-piece pattern: runs of ≤4 letters, digits, or single symbols —
# a cheap upper-bound proxy for subword token count.
BPE_PIECE = r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
STOPWORDS_ES = ("el", "la", "de", "y", "que", "en", "un", "una", "los", "por")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von")
STOPWORDS_FR = ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization; empty strings dropped."""
    return F.filter(F.split(text, WHITESPACE), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_token_count_expr(text: Column) -> Column:
    """Subword-piece count via the BPE-ish regex (regexp_count is codegen'd)."""
    return F.regexp_count(text, F.lit(BPE_PIECE))


def stopword_hits_expr(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens_expr(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def punct_count_expr(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[^\w\s]"))


def mean_word_len_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def _quality_gates(n_chars, n_tokens, stop_ratio, punct_ratio, mwl) -> Column:
    """The four 0.25 quality gates — ONE definition consumed by
    :func:`quality_score_expr`, :func:`with_quality_score`, and
    :func:`with_text_metrics`, so a threshold tweak cannot silently diverge
    the three call sites from each other or from the DuckDB oracles that
    mirror these exact thresholds."""
    return (
        F.when((n_chars >= 100) & (n_chars <= 20000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(n_tokens >= 20, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(
            (punct_ratio <= 0.1) & (mwl >= 2.0) & (mwl <= 12.0), F.lit(0.25)
        ).otherwise(F.lit(0.0))
    )


def quality_score_expr(text: Column) -> Column:
    """Composite quality score in [0,1]: length band + stopword presence +
    low punctuation density + sane word length. The weights are arbitrary but
    fixed; the operator is the mechanics (LLM-pipeline quality gates compose
    exactly such signals)."""
    n_chars = F.length(text).cast("double")
    n_tokens = token_count_expr(text).cast("double")
    stop_ratio = stopword_hits_expr(text).cast("double") / F.greatest(
        token_count_expr(text), F.lit(1)
    ).cast("double")
    punct_ratio = punct_count_expr(text).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")
    mwl = mean_word_len_expr(text)
    return _quality_gates(n_chars, n_tokens, stop_ratio, punct_ratio, mwl)


def with_quality_score(
    df, text_col: str = "text", out_col: str = "quality_score"
):
    """Two-stage quality score: tokenize ONCE into a real column, then score
    from attribute references. Same result as :func:`quality_score_expr`, but
    the expression tree (and the whole-stage-codegen unit) is ~6× smaller —
    CollapseProject keeps the staged projection because the token array is a
    non-cheap alias referenced multiple times."""
    toks = F.col("__qs_toks")
    n_chars = F.length(F.col(text_col)).cast("double")
    n_tokens = F.size(toks).cast("double")
    stop_ratio = (
        F.size(F.filter(F.transform(toks, F.lower), lambda t: t.isin(*STOPWORDS_EN)))
        .cast("double")
        / F.greatest(F.size(toks), F.lit(1)).cast("double")
    )
    punct_ratio = punct_count_expr(F.col(text_col)).cast("double") / F.greatest(
        F.length(F.col(text_col)), F.lit(1)
    ).cast("double")
    mwl = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast(
        "double"
    ) / F.greatest(F.size(toks), F.lit(1)).cast("double")
    score = _quality_gates(n_chars, n_tokens, stop_ratio, punct_ratio, mwl)
    return (
        df.withColumn("__qs_toks", tokens_expr(F.col(text_col)))
        .withColumn(out_col, score)
        .drop("__qs_toks")
    )


def lang_id_expr(text: Column) -> Column:
    """Charset + stopword-marker language heuristic.

    Script detection first (CJK/Cyrillic/Arabic are unambiguous), then the
    stopword family with the most hits among {en, es, de, fr}; 'und' when no
    markers. Self-consistent and cheap (one pass of regex counts)."""
    low = F.lower(text)

    def hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(tokens_expr(low), lambda t: t.isin(*words)))

    en, es, de, fr = (hits(s) for s in (STOPWORDS_EN, STOPWORDS_ES, STOPWORDS_DE, STOPWORDS_FR))
    best = F.greatest(en, es, de, fr)
    return (
        F.when(text.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(text.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
        .when(text.rlike(r"[؀-ۿ]"), F.lit("ar"))
        .when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def normalize_text_expr(text: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    non-alphanumerics, collapse whitespace. The strip class is
    UNICODE-aware (``\\p{L}\\p{N}``): an ASCII-only ``[^a-z0-9]`` deletes
    every Cyrillic/CJK/Arabic letter, collapsing all non-Latin documents to
    the same md5("") fingerprint — dup_ratio ~1.0 for a zh/ru domain with
    zero real duplicates. Same class in the DuckDB oracles (RE2 supports
    ``\\p{L}`` identically)."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^\p{L}\p{N}\s]", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (content-defined id;
    stable across whitespace/punctuation noise)."""
    return F.md5(normalize_text_expr(text))


def token_hash_expr(token: Column, bits: int = 60) -> Column:
    """Deterministic cross-engine token hash: leading ``bits/4`` hex chars of
    md5 parsed as an integer (same construction reproducible in any SQL
    engine; avoids engine-private hash functions)."""
    nhex = bits // 4
    return F.conv(F.substring(F.md5(token), 1, nhex), 16, 10).cast("long")


def simhash_expr(text: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: per bit, majority vote of token-hash
    bits. One ``aggregate`` pass folds every token hash into a ``bits``-wide
    counter array (the hash is a bound lambda variable, so each token is
    hashed once — referencing the hash array from ``bits`` separate filter
    expressions would re-run the per-token md5 ``bits``× per element).
    Near-duplicate docs differ in few bits (compare via hamming)."""
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    hashes = F.transform(tokens_expr(text), lambda t: token_hash_expr(t))
    # per-bit majority as a ±1 delta fold: delta_i ≥ 0  ⇔  ones·2 ≥ n —
    # no token count needed, so no outer expression leaks into a lambda.
    deltas = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda c, p: c + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            deltas,
            powers,
            lambda d, p: F.when(d >= 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def hamming64_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def shingles_from_tokens_expr(toks: Column, n: int = 3, *, distinct: bool = True) -> Column:
    """Word n-gram shingles over an ALREADY-TOKENIZED array column.

    The slices reference the token attribute, so staging the tokenization
    once (a real column) and shingling from it costs one regex pass per row
    regardless of how many downstream expressions consume the grams —
    guaranteed by construction, where composing ``tokens_expr`` copies
    leans on codegen-time subexpression elimination to dedupe them
    (measured equivalent when CSE applies; staging also keeps the plan
    readable and holds up when CSE can't fire, e.g. in interpreted mode).
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    z = parts[0]
    for p in parts[1:]:
        z = F.zip_with(z, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(z) if distinct else z


def with_text_metrics(
    df,
    text_col: str = "text",
    *,
    gram_n: int = 3,
    include_grams: bool = True,
    tokens_col: str | None = None,
):
    """Every per-document text signal in one staged narrow projection:
    n_tokens, n_bpe_pieces, n_punct, mean_word_len, quality_score,
    total_grams / distinct_grams / repeated_frac (duplicate-n-gram
    repetition), fingerprint.

    The expensive intermediates — token array, gram array, gram counts,
    punctuation count, mean word length — are staged as real columns and
    every output references the attributes, so the regex tokenization and
    the shingle build each run ONCE per row by construction (the staged
    aliases are non-cheap and multiply referenced, so CollapseProject keeps
    the staging). Codegen-time subexpression elimination usually achieves
    the same for naively composed copies; staging doesn't depend on it and
    keeps the physical plan readable.

    ``tokens_col`` additionally RETAINS the staged token array under that
    name, so a caller composing further token-consuming expressions (e.g.
    :func:`repetition_signal_exprs`) reuses the one tokenization instead of
    re-running the regex split per consumer."""
    if tokens_col is not None and tokens_col in df.columns:
        raise ValueError(
            f"tokens_col {tokens_col!r} already exists on the input frame — "
            f"the staged token array would silently shadow/duplicate it"
        )
    t = F.col(text_col)
    c_toks, c_grams = "__tm_toks", "__tm_grams"
    c_tg, c_dg, c_punct, c_mwl = "__tm_tg", "__tm_dg", "__tm_punct", "__tm_mwl"
    staged = df.withColumn(c_toks, tokens_expr(t))
    if include_grams:
        # the gram build (slices + zip_with + array_distinct) is the costliest
        # part of this projection: include_grams=False lets aggregate-only
        # consumers (corpus_profile) skip it AND n_bpe_pieces entirely
        staged = (
            staged.withColumn(
                c_grams,
                shingles_from_tokens_expr(F.col(c_toks), gram_n, distinct=False),
            )
            .withColumn(c_tg, F.size(F.col(c_grams)))
            .withColumn(c_dg, F.size(F.array_distinct(F.col(c_grams))))
        )
    staged = (
        staged.withColumn(c_punct, punct_count_expr(t))
        .withColumn(
            c_mwl,
            F.aggregate(F.col(c_toks), F.lit(0), lambda a, x: a + F.length(x)).cast("double")
            / F.greatest(F.size(F.col(c_toks)), F.lit(1)).cast("double"),
        )
    )
    toks = F.col(c_toks)
    n_chars = F.length(t).cast("double")
    n_tokens_d = F.size(toks).cast("double")
    stop_ratio = (
        F.size(F.filter(F.transform(toks, F.lower), lambda x: x.isin(*STOPWORDS_EN)))
        .cast("double")
        / F.greatest(F.size(toks), F.lit(1)).cast("double")
    )
    punct_ratio = F.col(c_punct).cast("double") / F.greatest(F.length(t), F.lit(1)).cast("double")
    mwl = F.col(c_mwl)
    score = _quality_gates(n_chars, n_tokens_d, stop_ratio, punct_ratio, mwl)
    out = (
        staged.withColumn("n_tokens", F.size(toks))
        .withColumn("n_punct", F.col(c_punct))
        .withColumn("mean_word_len", mwl)
        .withColumn("quality_score", score)
        .withColumn("fingerprint", fingerprint_expr(t))
    )
    if include_grams:
        total, distinct = F.col(c_tg), F.col(c_dg)
        frac = F.when(
            total > 0, 1.0 - distinct.cast("double") / total.cast("double")
        ).otherwise(F.lit(0.0))
        out = (
            out.withColumn("n_bpe_pieces", bpe_token_count_expr(t))
            .withColumn("total_grams", total)
            .withColumn("distinct_grams", distinct)
            .withColumn("repeated_frac", frac)
            .drop(c_grams, c_tg, c_dg)
        )
    if tokens_col is not None:
        return out.withColumnRenamed(c_toks, tokens_col).drop(c_punct, c_mwl)
    return out.drop(c_toks, c_punct, c_mwl)


def repetition_expr(text: Column, n: int = 3) -> tuple[Column, Column, Column]:
    """Repetition scoring (the duplicate-n-gram quality signal large-corpus
    filters use): (total n-grams, distinct n-grams, repeated fraction).
    One narrow codegen'd projection; repeated fraction = 1 - distinct/total
    (0.0 for documents too short to form an n-gram)."""
    from .dedup import shingles_expr

    grams = shingles_expr(text, n, distinct=False)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    frac = F.when(total > 0, 1.0 - distinct.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )
    return total, distinct, frac


def repetition_signal_exprs(
    text: Column,
    toks: Column | None = None,
) -> tuple[Column, Column, Column, Column]:
    """Gopher-style repetition-filter signals (Rae et al. 2021, appendix
    A1.1 — the duplicate-line and top-n-gram rules every large-corpus
    quality gate applies), as EXACT integer counts so the driver-hashed
    ratios are derivable without any float convention:

    - ``n_lines``: non-empty trimmed lines (split on ``\\n``);
    - ``n_dup_lines``: duplicate line INSTANCES beyond each first
      occurrence (Gopher's "fraction of duplicate lines" numerator);
    - ``dup_line_chars``: characters in those duplicate instances
      ("fraction of characters in duplicate lines" numerator);
    - ``top_bigram_chars``: occurrences × length of the most frequent word
      2-gram (ties: larger character coverage wins — "fraction of
      characters in the most common 2-gram" numerator).

    Pure Catalyst, map-only, no shuffle: duplicate detection sorts the
    per-document line array and compares adjacent entries (O(L log L), L =
    line count); the top-bigram scan is ONE ``aggregate`` fold over the
    sorted gram array carrying (prev, run, best) state. NULL text is the
    empty document (all zeros), never NULL counts. Pass ``toks`` (an
    already-STAGED token array column, e.g. ``with_text_metrics(...,
    tokens_col=...)``'s) to reuse one tokenization instead of re-running
    the regex split here."""
    t = F.coalesce(text, F.lit(""))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    sl = F.array_sort(lines)
    n_lines = F.size(lines)
    n_dup = (n_lines - F.size(F.array_distinct(lines))).cast("long")
    zero = F.lit(0).cast("long")
    dup_chars = F.when(
        n_lines > 1,
        F.aggregate(
            F.sequence(F.lit(1), n_lines - 1),
            zero,
            lambda acc, i: acc
            + F.when(
                F.element_at(sl, i + 1) == F.element_at(sl, i),
                F.length(F.element_at(sl, i + 1)).cast("long"),
            ).otherwise(zero),
        ),
    ).otherwise(zero)

    if toks is None:
        toks = tokens_expr(t)
    else:
        # a staged token column may carry NULL for NULL text (callers stage
        # tokens_expr(text) without coalescing); hold the all-zeros contract
        # on this path too instead of propagating NULL through the folds
        toks = F.coalesce(toks, F.array().cast("array<string>"))
    grams = F.array_sort(shingles_from_tokens_expr(toks, 2, distinct=False))
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"),
        zero.alias("best_run"), zero.alias("best_chars"),
    )

    def _step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        chars = run * F.length(g).cast("long")
        better = (run > acc["best_run"]) | (
            (run == acc["best_run"]) & (chars > acc["best_chars"])
        )
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, chars).otherwise(acc["best_chars"]).alias("best_chars"),
        )

    top_bigram_chars = F.aggregate(
        grams, init, _step, lambda acc: acc["best_chars"]
    )
    return n_lines.cast("long"), n_dup, dup_chars, top_bigram_chars


def filter_by_repetition(
    df: DataFrame,
    text_col: str,
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_char_frac: float = 0.20,
    keep: bool = True,
) -> DataFrame:
    """APPLY the Gopher repetition gates (Rae et al. 2021, A1.1 — the rule
    set behind :func:`repetition_signal_exprs`' counts): drop a document
    when too many of its lines repeat, too many of its characters sit in
    repeated lines, or its most frequent word 2-gram covers too much of it.
    Defaults are the paper's published thresholds (0.30 / 0.20 / 0.20).

    A doc with no lines (empty/NULL text) passes every gate — the signals'
    all-zeros contract makes each fraction 0. ``keep=False`` inverts the
    predicate, returning the REJECTED docs (the audit view a curation run
    reviews before committing a filter). Map-only: one narrow projection,
    predicate evaluated in the scan stage — composes with every downstream
    dedup/score/pack step at zero shuffle cost."""
    t = F.col(text_col)
    n_lines, n_dup, dup_chars, top_bigram_chars = repetition_signal_exprs(t)
    n_chars = F.coalesce(F.length(t), F.lit(0)).cast("long")
    ok = (
        (n_dup.cast("double") <= max_dup_line_frac * F.greatest(n_lines, F.lit(1)))
        & (
            dup_chars.cast("double")
            <= max_dup_line_char_frac * F.greatest(n_chars, F.lit(1))
        )
        & (
            top_bigram_chars.cast("double")
            <= max_top_bigram_char_frac * F.greatest(n_chars, F.lit(1))
        )
    )
    return df.filter(ok if keep else ~ok)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the rolling-hash
# document fingerprinting used by MOSS): hash every character k-gram, then
# keep the minimum hash of each sliding window of w consecutive k-grams.
# Guarantee: any shared substring of length ≥ w + k - 1 yields a shared
# fingerprint, while only ~2/(w+1) of the gram hashes are kept. The
# fingerprint SET makes the tie-breaking rule immaterial. Fingerprinting is
# an Arrow-batched mapInPandas seam (still a map-only pass at 100 TB):
# Catalyst array formulations re-evaluate the gram build per window once the
# optimizer inlines the staged projections — see with_winnow_fingerprints.
# char_gram_hashes_expr stays as the JVM-side hash reference the tests pin
# the Python implementation against.
# ---------------------------------------------------------------------------


def char_gram_hashes_expr(chars: Column, k: int = 5, *, portable: bool = False) -> Column:
    """64-bit hashes of the character k-grams of a STAGED char-array column
    (``F.split(text, '')``). The array must be a real column — an inline
    expression would re-evaluate once per gram inside the lambda.

    ``portable=True`` switches from ``xxhash64`` (Spark-private, the cheap
    scale default) to the engine-agnostic 60-bit md5-prefix hash
    (:func:`token_hash_expr`'s construction), so an external SQL oracle can
    reproduce the fingerprints exactly."""
    n_grams = F.size(chars) - (k - 1)
    # sequence(1, 0) counts DOWN ([1, 0]) — empty docs need an explicit guard
    idx = F.when(n_grams < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), n_grams)
    )
    if portable:
        return F.transform(
            idx, lambda i: token_hash_expr(F.array_join(F.slice(chars, i, k), ""))
        )
    return F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(chars, i, k), ""))
    )


def _winnow_fingerprints_py(text: "str | None", k: int, window: int) -> list:
    """Reference winnowing over one document (shared by the mapInPandas op
    and the tests): 60-bit md5-prefix hashes of the char k-grams, distinct
    sliding-window minima; < window grams ⇒ global min; < k chars ⇒ empty."""
    import hashlib

    import numpy as np

    t = text or ""
    n = len(t)
    if n < k:
        return []
    hs = np.fromiter(
        (
            int(hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()[:15], 16)
            for i in range(n - k + 1)
        ),
        dtype=np.int64,
        count=n - k + 1,
    )
    if len(hs) < window:
        return [int(hs.min())]
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(hs, window).min(axis=1)).tolist()


def with_winnow_fingerprints(
    df,
    text_col: str = "text",
    *,
    k: int = 5,
    window: int = 4,
    out_col: str = "fingerprints",
):
    """Attach the winnowing fingerprint set (array<long>) per document —
    an Arrow-batched ``mapInPandas`` seam, map-only at 100 TB (no shuffle,
    no state; same class of honest Python seam as the multimodal codecs and
    :func:`with_compression_ratio`).

    Why not Catalyst: the rolling-window minimum needs the gram-hash array
    referenced from several sub-expressions, and the optimizer inlines such
    staged projections — each window-min then re-evaluates the whole gram
    build, O(chars × windows) re-hashing (measured: minutes for 500
    300-char docs at k=25/w=10). A single ``aggregate`` fold avoids the
    re-evaluation but pays interpreted per-element struct copies (measured
    39 s at sf0.1); the Arrow seam computes the same fingerprints in
    vectorized numpy (sliding_window_view min) with one md5 per gram.

    The gram hash is the engine-agnostic 60-bit md5 prefix — exactly
    :func:`char_gram_hashes_expr` with ``portable=True``, so SQL oracles
    reproduce the fingerprints; at extreme scale a faster non-cryptographic
    hash can be swapped into :func:`_winnow_fingerprints_py` (one line) at
    the cost of oracle replicability."""
    from pyspark.sql import types as T

    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.LongType()), True)
    ]
    schema = T.StructType(fields)

    def op(batches):
        for pdf in batches:
            pdf[out_col] = pdf[text_col].map(
                lambda t: _winnow_fingerprints_py(t, k, window)
            )
            yield pdf

    return df.mapInPandas(op, schema=schema)


def winnow_fingerprint_frame(
    df, text_col: str = "text", id_col: str = "doc_id", *, k: int = 5, window: int = 4
):
    """The exploded, MATERIALIZED (id, fp) winnow fingerprint frame — 16
    bytes/row. One Arrow fingerprinting pass (``localCheckpoint``; blocks
    reclaimed by the caller's ``cache.checkpoint_scope``), reusable across
    every downstream winnow variant: the self-join detector, cross-corpus
    slices (fingerprints are per-document), and the df-cap all read this
    frame instead of re-running the seam — at 100 TB each avoided consumer
    is a full corpus re-fingerprint."""
    from ..cache import eager_localcheckpoint

    f = with_winnow_fingerprints(df, text_col, k=k, window=window).select(
        F.col(id_col).alias("id"), F.explode("fingerprints").alias("fp")
    )
    return eager_localcheckpoint(f)[0]


def _cap_doc_freq(fps, max_doc_freq: int | None):
    """Shared winnow fingerprint document-frequency cap: drop fingerprints
    appearing in more than ``max_doc_freq`` documents BEFORE the equi-join
    (boilerplate fingerprints fan out quadratically). One definition for the
    self-join and cross-corpus variants."""
    if max_doc_freq is None:
        return fps
    common = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("fp")
    )
    return fps.join(common, on="fp", how="left_anti")


def winnow_match_pairs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    max_doc_freq: int | None = 1000,
    fps=None,
):
    """Candidate near-copy pairs sharing ≥ ``min_shared`` winnowing
    fingerprints — the MOSS-style containment detector (catches copied
    PASSAGES, which whole-document MinHash dilutes away). Explode the
    fingerprint sets and equi-join on the fingerprint: only (id, 8-byte
    hash) rows shuffle, never the text, and the join keyspace is the
    fingerprint domain — the same bounded-join shape as MinHash banding.

    ``max_doc_freq`` caps fingerprint document frequency BEFORE the
    self-join (standard MOSS practice): a fingerprint shared by n documents
    fans out n·(n−1)/2 candidate rows, so ONE boilerplate passage (license
    header, cookie banner) in 10⁶ documents would emit ~5·10¹¹ pairs from a
    single key. Over-common fingerprints carry no copy signal — MOSS drops
    them for relevance as much as cost — so the cap loses only pairs whose
    EVERY shared fingerprint is boilerplate-common. Same left_anti shape as
    MinHash's ``max_bucket_size`` (``dedup.minhash_dedup_pairs``), keyed on
    ``fp`` — colocated with the self-join shuffle. ``None`` disables.

    Fingerprints use the engine-agnostic md5-prefix gram hash (see
    :func:`with_winnow_fingerprints`), so SQL oracles reproduce the exact
    pair set.

    The exploded (id, fp) frame — 16 bytes/row — is materialized once
    (``localCheckpoint``): the frequency cap and BOTH self-join sides read
    it, and without the barrier the per-gram hashing seam re-runs up to 4×
    (one full corpus re-fingerprint per consumer at 100 TB). Blocks are
    reclaimed by the caller's ``cache.checkpoint_scope``, matching the
    MinHash materialization pattern.

    ``fps`` short-circuits fingerprinting: an already-MATERIALIZED exploded
    (id, fp) frame (see :func:`winnow_fingerprint_frame`) — the seam for a
    caller that derives several winnow variants from one corpus pass (e.g.
    self-match + cross-corpus in one query: fingerprints are per-document,
    so one frame serves every slicing)."""
    if fps is None:
        fps = winnow_fingerprint_frame(df, text_col, id_col, k=k, window=window)
    fps = _cap_doc_freq(fps, max_doc_freq)
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_cross_match(
    left,
    right,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    max_doc_freq: int | None = 1000,
    left_fps=None,
    right_fps=None,
):
    """Cross-corpus passage-copy detection: (left_id, right_id, n_shared)
    pairs sharing ≥ ``min_shared`` winnowing fingerprints across two
    DIFFERENT frames — eval-vs-train PASSAGE contamination (the stronger
    complement of :func:`~..ops.pipeline.decontaminate`'s n-gram counting:
    a verbatim passage of ≥ window+k−1 chars is guaranteed to surface even
    when the surrounding document differs entirely), or two crawls for
    cross-crawl dedup.

    Scale shape mirrors :func:`winnow_match_pairs`: both sides fingerprint
    through the Arrow seam ONCE (each exploded (id, fp) frame is
    localCheckpoint-materialized — 16 bytes/row), the join is an equi-join
    on the 8-byte fingerprint, and ``max_doc_freq`` caps the RIGHT
    (train/large) side's fingerprint document frequency before the join —
    boilerplate shared by the whole training corpus carries no
    contamination signal, same MOSS practice as the self-join variant.
    Blocks are reclaimed by the caller's ``cache.checkpoint_scope``.

    ``left_fps``/``right_fps`` short-circuit fingerprinting per side: an
    already-materialized exploded (id, fp) frame (fingerprints are
    per-document, so a slice of one corpus-wide frame is exactly the slice's
    fingerprints — the caller pays the Arrow seam once for any number of
    variants)."""

    def fp_frame(df, pre, out):
        f = (
            winnow_fingerprint_frame(df, text_col, id_col, k=k, window=window)
            if pre is None
            else pre
        )
        return f.select(F.col("id").alias(out), "fp")

    lfp = fp_frame(left, left_fps, "left_id")
    rfp = fp_frame(right, right_fps, "right_id")
    rfp = _cap_doc_freq(rfp, max_doc_freq)
    return (
        lfp.join(rfp, on="fp")
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def duplicated_spans(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 50,
    min_count: int = 2,
) -> "DataFrame":
    """Exact-substring duplicate spans (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): per document, the maximal
    token ranges in which EVERY ``min_tokens``-token window occurs at least
    ``min_count`` times corpus-wide (within-document repeats count). Where
    winnowing samples fingerprints to find copied passages *approximately*,
    this is the exact window criterion the ExactSubstr deduper enforces —
    the suffix-array construction the paper uses is a single-machine
    algorithm; the Spark-first equivalent is windowed gram hashing plus a
    corpus-wide occurrence count.

    "Exact" is up to 60-bit window-hash collisions (``token_hash_expr``):
    at W total windows the expected colliding pairs ≈ W²/2⁶¹ — negligible
    below ~10¹⁰ windows, but at the full 100 TB (~10¹³ windows) ~10⁷ phantom
    duplicate windows appear, each of which can cost an innocent document a
    ≥``min_tokens`` span in :func:`remove_duplicated_spans`. At that scale
    widen the key (e.g. a second independent hash joined alongside, the
    composite-key pattern of the interpolated-LM bigram join) or shard the
    corpus so W per shard stays under the comfort line.

    Returns (id_col, span_start, span_end, span_tokens, n_windows):
    0-based inclusive token positions, ``n_windows`` = number of duplicated
    windows merged into the span.

    Scale shape (100 TB): positional gram hashes (id, pos, 8-byte md5-prefix
    hash — the portable :func:`token_hash_expr`, so SQL oracles reproduce
    the spans) are materialized ONCE (`eager_localcheckpoint`) because both
    the occurrence count and the join-back consume them. The duplicate
    filter is a groupBy on the hash (longs-only exchange, partial agg
    collapses repeats map-side) followed by a LEFT SEMI join back —
    membership, not pairing, so a boilerplate window shared by 10⁶ docs
    contributes 10⁶ rows, never 10¹² pairs (no ``max_doc_freq`` cap needed,
    unlike the pair-emitting winnow join). Run merging is gaps-and-islands:
    one window partitioned BY DOCUMENT (``pos − row_number()`` constant
    within a consecutive run), so parallelism is the document count."""
    runs = _duplicated_window_runs(df, text_col, id_col, min_tokens, min_count)
    return (
        runs.groupBy(id_col, "__grp")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + F.lit(min_tokens - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )


def _duplicated_window_runs(df, text_col, id_col, k, min_count):
    """(id, __pos, __h, __grp) for every duplicated k-token window —
    ``__grp`` is the gaps-and-islands key (constant within a consecutive
    run). Shared by span detection and span removal."""
    from pyspark.sql import Window

    from ..cache import eager_localcheckpoint

    toks = df.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("__toks"))
    grams = shingles_from_tokens_expr(F.col("__toks"), k, distinct=False)
    g = (
        toks.select(
            F.col(id_col),
            F.posexplode(F.transform(grams, lambda s: token_hash_expr(s))),
        )
        .withColumnRenamed("pos", "__pos")
        .withColumnRenamed("col", "__h")
    )
    # both the occurrence count and the join-back consume the hashed frame;
    # without the barrier each consumer re-tokenizes and re-hashes the corpus
    # (blocks reclaimed by the caller's cache.checkpoint_scope)
    g, _release = eager_localcheckpoint(g)
    dup = (
        g.groupBy("__h")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__h")
    )
    hits = g.join(dup, on="__h", how="left_semi")
    w = Window.partitionBy(id_col).orderBy("__pos")
    return hits.withColumn("__grp", F.col("__pos") - F.row_number().over(w))


def remove_duplicated_spans(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 50,
    min_count: int = 2,
    out_col: str | None = None,
) -> "DataFrame":
    """The removal half of ExactSubstr dedup (Lee et al. 2021 cut all but
    one occurrence of each repeated substring): rebuild each document with
    its duplicated spans dropped, EXCEPT in the document that owns the
    span's first occurrence. Span identity is its first window's gram hash;
    the owner is the corpus-min (doc, span_start) for that hash — the same
    first-occurrence-wins convention as :func:`drop_duplicate_paragraphs`.
    For partially-overlapping repeats the loser's whole merged span is
    dropped (every window in it is duplicated somewhere, so only duplicated
    content is ever removed — over-removal of the LOSER, never removal of
    non-duplicated text).

    Known approximation (ownership is per MERGED span, keyed on its first
    window): when the same passage P occurs both standalone and embedded in
    a longer merged span (docs 'Q P' + 'P'), the 'Q P' winner keeps its
    whole span INCLUDING P while the standalone 'P' doc also wins its own
    hash group — P survives in two documents and one pass is not
    idempotent (a second pass converges). Exact all-but-one semantics need
    the suffix-array global ordering of Lee et al.; this composition trades
    that for shuffle-only execution.

    Returns (id_col, out_col). Documents with no removed span keep their
    original text byte-for-byte; edited documents are rebuilt by re-joining
    surviving tokens with single spaces (the :func:`tokens_expr`
    whitespace convention, as in paragraph dedup).

    Scale shape: everything up to the span frame is
    :func:`duplicated_spans`; the owner election is one groupBy on the
    8-byte first-window hash; the rebuild joins a (doc → few small intervals)
    frame back to the corpus on the doc id and filters the token array with
    a nested higher-order predicate — narrow, no extra corpus pass."""
    out_col = out_col or text_col
    k = min_tokens
    runs = _duplicated_window_runs(df, text_col, id_col, k, min_count)
    spans = runs.groupBy(id_col, "__grp").agg(
        F.min("__pos").alias("__s"),
        (F.max("__pos") + F.lit(k - 1)).alias("__e"),
        F.min_by("__h", "__pos").alias("__h1"),
    )
    owners = spans.groupBy("__h1").agg(
        F.min(F.struct(F.col(id_col), F.col("__s"))).alias("__w")
    )
    losers = (
        spans.join(owners, on="__h1")
        .filter(
            (F.col(id_col) != F.col("__w." + id_col))
            | (F.col("__s") != F.col("__w.__s"))
        )
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("__s", "__e")).alias("__rm"))
    )
    rebuilt = F.array_join(
        F.filter(
            tokens_expr(F.col(text_col)),
            lambda t, i: ~F.exists(
                F.col("__rm"), lambda iv: (i >= iv["__s"]) & (i <= iv["__e"])
            ),
        ),
        " ",
    )
    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(losers, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.when(F.col("__rm").isNotNull(), rebuilt)
            .otherwise(F.col(text_col))
            .alias(out_col),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (the CCNet/Dolma-style scrub step a training
# pipeline runs before tokenization). Patterns deliberately avoid
# lookaround/backreferences so Java-regex (Spark) and RE2 (DuckDB oracles)
# match identically; counting uses regexp_count / non-overlapping leftmost
# semantics, which both engines share.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# intl/us phone shapes: optional +, then >=9 chars of digits/space/()-, ending
# in a digit. Dots are excluded from the body so IPv4 octets never qualify.
# >= 8 digits with at most two space/dash/paren chars between consecutive
# digits (") " and " (" are two-char separators in +1 (415) 555-0100)
# and NO newlines/tabs: the old [0-9()\-\s]{7,} body matched any digit run
# spanning lines ('2021\n2022' scores, tables), redacting ordinary numeric
# prose as <PHONE>. Single-line year lists remain a known false positive —
# inherent to regex phone detection.
PII_PHONE = r"\+?[0-9](?:[()\- ]{0,2}[0-9]){7,}"
PII_IPV4 = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

_PII_ORDER = (  # email first so phone can't eat a numeric local-part
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def pii_count_exprs(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ipv4, n_phones) — three codegen'd regexp_count passes,
    no shuffle. Phone counting runs on the email-redacted text so an address
    like 12345678@host counts once, as an email."""
    deph = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    return (
        F.regexp_count(text, F.lit(PII_EMAIL)),
        F.regexp_count(text, F.lit(PII_IPV4)),
        F.regexp_count(deph, F.lit(PII_PHONE)),
    )


def redact_pii_expr(text: Column) -> Column:
    """Replace emails → <EMAIL>, IPv4 → <IP>, phones → <PHONE>, in that
    order (email before phone so numeric local parts redact as emails; IP
    before phone as a guard even though the phone body excludes dots)."""
    out = text
    for pat, token in _PII_ORDER:
        out = F.regexp_replace(out, pat, token)
    return out


# --- paragraph-level dedup (the Dolma/CCNet cleaning pass) -----------------

PARAGRAPH_SPLIT = r"\n{2,}"
LINE_SPLIT = r"\n"
#: dedup units: (split regex, canonical joiner)
_BLOCK_UNITS = {"paragraph": (PARAGRAPH_SPLIT, "\n\n"), "line": (LINE_SPLIT, "\n")}


def paragraphs_expr(text: Column, split: str = PARAGRAPH_SPLIT) -> Column:
    """Block array: split on blank lines by default (``split=LINE_SPLIT``
    for single lines — the Common-Crawl cleaning unit for nav menus and
    footers), trimmed, empties dropped."""
    return F.filter(
        F.transform(F.split(text, split), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def dedup_paragraphs_within(df, text_col: str, out_col: str | None = None):
    """Intra-document paragraph dedup: keep the FIRST occurrence of each
    repeated paragraph inside a document, preserving order
    (``array_distinct`` keeps first-occurrence order), and rebuild the text
    with a canonical blank-line separator. Pure narrow Catalyst projection —
    no shuffle, no Python; at 100 TB this is a map-only cleaning pass."""
    out_col = out_col or text_col
    return df.withColumn(
        out_col,
        F.array_join(F.array_distinct(paragraphs_expr(F.col(text_col))), "\n\n"),
    )


def drop_duplicate_paragraphs(
    df,
    text_col: str,
    id_col: str,
    *,
    min_chars: int = 1,
    out_col: str | None = None,
    unit: str = "paragraph",
):
    """Corpus-level block dedup: a block that appears in multiple
    documents survives ONLY in the document where it first appears (lowest
    ``id_col``; within a document, its first position). Boilerplate shorter
    than ``min_chars`` is exempt from cross-document matching (tiny
    blocks like headings legitimately repeat). ``unit`` picks the block
    grain: ``"paragraph"`` (blank-line split, the default) or ``"line"``
    (single newlines — the crawl-cleaning grain where nav menus, cookie
    banners, and footers repeat across a whole domain).

    Scale shape: the dedup logic runs entirely on (16-byte md5, doc, pos)
    COORDINATES — paragraph strings are hashed map-side and never enter the
    winner shuffle. One groupBy(hash) min-(doc,pos) pass, a colocated
    back-join on hash, a groupBy(doc) that collects the surviving position
    list (small ints), and ONE corpus join on the doc id whose rebuild is a
    narrow index-filtered projection over the re-split text. Returns
    (id_col, out_col) with documents whose every paragraph was claimed
    elsewhere becoming empty strings.
    """
    out_col = out_col or text_col
    if unit not in _BLOCK_UNITS:
        raise ValueError(f"unit must be one of {sorted(_BLOCK_UNITS)}, got {unit!r}")
    split, joiner = _BLOCK_UNITS[unit]
    from ..cache import eager_localcheckpoint

    coords = df.select(
        F.col(id_col),
        F.posexplode(paragraphs_expr(F.col(text_col), split)).alias("pos", "para"),
    ).select(
        F.col(id_col),
        "pos",
        F.md5(F.col("para")).alias("phash"),
        (F.length("para") >= min_chars).alias("__long"),
    )
    # materialize the (id, pos, 16-byte hash, flag) coordinates once: the
    # winner aggregation AND the back-join both read them, and without the
    # barrier each consumer re-splits and re-hashes the full corpus text
    # (blocks reclaimed by the caller's cache.checkpoint_scope)
    coords, _release = eager_localcheckpoint(coords)
    winners = (
        coords.filter(F.col("__long"))
        .groupBy("phash")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w"))
        .select("phash", F.col("w." + id_col).alias("__wid"), F.col("w.pos").alias("__wpos"))
    )
    kept_pos = (
        coords.join(winners, on="phash", how="left")
        .filter(
            (~F.col("__long"))
            | ((F.col(id_col) == F.col("__wid")) & (F.col("pos") == F.col("__wpos")))
        )
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__keep"))
    )
    rebuilt = F.array_join(
        F.filter(
            paragraphs_expr(F.col(text_col), split),
            lambda p, i: F.array_contains(F.col("__keep"), i),
        ),
        joiner,
    )
    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(kept_pos, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.when(F.col("__keep").isNotNull(), rebuilt).otherwise(F.lit("")).alias(
                out_col
            ),
        )
    )


# --- HTML → text extraction (crawl-pipeline boilerplate strip) -------------

_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
)


def html_to_text_expr(html: Column) -> Column:
    """Crawl-page text extraction as a chain of codegen'd ``regexp_replace``
    passes — no parser dependency, no Python, a narrow map-only projection
    at 100 TB:

    1. drop ``<script>``/``<style>`` blocks wholesale (their text is code),
       and HTML comments;
    2. turn block-level closers (``</p>``, ``</div>``, ``</li>``, headings,
       ``<br>``) into newlines so paragraph structure survives for the
       downstream paragraph ops;
    3. strip every remaining tag;
    4. decode the common entities (``&amp;`` last so double-escapes don't
       over-decode);
    5. collapse horizontal whitespace, trim line edges, and squeeze blank
       runs to the blank-line separator :func:`paragraphs_expr` splits on.

    Regex-based extraction is the Common-Crawl-pipeline tradeoff (exact
    DOM semantics need a parser; boilerplate quality gates come AFTER this
    pass) — deterministic and engine-reproducible.
    """
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    # an UNCLOSED script/style swallows the rest of the document (browser
    # semantics: script runs to EOF) — without this the bare tag-strip would
    # leave the script BODY behind as prose
    t = F.regexp_replace(t, r"(?is)<script\b[^>]*>.*$", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*$", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)\s*>", "\n\n"
    )
    t = F.regexp_replace(t, r"(?i)<br[^>]*>", "\n")  # incl. <br class=..>
    # tags must START with a letter (or /! for closers/doctype): the bare
    # <[^>]+> form ate real text between literal < and > in scraped prose
    # ("if a < b and c > d" lost its middle)
    t = F.regexp_replace(t, r"(?s)<[/!]?[A-Za-z][^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def with_compression_ratio(
    df,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    *,
    level: int = 6,
    bytes_col: str | None = None,
):
    """zlib compression ratio per document (compressed/raw bytes) — the
    classic entropy-proxy quality signal: templated/repetitive boilerplate
    compresses far below fluent prose, random noise barely compresses at
    all. No Catalyst expression can run DEFLATE, so this is an honest
    Arrow-batched ``mapInPandas`` seam (stdlib zlib, fixed ``level`` for
    determinism); everything else in this module stays JVM-side. Empty
    documents get ratio null.

    ``bytes_col`` additionally emits the raw compressed byte COUNT (long,
    null for empty docs): integer sums over it are exact and
    reduction-order-independent, so corpus-level aggregates built from it
    (e.g. :func:`corpus_profile`'s per-domain ratio) hash bit-identically
    across engines without any rounding convention."""
    import zlib

    from pyspark.sql import types as T

    fields = df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    if bytes_col is not None:
        fields = fields + [T.StructField(bytes_col, T.LongType(), True)]
    schema = T.StructType(fields)

    def op(batches):
        for pdf in batches:
            def csize(s):
                b = (s or "").encode("utf-8")
                if not b:
                    return None
                return len(zlib.compress(b, level))

            sizes = pdf[text_col].map(csize)
            raw = pdf[text_col].map(lambda s: len((s or "").encode("utf-8")))
            pdf[out_col] = [
                (s / r) if s is not None else None for s, r in zip(sizes, raw)
            ]
            if bytes_col is not None:
                pdf[bytes_col] = sizes.astype("Int64")
            yield pdf

    return df.mapInPandas(op, schema=schema)


def corpus_profile(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    domain_col: str = "source",
    include_compression: bool = False,
    byte_sums: bool = False,
    approx_distinct: bool = False,
):
    """Per-domain corpus health snapshot — the first query run against a new
    100 TB corpus before any curation decision: document/token/char volume,
    mean quality score, exact-duplicate ratio, empty and PII-bearing
    document counts, per domain.

    One narrow metrics projection (:func:`with_text_metrics` — no shuffle)
    followed by ONE groupBy(domain) aggregation; the duplicate ratio rides
    on ``count_distinct`` of the 16-byte content fingerprint, combined
    map-side like every other aggregate. Returns one row per domain:
    (domain, n_docs, n_empty, n_tokens, n_chars, mean_quality,
    distinct_content, dup_ratio, n_docs_with_pii).

    ``include_compression`` chains the zlib seam
    (:func:`with_compression_ratio`) ahead of the metrics projection and adds
    a per-domain ``compression_ratio`` = sum(compressed bytes) / sum(raw
    utf-8 bytes) — a ratio of two INTEGER sums, so it is exact and
    reduction-order-independent (no rounding convention needed for
    cross-engine hashing). Still one scan and one groupBy; the Arrow seam is
    the only non-JVM stage.

    ``byte_sums`` (with ``include_compression``) additionally keeps the two
    exact BIGINT sums as ``comp_bytes`` / ``raw_bytes`` — the exact numbers
    a release datasheet or a cross-engine comparison wants (the ratio is a
    derived float; the sums are canonical).

    ``approx_distinct`` (round 8) swaps the exact ``count_distinct`` for
    ``approx_count_distinct`` (HyperLogLog++, ~2% default rsd): at 100 TB
    the exact distinct is the snapshot's ONLY aggregate whose map-side
    partial state grows with the data (a per-partition hash set of every
    distinct 16-byte fingerprint — every other aggregate folds to constant
    bytes); the HLL sketch folds to ~KBs per partition no matter the
    corpus, the same trade the streaming twin
    (:func:`corpus_profile_stream`) already makes for state-boundedness.
    ``dup_ratio`` then inherits the estimate's error — fine for the health
    snapshot it feeds, not for a release datasheet."""
    if byte_sums and not include_compression:
        raise ValueError(
            "byte_sums=True requires include_compression=True (the sums are "
            "the compression aggregates) — it would otherwise be silently "
            "ignored and surface later as a missing-column error"
        )
    if include_compression:
        df = with_compression_ratio(
            df, text_col, "__cr", bytes_col="__cbytes"
        ).drop("__cr")
    m = with_text_metrics(df, text_col, include_grams=False)
    # PII detection rides the same single scan (three codegen'd regexp passes)
    e, i, p = pii_count_exprs(F.col(text_col))
    staged = m.withColumn("__pii", (e + i + p) > 0)
    out = staged.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        # NULL text counts as empty (length(NULL) is NULL, never == 0)
        F.sum(
            F.when(F.coalesce(F.length(text_col), F.lit(0)) == 0, 1).otherwise(0)
        ).alias("n_empty"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.round(F.avg("quality_score"), 4).alias("mean_quality"),
        # count_distinct ignores NULLs: a NULL-text doc must group with the
        # empty-content fingerprint, not silently shrink the denominator
        (
            F.approx_count_distinct(
                F.coalesce(F.col("fingerprint"), F.md5(F.lit("")))
            )
            if approx_distinct
            else F.count_distinct(
                F.coalesce(F.col("fingerprint"), F.md5(F.lit("")))
            )
        ).alias("distinct_content"),
        F.sum(F.when(F.col("__pii"), 1).otherwise(0)).alias("n_docs_with_pii"),
        *(
            [
                F.sum("__cbytes").alias("comp_bytes"),
                F.sum(F.octet_length(text_col)).alias("raw_bytes"),
            ]
            if include_compression
            else []
        ),
    )
    out = out.withColumn(
        "dup_ratio",
        F.round(
            1.0 - F.col("distinct_content").cast("double") / F.col("n_docs"), 4
        ),
    )
    if include_compression:
        out = out.withColumn(
            "compression_ratio",
            F.when(
                F.col("raw_bytes") > 0,
                F.col("comp_bytes").cast("double") / F.col("raw_bytes"),
            ),
        )
        if not byte_sums:
            out = out.drop("comp_bytes", "raw_bytes")
    return out


def corpus_profile_stream(
    stream_df,
    text_col: str = "text",
    *,
    ts_col: str = "ts",
    domain_col: str = "source",
    window: str = "1 hour",
    watermark_delay: str = "2 hours",
    exclude=None,
):
    """Streaming twin of :func:`corpus_profile`: per-(event-time window,
    domain) ingest-health rows over a continuously arriving document stream
    — the monitoring a 100 TB crawl feed runs IN FLIGHT, so a source that
    starts shipping empty/PII-laden/duplicate-heavy pages is caught within
    a window's delay instead of at the next full corpus profile.

    Same one-scan metrics projection (:func:`with_text_metrics` — stateless,
    so it streams as-is) + ONE watermarked tumbling-window aggregation in
    APPEND mode: each (window, domain) row is emitted exactly once when the
    watermark passes the window's end; documents later than
    ``watermark_delay`` are dropped (the explicit late-data policy, same as
    the change-rate stream). Differences from the batch profile, both
    forced by streaming-append semantics and named honestly in the schema:

    - ``approx_distinct_content`` (HLL) replaces the exact
      ``count_distinct`` — exact distinct inside a streaming window would
      hold every fingerprint in state;
    - ``quality_points`` = sum of (quality_score × 4) as an exact BIGINT
      (quality is a sum of 0.25 multiples, so ×4 is integral) — mean
      quality is quality_points / 4 / n_docs, derivable without hashing a
      float.

    Output: (window_start_ms, window_end_ms, domain, n_docs, n_empty,
    n_tokens, n_chars, quality_points, approx_distinct_content,
    n_docs_with_pii) — all integral. Scale shape: map-side-combining
    partial aggregation into |windows × domains| state rows, the same as
    the change-rate history table.

    ``exclude`` (optional Column predicate over the OUTPUT columns) drops
    clock-advancing sentinel groups AFTER the aggregation — same contract
    and pushdown barrier as :func:`~..metrics.change_rates_stream` (a
    pre-agg key filter would be pushed below the watermark node and the
    event-time clock would never advance)."""
    from ..metrics import _apply_post_agg_exclude, ensure_utc_event_time

    wm = ensure_utc_event_time(stream_df, ts_col).withWatermark(
        ts_col, watermark_delay
    )
    m = with_text_metrics(wm, text_col, include_grams=False)
    e, i, p = pii_count_exprs(F.col(text_col))
    staged = m.withColumn("__pii", (e + i + p) > 0)
    win = F.window(F.col(ts_col), window)
    agg = staged.groupBy(win.alias("w"), F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.coalesce(F.length(text_col), F.lit(0)) == 0, 1).otherwise(0)
        ).alias("n_empty"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("n_chars"),
        F.sum((F.col("quality_score") * 4).cast("long")).alias("quality_points"),
        F.approx_count_distinct(
            F.coalesce(F.col("fingerprint"), F.md5(F.lit("")))
        ).alias("approx_distinct_content"),
        F.sum(F.when(F.col("__pii"), 1).otherwise(0)).alias("n_docs_with_pii"),
    )
    out = agg.select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        F.unix_millis(F.col("w.end")).alias("window_end_ms"),
        "domain",
        "n_docs",
        "n_empty",
        "n_tokens",
        "n_chars",
        "quality_points",
        "approx_distinct_content",
        "n_docs_with_pii",
    )
    if exclude is not None:
        out = _apply_post_agg_exclude(out, exclude, count_col="n_docs")
    return out


#: query parameters that never change page identity — the usual
#: tracking/session noise a web-corpus dedup must see through. Generic
#: names like "ref" or "id" are deliberately NOT here: many sites use
#: them to SELECT content (?ref=branch, ?id=article), and dropping a
#: content-selecting param false-merges distinct pages — data loss, not
#: noise. Only unambiguous click-tracking identifiers qualify.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid",
)


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of a URL — the dedup key for page-level web-corpus
    dedup (the same page arrives as http/HTTPS, with/without :443, with a
    fragment, with utm_* click-tracking appended; byte-exact dedup sees
    five documents where there is one).

    Convention, applied in order and mirrored exactly by the SQL-oracle
    test: strip the fragment; lowercase scheme and host (path and query
    stay case-sensitive — /Page ≠ /page on most servers); drop a default
    port (:80 for http, :443 for https); normalize an empty path to "/";
    drop :data:`TRACKING_PARAMS` query params; SORT the surviving params
    (order does not change identity); drop the "?" when nothing survives.
    NULL/malformed input passes through the regex extracts as a
    best-effort string, never an error — garbage keys just don't collide.

    Pure Catalyst (regexp + split + filter + array_sort + concat): a
    map-side expression, so the canonical key is computed in the scan
    stage and ONLY the 16-byte hash of it needs to shuffle (compose with
    :func:`~.ops.dedup.exact_dedup` on the canonical column).
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment never identity
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)$", 1)
    # whitespace-only params are dropped (not just empty ones) and the
    # result is edge-trimmed: a trailing-space param would otherwise
    # survive one pass and be trimmed by the NEXT pass's input trim,
    # breaking idempotence (canonical(canonical(u)) == canonical(u) is
    # property-tested — an incremental pipeline must be free to
    # re-canonicalize without changing page identity)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.trim(p) != "")
            & ~F.lower(F.split(p, "=")[0]).isin(*TRACKING_PARAMS),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        # no scheme: not a URL shape we claim to normalize — but still
        # edge-trimmed, or a stripped trailing fragment leaves unstable
        # trailing whitespace ('00 #' -> '00 ' -> '00')
        scheme == "", F.trim(u)
    ).otherwise(F.trim(F.concat(scheme, F.lit("://"), host, path, qpart)))


def corpus_datasheet(
    df,
    text_col: str = "text",
    *,
    domain_col: str = "source",
    lang_col: str | None = "lang",
    top_n: int = 10,
) -> dict:
    """One-call dataset-release summary — the "datasheet" block every
    corpus hand-off needs: global volumes, length distribution, duplicate
    ratio, and the top domain / language mix, as one JSON-serializable
    dict. :func:`corpus_profile` is the per-domain DIAGNOSTIC table; this
    is the corpus-grain HEADLINE derived from the same one-scan metrics
    projection.

    Cost: one narrow :func:`with_text_metrics` pass feeding one global
    aggregate (count/sum/mean/exact percentiles/count_distinct of the
    16-byte fingerprint — all map-side-combining), plus a top-``top_n``
    groupBy per mix column (TakeOrdered, never a full sort). The collect
    is O(top_n) rows — a summary IS driver-sized by definition.
    """
    base = with_text_metrics(df, text_col, include_grams=False)

    def _global_agg():
        return base.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("n_tokens"),
            F.sum(F.length(text_col).cast("long")).alias("n_chars"),
            F.avg("quality_score").alias("mean_quality"),
            F.count_distinct("fingerprint").alias("distinct_content"),
            F.expr("percentile(n_tokens, array(0.5, 0.95, 0.99))").alias("pcts"),
            F.sum(F.when(F.col("n_tokens") == 0, 1).otherwise(0)).alias("n_empty"),
        ).collect()[0]

    def _mix_rows(col: str) -> list:
        return (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(col))
            .limit(top_n)
            .collect()
        )

    # the three summary actions are independent full passes — overlap them
    # (guide §2.6: concurrent jobs back-fill each other's stragglers); the
    # values are unchanged, only the serialized job latency goes away
    from concurrent.futures import ThreadPoolExecutor

    mix_cols = [domain_col] + ([lang_col] if lang_col is not None else [])
    with ThreadPoolExecutor(max_workers=1 + len(mix_cols)) as pool:
        g_f = pool.submit(_global_agg)
        mix_f = {c: pool.submit(_mix_rows, c) for c in mix_cols}
        g = g_f.result()
        mix_collected = {c: f.result() for c, f in mix_f.items()}

    def mix(col: str) -> list[dict]:
        # empty corpus: the grouped rows are necessarily empty too, but the
        # guard keeps the share division total and the r6 contract explicit
        if not g["n_docs"]:
            return []
        return [
            {"value": r[col], "n_docs": r["n"], "share": r["n"] / g["n_docs"]}
            for r in mix_collected[col]
        ]

    pcts = g["pcts"] if g["pcts"] is not None else [None, None, None]
    out = {
        "n_docs": g["n_docs"],
        "n_tokens": g["n_tokens"],
        "n_chars": g["n_chars"],
        "n_empty": g["n_empty"],
        "mean_quality": g["mean_quality"],
        "distinct_content": g["distinct_content"],
        "dup_ratio": (
            1.0 - g["distinct_content"] / g["n_docs"] if g["n_docs"] else 0.0
        ),
        "tokens_p50": pcts[0],
        "tokens_p95": pcts[1],
        "tokens_p99": pcts[2],
        "domain_mix": mix(domain_col),
    }
    if lang_col is not None:
        out["lang_mix"] = mix(lang_col)
    return out


def _norm_domain_expr(domain: Column) -> Column:
    """THE hostname normalization (lowercase, trim, strip one trailing
    dot) — one definition shared by the suffix expansion and the
    blocklist side, so the two halves of suffix matching cannot drift."""
    return F.lower(F.regexp_replace(F.trim(domain), r"\.$", ""))


def domain_suffixes_expr(domain: Column) -> Column:
    """All registrable suffixes of a hostname, most-specific first:
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com,
    com]. Normalized via :func:`_norm_domain_expr`; the explode size is
    the label count (≤ ~10), never data-dependent blowup."""
    d = _norm_domain_expr(domain)
    labels = F.split(d, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def filter_blocked_domains(
    df,
    domain_col: str,
    blocked,
    *,
    keep: bool = False,
):
    """Domain blocklist filter with SUFFIX semantics — blocking
    ``example.com`` blocks ``a.b.example.com`` too, which a naive equality
    or substring filter gets wrong in both directions (substring also
    kills ``notexample.com``). ``blocked`` is a one-column frame of
    blocked domains (apex or subdomain). ``keep=True`` inverts: keep ONLY
    matching rows (an allowlist).

    Scale: each row explodes to its ≤ label-count suffixes and LEFT
    SEMI-joins the blocklist on the suffix — the exchanges carry short
    domain/suffix strings and the blocklist side (typically small) is
    broadcast by AQE; no substring scan, no cartesian. Rows with NULL
    domains are never matched (kept under the default, dropped under
    ``keep=True``). Note ``df`` is read TWICE (the suffix pass and the
    final semi/anti join): when it is the output of an expensive lineage,
    localCheckpoint it first (`cache.checkpoint_scope`) per the
    materialize-once rule — the op cannot checkpoint for you because the
    right checkpoint point is the caller's pipeline, not the filter.
    """
    bl = blocked.select(
        _norm_domain_expr(F.col(blocked.columns[0])).alias("__bdom")
    ).distinct()
    sufs = df.select(
        F.col(domain_col).alias("__dom"),
        F.explode(domain_suffixes_expr(F.col(domain_col))).alias("__suf"),
    )
    hit_doms = (
        sufs.join(bl, sufs["__suf"] == bl["__bdom"], "left_semi")
        .select("__dom")
        .distinct()
    )
    how = "left_semi" if keep else "left_anti"
    return df.join(hit_doms, df[domain_col] == hit_doms["__dom"], how)


def badword_pattern(words, *, whole_word: bool = True) -> str:
    """ONE compiled alternation for a bad-word/phrase list (the C4-style
    blocklist gate). Lowercased, longest-first (so a phrase wins over its
    prefix word in the alternation), escaped with a conservative escape
    set that Java regex and RE2 read identically — the match is then run
    against ``lower(text)``, avoiding case-insensitivity flags whose
    Unicode semantics differ across engines."""
    import re

    ws = sorted({w.lower().strip() for w in words if w and w.strip()},
                key=lambda w: (-len(w), w))
    if not ws:
        raise ValueError("empty badword list")
    alt = "|".join(re.escape(w) for w in ws)
    return rf"\b(?:{alt})\b" if whole_word else f"(?:{alt})"


def badword_flag_expr(text: Column, words, *, whole_word: bool = True) -> Column:
    """Boolean per-document flag: does the text contain any listed word or
    phrase? NULL text flags false (the empty-document contract)."""
    return F.coalesce(
        F.lower(text).rlike(badword_pattern(words, whole_word=whole_word)),
        F.lit(False),
    )


def filter_badwords(
    df,
    text_col: str,
    words,
    *,
    mode: str = "regex",
    flag_col: str | None = None,
    keep: str = "clean",
):
    """Bad-word/phrase document gate (the C4 "dirty word list" filter).

    ``mode='regex'`` — one alternation over the lowercased text: supports
    multi-word phrases and runs as a single codegen'd ``RLIKE`` projection.
    ``mode='token'`` — exact unigram membership via ``arrays_overlap``
    against the broadcast-literal word array: no substring semantics (so
    "class" never trips on "ass"), still a pure map-side projection.

    Both modes are zero-shuffle: the list ships inside the task binary as
    a literal — at 100 TB this is a narrow filter fused into the scan, the
    cheapest possible gate, which is why it runs FIRST in a curation
    pipeline (before any shuffle-bearing dedup touches the dropped docs).
    ``flag_col`` annotates instead of filtering; ``keep='flagged'`` inverts
    (auditing the dropped slice)."""
    if mode == "regex":
        flag = badword_flag_expr(F.col(text_col), words)
    elif mode == "token":
        ws = sorted({w.lower() for w in words if w})
        if not ws:
            raise ValueError("empty badword list")
        if any(" " in w for w in ws):
            raise ValueError("mode='token' is unigram-only; use mode='regex' for phrases")
        flag = F.coalesce(
            F.arrays_overlap(
                F.transform(tokens_expr(F.col(text_col)), F.lower),
                F.array(*[F.lit(w) for w in ws]),
            ),
            F.lit(False),
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    if flag_col is not None:
        return df.withColumn(flag_col, flag)
    if keep == "clean":
        return df.filter(~flag)
    if keep == "flagged":
        return df.filter(flag)
    raise ValueError(f"unknown keep {keep!r}")
