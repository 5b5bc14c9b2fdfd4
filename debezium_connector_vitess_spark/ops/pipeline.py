"""Corpus-level training-data pipeline ops: vocabulary statistics, train/eval
decontamination, deterministic sampling, sequence packing.

Scale strategy (100 TB):
- **vocab top-k**: explode tokens → groupBy(token) count. Partial (map-side)
  aggregation collapses each partition's token stream to its local vocabulary
  before the exchange, so the shuffle carries distinct-tokens-per-partition,
  not the token stream. Head words (``the``) are exactly the keys partial agg
  compresses best — no salting needed. The final top-k is a TakeOrdered over
  the aggregated vocabulary, not a full sort.
- **decontamination**: grams are hashed to 8-byte longs map-side by default
  (``hashed=True`` via ``token_hash_expr``), so no exchange ever carries
  gram strings — semantics identical up to 60-bit collisions. Two physical
  strategies, identical output: ``method="semi"`` (distinct train grams
  LEFT SEMI joined by eval grams — one shuffle keyed by gram, train side
  deduplicated map-side) and ``method="bloom"`` (broadcast Bloom filter
  over the small eval gram set probes train grams MAP-SIDE; only the
  surviving sliver shuffles, and an exact broadcast join back against the
  eval grams removes every false positive — at 100 TB the train corpus
  never shuffles at all). The filtering direction (flag/drop TRAIN docs
  carrying eval grams) is ``contamination_flags``: broadcast sorted eval
  hashes + one vectorized searchsorted per Arrow batch — exact, zero
  shuffle, stateless, so the same call filters a Structured Streaming
  ingest per micro-batch.
- **hash sampling**: pure narrow projection — a deterministic md5-derived
  uniform in [0,100) per row, no shuffle, no RNG state, reproducible across
  engines and re-runs (the property that matters for dataset versioning).
- **sequence packing**: concat-and-chop (the standard LLM pretraining
  packing): running token offset per stream via a window cumsum = one
  shuffle keyed by the stream column; giant streams are split upstream by
  bucketing the stream key. Block id/offset are pure arithmetic on the
  running total.
- **token-budget mixture sampling**: two-level cumulative fill — docs are
  hash-bucketed inside each domain, bucket totals are cumulated on a tiny
  (domains × buckets) frame, and the per-doc cumsum runs per (domain,
  bucket). A domain's fill is never a single reducer task: parallelism is
  ``n_buckets`` per domain no matter how large the domain.
- **DSIR importance weighting**: hashed n-gram count features (Xie et al.,
  "Data Selection for Language Models via Importance Resampling", 2023).
  The bucket log-ratio table is ≤ ``dim`` rows → BROADCAST join; the corpus
  explode never shuffles on the feature key.
- **LM perplexity gates**: every vocabulary-sized frame (unigram LM,
  per-context bigram defaults, OOV floor, |V|) broadcasts; corpus-total
  scalars come from one-row distributed aggregates, never a
  ``Window.partitionBy()`` over the vocabulary. Only the interpolated
  model's (prev, token) bigram join shuffles the exploded corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_expr
from .text import (
    shingles_from_tokens_expr,
    token_count_expr,
    token_hash_expr,
    tokens_expr,
)


def vocab_topk(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Top-k corpus vocabulary by token frequency (ties broken by token)."""
    toks = df.select(F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("freq"))
    return vocab.orderBy(F.desc("freq"), F.asc("token")).limit(k)


def _bloom_build(hashes, fpp: float):
    """Standard Bloom filter over int64 hash values: ``m = -n ln p / (ln 2)^2``
    bits (rounded up to whole uint64 words), ``k = (m/n) ln 2`` probes via
    Kirsch-Mitzenmacher double hashing. Returns (words, n_bits, k)."""
    import math

    import numpy as np

    n = max(1, len(hashes))
    n_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    n_bits += (-n_bits) % 64
    k = max(1, min(30, round(n_bits / n * math.log(2))))
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    h = np.asarray(hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h2 = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) | np.uint64(1)
    for i in range(k):
        idx = (h + np.uint64(i) * h2) % np.uint64(n_bits)
        np.bitwise_or.at(words, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))
    return words, n_bits, k


def _bloom_contains(words, n_bits: int, k: int, values):
    """Vectorized membership test; same probe sequence as :func:`_bloom_build`.

    Probes narrow progressively: after each round only still-alive candidates
    are re-probed. With an optimally-sized filter each probe kills ~half the
    non-members, so expected work is ~2 probes/gram instead of k (~20 at
    fpp=1e-6) — the map-side cost at 100 TB is the train gram stream times
    THIS constant, so it matters there, not just locally."""
    import numpy as np

    h = np.asarray(values, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h2 = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) | np.uint64(1)
    alive = np.arange(len(h))
    for i in range(k):
        if len(alive) == 0:
            break
        idx = (h[alive] + np.uint64(i) * h2[alive]) % np.uint64(n_bits)
        hit = (words[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1) != 0
        alive = alive[hit]
    out = np.zeros(len(h), dtype=bool)
    out[alive] = True
    return out


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram: int = 5,
    hashed: bool = True,
    method: str = "semi",
    bloom_fpp: float = 1e-6,
) -> DataFrame:
    """Eval documents sharing ≥1 word n-gram with the train corpus, with the
    number of distinct overlapping grams (test-set contamination check).

    Returns (id_col, n_hits). Grams within a document are distinct by
    construction (``shingles_expr``), so ``count(*)`` after the join counts
    distinct shared grams without a count-distinct.

    ``hashed=True`` (the default — the 100 TB shape) maps each gram to its
    portable 60-bit hash (``token_hash_expr``) map-side, so the train-side
    distinct and the semi-join shuffle carry 8-byte longs instead of n-gram
    STRINGS (~10× narrower for 5-grams of English text). Semantics are
    identical up to 60-bit collisions — both within a document
    (``array_distinct`` runs on the hashes) and across the join; an
    engine-mirror oracle reproduces the same hash exactly. ``hashed=False``
    keeps the string-keyed join.

    ``method`` picks the physical strategy; the result is identical:

    - ``"semi"``: distinct train grams LEFT SEMI joined by eval grams. Both
      sides shuffle on the gram key — at 100 TB the train-side distinct IS
      the job (the full train gram stream through one exchange).
    - ``"bloom"``: the eval gram set (small by definition — it's a benchmark
      suite) is collected, built into a broadcast Bloom filter
      (``bloom_fpp``, default 1e-6 ⇒ ~28.8 bits/gram: 1M eval grams ≈
      3.6 MB; a 10^12-distinct-gram train corpus leaks only ~10^6 false
      positives), and train grams are filtered MAP-SIDE by an Arrow-batched
      membership probe. Only the surviving sliver (true overlaps + FPs) is
      distinct-ed and broadcast back against the eval grams — the exact
      inner join eliminates every false positive, so the output equals
      ``"semi"`` bit-for-bit while the train corpus never shuffles.
      Requires ``hashed=True`` (the probe runs on the 60-bit gram hash).
    """
    if method not in ("semi", "bloom"):
        raise ValueError(f"method must be semi|bloom, got {method!r}")
    g = shingles_expr(F.col(text_col), ngram)
    if hashed:
        g = F.array_distinct(F.transform(g, lambda x: token_hash_expr(x)))
    ev = eval_df.select(F.col(id_col), F.explode(g).alias("gram"))
    if method == "semi":
        tr = train.select(F.explode(g).alias("gram")).distinct()
        return (
            ev.join(tr, on="gram", how="left_semi")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits"))
        )

    if not hashed:
        raise ValueError("method='bloom' requires hashed=True")
    spark = train.sparkSession
    ev_hashes = ev.select("gram").distinct().toPandas()["gram"].to_numpy()
    if len(ev_hashes) == 0:
        return (
            ev.groupBy(id_col).agg(F.count("*").alias("n_hits")).limit(0)
        )
    words, n_bits, k = _bloom_build(ev_hashes, bloom_fpp)
    bc = spark.sparkContext.broadcast((words.tobytes(), n_bits, k))

    def bloom_hit(batches):
        import numpy as np

        wb, m, kk = bc.value
        w = np.frombuffer(wb, dtype=np.uint64)
        for pdf in batches:
            yield pdf[_bloom_contains(w, m, kk, pdf["gram"].to_numpy())]

    cand = (
        train.select(F.explode(g).alias("gram"))
        .mapInPandas(bloom_hit, "gram long")
        .distinct()
    )
    return (
        ev.join(F.broadcast(cand), on="gram", how="inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def contamination_flags(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram: int = 5,
) -> DataFrame:
    """The production direction of decontamination: annotate TRAIN documents
    with ``n_eval_hits`` — how many of their distinct word n-grams appear in
    the eval corpus — so contaminated docs can be dropped from the training
    set (``filter(n_eval_hits == 0)``). :func:`decontaminate` answers the
    audit question (which EVAL docs leak into train); this answers the
    filtering one, and does it without ANY shuffle: the distinct eval gram
    hashes (an eval suite is broadcast-sized by definition) are collected,
    sorted, broadcast, and each train doc's gram-hash array — built by the
    same Catalyst expression as the join paths, so all three agree exactly —
    is probed by one vectorized ``searchsorted`` per Arrow batch.

    EXACT (no Bloom false positives — membership is tested against the full
    sorted hash set), and STATELESS: the op is a pure map, so the identical
    call works on a Structured Streaming frame to filter a live ingest
    stream per micro-batch with no state store and no watermark.

    Returns ``train`` with ``n_eval_hits`` (long) appended. At 10⁹+ eval
    grams the sorted array outgrows broadcast — switch to
    :func:`decontaminate`'s semi-join (or bloom) shape at that point."""
    from pyspark.sql import types as T

    g = F.array_distinct(
        F.transform(
            shingles_expr(F.col(text_col), ngram), lambda x: token_hash_expr(x)
        )
    )
    # NULL text propagates to a NULL array and len(None) would kill the
    # Arrow batch — and this is the op advertised for live streaming ingest,
    # where one bad document must not fail the micro-batch
    g = F.coalesce(g, F.array().cast("array<bigint>"))
    ev = eval_df.select(F.explode(g).alias("gram")).distinct()
    ev_sorted = ev.toPandas()["gram"].to_numpy()
    ev_sorted.sort()
    bc = train.sparkSession.sparkContext.broadcast(ev_sorted)

    schema = T.StructType(
        train.schema.fields + [T.StructField("n_eval_hits", T.LongType(), False)]
    )

    def op(batches):
        import numpy as np

        ev_arr = bc.value
        for pdf in batches:
            grams = pdf["__grams"]
            lens = grams.map(len).to_numpy(dtype=np.int64)
            flat = (
                np.concatenate([np.asarray(a, dtype=np.int64) for a in grams])
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            idx = np.searchsorted(ev_arr, flat)
            ok = idx < len(ev_arr)
            hit = np.zeros(len(flat), dtype=np.int64)
            hit[ok] = (ev_arr[idx[ok]] == flat[ok]).astype(np.int64)
            bounds = np.zeros(len(pdf) + 1, dtype=np.int64)
            np.cumsum(lens, out=bounds[1:])
            csum = np.concatenate([[0], np.cumsum(hit)])
            out = pdf.drop(columns=["__grams"])
            out["n_eval_hits"] = csum[bounds[1:]] - csum[bounds[:-1]]
            yield out

    return train.withColumn("__grams", g).mapInPandas(op, schema=schema)


def _md5_long_expr(key: Column, salt: str) -> Column:
    """Deterministic 60-bit non-negative long from md5(salt || key) — the
    engine-agnostic hash (DuckDB mirror: ``('0x' || substr(md5(s), 1, 15))::
    BIGINT``). One definition: every salted-hash op in this file routes
    through here (which itself routes through ``text.token_hash_expr``), so
    the engine-portability-critical recipe cannot drift per call site."""
    return token_hash_expr(F.concat(F.lit(salt), key.cast("string")))


def hash_uniform_expr(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform int in [0, 100) from md5(salt || key) — the
    engine-agnostic construction (no rand(), no engine-private hash), so a
    sample is exactly reproducible anywhere, including the SQL oracle."""
    return _md5_long_expr(key, salt) % 100


def sample_by_hash(
    df: DataFrame,
    id_col: str,
    *,
    rate_pct: Column,
    salt: str = "sample",
) -> DataFrame:
    """Keep rows where the per-row deterministic uniform < ``rate_pct`` (an
    expression, so stratified rates per group are a ``when`` chain)."""
    return df.filter(hash_uniform_expr(F.col(id_col), salt) < rate_pct)


def assign_splits(
    df: DataFrame,
    key_col: str,
    *,
    fractions: "dict[str, float]",
    salt: str = "split",
    out_col: str = "split",
    resolution: int = 1_000_000,
    null_split: str | None = None,
) -> DataFrame:
    """Deterministic leakage-safe train/val/test assignment: the split is a
    pure function of ``key_col``, so every row sharing a key lands in the
    SAME split. Pass the near-dup ``cluster_id`` (or the canonical URL /
    domain) as the key and no near-duplicate pair can straddle the
    train/test boundary — splitting on ``doc_id`` leaks duplicated content
    across splits, the classic eval-contamination bug that survives exact
    dedup because near-dups have distinct ids.

    ``fractions`` is an ordered name→fraction mapping summing to 1 (the
    last name absorbs integer-floor remainder). Assignment thresholds are
    EXACT integers on the md5 60-bit long mod ``resolution`` — no float
    comparison anywhere, so any engine reproduces the split bit-for-bit
    (DuckDB mirror: ``('0x' || substr(md5(salt || key), 1, 15))::BIGINT %
    resolution`` against the same thresholds).

    Scale: one narrow map-side projection — no shuffle, no RNG state, no
    split-assignment table to join. Re-running on a grown corpus keeps
    every previously-assigned key in its split (hash stability), the
    property that keeps a frozen test set frozen across dataset versions.

    NULL keys ERROR at evaluation time by default (md5(NULL) is NULL, and
    silently falling through to the last split name would concentrate every
    unlabeled doc — e.g. the unmatched side of an upstream left join — in
    one split, the exact contamination this op exists to prevent). Pass
    ``null_split='train'`` (or any declared name) to route them explicitly.
    """
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("fractions needs at least two splits")
    vals = [fractions[n] for n in names]
    if min(vals) < 0 or abs(sum(vals) - 1.0) > 1e-9:
        raise ValueError(f"fractions must be non-negative and sum to 1: {fractions}")
    if null_split is not None and null_split not in names:
        raise ValueError(f"null_split {null_split!r} is not a declared split")
    u = _md5_long_expr(F.col(key_col), salt) % F.lit(resolution)
    expr = None
    acc = 0.0
    for n in names[:-1]:
        acc += fractions[n]
        bound = F.lit(int(round(acc * resolution)))
        expr = F.when(u < bound, F.lit(n)) if expr is None else expr.when(u < bound, F.lit(n))
    expr = expr.otherwise(F.lit(names[-1]))
    null_case = (
        F.lit(null_split)
        if null_split is not None
        else F.raise_error(
            F.concat(
                F.lit(f"assign_splits: NULL {key_col} (doc would silently "
                      f"land in {names[-1]!r}); fix the upstream join or "
                      f"pass null_split=")
            )
        ).cast("string")
    )
    return df.withColumn(
        out_col, F.when(F.col(key_col).isNull(), null_case).otherwise(expr)
    )


def _unit_uniform_expr(key: Column, salt: str) -> Column:
    """Engine-agnostic uniform in (0, 1): md5 60-bit long, +0.5 to open the
    lower edge, clamped to 1−2⁻⁵³ because the long→double conversion rounds
    the top 64 hash values up to exactly 2^60 (ulp 128 absorbs the +0.5).
    One definition for every ∝-weight draw in this file; the SQL oracles
    mirror it verbatim."""
    return F.least(
        (_md5_long_expr(key, salt) + F.lit(0.5)) / F.lit(float(2**60)),
        F.lit(0.9999999999999999),  # 1 - 2^-53, largest double < 1
    )


def gumbel_key_expr(
    log_weight: Column, key: Column, *, salt: str = "resample", temperature: float = 1.0
) -> Column:
    """Deterministic Gumbel perturbation key ``log_weight/T + G`` where
    ``G = -ln(-ln(u))`` and ``u`` is the engine-agnostic md5 uniform in
    (0, 1). The +0.5 offset keeps the lower edge open, but NOT the upper:
    for hash values within 64 of 2^60 the long→double conversion rounds
    the numerator up to exactly 2^60 (the ulp there is 128, so +0.5 is
    absorbed) and u lands on 1.0, where Spark's log(0) is NULL but DuckDB's
    ln(0) is -inf — so u is clamped to 1−2⁻⁵³ (the largest double < 1),
    identically in the SQL oracle. Ranking rows by this key and taking the
    top k draws a weighted sample WITHOUT replacement with inclusion
    ∝ softmax(log_weight/T) — the Gumbel-top-k trick. No RNG state: the
    same (salt, key) always yields the same perturbation, so a sample is
    a pure function of the corpus, reproducible in any engine (the DuckDB
    oracle recomputes it from the same md5 recipe)."""
    u = _unit_uniform_expr(key, salt)
    return log_weight / F.lit(float(temperature)) - F.log(-F.log(u))


def resample_by_weight(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    *,
    k: int | None = None,
    expected_frac: float | None = None,
    salt: str = "resample",
    temperature: float = 1.0,
) -> DataFrame:
    """Importance resampling — the SELECTION step that turns
    :func:`dsir_importance`'s per-document log-weights into an actual
    resampled corpus (Xie et al. 2023 sample documents ∝ their importance
    weight; ``weight_col`` is in LOG space, e.g. ``log_weight``).

    Two modes, both deterministic (md5-derived noise, no RNG state):

    ``k=`` — exact Gumbel-top-k: perturb each row's log-weight with a
    deterministic Gumbel draw and keep the k largest keys. A weighted
    sample without replacement, inclusion ∝ softmax(weight/T). Executes as
    TakeOrderedAndProject (per-partition top-k, one merge of k rows) — use
    when k is driver-sized. The top-k SET is robust to cross-engine libm
    last-ulp drift because adjacent order-statistic gaps are O(1/n), not
    O(ulp) (the oracle-parity margin test asserts the boundary gap).

    ``expected_frac=`` — Poisson resampling for corpus-sized samples: keep
    row i iff u_i < expected_frac · n · softmax_i. Two scalar aggregates
    (max(w) for the standard softmax shift — exp(w) overflows to inf past
    w ≈ 709 and one inf poisons Σ — then Σ exp(w−max), both broadcast
    back) plus a narrow filter: no global sort, no driver-sized result,
    scale-safe at any output size. Expected (not exact) sample size; rows
    with softmax mass above 1/(frac·n) are always kept (the min(·, 1)
    clamp), and a skewed corpus keeps proportionally FEWER of the light
    rows — frac·n is the expected total only when mass is spread.

    Exactly one of ``k`` / ``expected_frac`` must be given. Output keeps
    the input columns (the sample IS the corpus slice)."""
    if (k is None) == (expected_frac is None):
        raise ValueError("pass exactly one of k= or expected_frac=")
    w = F.col(weight_col).cast("double")
    if k is not None:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        gk = gumbel_key_expr(w, F.col(id_col), salt=salt, temperature=temperature)
        return (
            df.withColumn("__gk", gk)
            .orderBy(F.col("__gk").desc())
            .limit(k)
            .drop("__gk")
        )
    if not 0.0 < expected_frac <= 1.0:
        raise ValueError(f"expected_frac must be in (0, 1], got {expected_frac}")
    wt = w / F.lit(float(temperature))
    mx = df.select(F.max(wt).alias("__mw"))
    base = df.crossJoin(F.broadcast(mx))
    ew = F.exp(wt - F.col("__mw"))
    totals = base.select(F.sum(ew).alias("__z"), F.count(F.lit(1)).alias("__n"))
    u = _unit_uniform_expr(F.col(id_col), salt)
    return (
        base.crossJoin(F.broadcast(totals))
        .filter(
            u
            < F.least(
                F.lit(1.0), F.lit(expected_frac) * F.col("__n") * ew / F.col("__z")
            )
        )
        .drop("__mw", "__z", "__n")
    )


def _bigram_pairs(staged: DataFrame) -> DataFrame:
    """(prev, token) adjacent-pair frame from a staged ``__toks`` column —
    the one bigram-explode expression every LM builder shares."""
    return staged.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("__toks"), 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                F.slice(F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("prev"), b.alias("token")),
            )
        ).alias("g")
    ).select("g.prev", "g.token")


def ngram_count_frames(df: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame]:
    """Shared n-gram count frames for the LM family: ``(uni, bi)`` with
    uni = (token, cnt) and bi = (prev, token, bcnt), both MATERIALIZED once
    (localCheckpoint; blocks reclaimed by the caller's
    ``cache.checkpoint_scope``). Pass them to :func:`unigram_logprobs` /
    :func:`bigram_logprobs` / :func:`kn_bigram_logprobs` via ``counts=`` to
    tokenize and aggregate the corpus ONCE when building several models of
    the same corpus — the doc_perplexity registry row builds three, which
    without sharing costs five corpus-sized explodes instead of two. The
    derived LM values are bit-identical to the standalone builders (same
    count frames, same float expressions)."""
    from ..cache import eager_localcheckpoint

    staged = df.select(tokens_expr(F.lower(F.col(text_col))).alias("__toks"))
    uni = (
        staged.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    bi = _bigram_pairs(staged).groupBy("prev", "token").agg(
        F.count("*").alias("bcnt")
    )
    # EAGER on purpose (r13 A/B): these are corpus-sized explodes consumed
    # by several CONCURRENT broadcast-exchange jobs downstream — a lazy
    # checkpoint lets those jobs race and compute the explode twice before
    # either persists it (measured: lazy was a wall regression here, while
    # the vocab-sized frames in doc_perplexity_multi go lazy safely)
    uni, _r1 = eager_localcheckpoint(uni)
    bi, _r2 = eager_localcheckpoint(bi)
    return uni, bi


def unigram_logprobs(
    df: DataFrame, text_col: str, *, alpha: float = 0.5, counts: DataFrame | None = None
) -> DataFrame:
    """Corpus unigram language model: (token, logp) with add-``alpha``
    smoothing over the observed vocabulary.

    logp(t) = ln((count(t) + alpha) / (N + alpha·|V|)). One explode +
    groupBy(token) with map-side partial agg (the same shuffle shape as
    :func:`vocab_topk`). The two scalars N and |V| come from a distributed
    one-row aggregate of the vocab frame cross-joined back broadcast — NOT
    a ``Window.partitionBy()`` over the vocabulary, which would funnel the
    entire vocab (billions of distinct noise tokens at web scale) through a
    single task. The vocab is materialized once (``localCheckpoint``): it
    feeds both the totals aggregate and the final projection — without the
    barrier each consumer would re-run the corpus explode. Blocks are
    reclaimed by the caller's ``cache.checkpoint_scope``.

    ``counts`` (optional): a pre-materialized (token, cnt) frame from
    :func:`ngram_count_frames` — skips this builder's own explode when
    several LMs share one corpus."""
    from ..cache import eager_localcheckpoint

    if counts is not None:
        vocab = counts
    else:
        toks = df.select(
            F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token")
        )
        vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
        vocab, _release = eager_localcheckpoint(vocab)
    totals = vocab.agg(
        F.sum("cnt").alias("__n"), F.count("*").alias("__v")
    )
    return vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log(
            (F.col("cnt") + F.lit(alpha))
            / (F.col("__n") + F.lit(alpha) * F.col("__v"))
        ).alias("logp"),
    )


def bigram_logprobs(
    df: DataFrame,
    text_col: str,
    *,
    alpha: float = 0.5,
    counts: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Conditional bigram LM: (prev, token, logp) with add-``alpha``
    smoothing over the observed unigram vocabulary V:
    p(w | v) = (c(v,w) + alpha) / (c(v) + alpha·|V|).

    The table is SELF-CONTAINED for scoring any corpus: besides the observed
    bigrams it carries one sentinel default row per context v —
    (prev=v, token=NULL, logp of an unseen bigram over v) — and one global
    default row (prev=NULL, token=NULL, logp = ln 1/|V|) for unseen
    contexts, all derived from the TRAINING corpus (the DSIR-sentinel
    pattern), so :func:`doc_perplexity_interpolated` never has to
    reconstruct training counts from the scoring corpus.

    Scale shape: one explode per n-gram order with map-side partial agg; the
    context totals c(v) join onto the bigram frame keyed by the context
    token (aggregated-frame sizes, not the token stream), and the scalar |V|
    comes from a one-row distributed aggregate broadcast — no
    single-partition window anywhere. The bigram table is generally too
    large to broadcast; the scorer joins it on the (prev, token) key — one
    corpus-bigram shuffle, the honest cost of a conditional model.

    ``counts`` (optional): the (uni, bi) pair from
    :func:`ngram_count_frames` — skips this builder's own two explodes
    when several LMs share one corpus."""
    if counts is not None:
        uni, bi = counts
    else:
        staged = df.select(tokens_expr(F.lower(F.col(text_col))).alias("__toks"))
        uni = (
            staged.select(F.explode("__toks").alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
        )
        bi = _bigram_pairs(staged).groupBy("prev", "token").agg(
            F.count("*").alias("bcnt")
        )
    vsize = uni.agg(F.count("*").alias("__v"))
    ctx = uni.select(F.col("token").alias("prev"), F.col("cnt").alias("ccnt"))
    observed = (
        bi.join(ctx, on="prev")
        .crossJoin(F.broadcast(vsize))
        .select(
            "prev",
            "token",
            F.log(
                (F.col("bcnt") + F.lit(alpha))
                / (F.col("ccnt") + F.lit(alpha) * F.col("__v"))
            ).alias("logp"),
        )
    )
    ctx_defaults = ctx.crossJoin(F.broadcast(vsize)).select(
        "prev",
        F.lit(None).cast("string").alias("token"),
        F.log(F.lit(alpha) / (F.col("ccnt") + F.lit(alpha) * F.col("__v"))).alias(
            "logp"
        ),
    )
    global_default = vsize.select(
        F.lit(None).cast("string").alias("prev"),
        F.lit(None).cast("string").alias("token"),
        F.log(F.lit(1.0) / F.col("__v")).alias("logp"),
    )
    return observed.unionAll(ctx_defaults).unionAll(global_default)


def kn_bigram_logprobs(
    df: DataFrame,
    text_col: str,
    *,
    discount: float = 0.75,
    beta: float = 0.5,
    counts: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the standard
    strongest n-gram smoothing) in the same self-contained sentinel-table
    shape as :func:`bigram_logprobs`, so :func:`doc_perplexity_interpolated`
    scores it unchanged (``lam=1.0`` = pure KN; lower lam adds JM-style
    unigram shrinkage on top):

        p_KN(w|v) = max(c(v,w) − d, 0)/c(v) + λ(v)·p̃cont(w)
        λ(v) = d · N1+(v·)/c(v)        (the discounted mass, redistributed)
        p̃cont(w) = (N1+(·w) + β) / (T + β·|V|)

    where N1+(v·)/N1+(·w) are distinct-continuation counts and T the
    bigram-type total — the insight that "Francisco" is frequent but only
    ever follows "San", so its UNIGRAM frequency overstates how much an
    unseen context should trust it. β adds the uniform floor the textbook
    formulation lacks (p_cont of a word never seen as a continuation is 0,
    and ln 0 poisons scoring), the same role alpha plays in
    :func:`bigram_logprobs`. Sentinel-format caveat, documented not hidden:
    an unseen (v,w) pair falls to the per-context sentinel λ(v)·p̃cont_floor
    — the 3-level table cannot carry per-word continuation rows, so a
    known-but-unseen-in-context word scores the floor, a conservative
    underestimate.

    Scale shape: identical to :func:`bigram_logprobs` — one explode with
    map-side partial agg; every derived table (context totals,
    continuation counts) is aggregated-frame-sized; the scalars (T, |V|)
    are one-row broadcast crossJoins."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if beta <= 0.0:
        raise ValueError(f"beta must be > 0, got {beta}")
    if counts is not None:
        # shared frames (ngram_count_frames): bi is already materialized;
        # |V| = the uni frame's row count, identical to the distinct below
        uni, bi = counts
        vsize = uni.agg(F.count("*").alias("__v"))
    else:
        staged = df.select(tokens_expr(F.lower(F.col(text_col))).alias("__toks"))
        bi = _bigram_pairs(staged).groupBy("prev", "token").agg(
            F.count("*").alias("bcnt")
        )
        from ..cache import eager_localcheckpoint

        # the bigram-type frame feeds FOUR aggregations (context totals,
        # fan-out, continuation counts, type total) — materialize once
        bi, _release = eager_localcheckpoint(bi)
        vsize = (
            staged.select(F.explode("__toks").alias("t"))
            .agg(F.count_distinct("t").alias("__v"))
        )
    ctx = bi.groupBy("prev").agg(
        F.sum("bcnt").alias("ccnt"), F.count("*").alias("n1p_fwd")
    )
    cont = bi.groupBy("token").agg(F.count("*").alias("n1p_bwd"))
    scalars = bi.agg(F.count("*").alias("__t")).crossJoin(F.broadcast(vsize))
    d, b = float(discount), float(beta)
    pcont = (F.col("n1p_bwd") + F.lit(b)) / (
        F.col("__t") + F.lit(b) * F.col("__v")
    )
    lam = F.lit(d) * F.col("n1p_fwd") / F.col("ccnt")
    observed = (
        bi.join(ctx, on="prev")
        .join(cont, on="token")
        .crossJoin(F.broadcast(scalars))
        .select(
            "prev",
            "token",
            F.log(
                F.greatest(F.col("bcnt") - F.lit(d), F.lit(0.0)) / F.col("ccnt")
                + lam * pcont
            ).alias("logp"),
        )
    )
    pcont_floor = F.lit(b) / (F.col("__t") + F.lit(b) * F.col("__v"))
    ctx_defaults = ctx.crossJoin(F.broadcast(scalars)).select(
        "prev",
        F.lit(None).cast("string").alias("token"),
        F.log(lam * pcont_floor).alias("logp"),
    )
    global_default = scalars.select(
        F.lit(None).cast("string").alias("prev"),
        F.lit(None).cast("string").alias("token"),
        F.log(pcont_floor).alias("logp"),
    )
    return observed.unionAll(ctx_defaults).unionAll(global_default)


def doc_perplexity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lm: DataFrame,
) -> DataFrame:
    """Per-document perplexity under a unigram LM — the CCNet-style quality
    gate (low perplexity ≈ in-domain fluent text, high ≈ noise/boilerplate).

    Returns (id_col, n_tokens, avg_neg_logp, perplexity = exp(avg_neg_logp)).
    Tokens are exploded and joined against the LM table: at 100 TB the LM is
    a bounded vocabulary (≤ a few million rows), so the join is a BROADCAST
    hash join — the corpus never shuffles. Out-of-vocabulary tokens score
    half the rarest seen token's probability (min(logp) + ln 1/2), computed
    from the LM frame itself with one tiny aggregate joined in broadcast —
    no driver collect.

    Empty documents (zero tokens) are dropped — perplexity is undefined.

    The LM frame is materialized once (``localCheckpoint``): it feeds BOTH
    the broadcast join and the OOV-floor aggregate, and without the barrier
    each consumer would re-train the LM — a second full corpus scan. The
    blocks are reclaimed by the caller's ``cache.checkpoint_scope`` (the
    registry/bench convention), matching the MinHash materialization
    pattern.
    """
    from ..cache import eager_localcheckpoint

    lm, _release = eager_localcheckpoint(lm)
    floor = lm.select((F.min("logp") + F.log(F.lit(0.5))).alias("oov_logp"))
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token")
    )
    scored = (
        toks.join(F.broadcast(lm), on="token", how="left")
        .crossJoin(F.broadcast(floor))
        .select(id_col, F.coalesce(F.col("logp"), F.col("oov_logp")).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg("lp")).alias("avg_neg_logp"),
        F.exp(-F.avg("lp")).alias("perplexity"),
    )


def doc_perplexity_interpolated(
    df: DataFrame,
    text_col: str,
    id_col: str,
    uni_lm: DataFrame,
    bi_lm: DataFrame,
    *,
    lam: float = 0.7,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document perplexity under a Jelinek-Mercer interpolated bigram
    LM — the stronger CCNet-style gate (a unigram model can't tell fluent
    prose from a bag of frequent words; the bigram term can):

        p(w_i | w_{i-1}) = λ·p_bi(w_i | w_{i-1}) + (1−λ)·p_uni(w_i),

    with the document's first token scored by the unigram model alone.
    Returns (id, n_tokens, avg_neg_logp, perplexity).

    Backoff defaults — all carried INSIDE the training-corpus-derived LM
    tables (see :func:`bigram_logprobs`'s sentinel rows), so scoring a
    different corpus never mixes in scoring-side statistics: an
    out-of-vocabulary token takes the unigram OOV floor (min logp + ln ½,
    as :func:`doc_perplexity`); an UNSEEN BIGRAM over a seen context v
    takes the per-context sentinel alpha/(c(v)+alpha·|V|); an unseen
    context backs off to the global sentinel 1/|V|.

    Scale shape: the unigram LM, the per-context defaults, and the scalar
    floor/|V| frames are vocabulary-sized → BROADCAST joins; only the
    (prev, token)-keyed join against the bigram table shuffles the exploded
    corpus — the honest cost of a conditional model (the bigram table is
    too large to broadcast at corpus scale). Both LM frames are materialized
    once (localCheckpoint; blocks reclaimed by the caller's
    ``cache.checkpoint_scope``)."""
    from ..cache import eager_localcheckpoint

    uni_lm, _r1 = eager_localcheckpoint(uni_lm)
    bi_lm, _r2 = eager_localcheckpoint(bi_lm)
    floor = uni_lm.select((F.min("logp") + F.log(F.lit(0.5))).alias("__oov"))

    observed = bi_lm.filter(F.col("token").isNotNull())
    ctx_default = bi_lm.filter(
        F.col("token").isNull() & F.col("prev").isNotNull()
    ).select("prev", F.col("logp").alias("__ctx0"))
    global_default = bi_lm.filter(F.col("prev").isNull()).select(
        F.col("logp").alias("__glob0")
    )

    staged = df.select(
        F.col(id_col), tokens_expr(F.lower(F.col(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    pairs = (
        staged.filter(n > 0)  # empty docs: perplexity undefined, dropped —
        # and zip_with pads the shorter side with null, so an empty token
        # array would otherwise fabricate one phantom (null, null) position
        .select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.concat(
                        F.array(F.lit(None).cast("string")),
                        F.slice(F.col("__toks"), 1, F.greatest(n - 1, F.lit(0))),
                    ),
                    F.col("__toks"),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("token")),
                )
            ).alias("g"),
        )
        .select(id_col, "g.prev", "g.token")
    )

    # attach every broadcast-joinable value FIRST (unigram logp, per-context
    # default, floor, global default — all map-side, no shuffle), then drop
    # the token strings and join the bigram table on a 64-bit (prev, token)
    # hash: the one real shuffle of this operator carries
    # (id, 8-byte key, two doubles) per position — never word strings
    narrow = (
        pairs.join(F.broadcast(uni_lm), on="token", how="left")
        .withColumnRenamed("logp", "__lp_u")
        .join(F.broadcast(ctx_default), on="prev", how="left")
        .crossJoin(F.broadcast(floor))
        .crossJoin(F.broadcast(global_default))
        .select(
            F.col(id_col),
            # 128-bit composite key (two independently-seeded xxhash64):
            # a single 64-bit key risks a collision silently attaching an
            # unrelated observed bigram's logp (or double-joining a position
            # if two observed bigrams collide) — at 2^-128 the composite
            # makes both failure modes practically impossible while the
            # exchange still carries only longs, never word strings
            F.when(
                F.col("prev").isNotNull(), F.xxhash64("prev", "token")
            ).alias("__bh"),
            F.when(
                F.col("prev").isNotNull(), F.xxhash64(F.lit(1), "prev", "token")
            ).alias("__bh2"),
            F.coalesce(F.col("__lp_u"), F.col("__oov")).alias("__lpu"),
            F.coalesce(F.col("__ctx0"), F.col("__glob0")).alias("__lpb0"),
        )
    )
    btab = observed.select(
        F.xxhash64("prev", "token").alias("__bh"),
        F.xxhash64(F.lit(1), "prev", "token").alias("__bh2"),
        F.col("logp").alias("__lp_b"),
    )
    scored = narrow.join(btab, on=["__bh", "__bh2"], how="left")
    lp_b = F.coalesce(F.col("__lp_b"), F.col("__lpb0"))
    p = F.when(F.col("__bh").isNull(), F.exp(F.col("__lpu"))).otherwise(
        F.lit(lam) * F.exp(lp_b) + F.lit(1.0 - lam) * F.exp(F.col("__lpu"))
    )
    per_tok = scored.select(id_col, F.log(p).alias("__lp"))
    return per_tok.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg("__lp")).alias("avg_neg_logp"),
        F.exp(-F.avg("__lp")).alias("perplexity"),
    )


def doc_perplexity_multi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    uni_lm: DataFrame,
    bi_lms: "list[tuple[str, DataFrame, float]]",
) -> DataFrame:
    """Score the unigram LM AND several sentinel-format bigram LMs over ONE
    corpus pass — the fused form of :func:`doc_perplexity` +
    N × :func:`doc_perplexity_interpolated` for models trained on the same
    corpus.

    ``bi_lms`` is ``[(name, bi_lm, lam), ...]`` where each ``bi_lm`` is a
    sentinel-format table (:func:`bigram_logprobs` /
    :func:`kn_bigram_logprobs` output) and ``lam`` its Jelinek-Mercer
    weight. Returns one row per non-empty document::

        (id, n_tokens, avg_neg_logp, perplexity,          -- unigram
         <name>_avg_neg_logp, <name>_perplexity, ...)     -- per bigram LM

    Why fused: scored separately, each scorer EXPLODES the corpus into its
    token/bigram stream and aggregates per doc — for the registry's
    three-model row that is three corpus-sized explodes, three
    groupBy(id) aggregations, and two doc-id joins to reassemble the
    frame. All three models consume the SAME (prev, token) position
    stream, so one explode + one 128-bit-hash-keyed join against the
    UNION of the observed tables + one groupBy(id) computes every score
    (guide §2.3/§2.4: aggregate once, don't re-shuffle what you already
    shuffled). At 100 TB the corpus explode IS the cost; the observed
    tables are bigram-type-sized and merge with aggregate-frame-sized
    joins.

    Value contract: every per-token term is the SAME expression the
    standalone scorers build — the unigram logp is the identical broadcast
    join + OOV coalesce, each bigram p the identical
    ``lam·exp(lp_b) + (1−lam)·exp(lp_u)`` over the identically-joined
    table values — so per-doc sums differ from the separate composition
    only by float reduction order (~1e-13 relative), inside the margins
    the quantized outputs are pinned to
    (test_perplexity_quantization_margins). The observed tables are merged
    with FULL OUTER joins on the same 128-bit composite key the scorer
    joins on: a key absent from one table scores that table's per-context
    sentinel via the same ``coalesce`` the standalone scorer applies, so
    the fusion is value-preserving even for models with different observed
    key sets."""
    # LAZY checkpoints (r13): the LM frames here are vocab-sized
    # derivations of the already-eager count frames, and every first
    # consumer (floor aggregate, ctx/global-default broadcast collects) is
    # a full-pass job — folding materialization into it drops one
    # scheduling barrier per frame (3 jobs/row; interleaved A/B measured
    # wall flat-to-better, jobs 50 -> 47) with no recompute risk: block
    # locks serialize concurrent consumers of a lazily-persisted partition
    from ..cache import lazy_localcheckpoint

    # names become per-model column suffixes (__lp_b_<name>, __ctx0_<name>):
    # duplicates or empties would surface as an ambiguous-column
    # AnalysisException far from the call site (ADVICE r12)
    names = [name for name, _bi, _lam in bi_lms]
    if len(set(names)) != len(names) or not all(
        n and n.isidentifier() for n in names
    ):
        raise ValueError(
            f"bi_lms names must be unique, non-empty identifiers (got {names!r})"
        )

    uni_lm, _r = lazy_localcheckpoint(uni_lm)
    floor = uni_lm.select((F.min("logp") + F.log(F.lit(0.5))).alias("__oov"))

    staged = df.select(
        F.col(id_col), tokens_expr(F.lower(F.col(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    pairs = (
        staged.filter(n > 0)  # empty docs dropped (perplexity undefined);
        # zip_with pads the shorter side with null, so an empty token array
        # would otherwise fabricate one phantom (null, null) position
        .select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.concat(
                        F.array(F.lit(None).cast("string")),
                        F.slice(F.col("__toks"), 1, F.greatest(n - 1, F.lit(0))),
                    ),
                    F.col("__toks"),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("token")),
                )
            ).alias("g"),
        )
        .select(id_col, "g.prev", "g.token")
    )

    # broadcast-attach everything vocabulary-sized: the unigram logp, each
    # model's per-context default, each model's global default, the OOV
    # floor — all map-side. Then drop the strings: the one real shuffle
    # carries (id, 128-bit key, doubles), never word strings (the
    # doc_perplexity_interpolated key discipline).
    narrow = pairs.join(F.broadcast(uni_lm), on="token", how="left").withColumnRenamed(
        "logp", "__lp_u"
    )
    sel = [
        F.col(id_col),
        F.when(F.col("prev").isNotNull(), F.xxhash64("prev", "token")).alias("__bh"),
        F.when(
            F.col("prev").isNotNull(), F.xxhash64(F.lit(1), "prev", "token")
        ).alias("__bh2"),
        F.coalesce(F.col("__lp_u"), F.col("__oov")).alias("__lpu"),
    ]
    merged_btab = None
    for name, bi_lm, _lam in bi_lms:
        bi_lm, _ri = lazy_localcheckpoint(bi_lm)
        observed = bi_lm.filter(F.col("token").isNotNull())
        ctx_default = bi_lm.filter(
            F.col("token").isNull() & F.col("prev").isNotNull()
        ).select("prev", F.col("logp").alias(f"__ctx0_{name}"))
        global_default = bi_lm.filter(F.col("prev").isNull()).select(
            F.col("logp").alias(f"__glob0_{name}")
        )
        narrow = narrow.join(F.broadcast(ctx_default), on="prev", how="left")
        narrow = narrow.crossJoin(F.broadcast(global_default))
        sel.append(
            F.coalesce(F.col(f"__ctx0_{name}"), F.col(f"__glob0_{name}")).alias(
                f"__lpb0_{name}"
            )
        )
        btab = observed.select(
            F.xxhash64("prev", "token").alias("__bh"),
            F.xxhash64(F.lit(1), "prev", "token").alias("__bh2"),
            F.col("logp").alias(f"__lp_b_{name}"),
        )
        merged_btab = (
            btab
            if merged_btab is None
            else merged_btab.join(btab, on=["__bh", "__bh2"], how="full_outer")
        )
    narrow = narrow.crossJoin(F.broadcast(floor)).select(*sel)

    scored = (
        narrow.join(merged_btab, on=["__bh", "__bh2"], how="left")
        if merged_btab is not None
        else narrow
    )
    per_tok_cols = [F.col(id_col), F.col("__lpu")]
    for name, _bi, lam in bi_lms:
        lp_b = F.coalesce(F.col(f"__lp_b_{name}"), F.col(f"__lpb0_{name}"))
        p = F.when(F.col("__bh").isNull(), F.exp(F.col("__lpu"))).otherwise(
            F.lit(lam) * F.exp(lp_b) + F.lit(1.0 - lam) * F.exp(F.col("__lpu"))
        )
        per_tok_cols.append(F.log(p).alias(f"__lp_{name}"))
    per_tok = scored.select(*per_tok_cols)

    aggs = [
        F.count("*").alias("n_tokens"),
        (-F.avg("__lpu")).alias("avg_neg_logp"),
        F.exp(-F.avg("__lpu")).alias("perplexity"),
    ]
    for name, _bi, _lam in bi_lms:
        aggs.append((-F.avg(f"__lp_{name}")).alias(f"{name}_avg_neg_logp"))
        aggs.append(F.exp(-F.avg(f"__lp_{name}")).alias(f"{name}_perplexity"))
    return per_tok.groupBy(id_col).agg(*aggs)


def perplexity_buckets(
    df: DataFrame,
    ppl_col: str,
    *,
    domain_col: str | None = None,
    bounds: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    out_col: str = "ppl_bucket",
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): bucket documents
    by perplexity percentile — per ``domain_col`` when given (each domain
    gets its own thresholds, the paper's per-language convention), else
    globally. ``head`` = lowest perplexity (most in-domain). Rows with a
    NULL perplexity (e.g. empty documents the scorer dropped) get a NULL
    bucket — routing them silently into ``tail`` would mislabel absent
    evidence as low quality.

    Returns the input plus ``out_col``. Thresholds come from ONE
    percentile aggregation over (|domains| or 1) groups, broadcast back —
    the corpus never shuffles; labeling is a map-side CASE.

    ``exact=False`` (default — the 100 TB path) uses
    ``approx_percentile``: its sketch state is bounded per group, where the
    exact percentile's aggregation state holds every value of the group (a
    datasheet-grade choice, fine for bounded corpora — and the mode the
    DuckDB ``quantile_cont`` parity test runs, since the sketch is
    engine-specific). CCNet's selection only needs tercile-grade
    thresholds, so the sketch is the right default."""
    if len(labels) != len(bounds) + 1:
        raise ValueError(
            f"{len(bounds)} bounds need {len(bounds) + 1} labels, got {len(labels)}"
        )
    strictly_increasing = all(b2 > b1 for b1, b2 in zip(bounds, bounds[1:]))
    if not strictly_increasing or not all(0.0 < b < 1.0 for b in bounds):
        # duplicates would shadow a label into unreachability — reject, don't
        # silently return a degenerate bucketing
        raise ValueError(f"bounds must be strictly increasing in (0, 1): {bounds}")
    ppl = F.col(ppl_col).cast("double")
    pcts = F.array(*[F.lit(float(b)) for b in bounds])
    agg_fn = (
        F.percentile(ppl, pcts)
        if exact
        else F.percentile_approx(ppl, pcts, F.lit(accuracy))
    )
    if domain_col is not None:
        # null-safe join key: a NULL domain is its own group (it gets its
        # own thresholds from the groupBy) — a plain equality join would
        # never match it and the fall-through would mislabel it 'tail'
        thresholds = df.groupBy(domain_col).agg(agg_fn.alias("__ts")) \
            .withColumnRenamed(domain_col, "__dom")
        labeled = df.join(
            F.broadcast(thresholds),
            on=F.col(domain_col).eqNullSafe(F.col("__dom")),
            how="left",
        ).drop("__dom")
    else:
        thresholds = df.agg(agg_fn.alias("__ts"))
        labeled = df.crossJoin(F.broadcast(thresholds))
    # missing thresholds (a group whose every perplexity is NULL) must yield
    # NULL buckets, not the otherwise() label
    bucket = F.when(
        ppl.isNull() | F.col("__ts").isNull(), F.lit(None).cast("string")
    )
    for i in range(len(bounds)):
        bucket = bucket.when(
            ppl <= F.element_at(F.col("__ts"), i + 1), F.lit(labels[i])
        )
    bucket = bucket.otherwise(F.lit(labels[-1]))
    return labeled.withColumn(out_col, bucket).drop("__ts")


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    *,
    compare_cols: list[str],
    emit_unchanged: bool = False,
) -> DataFrame:
    """Change data capture for corpora: classify every document as
    ``added`` / ``removed`` / ``changed`` (/ ``unchanged``) between two
    corpus snapshots — the primitive an INCREMENTAL pipeline keys on (what
    must re-dedupe, re-score, re-shard after an ingest instead of
    reprocessing 100 TB).

    ``compare_cols`` define document identity-of-content: each side is
    reduced map-side to (id, md5 over the per-column md5s), so the
    full-outer join shuffles ~40 bytes per doc per side, never the
    documents. Hashing each column SEPARATELY before combining makes the
    fingerprint injection-proof — a raw separator-joined concat lets a
    value containing the separator shift bytes between columns so distinct
    tuples collide — and NULL is a 4-char marker that can never equal a
    32-char hex digest, so NULL ≠ '' (the usual concat-ws pitfall, both
    halves). Output:
    (id, change, old_fp, new_fp) — fingerprints kept so a consumer can
    route changed docs without recomputing. ``emit_unchanged=True`` keeps
    the (typically dominant) unchanged class; off by default so the result
    is delta-sized, not corpus-sized.
    """
    if not compare_cols:
        raise ValueError("compare_cols must name at least one column")

    def fp(df: DataFrame, alias: str) -> DataFrame:
        # fixed-width parts: md5 per column (32 hex chars) or the 4-char
        # NULL marker — no separator to inject, no width ambiguity
        parts = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
            for c in compare_cols
        ]
        return df.select(
            F.col(id_col).alias("id"),
            F.md5(F.concat(*parts)).alias(alias),
        )

    joined = fp(old_df, "old_fp").join(fp(new_df, "new_fp"), on="id", how="full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select("id", change.alias("change"), "old_fp", "new_fp")
    if not emit_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def _n_tokens_expr(text_col: str, token_count_col: str | None) -> Column:
    """Token-count column for the budget/packing ops: the whitespace
    tokenizer by default, or a PRECOMPUTED count column (e.g.
    ``bpe_encode(output='count')``'s ``n_bpe_tokens``) so budgets, packing
    offsets, and chunk plans are denominated in the REAL training
    vocabulary instead of the regex approximation. NULL counts as zero —
    a NULL must never become a NULL offset that silently fails a filter."""
    if token_count_col is not None:
        return F.coalesce(F.col(token_count_col).cast("long"), F.lit(0))
    return F.coalesce(token_count_expr(F.col(text_col)).cast("long"), F.lit(0))


def sample_token_budget(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    domain_col: str,
    budgets: DataFrame,
    n_buckets: int = 256,
    salt: str = "mixture",
    token_count_col: str | None = None,
) -> DataFrame:
    """Deterministic per-domain token-budget fill — the data-mixture sampler:
    given target token budgets per domain (e.g. web 60%, code 20%, ... of a
    total token count), select documents domain-by-domain in a fixed
    hash-random order until each domain's budget is met.

    ``budgets`` is a small frame (domain_col, budget_tokens).
    ``token_count_col`` switches the budget denomination from the
    whitespace tokenizer to a precomputed count (e.g. ``bpe_encode``'s
    ``n_bpe_tokens`` — budgets in the real training vocabulary). Returns
    the selected documents as (id, domain, n_tokens, doc_start) where
    ``doc_start`` is the document's offset in its domain's fill order; the
    first document to cross the budget is kept (so every non-empty budget
    selects at least one document), all later ones are dropped.

    Scale shape: a naive ``sum() over (partition by domain order by hash)``
    serializes each domain onto one task. Instead the fill order is
    (bucket, hash, id): bucket totals are cumulated on the aggregated
    (domains × n_buckets) frame — broadcast back — and the per-document
    cumsum partitions by (domain, bucket), giving ``n_buckets``-way
    parallelism inside every domain. Selection is identical to the
    single-window formulation, deterministic, and engine-reproducible.
    The broadcast frame is |domains| × ``n_buckets`` rows; with very high
    domain cardinality (millions of fine-grained domains — where per-domain
    fill order hardly matters anyway) lower ``n_buckets`` or drop the
    broadcast hint and let AQE pick the join side.
    """
    # stage the hash as a real column and derive the bucket from it: two
    # independent expression trees would evaluate md5 twice per row unless
    # codegen CSE happens to fire (the file's convention is not to rely on
    # it). NULL text counts as zero tokens — it must not produce a NULL
    # doc_start that silently fails the budget filter.
    base = df.select(
        F.col(id_col),
        F.col(domain_col),
        _n_tokens_expr(text_col, token_count_col).alias("n_tokens"),
        _md5_long_expr(F.col(id_col), salt).alias("__h"),
    ).withColumn("__bucket", F.col("__h") % n_buckets)
    bucket_totals = base.groupBy(domain_col, "__bucket").agg(
        F.sum("n_tokens").alias("__bucket_tokens")
    )
    wb = (
        Window.partitionBy(domain_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucket_starts = bucket_totals.select(
        domain_col,
        "__bucket",
        (F.sum("__bucket_tokens").over(wb) - F.col("__bucket_tokens")).alias(
            "__bucket_start"
        ),
    )
    ww = (
        Window.partitionBy(domain_col, "__bucket")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        base.join(F.broadcast(bucket_starts), on=[domain_col, "__bucket"])
        .withColumn(
            "doc_start",
            F.col("__bucket_start") + F.sum("n_tokens").over(ww) - F.col("n_tokens"),
        )
    )
    return (
        placed.join(F.broadcast(budgets), on=domain_col)
        .filter(F.col("doc_start") < F.col("budget_tokens"))
        .select(id_col, domain_col, "n_tokens", "doc_start")
    )


def _gram_bucket_transform(grams: Column, *, dim: int, salt: str) -> Column:
    """Map an array of gram strings to hashed buckets in [0, dim)."""
    return F.transform(grams, lambda g: _md5_long_expr(g, salt) % dim)


def hashed_gram_buckets_expr(toks: Column, *, dim: int, salt: str = "dsir") -> Column:
    """Hashed unigram+bigram count features over an already-tokenized array:
    every occurrence (multiset, not distinct) mapped to a bucket in
    [0, dim) — the DSIR feature map."""
    grams = F.concat(toks, shingles_from_tokens_expr(toks, 2, distinct=False))
    return _gram_bucket_transform(grams, dim=dim, salt=salt)


DSIR_DEFAULT_BUCKET = -1  # sentinel row carrying the unseen-bucket log-ratio


def dsir_logratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    *,
    dim: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Hashed-n-gram importance log-ratio table (bucket, log_ratio):
    ln p_target(bucket) − ln p_raw(bucket) with add-``alpha`` smoothing over
    all ``dim`` buckets, estimated from a target (in-domain) corpus and the
    raw corpus. Buckets observed in neither corpus share one smoothed ratio,
    emitted as a sentinel row with bucket = :data:`DSIR_DEFAULT_BUCKET`.

    One explode + groupBy(bucket) per corpus (map-side partial agg — the
    shuffle carries ≤ ``dim`` rows per partition); the corpus-total scalars
    ride along via a window over the ≤ ``dim``-row aggregated frame.
    """

    def counts(df: DataFrame, col: str) -> DataFrame:
        # stage tokens as a real column: the grams expression references the
        # token array twice (unigrams + bigram slices), and staging guarantees
        # one tokenization pass per row (see shingles_from_tokens_expr)
        staged = df.select(tokens_expr(F.lower(F.col(text_col))).alias("__toks"))
        return (
            staged.select(
                F.explode(
                    hashed_gram_buckets_expr(F.col("__toks"), dim=dim, salt=salt)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(col))
        )

    return _logratios_from_counts(
        counts(target, "ct"), counts(raw, "cr"), dim=dim, alpha=alpha
    )


def _logratios_from_counts(
    ct: DataFrame, cr: DataFrame, *, dim: int, alpha: float
) -> DataFrame:
    """DSIR log-ratio table from pre-aggregated (bucket, ct) / (bucket, cr)
    histograms — the math tail of :func:`dsir_logratios`, shared with the
    one-pass :func:`curation_gram_signals` (which derives both histograms
    from a single exploded gram frame)."""
    joined = ct.join(cr, on="bucket", how="full").select(
        "bucket",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cr", F.lit(0)).alias("cr"),
    )
    w = Window.partitionBy()
    scored = joined.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(w).alias("nt"),
        F.sum("cr").over(w).alias("nr"),
    )
    denom_t = F.col("nt") + F.lit(alpha * dim)
    denom_r = F.col("nr") + F.lit(alpha * dim)
    ratios = scored.select(
        "bucket",
        (
            F.log((F.col("ct") + F.lit(alpha)) / denom_t)
            - F.log((F.col("cr") + F.lit(alpha)) / denom_r)
        ).alias("log_ratio"),
    )
    # derive the sentinel from a global aggregate — agg over an EMPTY frame
    # still yields exactly one row (sum=NULL→0), so the default exists even
    # when both histograms are empty; built from limit(1) it would vanish
    # and dsir_importance's crossJoin against the empty broadcast would
    # silently wipe every scored row
    totals = joined.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"),
        F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"),
    )
    default = totals.select(
        F.lit(DSIR_DEFAULT_BUCKET).cast("long").alias("bucket"),
        (F.log(F.lit(alpha) / denom_t) - F.log(F.lit(alpha) / denom_r)).alias(
            "log_ratio"
        ),
    )
    return ratios.unionAll(default)


def dsir_importance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    logratios: DataFrame,
    *,
    dim: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR importance log-weight: Σ over hashed-gram
    occurrences of the bucket's log p_target/p_raw. Returns
    (id, n_grams, log_weight); documents with zero grams are dropped
    (no features ⇒ weight undefined). Select by ``log_weight`` top-k or
    a Gumbel-free hash-threshold downstream.

    The log-ratio table is ≤ dim+1 rows → BROADCAST hash join; the corpus
    side never shuffles on the bucket. The table is materialized once
    (it feeds both the join and the sentinel-default lookup); blocks are
    reclaimed by the caller's ``cache.checkpoint_scope``.
    """
    staged = df.select(
        F.col(id_col), tokens_expr(F.lower(F.col(text_col))).alias("__toks")
    )
    exploded = staged.select(
        F.col(id_col),
        F.explode(
            hashed_gram_buckets_expr(F.col("__toks"), dim=dim, salt=salt)
        ).alias("bucket"),
    )
    return _importance_from_exploded(exploded, id_col, logratios)


def _importance_from_exploded(
    exploded: DataFrame, id_col: str, logratios: DataFrame
) -> DataFrame:
    """DSIR importance tail over an already-exploded (id, bucket) occurrence
    frame — shared by :func:`dsir_importance` and the one-pass
    :func:`curation_gram_signals`."""
    from ..cache import eager_localcheckpoint

    logratios, _release = eager_localcheckpoint(logratios)
    default = logratios.filter(F.col("bucket") == DSIR_DEFAULT_BUCKET).select(
        F.col("log_ratio").alias("__default_lr")
    )
    table = logratios.filter(F.col("bucket") != DSIR_DEFAULT_BUCKET)
    scored = (
        exploded.join(F.broadcast(table), on="bucket", how="left")
        .crossJoin(F.broadcast(default))
        .select(
            id_col, F.coalesce(F.col("log_ratio"), F.col("__default_lr")).alias("lr")
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"), F.sum("lr").alias("log_weight")
    )


def doc_feature_counts(
    df: DataFrame, text_col: str, id_col: str, *, dim: int, salt: str = "qlr"
) -> DataFrame:
    """Per-document hashed-gram frequency features: (id, bucket, x) with
    x = occurrences(bucket) / total grams — the normalized bag-of-hashed-
    n-grams both the DSIR weights and the quality classifier consume.
    Documents with zero grams are dropped."""
    staged = df.select(
        F.col(id_col), tokens_expr(F.lower(F.col(text_col))).alias("__toks")
    )
    exploded = staged.select(
        F.col(id_col),
        F.explode(
            hashed_gram_buckets_expr(F.col("__toks"), dim=dim, salt=salt)
        ).alias("bucket"),
    )
    counts = exploded.groupBy(id_col, "bucket").agg(F.count("*").alias("cnt"))
    wdoc = Window.partitionBy(id_col)
    return counts.select(
        id_col,
        "bucket",
        F.col("cnt"),
        (F.col("cnt").cast("double") / F.sum("cnt").over(wdoc)).alias("x"),
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str,
    id_col: str,
    *,
    dim: int = 4096,
    iters: int = 12,
    learn_rate: float = 10.0,
    l2: float = 1e-4,
    salt: str = "qlr",
) -> DataFrame:
    """Logistic-regression quality classifier over hashed n-gram frequency
    features — the standard discriminative corpus-quality filter (curated
    corpus = positive class, raw crawl = negative), trained entirely
    in-engine with full-batch gradient descent.

    The bias is folded in as a constant feature (bucket = −1, x = 1), so
    each iteration is exactly one BROADCAST join of the ≤ dim+1-row weight
    table + a groupBy(doc) margin sum + a groupBy(bucket) gradient sum; only
    the weight vector ever reaches the driver. The feature frame is
    localCheckpoint-materialized once, so the corpus is tokenized/hashed a
    single time regardless of ``iters``; blocks are reclaimed by the
    caller's ``cache.checkpoint_scope``.

    At 100 TB you train on a sample (classifier quality saturates in the
    millions of examples) and score the full corpus with
    :func:`score_quality` — one broadcast join, no shuffle of the corpus.

    Returns the weight table (bucket, weight) with bias at bucket = −1.
    Float-sum reduction order varies across runs, so weights are
    reproducible to ~1e-12 relative, not bit-exact (documented; scoring
    against a FIXED weight table is exactly oracle-replicable).
    """
    from ..cache import eager_localcheckpoint

    pos = positive.select(
        F.col(id_col).alias("did"), F.col(text_col).alias("txt"), F.lit(1.0).alias("y")
    )
    neg = negative.select(
        F.col(id_col).alias("did"), F.col(text_col).alias("txt"), F.lit(0.0).alias("y")
    )
    # disjoint synthetic keys so the same document may appear in both classes
    both = pos.withColumn("did", F.concat(F.lit("p"), F.col("did"))).unionAll(
        neg.withColumn("did", F.concat(F.lit("n"), F.col("did")))
    )
    gram_feats = doc_feature_counts(both, "txt", "did", dim=dim, salt=salt).select(
        "did", "bucket", "x"
    )
    bias_feats = both.select(
        "did", F.lit(-1).cast("long").alias("bucket"), F.lit(1.0).alias("x")
    )
    feats = gram_feats.unionAll(bias_feats).join(both.select("did", "y"), on="did")
    feats, _release = eager_localcheckpoint(feats)
    n_examples = feats.filter(F.col("bucket") == -1).count()

    spark = positive.sparkSession
    weights = {b: 0.0 for b in range(-1, dim)}  # -1 = bias
    for _ in range(iters):
        wdf = spark.createDataFrame(
            list(weights.items()), "bucket long, weight double"
        )
        margins = (
            feats.join(F.broadcast(wdf), on="bucket")
            .groupBy("did", "y")
            .agg(F.sum(F.col("x") * F.col("weight")).alias("wx"))
            .select(
                "did",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("wx"))) - F.col("y")).alias(
                    "err"
                ),
            )
        )
        grad_rows = (
            feats.join(margins, on="did")
            .groupBy("bucket")
            .agg(F.sum(F.col("err") * F.col("x")).alias("g"))
            .collect()
        )
        for r in grad_rows:
            b = int(r["bucket"])
            g = float(r["g"]) / n_examples + (l2 * weights[b] if b != -1 else 0.0)
            weights[b] = weights[b] - learn_rate * g
    return spark.createDataFrame(list(weights.items()), "bucket long, weight double")


def score_quality(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    *,
    dim: int = 4096,
    salt: str = "qlr",
) -> DataFrame:
    """Quality probability per document under a trained (or fixed) weight
    table: sigmoid(bias + Σ w[bucket]·x[bucket]). One broadcast join of the
    ≤ dim+1-row table — the corpus never shuffles on the feature key; at
    100 TB this is the map-side scoring pass after sample-training.
    Returns (id, n_grams, quality_prob)."""
    feats = doc_feature_counts(df, text_col, id_col, dim=dim, salt=salt)
    return _quality_from_features(feats, weights, id_col)


def _quality_from_features(
    feats: DataFrame, weights: DataFrame, id_col: str
) -> DataFrame:
    """Quality-scoring tail over a (id, bucket, cnt, x) feature frame —
    shared by :func:`score_quality` and :func:`curation_gram_signals`."""
    from ..cache import materialize_if_derived

    # trained weight tables carry ``iters`` rounds of lineage and feed two
    # branches (bias + table) — materialize those; a FIXED literal table
    # (the curation row) is already a leaf and skips the copy job
    weights, _release = materialize_if_derived(weights)
    bias = weights.filter(F.col("bucket") == -1).select(
        F.col("weight").alias("__bias")
    )
    table = weights.filter(F.col("bucket") != -1)
    # one pass over the feature frame: margin and gram count together
    wx = (
        feats.join(F.broadcast(table), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0)) * F.col("x")).alias("wx"),
            F.sum("cnt").alias("n_grams"),
        )
    )
    return wx.crossJoin(F.broadcast(bias)).select(
        id_col,
        "n_grams",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("wx") + F.col("__bias"))))).alias(
            "quality_prob"
        ),
    )


def curation_gram_signals(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    *,
    target: Column,
    dim_q: int = 4096,
    salt_q: str = "qlr",
    dim_d: int = 4096,
    salt_d: str = "dsir",
    alpha: float = 1.0,
) -> DataFrame:
    """Quality probability AND DSIR importance log-weight in ONE
    tokenize + gram pass: (id, q_grams, quality_prob, log_weight).

    Run separately, the curation chain's hashed-gram stages tokenize and
    gram-build the corpus FOUR times (quality features, DSIR target
    histogram, DSIR raw histogram, DSIR importance) — at 100 TB that is
    four full map passes whose dominant cost is the tokenization regex and
    gram concat, not the downstream aggregates. Here the corpus is staged
    once (tokens → unigram+bigram gram strings), each gram occurrence is
    hashed into BOTH feature spaces (``salt_q``/``dim_q`` and
    ``salt_d``/``dim_d`` — two md5s over the same gram string), and the
    resulting (id, is_target, bq, bd) occurrence frame is materialized once
    (``localCheckpoint``; 3 longs + 1 bool per gram — far narrower than the
    text it came from). All four aggregates read that frame:

    - raw histogram: groupBy(bd) over every occurrence;
    - target histogram: the same, filtered to ``target`` rows;
    - log-ratio table: :func:`_logratios_from_counts` (the exact
      :func:`dsir_logratios` math);
    - importance + quality: ONE fused groupBy(id) over the occurrence
      frame (r13). Both weight tables are vocabulary-sized broadcasts, so
      each occurrence can carry its quality weight (w[bq], 0 when unseen)
      and its DSIR log-ratio (lr[bd], sentinel default when unseen)
      map-side, and one aggregate produces all three per-doc sums: gram
      count, Σw, Σlr. The quality margin Σ w_b·(cnt_b/total) equals
      (Σ_occurrences w)/total — the per-bucket normalize-then-weight of
      :func:`score_quality` reassociated, identical up to float reduction
      order. The separate tails needed a groupBy(id, bq), a per-doc
      normalization window, TWO per-doc aggregations, and a doc-id join —
      four occurrence-frame exchanges where this needs one
      partial-aggregated groupBy (guide §2.3/§2.4).

    Bucket hashes equal the standalone ops' hashes exactly (same md5-salt
    scheme via :func:`_gram_bucket_transform`), so results match the
    separate-pass composition up to float reduction order — the curation
    driver row's rounding grid + margin test absorb that, as they do for
    any partitioning change (pinned at 1e-9 rtol by
    test_curation_gram_signals_equals_separate_ops)."""
    from ..cache import eager_localcheckpoint, lazy_localcheckpoint, materialize_if_derived

    toks = tokens_expr(F.lower(F.col(text_col)))
    staged = df.select(
        F.col(id_col), target.alias("__target"), toks.alias("__toks")
    )
    grams = F.concat(
        F.col("__toks"), shingles_from_tokens_expr(F.col("__toks"), 2, distinct=False)
    )
    g2 = staged.select(id_col, "__target", grams.alias("__grams"))
    ex = g2.select(
        F.col(id_col),
        F.col("__target"),
        F.explode(
            F.arrays_zip(
                _gram_bucket_transform(F.col("__grams"), dim=dim_q, salt=salt_q).alias("bq"),
                _gram_bucket_transform(F.col("__grams"), dim=dim_d, salt=salt_d).alias("bd"),
            )
        ).alias("z"),
    ).select(id_col, "__target", F.col("z.bq").alias("bq"), F.col("z.bd").alias("bd"))
    ex, _release = eager_localcheckpoint(ex)

    cr = ex.groupBy(F.col("bd").alias("bucket")).agg(F.count("*").alias("cr"))
    ct = (
        ex.filter(F.col("__target"))
        .groupBy(F.col("bd").alias("bucket"))
        .agg(F.count("*").alias("ct"))
    )
    lr = _logratios_from_counts(ct, cr, dim=dim_d, alpha=alpha)
    # lazy: the first consumer (the broadcast-exchange build below) is a
    # full-pass collect of the vocab-sized frame, so the dedicated
    # checkpoint job is free (the doc_perplexity r13 convention)
    lr, _r_lr = lazy_localcheckpoint(lr)
    lr_default = lr.filter(F.col("bucket") == DSIR_DEFAULT_BUCKET).select(
        F.col("log_ratio").alias("__default_lr")
    )
    lr_table = lr.filter(F.col("bucket") != DSIR_DEFAULT_BUCKET).select(
        F.col("bucket").alias("bd"), "log_ratio"
    )

    weights, _r_w = materialize_if_derived(weights)
    bias = weights.filter(F.col("bucket") == -1).select(
        F.col("weight").alias("__bias")
    )
    wtab = weights.filter(F.col("bucket") != -1).select(
        F.col("bucket").alias("bq"), "weight"
    )
    per_id = (
        ex.join(F.broadcast(wtab), on="bq", how="left")
        .join(F.broadcast(lr_table), on="bd", how="left")
        .crossJoin(F.broadcast(lr_default))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("q_grams"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__sw"),
            F.sum(
                F.coalesce(F.col("log_ratio"), F.col("__default_lr"))
            ).alias("log_weight"),
        )
    )
    margin = F.col("__sw") / F.col("q_grams").cast("double") + F.col("__bias")
    return per_id.crossJoin(F.broadcast(bias)).select(
        id_col,
        "q_grams",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("quality_prob"),
        "log_weight",
    )


def packing_efficiency(
    packed: DataFrame,
    *,
    block_tokens: int,
    stream_col: str = "stream",
) -> DataFrame:
    """Packing-efficiency report over :func:`pack_sequences`' placement
    frame: per stream, how full the emitted blocks actually are — the
    number a trainer checks before paying for a 100 TB tokenization run
    whose tail blocks might be mostly padding.

    Exact integer sums only (the no-hashed-doubles convention): n_docs,
    n_tokens, n_blocks = ceil(n_tokens / block_tokens) — NOT a distinct
    count of start-block ids, which undercounts when a document longer
    than a block spans blocks no document starts in — capacity_tokens
    (n_blocks × block_tokens), padding_tokens (capacity − tokens; under
    concat-and-chop only the final block of a stream can be short, so
    0 ≤ padding < block_tokens per stream — the invariant the unit test
    pins). Fill rate = n_tokens / capacity_tokens, one division away.

    One groupBy(stream) over the placement frame — map-side combining,
    |streams| output rows."""
    agg = packed.groupBy(F.col(stream_col).alias("stream")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    n_blocks = F.ceil(F.col("n_tokens") / F.lit(block_tokens)).cast("long")
    return agg.select(
        "stream",
        "n_docs",
        "n_tokens",
        n_blocks.alias("n_blocks"),
        (n_blocks * block_tokens).alias("capacity_tokens"),
        (n_blocks * block_tokens - F.col("n_tokens")).alias("padding_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    stream_col: str,
    block_tokens: int = 2048,
    n_buckets: int | None = None,
    bucket_bounds: list | None = None,
    token_count_col: str | None = None,
) -> DataFrame:
    """Concat-and-chop sequence packing: documents are laid end-to-end per
    stream (ordered by id), and the token stream is cut into fixed
    ``block_tokens`` blocks. Returns each document's block assignment:
    (id, stream, n_tokens, start_offset, block_id, offset_in_block).

    A document whose tokens straddle a boundary belongs to the block where it
    starts (the trainer reads it across the cut — this op computes placement,
    not the split payloads). ``token_count_col`` switches the offset
    denomination from the whitespace tokenizer to a precomputed count
    (e.g. ``bpe_encode``'s ``n_bpe_tokens``).

    ``n_buckets`` enables the ORDER-PRESERVING two-level cumsum (the same
    treatment :func:`sample_token_budget` applies to its fill order): the
    numeric id space is cut into ``n_buckets`` ranges via approxQuantile,
    bucket totals are cumulated on the tiny (streams × buckets) frame and
    broadcast back, and the per-document cumsum partitions by (stream,
    bucket) — so a giant stream is ``n_buckets``-way parallel instead of one
    reducer task. Because bucket boundaries cut the id ORDER, the computed
    offsets are identical to the single-window formulation for ANY boundary
    choice (boundaries only affect parallelism — approxQuantile's run-to-run
    variation is harmless). ``None`` keeps the single window (fine when
    streams are already bucketed upstream).

    Because ANY monotone boundary choice is correct, the bounds are derived
    from a cheap 5% SAMPLE at loose precision (round-6 change: the full-pass
    approxQuantile was one extra corpus scan that tripled the local bench
    cost without changing the answer). Callers that know the id domain can
    pass ``bucket_bounds`` explicitly (e.g. ``range(step, N, step)``) and
    skip the driver action entirely."""
    # NULL text = zero tokens: a NULL count would give the row itself NULL
    # offsets (window SUM skips NULL) — unexplained NULL block assignments
    n_tok = _n_tokens_expr(text_col, token_count_col)
    base = df.select(
        F.col(id_col), F.col(stream_col), n_tok.alias("n_tokens")
    )
    if n_buckets and n_buckets > 1:
        if bucket_bounds is not None:
            bounds = sorted(set(bucket_bounds))
        else:
            fracs = [i / n_buckets for i in range(1, n_buckets)]
            ids = df.select(id_col)
            bounds = sorted(
                set(ids.sample(fraction=0.05, seed=7).approxQuantile(id_col, fracs, 0.1))
            )
            if not bounds:  # sample came back empty (tiny input): full pass is cheap
                bounds = sorted(set(ids.approxQuantile(id_col, fracs, 0.01)))
        if not bounds:  # empty input: nothing to parallelize
            n_buckets = None
    if n_buckets and n_buckets > 1:
        blits = F.array(*[F.lit(b) for b in bounds])
        # one explicit exchange on (stream, bucket) feeds BOTH consumers
        # (bucket totals and the per-doc window) as a ReusedExchange — the
        # token-count projection runs once, below the shuffle. Without it,
        # the groupBy's partial-agg exchange and the window's exchange
        # differ, so Catalyst re-scans the corpus and re-counts tokens for
        # each branch (the r5 bench regression's second half).
        base = base.withColumn(
            "__bucket", F.size(F.filter(blits, lambda b: b <= F.col(id_col)))
        ).repartition(F.col(stream_col), F.col("__bucket"))
        bucket_totals = base.groupBy(stream_col, "__bucket").agg(
            F.sum("n_tokens").alias("__bt")
        )
        wb = (
            Window.partitionBy(stream_col)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bucket_starts = bucket_totals.select(
            stream_col,
            "__bucket",
            (F.sum("__bt").over(wb) - F.col("__bt")).alias("__bstart"),
        )
        ww = (
            Window.partitionBy(stream_col, "__bucket")
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        placed = base.join(
            F.broadcast(bucket_starts), on=[stream_col, "__bucket"]
        ).withColumn(
            "start_offset",
            (
                F.col("__bstart") + F.sum("n_tokens").over(ww) - F.col("n_tokens")
            ).cast("long"),
        )
    else:
        w = (
            Window.partitionBy(stream_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        placed = base.withColumn(
            "start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
        )
    return placed.select(
        id_col,
        stream_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / block_tokens).cast("long").alias("block_id"),
        (F.col("start_offset") % block_tokens).cast("long").alias("offset_in_block"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int = 2048,
    overlap: int = 0,
    carry_cols: tuple[str, ...] = (),
    include_text: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """Context-window chunking: split each document into fixed-size token
    windows with ``overlap`` shared tokens between consecutive chunks — the
    standard pre-packing step for documents longer than a training context.

    Convention (mirrored exactly by the registry's DuckDB oracle): chunk
    ``i`` starts at token ``i * stride`` where ``stride = chunk_tokens -
    overlap``; ``n_chunks = 1 + ceil(max(n_tokens - chunk_tokens, 0) /
    stride)``, so every token is covered, every chunk except possibly the
    last has exactly ``chunk_tokens`` tokens, and the last has at least one
    token past the previous chunk's coverage. Zero-token documents emit no
    chunks (nothing to train on).

    Output grain: one row per (doc, chunk) with ``chunk_idx``,
    ``start_token`` (offset of the chunk's first token within the doc),
    ``n_tokens`` (actual chunk length ≤ chunk_tokens) and ``chunk_md5``
    (md5 of the space-joined chunk tokens — a content witness, so a
    geometry-only bug that slices the wrong tokens is detectable).
    ``include_text=True`` adds the chunk text itself (the payload a real
    pipeline feeds to the tokenizer); off by default so the narrow
    placement frame is what shuffles downstream. ``tokens_col`` chunks a
    PRECOMPUTED token array instead of whitespace-tokenizing ``text_col``
    (e.g. ``bpe_encode(output='tokens')`` — context windows measured in
    the real training vocabulary; ``text_col`` is ignored).

    Scale: map-only — no shuffle at any size. The token array is staged as
    a real column in the projection BELOW the explode, so tokenization runs
    once per document regardless of chunk count (Catalyst does not collapse
    a projection through a Generate); the per-chunk work is an O(chunk)
    array slice. Composes with :func:`pack_sequences` (chunk first, pack
    the chunk grain) for the full sequence-prep path.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    if tokens_col is not None:
        base = df.filter(F.size(F.col(tokens_col)) > 0).select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.col(tokens_col).alias("__toks"),
        )
    else:
        # non-empty gate on the raw text (>=1 token <=> any non-whitespace
        # char): filtering on size(__toks) would get pushed below the
        # projection and re-run the tokenization per row just for the
        # predicate (a plain column reference above has nothing to re-run)
        base = df.filter(F.col(text_col).rlike(r"\S")).select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            tokens_expr(F.col(text_col)).alias("__toks"),
        )
    n = F.size("__toks").cast("long")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + (stride - 1)) / stride
    )
    ch = base.select(
        id_col,
        *carry_cols,
        "__toks",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("__i"),
    )
    start = F.col("__i").cast("long") * stride
    piece = F.slice(F.col("__toks"), (start + 1).cast("int"), F.lit(chunk_tokens))
    out_cols = [
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("__i").cast("long").alias("chunk_idx"),
        start.alias("start_token"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    ]
    if include_text:
        out_cols.append(F.array_join(piece, " ").alias("chunk_text"))
    return ch.select(*out_cols)


def plan_token_budgets(
    df: DataFrame,
    text_col: str,
    *,
    domain_col: str,
    total_tokens: int,
    proportions: dict[str, float],
    token_count_col: str | None = None,
) -> DataFrame:
    """Turn target mixture PROPORTIONS into per-domain token BUDGETS against
    what the corpus actually has — the planning half of
    :func:`sample_token_budget` (which consumes the returned frame).

    Water-filling: each domain wants ``total_tokens × p_d`` (proportions are
    normalized); a domain short of tokens is capped at its available count
    and the shortfall is redistributed across the uncapped domains in
    proportion, iterating until stable (≤ |domains| rounds). Result:
    Σ budgets = min(total_tokens, Σ available over named domains), no budget
    exceeds availability, and uncapped domains stay in the requested ratio.

    One distributed aggregation (per-domain token totals — |domains| rows);
    the fill itself is driver arithmetic on that tiny frame. Returns
    (domain_col, budget_tokens, available_tokens).
    """
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if not proportions or any(p < 0 for p in proportions.values()):
        raise ValueError("proportions must be non-negative and non-empty")
    avail_rows = (
        df.filter(F.col(domain_col).isin(*proportions.keys()))
        .groupBy(domain_col)
        .agg(
            F.coalesce(
                F.sum(_n_tokens_expr(text_col, token_count_col)), F.lit(0)
            ).alias("avail")
        )
        .collect()
    )
    avail = {r[domain_col]: int(r["avail"]) for r in avail_rows}
    for d in proportions:
        avail.setdefault(d, 0)

    budgets = {d: 0 for d in proportions}
    capped: set = set()
    remaining = total_tokens
    while remaining > 0:
        open_w = {d: p for d, p in proportions.items() if d not in capped and p > 0}
        wsum = sum(open_w.values())
        if not open_w or wsum == 0:
            break
        newly_capped = False
        alloc_round = 0
        for d, p in open_w.items():
            want = int(remaining * (p / wsum))
            room = avail[d] - budgets[d]
            take = min(want, room)
            budgets[d] += take
            alloc_round += take
            if budgets[d] >= avail[d]:
                capped.add(d)
                newly_capped = True
        remaining -= alloc_round
        if not newly_capped and alloc_round == 0:
            # integer-rounding tail: hand the remainder out by descending
            # weight across EVERY open domain with room — stopping at the
            # first would strand tokens when its room is smaller than the
            # remainder, breaking the sum-budget invariant by up to
            # |domains|−1 tokens
            for d in sorted(open_w, key=lambda x: (-open_w[x], x)):
                if remaining <= 0:
                    break
                room = avail[d] - budgets[d]
                if room > 0:
                    take = min(remaining, room)
                    budgets[d] += take
                    remaining -= take
            break
    spark = df.sparkSession
    return spark.createDataFrame(
        [(d, budgets[d], avail[d]) for d in sorted(proportions)],
        f"{domain_col} string, budget_tokens long, available_tokens long",
    )


def reweight_mixture(
    df: DataFrame,
    *,
    domain_col: str,
    loss_col: str,
    ref_loss_col: str | None = None,
    rounds: int = 10,
    step: float = 1.0,
    init: "dict[str, float] | None" = None,
    smoothing: float = 1e-3,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing Data
    Mixtures Speeds Up Language Model Pretraining", 2023) reduced to its
    data-engine half: multiplicative-weights updates over per-domain EXCESS
    LOSS. Each round reweights domains by ``exp(step × clipped mean excess
    loss)`` and renormalizes with uniform smoothing — domains where the
    proxy model underperforms the reference gain mixture weight.

    Here the per-example losses are INPUT COLUMNS (e.g. the engine's own
    ``doc_perplexity`` output for the proxy and reference LMs) — the
    training loop that produces them lives outside the data engine, exactly
    as the reference connector leaves model training to consumers. With
    ``ref_loss_col=None`` the reference loss is 0 (raw-loss reweighting).

    Scale: ONE distributed aggregation (per-domain mean excess loss and
    counts — |domains| rows); the ``rounds`` iterations are driver
    arithmetic on that tiny frame, never touching the corpus again — the
    same one-pass-then-plan shape as :func:`plan_token_budgets`. Feed the
    returned weights to :func:`plan_token_budgets` (as proportions) or
    :func:`resample_by_weight` (as log-weights) to realize the mixture.

    Returns (domain_col, n_docs, mean_excess_loss, weight) sorted by domain.
    """
    import math

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    excess = F.col(loss_col) - (
        F.col(ref_loss_col) if ref_loss_col is not None else F.lit(0.0)
    )
    agg = (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(excess).alias("mean_excess_loss"),
        )
        .collect()
    )
    if not agg:
        raise ValueError("empty frame: no domains to reweight")
    if any(r[domain_col] is None for r in agg):
        raise ValueError(
            f"NULL {domain_col} values present — a null domain would "
            f"silently absorb mixture weight; filter or relabel upstream"
        )
    no_loss = [r[domain_col] for r in agg if r["mean_excess_loss"] is None]
    if no_loss:
        raise ValueError(
            f"domains with no non-NULL {loss_col}: {sorted(no_loss)!r} — "
            f"their excess loss is undefined; drop them or fill the losses"
        )
    domains = sorted(r[domain_col] for r in agg)
    stats = {r[domain_col]: (int(r["n_docs"]), float(r["mean_excess_loss"])) for r in agg}
    if init is None:
        w = {d: 1.0 / len(domains) for d in domains}
    else:
        tot = sum(init.get(d, 0.0) for d in domains)
        if tot <= 0:
            raise ValueError("init weights must have positive mass on observed domains")
        w = {d: init.get(d, 0.0) / tot for d in domains}
    u = 1.0 / len(domains)
    for _ in range(rounds):
        # clip at 0: only UNDERperformance (positive excess) gains weight,
        # per the DoReMi objective; exp is bounded by the per-round step
        scores = {d: math.exp(step * max(stats[d][1], 0.0)) for d in domains}
        raw = {d: w[d] * scores[d] for d in domains}
        z = sum(raw.values())
        w = {d: (1.0 - smoothing) * raw[d] / z + smoothing * u for d in domains}
    spark = df.sparkSession
    return spark.createDataFrame(
        [(d, stats[d][0], stats[d][1], w[d]) for d in domains],
        f"{domain_col} string, n_docs long, mean_excess_loss double, weight double",
    )


def _bfd_place(rows, block_tokens: int, oversize: str):
    """The pure best-fit-decreasing core of :func:`pack_bins`: place
    (id, n_tokens) rows into bins of ``block_tokens`` capacity. Sorted by
    (n_tokens desc, id) then best-fit via bisect over sorted residuals —
    a pure function of the input MULTISET (input order is irrelevant).
    Returns [(id, n_tokens, local_bin, offset_in_bin, is_oversize)].
    Property-tested in tests/test_property.py."""
    import bisect

    rows = sorted(((r[0], int(r[1])) for r in rows), key=lambda r: (-r[1], r[0]))
    residuals: list[int] = []
    bin_of_residual: list[int] = []
    fills: dict[int, int] = {}
    next_bin = 0
    out = []
    for rid, nt in rows:
        if nt > block_tokens:
            if oversize == "raise":
                raise ValueError(
                    f"document {rid!r} has {nt} tokens > block_tokens="
                    f"{block_tokens}; pass oversize='own_bin' or chunk first"
                )
            b = next_bin
            next_bin += 1
            out.append((rid, nt, b, 0, True))
            continue
        i = bisect.bisect_left(residuals, nt)
        if i == len(residuals):
            b = next_bin
            next_bin += 1
            fills[b] = 0
            r = block_tokens
        else:
            r = residuals.pop(i)
            b = bin_of_residual.pop(i)
        out.append((rid, nt, b, fills[b], False))
        fills[b] += nt
        r -= nt
        j = bisect.bisect_left(residuals, r)
        residuals.insert(j, r)
        bin_of_residual.insert(j, b)
    return out


def pack_bins(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    stream_col: str | None = None,
    block_tokens: int = 2048,
    token_count_col: str | None = None,
    n_buckets: int = 1,
    oversize: str = "raise",
) -> DataFrame:
    """No-split bin packing (best-fit decreasing): each document is placed
    WHOLE into a block and the block tail is padding — the finetuning/SFT
    packing contract, where an example must never straddle a training
    sequence (compare :func:`pack_sequences`, the pretraining
    concat-and-chop that cuts documents at block boundaries). Returns each
    document's placement: (id, stream, n_tokens, bin_id, offset_in_bin,
    is_oversize).

    Within each (stream, bucket) group, documents are sorted by
    (n_tokens desc, id) and placed by BEST-FIT into the fullest bin that
    still fits (a bisect over sorted residual capacities — O(n log n) per
    group); first-fit-decreasing's 11/9·OPT+1 bin bound applies, and the
    placement is a pure function of the group's (id, n_tokens) multiset —
    deterministic under any partitioning. Docs longer than ``block_tokens``
    follow ``oversize``: 'raise' (default — loud, the truncation decision
    belongs to the caller) or 'own_bin' (flagged singleton bins the
    consumer truncates).

    Scale: bins never span buckets, so the algorithm runs as an
    ``applyInPandas`` over (stream, bucket) hash groups — one shuffle of
    (id, n_tokens) scalars, no token payloads. The approximation cost of
    bucketing is ≤ one partially-filled bin per bucket per stream; pick
    ``n_buckets`` ≈ group-rows / 100k to bound worker memory. Bin ids are
    unique per stream: ``bucket * 2^40 + local_index``."""
    from pyspark.sql.types import StructField, StructType

    if block_tokens < 1:
        raise ValueError("block_tokens must be >= 1")
    if oversize not in ("raise", "own_bin"):
        raise ValueError(f"oversize must be raise|own_bin, got {oversize!r}")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    n_tok = _n_tokens_expr(text_col, token_count_col)
    # single-stream mode exposes a clean "stream" column, not an internal
    # dunder name the caller would have to know about to drop
    scol = stream_col if stream_col is not None else "stream"
    base = df.select(
        F.col(id_col),
        (F.col(stream_col) if stream_col is not None else F.lit("")).alias(scol),
        n_tok.alias("n_tokens"),
        (_md5_long_expr(F.col(id_col), "packbins") % n_buckets).alias("__bucket"),
    )
    in_schema = {f.name: f for f in base.schema.fields}
    out_schema = StructType(
        [
            in_schema[id_col],
            in_schema[scol],
            StructField("n_tokens", in_schema["n_tokens"].dataType),
        ]
    ).add("bin_id", "long").add("offset_in_bin", "long").add("is_oversize", "boolean")

    def place(key, pdf):
        import pandas as pd

        bucket = int(key[1])
        out = _bfd_place(zip(pdf[id_col], pdf["n_tokens"]), block_tokens, oversize)
        stream_val = key[0]
        return pd.DataFrame(
            {
                id_col: [o[0] for o in out],
                scol: [stream_val] * len(out),
                "n_tokens": [o[1] for o in out],
                "bin_id": [bucket * (1 << 40) + o[2] for o in out],
                "offset_in_bin": [o[3] for o in out],
                "is_oversize": [o[4] for o in out],
            }
        )

    return base.groupBy(scol, "__bucket").applyInPandas(place, schema=out_schema)
