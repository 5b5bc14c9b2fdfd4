"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine.

Scale strategy (100 TB):
- **exact**: one shuffle on the content hash (map-side partial agg first);
  survivors = min-id per hash. No driver state.
- **MinHash+LSH**: per-row signature (narrow), explode to (band, band_hash)
  keys, self-join per bucket — the join key space is bands × buckets, so the
  shuffle is bounded by candidate pairs, not n². Skewed buckets (boilerplate
  shingles) are broken by AQE skew-join; verification is per-pair (narrow).
- **SimHash**: per-row 64-bit signature; candidate pairs via band rotation
  (here: exact-signature buckets + verify hamming), same bounded-join shape.
- **n-gram Jaccard**: exact pairwise — only for candidate verification or
  small frames; the LSH variants are the scale path.
- **embedding cosine**: normalized vectors, candidate buckets via
  hyperplane LSH (similarity.py); brute-force pairwise only below ~10⁵ rows.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import eager_localcheckpoint, lazy_localcheckpoint
from .text import (
    normalize_text_expr,
    shingles_from_tokens_expr,
    simhash_expr,
    tokens_expr,
)


def shingles_expr(text: Column, n: int = 3, *, distinct: bool = True) -> Column:
    """Word n-gram shingles (distinct by default; ``distinct=False`` keeps
    every occurrence, e.g. for repetition scoring).

    Built from ``n`` shifted slices of the token array combined with
    ``zip_with`` — NOT ``element_at`` inside a ``transform`` lambda: an outer
    expression referenced in a HOF lambda body is re-evaluated per element,
    which would re-run the regex tokenization O(tokens²) times per document.
    This shape evaluates the tokenization O(n) times per row; when many
    expressions consume the grams, stage the tokens as a real column and use
    :func:`~..ops.text.shingles_from_tokens_expr` instead.
    """
    return shingles_from_tokens_expr(tokens_expr(text), n, distinct=distinct)


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature as ``num_perm`` flat long columns ``h0..h{p-1}``.

    Shape chosen for scale AND for Catalyst: explode shingles → per-shingle
    ``xxhash64(i, shingle)`` → groupBy(id) min-agg. The aggregation is an
    optimizer barrier (downstream band hashing references plain attributes, so
    projection-collapse can't inline the signature expression 64×), partial
    aggregation combines map-side, and the shuffle carries only
    8·num_perm bytes/doc — not the document. Rows with zero shingles drop out
    (they cannot reach any Jaccard threshold > 0).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_expr(F.col(text_col), shingle_n)).alias("shingle"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy("id").agg(*aggs)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-content hash.

    groupBy on the hash = single shuffle with map-side combine; the exchange
    carries the 16-byte BINARY digest (``unhex``), not the 32-char hex
    string — half the claimed shuffle volume at 100 TB; the output column
    converts back to the portable lowercase hex form."""
    h = F.unhex(F.md5(normalize_text_expr(F.col(text_col)))).alias("__h")
    survivors = df.select(h, F.col(id_col)).groupBy("__h").agg(
        F.min(id_col).alias(id_col)
    )
    return survivors.select(
        F.lower(F.hex(F.col("__h"))).alias("content_hash"), F.col(id_col)
    )


def exact_dedup_stream(
    df: DataFrame,
    text_col: str,
    *,
    hash_col: str = "content_hash",
    event_time_col: Optional[str] = None,
    dedup_window: Optional[str] = None,
) -> DataFrame:
    """Streaming exact dedup: emit each normalized-content hash's FIRST
    arrival, suppress every later duplicate — across micro-batches and
    checkpoint restarts (the state lives in the state store). The streaming
    counterpart of :func:`exact_dedup` for continuously ingested corpora;
    first-arrival-wins replaces batch's min-id-wins (a stream can't see the
    future), which is the standard ingestion-dedup contract.

    Scale: state is one row per DISTINCT content hash, keyed by the 16-byte
    hash (hash-partitioned across executors; RocksDB state store spills it
    off-heap). Unbounded corpora should pass ``event_time_col`` +
    ``dedup_window`` (e.g. ``"24 hours"``) to use
    ``dropDuplicatesWithinWatermark`` — duplicates are then only suppressed
    within the watermark horizon, and state is evicted past it. Note the
    horizon is per LATEST sighting, not first: every suppressed duplicate
    refreshes its key's event-time state, so a key that keeps re-arriving
    never expires (exactly the dedup contract you want for hot content);
    eviction runs at micro-batch end with a watermark computed from the
    previous batch's events (see
    test_materialize.test_exact_dedup_stream_watermark_bounds_state).
    """
    if (event_time_col is None) != (dedup_window is None):
        # one without the other is always a mistake: window alone can't find
        # the event-time column, and a lone event_time_col would SILENTLY
        # take the unbounded-state branch the caller believed was windowed
        raise ValueError(
            "event_time_col and dedup_window must be passed together "
            "(watermark-bounded dedup) or both omitted (unbounded state)"
        )
    # state key = the 16-byte binary digest (half the hex string's state
    # volume); output converts back to the portable lowercase hex form
    hashed = df.withColumn(
        hash_col, F.unhex(F.md5(normalize_text_expr(F.col(text_col))))
    )
    if dedup_window is not None:
        deduped = hashed.withWatermark(
            event_time_col, dedup_window
        ).dropDuplicatesWithinWatermark([hash_col])
    else:
        deduped = hashed.dropDuplicates([hash_col])
    return deduped.withColumn(hash_col, F.lower(F.hex(F.col(hash_col))))


def _validate_banding(num_perm: int, bands: int) -> None:
    """(bands, rows) must tile the signature exactly: a remainder silently
    drops trailing permutations (paid for in the min-aggregation, never
    banded — the effective s-curve is not the one tune_minhash_bands
    reasoned about), and bands > num_perm yields rows=0 and a zero-arg
    xxhash64 AnalysisException pointing nowhere near the cause."""
    if bands <= 0 or bands > num_perm or num_perm % bands != 0:
        raise ValueError(
            f"bands must divide num_perm exactly (got num_perm={num_perm}, "
            f"bands={bands}); pick geometry with tune_minhash_bands()"
        )


def _drop_oversized_buckets(
    keys: DataFrame, key_cols: list[str], cap: int | None
) -> DataFrame:
    """Shared LSH bucket cap: drop buckets with more than ``cap`` members
    BEFORE the self-join (an n-member bucket fans out n·(n−1)/2 pairs). The
    left_anti joins on the same key the self-join shuffles on — colocated,
    no extra exchange of the keyed frame."""
    if cap is None:
        return keys
    oversized = (
        keys.groupBy(*key_cols)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > cap)
        .select(*key_cols)
    )
    return keys.join(oversized, on=key_cols, how="left_anti")


def _bucket_pair_candidates(
    keys: DataFrame, key_cols: list[str], *extra_cols: Column
) -> DataFrame:
    """Shared bucket self-join: distinct (id_a < id_b) pairs of ids sharing
    a bucket key. ``extra_cols`` are computed from the aliased sides ``a``/
    ``b`` (e.g. simhash's hamming distance) before the distinct."""
    a, b = keys.alias("a"), keys.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for k in key_cols:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), *extra_cols
        )
        .distinct()
    )


def minhash_signature_expr(shingles: Column, num_perm: int = 64) -> Column:
    """Single-expression MinHash signature (array form). Only for small
    ``num_perm`` in unit tests: at 64 perms the nested-array tree, once
    re-referenced downstream, triggers Catalyst projection-collapse blowup —
    the scale path is :func:`minhash_signature`."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(i), s)))
            for i in range(num_perm)
        ]
    )


def minhash_band_keys(
    sig: DataFrame, *, num_perm: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band, bhash) keys from a flat signature frame (h0..h{p-1}).

    rows per band = num_perm/bands; two docs collide in a band iff that slice
    of signatures matches exactly.
    """
    _validate_banding(num_perm, bands)
    rows = num_perm // bands
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bhash")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    The self-join keys on (band, bhash): shuffle volume is the banded key
    frame (bands × 16 bytes/doc), join fan-out is bounded by bucket sizes —
    near-dup clusters, not n². Skewed buckets (giant dup clusters) are split
    by AQE skew-join. Returns distinct (id_a < id_b) pairs.
    """
    sig = minhash_signature(
        df, text_col, id_col, num_perm=num_perm, shingle_n=shingle_n
    )
    banded = minhash_band_keys(sig, num_perm=num_perm, bands=bands)
    return _bucket_pair_candidates(banded, ["band", "bhash"])


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: DataFrame,
    *,
    shingle_n: int = 3,
    materialize: bool = False,
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard (intersection/union
    sizes as exact ints). ``pairs``: (id_a, id_b).

    ``materialize=True`` localCheckpoints the shingle frame first: the frame
    joins twice (a- and b-side), so without it the tokenize+shingle subtree
    — the verify's dominant cost — runs twice over ``df``. Pass it when
    ``df`` is already the candidate sliver (bounded); leave off when ``df``
    is a big corpus whose scan should stream through the joins."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_expr(F.col(text_col), shingle_n).alias("sh")
    )
    if materialize:
        sh = eager_localcheckpoint(sh)[0]
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        pairs.join(a, pairs.id_a == F.col("a.id"))
        .join(b, pairs.id_b == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("a.sh", "b.sh")).alias("inter_size"),
            F.size(F.array_union("a.sh", "b.sh")).alias("union_size"),
        )
    )


def _hashed_shingle_array(text: Column, shingle_n: int) -> Column:
    """THE hashed-shingle recipe, array form: each shingle string hashed
    ONCE to a 64-bit key, set semantics on the hashed key (array_distinct
    AFTER hashing: shingle strings are already distinct, but a 64-bit
    collision would otherwise double-count one shash in n_sh AND in the
    intersection join). One definition — :func:`_hashed_shingles` explodes
    it for the batch groupBy path and :func:`minhash_dedup_stream` consumes
    it row-local — so the batch and streaming bucket recipes cannot drift
    (the `_md5_long_expr` convention)."""
    return F.array_distinct(
        F.transform(shingles_expr(text, shingle_n), lambda s: F.xxhash64(s))
    )


def _perm_hash(i: int, key: Column) -> Column:
    """The per-permutation scalar recipe ``xxhash64(lit(i), key)`` — shared
    by the batch aggregate (:func:`_sig_from_hashed`) and the row-local
    array form (:func:`_perm_min_cols`) so the two signature paths cannot
    drift."""
    return F.xxhash64(F.lit(i), key)


def _perm_min_cols(shashes: Column, num_perm: int) -> list:
    """Per-permutation minima h0..h{p-1} over a hashed-shingle ARRAY — the
    row-local twin of :func:`_sig_from_hashed`'s exploded ``F.min`` (same
    :func:`_perm_hash` recipe, so a doc's signature is identical whichever
    path computed it)."""
    return [
        F.array_min(F.transform(shashes, lambda x: _perm_hash(i, x))).alias(f"h{i}")
        for i in range(num_perm)
    ]


def _hashed_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(id, shash): :func:`_hashed_shingle_array` exploded to one row per
    distinct hashed shingle — the batch groupBy form."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(_hashed_shingle_array(F.col(text_col), shingle_n)).alias("shash"),
    )


def _sig_from_hashed(sh: DataFrame, num_perm: int) -> DataFrame:
    """Per-doc MinHash signature (h0..h{p-1}) + shingle-set size ``n_sh``
    from a hashed-shingle frame: per-permutation hashes are hash-of-hash on
    the 64-bit key (an equally valid min-wise family, far cheaper than
    re-hashing the string num_perm times)."""
    aggs = [F.count("*").alias("n_sh")] + [
        F.min(_perm_hash(i, F.col("shash"))).alias(f"h{i}") for i in range(num_perm)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold_num: int = 4,
    threshold_den: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    materialize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidates + exact verification at jaccard ≥ num/den
    (integer compare — no float thresholds).

    ``max_bucket_size`` caps LSH bucket membership: buckets larger than the
    cap are dropped BEFORE the self-join. An n-member bucket fans out to
    n·(n−1)/2 candidate pairs, so one boilerplate cluster (a million copies
    of the same cookie banner) turns the join into ~10¹² pairs that AQE can
    split but not shrink. Oversized buckets are near-certain exact/near-exact
    duplicate clusters — collapse those with exact dedup FIRST (cheaper and
    lossless), then run MinHash with a cap (10–100× the expected near-dup
    cluster size) as the backstop. Recall loss is confined to pairs whose
    EVERY shared band lands in an oversized bucket. Default ``None`` = off.

    Each shingle string is hashed ONCE to a 64-bit key; the per-permutation
    hashes are hash-of-hash on that long (an equally valid min-wise family,
    and far cheaper than re-hashing the string 64×). The narrow
    (id, shash) frame — 16 bytes/row — is materialized with
    ``localCheckpoint`` so tokenization+shingling runs a single time; the
    signature aggregation, the candidate self-join, and BOTH sides of the
    intersection-count verify read the materialized frame instead of
    re-scanning and re-tokenizing the corpus (3 extra full passes at 100 TB).
    Verification joins on the long key, never on shingle strings, so strings
    never travel through a shuffle. union = |A| + |B| − inter.
    """
    sh = _hashed_shingles(df, text_col, id_col, shingle_n)
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    sig = _sig_from_hashed(sh, num_perm)
    if materialize:
        # the signature frame (8·num_perm bytes/doc) feeds banding AND the
        # size lookup; materializing it runs the 64-min aggregation once
        sig = sig.localCheckpoint(eager=True)
    banded = minhash_band_keys(sig, num_perm=num_perm, bands=bands)
    banded = _drop_oversized_buckets(banded, ["band", "bhash"], max_bucket_size)
    cand = _bucket_pair_candidates(banded, ["band", "bhash"])
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cand.join(a, cand.id_a == F.col("a.id"))
        .join(b, (cand.id_b == F.col("b.id")) & (F.col("a.shash") == F.col("b.shash")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter_size"))
    )
    sizes = sig.select("id", "n_sh")
    verified = (
        inter.join(sizes.alias("sa"), inter.id_a == F.col("sa.id"))
        .join(sizes.alias("sb"), inter.id_b == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            "inter_size",
            (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter_size")).alias("union_size"),
        )
    )
    return verified.filter(
        F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
    ).select("id_a", "id_b", "inter_size", "union_size")


def minhash_cross_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold_num: int = 4,
    threshold_den: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    materialize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-frame MinHash-LSH near-dup pairs: ``new_df`` against
    ``corpus_df`` — the **incremental-ingest** shape (today's crawl vs the
    standing corpus, or an eval set vs training data at the fuzzy-match
    tier above :func:`~..pipeline.decontaminate`'s exact hashed-gram
    semi-join). Returns (new_id, corpus_id, inter_size, union_size) at
    exact shingle-Jaccard ≥ threshold_num/threshold_den; dropping matched
    new docs is one ``left_anti`` join for the caller.

    Same geometry as :func:`minhash_dedup_pairs` — a doc's signature and
    band keys depend only on its text and the knobs, never on which frame
    it sits in, so with equal knobs the cross candidates are EXACTLY the
    self-join candidates of the union restricted to cross pairs (pinned by
    tests/test_ops.py::test_minhash_cross_pairs_match_self_join): the
    s-curve recall tune_minhash_bands() reasons about carries over
    unchanged. The join is new-banded × corpus-banded on (band, bhash) —
    a pure equi-join, never n_new × n_corpus: only 16-byte keyed rows and
    (id, shash) longs shuffle, strings never leave the scan stage.

    Scale notes: ``max_bucket_size`` caps EACH side's bucket membership
    separately before the join (cross fan-out per bucket is
    n_new × n_corpus; capping both sides bounds the product — boilerplate
    lives on either side of an ingest boundary). At 100 TB the corpus
    side's (id, shash) + signature frames are computed once per corpus
    snapshot and persisted columnar (see ops/layout.py); this function
    recomputes them from raw text because its surface is raw-text frames —
    the banding/verify stages are indifferent to where ``sh``/``sig``
    came from. Ids need not be disjoint across frames: pairs are keyed
    (new_id, corpus_id), and a doc present verbatim on both sides returns
    as its own (trivially jaccard-1) match — exactly what an ingest
    dedup wants to catch."""
    sh_n = _hashed_shingles(new_df, text_col, id_col, shingle_n)
    sh_c = _hashed_shingles(corpus_df, text_col, id_col, shingle_n)
    if materialize:
        # each side feeds its signature aggregation AND one side of the
        # intersection verify: tokenize+shingle once per side, not twice
        sh_n = sh_n.localCheckpoint(eager=True)
        sh_c = sh_c.localCheckpoint(eager=True)
    sig_n = _sig_from_hashed(sh_n, num_perm)
    sig_c = _sig_from_hashed(sh_c, num_perm)
    if materialize:
        sig_n = sig_n.localCheckpoint(eager=True)
        sig_c = sig_c.localCheckpoint(eager=True)
    banded_n = _drop_oversized_buckets(
        minhash_band_keys(sig_n, num_perm=num_perm, bands=bands),
        ["band", "bhash"],
        max_bucket_size,
    )
    banded_c = _drop_oversized_buckets(
        minhash_band_keys(sig_c, num_perm=num_perm, bands=bands),
        ["band", "bhash"],
        max_bucket_size,
    )
    cand = (
        banded_n.select(F.col("id").alias("new_id"), "band", "bhash")
        .join(
            banded_c.select(F.col("id").alias("corpus_id"), "band", "bhash"),
            on=["band", "bhash"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    a, b = sh_n.alias("a"), sh_c.alias("b")
    inter = (
        cand.join(a, cand.new_id == F.col("a.id"))
        .join(b, (cand.corpus_id == F.col("b.id")) & (F.col("a.shash") == F.col("b.shash")))
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").alias("inter_size"))
    )
    sizes_n = sig_n.select("id", "n_sh")
    sizes_c = sig_c.select("id", "n_sh")
    verified = (
        inter.join(sizes_n.alias("sa"), inter.new_id == F.col("sa.id"))
        .join(sizes_c.alias("sb"), inter.corpus_id == F.col("sb.id"))
        .select(
            "new_id",
            "corpus_id",
            "inter_size",
            (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter_size")).alias("union_size"),
        )
    )
    return verified.filter(
        F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
    ).select("new_id", "corpus_id", "inter_size", "union_size")


MINHASH_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("dup_of", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
    ]
)

# coarse-slot state: each (band, slot) group folds MANY buckets — parallel
# arrays keyed positionally (bhash → first arrival id → last-touch clock).
# One UnsafeRow per group; per-bucket entries are pruned inside the fold
# when idle_ttl_ms is set, and the whole group times out when EVERY bucket
# in it has been idle past the TTL (group timeout fires only on no-input).
_MINHASH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bhashes", T.ArrayType(T.LongType(), False), False),
        T.StructField("first_ids", T.ArrayType(T.LongType(), False), False),
        T.StructField("last_seen", T.ArrayType(T.LongType(), False), False),
    ]
)


def _slot_first_arrival(
    key: tuple,
    pdf_iter: Iterator,
    state,
    idle_ttl_ms: int | None = None,
) -> Iterator:
    """Per-(band, slot) state fold over MANY LSH buckets at once: remember
    each bucket's FIRST arrival; report every other member as its candidate
    duplicate. Within one micro-batch the winner is the minimum id (batch
    minhash's min-id convention — arrival order inside a batch is not
    observable).

    Why coarse: keying state by (band, bhash) opens ONE Python call per
    non-empty bucket per micro-batch — bands × |docs| ≈ 40k interpreter
    calls for a sf0.1 bootstrap batch, and the per-group call overhead (not
    the fold itself) was 6× the batch twin's entire wall. Re-keying to
    (band, pmod(bhash, slots)) bounds Python calls per micro-batch at
    bands × slots regardless of bucket count; the per-bucket fold runs
    vectorized (numpy lexsort + boundary masks) inside each call."""
    import numpy as np
    import pandas as pd

    if idle_ttl_ms is not None and state.hasTimedOut:
        # every bucket in this slot idle past the TTL: drop the slot; later
        # arrivals start fresh buckets (the bounded-state trade the operator
        # documents)
        state.remove()
        return
    chunks = [c for c in pdf_iter if len(c)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    if state.exists:
        st_bh, st_id, st_seen = state.get
        known = dict(zip(st_bh, st_id))
        seen = dict(zip(st_bh, st_seen))
    else:
        known, seen = {}, {}
    now = 0
    if idle_ttl_ms is not None:
        now = int(state.getCurrentProcessingTimeMs())
        if known:
            # per-bucket eviction INSIDE a live slot: the group timeout only
            # fires when the whole slot is idle, so stale buckets sharing a
            # slot with active ones are pruned here
            cutoff = now - idle_ttl_ms
            for b in [b for b, t in seen.items() if t < cutoff]:
                del known[b], seen[b]
    # vectorized bucket fold: sort rows by (bhash, id), mark bucket starts
    bhs = pdf["bhash"].to_numpy()
    ids = pdf["id"].to_numpy()
    order = np.lexsort((ids, bhs))
    bhs, ids = bhs[order], ids[order]
    uniq = np.empty(len(bhs), dtype=bool)
    uniq[0] = True
    np.logical_or(bhs[1:] != bhs[:-1], ids[1:] != ids[:-1], out=uniq[1:])
    bhs, ids = bhs[uniq], ids[uniq]  # distinct (bucket, id), id-sorted
    starts = np.empty(len(bhs), dtype=bool)
    starts[0] = True
    starts[1:] = bhs[1:] != bhs[:-1]
    # winner per bucket: state's first arrival if known, else the batch min
    batch_bh = bhs[starts]
    batch_min = ids[starts]
    winners = np.array(
        [known.get(int(b), int(m)) for b, m in zip(batch_bh, batch_min)],
        dtype=np.int64,
    )
    for b, w in zip(batch_bh, winners):
        known[int(b)] = int(w)
        if idle_ttl_ms is not None:
            seen[int(b)] = now
    state.update(
        (
            list(known.keys()),
            list(known.values()),
            list(seen.values()) if idle_ttl_ms is not None else [0] * len(known),
        )
    )
    if idle_ttl_ms is not None:
        state.setTimeoutDuration(idle_ttl_ms)
    # dup rows = every (bucket, id) whose id is not the bucket's winner
    winner_per_row = np.repeat(winners, np.diff(np.flatnonzero(
        np.append(starts, True))))
    dup_mask = ids != winner_per_row
    if not dup_mask.any():
        # yield NOTHING: most slots emit nothing most batches, and an empty
        # yield still pays pandas construction + an Arrow batch per group
        return
    yield pd.DataFrame(
        {
            "id": ids[dup_mask],
            "dup_of": winner_per_row[dup_mask],
            "band": np.int32(key[0]),
        },
        columns=[f.name for f in MINHASH_STREAM_SCHEMA.fields],
    )


def minhash_dedup_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    idle_ttl_ms: int | None = None,
    state_slots: int = 64,
) -> DataFrame:
    """Streaming fuzzy dedup: MinHash-LSH CANDIDATE duplicates of a
    continuously ingested corpus, first-arrival-wins — the streaming
    counterpart of :func:`minhash_lsh_candidates`, as
    :func:`exact_dedup_stream` is to :func:`exact_dedup`.

    Output (append, candidate grain): one row per (later-arriving doc,
    colliding band) with ``dup_of`` = the bucket's first arrival. A doc is a
    candidate near-duplicate iff it appears at least once; consumers
    ``distinct()`` on (id) for a drop list or on (id, dup_of) for
    attribution edges. Precision is LSH-bucket precision: exact Jaccard
    verification needs the shingle sets, which a bounded streaming state
    cannot hold — run :func:`jaccard_pairs`/:func:`minhash_cross_pairs`
    batch-side over the flagged sliver when exactness matters (it is
    candidate-count-sized, not corpus-sized).

    Signature parity — with the HASHED family (:func:`minhash_dedup_pairs`'
    candidate stage), not :func:`minhash_lsh_candidates`: shingle hashing
    and the per-permutation minima are literally shared expressions
    (:func:`_hashed_shingle_array`, :func:`_perm_min_cols` — the same
    ``xxhash64(lit(i), shash)`` recipe :func:`_sig_from_hashed` aggregates),
    so a doc's buckets are identical batch vs stream and every emitted
    (id, dup_of) pair is a hashed-family batch candidate pair at equal
    knobs (pinned by tests/test_materialize.py). ``minhash_lsh_candidates``
    hashes the shingle STRING per permutation — a different (equally valid)
    min-wise family with different buckets; don't mix the two when
    verifying stream output batch-side. Docs with no shingles (shorter
    than ``shingle_n`` tokens) are excluded, exactly as the batch groupBy
    drops them. The hashed-shingle array is built UNDER a ``shuffle()``
    optimizer fence (non-deterministic, so the tokenize+shingle+hash
    subtree is evaluated exactly once per row: CollapseProject cannot
    inline it into the per-permutation minima and the empty-shingle
    filter's size() predicate cannot be pushed below it — each re-ran the
    subtree; batch materializes with localCheckpoint instead, which a
    stream cannot). The array order the fence scrambles is consumed only
    by order-invariant min folds, so no output value ever observes the
    non-determinism.

    Scale: state is ONE (bhash, first_id, last_seen) entry per distinct
    non-empty bucket — ≤ bands × |docs| × 24 bytes total — but the state
    KEY is the coarse (band, pmod(bhash, ``state_slots``)), so Python
    interpreter calls per micro-batch are bounded at bands × state_slots
    regardless of how many buckets a batch touches (keying by bucket opened
    bands × |docs| calls on a bootstrap batch and the per-call overhead was
    6× the batch twin's whole wall at sf0.1; the coarse fold runs the same
    first-arrival semantics vectorized in numpy). Slots hash-partition
    across executors and spill via RocksDB like any state; size
    ``state_slots`` ≥ cluster cores so every state partition carries work —
    each slot's row holds |buckets|/(bands × slots) entries, so raise slots
    on large corpora to keep per-row state small (entries per slot, not
    total state, is the knob's trade). **``state_slots`` is
    CHECKPOINT-INVARIANT** (like the id type above): the value is baked
    into every checkpointed state key as ``pmod(bhash, slots)``, so
    resuming an existing checkpoint with a different value silently
    mismatches buckets to slots — previously-seen buckets look new
    (missed duplicates) while their stale entries linger in the wrong
    slot until TTL. Pick it from the target CORPUS/state size, write it
    down with the checkpoint, and never derive it from cluster size
    (``defaultParallelism``-style autosizing breaks the first resume on
    different hardware; a fresh checkpoint is the only safe way to change
    it). ``idle_ttl_ms`` (ProcessingTimeTimeout,
    same convention as materialize_stream) evicts buckets idle past the TTL
    so state tracks the active horizon on unbounded streams — per-bucket
    entries are pruned inside live slots, and a fully-idle slot is dropped
    by the group timeout; after an eviction a re-arriving bucket starts
    fresh, so duplicates are only suppressed within the TTL horizon (the
    dropDuplicatesWithinWatermark trade).

    TTL + ``Trigger.AvailableNow`` caveat: with ProcessingTimeTimeout the
    stateful operator reports ``shouldRunAnotherBatch`` on every batch, so
    an AvailableNow query schedules empty timer micro-batches forever and
    never terminates. On a continuous trigger (the operator's intended
    deployment) that is exactly the desired timer behavior; for bounded
    drains set ``spark.sql.streaming.noDataMicroBatches.enabled=false`` —
    timers still fire in every data batch, which is when state actually
    grows and eviction matters.
    """
    _validate_banding(num_perm, bands)
    from pyspark.sql import types as _T

    if state_slots < 1:
        raise ValueError(f"state_slots must be >= 1, got {state_slots}")
    # the per-bucket state entry is FIXED (longs per bucket) and baked
    # into checkpoints — non-integral ids can't ride it; fail loudly instead
    # of silently NULLing (or ANSI-killing) every id at the cast below.
    # Scale-0 decimals up to precision 18 fit a long losslessly (the common
    # unsigned-bigint decode shape here) and stay accepted.
    id_type = df.schema[id_col].dataType
    lossless = isinstance(
        id_type, (_T.LongType, _T.IntegerType, _T.ShortType, _T.ByteType)
    ) or (
        isinstance(id_type, _T.DecimalType)
        and id_type.scale == 0
        and id_type.precision <= 18
    )
    if not lossless:
        raise ValueError(
            f"minhash_dedup_stream requires an integral {id_col!r} (state "
            f"holds one long per bucket); got {id_type.simpleString()} — map "
            f"ids to longs upstream (e.g. xxhash64) or use the batch "
            f"minhash_dedup_pairs, which carries any id type"
        )
    # JVM-side optimizer fence (r11, ex Arrow identity seam): `shuffle()` is
    # non-deterministic, so CollapseProject cannot inline the
    # tokenize+shingle+hash subtree into downstream references and the
    # empty-shingle filter cannot be pushed below the projection (either
    # would re-run the subtree; the pushed size() predicate alone doubled
    # it). The array's ORDER is irrelevant everywhere downstream — the
    # per-permutation minima are order-invariant folds — so the
    # non-determinism never reaches an output value, task retries included.
    # Costs nothing (an in-place Fisher-Yates on an already-built array) and
    # keeps the whole stage in codegen, vs. the Arrow round trip of the old
    # mapInPandas identity barrier.
    sh = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.shuffle(_hashed_shingle_array(F.col(text_col), shingle_n)).alias(
            "shashes"
        ),
    )
    sh = sh.filter(F.size("shashes") > 0)
    sig = sh.select("id", *_perm_min_cols(F.col("shashes"), num_perm))
    banded = minhash_band_keys(sig, num_perm=num_perm, bands=bands)

    def process(key, pdf_iter, state):
        return _slot_first_arrival(key, pdf_iter, state, idle_ttl_ms=idle_ttl_ms)

    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    # coarse state key: Python calls per micro-batch are bounded at
    # bands × state_slots, never at |touched buckets| (bhash is already a
    # 64-bit hash, so pmod spreads slots uniformly)
    banded = banded.withColumn(
        "slot", F.pmod(F.col("bhash"), F.lit(int(state_slots)))
    )
    return banded.groupBy("band", "slot").applyInPandasWithState(
        process,
        outputStructType=MINHASH_STREAM_SCHEMA,
        stateStructType=_MINHASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    materialize: bool = True,
    max_prefix_df: int | None = None,
) -> DataFrame:
    """EXACT Jaccard-threshold pairs at scale via prefix filtering (the
    AllPairs/PPJoin principle) — same output as the brute-force all-pairs
    join, no cartesian product, no recall loss.

    Guarantee: order every document's distinct shingles by one global total
    order (ascending document frequency, rare first — ties broken by the
    shingle's 64-bit hash); if J(A,B) ≥ τ then the two prefixes of length
    |X| − ⌈τ·|X|⌉ + 1 must share a shingle, so an equi-join on prefix
    shingles finds every qualifying pair. Three exact prunes stack on top:
    the length filter (τ·|A| ≤ |B| ≤ |A|/τ), PPJoin's POSITIONAL filter
    (r11), and the final exact intersection/union verify. Shuffles: one
    groupBy for shingle frequencies, one per-doc aggregation, one equi-join
    on (rare) prefix shingles — rare shingles keep the join's per-key
    fan-out small by construction.

    Positional filter (exact — Xiao et al.'s PPJoin, public algorithm):
    J ≥ τ forces the overlap O ≥ α = ⌈τ·(|A|+|B|)/(1+τ)⌉. The pair's FIRST
    shared prefix entry, at 0-based positions (i, j) of the two docs'
    globally-ordered shingle lists, is also the first shared entry OVERALL
    (any earlier common shingle is rarer, hence inside both prefixes,
    contradicting firstness — the argument survives ``max_prefix_df``
    because capped-away entries are never rarer than surviving ones), and
    every common shingle sits at or after it in BOTH lists, so
    O ≤ 1 + min(|A|−1−i, |B|−1−j); pairs whose bound undershoots α are
    dropped before the verify. The per-pair (min i, min j) aggregation
    REPLACES the candidate distinct — same shuffle, strictly fewer
    verified pairs (measured ~2x fewer on phrase-dense synthetic text).

    ``max_prefix_df`` caps the document frequency of PREFIX entries (the
    ``winnow_match_pairs`` ``max_doc_freq`` / minhash ``max_bucket_size``
    convention): entries with dfreq above the cap are dropped from the
    prefix (never from the verify sets), so mid-frequency boilerplate
    n-grams — common enough to pair up thousands of unrelated docs, rare
    enough to rank inside τ-length prefixes — stop generating candidates.
    Recall loss is confined to pairs whose EVERY shared shingle has
    dfreq > cap; Default ``None`` = off (exact).

    Every shingle is hashed ONCE to a 64-bit key map-side and the whole
    pipeline — frequency counts, prefix ordering, candidate join, and the
    intersection/union verify — runs on longs: shingle STRINGS never enter
    a shuffle (~10× narrower for word 3-grams), the same treatment as
    MinHash verification and hashed decontamination. The prefix-filter
    guarantee only needs SOME global total order, so ordering by (dfreq,
    hash) instead of (dfreq, string) is equally valid; results equal the
    string-based brute force up to 64-bit collisions.

    The verify joins EXPLODED (id, shingle) longs and partial-aggregates
    the per-pair match count before anything shuffles (r11 — the
    minhash_dedup_pairs verify shape). The previous formulation attached
    each side's full shingle ARRAY to every candidate pair and took the
    intersection per pair: fast when candidates are sparse, but the
    per-pair ~3 KB payloads made intermediate volume ∝ pairs × |doc|, and
    the 100x scale smoke measured that spill outgrowing a whole machine's
    scratch disk on clique-dense data. The exploded shape pays more CPU on
    the (pair × matching shingle) stream but its disk/memory footprint is
    bounded by the narrow exploded frames — the trade a 1000-executor run
    wants.

    Documents with no shingles (< n tokens) vacuously satisfy 0 ≥ τ·0 and
    are paired among themselves, matching the brute-force semantics.

    The hashed-shingle frame is consumed by SIX plan branches (the
    frequency explode, both prefix join sides, both verify sides, the
    empty-doc pair): ``materialize=True`` localCheckpoints it once so the
    tokenize+shingle+hash pass runs a single time instead of per branch —
    the same shape as :func:`minhash_dedup_pairs` /
    :func:`simhash_near_dup_pairs` (~1.5× at sf0.1; materializing the
    prefix frame too measured WORSE — its barrier costs more than the one
    saved groupBy chain).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                shingles_expr(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)
            )
        ).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    nonempty = sh.filter(F.col("sz") > 0)
    ex = nonempty.select("id", "sz", F.explode("sh").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    # prefix length p = sz − ⌈τ·sz⌉ + 1 (integer-exact for τ = num/den)
    p = (
        F.col("sz")
        - F.expr(f"(({threshold_num} * sz + {threshold_den} - 1) div {threshold_den})")
        + F.lit(1)
    )
    prefix = (
        ex.join(freq, "shingle")
        .groupBy("id", "sz")
        .agg(F.array_sort(F.collect_list(F.struct("dfreq", "shingle"))).alias("ordered"))
        .select(
            "id",
            "sz",
            # 0-based position in the FULL globally-ordered list (the slice
            # keeps the first p entries, so slice positions ARE list
            # positions) — the positional filter's input
            F.posexplode(F.slice(F.col("ordered"), F.lit(1), p)).alias(
                "pos", "entry"
            ),
        )
    )
    if max_prefix_df is not None:
        # cap AFTER posexplode so surviving entries keep their true
        # positions in the full ordered list
        prefix = prefix.filter(F.col("entry.dfreq") <= max_prefix_df)
    prefix = prefix.select(
        "id", "sz", "pos", F.col("entry.shingle").alias("shingle")
    )
    a = prefix.select(
        F.col("id").alias("id_a"), F.col("sz").alias("psz_a"),
        F.col("pos").alias("pos_a"), "shingle",
    )
    b = prefix.select(
        F.col("id").alias("id_b"), F.col("sz").alias("psz_b"),
        F.col("pos").alias("pos_b"), "shingle",
    )
    # per-pair (min pos_a, min pos_b) lands on the SAME first shared entry
    # (common entries are co-monotone in both lists under one global
    # order); the aggregation replaces the candidate distinct — same
    # partial-aggregated shuffle, positional prune for free
    alpha = F.expr(
        f"(({threshold_num} * (sa + sb) + {threshold_num + threshold_den} - 1)"
        f" div {threshold_num + threshold_den})"
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # exact length filter: J ≥ τ forces τ|A| ≤ |B| and τ|B| ≤ |A|
            & (F.col("psz_a") * threshold_num <= F.col("psz_b") * threshold_den)
            & (F.col("psz_b") * threshold_num <= F.col("psz_a") * threshold_den)
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.min("pos_a").alias("i"), F.min("pos_b").alias("j"),
            F.min("psz_a").alias("sa"), F.min("psz_b").alias("sb"),
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("sa") - 1 - F.col("i"), F.col("sb") - 1 - F.col("j")
            )
            >= alpha
        )
        .select("id_a", "id_b")
    )
    # Verify on EXPLODED longs with a partial-aggregated count — the
    # minhash_dedup_pairs verify shape — never on per-pair array payloads:
    # joining the (id, sh ARRAY) frame onto candidate pairs duplicates each
    # doc's full ~3 KB shingle array once per pair per side, and the r11
    # 100x scale smoke measured that intermediate outgrowing a whole
    # machine's scratch disk (50x/500k docs aborted on spill) while this
    # formulation's heavy (pair × matching-shingle) stream collapses
    # map-side into (pair, count) rows before anything shuffles. Candidates
    # share ≥1 prefix shingle by construction, so the inner intersection
    # join loses no pair.
    # The second join's equi keys are EXPLICIT via a USING join on
    # (id_b, shingle) — expressed as separate conjuncts the planner can key
    # on id alone and demote the shingle equality to a post-join filter,
    # which explodes the intermediate to pairs × |A| × |B| (measured: 46 GB
    # of shuffle at 50k docs). shuffle_hash on the corpus side: the
    # (pair × A-shingle) stream is the big input, and a SortMergeJoin would
    # SORT it — the dominant scratch-disk consumer at 250k+ docs. A
    # shuffled hash join builds its map from the bounded exploded-corpus
    # partitions and STREAMS the pair side unsorted, so nothing
    # pair-proportional ever sorts or spills.
    lhs = cand.join(ex.alias("ia"), cand.id_a == F.col("ia.id")).select(
        "id_a", "id_b", F.col("ia.shingle").alias("shingle")
    )
    rhs = ex.select(F.col("id").alias("id_b"), "shingle").hint("shuffle_hash")
    inter_counts = (
        lhs.join(rhs, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter_size"))
    )
    sizes = nonempty.select("id", "sz")
    verified = (
        inter_counts.join(sizes.alias("sa"), inter_counts.id_a == F.col("sa.id"))
        .join(sizes.alias("sb"), inter_counts.id_b == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            "inter_size",
            (F.col("sa.sz") + F.col("sb.sz") - F.col("inter_size")).alias(
                "union_size"
            ),
        )
        .filter(F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num)
    )
    # empty-shingle docs (< n tokens) pair among themselves. This is the one
    # non-equi join in the plan, over two inputs already filtered to the
    # (normally empty) short-doc set — broadcastable by construction; real
    # pipelines drop such docs before dedup anyway
    ea = sh.filter(F.col("sz") == 0).select(F.col("id").alias("id_a"))
    eb = sh.filter(F.col("sz") == 0).select(F.col("id").alias("id_b"))
    # explicit broadcast: without it, large-corpus size ESTIMATES of the
    # (actually tiny, normally empty) short-doc side degrade the non-equi
    # join from BNLJ to a CartesianProduct node (observed at 500k docs —
    # 0 rows executed, but a cartesian in the plan is the wrong shape)
    empty_pairs = ea.join(F.broadcast(eb), F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", F.lit(0).alias("inter_size"), F.lit(0).alias("union_size")
    )
    return verified.unionByName(empty_pairs)


def ngram_jaccard_pairs_bruteforce(
    df: DataFrame, text_col: str, id_col: str, *, shingle_n: int = 3
) -> DataFrame:
    """Exact all-pairs shingle Jaccard (verification-scale only; the
    prefix-filtered :func:`ngram_jaccard_pairs` is the 100 TB route — this
    one is O(n²) by construction and exists as its test baseline)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_expr(F.col(text_col), shingle_n).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.size(F.array_intersect("a.sh", "b.sh")).alias("inter_size"),
            F.size(F.array_union("a.sh", "b.sh")).alias("union_size"),
        )
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bits: int = 60,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """SimHash near-dup candidates: split the signature into max_hamming+1
    segments (pigeonhole: any pair within the hamming radius agrees on ≥1
    whole segment), bucket-join per segment, verify hamming ≤ radius.

    Default geometry is scale-sized: 60-bit signatures / 15-bit segment keys
    ⇒ 32,768 buckets per segment, so bucket occupancy (and the n²/buckets
    candidate volume) is ~128× smaller than the old 32-bit/8-bit default.
    60 rather than 64 because the portable token hash is the 15-hex-digit
    md5 prefix (60 bits — the widest value that fits signed BIGINT in every
    engine, see ``token_hash_expr``): bits 60-63 of a "64-bit" signature
    would be structurally zero for every document, adding sign-overflow
    hazards at bit 63 without adding any discrimination.

    ``max_bucket_size`` additionally caps segment-bucket membership, same
    guard as MinHash banding (``minhash_dedup_pairs``): a bucket with n
    members fans out n·(n−1)/2 candidate pairs, and boilerplate-heavy
    corpora concentrate near-identical signatures in few buckets. Recall
    loss is confined to pairs whose EVERY agreeing segment is oversized.

    The (id, sim) signature frame — 16 bytes/row — is materialized with
    ``localCheckpoint`` (``materialize=True``): the self-join consumes the
    keyed frame on BOTH sides, so without it the tokenize+hash+fold
    signature pass (the dominant per-row cost) runs twice over the corpus.
    Same rationale as :func:`minhash_dedup_pairs`; measured 4× at sf0.1."""
    seg_bits = bits // (max_hamming + 1)
    mask = (1 << seg_bits) - 1
    sh = df.select(
        F.col(id_col).alias("id"), simhash_expr(F.col(text_col), bits).alias("sim")
    )
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    keyed = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftright("sim", s * seg_bits).bitwiseAND(F.lit(mask)).alias("skey"),
                    )
                    for s in range(max_hamming + 1)
                ]
            )
        ).alias("k"),
    ).select("id", "sim", "k.seg", "k.skey")
    keyed = _drop_oversized_buckets(keyed, ["seg", "skey"], max_bucket_size)
    cand = _bucket_pair_candidates(
        keyed,
        ["seg", "skey"],
        F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Each round: every node takes min(own label, neighbors' labels) — one
    join + one groupBy over the (bidirectional) edge list. Converges in
    O(component diameter) rounds; near-dup clusters are shallow, so 3-4
    rounds in practice. ``localCheckpoint`` cuts the lineage so the plan
    doesn't grow with iterations (the standard Spark iterative-algorithm
    pattern; GraphFrames CC does the same).

    Returns (id_col, cluster_id) for every node; singletons label themselves.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        # materialize once: every iteration (and its convergence check) joins
        # against edges, and without this the whole upstream pair-generation
        # pipeline (e.g. MinHash-LSH) re-executes per round
        .localCheckpoint(eager=True)
    )
    # only edge participants can ever change label; singletons (the vast
    # majority of a deduped corpus) are their own cluster and rejoin at the
    # end — the iterated frame shrinks from |corpus| to |touched nodes|.
    # The semi-join keeps the output restricted to the nodes frame: ids that
    # appear only in `pairs` are dropped (and edges THROUGH such an id do not
    # relay labels — pairs are expected to connect members of `nodes`).
    touched = (
        edges.select(F.col("src").alias(id_col))
        .distinct()
        .join(nodes.select(F.col(id_col)), id_col, "left_semi")
        # consumed twice (label seed + the singletons left_anti at the
        # caller's terminal action): materialize the tiny id frame once
        # instead of re-running distinct+semi-join over the edge list
        .localCheckpoint(eager=True)
    )
    labels = touched.select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    singletons = (
        nodes.select(F.col(id_col))
        .join(touched, id_col, "left_anti")
        .select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    )
    release_prev: Optional[Callable[[], None]] = None
    for _ in range(max_iterations):
        nbr_min = (
            labels.join(edges, labels[id_col] == edges.src)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, labels[id_col] == nbr_min.dst, "left")
            .select(
                F.col(id_col),
                F.least(F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")).alias(
                    "new_label"
                ),
                F.col("cluster_id"),
            )
        )
        # ONE job per round (r12 VERDICT item #4): the convergence probe IS
        # the materializing action — a full-pass aggregate over the lazily
        # localCheckpointed frame computes and persists every partition AND
        # returns the changed count, where the old shape paid an eager
        # checkpoint job plus a separate probe job per round. The next
        # round's labels read the persisted blocks. Once materialized the
        # PREVIOUS round's blocks are dead and released immediately, so the
        # loop still holds O(1) checkpoints instead of O(rounds).
        updated, release = lazy_localcheckpoint(updated)
        changed = updated.agg(
            F.count(F.when(F.col("new_label") != F.col("cluster_id"), True))
        ).first()[0]
        if release_prev is not None:
            release_prev()
        release_prev = release
        labels = updated.select(F.col(id_col), F.col("new_label").alias("cluster_id"))
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")
    # the final round's checkpoint and the edge list feed the returned lazy
    # frame — the caller owning the terminal action reclaims them with
    # cache.checkpoint_scope
    return labels.unionByName(singletons)


def lsh_collision_prob(jaccard: float, bands: int, rows: int) -> float:
    """Probability that a pair with the given Jaccard similarity agrees on
    ≥1 MinHash-LSH band: 1 − (1 − j^rows)^bands — the banding s-curve
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4)."""
    if not 0.0 <= jaccard <= 1.0:
        raise ValueError("jaccard must be in [0, 1]")
    return 1.0 - (1.0 - jaccard**rows) ** bands


def _pick_banding(prob_of_bands, n: int, min_recall: float) -> tuple[int, int]:
    """Shared banding-geometry selection for the MinHash and hyperplane
    tuners: among divisor pairs bands·rows = n, the FEWEST bands whose
    collision probability (``prob_of_bands(bands)``) clears ``min_recall``
    — fewest band keys ⇒ smallest candidate volume — else the
    recall-maximizing pair. One definition so a selection fix cannot drift
    between the two tuners."""
    if n <= 0:
        raise ValueError(f"signature size must be positive, got {n}")
    if not 0.0 < min_recall <= 1.0:
        raise ValueError(f"min_recall must be in (0, 1], got {min_recall}")
    pairs = [(b, n // b) for b in range(1, n + 1) if n % b == 0]
    ok = [(b, r) for b, r in pairs if prob_of_bands(b) >= min_recall]
    if ok:
        return min(ok, key=lambda br: br[0])
    return max(pairs, key=lambda br: prob_of_bands(br[0]))


def tune_minhash_bands(
    threshold: float,
    num_perm: int = 64,
    *,
    min_recall: float = 0.95,
) -> tuple[int, int]:
    """Pick (bands, rows) for :func:`minhash_dedup_pairs`' knobs: among the
    divisor pairs bands·rows = num_perm, choose the one with the FEWEST
    bands (fewest shuffled band keys ⇒ smallest candidate volume) whose
    s-curve still catches pairs AT the target threshold with probability ≥
    ``min_recall``; if none reaches the recall bar, fall back to the
    recall-maximizing pair. The threshold where collision probability is
    ~1/2 sits near (1/bands)^(1/rows), so this is the principled version of
    the usual rule of thumb. Deterministic, driver-side arithmetic — call
    it once when sizing a 100 TB dedup job, then pass the result to
    ``minhash_dedup_pairs(num_perm=..., bands=...)``."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    return _pick_banding(
        lambda b: lsh_collision_prob(threshold, b, num_perm // b),
        num_perm,
        min_recall,
    )


def select_cluster_representatives(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str,
    *,
    prefer_col: str | None = None,
) -> DataFrame:
    """The curation ACTION after near-dup clustering: keep exactly one
    member of every cluster, drop the rest — ``labels`` is
    :func:`connected_components` output (id, cluster_id).

    Default keeps the minimum-id member PRESENT IN ``docs`` (usually the
    CC label itself; when docs was pre-filtered — quality gates, a prior
    dedup — and the label member is gone, the smallest surviving member
    still represents the cluster instead of the cluster silently losing
    all members). ``prefer_col`` keeps the member with the HIGHEST value
    of that column instead — e.g. a quality score, so the cluster
    survivor is the best copy (ties break to the smallest id; the
    tie-break uses ``min``, never numeric negation, so string ids work).
    Members whose ``prefer_col`` is NULL lose to any scored member and
    tie among themselves by min id. Documents absent from ``labels`` are
    kept — unlabeled means unclustered.

    Scale: both modes aggregate the labels-sized frame (ids + at most one
    scalar column, never documents) and LEFT SEMI join back; document
    payloads shuffle in neither mode.
    """
    lab = labels.select(F.col(id_col).alias("__lid"), "cluster_id")
    present = lab.join(
        docs.select(
            F.col(id_col).alias("__lid"),
            *( [F.col(prefer_col).alias("__p")] if prefer_col is not None else [] ),
        ),
        on="__lid",
    )
    if prefer_col is None:
        reps = present.groupBy("cluster_id").agg(F.min("__lid").alias("__lid"))
    else:
        # two aggregations on the small labels frame, type-agnostic ids:
        # the cluster's best score (NULL-safe), then the min id among the
        # members that carry it
        best = present.groupBy("cluster_id").agg(F.max("__p").alias("__best"))
        reps = (
            present.join(best, on="cluster_id")
            .filter(F.col("__p").eqNullSafe(F.col("__best")))
            .groupBy("cluster_id")
            .agg(F.min("__lid").alias("__lid"))
        )
    reps = reps.select("__lid")
    labeled_ids = lab.select("__lid")
    return docs.join(
        labeled_ids, docs[id_col] == labeled_ids["__lid"], "left_anti"
    ).unionByName(
        docs.join(reps, docs[id_col] == reps["__lid"], "left_semi")
    )
