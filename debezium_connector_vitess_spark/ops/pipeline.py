"""Corpus-level training-data pipeline ops: vocabulary statistics, train/eval
decontamination, deterministic sampling, sequence packing.

Scale strategy (100 TB):
- **vocab top-k**: explode tokens → groupBy(token) count. Partial (map-side)
  aggregation collapses each partition's token stream to its local vocabulary
  before the exchange, so the shuffle carries distinct-tokens-per-partition,
  not the token stream. Head words (``the``) are exactly the keys partial agg
  compresses best — no salting needed. The final top-k is a TakeOrdered over
  the aggregated vocabulary, not a full sort.
- **decontamination**: distinct n-gram sets on both corpora, LEFT SEMI join
  eval-grams against train-grams on the gram. One shuffle keyed by gram;
  the train side deduplicates map-side via aggregation before the join. At
  100 TB the gram would be an 8-byte hash (see ``token_hash_expr``) rather
  than the string — semantics identical, shuffle ~10× narrower.
- **hash sampling**: pure narrow projection — a deterministic md5-derived
  uniform in [0,100) per row, no shuffle, no RNG state, reproducible across
  engines and re-runs (the property that matters for dataset versioning).
- **sequence packing**: concat-and-chop (the standard LLM pretraining
  packing): running token offset per stream via a window cumsum = one
  shuffle keyed by the stream column; giant streams are split upstream by
  bucketing the stream key. Block id/offset are pure arithmetic on the
  running total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_expr
from .text import token_count_expr, tokens_expr


def vocab_topk(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Top-k corpus vocabulary by token frequency (ties broken by token)."""
    toks = df.select(F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("freq"))
    return vocab.orderBy(F.desc("freq"), F.asc("token")).limit(k)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram: int = 5,
) -> DataFrame:
    """Eval documents sharing ≥1 word n-gram with the train corpus, with the
    number of distinct overlapping grams (test-set contamination check).

    Returns (id_col, n_hits). Grams within a document are distinct by
    construction (``shingles_expr``), so ``count(*)`` after the join counts
    distinct shared grams without a count-distinct.
    """
    tr = (
        train.select(F.explode(shingles_expr(F.col(text_col), ngram)).alias("gram"))
        .distinct()
    )
    ev = eval_df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), ngram)).alias("gram")
    )
    return (
        ev.join(tr, on="gram", how="left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def hash_uniform_expr(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform int in [0, 100) from md5(salt || key) — the
    engine-agnostic construction (no rand(), no engine-private hash), so a
    sample is exactly reproducible anywhere, including the SQL oracle."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return h % 100


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


def unigram_logprobs(df: DataFrame, text_col: str, *, alpha: float = 0.5) -> DataFrame:
    """Corpus unigram language model: (token, logp) with add-``alpha``
    smoothing over the observed vocabulary.

    logp(t) = ln((count(t) + alpha) / (N + alpha·|V|)). One explode +
    groupBy(token) with map-side partial agg (the same shuffle shape as
    :func:`vocab_topk`); the two scalars N and |V| ride along via a window
    over the aggregated vocabulary (|V| rows, not the token stream), so no
    second pass over the corpus and no driver collect."""
    toks = df.select(F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy()
    return vocab.select(
        "token",
        F.log(
            (F.col("cnt") + F.lit(alpha))
            / (F.sum("cnt").over(w) + F.lit(alpha) * F.count("*").over(w))
        ).alias("logp"),
    )


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


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    stream_col: str,
    block_tokens: int = 2048,
) -> DataFrame:
    """Concat-and-chop sequence packing: documents are laid end-to-end per
    stream (ordered by id), and the token stream is cut into fixed
    ``block_tokens`` blocks. Returns each document's block assignment:
    (id, stream, n_tokens, start_offset, block_id, offset_in_block).

    A document whose tokens straddle a boundary belongs to the block where it
    starts (the trainer reads it across the cut — this op computes placement,
    not the split payloads).
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count_expr(F.col(text_col)).cast("long")
    placed = df.select(
        F.col(id_col),
        F.col(stream_col),
        n_tok.alias("n_tokens"),
    ).withColumn("start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"))
    return placed.select(
        id_col,
        stream_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / block_tokens).cast("long").alias("block_id"),
        (F.col("start_offset") % block_tokens).cast("long").alias("offset_in_block"),
    )
