"""Byte-pair-encoding tokenizer: train-on-sample, apply-at-scale.

The missing piece between the regex token-count heuristic
(``text.bpe_token_count_expr``) and a real training pipeline: LLM data work
is budgeted in TOKENS OF AN ACTUAL VOCABULARY (mixture quotas, packing,
context chunking), and the vocabulary is learned, not regex-defined.

Scale strategy (100 TB):
- **Training is a driver-side fold over a bounded sample** — deliberately.
  BPE merge selection is inherently sequential (merge i+1's pair counts
  depend on merge i having been applied), so a distributed formulation
  would be an iterative shuffle per merge — thousands of full-corpus
  passes. Real tokenizer training makes the same call: a bounded sample
  (GB-scale) on one node learns merges that generalize, because pair
  statistics converge long before the corpus does. The sample here is the
  deterministic md5 hash-sample (engine-agnostic, reproducible), capped by
  rows AND per-doc chars; the collect is bounded by construction (the
  ``train_quality_classifier`` precedent).
- **Application is embarrassingly parallel**: one Arrow-batched
  ``mapInPandas`` seam (merges broadcast in the closure; no efficient
  Catalyst form exists for ranked iterative pair-merging), map-only, zero
  shuffle at any size. A per-batch word→tokens memo collapses the
  heavy-tail word distribution: each DISTINCT word in a batch is encoded
  once, and natural-language batches repeat words constantly.
- Word-level pre-tokenization (whitespace split + end-of-word marker) is
  shared verbatim between train and apply, so the learned merges see the
  same word shapes they will be applied to.

Reference: Sennrich, Haddow & Birch, "Neural Machine Translation of Rare
Words with Subword Units" (ACL 2016) — the classic word-frequency BPE.
Determinism: ties on pair frequency break lexicographically, so the merge
list is a pure function of the sample, and the sample is a pure function
of (corpus, salt, caps).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker: lets merges learn suffixes ("est</w>")


def _word_freqs(texts: list[str], lowercase: bool) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        if not t:
            continue
        if lowercase:
            t = t.lower()
        for w in t.split():
            wf[w] += 1
    return wf


def train_bpe(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 1000,
    sample_rows: int = 10_000,
    max_chars_per_doc: int = 10_000,
    lowercase: bool = True,
    salt: str = "bpe",
    end_marker: str = END,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a bounded deterministic sample.

    Returns ``[(left, right), ...]`` in merge order — the entire tokenizer
    state (the vocabulary is the base alphabet plus one entry per merge).
    Training stops early if no pair occurs twice (tiny samples saturate).

    The sample: the ``sample_rows`` smallest salted CONTENT hashes (md5 of
    the truncated text — a pure function of the corpus contents, so
    retraining on the same corpus yields the same tokenizer regardless of
    partitioning or file layout; no RNG state — the property that matters
    for dataset versioning), each doc capped at ``max_chars_per_doc``
    chars. The collect is ≤ sample_rows × max_chars_per_doc bytes by
    construction, and the top-k executes as TakeOrderedAndProject (per-
    partition heads, one merge), never a global sort.
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if sample_rows <= 0 or max_chars_per_doc <= 0:
        raise ValueError("sample_rows and max_chars_per_doc must be positive")
    from .pipeline import _md5_long_expr

    # NULL/whitespace-only docs are excluded BEFORE hashing: md5(NULL) is
    # NULL and ascending orderBy puts NULLs first, so on a NULL-heavy
    # corpus (common in scraped/CDC data) they would crowd real documents
    # out of the sample — or consume it entirely and learn zero merges
    keyed = (
        df.filter(F.col(text_col).rlike(r"\S"))
        .select(F.substring(F.col(text_col), 1, max_chars_per_doc).alias("__t"))
        .select("__t", _md5_long_expr(F.col("__t"), salt).alias("__h"))
    )
    sampled = keyed.orderBy("__h", "__t").limit(sample_rows)
    texts = [r["__t"] for r in sampled.collect()]
    return _train_from_texts(
        texts, num_merges, lowercase=lowercase, end_marker=end_marker
    )


def _train_from_texts(
    texts: list[str],
    num_merges: int,
    *,
    lowercase: bool = True,
    end_marker: str = END,
) -> list[tuple[str, str]]:
    """The pure Sennrich fold over an in-memory sample: words as symbol
    sequences, repeatedly merge the most frequent adjacent pair
    (lexicographic tie-break for determinism). Shared by :func:`train_bpe`
    (Spark sample) and the registry's oracle-constants helper (pyarrow
    sample) — one fold definition, two independently-built samples.

    Incremental formulation (r13): the textbook fold recounts EVERY
    adjacent pair and rewrites EVERY word per merge — O(merges × total
    symbols), which at a real GB-scale sample with thousands of merges is
    the difference between minutes and hours of driver time. Here the pair
    counter is maintained incrementally: each merge touches only the words
    that contain the chosen pair (tracked in an occurrence index), so a
    round costs O(|distinct pairs| argmax + affected words). Counts are
    exact integers updated by exact deltas, and the selection rule (max
    count, then lexicographically smallest) is unchanged, so the returned
    merge list is IDENTICAL to the naive fold's — pinned by
    test_bpe_incremental_matches_naive."""
    wf = _word_freqs(texts, lowercase)
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in wf.items():
        words.append(list(w) + [end_marker])
        counts.append(c)
    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for idx, sym in enumerate(words):
        c = counts[idx]
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pairs[p] += c
            s = where.get(p)
            if s is None:
                where[p] = {idx}
            else:
                s.add(idx)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break  # every pair unique: further merges memorize the sample
        # lexicographically smallest among the most frequent: deterministic
        best_pair = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best_pair)
        merged = "".join(best_pair)
        left, right = best_pair
        for idx in sorted(where.get(best_pair, ())):
            sym = words[idx]
            c = counts[idx]
            # retract the word's old adjacencies (exact inverse of the
            # additions below — the index stays precise, never stale)
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                left_over = pairs[p] - c
                if left_over:
                    pairs[p] = left_over
                else:
                    del pairs[p]
                s = where.get(p)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        del where[p]
            # left-to-right non-overlapping merge, same as the naive fold
            out: list[str] = []
            i = 0
            n = len(sym)
            while i < n:
                if i < n - 1 and sym[i] == left and sym[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[idx] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pairs[p] += c
                s = where.get(p)
                if s is None:
                    where[p] = {idx}
                else:
                    s.add(idx)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], end_marker: str = END
) -> list[str]:
    """Apply ranked merges to one word (chars + end marker), lowest rank
    first — the standard BPE apply loop."""
    sym = list(word) + [end_marker]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    *,
    lowercase: bool = True,
    output: str = "tokens",
    end_marker: str = END,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Tokenize a corpus with a learned merge list — the distributed half.

    ``output='tokens'`` → (id, tokens array<string>); ``output='count'`` →
    (id, n_bpe_tokens). One map-only Arrow seam, zero shuffle at any size;
    a per-PARTITION word→tokens memo means each distinct word pays the
    merge loop once (natural text repeats words heavily — the memo hit
    rate IS the corpus's token-type ratio). The memo is size-capped and
    reset when full: a near-unique "word" population (URLs, ids, code)
    would otherwise accumulate unboundedly across a large partition's
    batches and OOM the Python worker. Pre-tokenization (whitespace +
    end-of-word marker, optional lowercase) matches :func:`train_bpe`
    verbatim. Losslessness: ``concat(tokens)`` per word reproduces the
    word + marker — pinned by tests, so token counts are trustworthy
    budget units.

    ``carry_cols`` rides extra columns through the seam unchanged (their
    input types preserved), so a downstream consumer keyed on more than the
    id — packing by stream, budgeting by domain — needs NO join back to the
    corpus: at 100 TB that join is a full (id, count) ⊳⊲ (id, cols) shuffle
    this option eliminates.
    """
    if output not in ("tokens", "count"):
        raise ValueError(f"output must be 'tokens' or 'count', got {output!r}")
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        memo_cap = 1 << 20  # ~1M distinct words; reset beats eviction here

        def enc(text) -> list[str]:
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in text.split():
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks, end_marker)
                    if len(memo) >= memo_cap:
                        memo.clear()
                    memo[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf["__text"].map(enc)
            out_cols = {"id": pdf["id"]}
            if output == "tokens":
                out_cols["tokens"] = toks
            else:
                out_cols["n_bpe_tokens"] = toks.map(len)
            for c in carry_cols:
                out_cols[c] = pdf[c]
            yield pd.DataFrame(out_cols)

    clash = [
        c for c in carry_cols
        if c in ("id", "tokens", "n_bpe_tokens", "__text")
        or c in (id_col, text_col)
    ]
    if clash or len(set(carry_cols)) != len(carry_cols):
        raise ValueError(
            f"carry_cols collide with seam columns or repeat: {clash or carry_cols}"
        )
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        *[F.col(c) for c in carry_cols],
    )
    # ids (and carried columns) pass through the seam untouched: keep the
    # INPUT column types (string/decimal doc ids are first-class elsewhere —
    # a hardcoded long here failed them with an opaque Arrow type error)
    id_dt = src.schema["id"].dataType.simpleString()
    out_field = (
        "tokens array<string>" if output == "tokens" else "n_bpe_tokens long"
    )
    carried = "".join(
        f", {c} {src.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    return src.mapInPandas(run, schema=f"id {id_dt}, {out_field}{carried}")


def tokenizer_fertility(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    *,
    by: str | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Tokenizer fertility report: how many BPE pieces the merge table
    spends per word and per character, overall or per group (pass
    ``by='lang'`` to see which languages a merge table under-serves — the
    standard multilingual-tokenizer health check before committing a vocab
    to a 100 TB tokenization run).

    Output: one row per group with EXACT integer sums (n_docs, n_words,
    n_chars, n_bpe_tokens) — the ratios (fertility = tokens/words,
    compression = chars/tokens) are one division away and stay out of any
    hashed artifact per the no-hashed-doubles convention. The word/char
    counts are staged BEFORE the seam and ride through ``carry_cols`` (no
    join-back), so the whole report is one map-only Arrow seam + one
    partial-aggregated groupBy: the same scale shape as corpus_profile."""
    group = [by] if by is not None else []
    words = F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda x: x != "",
        )
    ).cast("long")
    chars = F.coalesce(F.length(text_col), F.lit(0)).cast("long")
    staged = df.select(
        *([F.col(by)] if by is not None else []),
        F.col(id_col),
        F.col(text_col),
        words.alias("__tf_words"),
        chars.alias("__tf_chars"),
    )
    counted = bpe_encode(
        staged,
        text_col,
        id_col,
        merges,
        lowercase=lowercase,
        output="count",
        carry_cols=tuple(group) + ("__tf_words", "__tf_chars"),
    )
    gb = counted.groupBy(*group) if group else counted.groupBy()
    return gb.agg(
        F.count("*").alias("n_docs"),
        F.sum("__tf_words").alias("n_words"),
        F.sum("__tf_chars").alias("n_chars"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
    )


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as JSON — the tokenizer artifact a
    dataset release ships alongside its shards (token counts are only
    reproducible with the exact merges that produced them). Atomic write
    (temp file + rename) so a crashed writer never leaves a torn artifact
    for the next run to load."""
    import json
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump({"version": 1, "merges": [list(m) for m in merges]}, fh)
            fh.flush()
            os.fsync(fh.fileno())  # rename durability needs the data durable
        mask = os.umask(0)
        os.umask(mask)
        os.chmod(tmp, 0o666 & ~mask)  # mkstemp's 0600 ignores the umask
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_merges(path: str) -> list[tuple[str, str]]:
    """Load a merge list written by :func:`save_merges`; validates the
    shape loudly (a truncated or foreign JSON must not silently become an
    empty tokenizer that character-shatters the corpus)."""
    import json

    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    if (
        not isinstance(doc, dict)
        or doc.get("version") != 1
        or not isinstance(doc.get("merges"), list)
        or not all(
            isinstance(m, list)
            and len(m) == 2
            and all(isinstance(x, str) for x in m)
            for m in doc["merges"]
        )
    ):
        raise ValueError(f"not a BPE merges artifact: {path!r}")
    return [tuple(m) for m in doc["merges"]]


def bpe_decode_expr(tokens: "F.Column", end_marker: str = END) -> "F.Column":
    """Reconstruct text from a BPE token array — the inverse that makes the
    tokenizer auditable end to end: ``decode(encode(text))`` equals the
    pre-tokenized form of ``text`` (lowercased when encoding lowercased,
    whitespace collapsed to single spaces — the information the word-level
    pre-tokenizer deliberately discards; everything else round-trips
    exactly, which is what the losslessness tests pin).

    Pure Catalyst (concat + one literal replace + trim): subword pieces
    concatenate back into words because encoding is a partition of each
    word's characters, and the end-of-word marker becomes the word
    boundary. Map-side, composes in the same projection as any other
    expression — no Arrow seam needed for the DECODE direction.

    Marker aliasing: source text CONTAINING the marker string decodes
    wrong (an in-word ``</w>`` is indistinguishable from the boundary
    after concatenation). For corpora where the default marker occurs
    in-band — HTML/XML crawls — train/encode/decode with an
    ``end_marker`` absent from the data (e.g. ``"\x00w"``); the marker
    threads through all three functions.
    """
    return F.trim(
        F.replace(F.array_join(tokens, ""), F.lit(end_marker), F.lit(" "))
    )
