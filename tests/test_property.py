"""Property-based tests (hypothesis) for the pure protocol core.

The reference has no property tests (SURVEY.md §5); these go beyond it on the
pieces where a malformed round-trip silently corrupts offsets or ordering:
VGTID JSON (the checkpoint offset document), GTID rank, epoch transitions,
shard-lineage overlap, and the enum/set definition parser.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_connector_vitess_spark.txmeta.epoch import (
    ShardEpochMap,
    _overlaps,
    epoch_for_gtid,
    inherited_epoch,
)
from debezium_connector_vitess_spark.txmeta.gtid import Gtid, get_rank
from debezium_connector_vitess_spark.types import parse_enum_or_set_values
from debezium_connector_vitess_spark.vgtid import (
    ShardGtid,
    TableLastPK,
    Vgtid,
)

# ---------------------------------------------------------------- strategies

_ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_-."),
    min_size=1,
    max_size=12,
)

_host = st.uuids().map(str)

_intervals = st.lists(
    st.tuples(st.integers(1, 10**6), st.integers(0, 10**3)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=3,
)


@st.composite
def _gtid_sets(draw):
    """A GTID-set string plus the per-host max sequences used to build it."""
    hosts = draw(st.lists(_host, min_size=1, max_size=4, unique=True))
    expected = {}
    entries = []
    for h in hosts:
        ivs = draw(_intervals)
        entries.append(h + ":" + ":".join(f"{lo}-{hi}" for lo, hi in ivs))
        expected[h] = ivs[-1][1]
    prefix = draw(st.sampled_from(["", "MySQL56/"]))
    return prefix + ",".join(entries), expected


@st.composite
def _shard_gtids(draw):
    table_p_ks = tuple(
        TableLastPK(draw(_ident), {"fields": draw(st.lists(_ident, max_size=2)), "rows": []})
        for _ in range(draw(st.integers(0, 2)))
    )
    return ShardGtid(
        keyspace=draw(_ident),
        shard=draw(_ident),
        gtid=draw(st.one_of(st.just(""), st.just("current"), _gtid_sets().map(lambda t: t[0]))),
        table_p_ks=table_p_ks,
    )


_vgtids = st.lists(_shard_gtids(), min_size=0, max_size=4).map(lambda l: Vgtid(tuple(l)))

# ------------------------------------------------------------------- VGTID


@given(_vgtids)
def test_vgtid_json_roundtrip(v):
    assert Vgtid.from_json(v.to_json()) == v


@given(_vgtids)
def test_vgtid_json_is_valid_json_array(v):
    doc = json.loads(v.to_json())
    assert isinstance(doc, list) and len(doc) == len(v.shard_gtids)


@given(_vgtids, _shard_gtids())
def test_vgtid_with_replaced_contains_entry(v, sg):
    out = v.with_replaced(sg)
    got = out.get_shard_gtid(sg.shard, sg.keyspace)
    assert got is not None and got.gtid == sg.gtid
    # replacing never changes the set of other (keyspace, shard) keys
    keys = {(s.keyspace, s.shard) for s in v.shard_gtids} | {(sg.keyspace, sg.shard)}
    assert {(s.keyspace, s.shard) for s in out.shard_gtids} == keys


@given(_vgtids)
def test_vgtid_local_is_subset(v):
    for sg in v.shard_gtids:
        local = v.local_vgtid(sg.shard)
        assert len(local.shard_gtids) == 1
        assert local.shard_gtids[0].shard == sg.shard

# ---------------------------------------------------------------- GTID/rank


@given(_gtid_sets())
def test_rank_is_sum_of_max_sequences(t):
    raw, expected = t
    assert get_rank(raw) == sum(expected.values())


@given(_gtid_sets(), st.integers(1, 10**6))
def test_rank_monotone_in_sequence_growth(t, bump):
    raw, expected = t
    host = next(iter(expected))
    grown = ",".join(
        f"{h}:1-{mx + (bump if h == host else 0)}" for h, mx in expected.items()
    )
    base = ",".join(f"{h}:1-{mx}" for h, mx in expected.items())
    assert get_rank(grown) == get_rank(base) + bump


@given(_gtid_sets())
def test_gtid_parse_hosts(t):
    raw, expected = t
    assert Gtid.parse(raw).hosts == frozenset(expected)

# -------------------------------------------------------------------- epoch


@given(_gtid_sets(), st.integers(0, 100))
def test_epoch_flat_on_same_hosts(t, epoch):
    raw, _ = t
    assert epoch_for_gtid(epoch, raw, raw) == epoch


@given(_gtid_sets(), st.integers(0, 100), _host)
def test_epoch_flat_on_host_growth_and_bumps_on_shrink(t, epoch, new_host):
    raw, expected = t
    if new_host in expected:
        return
    grown = raw + f",{new_host}:1-5"
    # host-set grew (superset) → epoch unchanged
    assert epoch_for_gtid(epoch, raw, grown) == epoch
    # host-set shrank (failover) → epoch + 1
    assert epoch_for_gtid(epoch, grown, raw) == epoch + 1


@given(st.sampled_from(["", "current"]), _gtid_sets(), st.integers(0, 100))
def test_epoch_increments_after_overridden_start(prev, t, epoch):
    assert epoch_for_gtid(epoch, prev, t[0]) == epoch + 1


@given(st.dictionaries(_ident, st.integers(0, 50), max_size=5))
def test_shard_epoch_map_roundtrip(m):
    sem = ShardEpochMap(m)
    assert ShardEpochMap.from_json(sem.to_json()) == sem

# ------------------------------------------------------------ shard lineage

_hex2 = st.integers(1, 255).map(lambda n: format(n, "02x"))


@given(st.sampled_from(["-40", "40-80", "80-c0", "c0-", "0", "-", "20-60"]),
       st.sampled_from(["-40", "40-80", "80-c0", "c0-", "0", "-", "20-60"]))
def test_overlap_symmetric(a, b):
    assert _overlaps(a, b) == _overlaps(b, a)


@given(_hex2)
def test_adjacent_split_shards_do_not_overlap(mid):
    assert not _overlaps(f"-{mid}", f"{mid}-")
    # but each overlaps the full range
    assert _overlaps(f"-{mid}", "-") and _overlaps(f"{mid}-", "-")


@given(_hex2, st.dictionaries(st.sampled_from(["-40", "40-80", "80-"]), st.integers(0, 9)))
def test_inherited_epoch_exceeds_all_parents(mid, parents):
    sem = ShardEpochMap(parents)
    child = f"-{mid}"
    got = inherited_epoch(child, sem)
    overlapping = [e for s, e in parents.items() if _overlaps(child, s)]
    if overlapping:
        assert got == max(overlapping) + 1
    else:
        assert got == 0

# ------------------------------------------------------------ enum/set parse

_enum_literal = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters=""),
    max_size=8,
)


@settings(max_examples=200)
@given(st.sampled_from(["enum", "set"]), st.lists(_enum_literal, min_size=1, max_size=6))
def test_enum_set_definition_roundtrip(kind, values):
    quoted = ",".join("'" + v.replace("'", "''") + "'" for v in values)
    assert parse_enum_or_set_values(f"{kind}({quoted})") == tuple(values)


@given(st.text(max_size=20))
def test_non_enum_definitions_parse_empty(raw):
    if not raw.lstrip().lower().startswith(("enum", "set")):
        assert parse_enum_or_set_values(raw) == ()


# ------------------------------------------------------- packed-row codec

_cells = st.lists(
    st.one_of(st.none(), st.binary(min_size=0, max_size=40)),
    min_size=0,
    max_size=12,
)


@given(_cells)
def test_pack_unpack_roundtrip(cells):
    """query.Row lengths+bytes codec: every cell list (incl. NULLs and empty
    byte strings, which the wire distinguishes: -1 vs 0 length) round-trips."""
    from debezium_connector_vitess_spark.sources.wire import pack_row, unpack_row

    row = pack_row(cells)
    assert unpack_row(row, len(cells)) == list(cells)
    # NULL cells are -1-length, absent from the value blob
    assert sum(len(c) for c in cells if c is not None) == len(row.values)


@given(_cells, st.integers(min_value=-3, max_value=3).filter(lambda d: d != 0))
def test_unpack_wrong_column_count_raises(cells, delta):
    from debezium_connector_vitess_spark.sources.wire import pack_row, unpack_row

    if len(cells) + delta < 0:
        return
    row = pack_row(cells)
    try:
        unpack_row(row, len(cells) + delta)
    except ValueError:
        return
    raise AssertionError("column-count mismatch must raise")


@given(_cells)
def test_vevent_row_json_roundtrip(cells):
    """The recorded-wire serde preserves packed images byte-for-byte."""
    from debezium_connector_vitess_spark.sources.wire import (
        WireRowChange,
        WireRowEvent,
        WireVEvent,
        pack_row,
        vevent_from_json,
        vevent_to_json,
    )

    ev = WireVEvent(
        "ROW",
        timestamp=7,
        row_event=WireRowEvent(
            table_name="ks.t",
            row_changes=(WireRowChange(before=None, after=pack_row(cells)),),
            keyspace="ks",
            shard="-80",
        ),
    )
    back = vevent_from_json(vevent_to_json(ev))
    rc = back.row_event.row_changes[0]
    assert rc.before is None
    assert list(rc.after.lengths) == list(pack_row(cells).lengths)
    assert rc.after.values == pack_row(cells).values


# ------------------------------------------------------------ PNG codec

@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=25, deadline=None)
def test_png_encode_decode_roundtrip(w, h, channels, rnd):
    """Arbitrary small images round-trip pixel-exact through the stdlib
    codec (encode → decode returns the identical buffer)."""
    from debezium_connector_vitess_spark.ops.png import decode_png, encode_png

    pixels = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    back_w, back_h, back_ch, back_px = decode_png(encode_png(w, h, pixels, channels=channels))
    assert (back_w, back_h, back_ch) == (w, h, channels)
    assert back_px == pixels


# ------------------------------------------------- EnforceRecordSize SMT

@given(
    st.lists(st.integers(min_value=0, max_value=400), min_size=2, max_size=4),
    st.integers(min_value=1, max_value=500),
)
@settings(max_examples=20, deadline=None)
def test_enforce_record_size_budget_invariant(spark, lengths, max_size):
    """For any field lengths and budget: oversize records come back with
    eligible payload within budget (ceiling cuts guarantee it), and
    within-budget records are untouched."""
    from debezium_connector_vitess_spark.transforms import enforce_record_size

    cols = [f"c{i}" for i in range(len(lengths))]
    row = tuple(chr(ord("a") + i) * n for i, n in enumerate(lengths))
    df = spark.createDataFrame([row], ", ".join(f"{c} string" for c in cols))
    out = enforce_record_size(df, max_size, tuple(cols), min_field_size=0).collect()[0]
    total = sum(lengths)
    new_total = sum(len(out[c]) for c in cols)
    if total <= max_size:
        assert new_total == total
    else:
        assert new_total <= max_size


# --- winnowing fingerprint properties (pure Python, no Spark session) -------


def _naive_winnow(text: str, k: int, w: int) -> set:
    """Straight-from-the-paper reference: hash every char k-gram, keep the
    set of window minima (global min when fewer than w grams)."""
    import hashlib

    n = len(text)
    if n < k:
        return set()
    hs = [
        int(hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()[:15], 16)
        for i in range(n - k + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


@given(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=120,
    ),
    st.integers(1, 8),
    st.integers(1, 6),
)
@settings(max_examples=200, deadline=None)
def test_winnow_numpy_matches_naive(text, k, w):
    """The vectorized sliding-window-min implementation behind the
    mapInPandas op equals the naive literal winnow for arbitrary unicode
    text and any (k, window) — including the short-document degenerate
    cases (< k chars, < window grams)."""
    from debezium_connector_vitess_spark.ops.text import _winnow_fingerprints_py

    got = set(_winnow_fingerprints_py(text, k, w))
    assert got == _naive_winnow(text, k, w)


@given(
    st.text(alphabet="ab \n", min_size=0, max_size=60),
    st.text(alphabet="ab \n", min_size=0, max_size=60),
    st.text(min_size=12, max_size=30),
)
@settings(max_examples=100, deadline=None)
def test_winnow_shared_substring_guarantee(prefix, suffix, shared):
    """Two texts sharing a substring of length ≥ w + k − 1 share at least
    one fingerprint (the winnowing guarantee, Schleimer et al. 2003 §2)."""
    from debezium_connector_vitess_spark.ops.text import _winnow_fingerprints_py

    k, w = 5, 4  # guarantee threshold: 8 chars
    if len(shared) < w + k - 1:
        return
    a = prefix + shared + suffix
    b = suffix + shared + prefix
    fa = set(_winnow_fingerprints_py(a, k, w))
    fb = set(_winnow_fingerprints_py(b, k, w))
    assert fa & fb


# --------------------------- AllPairs prefix-filter exactness (vs brute force)

@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([(1, 2), (4, 5), (1, 3)]),
)
@settings(max_examples=8, deadline=None)
def test_ngram_jaccard_prefix_filter_matches_bruteforce(spark, texts, tau):
    """The prefix-filter guarantee is EXACT: for any corpus (including
    adversarial tiny-alphabet texts where every document shares most
    shingles, empty docs, and sub-n-token docs) and any threshold, the
    AllPairs pipeline must return exactly the brute-force all-pairs result.
    Tiny alphabet "ab " forces heavy shingle collisions — the regime where a
    wrong prefix length or a broken global order silently loses pairs."""
    from debezium_connector_vitess_spark.ops.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_bruteforce,
    )

    num, den = tau
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fast = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id",
            shingle_n=2, threshold_num=num, threshold_den=den,
            materialize=False,  # tiny corpora: skip the eager checkpoint
        ).collect()
    }
    slow = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs_bruteforce(
            df, "text", "doc_id", shingle_n=2
        ).collect()
        # brute force emits every pair unthresholded; apply tau here
        if r.inter_size * den >= r.union_size * num
    }
    assert fast == slow


# --------------------------- ExactSubstr span exactness (vs brute force)

def _brute_spans(texts, k, min_count):
    """Reference implementation of the ExactSubstr window criterion: count
    every positional k-gram, mark positions whose gram repeats >= min_count
    corpus-wide, merge consecutive positions into maximal runs."""
    from collections import Counter

    toks = {i: t.split() for i, t in enumerate(texts)}
    cnt = Counter(
        " ".join(ts[p : p + k])
        for ts in toks.values()
        for p in range(len(ts) - k + 1)
    )
    spans = set()
    for d, ts in toks.items():
        dup = [
            p
            for p in range(len(ts) - k + 1)
            if cnt[" ".join(ts[p : p + k])] >= min_count
        ]
        run = []
        for p in dup + [None]:
            if run and p != run[-1] + 1:
                spans.add((d, run[0], run[-1] + k - 1, run[-1] + k - run[0], len(run)))
                run = []
            if p is not None:
                run.append(p)
    return spans


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([(2, 2), (3, 2), (2, 3)]),
)
@settings(max_examples=8, deadline=None)
def test_duplicated_spans_matches_bruteforce(spark, texts, km):
    """The windowed-gram + occurrence-count + islands construction is EXACT
    against a direct Python reference on adversarial tiny-alphabet corpora
    (heavy gram collisions, empty docs, sub-k docs, within-doc repeats)."""
    from debezium_connector_vitess_spark.ops.text import duplicated_spans

    k, min_count = km
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        tuple(r)
        for r in duplicated_spans(
            df, min_tokens=k, min_count=min_count
        ).collect()
    }
    assert got == _brute_spans(texts, k, min_count)


_urlish = st.text(
    alphabet="abAB.:/?&=#%_-09 ", min_size=0, max_size=60
).map(lambda s: "https://" + s if len(s) % 3 == 0 else s)


@given(st.lists(_urlish, min_size=1, max_size=12))
@settings(max_examples=10, deadline=None)
def test_canonical_url_is_idempotent(spark, urls):
    """Canonicalization is a projection: canonical(canonical(u)) ==
    canonical(u) for arbitrary URL-ish garbage — a second pass through the
    dedup key must never change page identity (the property that lets a
    pipeline canonicalize incrementally without tracking whether a column
    was already canonical)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import canonical_url_expr

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    out = df.select(
        "id",
        canonical_url_expr(F.col("url")).alias("c1"),
        canonical_url_expr(canonical_url_expr(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], (urls[r["id"]], r["c1"], r["c2"])


@given(st.lists(st.text(alphabet="ab \n", max_size=40), min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_repetition_signals_invariants(spark, texts):
    """Structural invariants of the Gopher repetition signals on
    adversarial tiny-alphabet docs: counts are non-negative and bounded
    (dup instances < line count; dup chars ≤ total trimmed line chars);
    zero duplicate lines ⇒ zero duplicate-line chars; and doubling a
    document (self-concatenation with a separator line) never DECREASES
    any duplication signal."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import repetition_signal_exprs

    rows = [(i, t, t + "\n" + t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string, doubled string")
    nl, nd, dc, tb = repetition_signal_exprs(F.col("text"))
    nl2, nd2, dc2, tb2 = repetition_signal_exprs(F.col("doubled"))
    out = df.select(
        "id", nl.alias("nl"), nd.alias("nd"), dc.alias("dc"), tb.alias("tb"),
        nd2.alias("nd2"), dc2.alias("dc2"), tb2.alias("tb2"),
        F.aggregate(
            F.filter(
                F.transform(F.split(F.coalesce(F.col("text"), F.lit("")), "\n"),
                            lambda x: F.trim(x)),
                lambda x: x != "",
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x),
        ).alias("line_chars"),
    ).collect()
    for r in out:
        assert 0 <= r["nd"] <= max(r["nl"] - 1, 0)
        assert 0 <= r["dc"] <= r["line_chars"]
        if r["nd"] == 0:
            assert r["dc"] == 0
        assert r["nd2"] >= r["nd"] and r["dc2"] >= r["dc"] and r["tb2"] >= r["tb"]


# ------------------------------------------------------------ pack_bins core

from debezium_connector_vitess_spark.ops.pipeline import _bfd_place  # noqa: E402

_bin_rows = st.lists(
    st.tuples(st.integers(0, 10**6), st.integers(0, 300)),
    min_size=0, max_size=120, unique_by=lambda r: r[0],
)


@given(_bin_rows, st.integers(1, 256))
def test_bfd_place_capacity_and_tiling(rows, cap):
    out = _bfd_place(rows, cap, "own_bin")
    assert len(out) == len(rows)
    by_bin = {}
    for rid, nt, b, off, over in out:
        by_bin.setdefault(b, []).append((off, nt, over))
    for b, ds in by_bin.items():
        ds.sort()
        overs = [d for d in ds if d[2]]
        if overs:
            # oversize bins are singletons at offset 0
            assert len(ds) == 1 and ds[0][0] == 0
            continue
        pos = 0
        for off, nt, _ in ds:
            assert off == pos
            pos += nt
        assert pos <= cap


@given(_bin_rows, st.integers(1, 256), st.randoms())
def test_bfd_place_is_input_order_invariant(rows, cap, rnd):
    a = _bfd_place(rows, cap, "own_bin")
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    assert sorted(a) == sorted(_bfd_place(shuffled, cap, "own_bin"))


@given(_bin_rows, st.integers(1, 256))
def test_bfd_place_at_most_one_half_empty_bin(rows, cap):
    """Sound packing-quality invariant (the 11/9·OPT bound needs the
    unknown OPT): in any best-fit placement at most ONE bin is ≤ half
    full — a second one's first item would have fit in the first (a new
    bin is only opened when no existing bin has the residual)."""
    fit = [(i, n) for i, n in rows if n <= cap]
    out = _bfd_place(fit, cap, "raise")
    fills = {}
    for _rid, nt, b, _off, _over in out:
        fills[b] = fills.get(b, 0) + nt
    half_empty = sum(1 for v in fills.values() if 2 * v <= cap)
    assert half_empty <= 1


@given(st.integers(1, 100), st.integers(1, 100))
def test_bfd_place_oversize_raises(cap, extra):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="block_tokens"):
        _bfd_place([(1, cap + extra)], cap, "raise")


# ------------------------------------------------ media-parser containment
# The multimodal error contract: a parser fed arbitrary or mutated bytes
# either decodes or raises the CONTAINABLE classes (ValueError / IndexError /
# struct.error — what errors='skip' catches) — never another exception type,
# and never an input-controlled allocation (the r9 bounds checks).

def _media_errors():
    import struct

    return (ValueError, IndexError, struct.error)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_jpeg_parser_contains_arbitrary_bytes(payload):
    from debezium_connector_vitess_spark.ops.jpeg import parse_jpeg_meta

    try:
        out = parse_jpeg_meta(payload)
    except _media_errors():
        return
    assert len(out) == 7


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, 40),
    st.integers(0, 2000),
    st.binary(min_size=1, max_size=8),
)
def test_jpeg_parser_contains_mutated_fixtures(doc_id, pos, junk):
    """Adversarial case: REAL fixture bytes with a random splice — the
    shape a corrupted object-store read produces."""
    from debezium_connector_vitess_spark.ops.jpeg import (
        encode_jpeg_shell,
        parse_jpeg_meta,
    )

    base = encode_jpeg_shell(64 + doc_id, 48 + doc_id, seed=doc_id)
    pos %= len(base)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        parse_jpeg_meta(mutated)
    except _media_errors():
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=512))
def test_mp4_frame_table_contains_arbitrary_bytes(payload):
    from debezium_connector_vitess_spark.ops.multimodal import (
        decode_mp4_frame_table,
    )

    try:
        decode_mp4_frame_table(payload)
    except _media_errors():
        return


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, 20),
    st.integers(0, 4000),
    st.binary(min_size=1, max_size=8),
)
def test_mp4_frame_table_contains_mutated_fixtures(doc_id, pos, junk):
    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_mp4_samples,
        decode_mp4_frame_table,
    )

    base = _make_mp4_samples(doc_id, audio_first=doc_id % 3 == 0)
    pos %= len(base)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        decode_mp4_frame_table(mutated)
    except _media_errors():
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_warc_parser_contains_arbitrary_bytes(payload):
    from debezium_connector_vitess_spark.ops.warc import parse_warc_records

    try:
        parse_warc_records(payload)
    except _media_errors():
        pass


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, 20),
    st.integers(0, 1200),
    st.binary(min_size=1, max_size=8),
    st.booleans(),
)
def test_warc_parser_contains_mutated_fixtures(doc_id, pos, junk, gz):
    from debezium_connector_vitess_spark.ops.warc import (
        make_warc,
        parse_warc_records,
        split_gzip_members,
    )

    base = make_warc(
        doc_id,
        [(f"https://ex/{doc_id}", "<html><body><p>hi</p></body></html>")],
        gzip_records=gz,
        chunked_every=2,
    )
    pos %= len(base)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        if gz:
            for m in split_gzip_members(mutated):
                parse_warc_records(m)
        else:
            parse_warc_records(mutated)
    except _media_errors():
        pass
