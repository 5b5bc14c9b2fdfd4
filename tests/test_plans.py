"""Physical-plan shape regressions: the plans we designed for 100 TB stay
the plans Catalyst actually picks. These assertions catch silent
regressions (a broadcast degrading to sort-merge, a filter no longer
reaching the scan, Python sneaking into a codegen'd path) that row-level
correctness tests cannot see."""

from __future__ import annotations

import pytest

from debezium_connector_vitess_spark.registry import QUERIES


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_revenue_by_nation_broadcasts_dimensions(spark, sf_dir):
    """customer/nation are dimension tables: they must broadcast; only the
    lineitem⋈orders fact join may shuffle."""
    plan = _formatted(QUERIES["revenue_by_nation"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, sf_dir):
    """The shipdate predicate reaches the parquet scan and the scan reads
    only the referenced columns — at 100 TB this is the difference between
    scanning 5 columns and scanning the table."""
    plan = _formatted(QUERIES["pricing_summary"](spark, sf_dir))
    scan = plan[plan.index("(1) Scan parquet") :]
    scan = scan[: scan.index("\n\n")]
    assert "PushedFilters" in scan and "l_shipdate" in scan.split("PushedFilters", 1)[1]
    read_schema = scan.split("ReadSchema:", 1)[1]
    for col in ("l_returnflag", "l_linestatus", "l_quantity"):
        assert col in read_schema
    assert "l_comment" not in read_schema  # pruned


@pytest.mark.parametrize(
    "name",
    ["cdc_envelope", "text_metrics", "filter_column_ops", "type_decode_all"],
)
def test_catalyst_only_paths_have_no_python_eval(spark, sf_dir, name):
    """The decode spine, SMTs, and text analysis are pure Catalyst — no
    row-at-a-time or Arrow Python evaluation nodes may appear. cdc_envelope
    is pinned on its typed side only: the wire leg is a streaming replay
    whose plan contributes just a LocalTableScan (and whose execution —
    fixture + availableNow query — has no place in a plan test)."""
    if name == "cdc_envelope":
        plan = _formatted(QUERIES[name](spark, sf_dir, sides=("typed",)))
    else:
        plan = _formatted(QUERIES[name](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_minhash_candidates_join_is_hash_equi_join(spark, sf_dir):
    """The LSH candidate self-join must be an equi-join on (band, bhash) —
    never a cartesian/broadcast-nested-loop (the all-pairs failure mode)."""
    from debezium_connector_vitess_spark.ops.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _formatted(minhash_dedup_pairs(docs, "text", "doc_id", materialize=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_brute_force_broadcasts_queries(spark, sf_dir):
    """Brute-force top-k broadcasts the small query side so the corpus never
    shuffles."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    plan = _formatted(brute_force_topk(emb, queries, k=5))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_corpus_assignment_is_narrow(spark, sf_dir):
    """IVF centroid assignment must be a literal-centroid projection: no
    cross-join row inflation and no window shuffle carrying the corpus
    vectors (the pattern that dies at 100 TB)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        _collect_centroids,
        assign_centroids,
        sampled_centroid_frame,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = _collect_centroids(
        sampled_centroid_frame(emb, id_col="vec_id", vec_col="embedding", n_centroids=16)
    )
    assigned = assign_centroids(
        emb.select("vec_id", F.col("embedding").alias("cvec")), cents, vec_col="cvec"
    )
    plan = _formatted(assigned)
    assert "Exchange" not in plan  # zero shuffles
    assert "Window" not in plan
    assert "Join" not in plan


def test_brute_force_topk_prunes_before_shuffle(spark, sf_dir):
    """The rank<=k filter must push a PARTIAL WindowGroupLimit below the
    exchange, so each map partition ships at most k rows per query — the
    shuffle carries ~k·|Q|·partitions triples, never the scored corpus."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and ", Partial" in plan and ", Final" in plan
    # the Partial group-limit appears BELOW (after, in tree print order) the
    # hash exchange that feeds the Final one
    exchange_pos = plan.index("Exchange hashpartitioning(query_id")
    partial_pos = plan.index(", Partial")
    assert partial_pos > exchange_pos


def test_cdc_materialize_is_partial_agg_not_window(spark, sf_dir):
    """Latest-state materialization must reduce map-side (max_by partial
    aggregation) — never a per-key sort window. At 100 TB of changelog the
    exchange then carries ~|live keys|, not the full event stream."""
    from debezium_connector_vitess_spark import changelog
    from debezium_connector_vitess_spark.materialize import materialize_latest_multi

    raw = changelog.events_to_raw_vevents(changelog.load_events(spark, sf_dir))
    schemas = [changelog.change_table_schema(t) for t in ("tbl0", "tbl1", "tbl2")]
    snaps = materialize_latest_multi(raw, schemas, materialize=False)
    plan = _formatted(next(iter(snaps.values())))
    assert "Window" not in plan
    assert "max_by" in plan
    # partial aggregate below the exchange, final above it
    assert "partial_max_by" in plan or plan.count("HashAggregate") >= 2


def test_cdc_materialize_compacts_in_one_pass(spark, sf_dir):
    """The multi-table materialization scans the changelog ONCE per
    consumption shape: the compacted snapshot (and, r6, the windowed SCD2
    history) is checkpointed at construction, so every per-table consumer
    plan reads the checkpointed blocks — zero parquet scans and zero Window
    nodes downstream. (Without the materialization Catalyst pushes each
    branch's table filter below the exchange and the scan runs once per
    table.)"""
    from debezium_connector_vitess_spark.cache import checkpoint_scope

    with checkpoint_scope(spark):
        plan = _formatted(QUERIES["cdc_materialize"](spark, sf_dir))
        assert "Scan parquet" not in plan
        assert "ExistingRDD" in plan
        assert "Window" not in plan


def test_curation_pipeline_reads_materialized_base_once(spark, sf_dir):
    """The five curation stages must all read the ONE localCheckpoint-
    materialized cleaned corpus — zero parquet scans in the final plan (the
    uncheckpointed form re-ran the HTML-extract + paragraph-dedup chain per
    stage: 16 source scans). No cartesian products anywhere."""
    from debezium_connector_vitess_spark.cache import checkpoint_scope

    with checkpoint_scope(spark):
        plan = _formatted(QUERIES["curation_pipeline"](spark, sf_dir))
        assert "Scan parquet" not in plan
        assert "ExistingRDD" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # fixed-weight / log-ratio tables


def test_multimodal_metadata_is_one_scan_no_joins(spark, sf_dir):
    """Each side of the combined extractor is one payload seam + one decode
    seam over a single scan — zero joins (the per-modality composition
    costs three scans plus five doc_id joins); the full two-side row is a
    plain union (two scans, still zero joins)."""
    import re

    for side in ("core", "jpeg"):
        plan = _formatted(
            QUERIES["multimodal_metadata"](spark, sf_dir, sides=(side,))
        )
        # distinct scan NODES (formatted mode lists each node in the tree
        # and again in the details section)
        assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1, side
        for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                     "CartesianProduct", "BroadcastNestedLoopJoin"):
            assert join not in plan, (side, join)
    full = _formatted(QUERIES["multimodal_metadata"](spark, sf_dir))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", full))) == 2
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in full, join


def test_winnow_pairs_join_is_capped_equi_join(spark, sf_dir):
    """Winnowing candidates join on the 8-byte fingerprint hash (equi-join,
    long key), with the document-frequency cap applied as a left_anti on
    the same key — never a cartesian."""
    import re

    plan = _formatted(QUERIES["winnow_match_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"fp#\d+L", plan), "fingerprint key must be a long"
    assert "LeftAnti" in plan  # the doc-frequency cap


def test_simhash_segment_join_is_equi_join(spark, sf_dir):
    """SimHash candidates join on (segment, 15-bit key) — an equi-join over
    32,768 buckets per segment at the 60-bit default, never a cartesian."""
    plan = _formatted(QUERIES["dedup_pairs"](spark, sf_dir, sides=("simhash",)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unigram_lm_has_no_single_partition_window(spark, sf_dir):
    """The LM's corpus-total scalars must come from a distributed aggregate
    + broadcast — a Window.partitionBy() over the vocabulary would funnel
    every distinct token (billions at web scale) through one task."""
    from debezium_connector_vitess_spark.ops.pipeline import unigram_logprobs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _formatted(unigram_logprobs(docs, "text"))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ngram_jaccard_shuffles_carry_longs_not_strings(spark, sf_dir):
    """The prefix-filtered Jaccard pipeline runs on 64-bit shingle hashes
    end to end: no string-typed shingle attribute appears in the plan's
    exchanges — shingle text never shuffles."""
    import re

    df = QUERIES["dedup_pairs"](spark, sf_dir, sides=("ngram",))
    plan = _formatted(df)
    assert re.search(r"shingle#\d+L", plan), "hashed shingle key missing"
    assert not re.search(r"shingle#\d+(?!L)\b", plan), "string shingle leaked"
    assert "CartesianProduct" not in plan
    # r11: the verify's second join must be a ShuffledHashJoin keyed on the
    # COMPOSITE (id_b, shingle) with the corpus side as build. Keyed on id
    # alone the intermediate explodes to pairs x |A| x |B| (measured 46 GB
    # of shuffle at 50k docs); as a SortMergeJoin the pair-proportional
    # stream SORTS, and its spill was the scratch-disk killer at 250k docs.
    # (executedPlan toString — the formatted mode splits keys off the node
    # line.)
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    shj = re.search(
        r"ShuffledHashJoin \[id_b#\d+L, shingle#\d+L\], "
        r"\[id_b#\d+L, shingle#\d+L\], Inner, BuildRight",
        exec_plan,
    )
    assert shj, "verify join lost its composite-key shuffled-hash shape"


def test_interpolated_perplexity_shuffle_carries_hashed_keys(spark, sf_dir):
    """The interpolated gate's only corpus shuffle joins on the 64-bit
    (prev, token) hash after every string-keyed lookup has been resolved
    broadcast-side: no string-typed prev/token attribute may appear in a
    hash-partitioning exchange."""
    import re

    from debezium_connector_vitess_spark.ops.pipeline import (
        bigram_logprobs,
        doc_perplexity_interpolated,
        unigram_logprobs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    uni = unigram_logprobs(docs, "text")
    bi = bigram_logprobs(docs, "text")
    plan = _formatted(doc_perplexity_interpolated(docs, "text", "doc_id", uni, bi))
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for keys in exchanges:
        assert "prev#" not in keys and "token#" not in keys, keys
    assert any("__bh#" in k for k in exchanges) or "BroadcastHashJoin" in plan


def test_winnow_combined_row_fingerprints_once(spark, sf_dir):
    """The merged self+cross winnow row must fingerprint the corpus ONCE:
    every consumer reads the materialized (id, fp) frame, so the final plan
    carries NO Python seam (the Arrow fingerprinting ran during the eager
    checkpoint build) and no parquet re-scan of the documents table."""
    from debezium_connector_vitess_spark.cache import checkpoint_scope

    with checkpoint_scope(spark):
        plan = _formatted(QUERIES["winnow_match_pairs"](spark, sf_dir))
        assert "ExistingRDD" in plan  # the one materialized fingerprint frame
        assert "MapInPandas" not in plan
        assert "Scan parquet" not in plan
        assert "CartesianProduct" not in plan


def test_corpus_health_is_one_scan_one_groupby(spark, sf_dir):
    """corpus_health chains the zlib seam under the staged metrics
    projection: ONE parquet scan, ONE Arrow seam, one groupBy(domain) — no
    joins (the compression aggregate rides the same aggregation as every
    profile metric)."""
    import re

    plan = _formatted(QUERIES["corpus_health"](spark, sf_dir, sides=("batch",)))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1
    assert plan.count("MapInPandas") <= 2  # one seam node (+ details echo)
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join


def test_json_fields_row_is_map_only(spark, sf_dir):
    """The json_fields driver row is two codegen'd from_json projections
    unioned: zero exchanges, zero joins, zero Python seams — a JSON parse
    that shuffles or drops to Python would be the wrong plan at 100 TB.
    (The only exchanges allowed are the harness's explicit
    REPARTITION_BY_NUM spread of the single-file test scan — never an
    ENSURE_REQUIREMENTS shuffle demanded by the parse itself.)"""
    plan = _formatted(QUERIES["json_fields"](spark, sf_dir))
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "hashpartitioning" not in plan
    assert "MapInPandas" not in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join


def test_pack_sequences_shares_one_exchange(spark, sf_dir):
    """The two-level cumsum's bucket totals and per-doc window must consume
    the SAME (stream, bucket) repartition, so AQE's stage cache runs the
    scan + token-count once at runtime (stages are reused by canonicalized
    plan — the static tree still prints both branches). Pin the
    precondition: both branches' shuffles are REPARTITION_BY_COL on
    identical (source, __bucket) keys — without the explicit repartition
    the totals branch shuffles post-partial-agg (ENSURE_REQUIREMENTS, not
    canonically equal) and each branch re-scans and re-token-counts."""
    import re

    from debezium_connector_vitess_spark.ops.pipeline import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = pack_sequences(
        docs, "text", "doc_id", stream_col="source", block_tokens=512,
        n_buckets=4, bucket_bounds=[100, 200, 300],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    reparts = re.findall(
        r"Exchange hashpartitioning\(source#\d+, __bucket#\d+[^\n]*REPARTITION_BY_COL",
        plan,
    )
    assert len(reparts) == 2, plan[:2000]
    # the token-count projection sits BELOW both those exchanges (inside the
    # reused stage), never above them
    for seg in plan.split("REPARTITION_BY_COL")[1:]:
        head = seg.split("Exchange")[0]
        assert "split(text" in head


def test_chunk_documents_is_map_only_and_tokenizes_once(spark, sf_dir):
    """The chunking side is a pure narrow pipeline — no Exchange at any
    size — and the tokenization regex appears ONCE in the physical plan
    (staged as a real column below the Generate; the non-empty gate is an
    rlike on the raw text, so the predicate doesn't re-run the split)."""
    from debezium_connector_vitess_spark.ops.pipeline import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        chunk_documents(docs, "text", "doc_id", chunk_tokens=32, overlap=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("split(text") == 1, plan[:2000]


def test_dedup_spans_shuffles_carry_longs_only(spark, sf_dir):
    """The ExactSubstr detector's exchanges carry only (id, pos, 8-byte gram
    hash) — gram strings are hashed before the posexplode, so no string-typed
    attribute may appear in any hash-partitioning exchange; the membership
    join-back is a LEFT SEMI (no pair fan-out), and both consumers read the
    materialized hash frame, never a second parquet scan."""
    import re

    plan = _formatted(QUERIES["dedup_spans"](spark, sf_dir))
    assert "Scan parquet" not in plan  # hits flow from the localCheckpoint
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        for attr in re.findall(r"(\w+)#\d+(L?)", keys):
            name, is_long = attr
            if name in ("__h",):
                assert is_long == "L", f"gram hash not a long in exchange: {keys}"
            assert name != "__toks", f"token array leaked into exchange: {keys}"


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed the same way on the join key must SortMergeJoin
    with ZERO Exchange — the write-time layout (ops.layout.write_bucketed)
    replaces the per-query shuffle. This is the hub-table contract for a
    corpus joined repeatedly on doc_id at 100 TB: pay the layout once at
    ingest, every consumer join is co-located."""
    from debezium_connector_vitess_spark.ops.layout import write_bucketed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prev_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    try:
        spark.sql("DROP TABLE IF EXISTS bkt_docs")
        spark.sql("DROP TABLE IF EXISTS bkt_signals")
        write_bucketed(
            docs.select("doc_id", "text"), "bkt_docs",
            bucket_col="doc_id", num_buckets=8,
        )
        write_bucketed(
            docs.select("doc_id", "lang", "n_chars"), "bkt_signals",
            bucket_col="doc_id", num_buckets=8,
        )
        # the merge hint (on a join INPUT) forbids broadcast so the test
        # exercises the co-located SMJ path a 100 TB-sized side would take
        joined = (
            spark.table("bkt_docs")
            .hint("merge")
            .join(spark.table("bkt_signals"), "doc_id")
            .where("n_chars >= 0")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        n = joined.count()
        assert n == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_docs")
        spark.sql("DROP TABLE IF EXISTS bkt_signals")
        _ = prev_wh  # warehouse dir untouched; tables dropped above


def test_change_rate_windows_materializes_events_once(spark, sf_dir):
    """Tumbling and sliding aggregate the same frame: the events scan is
    localCheckpoint-materialized once, so the final union plan reads the
    in-memory blocks — zero parquet scans (the materialize-once rule for
    multi-consumer registry rows)."""
    from debezium_connector_vitess_spark.cache import checkpoint_scope

    with checkpoint_scope(spark):
        plan = _formatted(QUERIES["change_rate_windows"](spark, sf_dir))
    assert "Scan parquet" not in plan


def test_semantic_dedup_shape(spark, sf_dir):
    """SemDeDup's plan: centroid assignment is the literal-argmax projection
    (no join/window for assignment), the within-cluster pairing is a plain
    equi-join on cluster_id (never a cartesian/BNLJ — cluster size is the
    knob, AQE can split stragglers), and the conviction/join-back legs move
    ids only."""
    from debezium_connector_vitess_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # materialize=False keeps the full lazy plan visible (the checkpointed
    # form hides the assignment subtree behind a LogicalRDD)
    plan = _formatted(semantic_dedup(emb, threshold=0.4, materialize=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_badword_gate_fuses_into_scan(spark, sf_dir):
    """The badword filter is a scan-stage predicate: no Exchange, no Python
    evaluation — the cheapest gate, which is why it runs first in the
    curation order. Both modes."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import filter_badwords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for mode in ("regex", "token"):
        plan = _formatted(filter_badwords(docs, "text", ["dup"], mode=mode))
        assert "Exchange" not in plan, mode
        for py in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
            assert py not in plan, mode


def test_assign_splits_is_map_only(spark, sf_dir):
    """Split assignment is a pure narrow projection — no shuffle, no
    assignment table to join: the property that makes it free at 100 TB."""
    from debezium_connector_vitess_spark.ops.pipeline import assign_splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _formatted(assign_splits(
        docs, "doc_id", fractions={"train": 0.9, "test": 0.1}))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_mp4_frame_index_is_one_seam_no_shuffle(spark, sf_dir):
    """The frame-index demux is exactly two chained Arrow seams (payload
    synthesis + demux) with no Exchange between them — payloads never
    cross the wire."""
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_mp4_sample_payload,
        mp4_frame_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = mp4_frame_index(attach_mp4_sample_payload(docs))
    plan = _formatted(df)
    assert "Exchange" not in plan
    # executedPlan lists each node once (formatted mode mentions them twice)
    assert df._jdf.queryExecution().executedPlan().toString().count("MapInPandas") == 2


def test_pack_bins_shuffles_scalars_only(spark, sf_dir):
    """pack_bins' single exchange carries (id, stream, n_tokens, bucket)
    scalars — the token payloads are counted map-side and never shuffle."""
    from debezium_connector_vitess_spark.ops.pipeline import pack_bins

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = pack_bins(docs, "text", "doc_id", stream_col="source",
                   block_tokens=256)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    exch = plan[plan.index("Exchange"):]
    assert "text" not in exch.split("\n")[0]
    assert "FlatMapGroupsInPandas" in plan


def test_minhash_stream_shuffle_fence_single_tokenize(spark):
    """The streaming MinHash signature stage builds its hashed-shingle
    array under a shuffle() optimizer fence (r11, ex Arrow identity seam):
    the tokenize+shingle+hash subtree must appear in the physical plan
    EXACTLY as often as one evaluation — CollapseProject must not inline it
    into the per-permutation minima, and the empty-shingle size() filter
    must not be pushed below it (each would re-run the subtree). Pinned on
    a batch frame through the same expression helpers the stream uses."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.dedup import (
        _hashed_shingle_array,
        _perm_min_cols,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    base = df.select(
        F.col("doc_id").alias("id"),
        _hashed_shingle_array(F.col("text"), 3).alias("shashes"),
    )
    one_eval = base._jdf.queryExecution().executedPlan().toString().count("split(")

    fenced = df.select(
        F.col("doc_id").alias("id"),
        F.shuffle(_hashed_shingle_array(F.col("text"), 3)).alias("shashes"),
    ).filter(F.size("shashes") > 0)
    sig = fenced.select("id", *_perm_min_cols(F.col("shashes"), 32))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(") == one_eval  # exactly ONE subtree evaluation
    assert "MapInPandas" not in plan  # the fence replaced the Arrow seam
