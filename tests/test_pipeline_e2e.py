"""End-to-end training-data pipeline composition: the ops are designed to
chain into one lazy Spark plan — dedup survivors → PII scrub → quality +
perplexity gates → sequence packing → balanced shard write. This test runs
the whole chain on the documents table and checks the contracts hold at the
seams (no op breaks another's invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_connector_vitess_spark.ops.dedup import exact_dedup
from debezium_connector_vitess_spark.ops.layout import write_training_shards
from debezium_connector_vitess_spark.ops.pipeline import (
    doc_perplexity,
    pack_sequences,
    unigram_logprobs,
)
from debezium_connector_vitess_spark.ops.text import (
    redact_pii_expr,
    with_quality_score,
)


def test_training_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. exact dedup — survivors keyed by lowest doc_id per content hash
    survivors = exact_dedup(docs, "text", "doc_id")
    deduped = docs.join(survivors.select("doc_id"), on="doc_id", how="left_semi")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_raw

    # 2. PII scrub (idempotent on this corpus's clean text)
    scrubbed = deduped.withColumn("text", redact_pii_expr(F.col("text")))

    # 3. quality gates: composite score + unigram-LM perplexity, both
    #    computed on the scrubbed text the trainer would actually see
    lm = unigram_logprobs(scrubbed, "text")
    ppl = doc_perplexity(scrubbed, "text", "doc_id", lm)
    gated = (
        with_quality_score(scrubbed, "text")
        .join(ppl.select("doc_id", "perplexity"), on="doc_id")
        .filter((F.col("quality_score") >= 0.25) & F.col("perplexity").isNotNull())
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_dedup

    # 4. sequence packing into per-lang streams of 512-token blocks
    packed = pack_sequences(
        gated, "text", "doc_id", stream_col="lang", block_tokens=512
    )
    pk = packed.collect()
    assert len(pk) == n_gated
    by_stream: dict[str, list] = {}
    for r in sorted(pk, key=lambda r: (r["lang"], r["doc_id"])):
        by_stream.setdefault(r["lang"], []).append(r)
    for rows in by_stream.values():
        # offsets are a contiguous running total within each stream
        run = 0
        for r in rows:
            assert r["start_offset"] == run
            assert r["block_id"] == run // 512
            run += r["n_tokens"]

    # 5. balanced shard write of the gated corpus
    manifest = write_training_shards(
        gated.select("doc_id", "text", "lang"),
        str(tmp_path / "shards"),
        sort_col="doc_id",
        num_shards=4,
    ).collect()
    assert sum(r["rows"] for r in manifest) == n_gated
    spans = sorted((r["min_doc_id"], r["max_doc_id"]) for r in manifest)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_curation_pipeline_end_to_end(spark, sf_dir):
    """The round-4 curation ops chain the same way: paragraph dedup →
    trained-classifier quality scoring → DSIR importance → token-budget
    mixture sampling, one lazy plan over the documents table, contracts
    checked at every seam."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        dsir_importance,
        dsir_logratios,
        sample_token_budget,
        score_quality,
        train_quality_classifier,
    )
    from debezium_connector_vitess_spark.ops.text import drop_duplicate_paragraphs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. corpus-level paragraph dedup; rebuilt text replaces the original
    cleaned = (
        drop_duplicate_paragraphs(docs, "text", "doc_id", min_chars=20)
        .withColumnRenamed("text", "ctext")
        .join(docs.drop("text"), on="doc_id")
        .filter(F.length("ctext") > 0)
        .withColumnRenamed("ctext", "text")
    )
    n_clean = cleaned.count()
    assert 0 < n_clean <= n_raw

    # 2. quality classifier: English docs as the curated class, the rest raw
    pos = cleaned.filter("lang = 'en'")
    neg = cleaned.filter("lang <> 'en'")
    w = train_quality_classifier(pos, neg, "text", "doc_id", dim=512, iters=4)
    scored = score_quality(cleaned, "text", "doc_id", w, dim=512)
    en_mean = (
        scored.join(cleaned.select("doc_id", "lang"), on="doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("quality_prob").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in en_mean}
    assert means[True] > means[False]  # classifier orders the classes

    # 3. DSIR importance toward the same target distribution
    lr = dsir_logratios(pos, cleaned, "text", dim=512)
    weights = dsir_importance(cleaned, "text", "doc_id", lr, dim=512)
    assert weights.count() == n_clean

    # 4. mixture sampling under per-source token budgets over the curated set
    budgets = spark.createDataFrame(
        [("src0", 500), ("src1", 300)], "source string, budget_tokens long"
    )
    sel = sample_token_budget(
        cleaned, "text", "doc_id", domain_col="source", budgets=budgets
    ).collect()
    assert len(sel) > 0
    for dom, cap in (("src0", 500), ("src1", 300)):
        rows = sorted(
            (r for r in sel if r["source"] == dom), key=lambda r: r["doc_start"]
        )
        if len(rows) > 1:
            assert rows[-2]["doc_start"] + rows[-2]["n_tokens"] <= cap
        assert all(r["doc_start"] < cap for r in rows)


def test_corpus_triage_end_to_end(spark, sf_dir):
    """Round-5 triage chain: profile the corpus per domain, size the MinHash
    job from the s-curve, then run passage-level cross-corpus
    decontamination — the 'day one on a new corpus' sequence."""
    from debezium_connector_vitess_spark.ops.dedup import (
        minhash_dedup_pairs,
        tune_minhash_bands,
    )
    from debezium_connector_vitess_spark.ops.text import (
        corpus_profile,
        winnow_cross_match,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0. health snapshot: every domain accounted for, volumes consistent
    prof = {r["source"]: r for r in corpus_profile(docs, "text", "doc_id").collect()}
    assert sum(r["n_docs"] for r in prof.values()) == docs.count()
    assert all(0.0 <= r["dup_ratio"] <= 1.0 for r in prof.values())

    # 1. size the dedup job analytically, then run it with those knobs
    bands, rows = tune_minhash_bands(0.8, num_perm=64)
    pairs = minhash_dedup_pairs(
        docs, "text", "doc_id", threshold_num=4, threshold_den=5,
        num_perm=64, bands=bands, materialize=False,
    )
    assert pairs.count() >= 0  # geometry valid end to end

    # 2. passage-level decontamination of the src0 slice vs the rest
    hits = winnow_cross_match(
        docs.filter("source = 'src0'"),
        docs.filter("source <> 'src0'"),
        k=25, window=10, min_shared=2, max_doc_freq=5,
    )
    # soundness: each hit pair really crosses the frames
    for r in hits.limit(20).collect():
        assert r["left_id"] != r["right_id"]


def test_streaming_curation_chain_matches_batch(spark, sf_dir, tmp_path):
    """The stateless curation gates compose UNCHANGED on a streaming
    DataFrame behind the stateful dedup: file stream → exact_dedup_stream →
    PII scrub → staged quality score → threshold filter, collected per
    micro-batch. Because the stream replays the batch-deduped bootstrap
    first and duplicate copies after (the dedup_exact fixture), the
    streaming chain's total output must equal the identical BATCH chain on
    the bootstrap frame — one pipeline definition, two execution modes,
    same curated corpus."""
    from debezium_connector_vitess_spark.ops.dedup import exact_dedup_stream
    from debezium_connector_vitess_spark.sources.fixtures import (
        cached_fixture_dir,
        write_dedup_stream_fixture,
    )

    fixture = cached_fixture_dir("dedup_stream", sf_dir, write_dedup_stream_fixture)

    def gates(df):
        """The shared (streaming-safe, stateless) curation tail."""
        scrubbed = df.withColumn("text", redact_pii_expr(F.col("text")))
        return (
            with_quality_score(scrubbed, "text")
            .filter(F.col("quality_score") >= 0.25)
            .select("doc_id", F.round("quality_score", 6).alias("q"))
        )

    collected: list = []

    raw = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(fixture)
    )
    q = (
        gates(exact_dedup_stream(raw, "text").drop("content_hash"))
        .writeStream.foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    bootstrap = spark.read.parquet(f"{fixture}/batch_000_bootstrap.parquet")
    want = sorted((r.doc_id, r.q) for r in gates(bootstrap).collect())
    got = sorted((r.doc_id, r.q) for r in collected)
    assert got == want and len(got) > 0


def test_streaming_warc_and_jpeg_ingest_matches_batch(spark, sf_dir, tmp_path):
    """The round-10 ingest seams are STATELESS Arrow codecs, so the same
    call composes unchanged on a streaming DataFrame and processes each
    micro-batch independently: file stream → attach → parse, collected per
    micro-batch, must equal the identical batch chain over all files — one
    pipeline definition, two execution modes (the json_fields convention).
    Covers both the WARC record grammar and the JPEG/EXIF walker."""
    import os

    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_jpeg_payload,
        extract_jpeg_metadata,
    )
    from debezium_connector_vitess_spark.ops.warc import (
        attach_warc_payload,
        warc_records,
    )

    src = tmp_path / "docs"
    os.makedirs(src)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(30)
    )
    rows = docs.collect()
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(3):
        chunk = rows[i * 10:(i + 1) * 10]
        tbl = pa.table(
            {
                "doc_id": pa.array([r.doc_id for r in chunk], pa.int64()),
                "text": pa.array([r.text for r in chunk], pa.string()),
            }
        )
        p = str(src / f"f{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + i * 10,) * 2)

    def warc_chain(df):
        return warc_records(attach_warc_payload(df)).select(
            "doc_id", "target_uri", F.md5(F.col("body")).alias("body_md5")
        )

    def jpeg_chain(df):
        return extract_jpeg_metadata(attach_jpeg_payload(df))

    batch = spark.read.parquet(str(src))
    for name, chain in (("warc", warc_chain), ("jpeg", jpeg_chain)):
        collected: list = []
        raw = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            chain(raw)
            .writeStream.foreachBatch(
                lambda df, _b: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        want = sorted(tuple(r) for r in chain(batch).collect())
        got = sorted(tuple(r) for r in collected)
        assert got == want and len(got) == 30, name


def test_chunk_then_pack_sequence_prep(spark, sf_dir):
    """The real sequence-prep path: chunk long documents into context
    windows, then PACK the chunk grain — every chunk placed exactly once,
    stream totals conserve the chunk token counts, and a block never starts
    mid-air (offset arithmetic stays consistent at the finer grain)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        chunk_documents,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(
        docs, "text", "doc_id", chunk_tokens=32, overlap=8,
        carry_cols=("source",), include_text=True,
    ).withColumn("chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx"))
    placed = pack_sequences(
        chunks, "chunk_text", "chunk_id", stream_col="source", block_tokens=256
    )
    n_chunks = chunks.count()
    assert placed.count() == n_chunks  # every chunk placed exactly once
    # placement token counts == the chunker's own n_tokens, row for row
    joined = placed.alias("p").join(
        chunks.alias("c"), F.col("p.chunk_id") == F.col("c.chunk_id")
    )
    assert joined.filter(F.col("p.n_tokens") != F.col("c.n_tokens")).count() == 0
    # per-stream conservation: last start_offset + n_tokens == sum(n_tokens)
    agg = placed.groupBy("source").agg(
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
        F.sum("n_tokens").alias("total"),
    )
    assert agg.filter(F.col("end") != F.col("total")).count() == 0
    # block arithmetic holds at the chunk grain
    bad = placed.filter(
        (F.col("block_id") != F.floor(F.col("start_offset") / 256))
        | (F.col("offset_in_block") != F.col("start_offset") % 256)
    )
    assert bad.count() == 0


def test_bpe_counts_denominate_budget_and_packing(spark, sf_dir):
    """Real-vocabulary integration: bpe_encode's counts flow through
    pack_sequences and plan_token_budgets/sample_token_budget via
    token_count_col, so offsets and budgets are denominated in learned
    tokens — totals conserve the BPE counts exactly, and budgets never
    exceed the BPE-denominated availability."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.bpe import bpe_encode, train_bpe
    from debezium_connector_vitess_spark.ops.pipeline import (
        pack_sequences,
        plan_token_budgets,
        sample_token_budget,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    merges = train_bpe(docs, "text", num_merges=60, sample_rows=200)
    counts = bpe_encode(docs, "text", "doc_id", merges, output="count")
    with_counts = docs.join(counts, docs.doc_id == counts.id).drop("id")

    placed = pack_sequences(
        with_counts, "text", "doc_id", stream_col="source",
        block_tokens=512, token_count_col="n_bpe_tokens",
    )
    # per-stream conservation in BPE units
    want = {
        r["source"]: r["t"]
        for r in with_counts.groupBy("source")
        .agg(F.sum("n_bpe_tokens").alias("t"))
        .collect()
    }
    got = {
        r["source"]: r["t"]
        for r in placed.groupBy("source")
        .agg(F.max(F.col("start_offset") + F.col("n_tokens")).alias("t"))
        .collect()
    }
    assert got == want

    plan = plan_token_budgets(
        with_counts, "text", domain_col="source", total_tokens=5_000,
        proportions={"src0": 0.5, "src1": 0.5}, token_count_col="n_bpe_tokens",
    )
    avail = {
        r["source"]: r["t"]
        for r in with_counts.filter(F.col("source").isin("src0", "src1"))
        .groupBy("source").agg(F.sum("n_bpe_tokens").alias("t")).collect()
    }
    for r in plan.collect():
        assert r["budget_tokens"] <= avail[r[plan.columns[0]]]
    picked = sample_token_budget(
        with_counts, "text", "doc_id", domain_col="source", budgets=plan,
        token_count_col="n_bpe_tokens",
    )
    # every selected doc's n_tokens is its BPE count, not the regex count
    chk = picked.alias("p").join(
        with_counts.alias("c"), F.col("p.doc_id") == F.col("c.doc_id")
    )
    assert chk.filter(F.col("p.n_tokens") != F.col("c.n_bpe_tokens")).count() == 0


def test_incremental_ingest_diff_then_cross_dedup(spark, sf_dir):
    """The incremental-pipeline composition: corpus_diff classifies a new
    snapshot against the standing corpus, and ONLY the added/changed
    sliver runs cross-frame MinHash dedup against the standing side — a
    near-duplicate introduced by the ingest is caught without ever
    re-deduping the unchanged corpus."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.dedup import minhash_cross_pairs
    from debezium_connector_vitess_spark.ops.pipeline import corpus_diff

    old = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # new snapshot = old, plus one near-duplicate of doc 3 and one fresh doc
    dup_src = old.filter(F.col("doc_id") == 3).collect()[0]["text"]
    new = old.unionByName(
        spark.createDataFrame(
            [
                (900001, dup_src + " trailing edit"),
                (900002, "a genuinely novel document about rigging maintenance"),
            ],
            "doc_id bigint, text string",
        )
    )
    delta = corpus_diff(old, new, "doc_id", compare_cols=["text"])
    added_ids = [r["id"] for r in delta.filter("change = 'added'").collect()]
    assert sorted(added_ids) == [900001, 900002]

    added_docs = new.filter(F.col("doc_id").isin(added_ids))
    pairs = minhash_cross_pairs(
        added_docs, old, "text", "doc_id", num_perm=32, bands=8
    ).filter(F.col("inter_size") * 5 >= F.col("union_size") * 4)  # jaccard >= 0.8
    hits = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
    assert (900001, 3) in hits            # the ingest near-dup is caught
    assert all(n != 900002 for n, _c in hits)  # the novel doc is clean


def test_stream_enriched_by_materialized_cdc_state(spark, sf_dir, tmp_path):
    """The engine's two halves composed: an event stream is enriched per
    micro-batch with the CDC-materialized latest state (broadcast
    stream-static join inside foreachBatch — the standard Spark pattern
    for slowly-changing dimensions), and as-of enrichment against the SAME
    changelog-derived frame agrees with the final-state join for events
    after the last change."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.materialize import materialize_latest
    from debezium_connector_vitess_spark.metrics import asof_join

    # a small changelog: user tiers changing over time
    env = spark.createDataFrame(
        [
            ("c", "MySQL56/h:1-1", (None, None), (1, "bronze"), ("t",)),
            ("u", "MySQL56/h:1-2", (1, "bronze"), (1, "gold"), ("t",)),
            ("c", "MySQL56/h:1-3", (None, None), (2, "silver"), ("t",)),
        ],
        "op string, gtid string,"
        " before struct<user_id:int, tier:string>,"
        " after struct<user_id:int, tier:string>,"
        " source struct<table:string>",
    )
    latest = materialize_latest(env, key_cols=["user_id"], value_cols=["tier"])

    src = tmp_path / "events_src"
    src.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "user_id": pa.array([1, 2, 3], pa.int64()),
        }
    )
    pq.write_table(tbl, str(src / "f0.parquet"))

    enriched: list = []

    def enrich(batch_df, _bid):
        out = batch_df.join(
            F.broadcast(latest.withColumn("user_id", F.col("user_id").cast("long"))),
            on="user_id",
            how="left",
        )
        enriched.extend(out.collect())

    q = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .parquet(str(src))
        .writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["event_id"]: r["tier"] for r in enriched}
    # user 1's latest tier is gold (the update won); user 3 is unknown
    assert got == {10: "gold", 11: "silver", 12: None}

    # the as-of view of the same changelog agrees at the end of history
    changes = env.filter("op != 'd'").select(
        F.col("after.user_id").cast("long").alias("user_id"),
        F.timestamp_millis(
            F.regexp_extract("gtid", r"(\d+)$", 1).cast("long") * 1000
        ).alias("ts"),
        F.col("after.tier").alias("tier"),
    )
    events = spark.createDataFrame(
        [(10, 1, 99_000), (11, 2, 99_000), (12, 3, 99_000)],
        "event_id bigint, user_id bigint, ts_ms bigint",
    ).select("event_id", "user_id", F.timestamp_millis("ts_ms").alias("ts"))
    asof = {
        r["event_id"]: r["tier_r"]
        for r in asof_join(
            events, changes, on="user_id", value_cols=["tier"]
        ).collect()
    }
    assert asof == got


def test_sft_dataset_prep_end_to_end(spark, sf_dir):
    """The round-8 gates composed the way an SFT dataset is actually built:
    badword gate (cheapest, first) → Gopher repetition gate → near-dup
    clustering → leakage-safe cluster-keyed split → train slice →
    no-split bin packing. Contracts at every seam: gates only shrink, no
    near-dup pair straddles splits, every surviving doc is placed exactly
    once, no bin over capacity."""
    from collections import defaultdict

    from debezium_connector_vitess_spark.ops.dedup import (
        connected_components,
        minhash_dedup_pairs,
    )
    from debezium_connector_vitess_spark.ops.pipeline import (
        assign_splits,
        pack_bins,
    )
    from debezium_connector_vitess_spark.ops.text import (
        filter_badwords,
        filter_by_repetition,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1-2. scan-stage gates, composable because both are plain filters
    gated = filter_by_repetition(
        filter_badwords(docs, "text", ["dup", "batch batch"]), "text"
    )
    n_gated = gated.count()
    assert 0 < n_gated < n_raw

    # 3-4. cluster near-dups among survivors, split on the CLUSTER id
    pairs = minhash_dedup_pairs(gated, "text", "doc_id").select("id_a", "id_b")
    labels = connected_components(gated.select("doc_id"), pairs, id_col="doc_id")
    split = assign_splits(
        labels, "cluster_id",
        fractions={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    by_cluster = defaultdict(set)
    for r in split.collect():
        by_cluster[r["cluster_id"]].add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # every near-dup pair shares a split by construction
    p = pairs.join(split.select(F.col("doc_id").alias("id_a"),
                                F.col("split").alias("sa")), "id_a") \
             .join(split.select(F.col("doc_id").alias("id_b"),
                                F.col("split").alias("sb")), "id_b")
    assert p.filter(F.col("sa") != F.col("sb")).count() == 0

    # 5. pack the train slice whole-document
    train = gated.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    n_train = train.count()
    placed = pack_bins(train, "text", "doc_id", stream_col="source",
                       block_tokens=256)
    rows = placed.collect()
    assert len(rows) == n_train  # every survivor placed exactly once
    fill = defaultdict(int)
    for r in rows:
        assert not r["is_oversize"]
        fill[(r["source"], r["bin_id"])] += r["n_tokens"]
    assert all(v <= 256 for v in fill.values())
