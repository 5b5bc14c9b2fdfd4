"""Extension-operator tests: dedup/similarity/text/multimodal semantics that
the oracle can't cover (LSH recall, stub plumbing shape)."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_lsh_topk_recall(spark, sf_dir):
    """LSH-bucketed ANN must reach ≥0.5 rank-overlap with brute force at
    4 planes on this data (bucketing trades recall for a 2^p candidate cut;
    the knob is num_planes)."""
    from debezium_connector_vitess_spark.ops.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=5, num_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_buckets_partition_corpus(spark, sf_dir):
    from debezium_connector_vitess_spark.ops.similarity import _hyperplanes, lsh_bucket_expr

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = _hyperplanes(64, 4)
    buckets = emb.select(lsh_bucket_expr("`embedding`", planes).alias("b")).groupBy(
        "b"
    ).count().collect()
    assert len(buckets) > 1  # corpus actually splits
    assert sum(r["count"] for r in buckets) == emb.count()


def test_hyperplanes_deterministic():
    from debezium_connector_vitess_spark.ops.similarity import _hyperplanes

    a = _hyperplanes(8, 2)
    b = _hyperplanes(8, 2)
    assert a == b
    n = sum(v * v for v in a[0])
    assert abs(n - 1.0) < 1e-9  # unit norm


def test_minhash_candidates_superset_of_high_jaccard(spark, sf_dir):
    """LSH candidates must contain every truly-high-jaccard pair (recall)."""
    from debezium_connector_vitess_spark.ops.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs_bruteforce,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs_bruteforce(docs, "text", "doc_id")
        .filter(F.col("inter_size") * 5 >= F.col("union_size") * 4)
        .collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, "text", "doc_id").collect()
    }
    assert truth <= cand, f"missed pairs: {truth - cand}"


def test_exact_dedup_collapses(spark):
    from debezium_connector_vitess_spark.ops.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello, World!"),
            Row(doc_id=2, text="hello   world"),  # same after normalization
            Row(doc_id=3, text="different entirely"),
        ]
    )
    out = exact_dedup(df, "text", "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_multimodal_metadata_shape(spark, sf_dir):
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_binary_payload,
        extract_image_metadata,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payload = attach_binary_payload(docs)
    assert dict(payload.dtypes)["payload"] == "binary"
    meta = extract_image_metadata(payload)
    rows = meta.collect()
    assert len(rows) == 20
    assert all(len(r["content_md5"]) == 32 and r["byte_len"] > 0 for r in rows)
    frames = sample_frames(payload).collect()
    assert all(r["sampled_frames"] >= 1 for r in frames)


def test_simhash_identical_docs_same_signature(spark):
    from debezium_connector_vitess_spark.ops.text import simhash_expr

    df = spark.createDataFrame(
        [Row(t="spark table join query fast"), Row(t="spark table join query fast"),
         Row(t="completely other words here now")]
    )
    sims = [r["s"] for r in df.select(simhash_expr(F.col("t"), 32).alias("s")).collect()]
    assert sims[0] == sims[1]
    assert sims[0] != sims[2]


def test_lang_id_script_detection(spark):
    from debezium_connector_vitess_spark.ops.text import lang_id_expr

    df = spark.createDataFrame(
        [
            Row(t="the cat sat on the mat and it is fine"),
            Row(t="el perro la casa de los una que en por"),
            Row(t="der hund und die katze ist ein zu von"),
            Row(t="中文文本示例"),
            Row(t="xyzzy plugh"),
        ]
    )
    out = [r["l"] for r in df.select(lang_id_expr(F.col("t")).alias("l")).collect()]
    assert out == ["en", "es", "de", "zh", "und"]


def test_ivf_topk_recall(spark, sf_dir):
    """IVF probes 4/16 of the corpus; recall vs brute force must stay high on
    clustered data (embeddings table has label clusters)."""
    from debezium_connector_vitess_spark.ops.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_connected_components_basic(spark):
    from pyspark.sql import Row

    from debezium_connector_vitess_spark.ops.dedup import connected_components

    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(1, 8)])
    # components: {1,2,3} (chain), {4,5}, {6}, {7}
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=4, id_b=5)]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, pairs, id_col="doc_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_decontaminate_known_overlap(spark):
    from pyspark.sql import Row

    from debezium_connector_vitess_spark.ops.pipeline import decontaminate

    train = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
         Row(doc_id=2, text="one two three four five six")]
    )
    ev = spark.createDataFrame(
        [Row(doc_id=10, text="alpha beta gamma delta epsilon other"),  # shares one 5-gram
         Row(doc_id=11, text="totally different words here now friend")]
    )
    out = {r["doc_id"]: r["n_hits"] for r in decontaminate(train, ev, "text", "doc_id", ngram=5).collect()}
    assert out == {10: 1}


def test_duplicated_spans_known_injection(spark):
    """ExactSubstr semantics on a hand-built corpus: a 7-token phrase shared
    across two docs yields one maximal span per doc (3 merged k=5 windows),
    a within-doc repeat counts as duplication, and an all-unique doc emits
    nothing."""
    from pyspark.sql import Row

    from debezium_connector_vitess_spark.ops.text import duplicated_spans

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="u1 u2 a b c d e f g u3 u4"),
            Row(doc_id=2, text="a b c d e f g v1 v2 v3"),
            Row(doc_id=3, text="p q r s t x1 p q r s t"),
            Row(doc_id=4, text="w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        ]
    )
    out = sorted(map(tuple, duplicated_spans(docs, min_tokens=5).collect()))
    assert out == [
        (1, 2, 8, 7, 3),  # (doc, span_start, span_end, span_tokens, n_windows)
        (2, 0, 6, 7, 3),
        (3, 0, 4, 5, 1),
        (3, 6, 10, 5, 1),
    ]
    # min_count above the corpus multiplicity suppresses everything
    assert duplicated_spans(docs, min_tokens=5, min_count=3).count() == 0


def test_remove_duplicated_spans_first_occurrence_wins(spark):
    """The removal half of ExactSubstr: the doc owning a span's first
    occurrence (corpus-min (doc, start) on the first-window hash) keeps its
    text byte-for-byte; every other occurrence is cut; untouched docs keep
    their original whitespace exactly."""
    from pyspark.sql import Row

    from debezium_connector_vitess_spark.ops.text import remove_duplicated_spans

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="u1 u2 a b c d e f g u3 u4"),
            Row(doc_id=2, text="a b c d e f g v1 v2 v3"),
            Row(doc_id=3, text="p q r s t x1 p q r s t"),
            Row(doc_id=4, text="w1  w2   w3"),
        ]
    )
    out = {r["doc_id"]: r["text"] for r in remove_duplicated_spans(docs, min_tokens=5).collect()}
    assert out == {
        1: "u1 u2 a b c d e f g u3 u4",  # owner: (1, start 2) < (2, start 0)
        2: "v1 v2 v3",
        3: "p q r s t x1",  # within-doc repeat: first occurrence kept
        4: "w1  w2   w3",  # no spans: original spacing preserved
    }


def test_remove_duplicated_spans_corpus_invariants(spark, sf_dir):
    """On the real corpus: every document survives, docs with no duplicated
    span are byte-identical, edited docs only ever shrink, and exactly the
    docs that lost an ownership election are edited."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_duplicated_spans(docs, min_tokens=8, out_col="cleaned")
    joined = docs.select("doc_id", "text").join(out, on="doc_id").collect()
    assert len(joined) == docs.count()
    span_docs = {
        r["doc_id"] for r in duplicated_spans(docs, min_tokens=8).collect()
    }
    edited = {r["doc_id"] for r in joined if r["cleaned"] != r["text"]}
    assert edited <= span_docs  # owners of every span they host stay intact
    assert edited  # the corpus does contain cross-doc duplication
    for r in joined:
        if r["doc_id"] in edited:
            assert len(r["cleaned"]) < len(r["text"])


def test_duplicated_spans_matches_duckdb(spark, sf_dir):
    """Exact-substring spans against a DuckDB replica of the windowed-gram +
    occurrence-count + gaps-and-islands construction on the real corpus
    (portable md5-prefix gram hash, identical islands arithmetic)."""
    from debezium_connector_vitess_spark.ops.text import duplicated_spans
    from tests.oracle_harness import compare

    k = 8
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = duplicated_spans(docs, min_tokens=k)
    oracle = f"""
    WITH toks AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS lt
          FROM documents),
    w AS (SELECT doc_id, i - 1 AS pos,
            ('0x' || substr(md5(array_to_string(lt[i:i+{k - 1}], ' ')), 1, 15))::BIGINT AS h
          FROM toks, LATERAL unnest(range(1, greatest(len(lt) - {k} + 2, 1))) AS t(i)),
    d AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
    hits AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM d)),
    runs AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             FROM hits)
    SELECT doc_id, min(pos) AS span_start, max(pos) + {k} - 1 AS span_end,
           max(pos) + {k} - min(pos) AS span_tokens, count(*) AS n_windows
    FROM runs GROUP BY doc_id, grp
    """
    compare(got, oracle, sf_dir)


def test_contamination_flags_matches_join_and_streams(spark, sf_dir, tmp_path):
    """The map-side train-direction decontamination agrees exactly with the
    join-based audit op run with sides swapped, and — being a stateless
    map — the identical call on a readStream frame produces the same flags
    per micro-batch (no state store, no watermark)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        contamination_flags,
        decontaminate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tr = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")

    out = contamination_flags(tr, ev, "text", "doc_id", ngram=5)
    assert out.columns == docs.columns + ["n_eval_hits"]
    flags = {r["doc_id"]: r["n_eval_hits"] for r in out.collect()}
    assert len(flags) == tr.count()  # every train doc, hit or not
    inverted = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(ev, tr, "text", "doc_id", ngram=5).collect()
    }
    assert inverted  # the corpus does contain contamination
    assert {k: v for k, v in flags.items() if v > 0} == inverted

    stream_dir = str(tmp_path / "train")
    tr.write.parquet(stream_dir)
    streamed = contamination_flags(
        spark.readStream.schema(tr.schema).parquet(stream_dir),
        ev,
        "text",
        "doc_id",
        ngram=5,
    )
    q = (
        streamed.select("doc_id", "n_eval_hits")
        .writeStream.format("memory")
        .queryName("contam_flags")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["n_eval_hits"]
        for r in spark.sql("SELECT * FROM contam_flags").collect()
    }
    assert got == flags


def test_bloom_filter_no_false_negatives():
    """The Bloom prefilter's exactness hinges on zero false negatives (every
    true member probes positive) and a measured FP rate near the target —
    both checked against the same build/probe pair the executor seam uses."""
    import numpy as np

    from debezium_connector_vitess_spark.ops.pipeline import (
        _bloom_build,
        _bloom_contains,
    )

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**60, 5000, dtype=np.int64)
    others = np.setdiff1d(
        rng.integers(0, 2**60, 200000, dtype=np.int64), members
    )
    words, m, k = _bloom_build(members, 1e-4)
    assert _bloom_contains(words, m, k, members).all()
    assert _bloom_contains(words, m, k, others).mean() < 5e-4
    # degenerate single-member filter still has no false negatives
    words, m, k = _bloom_build(members[:1], 0.5)
    assert _bloom_contains(words, m, k, members[:1]).all()


def test_decontaminate_bloom_equals_semi(spark, sf_dir):
    """method='bloom' is a physical-strategy change only: output identical
    to the semi-join path on the registry's own train/eval split — even
    with an absurd 50% FP target, because the exact broadcast join back
    against the eval grams removes every false positive. The plan shows the
    map-side probe (MapInPandas before any join) and a broadcast final
    join, never a sort-merge."""
    import pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tr = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    semi = sorted(map(tuple, decontaminate(tr, ev, "text", "doc_id").collect()))
    bloom_df = decontaminate(tr, ev, "text", "doc_id", method="bloom")
    assert sorted(map(tuple, bloom_df.collect())) == semi
    noisy = decontaminate(tr, ev, "text", "doc_id", method="bloom", bloom_fpp=0.5)
    assert sorted(map(tuple, noisy.collect())) == semi

    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    with pytest.raises(ValueError):
        decontaminate(tr, ev, "text", "doc_id", method="bloom", hashed=False)
    with pytest.raises(ValueError):
        decontaminate(tr, ev, "text", "doc_id", method="bogus")


def test_pack_sequences_block_arithmetic(spark):
    from pyspark.sql import Row

    from debezium_connector_vitess_spark.ops.pipeline import pack_sequences

    rows = [Row(doc_id=i, stream="s", text=" ".join(["w"] * 100)) for i in range(1, 6)]
    out = {
        r["doc_id"]: (r["start_offset"], r["block_id"], r["offset_in_block"])
        for r in pack_sequences(
            spark.createDataFrame(rows), "text", "doc_id", stream_col="stream", block_tokens=256
        ).collect()
    }
    # 100-token docs into 256-token blocks: offsets 0,100,200,300,400
    assert out == {1: (0, 0, 0), 2: (100, 0, 100), 3: (200, 0, 200), 4: (300, 1, 44), 5: (400, 1, 144)}


def test_chunk_documents_geometry_content_and_edges(spark):
    """Context-window chunking: stride-spaced starts with exact coverage,
    consecutive chunks share exactly `overlap` tokens, the original token
    stream reconstructs from the chunks (chunk 0 + each later chunk minus
    its overlap prefix), empty/NULL docs emit nothing, chunk_md5 witnesses
    the content, and bad geometry raises."""
    import hashlib

    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.pipeline import chunk_documents

    toks = [f"t{i}" for i in range(11)]
    rows = [
        (1, " ".join(toks)),  # 11 tokens -> starts 0,3,6,9 lens 4,4,4,2
        (2, "a b c"),         # 3 tokens  -> one short chunk
        (3, ""),              # empty -> no chunks
        (4, None),            # NULL  -> no chunks
        (5, "   \t\n "),      # whitespace-only -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_documents(
        df, "text", "doc_id", chunk_tokens=4, overlap=1, include_text=True
    ).orderBy("doc_id", "chunk_idx").collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    geo = [(r["chunk_idx"], r["start_token"], r["n_tokens"]) for r in by_doc[1]]
    assert geo == [(0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 2)]
    assert [(r["chunk_idx"], r["start_token"], r["n_tokens"]) for r in by_doc[2]] == [
        (0, 0, 3)
    ]
    # content witness + reconstruction: chunk 0 whole, later chunks minus
    # the overlap prefix, concatenated == the original token stream
    rebuilt: list[str] = []
    for r in by_doc[1]:
        piece = r["chunk_text"].split(" ")
        assert r["chunk_md5"] == hashlib.md5(r["chunk_text"].encode()).hexdigest()
        assert piece == toks[r["start_token"]:r["start_token"] + r["n_tokens"]]
        rebuilt.extend(piece if r["chunk_idx"] == 0 else piece[1:])
    assert rebuilt == toks

    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=0)


def test_resample_by_weight_modes(spark, sf_dir):
    """Gumbel-top-k importance resampling: deterministic across runs, k
    respected, an overwhelming log-weight is always selected; the Poisson
    (expected_frac) mode keeps its always-include clamp and lands near the
    expected size on near-uniform weights; bad params raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import resample_by_weight

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", F.length("text").cast("double").alias("len"))
        .withColumn(
            # near-uniform weights, except doc 7 gets overwhelming mass
            "w",
            F.when(F.col("doc_id") == 7, F.lit(1000.0)).otherwise(
                F.log(1.0 + F.col("len")) / 100.0
            ),
        )
    )
    a = sorted(r["doc_id"] for r in resample_by_weight(docs, "w", "doc_id", k=50).collect())
    b = sorted(r["doc_id"] for r in resample_by_weight(docs, "w", "doc_id", k=50).collect())
    assert a == b and len(a) == 50 and 7 in a

    # Poisson mode on the SPIKED frame: doc 7's extreme weight (exp(1000)
    # overflows a double — the max-shift keeps Σ finite) clamps its keep
    # probability to 1; with ~all softmax mass on one row, the light rows'
    # inclusion collapses toward 0 (correct ∝-mass behavior)
    pois_skew = sorted(
        r["doc_id"]
        for r in resample_by_weight(docs, "w", "doc_id", expected_frac=0.3).collect()
    )
    assert 7 in pois_skew and len(pois_skew) < 10

    # Poisson mode on NEAR-UNIFORM weights: every softmax_i ~ 1/n, so the
    # sample lands around frac*n (loose band; the draw is a pure hash
    # function, so the exact set is deterministic — asserted by re-run)
    n = docs.count()
    uni = docs.withColumn("w", F.log(1.0 + F.col("len")) / 100.0)
    pois = sorted(
        r["doc_id"]
        for r in resample_by_weight(uni, "w", "doc_id", expected_frac=0.3).collect()
    )
    assert 0.15 * n < len(pois) < 0.5 * n
    assert pois == sorted(
        r["doc_id"]
        for r in resample_by_weight(uni, "w", "doc_id", expected_frac=0.3).collect()
    )

    with _pytest.raises(ValueError):
        resample_by_weight(docs, "w", "doc_id")
    with _pytest.raises(ValueError):
        resample_by_weight(docs, "w", "doc_id", k=10, expected_frac=0.5)
    with _pytest.raises(ValueError):
        resample_by_weight(docs, "w", "doc_id", k=0)
    with _pytest.raises(ValueError):
        resample_by_weight(docs, "w", "doc_id", expected_frac=1.5)


def test_importance_resample_boundary_margins(spark):
    """The sample_stratified row's side='importance' contract is a top-k SET
    with no float output column; its only cross-engine hazard is the k-th /
    (k+1)-th boundary. Assert the gumbel-key gap at that boundary is >=1e-6
    at BOTH driver SFs — 9+ orders of magnitude above libm last-ulp drift —
    so a testdata regen can't silently reintroduce a margin hazard (same
    convention as test_curation_rounding_margins)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import gumbel_key_expr
    from debezium_connector_vitess_spark.ops.text import token_count_expr

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        keys = (
            docs.select(
                gumbel_key_expr(
                    F.log(1.0 + token_count_expr(F.col("text")).cast("double")),
                    F.col("doc_id"),
                ).alias("gk")
            )
            .orderBy(F.col("gk").desc())
            .limit(121)
            .collect()
        )
        gap = keys[119]["gk"] - keys[120]["gk"]
        assert gap > 1e-6, f"{sf}: boundary gap {gap}"


def test_sample_by_hash_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import sample_by_hash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r["doc_id"] for r in sample_by_hash(docs, "doc_id", rate_pct=F.lit(30)).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in sample_by_hash(docs, "doc_id", rate_pct=F.lit(30)).select("doc_id").collect())
    assert a == b and 0 < len(a) < docs.count()


def test_banded_near_dup_recall_and_knob(spark, sf_dir):
    """Banded-LSH near-dup pairs: every result is a true pair (precision 1.0
    by construction — exact verify), recall vs brute force is bounded below,
    and narrower bands (more of them) raise recall monotonically."""
    from debezium_connector_vitess_spark.ops.similarity import (
        embedding_near_dup_pairs,
        lsh_banded_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {tuple(r) for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()}
    banded4 = {
        tuple(r)
        for r in lsh_banded_near_dup_pairs(
            emb, threshold=0.4, num_planes=16, num_bands=4
        ).collect()
    }
    banded8 = {
        tuple(r)
        for r in lsh_banded_near_dup_pairs(
            emb, threshold=0.4, num_planes=16, num_bands=8
        ).collect()
    }
    assert banded4 <= exact and banded8 <= exact  # no false positives
    # Recall bars are theory-anchored with slack, not coin-flip-tight: with
    # Gaussian planes the per-pair band-collision model is 1-(1-(1-θ/π)^b)^B.
    # At the cos=0.4 boundary that is ~0.50 for 4 bands×4 bits and ~0.98 for
    # 8 bands×2 bits — a 0.5 bar for banded4 sits ON the expected value and
    # fails on legitimate plane-set draws (observed 0.39 at sf0.001). The
    # bars below separate "working LSH" (≥ theory minus pair-distribution
    # skew) from "broken banding" (≈0) without asserting a coin lands heads.
    assert len(banded4) / len(exact) >= 0.3
    assert len(banded8) / len(exact) >= 0.85
    # more/narrower bands -> pigeonhole covers larger hamming -> recall up
    assert banded4 <= banded8
    assert len(banded8) / len(exact) >= len(banded4) / len(exact)


def test_banded_near_dup_plan_is_equi_join(spark, sf_dir):
    """The candidate stage must be a bucket equi-join, not a cartesian
    product (the 100 TB shape)."""
    from debezium_connector_vitess_spark.ops.similarity import (
        lsh_banded_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        lsh_banded_near_dup_pairs(emb, threshold=0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_kmeans_quantizer_recall(spark, sf_dir):
    """Lloyd-refined quantizer: deterministic (seeded sample init, fixed
    iterations), and its recall@5 vs brute force must at least match the
    unrefined sampled quantizer on the same probe budget."""
    from debezium_connector_vitess_spark.ops.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(quantizer):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, k=5, n_centroids=16, n_probe=4, quantizer=quantizer
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r_sample = recall("sample")
    r_kmeans = recall("kmeans")
    assert r_kmeans >= 0.5, f"kmeans IVF recall too low: {r_kmeans}"
    assert r_kmeans >= r_sample - 0.1, (r_kmeans, r_sample)


def test_kmeans_centroids_deterministic_and_refined(spark, sf_dir):
    """Same inputs -> same centroids (no RNG); refinement moves centroids off
    the raw sample; empty cells keep their previous centroid."""
    from debezium_connector_vitess_spark.ops.similarity import (
        kmeans_centroid_frame,
        sampled_centroid_frame,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kw = dict(id_col="vec_id", vec_col="embedding", n_centroids=8)
    init = {r["centroid_id"]: list(r["cent_vec"])
            for r in sampled_centroid_frame(emb, **kw).collect()}
    k1 = {r["centroid_id"]: list(r["cent_vec"])
          for r in kmeans_centroid_frame(emb, iters=1, **kw).collect()}
    k1b = {r["centroid_id"]: list(r["cent_vec"])
           for r in kmeans_centroid_frame(emb, iters=1, **kw).collect()}
    assert set(k1) == set(init)
    assert k1 == k1b  # deterministic across runs
    assert any(init[c] != k1[c] for c in init)  # refinement actually moved


def test_prefix_filtered_jaccard_equals_brute_force(spark, sf_dir):
    """Prefix filtering is exact: identical pair set to the O(n^2) join, and
    the plan has no cartesian/nested-loop join."""
    from debezium_connector_vitess_spark.ops.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_bruteforce,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    brute = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs_bruteforce(docs, "text", "doc_id")
        .filter("inter_size * 2 >= union_size")
        .collect()
    }
    fast_df = ngram_jaccard_pairs(docs, "text", "doc_id", threshold_num=1, threshold_den=2)
    fast = {(r["id_a"], r["id_b"]) for r in fast_df.collect()}
    assert fast == brute
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only non-equi join allowed is the (normally empty) short-doc edge
    # path; the candidate/verify pipeline itself is pure equi-joins
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_prefix_filtered_jaccard_positional_and_df_cap(spark):
    """r11 AllPairs hardening: (1) the PPJoin positional filter is EXACT —
    pinned by the brute-force equality test above, which now runs through
    it; here a pair sharing only DEEP-prefix entries (positional bound
    below α) must still verify out, not produce a wrong answer. (2)
    max_prefix_df drops mid-frequency boilerplate shingles from PREFIXES
    only: pairs whose every shared shingle exceeds the cap disappear
    (documented recall trade), pairs sharing one rare shingle survive with
    EXACT inter/union (verify sets are uncapped)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_bruteforce,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    docs = spark.createDataFrame(
        [(1, base + "one"), (2, base + "two")]
        + [
            (10 + i, f"u{i}a u{i}b u{i}c shared common phrase here distinct")
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    # uncapped: equal to brute force (the 30 boilerplate docs share the
    # 'shared common phrase here' shingles — none reach J >= 1/2)
    brute = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs_bruteforce(docs, "text", "doc_id")
        .filter(F.col("inter_size") * 2 >= F.col("union_size"))
        .collect()
    }
    exact = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(docs, "text", "doc_id").collect()
    }
    assert exact == brute and (1, 2) in {(a, b) for a, b, *_ in exact}
    # capped at 5: the df-30 boilerplate shingles leave the prefixes, the
    # (1,2) near-dup pair (rare shingles, df=2) survives with exact counts
    capped = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", max_prefix_df=5
        ).collect()
    }
    assert capped == exact
    # and a pair findable ONLY via capped-away shingles is the documented
    # recall loss: two docs sharing exactly the boilerplate phrase
    twins = spark.createDataFrame(
        [(100, "shared common phrase here distinct"),
         (101, "shared common phrase here distinct")]
        + [(10 + i, f"u{i}a u{i}b shared common phrase here distinct")
           for i in range(30)],
        "doc_id long, text string",
    )
    uncapped_twin = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(twins, "text", "doc_id").collect()
    }
    capped_twin = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            twins, "text", "doc_id", max_prefix_df=5
        ).collect()
    }
    assert (100, 101) in uncapped_twin
    assert (100, 101) not in capped_twin


def test_prefix_filtered_jaccard_empty_doc_semantics(spark):
    """Docs with < n tokens have empty shingle sets and vacuously satisfy the
    threshold among themselves, exactly like the brute-force join."""
    from debezium_connector_vitess_spark.ops.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "three"), (3, "a much longer document with many words here")],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]) for r in
           ngram_jaccard_pairs(docs, "text", "doc_id").collect()}
    assert out == {(1, 2)}


def test_wav_payload_roundtrip():
    """The generated blob is a genuine RIFF/WAVE container: the stdlib reader
    recovers header fields AND the exact PCM samples written."""
    import io
    import struct
    import wave

    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_wav,
        decode_wav_meta,
        is_wav,
    )

    p = _make_wav(7, 123)
    assert is_wav(p)
    n, rate, ch, width = decode_wav_meta(p)
    assert (n, rate, ch, width) == (200 + 123 % 800, 8000 + (7 % 4) * 4000, 1 + 7 % 2, 2)
    with wave.open(io.BytesIO(p), "rb") as w:
        frames = w.readframes(w.getnframes())
    vals = struct.unpack(f"<{len(frames) // 2}h", frames)
    assert len(vals) == n * ch
    assert vals[:3] == tuple(((7 * 31 + i * 17) % 65536) - 32768 for i in range(3))


def test_chunk_audio_uses_real_wav_frames(spark):
    """RIFF payloads chunk over the DECODED per-channel frame count, not the
    raw byte length (which includes the 44-byte header and both channels)."""
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_wav_payload,
        chunk_audio,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x" * 50)]  # doc_id 1 -> stereo, 250 frames
    )
    chunks = chunk_audio(attach_wav_payload(docs), chunk_samples=64).collect()
    assert [r["n_samples"] for r in sorted(chunks, key=lambda r: r["chunk_idx"])] == [
        64,
        64,
        64,
        58,
    ]


def test_avi_payload_roundtrip_and_crosscheck():
    """The generated blob is a genuine RIFF/AVI chunk tree; the decoder reads
    the avih header AND verifies it against the movi chunk scan."""
    import struct

    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_avi,
        decode_avi_meta,
        is_avi,
    )

    p = _make_avi(7, 123)
    assert is_avi(p)
    assert decode_avi_meta(p) == (4 + 123 % 28, 16 + 7 % 16, 16 + 3 % 16, 15)
    # corrupt the header's dwTotalFrames: cross-check must catch it
    idx = p.index(b"avih") + 8 + 16
    bad = p[:idx] + struct.pack("<I", 999) + p[idx + 4 :]
    try:
        decode_avi_meta(bad)
    except ValueError as e:
        assert "movi holds" in str(e)
    else:
        raise AssertionError("frame-count mismatch must raise")


def test_sample_frames_uses_real_avi_frames(spark):
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_avi_payload,
        sample_frames,
    )

    docs = spark.createDataFrame([Row(doc_id=3, text="y" * 10)])  # 14 frames
    out = sample_frames(attach_avi_payload(docs), every=5).collect()
    assert out[0]["n_frames"] == 14 and out[0]["sampled_frames"] == 3


def test_malformed_avi_falls_back_in_sample_frames(spark):
    """A payload with the RIFF/AVI magic but a truncated body must not fail
    the job: sample_frames falls back to the byte-frame model."""
    from debezium_connector_vitess_spark.ops.multimodal import _make_avi, sample_frames

    truncated = _make_avi(3, 10)[:40]  # valid magic, body cut mid-chunk
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(truncated), mime="video/x-msvideo")]
    )
    out = sample_frames(df, frame_bytes=16, every=2).collect()
    n = (len(truncated) + 15) // 16
    assert out[0]["n_frames"] == n
    assert out[0]["sampled_frames"] == len(range(0, n, 2))


def test_extract_video_metadata_error_modes(spark):
    """E4-style failure modes on the video decode path: fail raises, null
    keeps the row with null metadata, skip drops it."""
    import pytest

    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_avi,
        extract_video_metadata,
    )

    good = _make_avi(2, 20)
    bad = good[:40]
    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(good), mime="video/x-msvideo"),
            Row(doc_id=2, payload=bytearray(bad), mime="video/x-msvideo"),
        ]
    )
    with pytest.raises(Exception):
        extract_video_metadata(df).collect()
    nulled = {r["doc_id"]: r for r in extract_video_metadata(df, errors="null").collect()}
    assert nulled[1]["n_frames"] is not None
    assert nulled[2]["n_frames"] is None and nulled[2]["fps"] is None
    skipped = extract_video_metadata(df, errors="skip").collect()
    assert [r["doc_id"] for r in skipped] == [1]
    with pytest.raises(ValueError):
        extract_video_metadata(df, errors="bogus")


def test_mp4_metadata_roundtrip(spark):
    """ISO BMFF path: the deterministic MP4 fixture decodes back to the
    generation formulas through the real box-tree walker (duration converted
    from the non-millisecond mvhd timescale, dims from 16.16 tkhd fields,
    track count from trak boxes)."""
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_mp4_payload,
        extract_mp4_metadata,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x" * (i * 37 % 300)) for i in range(1, 41)]
    )
    out = {r["doc_id"]: r for r in extract_mp4_metadata(attach_mp4_payload(docs)).collect()}
    assert set(out) == set(range(1, 41))
    for did, r in out.items():
        n = did * 37 % 300
        assert r["duration_ms"] == 2 * (250 + n % 2250)
        assert r["width"] == 64 + did % 64
        assert r["height"] == 64 + (did // 3) % 64
        assert r["n_tracks"] == 1 + did % 2


def test_mp4_extended_and_v1_boxes():
    """Real-world ISO BMFF variants the fixture never emits: a size==1
    largesize mdat, a size==0 to-end-of-file box, and a version-1 (64-bit
    times) mvhd must all decode; an overrunning declared size must raise."""
    import struct

    from debezium_connector_vitess_spark.ops.multimodal import (
        _box,
        _make_mp4,
        decode_mp4_meta,
    )

    base = _make_mp4(5, 100)
    ms, w, h, nt = decode_mp4_meta(base)

    # Rebuild with a largesize mdat and a size==0 trailer box.
    ftyp_end = 8 + struct.unpack(">I", base[:4])[0] - 8
    moov_size = struct.unpack(">I", base[ftyp_end : ftyp_end + 4])[0]
    moov = base[ftyp_end : ftyp_end + moov_size]
    body = b"\x00" * 32
    large_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    to_end = struct.pack(">I", 0) + b"free" + b"\x00" * 12
    rebuilt = base[:ftyp_end] + moov + large_mdat + to_end
    assert decode_mp4_meta(rebuilt) == (ms, w, h, nt)

    # v1 mvhd: 64-bit creation/modification/duration, same semantics.
    mvhd_v1 = _box(
        b"mvhd",
        struct.pack(">B3s", 1, b"\x00\x00\x00")
        + struct.pack(">QQIQ", 0, 0, 1000, 1500)
        + b"\x00" * 80,
    )
    trak_start = moov.index(b"trak") - 4  # reuse the original trak bytes verbatim
    trak_size = struct.unpack(">I", moov[trak_start : trak_start + 4])[0]
    moov_v1 = _box(b"moov", mvhd_v1 + moov[trak_start : trak_start + trak_size])
    payload_v1 = base[:ftyp_end] + moov_v1
    ms1, w1, h1, nt1 = decode_mp4_meta(payload_v1)
    assert (ms1, w1, h1, nt1) == (1500, w, h, 1)

    # Overrun: declared box size past the payload end must raise, not misread.
    import pytest

    bad = bytearray(base)
    struct.pack_into(">I", bad, ftyp_end, len(base) * 2)
    with pytest.raises(ValueError):
        decode_mp4_meta(bytes(bad))


def test_extract_mp4_metadata_error_modes(spark):
    """Same E4 contract as the AVI path: fail raises, null keeps the row
    with null metadata, skip drops it."""
    import pytest

    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_mp4,
        extract_mp4_metadata,
    )

    good = _make_mp4(2, 20)
    bad = good[:40]  # ftyp magic intact, moov cut mid-box
    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(good), mime="video/mp4"),
            Row(doc_id=2, payload=bytearray(bad), mime="video/mp4"),
        ]
    )
    with pytest.raises(Exception):
        extract_mp4_metadata(df).collect()
    nulled = {r["doc_id"]: r for r in extract_mp4_metadata(df, errors="null").collect()}
    assert nulled[1]["duration_ms"] is not None
    assert nulled[2]["duration_ms"] is None and nulled[2]["n_tracks"] is None
    skipped = extract_mp4_metadata(df, errors="skip").collect()
    assert [r["doc_id"] for r in skipped] == [1]
    with pytest.raises(ValueError):
        extract_mp4_metadata(df, errors="bogus")


def test_connected_components_restricted_to_nodes(spark):
    """Output contract: ids appearing only in `pairs` are excluded — the
    result covers exactly the nodes frame."""
    from debezium_connector_vitess_spark.ops.dedup import connected_components

    nodes = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 77)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, pairs, id_col="doc_id").collect()
    }
    assert set(got) == {1, 2, 9}
    assert got[1] == got[2] == 1
    assert got[9] == 9


def test_checkpoint_scope_releases_minhash_blocks(spark, sf_dir):
    """minhash_dedup_pairs materializes two frames with localCheckpoint and
    connected_components adds edges + one per round; checkpoint_scope returns
    the block manager to its pre-scope state after the terminal action."""
    from debezium_connector_vitess_spark.cache import checkpoint_scope
    from debezium_connector_vitess_spark.ops.dedup import (
        connected_components,
        minhash_dedup_pairs,
    )

    from debezium_connector_vitess_spark.cache import _persistent_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # set-based assertions: the shared session's ContextCleaner may release
    # PRE-EXISTING rdds concurrently, so total counts are order-fragile —
    # what matters is that everything created inside the scope is gone after
    base_ids = _persistent_ids(spark)
    with checkpoint_scope(spark):
        pairs = minhash_dedup_pairs(docs, "text", "doc_id")
        labels = connected_components(
            docs.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id"
        )
        assert labels.count() == docs.count()
        created = _persistent_ids(spark) - base_ids
        assert created  # checkpoints really were made
    assert not (_persistent_ids(spark) & created)


def test_jpeg_gif_bmp_dims_stdlib(spark):
    """Real header decode for JPEG (SOF marker walk), GIF (logical screen)
    and BMP (BITMAPINFOHEADER) with stdlib only — these formats no longer
    fall back to the deterministic fake, and the mapInPandas extractor
    surfaces the parsed dimensions."""
    import struct

    from debezium_connector_vitess_spark.ops.multimodal import (
        decode_image_dims,
        extract_image_metadata,
        is_bmp,
        parse_jpeg_dims,
    )

    def make_jpeg(w, h, components=3, progressive=False):
        sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(components))
        sof_payload = struct.pack(">BHHB", 8, h, w, components) + comp
        sof = sof_marker + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
        return b"\xff\xd8" + app0 + sof + b"\xff\xd9"

    assert parse_jpeg_dims(make_jpeg(640, 480)) == (640, 480, 3)
    assert decode_image_dims(make_jpeg(31, 17, 1, progressive=True)) == (31, 17, 1)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert decode_image_dims(gif) == (320, 200, 3)

    bmp = (
        b"BM" + struct.pack("<IHHI", 150, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 64, -48, 1, 24) + b"\x00" * 40
    )
    assert decode_image_dims(bmp) == (64, 48, 3)
    # plain text starting with 'BM' must NOT take the BMP branch
    assert not is_bmp(b"BMW makes cars, " * 4)

    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(make_jpeg(640, 480)), mime="image/jpeg"),
            Row(doc_id=2, payload=bytearray(gif), mime="image/gif"),
        ]
    )
    got = {r["doc_id"]: r for r in extract_image_metadata(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (640, 480, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (320, 200, 3)


def test_jpeg_meta_shell_roundtrip(spark, sf_dir):
    """Full JPEG header extraction: the structurally-real JFIF shell
    fixture round-trips every field (dims, components, precision,
    progressive SOF, JFIF density), hostile/truncated streams raise the
    containable error class, and the Spark extractor reproduces the
    generation formulas over real docs."""
    import struct

    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.jpeg import (
        encode_jpeg_shell,
        parse_jpeg_meta,
    )
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_jpeg_payload,
        decode_image_dims,
        extract_jpeg_metadata,
    )

    p = encode_jpeg_shell(641, 479, components=3, density=(96, 120),
                          progressive=False, seed=11)
    assert parse_jpeg_meta(p) == (641, 479, 3, 8, False, 96, 120)
    # the dims view and the generic image decoder agree
    assert decode_image_dims(p) == (641, 479, 3)
    pg = encode_jpeg_shell(31, 17, components=1, progressive=True)
    assert parse_jpeg_meta(pg)[:5] == (31, 17, 1, 8, True)
    # hostile/corrupt streams raise ValueError (containable), never misparse:
    with _pytest.raises(ValueError, match="SOI"):
        parse_jpeg_meta(b"plain text")
    with _pytest.raises(ValueError):
        parse_jpeg_meta(p[:20])  # truncated mid-segment
    # a segment length pointing past the payload
    i = p.index(b"\xff\xdb")  # DQT
    bad = p[: i + 2] + struct.pack(">H", 60000) + p[i + 4 :]
    with _pytest.raises(ValueError, match="declares"):
        parse_jpeg_meta(bad)
    # SOS with no prior SOF
    no_sof = b"\xff\xd8" + p[p.index(b"\xff\xda"):]
    with _pytest.raises(ValueError, match="SOF"):
        parse_jpeg_meta(no_sof)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(40)
    got = {r["doc_id"]: r for r in
           extract_jpeg_metadata(attach_jpeg_payload(docs)).collect()}
    for r in docs.collect():
        did, n = r["doc_id"], len((r["text"] or "").encode("utf-8"))
        g = got[did]
        assert (g["width"], g["height"]) == (8 + n % 32, 8 + (n // 3) % 32)
        assert g["n_components"] == (1 if did % 7 == 0 else 3)
        assert g["progressive"] == (did % 5 == 0)
        assert (g["density_x"], g["density_y"]) == (
            72 + (did % 4) * 24, 72 + (did % 3) * 36)
        assert g["precision"] == 8
        assert g["orientation"] == (1 + did % 8 if did % 2 == 0 else None)
    # errors vocabulary: corrupt payload raises under 'fail', drops via 'skip'
    corrupt = attach_jpeg_payload(docs.limit(1)).select(
        "doc_id", F.expr("substring(payload, 1, 10)").alias("payload"))
    with _pytest.raises(Exception):
        extract_jpeg_metadata(corrupt).collect()
    assert extract_jpeg_metadata(corrupt, errors="skip").count() == 0
    with _pytest.raises(ValueError, match="errors"):
        extract_jpeg_metadata(corrupt, errors="nope")


def test_warc_roundtrip_and_containment(spark):
    """WARC reader over structurally-real fixtures: plain and
    per-record-gzip layouts parse to identical records, HTTP response
    bodies split (incl. chunked transfer decoding), and every corruption
    class raises the containable ValueError."""
    import zlib

    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.warc import (
        http_response_parts,
        make_warc,
        parse_warc_records,
        split_gzip_members,
    )

    pages = [
        ("https://a.example/x", "<html><body><p>alpha beta</p></body></html>"),
        ("https://b.example/y", "<html><body><p>gamma delta epsilon</p></body></html>"),
    ]
    plain = make_warc(7, pages, chunked_every=2)  # page 0 chunked
    recs = parse_warc_records(plain)
    assert len(recs) == 1 + 2 * len(pages)
    assert recs[0][0]["warc-type"] == "warcinfo"
    responses = [(h, c) for h, c in recs if h["warc-type"] == "response"]
    for (h, content), (url, html) in zip(responses, pages):
        assert h["warc-target-uri"] == url
        status, hh, body = http_response_parts(content)
        assert status == 200 and hh["content-type"] == "text/html"
        assert body == html.encode("utf-8")  # chunked page dechunks exactly
    # gzip layout: one member per record, identical parse
    gz = make_warc(7, pages, gzip_records=True, chunked_every=2)
    members = split_gzip_members(gz)
    assert len(members) == len(recs)
    assert [parse_warc_records(m)[0][0]["warc-type"] for m in members] == [
        h["warc-type"] for h, _ in recs
    ]
    # containment: every corruption class raises ValueError
    with _pytest.raises(ValueError, match="version line"):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    i = plain.index(b"Content-Length:")
    inflated = plain[:i] + b"Content-Length: 99999999\r\n" + plain[plain.index(b"\r\n", i) + 2:]
    with _pytest.raises(ValueError, match="overruns"):
        parse_warc_records(inflated)
    with _pytest.raises(ValueError, match="separator|terminator|truncated|overruns"):
        parse_warc_records(plain[:-3])
    with _pytest.raises(ValueError, match="truncated gzip"):
        split_gzip_members(gz[:-5])
    # zip bomb: a tiny member expanding past the cap raises, never allocates
    bomb = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    bomb_bytes = bomb.compress(b"\x00" * 4_000_000) + bomb.flush()
    with _pytest.raises(ValueError, match="max_member_bytes"):
        split_gzip_members(bomb_bytes, max_member_bytes=1_000_000)
    # chunked overrun
    with _pytest.raises(ValueError, match="overruns body"):
        http_response_parts(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nshort"
        )
    # trailer-bearing chunked body (RFC 7230 §4.1.2): trailer header lines
    # after the 0-size chunk are parsed and discarded; a body ending
    # mid-trailer raises the containable ValueError
    head = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    trailered = head + b"5\r\nhello\r\n0\r\nX-Checksum: abc\r\nX-Len: 5\r\n\r\n"
    status, _hh, body = http_response_parts(trailered)
    assert status == 200 and body == b"hello"
    with _pytest.raises(ValueError, match="trailer terminator"):
        http_response_parts(head + b"5\r\nhello\r\n0\r\nX-Checksum: abc\r\n")
    with _pytest.raises(ValueError, match="trailer terminator"):
        http_response_parts(head + b"5\r\nhello\r\n0\r\n")


def test_warc_records_spark(spark, sf_dir):
    """Distributed WARC ingest: per-doc fixtures explode into response rows
    whose bodies feed the HTML cleaning chain; errors='skip' drops corrupt
    payloads; record_types widens to requests."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import html_to_text_expr
    from debezium_connector_vitess_spark.ops.warc import (
        attach_warc_payload,
        warc_records,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(30)
    warcs = attach_warc_payload(docs, max_chars=60, second_page=True)
    rows = warc_records(warcs).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(per_doc) == set(originals)
    for did, rs in per_doc.items():
        assert len(rs) == 2 and all(r["http_status"] == 200 for r in rs)
        assert rs[0]["target_uri"] == f"https://ex/{did}"
    # the decoded body feeds the cleaning chain: extract text, check content
    texts = {
        r["doc_id"]: r["clean"]
        for r in warc_records(warcs)
        .filter(F.col("target_uri").endswith("/2"))
        .select(
            "doc_id",
            html_to_text_expr(F.decode(F.col("body"), "UTF-8")).alias("clean"),
        )
        .collect()
    }
    assert all("second page" in t for t in texts.values()) and texts
    # request records surface when asked
    both = warc_records(warcs, record_types=("request", "response"))
    assert both.count() == 4 * len(originals)
    # errors vocabulary
    corrupt = warcs.limit(1).select(
        "doc_id", F.expr("substring(payload, 1, 25)").alias("payload"))
    with _pytest.raises(Exception):
        warc_records(corrupt).collect()
    assert warc_records(corrupt, errors="skip").count() == 0
    with _pytest.raises(ValueError, match="errors"):
        warc_records(corrupt, errors="nope")
    # per-member containment: corrupt ONE member's WARC content inside a
    # .warc.gz payload — skip keeps the records of every OTHER member
    import zlib

    from debezium_connector_vitess_spark.ops.warc import (
        make_warc,
        split_gzip_members,
    )

    gz = make_warc(2, [("https://ex/2", "<p>a</p>"),
                       ("https://ex/2/2", "<p>b</p>")], gzip_records=True)
    members = split_gzip_members(gz)  # info, req0, resp0, req1, resp1
    members[2] = members[2][:-6]  # tear resp0's WARC framing
    rebuilt = b""
    for m in members:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        rebuilt += co.compress(m) + co.flush()
    one = spark.createDataFrame([(2, bytearray(rebuilt))],
                                "doc_id long, payload binary")
    kept = warc_records(one, errors="skip").collect()
    assert [r["target_uri"] for r in kept] == ["https://ex/2/2"]
    with _pytest.raises(Exception):
        warc_records(one, errors="fail").collect()


def test_attach_warc_payload_page_html_fn(spark):
    """page_html_fn overrides the page generation formula (the curation
    row's ingest seam); the default formula is byte-identical to the
    pre-override behavior."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.warc import (
        attach_warc_payload,
        warc_records,
    )

    docs = spark.createDataFrame(
        [(6, "alpha beta"), (7, "gamma")], "doc_id long, text string"
    )
    custom = warc_records(
        attach_warc_payload(
            docs, page_html_fn=lambda did, t: f"<html><b>{did}:{t}</b></html>"
        )
    ).collect()
    assert {bytes(r["body"]).decode() for r in custom} == {
        "<html><b>6:alpha beta</b></html>", "<html><b>7:gamma</b></html>",
    }
    default = warc_records(attach_warc_payload(docs)).collect()
    assert {bytes(r["body"]).decode() for r in default} == {
        "<html><body><p>alpha beta</p></body></html>",
        "<html><body><p>gamma</p></body></html>",
    }


def test_robots_txt_gate(spark):
    """RFC 9309 compliance gate: line grammar (comments, mixed field case,
    CRLF, ignored fields, empty patterns), group selection (a matching
    specific group REPLACES '*'), and match precedence (longest octet
    pattern wins, Allow wins length ties, trailing $ anchors, * spans,
    no rules / no host / unparseable URL pass through allowed)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.robots import (
        filter_robots_allowed,
        parse_robots_txt,
        robots_rule_regex,
        robots_rules,
        select_agent_rules,
    )

    content = (
        "# comment\r\n"
        "User-Agent: *\r\n"
        "Disallow: /p/   # inline comment\r\n"
        "Allow: /p/1\r\n"
        "DISALLOW: /tree*email$\r\n"
        "Disallow: /d/x\r\n"
        "allow: /d/*\r\n"
        "Sitemap: https://h/sitemap.xml\r\n"
        "\r\n"
        "User-agent: TrainingBot\r\n"
        "User-agent: otherbot\r\n"
        "Disallow: /Page/\r\n"
        "Allow:\r\n"  # empty pattern: no restriction, dropped
        "Crawl-delay: 10\r\n"
    )
    rules = parse_robots_txt(content)
    # multi-agent group fans out per token; empty Allow dropped
    assert ("trainingbot", "disallow", "/Page/") in rules
    assert ("otherbot", "disallow", "/Page/") in rules
    assert not any(p == "" for _, _, p in rules)
    # specific group REPLACES '*'
    assert select_agent_rules(rules, "TRAININGBOT") == [("disallow", "/Page/")]
    assert ("disallow", "/p/") in select_agent_rules(rules, "nobody")
    # rules before any group are discarded
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nAllow: /y") == [
        ("*", "allow", "/y")
    ]
    # regex conversion: inner $ literal, trailing $ anchor, * spans
    assert robots_rule_regex("/a$b*") == "^/a\\$b.*"
    assert robots_rule_regex("/x$") == "^/x$"

    rdf = spark.createDataFrame(
        [("h.io", content), ("bare.io", "")], "domain string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [
            (0, "https://h.io/p/2?a=1"),      # * : disallow /p/ wins
            (1, "https://h.io/p/13"),          # * : allow /p/1 longer -> kept
            (2, "https://h.io/tree?u=email"),  # * : anchored wildcard blocks
            (3, "https://h.io/tree?u=mail"),   # $ anchor fails -> kept
            (4, "https://h.io/d/x"),           # length TIE -> Allow wins
            (5, "https://h.io:443/p/2"),       # default port strips -> blocked
            (6, "https://h.io:8443/p/2"),      # non-default port: no rules
            (7, "https://bare.io/p/2"),        # empty robots -> kept
            (8, "not a url"),                  # unparseable -> kept
            (9, "https://H.IO/Page/1"),        # case-insensitive host
        ],
        "id long, url string",
    )
    star = robots_rules(rdf, agent="randombot")
    kept = sorted(
        r.id for r in filter_robots_allowed(urls, "url", star).collect()
    )
    assert kept == [1, 3, 4, 6, 7, 8, 9]
    bot = robots_rules(rdf, agent="trainingbot")
    kept_bot = sorted(
        r.id for r in filter_robots_allowed(urls, "url", bot).collect()
    )
    # trainingbot group replaces '*': only /Page/ is blocked
    assert kept_bot == [0, 1, 2, 3, 4, 5, 6, 7, 8]
    # plan: rules broadcast; the URL frame itself never shuffles
    plan = (
        filter_robots_allowed(urls, "url", star)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_robots_versioned_agents_grammar_corners_and_pct(spark):
    """Round-11 robots hardening (VERDICT r10 #7 + ADVICE): (1) versioned
    User-agent tokens match on the product token when version_tokens=True
    (default stays exact); (2) grammar corners pinned — an ignored field
    between two User-agent lines is NEUTRAL (one merged group), an
    empty-valued 'User-agent:' line is ignored WHOLESALE (following rules
    attach to the preceding group); (3) percent-encoding canonicalization —
    hex case and unreserved-octet spellings compare equal on both the
    pattern and URL sides, escaped reserved octets stay distinct."""
    from debezium_connector_vitess_spark.ops.robots import (
        canonical_pct,
        filter_robots_allowed,
        parse_robots_txt,
        robots_rule_regex,
        robots_rules,
        select_agent_rules,
    )

    # (1) versioned product tokens, both directions
    rules = parse_robots_txt(
        "User-agent: TrainingBot/1.2\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\n"
    )
    assert select_agent_rules(rules, "trainingbot") == [("disallow", "/b")]
    assert select_agent_rules(rules, "trainingbot", version_tokens=True) == [
        ("disallow", "/a")
    ]
    # crawler-side version against a bare file token
    rules2 = parse_robots_txt("User-agent: TrainingBot\nDisallow: /a\n")
    assert select_agent_rules(rules2, "TrainingBot/2.0", version_tokens=True) == [
        ("disallow", "/a")
    ]
    assert select_agent_rules(rules2, "TrainingBot/2.0") == []

    # (2a) ignored field between User-agent lines: ONE merged group
    merged = parse_robots_txt(
        "User-agent: a\nSitemap: https://h/s.xml\nUser-agent: b\nDisallow: /x\n"
    )
    assert ("a", "disallow", "/x") in merged
    assert ("b", "disallow", "/x") in merged
    # (2b) empty 'User-agent:' ignored wholesale — rules after it still
    # attach to the preceding group, and it never closes a rule run
    kept = parse_robots_txt(
        "User-agent: a\nDisallow: /x\nUser-agent:\nDisallow: /y\n"
    )
    assert kept == [("a", "disallow", "/x"), ("a", "disallow", "/y")]

    # (3) percent canonicalization: the pure function...
    assert canonical_pct("/f%6fo%3c%2Fx%zz%") == "/foo%3C%2Fx%zz%"
    assert robots_rule_regex("/a%3c") == robots_rule_regex("/a%3C")
    assert robots_rule_regex("/%41b") == robots_rule_regex("/Ab")
    # ...and the column twin, end to end: mixed spellings gate identically,
    # while an escaped slash never collapses into a raw one
    rdf = spark.createDataFrame(
        [("h.io", "User-agent: *\nDisallow: /q%3Cz\nDisallow: /foo/bar\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (0, "https://h.io/q%3cz/1"),   # lower-hex URL vs upper-hex rule
            (1, "https://h.io/q%3Cz/1"),   # exact spelling
            (2, "https://h.io/%66oo/bar"), # unreserved escape decodes
            (3, "https://h.io/foo%2Fbar"), # escaped / stays distinct -> kept
            (4, "https://h.io/qz/1"),      # no rule matches -> kept
        ],
        "id long, url string",
    )
    out = sorted(
        r.id
        for r in filter_robots_allowed(
            urls, "url", robots_rules(rdf, agent="*")
        ).collect()
    )
    assert out == [3, 4]


def test_exif_orientation_parse():
    """EXIF orientation from a genuine APP1/TIFF block, both byte orders;
    absent APP1 / absent tag -> None; corrupt TIFF blocks raise the
    containable classes; the APP1 segment never disturbs the metadata
    walker (dims/density still parse)."""
    import struct

    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.jpeg import (
        encode_jpeg_shell,
        parse_exif_orientation,
        parse_jpeg_meta,
    )

    for orient in range(1, 9):
        for le in (True, False):
            p = encode_jpeg_shell(64, 48, orientation=orient,
                                  exif_little_endian=le, seed=orient)
            assert parse_exif_orientation(p) == orient, (orient, le)
            # the APP1 block coexists with the rest of the metadata
            assert parse_jpeg_meta(p)[:2] == (64, 48)
    assert parse_exif_orientation(encode_jpeg_shell(64, 48)) is None
    with _pytest.raises(ValueError, match="SOI"):
        parse_exif_orientation(b"not a jpeg")
    # corrupt TIFF: bad byte-order mark, bad magic, IFD overrun, bad value
    base = encode_jpeg_shell(64, 48, orientation=6)
    i = base.index(b"Exif\x00\x00") + 6
    with _pytest.raises(ValueError, match="byte-order"):
        parse_exif_orientation(base[:i] + b"XX" + base[i + 2:])
    with _pytest.raises(ValueError, match="magic"):
        parse_exif_orientation(
            base[:i + 2] + struct.pack("<H", 41) + base[i + 4:])
    with _pytest.raises(ValueError, match="entries beyond"):
        parse_exif_orientation(
            base[:i + 8] + struct.pack("<H", 60000) + base[i + 10:])
    with _pytest.raises(ValueError, match="outside 1-8"):
        parse_exif_orientation(
            base[:i + 18] + struct.pack("<H", 99) + base[i + 20:])


def test_chunk_audio_headerless_raw_pcm_model(spark):
    """Non-RIFF payloads chunk as raw PCM at bytes_per_sample — the
    headerless fallback the registry's WAV-backed query must NOT hit."""
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_binary_payload,
        chunk_audio,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text="x" * 300)])  # 300 bytes
    chunks = chunk_audio(
        attach_binary_payload(docs), bytes_per_sample=2, chunk_samples=64
    ).collect()  # 150 samples -> 64 + 64 + 22
    assert [r["n_samples"] for r in sorted(chunks, key=lambda r: r["chunk_idx"])] == [
        64,
        64,
        22,
    ]


def test_pii_detect_and_redact_literals(spark):
    """PII patterns on hand-built strings: counts and redaction tokens, plus
    the ordering contracts (numeric local-part counts as email not phone;
    IPv4 octets never match the phone pattern)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import (
        pii_count_exprs,
        redact_pii_expr,
    )

    rows = [
        Row(id=1, text="mail a.b+c@sub.example.org and bob@x.io now"),
        Row(id=2, text="call +1 (415) 555-0100 or 020 7946 0958 today"),
        Row(id=3, text="host 192.168.1.1 and 10.0.255.7 up"),
        Row(id=4, text="12345678901@bank.com is an email, not a phone"),
        Row(id=5, text="plain text, no pii at all"),
    ]
    df = spark.createDataFrame(rows)
    e, i, p = pii_count_exprs(F.col("text"))
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            e.alias("e"),
            i.alias("i"),
            p.alias("p"),
            redact_pii_expr(F.col("text")).alias("red"),
        ).collect()
    }
    assert (got[1]["e"], got[1]["i"], got[1]["p"]) == (2, 0, 0)
    assert got[1]["red"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[2]["e"], got[2]["i"], got[2]["p"]) == (0, 0, 2)
    assert got[2]["red"] == "call <PHONE> or <PHONE> today"
    assert (got[3]["e"], got[3]["i"], got[3]["p"]) == (0, 2, 0)
    assert got[3]["red"] == "host <IP> and <IP> up"
    # the 11-digit local part is an email; phone counting runs on the
    # email-redacted text so it is NOT double-counted as a phone
    assert (got[4]["e"], got[4]["p"]) == (1, 0)
    assert got[4]["red"].startswith("<EMAIL> is an email")
    assert (got[5]["e"], got[5]["i"], got[5]["p"]) == (0, 0, 0)
    assert got[5]["red"] == rows[4].text


def test_unigram_perplexity_matches_duckdb(spark, sf_dir):
    """Unigram-LM perplexity (train LM on the corpus, score each doc)
    against a DuckDB replica of the same smoothing/OOV model — the local
    oracle-parity bar for an op the 50-entry driver registry can't hold."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        doc_perplexity,
        unigram_logprobs,
    )
    from tests.oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = unigram_logprobs(docs, "text", alpha=0.5)
    got = doc_perplexity(docs, "text", "doc_id", lm).select(
        "doc_id", "n_tokens", "avg_neg_logp", "perplexity"
    )
    oracle = """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS token
      FROM documents),
    vocab AS (
      SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    lm AS (
      SELECT token,
             ln((cnt + 0.5) / (sum(cnt) OVER () + 0.5 * count(*) OVER ())) AS logp
      FROM vocab),
    scored AS (
      SELECT t.doc_id, coalesce(lm.logp, (SELECT min(logp) + ln(0.5) FROM lm)) AS lp
      FROM toks t LEFT JOIN lm USING (token))
    SELECT doc_id, count(*) AS n_tokens,
           -avg(lp) AS avg_neg_logp, exp(-avg(lp)) AS perplexity
    FROM scored GROUP BY doc_id
    """
    compare(got, oracle, sf_dir, float_rtol=1e-9)


def test_perplexity_plan_broadcasts_lm(spark, sf_dir):
    """The LM join must be a broadcast hash join — the corpus side never
    shuffles on token."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        doc_perplexity,
        unigram_logprobs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = unigram_logprobs(docs, "text")
    plan = (
        doc_perplexity(docs, "text", "doc_id", lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only token-keyed exchange is the LM's own vocab aggregation
    assert plan.count("Exchange hashpartitioning(token") <= 1


def test_write_training_shards_balanced_and_clustered(spark, sf_dir, tmp_path):
    """Shard geometry contract: requested rows-per-shard yields the expected
    file count, files hold non-overlapping sort-key ranges (footer min/max
    prunes file-level), and sampling keeps them balanced."""
    from debezium_connector_vitess_spark.ops.layout import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    manifest = write_training_shards(
        docs, str(tmp_path / "shards"), sort_col="doc_id", rows_per_shard=100
    ).collect()
    assert len(manifest) == -(-n // 100)
    assert sum(r["rows"] for r in manifest) == n
    spans = sorted((r["min_doc_id"], r["max_doc_id"], r["rows"]) for r in manifest)
    for (_, hi_prev, _), (lo, _, _) in zip(spans, spans[1:]):
        assert hi_prev < lo  # globally non-overlapping ranges
    rows = [r for _, _, r in spans]
    assert max(rows) <= 3 * max(min(rows), 1)  # balanced up to sampling error


def test_winnow_fingerprints_selection_and_guarantee(spark):
    """Winnowing contract on constructed docs: (a) the selection equals a
    literal Python winnow over the SAME Spark-computed gram hashes, (b) two
    docs sharing a >= w+k-1 char substring share a fingerprint, (c) short
    docs degrade to the global-min fingerprint."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import (
        char_gram_hashes_expr,
        with_winnow_fingerprints,
        winnow_match_pairs,
    )

    k, w = 5, 4
    shared = "the quick brown fox jumps"
    rows = [
        Row(doc_id=1, text=f"AAAA {shared} BBBB"),
        Row(doc_id=2, text=f"XXXXXXX {shared} YYY"),
        Row(doc_id=3, text="completely different content here"),
        Row(doc_id=4, text="tiny"),  # shorter than k: zero grams
        Row(doc_id=5, text="sixchr"),  # 2 grams < w: global min
    ]
    df = spark.createDataFrame(rows)

    # (a) selection logic vs a literal Python winnow over the same hashes
    # (the mapInPandas op hashes with the portable md5-prefix construction,
    # which char_gram_hashes_expr(portable=True) reproduces JVM-side)
    hashes = {
        r["doc_id"]: list(r["g"])
        for r in df.withColumn("__c", F.split("text", ""))
        .select(
            "doc_id",
            char_gram_hashes_expr(F.col("__c"), k, portable=True).alias("g"),
        )
        .collect()
    }
    got = {
        r["doc_id"]: set(r["fingerprints"])
        for r in with_winnow_fingerprints(df, "text", k=k, window=w).collect()
    }
    for did, g in hashes.items():
        if not g:
            want = set()
        elif len(g) < w:
            want = {min(g)}
        else:
            want = {min(g[j : j + w]) for j in range(len(g) - w + 1)}
        assert got[did] == want, did

    # (b) shared >= w+k-1 substring => shared fingerprint
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_match_pairs(df, "text", "doc_id", k=k, window=w).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p or 4 in p for p in pairs)

    # (c) degenerate sizes
    assert got[4] == set()
    assert len(got[5]) == 1


def test_sample_token_budget_matches_duckdb(spark, sf_dir):
    """Token-budget mixture sampler against a single-window DuckDB replica:
    the two-level (bucket-cumsum + within-bucket cumsum) formulation must
    select exactly the docs a global per-domain fill order would."""
    from debezium_connector_vitess_spark.ops.pipeline import sample_token_budget
    from tests.oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = spark.createDataFrame(
        [("src0", 800), ("src1", 600), ("src2", 300), ("src3", 0)],
        "source string, budget_tokens long",
    )
    got = sample_token_budget(
        docs, "text", "doc_id", domain_col="source", budgets=budgets, n_buckets=8
    )
    oracle = """
    WITH base AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT
               AS n_tokens,
             ('0x' || substr(md5('mixture' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM documents),
    budgets(source, budget_tokens) AS (
      VALUES ('src0', 800), ('src1', 600), ('src2', 300), ('src3', 0)),
    placed AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source
                                 ORDER BY h % 8, h, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS doc_start
      FROM base)
    SELECT p.doc_id, p.source, p.n_tokens, p.doc_start::BIGINT AS doc_start
    FROM placed p JOIN budgets b USING (source)
    WHERE p.doc_start < b.budget_tokens
    """
    compare(got, oracle, sf_dir)


def test_sample_token_budget_fill_contract(spark, sf_dir):
    """Greedy-fill contract: per domain, selected tokens minus the crossing
    doc stay under budget; every non-empty-budget domain with data selects
    at least one doc; zero budget selects none; re-run is identical."""
    from debezium_connector_vitess_spark.ops.pipeline import sample_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = spark.createDataFrame(
        [("src0", 700), ("src1", 1), ("src2", 0)],
        "source string, budget_tokens long",
    )
    sel = sample_token_budget(
        docs, "text", "doc_id", domain_col="source", budgets=budgets, n_buckets=8
    )
    rows = sel.collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r["source"], []).append(r)
    assert "src2" not in by_dom
    assert len(by_dom["src1"]) == 1  # budget 1: exactly the first doc
    web = sorted(by_dom["src0"], key=lambda r: r["doc_start"])
    # all but the final (crossing) doc fit inside the budget
    assert web[-2]["doc_start"] + web[-2]["n_tokens"] <= 700
    assert web[-1]["doc_start"] < 700
    # deterministic across invocations
    again = sorted(
        (r["doc_id"], r["doc_start"])
        for r in sample_token_budget(
            docs, "text", "doc_id", domain_col="source", budgets=budgets, n_buckets=8
        ).collect()
    )
    assert again == sorted((r["doc_id"], r["doc_start"]) for r in rows)


def test_dsir_importance_matches_duckdb(spark, sf_dir):
    """DSIR hashed-n-gram importance weights (target = English docs, raw =
    whole corpus) against a DuckDB replica of the same feature hash,
    smoothing, and sentinel default."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        dsir_importance,
        dsir_logratios,
    )
    from tests.oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.filter("lang = 'en'")
    lr = dsir_logratios(target, docs, "text", dim=512, alpha=1.0)
    got = dsir_importance(docs, "text", "doc_id", lr, dim=512)
    oracle = """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, lang, unnest(t) AS g FROM toks
      UNION ALL
      SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
                                                 i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks),
    feats AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('dsir' || g), 1, 15))::BIGINT % 512 AS bucket
      FROM grams),
    ct AS (SELECT bucket, count(*) AS c FROM feats WHERE lang = 'en' GROUP BY bucket),
    cr AS (SELECT bucket, count(*) AS c FROM feats GROUP BY bucket),
    tot AS (SELECT (SELECT sum(c) FROM ct) AS nt, (SELECT sum(c) FROM cr) AS nr),
    lr AS (
      SELECT cr.bucket,
             ln((coalesce(ct.c, 0) + 1.0) / (tot.nt + 512.0))
               - ln((cr.c + 1.0) / (tot.nr + 512.0)) AS log_ratio
      FROM cr LEFT JOIN ct USING (bucket), tot)
    SELECT f.doc_id, count(*) AS n_grams, sum(lr.log_ratio) AS log_weight
    FROM feats f JOIN lr USING (bucket)
    GROUP BY f.doc_id
    """
    # raw = whole corpus => every observed bucket has cr >= 1; the sentinel
    # default never fires here (it is exercised in the unit test below).
    compare(got, oracle, sf_dir, float_rtol=1e-9)


def test_dsir_default_bucket_and_plan(spark):
    """Buckets unseen in training score the sentinel smoothed ratio, and the
    scoring join broadcasts the <= dim-row ratio table."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        DSIR_DEFAULT_BUCKET,
        dsir_importance,
        dsir_logratios,
    )

    target = spark.createDataFrame([("alpha beta",)], "text string")
    raw = spark.createDataFrame([("alpha gamma",)], "text string")
    lr = dsir_logratios(target, raw, "text", dim=64, alpha=1.0)
    rows = {r["bucket"]: r["log_ratio"] for r in lr.collect()}
    assert DSIR_DEFAULT_BUCKET in rows
    # nt = 3 grams (alpha, beta, 'alpha beta'); nr = 3 likewise => default = 0
    assert abs(rows[DSIR_DEFAULT_BUCKET]) < 1e-12

    score_df = spark.createDataFrame([(1, "zeta eta"),], "doc_id long, text string")
    scored = dsir_importance(score_df, "text", "doc_id", lr, dim=64)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(bucket" not in plan
    row = scored.collect()[0]
    assert row["n_grams"] == 3
    # every gram of the scored doc is unseen => n_grams x default ratio = 0
    assert abs(row["log_weight"]) < 1e-9


def test_sample_token_budget_plan_parallel_fill(spark, sf_dir):
    """The per-doc cumsum must partition by (domain, bucket) — n_buckets-way
    parallelism inside a domain — and the bucket-starts/budgets joins must
    broadcast (the corpus never shuffles for them)."""
    from debezium_connector_vitess_spark.ops.pipeline import sample_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = spark.createDataFrame(
        [("src0", 800)], "source string, budget_tokens long"
    )
    plan = (
        sample_token_budget(
            docs, "text", "doc_id", domain_col="source", budgets=budgets, n_buckets=8
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partitionBy=[source#" in plan.replace("partition by", "partitionBy=") or (
        "windowspecdefinition(source" in plan
    )
    assert "windowspecdefinition(source#" in plan and "__bucket" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_sql_double_literal_roundtrip(spark):
    """_dlit must round-trip every double exactly through the SQL parser —
    the bit-exactness foundation of the one-parse literal-centroid build."""
    import struct as _struct

    from debezium_connector_vitess_spark.ops.similarity import _dlit

    vals = [0.0, -0.0, 1e-17, 0.1, 2.0 / 3.0, 1.7976931348623157e308,
            5e-324, -123.456789012345678, 3.0000000000000004]
    row = spark.sql(
        "SELECT " + ", ".join(f"{_dlit(v)} AS c{i}" for i, v in enumerate(vals))
    ).collect()[0]
    for i, v in enumerate(vals):
        assert _struct.pack("<d", row[f"c{i}"]) == _struct.pack("<d", v), v


def test_minhash_cross_pairs_match_self_join(spark, sf_dir):
    """Incremental-ingest dedup: with equal knobs, a doc's signature and
    band keys are frame-independent, so minhash_cross_pairs(A, B) must equal
    the self-join pairs of A∪B restricted to cross pairs — same pairs, same
    exact inter/union sizes. Anchors the cross variant to the oracle-checked
    self-join path transitively."""
    from debezium_connector_vitess_spark.ops.dedup import (
        minhash_cross_pairs,
        minhash_dedup_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    cross = {
        (r["new_id"], r["corpus_id"], r["inter_size"], r["union_size"])
        for r in minhash_cross_pairs(new, corpus, "text", "doc_id").collect()
    }
    self_pairs = {
        (r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
        for r in minhash_dedup_pairs(docs, "text", "doc_id").collect()
    }
    self_cross = {
        ((a if a % 2 == 1 else b), (b if a % 2 == 1 else a), i, u)
        for (a, b, i, u) in self_pairs
        if (a % 2) != (b % 2)
    }
    assert cross  # non-vacuous: sf0.001 has odd/even near-dup pairs
    assert cross == self_cross


def test_minhash_cross_pairs_plan_is_equi_join(spark, sf_dir):
    """The candidate stage must join banded keys, never n_new × n_corpus."""
    from debezium_connector_vitess_spark.ops.dedup import minhash_cross_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        minhash_cross_pairs(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
            "text",
            "doc_id",
            materialize=False,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_minhash_bucket_cap_drops_boilerplate(spark):
    """max_bucket_size: a giant exact-duplicate cluster stops fanning out
    into O(n^2) candidate pairs, while ordinary near-dup pairs survive."""
    from debezium_connector_vitess_spark.ops.dedup import minhash_dedup_pairs

    boiler = [(i, "accept all cookies to continue reading this site today") for i in range(40)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog near the river bank"),
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")

    uncapped = minhash_dedup_pairs(df, "text", "doc_id", materialize=False)
    capped = minhash_dedup_pairs(
        df, "text", "doc_id", materialize=False, max_bucket_size=10
    )
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in un and len(un) >= 40 * 39 // 2  # boilerplate explodes
    assert (100, 101) in cp  # small-bucket near-dup pair survives the cap
    assert not any(a < 100 and b < 100 for a, b in cp)  # boilerplate dropped


def test_quality_classifier_separates_and_scores(spark):
    """Full-batch LR on hashed gram features: trained on a separable corpus,
    the classifier must rank clean held-out docs above noisy ones."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        score_quality,
        train_quality_classifier,
    )

    clean = [(i, "the quick brown fox jumps over the lazy dog in the field") for i in range(8)]
    noise = [(i, "xz9 qq7 kk3 zz1 vv8 jj2 ww5 gg4 hh6 xx0 yy9 uu7") for i in range(8)]
    pos = spark.createDataFrame(clean, "doc_id long, text string")
    neg = spark.createDataFrame(noise, "doc_id long, text string")
    w = train_quality_classifier(
        pos, neg, "text", "doc_id", dim=256, iters=20, learn_rate=15.0
    )

    held = spark.createDataFrame(
        [(100, "a quick brown fox and a lazy dog in the sunny field"),
         (200, "qq7 zz1 jj2 gg4 xx0 uu7 kk3 vv8")],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["quality_prob"] for r in
              score_quality(held, "text", "doc_id", w, dim=256).collect()}
    assert scores[100] > 0.5 > scores[200]
    assert scores[100] - scores[200] > 0.3


def test_score_quality_matches_duckdb(spark, sf_dir):
    """Scoring under a FIXED weight table is exactly oracle-replicable:
    same hash, same frequency normalization, same sigmoid."""
    from debezium_connector_vitess_spark.ops.pipeline import score_quality
    from tests.oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fixed = [(-1, 0.25)] + [(b, ((b * 37) % 11 - 5) / 10.0) for b in range(0, 64)]
    w = spark.createDataFrame(fixed, "bucket long, weight double")
    got = score_quality(docs, "text", "doc_id", w, dim=64)
    weight_rows = ", ".join(f"({b}, {wt!r})" for b, wt in fixed)
    oracle = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, unnest(t) AS g FROM toks
      UNION ALL
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks),
    feats AS (
      SELECT doc_id,
             ('0x' || substr(md5('qlr' || g), 1, 15))::BIGINT % 64 AS bucket
      FROM grams),
    x AS (
      SELECT doc_id, bucket,
             count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY doc_id) AS x
      FROM feats GROUP BY doc_id, bucket),
    w(bucket, weight) AS (VALUES {weight_rows}),
    wx AS (
      SELECT x.doc_id, sum(coalesce(w.weight, 0.0) * x.x) AS wx
      FROM x LEFT JOIN w ON x.bucket = w.bucket AND w.bucket <> -1
      GROUP BY x.doc_id),
    n AS (SELECT doc_id, count(*) AS n_grams FROM feats GROUP BY doc_id)
    SELECT wx.doc_id, n.n_grams,
           1.0 / (1.0 + exp(-(wx.wx + 0.25))) AS quality_prob
    FROM wx JOIN n USING (doc_id)
    """
    compare(got, oracle, sf_dir, float_rtol=1e-9)


def test_score_quality_plan_broadcasts(spark, sf_dir):
    """The weight join must broadcast; the only corpus shuffles are the two
    doc-keyed aggregations (feature counts, margin sum)."""
    from debezium_connector_vitess_spark.ops.pipeline import score_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = spark.createDataFrame([(-1, 0.1), (3, 0.5)], "bucket long, weight double")
    plan = (
        score_quality(docs, "text", "doc_id", w, dim=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(bucket" not in plan


def test_sample_token_budget_property(spark):
    """Property: the two-level fill selects EXACTLY the docs a sequential
    per-domain greedy fill (ordered by (bucket, md5, id)) would, with the
    same doc_start offsets — for arbitrary corpora and budgets."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from debezium_connector_vitess_spark.ops.pipeline import sample_token_budget

    docs_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),   # doc_id
            st.sampled_from(["a", "b", "c"]),             # domain
            st.integers(min_value=0, max_value=40),       # n tokens
        ),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    )
    budget_st = st.fixed_dictionaries(
        {d: st.integers(min_value=0, max_value=300) for d in ("a", "b", "c")}
    )

    @given(docs_st, budget_st)
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(rows, budgets):
        n_buckets = 4
        df = spark.createDataFrame(
            [(i, d, " ".join(["w"] * n)) for i, d, n in rows],
            "doc_id long, source string, text string",
        )
        bdf = spark.createDataFrame(
            list(budgets.items()), "source string, budget_tokens long"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["doc_start"])
            for r in sample_token_budget(
                df, "text", "doc_id", domain_col="source",
                budgets=bdf, n_buckets=n_buckets,
            ).collect()
        }
        # sequential reference fill
        expect = {}
        for dom in ("a", "b", "c"):
            members = []
            for i, d, n in rows:
                if d != dom:
                    continue
                h = int(hashlib.md5(f"mixture{i}".encode()).hexdigest()[:15], 16)
                members.append((h % n_buckets, h, i, n))
            members.sort()
            start = 0
            for _, _, i, n in members:
                if start < budgets[dom]:
                    expect[i] = (n, start)
                start += n
        assert got == expect

    check()


def test_dedup_paragraphs_within(spark):
    from debezium_connector_vitess_spark.ops.text import dedup_paragraphs_within

    df = spark.createDataFrame(
        [(1, "intro here\n\nsame para\n\nmiddle bit\n\n\nsame para\n\nend"),
         (2, "only one paragraph"),
         (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           dedup_paragraphs_within(df, "text").collect()}
    assert out[1] == "intro here\n\nsame para\n\nmiddle bit\n\nend"
    assert out[2] == "only one paragraph"
    assert out[3] == ""


def test_drop_duplicate_paragraphs_corpus(spark):
    """Corpus-level: a repeated paragraph survives only at its first
    appearance (lowest doc, then lowest position); short boilerplate under
    min_chars repeats freely; fully-claimed docs come back empty."""
    from debezium_connector_vitess_spark.ops.text import drop_duplicate_paragraphs

    boiler = "subscribe to our newsletter for updates and offers"
    df = spark.createDataFrame(
        [(1, f"unique one\n\n{boiler}\n\nmore text"),
         (2, f"{boiler}\n\nsecond doc body"),
         (3, boiler),
         (4, f"hi\n\n{boiler}")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           drop_duplicate_paragraphs(df, "text", "doc_id", min_chars=10).collect()}
    assert out[1] == f"unique one\n\n{boiler}\n\nmore text"
    assert out[2] == "second doc body"
    assert out[3] == ""
    assert out[4] == "hi"

    # min_chars exemption: short headings repeat everywhere
    short = drop_duplicate_paragraphs(df, "text", "doc_id", min_chars=100)
    kept = {r["doc_id"]: r["text"] for r in short.collect()}
    assert kept[3] == boiler  # nothing long enough to claim


def test_drop_duplicate_paragraphs_matches_duckdb(spark, sf_dir):
    """DuckDB parity for the corpus-level pass on real documents (md5 keys,
    min-(doc,pos) winners, order-preserving rebuild)."""
    from debezium_connector_vitess_spark.ops.text import drop_duplicate_paragraphs
    from tests.oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = drop_duplicate_paragraphs(docs, "text", "doc_id", min_chars=20)
    oracle = """
    WITH paras AS (
      SELECT doc_id, u.p AS para, u.i - 1 AS pos
      FROM (
        SELECT doc_id,
               list_filter(list_transform(string_split_regex(text, '\\n{2,}'),
                                          x -> trim(x)), x -> x <> '') AS ps
        FROM documents),
        LATERAL (SELECT unnest(ps) AS p,
                        generate_subscripts(ps, 1) AS i) u),
    keyed AS (
      SELECT doc_id, pos, para, md5(para) AS phash,
             length(para) >= 20 AS long FROM paras),
    winners AS (
      SELECT phash, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
      FROM keyed WHERE long GROUP BY phash),
    kept AS (
      SELECT k.doc_id, k.pos, k.para FROM keyed k LEFT JOIN winners w USING (phash)
      WHERE (NOT k.long) OR (k.doc_id = w.w.doc_id AND k.pos = w.w.pos)),
    rebuilt AS (
      SELECT doc_id,
             list_aggr(list_transform(list_sort(list(struct_pack(pos := pos, para := para))),
                                      s -> s.para), 'string_agg', e'\\n\\n') AS text
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id, coalesce(r.text, '') AS text
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """
    compare(got, oracle, sf_dir)


def test_read_shard_range_prunes_files(spark, sf_dir, tmp_path):
    """The manifest-pruned range reader must open only overlapping shard
    files and return exactly the rows a full-scan filter would."""
    from debezium_connector_vitess_spark.ops.layout import (
        read_shard_range,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, sort_col="doc_id", num_shards=8)
    assert manifest.count() == 8

    out = read_shard_range(
        spark, path, sort_col="doc_id", lo=100, hi=160, manifest=manifest
    )
    got = sorted(r["doc_id"] for r in out.collect())
    want = sorted(
        r["doc_id"] for r in docs.filter("doc_id BETWEEN 100 AND 160").collect()
    )
    assert got == want and len(got) > 0
    # pruning: fewer files opened than written
    assert 0 < len(out.inputFiles()) < 8
    # empty range loads nothing but keeps the schema
    empty = read_shard_range(
        spark, path, sort_col="doc_id", lo=10**9, hi=2 * 10**9, manifest=manifest
    )
    assert empty.count() == 0 and empty.schema == out.schema


def test_key_skew_profile_duckdb_parity_and_edges(spark, sf_dir):
    """Heavy-hitter key profile: exact DuckDB parity on (column, value, n,
    rank, share) for multi-column profiling including a NULL-bearing key,
    deterministic ties (value ascending, NULL first), sample mode stays a
    subset of the population values, bad params raise."""
    import duckdb
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.layout import key_skew_profile
    from oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        # NULL-bearing derived key: NULL is the classic silent skew value
        "domain_or_null",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("source")),
    )
    prof = key_skew_profile(docs, ["source", "lang", "domain_or_null"], top_n=4)
    oracle = """
    WITH d AS (
      SELECT source, lang,
             CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS domain_or_null
      FROM documents),
    stacked AS (
      SELECT 'source' AS "column", source AS value FROM d
      UNION ALL SELECT 'lang', lang FROM d
      UNION ALL SELECT 'domain_or_null', domain_or_null FROM d),
    counts AS (
      SELECT "column", value, count(*) AS n FROM stacked GROUP BY 1, 2),
    ranked AS (
      SELECT "column", value, n,
             row_number() OVER (PARTITION BY "column"
                                ORDER BY n DESC, value ASC NULLS FIRST) AS rank,
             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY "column") AS share
      FROM counts)
    SELECT "column", value, CAST(n AS BIGINT) n, CAST(rank AS INT) rank, share
    FROM ranked WHERE rank <= 4
    """
    compare(prof, oracle, sf_dir)
    # NULL surfaced as a profiled value on the derived key
    assert any(
        r["column"] == "domain_or_null" and r["value"] is None for r in prof.collect()
    )
    # sample mode: every reported value exists in the full profile's column
    full_vals = {
        (r["column"], r["value"])
        for r in key_skew_profile(docs, ["source"], top_n=100).collect()
    }
    samp_vals = {
        (r["column"], r["value"])
        for r in key_skew_profile(docs, ["source"], top_n=4, sample_frac=0.5).collect()
    }
    assert samp_vals and samp_vals <= full_vals

    with _pytest.raises(ValueError):
        key_skew_profile(docs, [])
    with _pytest.raises(ValueError):
        key_skew_profile(docs, ["source"], top_n=0)
    with _pytest.raises(ValueError):
        key_skew_profile(docs, ["source"], sample_frac=2.0)


def test_shuffle_for_training_deterministic_and_seeded(spark, sf_dir):
    """The seeded global shuffle is a pure function of (id set, seed): the
    (shard, pos) assignment must be identical under adversarial input
    partitioning, a different seed must produce a genuinely different
    permutation, every (shard, pos) slot is unique/dense, and md5 uniformity
    keeps shard sizes balanced."""
    from debezium_connector_vitess_spark.ops.layout import shuffle_for_training

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def placement(df, seed):
        return {
            r.doc_id: (r.shard, r.pos)
            for r in shuffle_for_training(
                df, id_col="doc_id", seed=seed, num_shards=8
            ).collect()
        }

    a = placement(docs, seed=17)
    b = placement(docs.repartition(3), seed=17)  # different physical layout
    c = placement(docs.coalesce(1).orderBy(F.desc("doc_id")), seed=17)
    assert a == b == c

    # each shard's positions are dense 0..len-1 and globally collision-free
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert sorted(by_shard) == list(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    n = len(a)
    assert all(len(p) > 0.5 * n / 8 for p in by_shard.values())

    # a new seed is a fresh permutation (some doc must move)
    d = placement(docs, seed=18)
    assert d != a


def test_shuffle_for_training_shuffles_neighbors_apart(spark, sf_dir):
    """Sanity that the 'shuffle' deserves the name: consecutive doc_ids must
    not stay consecutive in the induced (shard, pos) order."""
    from debezium_connector_vitess_spark.ops.layout import shuffle_for_training

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    rows = shuffle_for_training(
        docs, id_col="doc_id", seed=17, num_shards=8
    ).collect()
    order = [r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos))]
    adjacent_kept = sum(
        1 for x, y in zip(order, order[1:]) if abs(x - y) == 1
    )
    assert adjacent_kept < len(order) * 0.05


def test_lsh_cross_near_pairs_decontamination(spark, sf_dir):
    """Cross-corpus semantic matching: every high-cosine (eval, train) pair
    that shares >= 1 band must surface (recall vs brute force on candidates
    that agree on a band), all surfaced pairs really meet the threshold, and
    self-pairs of the SAME vector across frames always match (identical
    signatures agree on every band)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        cosine_expr,
        lsh_cross_near_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    evals = emb.filter(F.col("vec_id") < 15)
    train = emb.filter(F.col("vec_id") >= 5)  # overlap: 5..14 in both
    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in lsh_cross_near_pairs(
            evals, train, threshold=0.9, num_planes=16, num_bands=4
        ).collect()
    }
    # identical vectors present in both frames: cosine 1.0, all bands agree
    for vid in range(5, 15):
        assert (vid, vid) in got and got[(vid, vid)] > 0.999
    # soundness: no pair below threshold
    assert all(s >= 0.9 for s in got.values())
    # exactness of scores vs direct cosine on a sample pair
    a, b = next(iter(got))
    va = emb.filter(F.col("vec_id") == a).select("embedding").collect()[0][0]
    direct = (
        spark.createDataFrame([(va,)], "v array<float>")
        .crossJoin(emb.filter(F.col("vec_id") == b).select(F.col("embedding").alias("w")))
        .select(cosine_expr(F.col("v"), F.col("w")).alias("c"))
        .collect()[0]["c"]
    )
    assert abs(direct - got[(a, b)]) < 1e-12


def test_html_to_text_extraction(spark):
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import html_to_text_expr

    html = (
        "<html><head><style>p {color: red}</style>"
        "<script type='text/js'>var x = '<p>not text</p>';</script></head>"
        "<body><!-- nav boilerplate --><h1>Title &amp; More</h1>"
        "<p>First   paragraph with <b>bold</b> and &lt;escaped&gt;.</p>"
        "<div>Second block</div><ul><li>item one</li><li>item two</li></ul>"
        "<p>A&nbsp;B &amp;lt; C</p></body></html>"
    )
    out = (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text_expr(F.col("h")).alias("t"))
        .collect()[0]["t"]
    )
    assert "var x" not in out and "color" not in out and "boilerplate" not in out
    assert "Title & More" in out
    assert "First paragraph with bold and <escaped>." in out
    assert "item one\n\nitem two" in out or "item one\nitem two" in out
    assert "A B &lt; C" in out  # &amp;lt; decodes once, not twice
    # block structure survives for the paragraph ops
    assert out.count("\n\n") >= 3


def test_html_to_text_feeds_paragraph_ops(spark):
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import (
        html_to_text_expr,
        paragraphs_expr,
    )

    df = spark.createDataFrame(
        [(1, "<p>alpha</p><p>alpha</p><p>beta</p>")], "doc_id long, h string"
    )
    paras = df.select(
        paragraphs_expr(html_to_text_expr(F.col("h"))).alias("ps")
    ).collect()[0]["ps"]
    assert paras == ["alpha", "alpha", "beta"]


def test_plan_token_budgets_water_filling(spark, sf_dir):
    """Budget planning invariants: never exceed availability, conserve the
    total (up to what exists), redistribute a capped domain's shortfall to
    the others in proportion, and feed sample_token_budget directly."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        plan_token_budgets,
        sample_token_budget,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # src0..src3 have ~1.2-1.6k tokens each
    props = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    plan = plan_token_budgets(
        docs, "text", domain_col="source", total_tokens=3000, proportions=props
    ).collect()
    by = {r["source"]: r for r in plan}
    for d in props:
        assert 0 <= by[d]["budget_tokens"] <= by[d]["available_tokens"]
    assert sum(r["budget_tokens"] for r in plan) == 3000  # corpus can cover it

    # ask for more than src0 has: src0 caps at availability, excess flows on
    big = plan_token_budgets(
        docs, "text", domain_col="source", total_tokens=4000,
        proportions={"src0": 0.9, "src1": 0.1},
    ).collect()
    bigb = {r["source"]: r for r in big}
    assert bigb["src0"]["budget_tokens"] == bigb["src0"]["available_tokens"]
    total = bigb["src0"]["budget_tokens"] + bigb["src1"]["budget_tokens"]
    cap = min(4000, bigb["src0"]["available_tokens"] + bigb["src1"]["available_tokens"])
    assert total == cap

    # asking for more than the whole corpus: budgets = availability
    allof = plan_token_budgets(
        docs, "text", domain_col="source", total_tokens=10**9,
        proportions={"src0": 1.0, "src1": 1.0},
    ).collect()
    for r in allof:
        assert r["budget_tokens"] == r["available_tokens"]

    # composes with the sampler
    budgets = plan_token_budgets(
        docs, "text", domain_col="source", total_tokens=1500, proportions=props
    ).select("source", "budget_tokens")
    sel = sample_token_budget(
        docs, "text", "doc_id", domain_col="source", budgets=budgets
    )
    assert sel.count() > 0


def test_compression_ratio_orders_text_classes(spark):
    """Repetitive boilerplate compresses much harder than fluent prose,
    which compresses harder than hex noise; empty text → null; fixed zlib
    level makes the signal deterministic across runs."""
    import os

    from debezium_connector_vitess_spark.ops.text import with_compression_ratio

    prose = (
        "The committee reviewed the proposal on Tuesday and suggested several "
        "amendments concerning the budget, the timeline, and community input."
    )
    rows = [
        (1, "subscribe now! " * 40),
        (2, prose * 3),
        (3, os.urandom(600).hex()),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["compression_ratio"] for r in
           with_compression_ratio(df, "text").collect()}
    assert out[1] < out[2] < out[3]
    assert out[4] is None
    again = {r["doc_id"]: r["compression_ratio"] for r in
             with_compression_ratio(df, "text").collect()}
    assert again == out


def test_drop_duplicate_paragraphs_property(spark):
    """Property: corpus-level paragraph dedup equals a sequential Python
    model (first (doc,pos) occurrence wins among long paragraphs; short
    ones always survive; rebuild preserves in-document order)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from debezium_connector_vitess_spark.ops.text import drop_duplicate_paragraphs

    para_st = st.sampled_from(
        ["aaaa bbbb cccc", "dddd eeee ffff", "long paragraph gggg hhhh",
         "x", "yy", "shared boiler text zzzz"]
    )
    docs_st = st.lists(
        st.tuples(st.integers(0, 50), st.lists(para_st, min_size=0, max_size=5)),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    )

    @given(docs_st, st.sampled_from([1, 5, 14]))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(rows, min_chars):
        df = spark.createDataFrame(
            [(i, "\n\n".join(ps)) for i, ps in rows], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["text"] for r in
               drop_duplicate_paragraphs(df, "text", "doc_id", min_chars=min_chars)
               .collect()}
        # python model
        winners = {}
        for i, ps in sorted(rows):
            for pos, p in enumerate(ps):
                if len(p) >= min_chars and p not in winners:
                    winners[p] = (i, pos)
        expect = {}
        for i, ps in rows:
            kept = [p for pos, p in enumerate(ps)
                    if len(p) < min_chars or winners.get(p) == (i, pos)]
            expect[i] = "\n\n".join(kept)
        assert got == expect

    check()


def test_html_to_text_never_leaks_tags_property(spark):
    """Random tag soup: extraction never throws, never leaves a tag or a
    script body in the output."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import html_to_text_expr

    piece = st.sampled_from(
        ["<p>", "</p>", "<div class='x'>", "</div>", "<script>SECRET()",
         "</script>", "<b>", "</b>", "plain words here", "&amp;", "&lt;tag&gt;",
         "<br>", "<!-- note -->", "text & more", "<unclosed", ">stray"]
    )

    @given(st.lists(piece, min_size=0, max_size=12))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(pieces):
        html = " ".join(pieces)
        out = (
            spark.createDataFrame([(html,)], "h string")
            .select(html_to_text_expr(F.col("h")).alias("t"))
            .collect()[0]["t"]
        )
        assert "<p>" not in out and "</div>" not in out and "<br" not in out
        # script bodies vanish when the block is closed
        if "</script>" in html and html.index("</script>") > html.find("<script>") >= 0:
            assert "SECRET" not in out

    check()


def test_simhash_bucket_cap_and_60bit_default(spark):
    """SimHash scale guards: max_bucket_size keeps a giant boilerplate
    cluster from fanning out into O(n^2) candidate pairs while a 2-doc
    near-dup pair still matches; the default signature is 60-bit (15-bit
    segment keys), and its pairs equal a brute-force hamming join."""
    from debezium_connector_vitess_spark.ops.dedup import simhash_near_dup_pairs
    from debezium_connector_vitess_spark.ops.text import hamming64_expr, simhash_expr

    boiler = [(i, "accept all cookies to continue reading this site today") for i in range(40)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog near the river bank"),
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")

    uncapped = simhash_near_dup_pairs(df, "text", "doc_id")
    capped = simhash_near_dup_pairs(df, "text", "doc_id", max_bucket_size=10)
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in un and len(un) >= 40 * 39 // 2  # boilerplate explodes
    assert (100, 101) in cp  # small-bucket near-dup pair survives the cap
    assert not any(a < 100 and b < 100 for a, b in cp)  # boilerplate dropped

    # pigeonhole completeness at the 60-bit default: segment-bucket candidates
    # + hamming verify == brute-force all-pairs hamming join
    sigs = df.select("doc_id", simhash_expr(F.col("text"), 60).alias("sim"))
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming64_expr(F.col("a.sim"), F.col("b.sim")).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert un == brute


def test_winnow_doc_freq_cap_drops_boilerplate(spark):
    """max_doc_freq: a passage shared by more docs than the cap produces
    ZERO candidate rows from its fingerprints, while a 2-doc shared passage
    is still found; the plan remains an equi-join (no cartesian)."""
    from debezium_connector_vitess_spark.ops.text import winnow_match_pairs

    header = "permission is hereby granted free of charge to any person obtaining a copy"
    # per-doc tails share no 5-char substring across docs below the cap
    # (leading-digit families like 'tail1'/'tail1x' span 11 docs — above it)
    boiler = [(i, f"{header} tail{i}zz") for i in range(30)]
    near = [
        (100, "zebras gallop across the painted desert while meteors streak overhead"),
        (101, "zebras gallop across the painted desert while comets streak overhead"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")

    capped = winnow_match_pairs(df, "text", "doc_id", max_doc_freq=10)
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in cp  # 2-doc shared passage survives
    assert not any(a < 100 and b < 100 for a, b in cp)  # boilerplate key muted

    uncapped = winnow_match_pairs(df, "text", "doc_id", max_doc_freq=None)
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    assert len({p for p in un if p[0] < 100 and p[1] < 100}) >= 30 * 29 // 2

    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_hashed_exchange_carries_longs(spark, sf_dir):
    """hashed=True (default): the semi-join key is the 60-bit gram hash —
    the gram exchange carries bigint, never n-gram strings — and the hashed
    result matches the string-keyed path on real documents."""
    from debezium_connector_vitess_spark.ops.pipeline import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter("source <> 'src0'")
    ev = docs.filter("source = 'src0'")
    hashed = decontaminate(train, ev, "text", "doc_id", ngram=5)
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    # the join/exchange key is the long-typed `gram` (the #..L suffix marks
    # a bigint attribute); no string-typed gram attribute exists in the plan
    import re

    assert re.search(r"gram#\d+L", plan), f"no long gram key:\n{plan[:2000]}"
    assert not re.search(r"gram#\d+(?!L)\b", plan), "string-typed gram leaked"
    got_h = {r["doc_id"]: r["n_hits"] for r in hashed.collect()}
    got_s = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(
            train, ev, "text", "doc_id", ngram=5, hashed=False
        ).collect()
    }
    assert got_h == got_s  # no collisions on this corpus: identical counts


def test_extract_multimodal_metadata_matches_per_modality_ops(spark, sf_dir):
    """The one-pass combined extractor must agree exactly with the three
    per-modality ops composed over the same payloads (shared decoders), so
    the merged driver row covers them all."""
    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_avi_payload,
        attach_multimodal_payloads,
        attach_png_payload,
        attach_wav_payload,
        extract_audio_metadata,
        extract_image_metadata,
        extract_multimodal_metadata,
        extract_video_metadata,
        resize_images,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    combined = {
        r["doc_id"]: r.asDict()
        for r in extract_multimodal_metadata(attach_multimodal_payloads(docs)).collect()
    }

    png = attach_png_payload(docs)
    img = {r["doc_id"]: r for r in extract_image_metadata(png).collect()}
    rsz = {r["doc_id"]: r for r in resize_images(png).collect()}
    wav = {r["doc_id"]: r for r in extract_audio_metadata(attach_wav_payload(docs)).collect()}
    avi = attach_avi_payload(docs)
    vid = {r["doc_id"]: r for r in extract_video_metadata(avi).collect()}
    smp = {r["doc_id"]: r for r in sample_frames(avi).collect()}

    assert set(combined) == set(img)
    for did, c in combined.items():
        assert (c["width"], c["height"], c["channels"]) == (
            img[did]["width"], img[did]["height"], img[did]["channels"])
        assert (c["target_w"], c["target_h"], c["scale"]) == (
            rsz[did]["target_w"], rsz[did]["target_h"], rsz[did]["scale"])
        assert (c["n_samples"], c["framerate"], c["audio_channels"],
                c["sampwidth"], c["audio_ms"]) == (
            wav[did]["n_samples"], wav[did]["framerate"], wav[did]["channels"],
            wav[did]["sampwidth"], wav[did]["duration_ms"])
        assert (c["n_frames"], c["frame_w"], c["frame_h"], c["fps"],
                c["video_ms"]) == (
            vid[did]["n_frames"], vid[did]["width"], vid[did]["height"],
            vid[did]["fps"], vid[did]["duration_ms"])
        assert c["sampled_frames"] == smp[did]["sampled_frames"]


def test_pack_sequences_bucketed_equals_single_window(spark, sf_dir):
    """The order-preserving two-level cumsum (n_buckets) must produce
    exactly the single-window placement for every document, and its per-doc
    window must partition by (stream, bucket) — no whole-stream reducer."""
    from debezium_connector_vitess_spark.ops.pipeline import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    single = {
        r["doc_id"]: (r["start_offset"], r["block_id"], r["offset_in_block"])
        for r in pack_sequences(
            docs, "text", "doc_id", stream_col="source", block_tokens=512
        ).collect()
    }
    bucketed_df = pack_sequences(
        docs, "text", "doc_id", stream_col="source", block_tokens=512, n_buckets=8
    )
    bucketed = {
        r["doc_id"]: (r["start_offset"], r["block_id"], r["offset_in_block"])
        for r in bucketed_df.collect()
    }
    assert bucketed == single
    # explicit bounds (the zero-action path the registry entry uses) must
    # match too — the docstring guarantee is ANY monotone boundary choice,
    # including deliberately lopsided ones
    explicit = {
        r["doc_id"]: (r["start_offset"], r["block_id"], r["offset_in_block"])
        for r in pack_sequences(
            docs, "text", "doc_id", stream_col="source", block_tokens=512,
            n_buckets=4, bucket_bounds=[3, 7, 400],
        ).collect()
    }
    assert explicit == single
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    # the per-document window partitions by (stream, __bucket): the bucket
    # key appears in a window partition spec, so no whole-stream reducer
    import re

    assert re.search(r"windowspecdefinition\(source#\d+, __bucket#\d+", plan), plan[:1500]


def test_extract_multimodal_metadata_error_modes(spark):
    """E4 failure modes on the combined extractor: a malformed video
    container raises under fail, nulls the row under null, drops it under
    skip — matching the per-modality video op's contract."""
    import pytest

    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_wav,
        attach_multimodal_payloads,
        extract_multimodal_metadata,
    )
    from debezium_connector_vitess_spark.ops.png import encode_png

    good = attach_multimodal_payloads(
        spark.createDataFrame([(1, "hello world document")], "doc_id long, text string")
    ).collect()[0]
    rows = [
        (1, bytes(good["image"]), bytes(good["audio"]), bytes(good["video"])),
        (2, encode_png(4, 4, bytes(48), channels=3), _make_wav(2, 10), b"RIFF\x08\x00\x00\x00AVI truncated"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, image binary, audio binary, video binary"
    )
    with pytest.raises(Exception):
        extract_multimodal_metadata(df, errors="fail").collect()
    nulled = {r["doc_id"]: r for r in extract_multimodal_metadata(df, errors="null").collect()}
    assert nulled[2]["n_frames"] is None and nulled[1]["n_frames"] is not None
    skipped = extract_multimodal_metadata(df, errors="skip").collect()
    assert [r["doc_id"] for r in skipped] == [1]


def test_interpolated_perplexity_discriminates_word_order(spark):
    """The bigram term must distinguish fluent word order from a shuffled
    bag of the SAME words (identical unigram stats) — the capability the
    unigram gate lacks — and the backoff defaults must fire: unseen bigram
    over a seen context uses the per-context default, an OOV token the
    unigram floor."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        bigram_logprobs,
        doc_perplexity,
        doc_perplexity_interpolated,
        unigram_logprobs,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    words = fluent.split()
    shuffled = " ".join(words[::2] + words[1::2])  # same multiset, broken order
    train = spark.createDataFrame(
        [(i, fluent) for i in range(10)], "doc_id long, text string"
    )
    uni = unigram_logprobs(train, "text", alpha=0.5)
    bi = bigram_logprobs(train, "text", alpha=0.5)

    test = spark.createDataFrame(
        [(100, fluent), (101, shuffled), (102, "zzz qqq unseen tokens here")],
        "doc_id long, text string",
    )
    interp = {
        r["doc_id"]: r["perplexity"]
        for r in doc_perplexity_interpolated(
            test, "text", "doc_id", uni, bi
        ).collect()
    }
    unig = {
        r["doc_id"]: r["perplexity"]
        for r in doc_perplexity(test, "text", "doc_id", uni).collect()
    }
    # unigram can't separate the word orders; the interpolated model must
    assert abs(unig[100] - unig[101]) / unig[100] < 0.01
    assert interp[101] > interp[100] * 1.5
    # fully-OOV doc scores worse than the fluent in-domain doc (the floor
    # and the global 1/|V| context default fire; with this 10-word toy
    # vocabulary 1/|V| is generous, so compare against fluent, not shuffled)
    assert interp[102] > interp[100] * 1.5


def test_winnow_cross_match_eval_vs_train(spark, sf_dir):
    """Cross-corpus passage contamination: an eval doc embedding a verbatim
    train passage (>= w+k-1 chars) must match exactly its source doc; clean
    eval docs match nothing; a boilerplate passage present in more train
    docs than the DF cap is muted; and the result agrees with a DuckDB
    replica on real documents."""
    from debezium_connector_vitess_spark.ops.text import winnow_cross_match
    from tests.oracle_harness import compare

    passage = "the venerable contraption wheezed across the cobblestone plaza at dawn"
    boiler = "all rights reserved unauthorized reproduction strictly prohibited"
    train = spark.createDataFrame(
        [(i, f"train document {i} filler{i}zz " + (passage if i == 7 else f"unique{i}qq body")
          + f" {boiler}") for i in range(20)],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            (100, f"eval intro text {passage} eval outro text"),
            (101, "a completely clean evaluation document with fresh content"),
            (102, f"banner only here {boiler} nothing else shared"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in winnow_cross_match(
            evals, train, k=12, window=6, min_shared=2, max_doc_freq=5
        ).collect()
    }
    assert (100, 7) in got            # embedded passage found
    assert not any(l == 101 for l, _ in got)   # clean doc matches nothing
    assert not any(l == 102 for l, _ in got)   # boilerplate muted by DF cap

    # DuckDB parity on the real corpus (eval = src0 docs, train = the rest)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = winnow_cross_match(
        docs.filter("source = 'src0'"),
        docs.filter("source <> 'src0'"),
        k=25, window=10, min_shared=2, max_doc_freq=5,
    )
    oracle = """
    WITH grams AS (
      SELECT doc_id, source,
        list_transform(range(1, greatest(length(text) - 24, 0) + 1),
          i -> ('0x' || substr(md5(substr(text, CAST(i AS INT), 25)), 1, 15))::BIGINT) AS hs
      FROM documents),
    fps AS (
      SELECT doc_id, source,
        list_distinct(list_transform(
          range(1, CASE WHEN len(hs) < 1 THEN 0
                        ELSE greatest(len(hs) - 9, least(len(hs), 1)) END + 1),
          j -> list_min(list_slice(hs, CAST(j AS INT), CAST(j AS INT) + 9)))) AS fp_set
      FROM grams),
    fp AS (SELECT doc_id, source, unnest(fp_set) AS fp FROM fps),
    l AS (SELECT doc_id AS left_id, fp FROM fp WHERE source = 'src0'),
    r0 AS (SELECT doc_id AS right_id, fp FROM fp WHERE source <> 'src0'),
    keep AS (SELECT fp FROM r0 GROUP BY fp HAVING count(*) <= 5),
    r AS (SELECT right_id, fp FROM r0 JOIN keep USING (fp))
    SELECT l.left_id, r.right_id, count(*) AS n_shared
    FROM l JOIN r USING (fp)
    GROUP BY 1, 2 HAVING count(*) >= 2
    """
    compare(pairs, oracle, sf_dir)


def test_interpolated_perplexity_drops_empty_docs(spark):
    """An empty/whitespace document has no tokens: it must be DROPPED (as
    in the unigram gate), not scored off a phantom zip_with-padded null
    position."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        bigram_logprobs,
        doc_perplexity_interpolated,
        unigram_logprobs,
    )

    train = spark.createDataFrame(
        [(1, "some training words here")], "doc_id long, text string"
    )
    uni = unigram_logprobs(train, "text")
    bi = bigram_logprobs(train, "text")
    test = spark.createDataFrame(
        [(10, "some words"), (11, ""), (12, "   ")], "doc_id long, text string"
    )
    out = doc_perplexity_interpolated(test, "text", "doc_id", uni, bi).collect()
    assert sorted(r["doc_id"] for r in out) == [10]


def test_tune_minhash_bands_s_curve():
    """The tuning helper honors the banding s-curve: the chosen (bands,
    rows) reaches the recall bar at the threshold, uses the fewest bands
    that do, and collision probability is monotone in similarity."""
    from debezium_connector_vitess_spark.ops.dedup import (
        lsh_collision_prob,
        tune_minhash_bands,
    )

    b, r = tune_minhash_bands(0.8, num_perm=64, min_recall=0.95)
    assert b * r == 64
    assert lsh_collision_prob(0.8, b, r) >= 0.95
    # no pair with fewer bands reaches the bar
    for b2 in range(1, b):
        if 64 % b2 == 0:
            assert lsh_collision_prob(0.8, b2, 64 // b2) < 0.95
    # monotone s-curve; low-similarity pairs mostly escape
    probs = [lsh_collision_prob(j / 10, b, r) for j in range(11)]
    assert probs == sorted(probs)
    assert lsh_collision_prob(0.2, b, r) < 0.5
    # the default registry geometry (16 bands x 4 rows) catches j >= 0.8
    assert lsh_collision_prob(0.8, 16, 4) > 0.99


def test_corpus_profile_matches_duckdb(spark, sf_dir):
    """Per-domain corpus health snapshot against a DuckDB replica: volumes,
    mean quality (rounded in both engines), exact-dup ratio via distinct
    content fingerprints, empty and PII-bearing doc counts. One scan + one
    groupBy in the plan."""
    from debezium_connector_vitess_spark.ops.text import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        corpus_profile,
    )
    from tests.oracle_harness import compare

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = corpus_profile(docs, "text", "doc_id", domain_col="source")
    oracle = f"""
    WITH m AS (
      SELECT source, doc_id, text,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
             length(text)::DOUBLE AS n_chars
      FROM documents),
    q AS (
      SELECT *,
             len(toks)::DOUBLE AS n_tokens_d,
             len(list_filter(list_transform(toks, x -> lower(x)),
                 x -> x IN ('the','a','of','and','to','in','is','it','on','for')))::DOUBLE AS stop_hits,
             len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE AS n_punct_d,
             list_sum(list_transform(toks, x -> len(x)))::DOUBLE
               / greatest(len(toks), 1) AS mwl
      FROM m),
    s AS (
      SELECT source, doc_id, text, n_chars, len(toks) AS n_tokens,
             (CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_tokens_d >= 20 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN stop_hits / greatest(n_tokens_d, 1) >= 0.05 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_punct_d / greatest(n_chars, 1) <= 0.1
                   AND mwl >= 2.0 AND mwl <= 12.0 THEN 0.25 ELSE 0.0 END) AS quality,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{{L}}\\p{{N}}\\s]', '', 'g'),
                                     '\\s+', ' ', 'g'))) AS fp,
             (len(regexp_extract_all(text, '{PII_EMAIL}', 0))
              + len(regexp_extract_all(text, '{PII_IPV4}', 0))
              + len(regexp_extract_all(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                                       '{PII_PHONE}', 0))) > 0 AS has_pii
      FROM q)
    SELECT source, count(*) AS n_docs,
           sum(CASE WHEN coalesce(length(text), 0) = 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_empty,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(length(text))::BIGINT AS n_chars,
           round(avg(quality), 4) AS mean_quality,
           count(DISTINCT coalesce(fp, md5(''))) AS distinct_content,
           sum(CASE WHEN has_pii THEN 1 ELSE 0 END)::BIGINT AS n_docs_with_pii,
           round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 4) AS dup_ratio
    FROM s GROUP BY source
    """
    compare(got, oracle, sf_dir)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial plans after execution: count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1  # one scan, one groupBy


def test_curation_rounding_margins(spark):
    """The curation driver row hashes round(quality_prob, 4) and
    round(log_weight, 2) cross-engine. Both are float SUMS whose reduction
    order is partitioning-dependent (~1e-13 relative jitter), so the
    convention is only safe while every value keeps real distance from a
    round-half boundary. Assert ≥1e-6 margin (in units of the last kept
    decimal) at BOTH SFs, so a testdata regen can't silently reintroduce
    the round-5 hazard (closest margin then: 8.9e-4 at 6 decimals)."""
    from debezium_connector_vitess_spark.registry import _curation_signals

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = _curation_signals(spark, sf_dir).select(
            "quality_prob", "log_weight"
        ).collect()
        assert rows
        for col, decimals in (("quality_prob", 4), ("log_weight", 2)):
            for r in rows:
                scaled = r[col] * 10**decimals
                dist = abs((scaled - int(scaled // 1)) - 0.5)
                assert dist >= 1e-6, (
                    f"{col}={r[col]!r} sits {dist:.2e} from a round-half "
                    f"boundary at {decimals} decimals ({sf_dir})"
                )


def test_curation_gram_signals_equals_separate_ops(spark, sf_dir):
    """The one-pass fused op must produce the separate composition's answer
    exactly (same hash scheme, same aggregates): quality_prob/q_grams from
    score_quality, log_weight from dsir_logratios + dsir_importance — float
    sums compared at 1e-9 rtol (reduction order differs by design)."""
    import math

    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        curation_gram_signals,
        dsir_importance,
        dsir_logratios,
        score_quality,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fixed = [(-1, 0.25)] + [(b, ((b * 37) % 11 - 5) / 10.0) for b in range(0, 64)]
    w = spark.createDataFrame(fixed, "bucket long, weight double")

    fused = {
        r.doc_id: r
        for r in curation_gram_signals(
            docs, "text", "doc_id", w,
            target=F.col("lang") == "en", dim_q=64, dim_d=512,
        ).collect()
    }
    qual = {
        r.doc_id: r for r in score_quality(docs, "text", "doc_id", w, dim=64).collect()
    }
    lr = dsir_logratios(docs.filter("lang = \'en\'"), docs, "text", dim=512)
    imp = {
        r.doc_id: r
        for r in dsir_importance(docs, "text", "doc_id", lr, dim=512).collect()
    }
    assert set(fused) == set(qual) == set(imp)
    for doc_id, r in fused.items():
        assert r.q_grams == qual[doc_id].n_grams
        assert math.isclose(r.quality_prob, qual[doc_id].quality_prob, rel_tol=1e-9)
        assert math.isclose(r.log_weight, imp[doc_id].log_weight, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# JSON column typed access (ops/jsoncol.py)
# ---------------------------------------------------------------------------


def test_json_fields_match_duckdb_extraction(spark, sf_dir):
    """Typed extraction from the events `props` JSON string column equals
    DuckDB's JSON operators on the same aggregation (per-k event count and
    value sum) — the downstream parse of the reference's io.debezium.data.Json
    string convention (VitessValueConverter.java:84), as one codegen'd
    from_json pass."""
    import os

    import duckdb

    from debezium_connector_vitess_spark.ops.jsoncol import with_json_fields

    evs = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    got = sorted(
        with_json_fields(evs, "props", "k BIGINT")
        .groupBy(F.col("props_parsed.k").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            SELECT CAST(props->>'k' AS BIGINT) AS k,
                   count(*) AS n,
                   round(sum(value), 2) AS value_sum
            FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
            GROUP BY 1
            """
        ).fetchall()
    )
    assert [tuple(r) for r in got] == want


def test_json_schema_inference_is_bounded_and_correct(spark, sf_dir):
    """infer_json_schema discovers the props schema from a bounded sample and
    with_json_fields(schema=None) routes through it."""
    import os

    from debezium_connector_vitess_spark.ops.jsoncol import (
        infer_json_schema,
        with_json_fields,
    )

    evs = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    from pyspark.sql.types import LongType

    schema = infer_json_schema(evs, "props", sample_rows=64)
    assert [f.name for f in schema.fields] == ["k"]
    assert isinstance(schema["k"].dataType, LongType)
    inferred = with_json_fields(evs, "props", sample_rows=64)
    assert dict(inferred.select("props_parsed.k").dtypes)["k"] == "bigint"


def test_json_fields_error_modes(spark):
    """E4 contract parity: permissive nulls the struct, skip drops the bad
    row, fail raises on first malformed document."""
    import pytest

    from debezium_connector_vitess_spark.ops.jsoncol import with_json_fields

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "{not json"), (3, None)], "id INT, props STRING"
    )
    perm = with_json_fields(df, "props", "k BIGINT").orderBy("id").collect()
    assert [r.props_parsed and r.props_parsed.k for r in perm] == [5, None, None]
    skip = with_json_fields(df, "props", "k BIGINT", errors="skip").orderBy("id").collect()
    assert [r.id for r in skip] == [1, 3]  # null source survives; malformed drops
    with pytest.raises(Exception):
        with_json_fields(df, "props", "k BIGINT", errors="fail").collect()
    with pytest.raises(ValueError):
        with_json_fields(df, "props", "k BIGINT", errors="lenient")


def test_json_extraction_is_jvm_only_map_pass(spark, sf_dir):
    """The parse is whole-stage-codegen'd Jackson — no Python eval nodes, no
    exchange (map-only)."""
    import os

    from debezium_connector_vitess_spark.ops.jsoncol import with_json_fields

    evs = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    plan = (
        with_json_fields(evs, "props", "k BIGINT")
        .select("event_id", "props_parsed.k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_json_fields_stream_stateless(spark, sf_dir, tmp_path):
    """with_json_fields is a stateless projection: the identical call works
    on a readStream frame (no watermark, no state store) and yields the same
    per-k counts as batch."""
    import os

    from debezium_connector_vitess_spark.ops.jsoncol import with_json_fields

    import shutil

    src_file = os.path.join(sf_dir, "events.parquet")
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(src_file, src / "part-0.parquet")  # file source wants a dir
    batch_df = spark.read.parquet(src_file)
    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    parsed = with_json_fields(stream, "props", "k BIGINT", errors="skip").select(
        "event_id", F.col("props_parsed.k").alias("k")
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName("json_stream_t")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = dict(
        spark.sql("SELECT k, count(*) n FROM json_stream_t GROUP BY k").collect()
    )
    want = dict(
        with_json_fields(batch_df, "props", "k BIGINT", errors="skip")
        .groupBy(F.col("props_parsed.k").alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == want


def test_chunk_documents_stream_stateless(spark, sf_dir, tmp_path):
    """chunk_documents is a stateless projection+generate: the identical
    call works on a readStream frame (no watermark, no state store) and
    yields the same (doc, chunk) geometry and content hashes as batch —
    the chunking step drops into a streaming ingest unchanged."""
    import os
    import shutil

    from debezium_connector_vitess_spark.ops.pipeline import chunk_documents

    src_file = os.path.join(sf_dir, "documents.parquet")
    src = tmp_path / "docs_src"
    src.mkdir()
    shutil.copy(src_file, src / "part-0.parquet")  # file source wants a dir
    batch_df = spark.read.parquet(src_file)
    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    q = (
        chunk_documents(stream, "text", "doc_id", chunk_tokens=32, overlap=8)
        .writeStream.format("memory")
        .queryName("chunk_stream_t")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_token"], r["n_tokens"], r["chunk_md5"])
        for r in spark.sql("SELECT * FROM chunk_stream_t").collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["start_token"], r["n_tokens"], r["chunk_md5"])
        for r in chunk_documents(
            batch_df, "text", "doc_id", chunk_tokens=32, overlap=8
        ).collect()
    }
    assert got == want and len(got) > len(set(k[0] for k in got))


def test_json_fields_review_hardening(spark):
    """Regression pins for the jsoncol review findings: dotted field names
    survive skip mode (getField, not dotted col paths); schema inference
    strips Spark's corrupt-record field when the sample holds a malformed
    doc; the skip marker never collides with a real field."""
    from debezium_connector_vitess_spark.ops.jsoncol import (
        infer_json_schema,
        with_json_fields,
    )

    # dotted field name through skip mode
    df = spark.createDataFrame(
        [(1, '{"a.b": 5}'), (2, "{not json")], "id INT, props STRING"
    )
    got = (
        with_json_fields(df, "props", "`a.b` BIGINT", errors="skip")
        .orderBy("id")
        .collect()
    )
    assert [r.id for r in got] == [1]
    assert got[0].props_parsed["a.b"] == 5

    # corrupt-record field stripped from inference
    bad = spark.createDataFrame(
        [('{"k": 1}',), ("{not json",)], "props STRING"
    )
    schema = infer_json_schema(bad, "props")
    assert [f.name for f in schema.fields] == ["k"]

    # marker collision: a real _corrupt_json field keeps its data and the
    # malformed row is still detected
    df2 = spark.createDataFrame(
        [(1, '{"_corrupt_json": "x", "k": 2}'), (2, "{not json")],
        "id INT, props STRING",
    )
    got2 = (
        with_json_fields(df2, "props", "_corrupt_json STRING, k BIGINT", errors="skip")
        .orderBy("id")
        .collect()
    )
    assert [r.id for r in got2] == [1]
    assert got2[0].props_parsed["_corrupt_json"] == "x"
    assert got2[0].props_parsed["k"] == 2


def test_dedup_guardrails(spark):
    """r6 review guards: banding geometry must tile the signature exactly
    (a remainder silently drops trailing permutations; bands > num_perm
    crashed with an unrelated zero-arg xxhash64 error), and a lone
    event_time_col must not silently take the unbounded-state dedup branch."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.dedup import (
        exact_dedup_stream,
        minhash_dedup_pairs,
    )

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id LONG, text STRING")
    with _pytest.raises(ValueError, match="divide num_perm"):
        minhash_dedup_pairs(df, "text", "doc_id", num_perm=64, bands=12)
    with _pytest.raises(ValueError, match="divide num_perm"):
        minhash_dedup_pairs(df, "text", "doc_id", num_perm=64, bands=100)
    with _pytest.raises(ValueError, match="together"):
        exact_dedup_stream(df, "text", event_time_col="ts")


def test_pipeline_null_and_edge_hardening(spark):
    """r6 review regressions: NULL text must not kill contamination_flags'
    Arrow batch (the advertised streaming-filter op), must count as zero
    tokens in the planner/packer instead of NULL placements, the planner's
    rounding tail must spread the remainder across all open domains (sum
    invariant), and empty DSIR histograms still yield the sentinel row."""
    from debezium_connector_vitess_spark.ops.pipeline import (
        contamination_flags,
        dsir_importance,
        dsir_logratios,
        pack_sequences,
        plan_token_budgets,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, None)],
        "doc_id LONG, text STRING",
    )
    ev = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], "doc_id LONG, text STRING"
    )
    flags = {r.doc_id: r.n_eval_hits for r in contamination_flags(
        train, ev, "text", "doc_id"
    ).collect()}
    assert flags[1] > 0 and flags[2] == 0  # NULL text = zero hits, no crash

    docs = spark.createDataFrame(
        [(1, "a", "one two"), (2, "a", None), (3, "b", "three"), (4, "c", "four")],
        "doc_id LONG, domain STRING, text STRING",
    )
    # planner: all-NULL-text domain and remainder-tail distribution
    nulls = spark.createDataFrame([(9, "z", None)], "doc_id LONG, domain STRING, text STRING")
    plan_z = plan_token_budgets(nulls, "text", domain_col="domain",
                                proportions={"z": 1.0}, total_tokens=5)
    assert [tuple(r) for r in plan_z.collect()] == [("z", 0, 0)]
    # 3 equal-weight domains, total 2: int(2/3)=0 for all, tail must fill 2
    plan = plan_token_budgets(docs, "text", domain_col="domain",
                              proportions={"a": 1.0, "b": 1.0, "c": 1.0},
                              total_tokens=2)
    got = {r.domain: r.budget_tokens for r in plan.collect()}
    assert sum(got.values()) == 2  # remainder not stranded on one domain

    # packer: NULL text = zero-width placement, never NULL offsets
    placed = pack_sequences(docs, "text", "doc_id", stream_col="domain",
                            block_tokens=4).collect()
    assert all(r.start_offset is not None and r.block_id is not None for r in placed)
    assert {r.doc_id: r.n_tokens for r in placed}[2] == 0

    # DSIR: empty histograms still produce the sentinel, importance keeps rows
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    lr = dsir_logratios(empty, empty, "text", dim=64)
    assert lr.count() == 1  # just the sentinel
    imp = dsir_importance(docs.filter("text IS NOT NULL"), "text", "doc_id", lr, dim=64)
    assert imp.count() == 3


def test_text_review_hardening(spark):
    """r6 text review regressions: non-Latin documents get DISTINCT
    fingerprints (ASCII-only normalize collapsed every zh/ru doc to
    md5('')); corpus_profile counts NULL text as empty and groups it with
    empty content; the phone pattern no longer swallows newline-separated
    digit runs; unclosed <script> bodies never leak into extracted text;
    '<' used as a comparison in prose survives tag stripping."""
    from debezium_connector_vitess_spark.ops.text import (
        corpus_profile,
        fingerprint_expr,
        html_to_text_expr,
        pii_count_exprs,
    )

    ru = spark.createDataFrame(
        [(1, "Привет мир, это первый документ."),
         (2, "Совсем другой текст во втором документе."),
         (3, None)],
        "doc_id LONG, text STRING",
    )
    fps = [r.fp for r in ru.select(fingerprint_expr(F.col("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]  # distinct content -> distinct fingerprints
    prof = corpus_profile(
        ru.withColumn("source", F.lit("ru")), "text", "doc_id", domain_col="source"
    ).collect()[0]
    assert prof.n_empty == 1  # the NULL doc
    assert prof.distinct_content == 3  # two texts + the empty-content group

    txt = spark.createDataFrame(
        [(1, "revenues for 2021\n2022\n2023 were flat"),
         (2, "call +1 (415) 555-0100 now")],
        "id INT, text STRING",
    )
    _, _, p = pii_count_exprs(F.col("text"))
    got = {r.id: r.p for r in txt.select("id", p.alias("p")).collect()}
    assert got[1] == 0  # newline-separated years are not a phone
    assert got[2] == 1

    html = spark.createDataFrame(
        [(1, "<p>ok</p> <script>SECRET()"),
         (2, "if a < b and c > d then stop")],
        "id INT, h STRING",
    )
    out = {r.id: r.t for r in html.select(
        "id", html_to_text_expr(F.col("h")).alias("t")
    ).collect()}
    assert "SECRET" not in out[1]  # unclosed script swallowed to EOF
    assert "a < b and c > d" in out[2]  # prose comparison untouched


def test_similarity_review_hardening(spark):
    """r6 similarity review regressions: a zero-norm embedding must never
    rank (cosine would be NaN, which Spark sorts ABOVE every real score and
    passes through >= thresholds); a dim mismatch fails loudly instead of
    collapsing every LSH key to 0 (silent O(n²)); bad band geometry raises;
    a NULL vector component quantizes to an ALIGNED 0 entry."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        lsh_banded_near_dup_pairs,
        quantize_embeddings,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # the NaN hazard
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    top = brute_force_topk(df, df, k=2)
    assert all(r.neighbor_id != 3 for r in top.collect())  # zero vec never ranks
    assert all(r.query_id != 3 for r in top.collect())
    pairs = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(df, threshold=0.5).collect()}
    assert pairs == {(1, 2)}  # NaN >= 0.5 must not admit the zero vector

    with _pytest.raises(ValueError, match="dim=64"):
        lsh_banded_near_dup_pairs(df, num_planes=16, num_bands=4)  # default dim=64
    with _pytest.raises(ValueError, match="divide"):
        lsh_banded_near_dup_pairs(df, num_planes=16, num_bands=5, dim=4)

    qdf = spark.createDataFrame(
        [(1, [2.0, None, 1.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    q = quantize_embeddings(qdf).collect()[0]
    assert len(q.q_csv.split(",")) == 3  # NULL component stays aligned
    assert q.q_csv.split(",")[1] == "0"


def test_bpe_train_and_encode(spark):
    """BPE tokenizer: training on the classic Sennrich corpus learns the
    textbook merge sequence; encoding is lossless per word (concat of
    tokens == word + end marker), more merges give monotonically fewer
    tokens, training is invariant to partitioning (content-hash sample),
    and count mode equals len(tokens)."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.bpe import END, bpe_encode, train_bpe

    rows = [
        (i, "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = train_bpe(df, "text", num_merges=10, sample_rows=10)
    # the famous first merges: es, est, est</w> (suffix learning via the
    # end-of-word marker), then the 'low' stem
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END)]
    assert ("l", "o") in merges and ("lo", "w") in merges

    toks = {
        r["id"]: r["tokens"]
        for r in bpe_encode(df, "text", "doc_id", merges).collect()
    }
    words = rows[0][1].lower().split()
    assert "".join(toks[0]) == "".join(w + END for w in words)  # lossless
    # high-frequency whole words collapse to single tokens
    assert toks[0][:5] == ["low" + END] * 5

    counts = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe_encode(df, "text", "doc_id", merges, output="count").collect()
    }
    assert counts[0] == len(toks[0])
    few = train_bpe(df, "text", num_merges=2, sample_rows=10)
    count_few = bpe_encode(df, "text", "doc_id", few, output="count").collect()[0][
        "n_bpe_tokens"
    ]
    assert counts[0] < count_few  # more merges -> fewer tokens

    # determinism: partitioning must not change the learned tokenizer
    assert train_bpe(df.repartition(7), "text", num_merges=10, sample_rows=10) == merges

    # NULL/empty text encodes to zero tokens, never errors
    edge = spark.createDataFrame([(1, None), (2, "")], "doc_id bigint, text string")
    got = {
        r["id"]: r["tokens"] for r in bpe_encode(edge, "text", "doc_id", merges).collect()
    }
    assert got == {1: [], 2: []}

    # a NULL-heavy corpus must not crowd real documents out of the
    # training sample (md5(NULL) sorts first): merges still get learned
    nullheavy = spark.createDataFrame(
        [(i, None) for i in range(50)] + [(100 + i, t) for i, t in rows],
        "doc_id bigint, text string",
    )
    assert train_bpe(nullheavy, "text", num_merges=10, sample_rows=10) == merges

    with _pytest.raises(ValueError):
        train_bpe(df, "text", num_merges=0)
    with _pytest.raises(ValueError):
        bpe_encode(df, "text", "doc_id", merges, output="wat")


def test_bpe_incremental_matches_naive():
    """The r13 incremental trainer (pair counter updated by exact deltas,
    only pair-containing words rewritten per merge) must return the
    IDENTICAL merge list to the textbook full-recount fold on every input:
    same counts, same (max count, lexicographically smallest) selection,
    same early stops. Pinned on the Sennrich corpus, adversarial
    overlapping-run/tie inputs, and seeded random samples."""
    import random

    from collections import Counter as _Counter

    from debezium_connector_vitess_spark.ops.bpe import END, _train_from_texts

    def naive(texts, num_merges, end_marker=END):
        # the pre-r13 textbook fold, verbatim
        wf: _Counter = _Counter()
        for t in texts:
            if t:
                for w in t.lower().split():
                    wf[w] += 1
        words = {tuple(w) + (end_marker,): c for w, c in wf.items()}
        merges = []
        for _ in range(num_merges):
            pairs: _Counter = _Counter()
            for sym, c in words.items():
                for i in range(len(sym) - 1):
                    pairs[(sym[i], sym[i + 1])] += c
            if not pairs:
                break
            best_count = max(pairs.values())
            if best_count < 2:
                break
            best_pair = min(p for p, c in pairs.items() if c == best_count)
            merges.append(best_pair)
            merged = "".join(best_pair)
            new_words: dict = {}
            for sym, c in words.items():
                out, i = [], 0
                while i < len(sym):
                    if (
                        i < len(sym) - 1
                        and sym[i] == best_pair[0]
                        and sym[i + 1] == best_pair[1]
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
            words = new_words
        return merges

    cases = [
        ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3] * 4,
        # overlapping runs: (a,a) merges must count/retract exactly
        ["aaaa aaa aa a aaaaa"] * 3,
        # post-merge tuple collisions: 'ab c' meets 'a b c' after (a,b)
        ["ab c " * 4 + "a b c " * 4],
        # frequency ties everywhere: lexicographic tie-break exercised
        ["xy xz yx zy zx yz"] * 2,
        [],  # empty corpus: zero merges
        ["a b c d"],  # every pair unique: early stop
    ]
    rng = random.Random(13)
    alphabet = "abcdef"
    for _ in range(6):
        docs = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(1, 60))
            )
            for _ in range(rng.randint(1, 10))
        ]
        cases.append(docs)
    for texts in cases:
        for nm in (1, 7, 40):
            assert _train_from_texts(texts, nm) == naive(texts, nm), (
                texts,
                nm,
            )


def test_bpe_encode_is_map_only(spark, sf_dir):
    """The distributed half is one Arrow seam with no shuffle at any size."""
    from debezium_connector_vitess_spark.ops.bpe import bpe_encode, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, "text", num_merges=50, sample_rows=100)
    assert len(merges) == 50
    plan = (
        bpe_encode(docs, "text", "doc_id", merges, output="count")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_chunk_documents_precomputed_tokens(spark, sf_dir):
    """tokens_col: chunking a precomputed token array (here BPE tokens)
    gives windows measured in the learned vocabulary — geometry follows
    the array length, per-chunk losslessness carries over (chunk 0 plus
    each later chunk minus its overlap prefix rebuilds the token stream),
    and empty arrays emit nothing."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.bpe import bpe_encode, train_bpe
    from debezium_connector_vitess_spark.ops.pipeline import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = train_bpe(docs, "text", num_merges=40, sample_rows=100)
    toks = bpe_encode(docs, "text", "doc_id", merges)  # (id, tokens)
    out = chunk_documents(
        toks, "unused", "id", chunk_tokens=16, overlap=4,
        tokens_col="tokens", include_text=True,
    )
    joined = out.alias("o").join(toks.alias("t"), F.col("o.id") == F.col("t.id"))
    rows = joined.select(
        "o.id", "chunk_idx", "start_token", "n_tokens", "chunk_text", "t.tokens"
    ).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["chunk_idx"])
        full = doc_rows[0]["tokens"]
        rebuilt: list = []
        for r in doc_rows:
            piece = r["chunk_text"].split(" ")
            assert piece == full[r["start_token"]:r["start_token"] + r["n_tokens"]]
            rebuilt.extend(piece if r["chunk_idx"] == 0 else piece[4:])
        assert rebuilt == full


def test_corpus_diff_duckdb_parity_and_null_marker(spark, sf_dir):
    """Corpus CDC: added/removed/changed classification matches a DuckDB
    full-outer-join oracle on a real snapshot pair; NULL vs empty-string in
    a compared column is a CHANGE (the concat-ws pitfall); unchanged rows
    are excluded by default and delta size == the injected edit count."""
    import duckdb
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import corpus_diff
    from oracle_harness import compare

    old = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    # new snapshot: drop ids %17==0 (removed), rewrite ids %13==0 (changed),
    # append two fresh ids (added)
    new = (
        old.filter(F.col("doc_id") % 17 != 0)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [(900001, "srcX", "fresh doc one"), (900002, "srcX", "fresh doc two")],
                "doc_id bigint, source string, text string",
            )
        )
    )
    got = {
        r["id"]: r["change"]
        for r in corpus_diff(old, new, "doc_id", compare_cols=["source", "text"]).collect()
    }
    con = duckdb.connect()
    con.register("old_t", old.toPandas())
    con.register("new_t", new.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute("""
            SELECT coalesce(o.doc_id, n.doc_id) AS id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.source IS DISTINCT FROM n.source
                          OR o.text IS DISTINCT FROM n.text THEN 'changed'
                        ELSE 'unchanged' END AS change
            FROM old_t o FULL OUTER JOIN new_t n ON o.doc_id = n.doc_id
        """).fetchall()
        if r[1] != "unchanged"
    }
    assert got == want and "added" in got.values() and "removed" in got.values()

    # NULL vs '' must classify as changed, and unchanged rows can be kept
    a = spark.createDataFrame([(1, None), (2, "x")], "doc_id bigint, text string")
    b = spark.createDataFrame([(1, ""), (2, "x")], "doc_id bigint, text string")
    d = {
        r["id"]: r["change"]
        for r in corpus_diff(
            a, b, "doc_id", compare_cols=["text"], emit_unchanged=True
        ).collect()
    }
    assert d == {1: "changed", 2: "unchanged"}
    # separator injection: distinct tuples whose raw concatenation would be
    # identical must still classify as changed (per-column hashing)
    inj_a = spark.createDataFrame([(1, "x", "\x1fy")], "doc_id bigint, a string, b string")
    inj_b = spark.createDataFrame([(1, "x\x1f", "y")], "doc_id bigint, a string, b string")
    inj = corpus_diff(inj_a, inj_b, "doc_id", compare_cols=["a", "b"]).collect()
    assert [r["change"] for r in inj] == ["changed"]
    with _pytest.raises(ValueError):
        corpus_diff(a, b, "doc_id", compare_cols=[])


def test_topk_recall_evaluator(spark, sf_dir):
    """ANN recall@k evaluator: exact-vs-exact is recall 1.0 for every
    query; the LSH variant lands in (0, 1]; a query with zero approximate
    results still appears with recall 0 (dropping it would hide the
    geometry's worst failure mode)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import hash_uniform_expr
    from debezium_connector_vitess_spark.ops.similarity import (
        brute_force_topk,
        lsh_topk,
        topk_recall,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(hash_uniform_expr(F.col("vec_id"), "anneval") < 5)
    assert qs.count() > 3
    truth = brute_force_topk(emb, qs, k=5)

    perfect = topk_recall(truth, truth).collect()
    assert perfect and all(r["recall"] == 1.0 for r in perfect)

    cand = lsh_topk(emb, qs, k=5, num_planes=8)
    rows = topk_recall(cand, truth).collect()
    assert len(rows) == len(perfect)  # every truth query present
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert 0.0 < mean <= 1.0
    assert all(r["n_hit"] <= r["n_exact"] for r in rows)

    # a query absent from the approximate result keeps recall 0
    some_q = perfect[0]["query_id"]
    filtered = cand.filter(F.col("query_id") != some_q)
    z = {r["query_id"]: r["recall"] for r in topk_recall(filtered, truth).collect()}
    assert z[some_q] == 0.0


def test_hyperplane_geometry_tuner():
    """Angle-space banding math: identical vectors always collide, the
    s-curve is monotone in cosine, orthogonal vectors follow the exact
    (1/2)^rows per-band bound, and the chooser returns the fewest-bands
    divisor geometry that clears the recall bar (fewest band keys =
    smallest candidate volume), falling back to recall-max when nothing
    clears it."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.similarity import (
        hyperplane_collision_prob,
        tune_hyperplane_bands,
    )

    assert hyperplane_collision_prob(1.0, 16, 4) == 1.0
    # orthogonal: p = 1/2 per bit -> exactly 1-(1-2^-rows)^bands
    assert hyperplane_collision_prob(0.0, 16, 4) == _pytest.approx(
        1 - (1 - 0.5**4) ** 4
    )
    probs = [hyperplane_collision_prob(c / 10, 16, 4) for c in range(0, 11)]
    assert all(a <= b for a, b in zip(probs, probs[1:]))

    bands, rows = tune_hyperplane_bands(0.8, 16, min_recall=0.9)
    assert bands * rows == 16
    assert hyperplane_collision_prob(0.8, 16, bands) >= 0.9
    # every coarser (fewer-bands) divisor geometry must miss the bar
    for b in [d for d in (1, 2, 4, 8, 16) if d < bands]:
        assert hyperplane_collision_prob(0.8, 16, b) < 0.9
    # unreachable bar -> recall-maximizing fallback (max bands, rows=1)
    fb_bands, fb_rows = tune_hyperplane_bands(0.05, 4, min_recall=0.999999)
    assert (fb_bands, fb_rows) == (4, 1)
    with _pytest.raises(ValueError):
        tune_hyperplane_bands(0.0)
    with _pytest.raises(ValueError):
        hyperplane_collision_prob(2.0, 16, 4)
    # degenerate signature sizes raise a NAMED error from the shared
    # selection core, never an opaque max()-of-empty — both tuners
    from debezium_connector_vitess_spark.ops.dedup import tune_minhash_bands

    with _pytest.raises(ValueError):
        tune_hyperplane_bands(0.8, num_planes=0)
    with _pytest.raises(ValueError):
        tune_minhash_bands(0.8, num_perm=0)
    with _pytest.raises(ValueError):
        tune_hyperplane_bands(0.8, 16, min_recall=0.0)


def test_audit_file_layout_flags(spark, sf_dir, tmp_path):
    """File-geometry audit: footer stats match pyarrow ground truth, a
    kilobyte file flags small, a healthy file under custom thresholds is
    ok, and the report covers every data file exactly once (distributed
    footer reads, one row per file)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.layout import audit_file_layout

    src = str(tmp_path / "corpus")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(3).write.parquet(src)
    # plus one deliberately tiny file
    docs.limit(2).coalesce(1).write.mode("append").parquet(src)

    rep = audit_file_layout(spark, src).collect()
    names = sorted(
        os.path.join(r2, f)
        for r2, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    assert sorted(r["file"] for r in rep) == names
    for r in rep:
        md = pq.ParquetFile(r["file"]).metadata
        assert r["rows"] == md.num_rows and r["n_row_groups"] == md.num_row_groups
        assert r["bytes"] == os.path.getsize(r["file"])
    # everything here is tiny -> flagged small at the default 32 MB bar
    assert all(r["flag"] == "small" for r in rep)
    # with a floor below the real sizes, the healthy files turn ok
    rep2 = audit_file_layout(spark, src, small_mb=0.001).collect()
    assert {r["flag"] for r in rep2} == {"ok"}
    # a nonexistent path raises — an accidentally-empty report must never
    # masquerade as a healthy corpus (it feeds shard sizing)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        audit_file_layout(spark, str(tmp_path / "nothing_here"))
    with _pytest.raises(ValueError):
        audit_file_layout(spark, "s3://bucket/corpus")
    # an existing-but-parquet-free dir IS a valid (empty) report
    (tmp_path / "empty_dir").mkdir()
    empty = audit_file_layout(spark, str(tmp_path / "empty_dir"))
    assert empty.count() == 0 and "flag" in empty.columns


def test_target_rows_per_shard_arithmetic(spark, sf_dir, tmp_path):
    """Compaction arithmetic: the rows-per-shard target derived from the
    audit's own bytes-per-row actually lands rewritten files near the
    byte target (loose band — parquet encoding varies with clustering),
    and degenerate inputs stay sane."""
    import os

    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.layout import (
        audit_file_layout,
        target_rows_per_shard,
        write_training_shards,
    )

    src = str(tmp_path / "frag")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(8).write.parquet(src)  # fragmented input
    audit = audit_file_layout(spark, src)
    target_bytes = 64 * 1024  # tiny target so the corpus yields several files
    rows = target_rows_per_shard(audit, target_mb=target_bytes / 1024 / 1024)
    assert rows >= 1
    dst = str(tmp_path / "compacted")
    write_training_shards(docs, dst, sort_col="doc_id", rows_per_shard=rows)
    sizes = [
        os.path.getsize(os.path.join(dst, f))
        for f in os.listdir(dst)
        if f.endswith(".parquet")
    ]
    assert len(sizes) > 1
    # every output file within a loose band of the byte target
    assert all(0.2 * target_bytes < s < 3.0 * target_bytes for s in sizes)

    # an empty audit refuses to size shards (rows_per_shard=1 would
    # explode the corpus into one file per row)
    with _pytest.raises(ValueError):
        target_rows_per_shard(audit.filter("rows < 0"))
    with _pytest.raises(ValueError):
        target_rows_per_shard(audit, target_mb=0)


def test_bpe_encode_stream_stateless(spark, sf_dir, tmp_path):
    """bpe_encode is a stateless Arrow projection: the identical call (same
    learned merges) runs on a readStream frame with no watermark or state
    store and produces the same per-doc counts as batch — the tokenizer
    drops into a streaming ingest unchanged."""
    import os
    import shutil

    from debezium_connector_vitess_spark.ops.bpe import bpe_encode, train_bpe

    src_file = os.path.join(sf_dir, "documents.parquet")
    src = tmp_path / "docs_src"
    src.mkdir()
    shutil.copy(src_file, src / "part-0.parquet")
    batch_df = spark.read.parquet(src_file)
    merges = train_bpe(batch_df, "text", num_merges=30, sample_rows=100)
    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    q = (
        bpe_encode(stream, "text", "doc_id", merges, output="count")
        .writeStream.format("memory")
        .queryName("bpe_stream_t")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = dict(spark.sql("SELECT id, n_bpe_tokens FROM bpe_stream_t").collect())
    want = dict(
        (r["id"], r["n_bpe_tokens"])
        for r in bpe_encode(batch_df, "text", "doc_id", merges, output="count").collect()
    )
    assert got == want and len(got) > 0


def test_canonical_url_expr_duckdb_parity(spark):
    """URL canonicalization: the five arrival variants of one page collapse
    to a single key, path case survives, non-URL input passes through, and
    the full convention matches an independently-written DuckDB oracle."""
    import duckdb
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import canonical_url_expr

    urls = [
        (1, "HTTP://Example.COM:80/a/b?utm_source=x&id=2&b=1#frag"),
        (2, "http://example.com/a/b?b=1&id=2"),
        (3, "https://Example.com:443"),
        (4, "https://example.com/"),
        (5, "https://example.com/Page?fbclid=abc"),
        (6, "https://example.com/page"),
        (7, "not a url at all"),
        (8, None),
        (9, "https://example.com/x?a=1&a=0"),  # duplicate keys kept, sorted
        # content-selecting params survive: ?ref= picks a branch/article on
        # many sites — dropping it would false-merge distinct pages
        (10, "https://example.com/tree?ref=main"),
        (11, "https://example.com/tree?ref=dev"),
    ]
    df = spark.createDataFrame(urls, "id bigint, url string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_url_expr(F.col("url")).alias("c")).collect()
    }
    # the page variants collapse
    assert got[1] == got[2] == "http://example.com/a/b?b=1&id=2"
    assert got[3] == got[4] == "https://example.com/"
    assert got[5] == "https://example.com/Page"        # tracking dropped
    assert got[5] != got[6]                             # path case preserved
    assert got[7] == "not a url at all" and got[8] is None
    assert got[9] == "https://example.com/x?a=0&a=1"
    assert got[10] != got[11]  # ?ref= selects content; never merged

    con = duckdb.connect()
    con.register("u", df.toPandas())
    oracle = {
        r[0]: r[1]
        for r in con.execute("""
        WITH s AS (
          SELECT id, regexp_replace(trim(url), '#.*$', '') AS u FROM u),
        parts AS (
          SELECT id, u,
            lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
            lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS h,
            regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p,
            regexp_extract(u, '\\?([^#]*)$', 1) AS q
          FROM s),
        norm AS (
          SELECT id, u, sch,
            CASE WHEN sch='http'  THEN regexp_replace(h, ':80$',  '')
                 WHEN sch='https' THEN regexp_replace(h, ':443$', '')
                 ELSE h END AS h,
            CASE WHEN p='' THEN '/' ELSE p END AS p,
            list_sort(list_filter(string_split(q, '&'),
              x -> trim(x) <> '' AND NOT lower(string_split(x, '=')[1]) IN
                ('utm_source','utm_medium','utm_campaign','utm_term',
                 'utm_content','fbclid','gclid','msclkid','mc_cid',
                 'mc_eid','igshid'))) AS kept
          FROM parts)
        SELECT id, CASE WHEN sch='' THEN trim(u) ELSE
          trim(sch || '://' || h || p ||
          CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
               ELSE '' END) END AS c
        FROM norm
        """).fetchall()
    }
    assert got == oracle


def test_select_cluster_representatives(spark):
    """Cluster-survivor selection: default keeps the min-id member (the CC
    label convention), prefer_col keeps the highest-scoring member with
    deterministic min-id ties, unlabeled docs always survive, and exactly
    one member per cluster remains either way."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.dedup import (
        connected_components,
        select_cluster_representatives,
    )

    docs = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.5),   # cluster A (1-2, 2-3)
            (10, 0.1), (11, 0.1),           # cluster B (10-11), tied quality
            (20, 0.7),                       # singleton in labels
            (99, 0.0),                       # never labeled
        ],
        "doc_id bigint, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    labels = connected_components(
        docs.filter("doc_id != 99").select("doc_id"), pairs, id_col="doc_id"
    )

    kept_min = sorted(
        r["doc_id"]
        for r in select_cluster_representatives(docs, labels, "doc_id").collect()
    )
    assert kept_min == [1, 10, 20, 99]

    kept_q = sorted(
        r["doc_id"]
        for r in select_cluster_representatives(
            docs, labels, "doc_id", prefer_col="quality"
        ).collect()
    )
    # cluster A keeps its best copy (2, q=0.9); B's tie breaks to min id 10
    assert kept_q == [2, 10, 20, 99]

    # docs pre-filtered so cluster A's label member (1) is ABSENT: the
    # cluster must still keep its smallest PRESENT member, not vanish
    filtered = docs.filter("doc_id != 1")
    kept_f = sorted(
        r["doc_id"]
        for r in select_cluster_representatives(filtered, labels, "doc_id").collect()
    )
    assert kept_f == [2, 10, 20, 99]

    # all-NULL preference in a cluster ties down to min id, never drops it
    nulls = docs.withColumn(
        "quality", F.when(F.col("doc_id").isin(10, 11), None).otherwise(F.col("quality"))
    )
    kept_n = sorted(
        r["doc_id"]
        for r in select_cluster_representatives(
            nulls, labels, "doc_id", prefer_col="quality"
        ).collect()
    )
    assert kept_n == [2, 10, 20, 99]


def test_audio_chunk_energy_matches_independent_decode(spark, sf_dir):
    """Per-chunk RMS: geometry aligns with chunk_audio over the same real
    WAV payloads, and every RMS value equals an independent stdlib-wave +
    numpy recomputation in the test (mono mixdown by channel mean)."""
    import io
    import wave

    import numpy as np
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_wav_payload,
        audio_chunk_energy,
        chunk_audio,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    payloads = attach_wav_payload(docs)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_sample"], r["n_samples"], r["rms"])
        for r in audio_chunk_energy(payloads, chunk_samples=64).collect()
    }
    geo = {
        (r["doc_id"], r["chunk_idx"]): (r["start_sample"], r["n_samples"])
        for r in chunk_audio(payloads, chunk_samples=64).collect()
    }
    assert set(got) == set(geo)
    for k, (s, n, _rms) in got.items():
        assert geo[k] == (s, n)

    for row in payloads.collect():
        with wave.open(io.BytesIO(bytes(row["payload"])), "rb") as w:
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        if ch > 1:
            samples = samples.reshape(-1, ch).mean(axis=1)
        for idx in range(0, len(samples), 64):
            piece = samples[idx : idx + 64]
            want = float(np.sqrt(np.mean(piece * piece)))
            assert got[(row["doc_id"], idx // 64)][2] == want


def test_image_channel_stats_real_pixels(spark, sf_dir):
    """Per-image channel means over REAL decoded PNG pixels: the solid-color
    fixtures make exact expectations (mean == the doc's fill color, exact
    because every pixel is identical), dimensions come from the decoded
    IHDR, and non-PNG payloads are skipped."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_binary_payload,
        attach_png_payload,
        image_channel_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    stats = {
        r["doc_id"]: r for r in image_channel_stats(attach_png_payload(docs)).collect()
    }
    rows = docs.select("doc_id", F.length(F.encode("text", "utf-8")).alias("n")).collect()
    assert len(stats) == len(rows)
    for r in rows:
        did, n = r["doc_id"], r["n"]
        s = stats[did]
        assert (s["width"], s["height"]) == (8 + n % 24, 8 + (n // 2) % 24)
        assert s["channels"] == 3
        # solid fill -> exact channel means
        assert (s["mean_r"], s["mean_g"], s["mean_b"]) == (
            float(did % 256), float((did * 7) % 256), float((did * 13) % 256)
        )
        assert s["brightness"] == (s["mean_r"] + s["mean_g"] + s["mean_b"]) / 3.0
    # non-PNG payloads skipped, not scored
    assert image_channel_stats(attach_binary_payload(docs)).count() == 0


def test_corpus_datasheet_cross_checked(spark, sf_dir):
    """Datasheet: every headline number equals an independent DuckDB
    recomputation over the same parquet (counts, token totals, exact
    percentiles, dup ratio from distinct fingerprints, domain mix with
    shares summing to <= 1)."""
    import duckdb

    from debezium_connector_vitess_spark.ops.text import corpus_datasheet

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ds = corpus_datasheet(docs)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    row = con.execute(f"""
        SELECT count(*), sum(len({toks})), sum(length(text)),
               quantile_cont(len({toks}), 0.5),
               count(DISTINCT md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^\\p{{L}}\\p{{N}}\\s]', '', 'g'),
                 '\\s+', ' ', 'g'))))
        FROM documents
    """).fetchone()
    assert ds["n_docs"] == row[0]
    assert ds["n_tokens"] == row[1]
    assert ds["n_chars"] == row[2]
    assert ds["tokens_p50"] == row[3]
    assert ds["distinct_content"] == row[4]
    assert ds["dup_ratio"] == 1.0 - row[4] / row[0]
    assert ds["tokens_p50"] <= ds["tokens_p95"] <= ds["tokens_p99"]

    mix = {m["value"]: m["n_docs"] for m in ds["domain_mix"]}
    want_mix = dict(
        con.execute(
            "SELECT source, count(*) FROM documents GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10"
        ).fetchall()
    )
    assert mix == want_mix
    assert 0 < sum(m["share"] for m in ds["domain_mix"]) <= 1.0 + 1e-9
    assert "lang_mix" in ds and len(ds["lang_mix"]) > 0
    # JSON-serializable contract
    import json

    json.dumps(ds)


def test_bpe_merges_roundtrip(spark, tmp_path):
    """Tokenizer persistence: save/load round-trips the merge list exactly
    (so counts are reproducible from the artifact), writes atomically, and
    loading a torn/foreign file raises instead of returning an empty
    tokenizer."""
    import json

    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.bpe import (
        bpe_encode,
        load_merges,
        save_merges,
        train_bpe,
    )

    rows = [(i, "low lower newest widest " * 4) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = train_bpe(df, "text", num_merges=8, sample_rows=10)
    p = str(tmp_path / "tok.json")
    save_merges(merges, p)
    assert load_merges(p) == merges
    a = bpe_encode(df, "text", "doc_id", merges, output="count").collect()
    b = bpe_encode(df, "text", "doc_id", load_merges(p), output="count").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        json.dump({"merges": "nope"}, fh)
    with _pytest.raises(ValueError):
        load_merges(bad)


def test_bpe_decode_roundtrip(spark, sf_dir):
    """decode(encode(text)) == the pre-tokenized form of text (lowercase,
    single-space) for every real document — the end-to-end audit that the
    tokenizer never drops or duplicates a character."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.bpe import (
        bpe_decode_expr,
        bpe_encode,
        train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    merges = train_bpe(docs, "text", num_merges=50, sample_rows=100)
    toks = bpe_encode(docs, "text", "doc_id", merges)
    decoded = toks.select("id", bpe_decode_expr(F.col("tokens")).alias("rt"))
    want = docs.select(
        F.col("doc_id").alias("id"),
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("norm"),
    )
    mism = decoded.join(want, on="id").filter(F.col("rt") != F.col("norm"))
    assert mism.count() == 0


def test_drop_duplicate_blocks_line_unit(spark):
    """unit='line': a nav line repeated across every document survives only
    in the lowest-id doc, unique lines stay, reconstruction keeps single
    newlines, and the default paragraph unit is unchanged by the
    parameterization (blank-line blocks, blank-line joiner)."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.text import drop_duplicate_paragraphs

    nav = "HOME | ABOUT | CONTACT US TODAY"
    rows = [
        (1, f"{nav}\nunique first body line\nanother unique line"),
        (2, f"{nav}\nsecond doc content line"),
        (3, f"{nav}\nthird doc body"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_paragraphs(df, "text", "doc_id", unit="line").collect()
    }
    assert out[1] == f"{nav}\nunique first body line\nanother unique line"
    assert out[2] == "second doc content line"
    assert out[3] == "third doc body"

    # paragraph unit: the same texts hold ONE paragraph each (no blank
    # lines), so whole-doc paragraphs are distinct and nothing is dropped
    para = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_paragraphs(df, "text", "doc_id").collect()
    }
    assert para == {i: t for i, t in rows}

    with _pytest.raises(ValueError):
        drop_duplicate_paragraphs(df, "text", "doc_id", unit="sentence")


def test_filter_blocked_domains_suffix_semantics(spark):
    """Blocklist filtering matches by REGISTRABLE SUFFIX: blocking
    example.com removes a.b.example.com but never notexample.com (the
    substring trap); keep=True inverts into an allowlist; NULL domains
    survive the blocklist and drop under the allowlist; trailing dots and
    case differences are normalized on both sides."""
    from debezium_connector_vitess_spark.ops.text import filter_blocked_domains

    docs = spark.createDataFrame(
        [
            (1, "a.b.Example.COM"),
            (2, "example.com."),
            (3, "notexample.com"),
            (4, "safe.org"),
            (5, None),
        ],
        "doc_id bigint, domain string",
    )
    blocked = spark.createDataFrame([("example.com",), ("ads.net",)], "d string")

    kept = sorted(
        r["doc_id"] for r in filter_blocked_domains(docs, "domain", blocked).collect()
    )
    assert kept == [3, 4, 5]

    allow = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(docs, "domain", blocked, keep=True).collect()
    )
    assert allow == [1, 2]


def test_bpe_end_marker_override_and_artifact_validation(spark, tmp_path):
    """Corpora containing the default marker in-band: a custom end_marker
    threads through train/encode/decode and the roundtrip survives literal
    '</w>' in the text (the default marker aliases there — documented);
    load_merges rejects non-string pair members that would silently
    character-shatter the corpus."""
    import json

    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.bpe import (
        bpe_decode_expr,
        bpe_encode,
        load_merges,
        train_bpe,
    )

    rows = [(1, "see <w>tag</w> here " * 4), (2, "plain words repeat words " * 3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    mk = "\x00w"
    merges = train_bpe(df, "text", num_merges=12, sample_rows=10, end_marker=mk)
    toks = bpe_encode(df, "text", "doc_id", merges, end_marker=mk)
    rt = {
        r["id"]: r["rt"]
        for r in toks.select(
            "id", bpe_decode_expr(F.col("tokens"), end_marker=mk).alias("rt")
        ).collect()
    }
    want = {
        r["doc_id"]: r["norm"]
        for r in df.select(
            "doc_id",
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("norm"),
        ).collect()
    }
    assert rt == want  # literal '</w>' in the data survives the roundtrip

    bad = str(tmp_path / "bad_types.json")
    with open(bad, "w") as fh:
        json.dump({"version": 1, "merges": [[1, 2]]}, fh)
    with _pytest.raises(ValueError):
        load_merges(bad)


def test_r7_advice_guards(spark):
    """Round-6 ADVICE regressions: dim mismatches raise on BOTH frames of
    every two-frame similarity op (a mismatch on the unchecked side silently
    NULL-poisoned its plane dots); bpe_encode carries non-long doc ids
    through the Arrow seam; minhash_dedup_stream rejects non-integral ids
    loudly (its per-bucket state schema is a fixed long)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.bpe import bpe_encode, train_bpe
    from debezium_connector_vitess_spark.ops.dedup import minhash_dedup_stream
    from debezium_connector_vitess_spark.ops.similarity import (
        ivf_topk,
        lsh_cross_near_pairs,
        lsh_topk,
    )

    ok = spark.createDataFrame(
        [(i, [float(i + j) for j in range(4)]) for i in range(1, 9)],
        "vec_id long, embedding array<double>",
    )
    bad = spark.createDataFrame(
        [(99, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="dim"):
        lsh_topk(ok, bad, dim=4, num_planes=2)  # queries side checked too
    with _pytest.raises(ValueError, match="dim"):
        lsh_cross_near_pairs(ok, bad, dim=4)  # right side checked too
    with _pytest.raises(ValueError, match="dim"):
        ivf_topk(ok, bad, n_centroids=2, quantizer="kmeans")

    # string doc ids ride the BPE seam untouched
    sdocs = spark.createDataFrame(
        [("a", "low lower lowest"), ("b", "new newer newest")],
        "doc_id string, text string",
    )
    merges = train_bpe(sdocs, "text", num_merges=8)
    got = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe_encode(sdocs, "text", "doc_id", merges, output="count").collect()
    }
    assert set(got) == {"a", "b"} and all(v > 0 for v in got.values())

    # streaming minhash: non-integral id is a loud misconfiguration, not a
    # silent NULL/ANSI-error at runtime
    sstream = (
        spark.readStream.format("rate").load()
        .select(F.col("timestamp").cast("string").alias("doc_id"),
                F.lit("some text body").alias("text"))
    )
    with _pytest.raises(ValueError, match="integral"):
        minhash_dedup_stream(sstream, "text", "doc_id")


def test_decode_table_rejects_contradictory_temporal_mode(spark):
    """decode_table used to silently strip temporal_mode: a caller passing a
    mode that differs from the one the pre-resolved schema was built with
    now gets a loud error (the type choice happened at resolve time); the
    MATCHING mode stays accepted for signature compatibility."""
    import pytest as _pytest

    from debezium_connector_vitess_spark import changelog
    from debezium_connector_vitess_spark.decode import decode_table
    from debezium_connector_vitess_spark.types import (
        ColumnMetaData,
        TableSchema,
        TemporalPrecisionMode,
        resolve,
    )

    raw = changelog.events_to_raw_vevents(
        changelog.load_events(spark, "/root/testdata/sf0.001")
    )
    schema = TableSchema(
        keyspace="ks0", shard="-40", table="tbl0",
        columns=[
            ColumnMetaData("user_id", resolve("INT64"), is_primary_key=True),
            ColumnMetaData(
                "value",
                resolve(
                    "DATETIME",
                    temporal_mode=TemporalPrecisionMode.ADAPTIVE_TIME_MICROSECONDS,
                ),
            ),
        ],
    )
    with _pytest.raises(ValueError, match="temporal_mode"):
        decode_table(raw, schema, temporal_mode=TemporalPrecisionMode.CONNECT)
    # matching mode: accepted, identical plan
    df = decode_table(
        raw, schema,
        temporal_mode=TemporalPrecisionMode.ADAPTIVE_TIME_MICROSECONDS,
    )
    assert "before" in df.columns


def test_repetition_signal_exprs_gopher_rules(spark):
    """Gopher repetition-filter signals (Rae et al. 2021 A1.1) as exact
    integer counts: duplicate-line instances and their character mass count
    beyond each first occurrence (trimmed, blank lines ignored), the
    top-bigram coverage picks the most frequent word 2-gram with
    larger-coverage tie-break, and NULL text is the all-zeros empty
    document. Expected values hand-derived; the text_metrics driver row
    carries the same four columns against an independent DuckDB derivation
    (relational unnest/group, not a fold transliteration)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.text import repetition_signal_exprs

    rows = [
        (1, "a b\na b\nc d\n\n a b "),       # 'a b' line x3 -> 2 dup instances
        (2, "one two three two three two"),  # 'two three' x2, len 9 -> 18
        (3, None),
        (4, "single"),
        (5, "x\nx\nx"),                      # line 'x' x3; bigram 'x x' x2
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    nl, nd, dc, tb = repetition_signal_exprs(F.col("text"))
    got = {
        r["id"]: (r["nl"], r["nd"], r["dc"], r["tb"])
        for r in df.select(
            "id", nl.alias("nl"), nd.alias("nd"), dc.alias("dc"), tb.alias("tb")
        ).collect()
    }
    assert got == {
        1: (4, 2, 6, 9),
        2: (1, 0, 0, 18),
        3: (0, 0, 0, 0),
        4: (1, 0, 0, 0),
        5: (3, 2, 2, 6),
    }


def test_perplexity_quantization_margins(spark):
    """doc_perplexity ships integer-quantized twins (q4 log-space / q2
    perplexity). Both per-doc averages are cross-row float sums with
    ~1e-13 relative reduction-order jitter, so the convention is safe only
    while every value keeps real distance from a round-half boundary at
    the quantization grid — assert ≥1e-6 scaled margin at BOTH SFs (the
    curation-row convention)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        bigram_logprobs,
        doc_perplexity,
        doc_perplexity_interpolated,
        kn_bigram_logprobs,
        unigram_logprobs,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        lm = unigram_logprobs(docs, "text", alpha=0.5)
        bi = bigram_logprobs(docs, "text", alpha=0.5)
        uni = doc_perplexity(docs, "text", "doc_id", lm).select(
            F.col("avg_neg_logp").alias("l4"), F.col("perplexity").alias("p2")
        )
        interp = doc_perplexity_interpolated(
            docs, "text", "doc_id", lm, bi, lam=0.7, alpha=0.5
        ).select(
            F.col("avg_neg_logp").alias("l4"), F.col("perplexity").alias("p2")
        )
        kn = kn_bigram_logprobs(docs, "text", discount=0.75, beta=0.5)
        kn_scored = doc_perplexity_interpolated(
            docs, "text", "doc_id", lm, kn, lam=1.0, alpha=0.5
        ).select(
            F.col("avg_neg_logp").alias("l4"), F.col("perplexity").alias("p2")
        )
        for r in uni.unionAll(interp).unionAll(kn_scored).collect():
            for v, scale in ((r["l4"], 10000), (r["p2"], 100)):
                scaled = v * scale
                dist = abs((scaled - int(scaled // 1)) - 0.5)
                assert dist >= 1e-6, (
                    f"{v!r} sits {dist:.2e} from a round-half boundary "
                    f"at 1/{scale} ({sf_dir})"
                )


def test_doc_perplexity_multi_matches_separate(spark):
    """doc_perplexity_multi (r12: the registry's fused one-pass scorer)
    must reproduce the separate doc_perplexity +
    doc_perplexity_interpolated composition exactly on the quantization
    grid the driver hashes (q4 log-space / q2 perplexity) — the per-token
    terms are the identical expressions, so only float reduction order may
    differ, and the margin test above guarantees the grid absorbs that."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        bigram_logprobs,
        doc_perplexity,
        doc_perplexity_interpolated,
        doc_perplexity_multi,
        kn_bigram_logprobs,
        unigram_logprobs,
    )

    def q(col, scale):
        return F.round(F.col(col) * scale, 0).cast("long")

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = unigram_logprobs(docs, "text", alpha=0.5)
    bi = bigram_logprobs(docs, "text", alpha=0.5)
    kn = kn_bigram_logprobs(docs, "text", discount=0.75, beta=0.5)

    fused = {
        r["doc_id"]: tuple(r)[1:]
        for r in doc_perplexity_multi(
            docs, "text", "doc_id", lm, [("interp", bi, 0.7), ("kn", kn, 1.0)]
        )
        .select(
            "doc_id", "n_tokens",
            q("avg_neg_logp", 10000), q("perplexity", 100),
            q("interp_avg_neg_logp", 10000), q("interp_perplexity", 100),
            q("kn_avg_neg_logp", 10000), q("kn_perplexity", 100),
        )
        .collect()
    }
    uni_s = doc_perplexity(docs, "text", "doc_id", lm).select(
        "doc_id", "n_tokens", q("avg_neg_logp", 10000).alias("l"),
        q("perplexity", 100).alias("p"),
    )
    int_s = doc_perplexity_interpolated(
        docs, "text", "doc_id", lm, bi, lam=0.7, alpha=0.5
    ).select("doc_id", q("avg_neg_logp", 10000).alias("il"),
             q("perplexity", 100).alias("ip"))
    kn_s = doc_perplexity_interpolated(
        docs, "text", "doc_id", lm, kn, lam=1.0, alpha=0.5
    ).select("doc_id", q("avg_neg_logp", 10000).alias("kl"),
             q("perplexity", 100).alias("kp"))
    separate = {
        r["doc_id"]: (r["n_tokens"], r["l"], r["p"], r["il"], r["ip"],
                      r["kl"], r["kp"])
        for r in uni_s.join(int_s, "doc_id").join(kn_s, "doc_id").collect()
    }
    assert fused == separate and len(fused) > 0


def _semdedup_expected(rows, n_centroids, threshold, keep):
    """Independent Python recomputation of semantic_dedup: sequential-fold
    double cosine (the identical left-fold both engines use, so comparisons
    are bit-exact), md5-ordered sampled centroids, max-cosine/min-id
    assignment, exists-a-higher-priority-similar-neighbor conviction."""
    import hashlib

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc += float(x) * float(x)
        return acc ** 0.5

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    vecs = {i: v for i, v in vecs.items() if any(x != 0.0 for x in v)}
    order = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = {i: vecs[i] for i in order[:n_centroids]}
    assign, cscore = {}, {}
    for i, v in vecs.items():
        best = max(
            ((dot(v, cv) / (norm(v) * norm(cv)), -cid) for cid, cv in cents.items())
        )
        assign[i], cscore[i] = -best[1], best[0]
    prio = (lambda i: i) if keep == "min_id" else (lambda i: (cscore[i], i))
    expected = {}
    for i in vecs:
        witnesses = [
            j
            for j in vecs
            if j != i
            and assign[j] == assign[i]
            and prio(j) < prio(i)
            and dot(vecs[i], vecs[j]) / (norm(vecs[i]) * norm(vecs[j])) >= threshold
        ]
        expected[i] = (assign[i], min(witnesses) if witnesses else None)
    return expected


def test_semantic_dedup_matches_brute_force(spark, sf_dir):
    """SemDeDup conviction flags equal an independent brute-force
    recomputation (same-fold double arithmetic) for BOTH keep rules."""
    from debezium_connector_vitess_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    for keep in ("min_id", "far_centroid"):
        expected = _semdedup_expected(rows, 16, 0.4, keep)
        got = {
            r["vec_id"]: (r["cluster_id"], r["witness_id"])
            for r in semantic_dedup(emb, threshold=0.4, keep=keep).collect()
        }
        assert got == expected, (
            f"keep={keep}: {len(set(got) ^ set(expected))} id mismatches; "
            f"sample diff: "
            f"{[(i, got.get(i), expected.get(i)) for i in list(set(got) ^ set(expected) or [k for k in got if got[k] != expected.get(k)])[:3]]}"
        )


def test_semantic_dedup_threshold_and_guards(spark, sf_dir):
    from debezium_connector_vitess_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # a threshold above attainable cosine keeps everything
    out = semantic_dedup(emb, threshold=1.01).collect()
    assert all(not r["is_dup"] and r["witness_id"] is None for r in out)
    assert len(out) == emb.count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(emb, keep="random")
    with _pytest.raises(ValueError, match="unknown quantizer"):
        semantic_dedup(emb, quantizer="grid")


def test_semantic_dedup_kmeans_quantizer_runs(spark, sf_dir):
    """The refined-centroid path flags a superset-or-different but valid
    partition: every doc appears once, witnesses precede their convicts."""
    from debezium_connector_vitess_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(
        emb, threshold=0.4, quantizer="kmeans", kmeans_iters=1
    ).collect()
    assert len(out) == emb.count()
    assert len({r["vec_id"] for r in out}) == len(out)
    for r in out:
        if r["is_dup"]:
            assert r["witness_id"] < r["vec_id"]  # min_id priority


def _morton_ref(v0, v1, b0, b1, bits=8):
    """Reference Morton coding in plain Python: normalize against exact
    bounds, interleave bit b of column i to position b*2+i."""
    (mn0, mx0), (mn1, mx1) = b0, b1
    c0 = ((v0 - mn0) * (1 << bits)) // (mx0 - mn0 + 1)
    c1 = ((v1 - mn1) * (1 << bits)) // (mx1 - mn1 + 1)
    z = 0
    for b in range(bits):
        z |= ((c0 >> b) & 1) << (b * 2)
        z |= ((c1 >> b) & 1) << (b * 2 + 1)
    return z


def test_zorder_key_matches_reference(spark):
    from debezium_connector_vitess_spark.ops.layout import (
        column_bounds,
        zorder_key_expr,
    )

    rows = [(i, (i * 37) % 101) for i in range(200)] + [(200, None)]
    df = spark.createDataFrame(rows, "a long, b long")
    bounds = column_bounds(df, ["a", "b"])
    assert bounds == {"a": (0, 200), "b": (0, 100)}
    got = {
        r["a"]: r["z"]
        for r in df.select(
            "a", zorder_key_expr(["a", "b"], bounds=bounds).alias("z")
        ).collect()
    }
    for a, b in rows:
        want = _morton_ref(a, b if b is not None else 0, (0, 200), (0, 100))
        assert got[a] == want, (a, b, got[a], want)


def test_zorder_guards(spark):
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.layout import (
        column_bounds,
        zorder_key_expr,
    )

    with _pytest.raises(ValueError, match="exceeds a BIGINT"):
        zorder_key_expr(["a", "b"], bounds={"a": (0, 1), "b": (0, 1)}, bits=32)
    with _pytest.raises(ValueError, match="floor-exact"):
        zorder_key_expr(["a"], bounds={"a": (0, 1 << 50)}, bits=8)
    with _pytest.raises(ValueError, match="inverted"):
        zorder_key_expr(["a"], bounds={"a": (5, 1)})
    with _pytest.raises(ValueError, match="no bounds"):
        zorder_key_expr(["a"], bounds={})
    df = spark.createDataFrame([(None,)], "a long")
    with _pytest.raises(ValueError, match="all-NULL"):
        column_bounds(df, ["a"])


def test_zorder_box_prunes_files(spark, sf_dir, tmp_path):
    """The payoff measurement: a Z-ordered layout answers a selective 2-D
    box by opening a strict subset of files AND returns exactly the
    brute-force rows; the same box's secondary dimension prunes NOTHING on
    a 1-D doc_id-sorted layout (every file's n_chars span covers the box)."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.layout import (
        read_zordered_box,
        write_training_shards,
        write_zordered,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.length("text").alias("n_chars"))
    )
    zpath = str(tmp_path / "zorder")
    manifest = write_zordered(
        docs, zpath, cols=["doc_id", "n_chars"], num_shards=8
    )
    n_files = manifest.count()
    assert n_files >= 4  # enough geometry for pruning to mean something

    # a quarter-ish box on both dimensions
    lo_d, hi_d = 100, 220
    stats = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    mnc, mxc = stats[0], stats[1]
    lo_c, hi_c = mnc, mnc + (mxc - mnc) // 4
    box = {"doc_id": (lo_d, hi_d), "n_chars": (lo_c, hi_c)}

    pruned = read_zordered_box(spark, zpath, box=box, manifest=manifest)
    opened = {
        r["file"]
        for r in manifest.filter(
            (F.col("min_doc_id") <= hi_d) & (F.col("max_doc_id") >= lo_d)
            & (F.col("min_n_chars") <= hi_c) & (F.col("max_n_chars") >= lo_c)
        ).collect()
    }
    assert len(opened) < n_files, "2-D box should prune at least one file"
    expected = sorted(
        r["doc_id"]
        for r in docs.filter(
            F.col("doc_id").between(lo_d, hi_d)
            & F.col("n_chars").between(lo_c, hi_c)
        ).collect()
    )
    assert sorted(r["doc_id"] for r in pruned.collect()) == expected

    # 1-D comparison: a doc_id-sorted layout leaves every file's n_chars
    # span covering the box — zero pruning on the second dimension
    lpath = str(tmp_path / "linear")
    write_training_shards(docs, lpath, sort_col="doc_id", num_shards=8)
    lin_spans = (
        spark.read.parquet(lpath)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    )
    lin_overlapping = lin_spans.filter(
        (F.col("mn") <= hi_c) & (F.col("mx") >= lo_c)
    ).count()
    z_chars_overlapping = manifest.filter(
        (F.col("min_n_chars") <= hi_c) & (F.col("max_n_chars") >= lo_c)
    ).count()
    assert z_chars_overlapping < lin_overlapping, (
        f"z-order should narrow n_chars spans: {z_chars_overlapping} vs "
        f"linear {lin_overlapping} of {n_files}"
    )


def test_filter_by_repetition_gates(spark):
    from debezium_connector_vitess_spark.ops.text import filter_by_repetition

    # genuinely varied text — a REPEATED sentence would (correctly) trip the
    # top-bigram gate at 5 repetitions (each bigram covers >20% of chars)
    prose = (
        "the quick brown fox jumps over a lazy dog\n"
        "meanwhile seventeen geese wandered across the frozen lake\n"
        "nobody expected rain during such a bright afternoon\n"
        "her telescope revealed four new moons around the planet"
    )
    dup_lines = "\n".join(["copy this line"] * 10 + ["one original line here"])
    bigram_spam = "buy now " * 40
    rows = [
        (1, prose),
        (2, dup_lines),
        (3, bigram_spam),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in filter_by_repetition(df, "text").collect()}
    # prose passes; duplicate-line doc and bigram-spam doc are rejected;
    # empty/NULL docs pass (all-zero signals → every fraction 0)
    assert kept == {1, 4, 5}
    rejected = {
        r["doc_id"] for r in filter_by_repetition(df, "text", keep=False).collect()
    }
    assert rejected == {2, 3}
    # loosening every threshold to 1.0 keeps everything
    all_kept = filter_by_repetition(
        df, "text",
        max_dup_line_frac=1.0, max_dup_line_char_frac=1.0,
        max_top_bigram_char_frac=1.0,
    ).count()
    assert all_kept == 5


def test_tokenizer_fertility(spark, sf_dir):
    """Exact integer sums, grouped and global; fertility ≥ 1 piece per word
    (losslessness floor) and sums recompute from the per-doc counts."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.bpe import (
        bpe_encode,
        tokenizer_fertility,
        train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    merges = train_bpe(docs, "text", num_merges=50, sample_rows=200)
    per_lang = {
        r["lang"]: r for r in tokenizer_fertility(
            docs, "text", "doc_id", merges, by="lang"
        ).collect()
    }
    assert set(per_lang) == {r["lang"] for r in docs.select("lang").distinct().collect()}
    total = tokenizer_fertility(docs, "text", "doc_id", merges).collect()[0]
    assert total["n_docs"] == docs.count()
    assert total["n_docs"] == sum(r["n_docs"] for r in per_lang.values())
    assert total["n_bpe_tokens"] == sum(r["n_bpe_tokens"] for r in per_lang.values())
    # ground truth: the op's sums equal independent recomputation
    counts = bpe_encode(docs, "text", "doc_id", merges, output="count")
    expect_tokens = counts.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    expect_words = docs.select(
        F.size(F.filter(F.split(F.coalesce("text", F.lit("")), r"\s+"),
                        lambda x: x != "")).alias("w")
    ).agg(F.sum("w")).collect()[0][0]
    assert total["n_bpe_tokens"] == expect_tokens
    assert total["n_words"] == expect_words
    # losslessness floor: every word costs at least one piece
    assert total["n_bpe_tokens"] >= total["n_words"]


def test_semantic_dedup_gemm_assignment_agrees(spark, sf_dir):
    """The BLAS assignment path (the large-k production shape) produces the
    same clustering as the bit-exact literal-expr path on real data — ulp
    flips are possible only between near-tied centroids, so demand full
    agreement here and fall back to a 99% bar only if the fixture ever
    produces a genuine near-tie."""
    from debezium_connector_vitess_spark.ops.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expr_out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"], r["witness_id"])
        for r in semantic_dedup(emb, threshold=0.4, assignment="expr").collect()
    }
    gemm_out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"], r["witness_id"])
        for r in semantic_dedup(emb, threshold=0.4, assignment="gemm").collect()
    }
    assert set(expr_out) == set(gemm_out)
    agree = sum(expr_out[i] == gemm_out[i] for i in expr_out)
    assert agree / len(expr_out) >= 0.99
    assert agree == len(expr_out), (
        f"{len(expr_out) - agree} docs flipped between assignment paths — "
        f"near-tied centroids; acceptable only if scores genuinely tie"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="assignment must be"):
        semantic_dedup(emb, assignment="blas")


def test_packing_efficiency(spark, sf_dir):
    """Exact-sum invariants against pack_sequences placements: capacity
    accounts for long docs spanning start-less blocks, padding stays inside
    [0, block_tokens), and totals reconcile with the raw token counts."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        pack_sequences,
        packing_efficiency,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    block = 64  # small enough that some docs span multiple blocks
    packed = pack_sequences(
        docs, "text", "doc_id", stream_col="source", block_tokens=block
    )
    eff = {r["stream"]: r for r in packing_efficiency(
        packed, block_tokens=block, stream_col="source"
    ).collect()}
    totals = {
        r["source"]: (r["docs"], r["toks"])
        for r in docs.groupBy("source").agg(
            F.count("*").alias("docs"),
            F.sum(F.size(F.filter(
                F.split(F.coalesce("text", F.lit("")), r"\s+"),
                lambda x: x != "",
            ))).alias("toks"),
        ).collect()
    }
    assert set(eff) == set(totals)
    for s, r in eff.items():
        docs_n, toks = totals[s]
        assert r["n_docs"] == docs_n
        assert r["n_tokens"] == toks
        assert 0 <= r["padding_tokens"] < block
        assert r["capacity_tokens"] == r["n_blocks"] * block
        assert r["n_blocks"] == -(-toks // block)  # ceil


def test_assign_splits(spark, sf_dir):
    """Leakage safety (same key ⇒ same split), approximate fractions,
    determinism, and DuckDB parity of the integer-threshold md5 recipe."""
    import duckdb
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import assign_splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.col("doc_id") % 50).alias("cluster_id")
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(docs, "cluster_id", fractions=fr)
    rows = out.collect()
    assert len(rows) == docs.count()
    # leakage safety: split is a pure function of the key
    by_key = {}
    for r in rows:
        by_key.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_key.values())
    # fractions approximately respected over keys (50 keys, loose bar)
    from collections import Counter

    key_splits = Counter(next(iter(s)) for s in by_key.values())
    assert set(key_splits) <= set(fr)
    assert key_splits["train"] > key_splits["val"]
    assert key_splits["train"] > key_splits["test"]
    # determinism across invocations
    again = {(r["doc_id"], r["split"]) for r in
             assign_splits(docs, "cluster_id", fractions=fr).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in rows}
    # DuckDB mirror: identical thresholds on the identical md5 long
    con = duckdb.connect()
    dd = {
        r[0]: r[1]
        for r in con.execute(
            """
        WITH k AS (SELECT DISTINCT doc_id % 50 AS cluster_id
                   FROM read_parquet(?)),
        u AS (SELECT cluster_id,
               ('0x' || substr(md5('split' || CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 AS u
              FROM k)
        SELECT cluster_id,
               CASE WHEN u < 800000 THEN 'train'
                    WHEN u < 900000 THEN 'val' ELSE 'test' END
        FROM u
        """,
            [f"{sf_dir}/documents.parquet"],
        ).fetchall()
    }
    con.close()
    assert dd == {k: next(iter(s)) for k, s in by_key.items()}
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, "cluster_id", fractions={"a": 0.5, "b": 0.1})
    with _pytest.raises(ValueError, match="at least two"):
        assign_splits(docs, "cluster_id", fractions={"all": 1.0})


def test_filter_badwords(spark):
    """Regex mode (phrases, word boundaries), token mode (exact unigram, no
    substring trips), NULL contract, flag/keep variants, and DuckDB parity
    of the shared pattern."""
    import duckdb

    from debezium_connector_vitess_spark.ops.text import (
        badword_pattern,
        filter_badwords,
    )

    rows = [
        (1, "a perfectly CLEAN sentence"),
        (2, "this mentions badword once"),
        (3, "classified documents about classes"),   # substring trap for 'ass'
        (4, "the exact bad phrase appears here"),
        (5, None),
        (6, "BADWORD shouting"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = ["badword", "ass", "bad phrase"]
    clean = {r["doc_id"] for r in filter_badwords(df, "text", words).collect()}
    assert clean == {1, 3, 5}
    flagged = {r["doc_id"] for r in
               filter_badwords(df, "text", words, keep="flagged").collect()}
    assert flagged == {2, 4, 6}
    # token mode: unigram-only, same boundary safety
    tok_clean = {r["doc_id"] for r in
                 filter_badwords(df, "text", ["badword", "ass"], mode="token").collect()}
    assert tok_clean == {1, 3, 4, 5}
    ann = filter_badwords(df, "text", words, flag_col="has_badword")
    assert {(r["doc_id"], r["has_badword"]) for r in ann.collect()} == {
        (1, False), (2, True), (3, False), (4, True), (5, False), (6, True)
    }
    # DuckDB parity: same pattern over lower(text)
    pat = badword_pattern(words)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dd = {r[0] for r in con.execute(
        "SELECT doc_id FROM t WHERE NOT coalesce(regexp_matches(lower(text), ?), FALSE)",
        [pat]).fetchall()}
    con.close()
    assert dd == clean
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unigram-only"):
        filter_badwords(df, "text", ["bad phrase"], mode="token")
    with _pytest.raises(ValueError, match="empty badword list"):
        filter_badwords(df, "text", [])


def test_project_embeddings(spark, sf_dir):
    """Output width, determinism, JL norm preservation in aggregate, the
    dim guard, and DuckDB parity through the int8-quantized composition."""
    import duckdb
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        _dlit,
        _hyperplanes,
        project_embeddings,
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    k = 8
    proj = project_embeddings(emb, k=k)
    first = proj.select("projected").first()["projected"]
    assert len(first) == k
    assert proj.count() == emb.count()
    # determinism: same seed → identical vectors
    a = {r["vec_id"]: tuple(r["projected"]) for r in proj.collect()}
    b = {r["vec_id"]: tuple(r["projected"]) for r in project_embeddings(emb, k=k).collect()}
    assert a == b
    # JL in aggregate: mean squared-norm ratio within 30% of 1
    ratio = (
        project_embeddings(emb, k=k)
        .join(emb, "vec_id")
        .select(
            (F.aggregate(F.col("projected"), F.lit(0.0), lambda s, x: s + x * x)
             / F.aggregate(F.col("embedding"), F.lit(0.0),
                           lambda s, x: s + x.cast("double") * x.cast("double"))
             ).alias("r")
        )
        .agg(F.avg("r")).collect()[0][0]
    )
    assert 0.7 < ratio < 1.3
    # DuckDB parity of the quantized composition (the registry's shape)
    q = {r["vec_id"]: r["q_csv"] for r in
         quantize_embeddings(proj, "projected", "vec_id").collect()}
    planes = _hyperplanes(dim, k, seed="vitess-cdc-rp")
    import math

    scale = math.sqrt(dim / float(k))
    comps = ", ".join(
        "list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), ["
        + ", ".join(_dlit(v)[:-1] for v in p) + f"]) * {scale!r}"
        for p in planes
    )
    con = duckdb.connect()
    dd = {r[0]: r[1] for r in con.execute(f"""
        WITH p AS (SELECT vec_id, [{comps}] AS v
                   FROM read_parquet('{sf_dir}/embeddings.parquet')),
        s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc FROM p)
        SELECT vec_id,
               CASE WHEN sc = 0 THEN array_to_string(list_transform(v, x -> 0), ',')
                    ELSE array_to_string(list_transform(v, x -> CAST(round(x / sc) AS INT)), ',')
               END
        FROM s
    """).fetchall()}
    con.close()
    assert dd == q
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim="):
        project_embeddings(emb, k=k, dim=dim + 1)


def test_reweight_mixture(spark):
    """Underperforming domains gain weight, weights stay a distribution,
    the reference-loss column subtracts, and smoothing floors every domain."""
    rows = [
        ("a", 2.0, 1.0),   # excess 1.0 — underperforms
        ("a", 2.2, 1.2),
        ("b", 1.0, 1.0),   # excess 0
        ("b", 1.1, 1.1),
        ("c", 0.5, 1.0),   # negative excess — clipped to 0
    ]
    df = spark.createDataFrame(rows, "domain string, loss double, ref double")
    from debezium_connector_vitess_spark.ops.pipeline import reweight_mixture

    out = {r["domain"]: r for r in reweight_mixture(
        df, domain_col="domain", loss_col="loss", ref_loss_col="ref", rounds=5
    ).collect()}
    assert set(out) == {"a", "b", "c"}
    ws = {d: out[d]["weight"] for d in out}
    assert abs(sum(ws.values()) - 1.0) < 1e-9
    assert ws["a"] > ws["b"]
    # clipped: zero and negative excess end at the same weight
    assert abs(ws["b"] - ws["c"]) < 1e-12
    assert all(w > 0 for w in ws.values())
    assert out["a"]["n_docs"] == 2 and out["c"]["n_docs"] == 1
    assert abs(out["a"]["mean_excess_loss"] - 1.0) < 1e-9
    # raw-loss mode (no reference column)
    raw = {r["domain"]: r["weight"] for r in reweight_mixture(
        df, domain_col="domain", loss_col="loss", rounds=3
    ).collect()}
    assert raw["a"] > raw["b"] > raw["c"]
    # determinism
    again = {r["domain"]: r["weight"] for r in reweight_mixture(
        df, domain_col="domain", loss_col="loss", ref_loss_col="ref", rounds=5
    ).collect()}
    assert again == ws
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rounds"):
        reweight_mixture(df, domain_col="domain", loss_col="loss", rounds=0)
    with _pytest.raises(ValueError, match="positive mass"):
        reweight_mixture(df, domain_col="domain", loss_col="loss",
                         init={"zz": 1.0})


def test_project_quantized(spark, sf_dir):
    """Integer-exact projection: BIGINT csv output, determinism, and
    closeness to the float projection within int8 quantization error."""
    import math

    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        project_embeddings,
        project_quantized,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    k = 8
    out = project_quantized(emb, k=k)
    rows = {r["vec_id"]: (r["scale"], r["q_proj_csv"]) for r in out.collect()}
    assert len(rows) == emb.count()
    assert all(len(v[1].split(",")) == k for v in rows.values())
    # determinism
    again = {r["vec_id"]: (r["scale"], r["q_proj_csv"])
             for r in project_quantized(emb, k=k).collect()}
    assert again == rows
    # recoverability: scale × sqrt(dim/k)/2^20 × ints tracks the float
    # projection within the int8 quantization error bound
    fl = {r["vec_id"]: r["projected"]
          for r in project_embeddings(emb, k=k).collect()}
    jl = math.sqrt(dim / float(k)) / (1 << 20)
    checked = 0
    for vid, (scale, csv) in rows.items():
        ints = [int(s) for s in csv.split(",")]
        approx = [v * scale * jl for v in ints]
        exact = fl[vid]
        # per-component error ≤ dim × (scale/2) × max|w| × sqrt(dim/k); use
        # the loose norm-scaled bound
        bound = max(1e-12, scale * dim)
        for a, e in zip(approx, exact):
            assert abs(a - e) <= bound, (vid, a, e, bound)
        checked += 1
    assert checked > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overflow"):
        project_quantized(emb, k=k, bits=32, weight_scale_bits=40)
    with _pytest.raises(ValueError, match="dim="):
        project_quantized(emb, k=k, dim=dim + 3)


def test_mp4_frame_table_ground_truth():
    """Sample-table demux vs independent recomputation from the builder's
    formulas: per-frame pts at the MEDIA timescale (two-run stts), exact
    back-to-back byte extents starting at the mdat body, every-5th sync."""
    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_mp4_samples,
        decode_mp4_frame_table,
        decode_mp4_meta,
    )

    for doc_id in (0, 7, 16, 33):
        for audio_first in (False, True):
            payload = _make_mp4_samples(doc_id, audio_first=audio_first)
            table = decode_mp4_frame_table(payload)
            n_frames = 8 + doc_id % 17
            assert len(table) == n_frames
            sizes = [16 + ((doc_id + i * 7) % 48) for i in range(n_frames)]
            half = n_frames // 2
            # video frames sit AFTER the 4×8 audio bytes at the mdat body
            # start — and the demux must pick the VIDEO trak by hdlr even
            # when the audio trak is muxed first
            mdat_off = payload.index(b"mdat", 100) + 4
            dts = 0
            off = mdat_off + 32
            for i, (idx, pts, o, s, sync) in enumerate(table):
                assert idx == i and s == sizes[i] and o == off
                assert pts == dts * 1000 // 12800
                assert sync == (i % 5 == 0)
                off += s
                dts += 512 if i < half else 1024
            # audio + frames tile the mdat body exactly
            assert off == len(payload)
            # interop: the metadata decoder reads the same container
            dur_ms, w, h, n_tracks = decode_mp4_meta(payload)
            assert n_tracks == 2 and w == 64 + doc_id % 64


def test_mp4_frame_table_hostile_counts():
    """Corrupt/hostile sample-table entry counts (0xFFFFFFFF etc.) must
    raise ValueError BEFORE any expansion — the containable error class
    errors='skip' catches — never size a multi-GB allocation from a raw
    uint32 field."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.multimodal import (
        _make_mp4_samples,
        decode_mp4_frame_table,
    )

    payload = _make_mp4_samples(7)  # video trak first: .index finds ITS stbl

    def patched(fourcc: bytes, field_off: int, value: int) -> bytes:
        import struct

        i = payload.index(fourcc) + field_off
        return payload[:i] + struct.pack(">I", value) + payload[i + 4 :]

    # stts n_runs beyond the box extent
    with _pytest.raises(ValueError, match="entries"):
        decode_mp4_frame_table(patched(b"stts", 8, 0xFFFFFFFF))
    # a single in-extent run claiming 2^31 samples: payload-size bound
    with _pytest.raises(ValueError, match="sample total exceeds"):
        decode_mp4_frame_table(patched(b"stts", 12, 0x7FFFFFFF))
    # stsz per-sample count inflated: stts cross-check rejects it
    with _pytest.raises(ValueError, match="stsz sample count"):
        decode_mp4_frame_table(patched(b"stsz", 12, 0x00FFFFFF))
    # stco chunk count beyond its box
    with _pytest.raises(ValueError, match="entries"):
        decode_mp4_frame_table(patched(b"stco", 8, 0xFFFFFFFF))
    # stss sync count beyond its box
    with _pytest.raises(ValueError, match="entries"):
        decode_mp4_frame_table(patched(b"stss", 8, 0xFFFFFFFF))


def test_mp4_frame_table_ctts_composition_offsets():
    """ctts present: pts = dts + composition offset (v1 signed — B-frame
    reordering makes pts non-monotone in decode order); a ctts that covers
    the wrong sample count raises."""
    import struct

    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.multimodal import (
        _box,
        _hdlr_box,
        decode_mp4_frame_table,
    )

    def full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
        return _box(fourcc, struct.pack(">B3s", version, b"\x00\x00\x00") + body)

    n, media_ts, dur = 6, 1000, 100
    sizes = [10 + i for i in range(n)]
    # IBBP-style reorder: signed v1 offsets, one negative
    comp = [0, 300, 100, 200, -100, 0]

    def build(ctts_counts) -> bytes:
        stts = full(b"stts", struct.pack(">I", 1) + struct.pack(">2I", n, dur))
        stsz = full(b"stsz", struct.pack(">2I", 0, n)
                    + b"".join(struct.pack(">I", s) for s in sizes))
        stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">3I", 1, n, 1))
        ctts = full(
            b"ctts",
            struct.pack(">I", len(ctts_counts))
            + b"".join(struct.pack(">Ii", c, o) for c, o in ctts_counts),
            version=1,
        )
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")

        def assemble(chunk_off: int) -> bytes:
            stco = full(b"stco", struct.pack(">2I", 1, chunk_off))
            stbl = _box(b"stbl", stts + ctts + stsz + stsc + stco)
            mdhd = full(b"mdhd",
                        struct.pack(">4I2H", 0, 0, media_ts, n * dur, 0x55C4, 0))
            mdia = _box(b"mdia", mdhd + _hdlr_box(b"vide") + _box(b"minf", stbl))
            moov = _box(b"moov", _box(b"trak", mdia))
            return ftyp + moov + _box(b"mdat", bytes(sum(sizes)))

        probe = assemble(0)
        return assemble(probe.index(b"mdat") + 4)

    table = decode_mp4_frame_table(build([(1, o) for o in comp]))
    assert len(table) == n
    for i, (idx, pts, _off, s, sync) in enumerate(table):
        assert idx == i and s == sizes[i] and sync
        assert pts == (i * dur + comp[i]) * 1000 // media_ts
    # pts is genuinely reordered relative to decode order
    assert [r[1] for r in table] != sorted(r[1] for r in table)
    # ctts covering fewer samples than stsz declares is corrupt
    with _pytest.raises(ValueError, match="ctts covers"):
        decode_mp4_frame_table(build([(n - 1, 0)]))
    # and one claiming more raises before expansion
    with _pytest.raises(ValueError, match="ctts covers"):
        decode_mp4_frame_table(build([(n + 5, 0)]))


def test_mp4_frame_index_spark(spark, sf_dir):
    """Distributed frame index: counts reconcile per doc, every-n
    subsampling, errors='skip' drops corrupt payloads, and
    sample_video_frames slices the exact frame bytes."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.multimodal import (
        attach_mp4_sample_payload,
        mp4_frame_index,
        sample_video_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(40)
    vids = attach_mp4_sample_payload(docs)
    idx = mp4_frame_index(vids)
    per_doc = {r["doc_id"]: r["n"] for r in
               idx.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for did, n in per_doc.items():
        assert n == 8 + did % 17
    every3 = mp4_frame_index(vids, every=3)
    assert every3.count() == sum(-(-n // 3) for n in per_doc.values())
    # corrupt payload: fail raises, skip drops
    corrupt = vids.limit(1).select(
        "doc_id", F.expr("substring(payload, 1, 40)").alias("payload"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        mp4_frame_index(corrupt).collect()
    assert mp4_frame_index(corrupt, errors="skip").count() == 0
    # frame slicing: bytes match the payload extent; sync_only subset
    one = vids.filter(F.col("doc_id") == list(per_doc)[0])
    payload = bytes(one.first()["payload"])
    frames = sample_video_frames(one, every=1)
    index = {r["frame_idx"]: (r["byte_offset"], r["n_bytes"])
             for r in mp4_frame_index(one).collect()}
    for r in frames.collect():
        off, nb = index[r["frame_idx"]]
        assert bytes(r["frame"]) == payload[off:off + nb]
    n_sync = sum(1 for r in mp4_frame_index(one).collect() if r["is_sync"])
    assert sample_video_frames(one, every=1, sync_only=True).count() == n_sync


def test_corpus_profile_approx_distinct(spark, sf_dir):
    """HLL mode: distinct_content within the sketch's tolerance of exact,
    all other columns identical, and the plan swaps the grows-with-data
    distinct for the constant-state sketch."""
    from debezium_connector_vitess_spark.ops.text import corpus_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {r["source"]: r.asDict() for r in corpus_profile(docs).collect()}
    approx = {r["source"]: r.asDict()
              for r in corpus_profile(docs, approx_distinct=True).collect()}
    assert set(exact) == set(approx)
    for s in exact:
        e, a = exact[s], approx[s]
        assert abs(a["distinct_content"] - e["distinct_content"]) \
            <= max(3, 0.1 * e["distinct_content"])
        for col in ("n_docs", "n_empty", "n_tokens", "n_chars",
                    "mean_quality", "n_docs_with_pii"):
            assert a[col] == e[col], col
    plan = corpus_profile(docs, approx_distinct=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "approx_count_distinct" in plan


def test_ann_index_build_probe(spark, sf_dir, tmp_path):
    """Persisted IVF index: probe output equals the in-memory ivf_topk with
    the same quantizer, the probe scan plans static partition pruning over
    the partitionBy(centroid_id) layout, and a torn/foreign directory loads
    loudly."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        build_ann_index,
        ivf_topk,
        ivf_topk_indexed,
        load_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ann_index")
    manifest = build_ann_index(emb, path, n_centroids=8)
    assert manifest["n_centroids"] == 8 and manifest["n_rows"] > 0
    got = ivf_topk_indexed(spark, path, queries, k=5, n_probe=2)
    want = ivf_topk(emb, queries, k=5, n_probe=2, n_centroids=8,
                    quantizer="sample")
    g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got.collect()}
    w = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want.collect()}
    assert g == w and g
    # the probe scan must carry a partition filter on centroid_id
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters", 1)[1][:200]
    # round-trip load validates
    m2, cents = load_ann_index(spark, path)
    assert m2 == manifest and len(cents) == 8
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no manifest"):
        load_ann_index(spark, str(tmp_path / "nope"))
    (tmp_path / "torn").mkdir()
    (tmp_path / "torn" / "manifest.json").write_text('{"format_version": 99}')
    with _pytest.raises(ValueError, match="unsupported"):
        load_ann_index(spark, str(tmp_path / "torn"))
    # dim guard on the query side
    bad_q = queries.select("vec_id",
                           F.expr("slice(embedding, 1, 8)").alias("embedding"))
    with _pytest.raises(ValueError, match="dim="):
        ivf_topk_indexed(spark, path, bad_q)


def test_pack_bins(spark, sf_dir):
    """No-split packing invariants: bins never exceed capacity, per-bin
    offsets tile exactly, placement is partitioning-invariant, bin count
    respects the FFD bound (+ bucketing slack), and oversize docs follow
    the declared policy."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import pack_bins

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    block = 128
    out = pack_bins(docs, "text", "doc_id", stream_col="source",
                    block_tokens=block).collect()
    assert len(out) == docs.count()
    fills = defaultdict(list)
    for r in out:
        assert not r["is_oversize"]
        fills[(r["source"], r["bin_id"])].append(
            (r["offset_in_bin"], r["n_tokens"]))
    total_tokens = 0
    for _key, docs_in_bin in fills.items():
        docs_in_bin.sort()
        pos = 0
        for off, nt in docs_in_bin:
            assert off == pos  # offsets tile, no overlap, no gap
            pos += nt
        assert pos <= block
        total_tokens += pos
    # FFD bound per (stream, bucket=1 group): bins <= 11/9 * OPT + 1
    per_stream_bins = defaultdict(set)
    per_stream_tokens = defaultdict(int)
    for r in out:
        per_stream_bins[r["source"]].add(r["bin_id"])
        per_stream_tokens[r["source"]] += r["n_tokens"]
    for s, bins in per_stream_bins.items():
        opt_lb = -(-per_stream_tokens[s] // block)
        assert len(bins) <= (11 * opt_lb) // 9 + 1
    # partitioning invariance
    again = {(r["doc_id"], r["bin_id"], r["offset_in_bin"]) for r in pack_bins(
        docs.repartition(7), "text", "doc_id", stream_col="source",
        block_tokens=block).collect()}
    assert again == {(r["doc_id"], r["bin_id"], r["offset_in_bin"]) for r in out}
    # bucketed run: same capacity invariant, bounded extra bins
    b4 = pack_bins(docs, "text", "doc_id", stream_col="source",
                   block_tokens=block, n_buckets=4)
    fills4 = b4.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("fill")).collect()
    assert all(r["fill"] <= block for r in fills4)
    n_bins_4 = len({(r["source"], r["bin_id"]) for r in fills4})
    assert n_bins_4 <= sum(len(b) for b in per_stream_bins.values()) \
        + 4 * len(per_stream_bins)
    # oversize: tiny capacity raises by default, own_bin flags singletons
    import pytest as _pytest

    with _pytest.raises(Exception, match="block_tokens"):
        pack_bins(docs, "text", "doc_id", stream_col="source",
                  block_tokens=5).collect()
    ob = pack_bins(docs, "text", "doc_id", stream_col="source",
                   block_tokens=5, oversize="own_bin")
    over = ob.filter(F.col("is_oversize"))
    assert over.count() > 0
    # bin ids are unique PER STREAM (bucket*2^40+local) — group with source
    singleton = ob.groupBy("source", "bin_id").agg(
        F.count("*").alias("n"), F.max(F.col("is_oversize").cast("int")).alias("o"))
    assert singleton.filter((F.col("o") == 1) & (F.col("n") > 1)).count() == 0


def test_ann_index_append(spark, sf_dir, tmp_path):
    """Incremental growth: appended vectors land in the existing inverted
    lists (frozen quantizer), probes see them, the manifest row count
    refreshes, and a dim-mismatched batch is rejected."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        append_to_ann_index,
        build_ann_index,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ann_grow")
    m0 = build_ann_index(emb, path, n_centroids=8)
    # append exact twins under shifted ids: each query's rank-1 neighbor
    # must become its twin (cosine 1.0 lands in the same bucket by
    # construction — identical vectors assign to identical centroids)
    twins = emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    m1 = append_to_ann_index(twins, path)
    assert m1["n_rows"] == 2 * m0["n_rows"]
    got = ivf_topk_indexed(spark, path,
                           emb.filter(F.col("vec_id") < 10), k=1, n_probe=1)
    for r in got.collect():
        assert r["neighbor_id"] == r["query_id"] + 1_000_000
    import pytest as _pytest

    bad = emb.select("vec_id", F.expr("slice(embedding, 1, 4)").alias("embedding"))
    with _pytest.raises(ValueError, match="dim="):
        append_to_ann_index(bad, path)


def test_gates_and_splits_stream_stateless(spark, sf_dir, tmp_path):
    """The round-8 scan-stage ops are stateless projections/filters: the
    identical badwords→splits chain runs on a readStream frame (no
    watermark, no state store) and assigns every doc the same split as
    batch — the property that lets the ingest path gate and route documents
    per micro-batch with no reprocessing."""
    import os
    import shutil

    from debezium_connector_vitess_spark.ops.pipeline import assign_splits
    from debezium_connector_vitess_spark.ops.text import filter_badwords

    src_file = os.path.join(sf_dir, "documents.parquet")
    src = tmp_path / "docs_src"
    src.mkdir()
    shutil.copy(src_file, src / "part-0.parquet")
    batch_df = spark.read.parquet(src_file)

    def chain(df):
        gated = filter_badwords(df, "text", ["dup", "batch batch"])
        return assign_splits(
            gated, "doc_id", fractions={"train": 0.9, "test": 0.1}
        ).select("doc_id", "split")

    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    q = (
        chain(stream).writeStream.format("memory")
        .queryName("gate_stream_t")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_g"))
        .start()
    )
    q.awaitTermination(120)
    got = dict(spark.sql("SELECT doc_id, split FROM gate_stream_t").collect())
    want = {r["doc_id"]: r["split"] for r in chain(batch_df).collect()}
    assert got == want and got


def test_assign_splits_null_keys(spark):
    """NULL keys error loudly at evaluation (silent fall-through would
    concentrate unlabeled docs in one split); null_split routes them
    explicitly and must name a declared split."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a"), (2, None)], "doc_id long, k string")
    from debezium_connector_vitess_spark.ops.pipeline import assign_splits

    fr = {"train": 0.9, "test": 0.1}
    with _pytest.raises(Exception, match="NULL k"):
        assign_splits(df, "k", fractions=fr).collect()
    routed = {r["doc_id"]: r["split"] for r in
              assign_splits(df, "k", fractions=fr, null_split="train").collect()}
    assert routed[2] == "train" and routed[1] in fr
    with _pytest.raises(ValueError, match="not a declared split"):
        assign_splits(df, "k", fractions=fr, null_split="nope")


def test_reweight_mixture_null_guards(spark):
    """NULL domains and all-NULL loss domains are rejected loudly."""
    import pytest as _pytest

    from debezium_connector_vitess_spark.ops.pipeline import reweight_mixture

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "domain string, loss double")
    with _pytest.raises(ValueError, match="NULL domain"):
        reweight_mixture(df, domain_col="domain", loss_col="loss")
    df2 = spark.createDataFrame(
        [("a", 1.0), ("b", None)], "domain string, loss double")
    with _pytest.raises(ValueError, match="no non-NULL"):
        reweight_mixture(df2, domain_col="domain", loss_col="loss")


def test_ann_index_append_casts_vec_type(spark, sf_dir, tmp_path):
    """A double-typed batch appended to a float-built index is cast to the
    stored element type (recorded in the manifest), so the lists stay
    one-schema and later probes read cleanly."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        append_to_ann_index,
        build_ann_index,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ann_cast")
    m = build_ann_index(emb, path, n_centroids=8)
    assert m["vec_type"].startswith("array<")
    dbl = emb.select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) * 1.0)")
        .alias("embedding"),
    )
    append_to_ann_index(dbl, path)
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.schema["vec"].dataType.simpleString() == m["vec_type"]
    # probes still work over the combined lists
    assert ivf_topk_indexed(
        spark, path, emb.filter(F.col("vec_id") < 5), k=3, n_probe=2
    ).count() > 0


def test_ann_index_rebuild_wipes_stale_lists(spark, sf_dir, tmp_path):
    """Rebuild over an existing index must not leave stale inverted-list
    partitions even under partitionOverwriteMode=dynamic (where
    mode('overwrite') replaces only the partitions present in the new
    build): an 8-centroid index rebuilt with 2 centroids keeps exactly the
    2 new lists and probes equal the fresh in-memory answer."""
    import os

    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        build_ann_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ann_rebuild")
    build_ann_index(emb, path, n_centroids=8)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        m2 = build_ann_index(emb, path, n_centroids=2)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert m2["n_centroids"] == 2
    part_dirs = [
        d for d in os.listdir(os.path.join(path, "lists"))
        if d.startswith("centroid_id=")
    ]
    assert len(part_dirs) <= 2, f"stale partitions survived: {part_dirs}"
    queries = emb.filter(F.col("vec_id") < 10)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
           ivf_topk_indexed(spark, path, queries, k=3, n_probe=1).collect()}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
            ivf_topk(emb, queries, k=3, n_probe=1, n_centroids=2,
                     quantizer="sample").collect()}
    assert got == want and got
    # a rebuild with a BAD argument must fail BEFORE the destructive wipe:
    # the standing index stays loadable and probes unchanged
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown quantizer"):
        build_ann_index(emb, path, n_centroids=4, quantizer="kmeanz")
    with _pytest.raises(ValueError, match="not in corpus"):
        build_ann_index(emb, path, id_col="vecid")  # typo'd column
    with _pytest.raises(ValueError, match="n_centroids"):
        build_ann_index(emb, path, n_centroids=0)
    with _pytest.raises(ValueError, match="kmeans_iters"):
        build_ann_index(emb, path, quantizer="kmeans", kmeans_iters=0)
    still = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
             ivf_topk_indexed(spark, path, queries, k=3, n_probe=1).collect()}
    assert still == want


def test_ann_index_local_path_only(spark, sf_dir, tmp_path):
    """URI paths are rejected EARLY (before any expensive write): the
    manifest goes through driver-local os.path/os.replace, so an s3://
    index would tear between two filesystems."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        append_to_ann_index,
        build_ann_index,
        load_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
    for op, call in (
        ("build", lambda: build_ann_index(emb, "s3://bucket/idx")),
        ("load", lambda: load_ann_index(spark, "hdfs://nn/idx")),
        ("append", lambda: append_to_ann_index(emb, "s3a://bucket/idx")),
    ):
        with _pytest.raises(ValueError, match="local filesystem"):
            call()


def test_ann_index_append_norm_matches_stored_vec(spark, sf_dir, tmp_path):
    """A double batch appended to a float index stores vnorm computed from
    the CAST (stored) vector, so appended-row cosines agree with what a
    rebuild over the same stored floats would score."""
    import math

    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        append_to_ann_index,
        build_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ann_norm")
    build_ann_index(emb, path, n_centroids=4)
    dbl = emb.select(
        (F.col("vec_id") + 7_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    ).limit(50)
    append_to_ann_index(dbl, path)
    rows = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("vec_id") >= 7_000_000)
        .select("vec", "vnorm")
        .collect()
    )
    assert rows
    for r in rows:
        # recompute from the STORED (float-cast) vector: must match exactly
        # up to double reduction noise — not the double-input norm
        want = math.sqrt(sum(float(x) * float(x) for x in r["vec"]))
        assert math.isclose(r["vnorm"], want, rel_tol=1e-12)


def test_ann_index_probe_large_query_frame(spark, sf_dir, tmp_path):
    """Above broadcast_threshold the probe falls back to a plain equi-join
    (no driver-side broadcast of a corpus-sized query frame) and returns
    the identical top-k."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        build_ann_index,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ann_bigq")
    build_ann_index(emb, path, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 10)
    small = ivf_topk_indexed(spark, path, queries, k=3, n_probe=2)
    big = ivf_topk_indexed(
        spark, path, queries, k=3, n_probe=2, broadcast_threshold=0
    )
    # the fallback plan must not carry the broadcast hint
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()
    key = lambda rows: {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert key(big.collect()) == key(small.collect()) != {}


def test_perplexity_buckets_ccnet(spark, sf_dir):
    """CCNet head/middle/tail: exact-mode labels equal an independent
    numpy-quantile recomputation per domain (same (n-1)p linear
    interpolation as Spark's percentile — the corpus_datasheet precedent),
    no fixture value ties a threshold, NULL perplexity gets a NULL bucket
    (never mislabeled tail), the sketch mode agrees on ~all labels, and
    bad geometry is rejected loudly."""
    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        doc_perplexity,
        perplexity_buckets,
        unigram_logprobs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = unigram_logprobs(docs, "text", alpha=0.5)
    scored = doc_perplexity(docs, "text", "doc_id", lm).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    got = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(
        scored, "perplexity", domain_col="source", exact=True
    ).collect()}
    rows = scored.select("doc_id", "source", "perplexity").collect()
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r["source"], []).append((r["doc_id"], r["perplexity"]))
    for dom, members in by_dom.items():
        vals = np.array([p for _d, p in members])
        t1, t2 = np.quantile(vals, [1 / 3, 2 / 3], method="linear")
        # fixture margin: a value may EQUAL a threshold exactly (integer
        # quantile index returns the element itself, bit-identical in both
        # engines, so `<=` is deterministic) — but a NEAR-tie against an
        # interpolated threshold would be engine-float-sensitive
        for t in (t1, t2):
            d = np.abs(vals - t)
            d = d[d > 0]
            assert d.size == 0 or d.min() > 1e-9
        for did, p in members:
            want = "head" if p <= t1 else ("middle" if p <= t2 else "tail")
            assert got[did] == want, (did, dom, p, t1, t2)
    # global + sketch mode: bucket fractions near thirds, labels mostly agree
    g_exact = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(
        scored, "perplexity", exact=True
    ).collect()}
    g_approx = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(
        scored, "perplexity"
    ).collect()}
    n = len(g_exact)
    for lab in ("head", "middle", "tail"):
        assert abs(sum(1 for v in g_exact.values() if v == lab) / n - 1 / 3) < 0.05
    agree = sum(1 for k in g_exact if g_exact[k] == g_approx[k]) / n
    assert agree > 0.95
    # NULL perplexity -> NULL bucket
    with_null = scored.unionByName(
        spark.createDataFrame(
            [(999999, 0, None, None, "src0")],
            "doc_id bigint, n_tokens bigint, avg_neg_logp double,"
            " perplexity double, source string",
        )
    )
    nb = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(
        with_null, "perplexity", domain_col="source", exact=True
    ).collect()}
    assert nb[999999] is None
    # NULL DOMAIN rows form their own group (null-safe join) — a doc with
    # the corpus-lowest perplexity and source=NULL must not land in 'tail'
    with_null_dom = scored.unionByName(
        spark.createDataFrame(
            [(888801, 5, 0.1, 1.01, None), (888802, 5, 9.9, 19000.0, None)],
            "doc_id bigint, n_tokens bigint, avg_neg_logp double,"
            " perplexity double, source string",
        )
    )
    nd = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(
        with_null_dom, "perplexity", domain_col="source", exact=True
    ).collect()}
    assert nd[888801] == "head" and nd[888802] == "tail"
    with _pytest.raises(ValueError, match="labels"):
        perplexity_buckets(scored, "perplexity", labels=("a", "b"))
    with _pytest.raises(ValueError, match="bounds"):
        perplexity_buckets(scored, "perplexity", bounds=(0.9, 0.1),
                           labels=("a", "b", "c"))
    # duplicate bounds would make a label unreachable — rejected loudly
    with _pytest.raises(ValueError, match="bounds"):
        perplexity_buckets(scored, "perplexity", bounds=(0.5, 0.5),
                           labels=("a", "b", "c"))


def test_shared_ngram_counts_match_standalone_builders(spark, sf_dir):
    """ngram_count_frames feeds all three LM builders: each counts= output
    must equal its standalone twin EXACTLY (same count frames, same float
    expressions — bit-identical logp values), so the registry's
    tokenize-once path cannot drift from the library contract."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        bigram_logprobs,
        kn_bigram_logprobs,
        ngram_count_frames,
        unigram_logprobs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    counts = ngram_count_frames(docs, "text")

    def as_map(lm):
        return {(r["prev"] if "prev" in r.__fields__ else None, r["token"]):
                r["logp"] for r in lm.collect()}

    assert as_map(unigram_logprobs(docs, "text", counts=counts[0])) == as_map(
        unigram_logprobs(docs, "text")
    )
    assert as_map(bigram_logprobs(docs, "text", counts=counts)) == as_map(
        bigram_logprobs(docs, "text")
    )
    assert as_map(
        kn_bigram_logprobs(docs, "text", counts=counts)
    ) == as_map(kn_bigram_logprobs(docs, "text"))


def test_ann_index_streaming_ingest(spark, sf_dir, tmp_path):
    """Continuous-ingest shape for the standing ANN index: a file stream of
    embedding micro-batches appended via foreachBatch(append_to_ann_index)
    must yield an index identical — list contents, manifest row count,
    probe answers — to bootstrap-build + one bulk append (appends against
    the frozen quantizer commute), so arrival batching never changes the
    index."""
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.similarity import (
        append_to_ann_index,
        build_ann_index,
        ivf_topk_indexed,
        load_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    boot = emb.filter(F.col("vec_id") % 3 == 0)
    path_s = str(tmp_path / "stream_idx")
    path_b = str(tmp_path / "bulk_idx")
    build_ann_index(boot, path_s, n_centroids=8)
    build_ann_index(boot, path_b, n_centroids=8)
    append_to_ann_index(emb.filter(F.col("vec_id") % 3 != 0), path_b)

    src = tmp_path / "emb_src"
    for k in (1, 2):  # two part files -> two availableNow micro-batches
        emb.filter(F.col("vec_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            lambda df, _bid: append_to_ann_index(df, path_s) and None
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_ann"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    ms, _ = load_ann_index(spark, path_s)
    mb, _ = load_ann_index(spark, path_b)
    assert ms["n_rows"] == mb["n_rows"] == emb.count()
    lists = lambda p: sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(f"{p}/lists").collect()
    )
    assert lists(path_s) == lists(path_b)
    queries = emb.filter(F.col("vec_id") < 10)
    key = lambda p: {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_indexed(spark, p, queries, k=3, n_probe=2).collect()
    }
    assert key(path_s) == key(path_b) != {}


def test_kn_bigram_logprobs(spark, sf_dir):
    """Kneser-Ney table: DuckDB recomputation parity on every observed
    bigram and both sentinel levels, plus the scoring contract — the
    existing interpolated scorer consumes it unchanged and still
    discriminates word order."""
    import math

    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from debezium_connector_vitess_spark.ops.pipeline import (
        doc_perplexity_interpolated,
        kn_bigram_logprobs,
        unigram_logprobs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d, b = 0.75, 0.5
    lm = kn_bigram_logprobs(docs, "text", discount=d, beta=b)
    rows = lm.collect()
    got_obs = {(r["prev"], r["token"]): r["logp"] for r in rows
               if r["token"] is not None}
    got_ctx = {r["prev"]: r["logp"] for r in rows
               if r["token"] is None and r["prev"] is not None}
    got_glob = [r["logp"] for r in rows if r["prev"] is None]
    assert len(got_glob) == 1

    con = duckdb.connect()
    dd = con.execute(f"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') lt
      FROM read_parquet('{sf_dir}/documents.parquet')),
    bi AS (
      SELECT u.prev, u.token, count(*) bcnt FROM (
        SELECT lt[i] AS prev, lt[i+1] AS token
        FROM toks, LATERAL (SELECT unnest(range(1, len(lt))) AS i)) u
      GROUP BY 1, 2),
    ctx AS (SELECT prev, sum(bcnt) ccnt, count(*) n1p_fwd FROM bi GROUP BY 1),
    cont AS (SELECT token, count(*) n1p_bwd FROM bi GROUP BY 1),
    s AS (SELECT (SELECT count(*) FROM bi) t,
                 (SELECT count(DISTINCT u.t) FROM toks,
                    LATERAL (SELECT unnest(lt) AS t) u) v)
    SELECT bi.prev, bi.token,
           ln(greatest(bcnt - {d}, 0.0) / ccnt
              + ({d} * n1p_fwd / ccnt) * ((n1p_bwd + {b}) / (t + {b} * v))) logp,
           ln(({d} * n1p_fwd / ccnt) * ({b} / (t + {b} * v))) ctx_logp
    FROM bi JOIN ctx USING (prev) JOIN cont USING (token), s
    """).fetchall()
    con.close()
    assert len(dd) == len(got_obs)
    for prev, token, logp, ctx_logp in dd:
        assert math.isclose(got_obs[(prev, token)], logp, rel_tol=1e-9)
        assert math.isclose(got_ctx[prev], ctx_logp, rel_tol=1e-9)
    # every probability is a genuine probability (logp < 0) and the
    # context sentinel is never above its observed rows
    assert all(v < 0 for v in got_obs.values())
    for (prev, _t), v in got_obs.items():
        assert got_ctx[prev] <= v + 1e-12
    # scoring: lam=1.0 = pure KN through the existing scorer; scrambled
    # word order must score worse than the original corpus
    uni = unigram_logprobs(docs, "text")
    pp = doc_perplexity_interpolated(docs, "text", "doc_id", uni, lm, lam=1.0)
    base = pp.agg(F.avg("perplexity")).collect()[0][0]
    shuffled = docs.select(
        "doc_id",
        F.array_join(F.shuffle(F.split(F.col("text"), r"\s+")), " ").alias("text"),
    )
    scrambled = doc_perplexity_interpolated(
        shuffled, "text", "doc_id", uni, lm, lam=1.0
    ).agg(F.avg("perplexity")).collect()[0][0]
    assert scrambled > base
    import pytest as _pytest

    with _pytest.raises(ValueError, match="discount"):
        kn_bigram_logprobs(docs, "text", discount=1.5)
    with _pytest.raises(ValueError, match="beta"):
        kn_bigram_logprobs(docs, "text", beta=0.0)


def test_minhash_stream_spill_cap_matches_driver_path(spark, sf_dir, monkeypatch):
    """The minhash stream verify's driver-side candidate set is bounded by
    MINHASH_STREAM_PAIR_CAP (r12 VERDICT item #2): past the cap, batches
    spill to a parquet staging dir and pairs/flagged ids are derived
    distributed. Forcing cap=0 (every batch spills, including the flush of
    the batch-0 set) must produce the identical verified drop list."""
    from debezium_connector_vitess_spark import registry

    def rows(df):
        return sorted(
            (r["side"], r["id_a"], r["id_b"], r["inter_size"], r["union_size"])
            for r in df.collect()
        )

    base = rows(registry.dedup_minhash_lsh(spark, sf_dir, sides=("stream",)))
    assert base, "stream side must emit a non-empty drop list"
    monkeypatch.setattr(registry, "MINHASH_STREAM_PAIR_CAP", 0)
    spilled = rows(registry.dedup_minhash_lsh(spark, sf_dir, sides=("stream",)))
    assert spilled == base
