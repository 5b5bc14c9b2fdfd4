"""Similarity search over embedding columns (array<float>).

Scale strategy (100 TB):
- **brute-force top-k**: broadcast the (small) query set against the
  partitioned corpus → per-partition partial top-k → single global top-k
  merge. One narrow pass over the corpus, one tiny shuffle of k·|Q| rows.
- **LSH-bucketed (scale path)**: random-hyperplane signatures bucket the
  corpus once (narrow); queries probe only their bucket (+ optional
  multiprobe neighbors), turning all-pairs into per-bucket joins. Recall is
  tunable with #hyperplanes / #probes; verified against brute force in tests.
- cosine math stays in Catalyst (``aggregate``/``zip_with`` over the array,
  codegen'd); vectors cast to double before arithmetic.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with the norms already materialized as columns. Higher-order
    array folds are CodegenFallback (interpreted), so evaluating each row's
    norm ONCE in an upstream projection instead of once per candidate pair
    cuts the per-pair work from 3 folds to 1. Same fold order as
    :func:`cosine_expr` (norm(a)·norm(b) in that order), so scores are
    bit-identical to the inline form and to the SQL oracles."""
    return dot_expr(a, b) / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast (no corpus
    shuffle); ranking window is partitioned by query id."""
    q = _drop_zero_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
    )
    c = _drop_zero_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_expr(F.col(vec_col)).alias("cnorm"),
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine_from_norms(
            F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _hyperplanes(dim: int, count: int, seed: str = "vitess-cdc-lsh") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from SHA-256 (no RNG
    state, reproducible across runs/engines). Components are GAUSSIAN
    (Box-Muller over two deterministic uniforms): uniform-cube sampling
    concentrates directions toward cube diagonals as dim grows, biasing
    sign-LSH collision probability away from the 1 − θ/π model for
    axis-aligned embedding distributions; normalized Gaussian components are
    rotationally symmetric. The planes are embedded as LITERALS in both the
    Spark expressions and the DuckDB oracles (the registry calls this same
    function), so the two engines always agree."""
    planes: list[list[float]] = []
    for p in range(count):
        us: list[float] = []
        i = 0
        while len(us) < 2 * dim:
            h = hashlib.sha256(f"{seed}:{p}:{i}".encode()).digest()
            for off in range(0, 32, 4):
                us.append(int.from_bytes(h[off : off + 4], "big") / 2**32)  # [0,1)
                if len(us) == 2 * dim:
                    break
            i += 1
        vals = [
            math.sqrt(-2.0 * math.log(max(us[2 * j], 1e-12)))
            * math.cos(2.0 * math.pi * us[2 * j + 1])
            for j in range(dim)
        ]
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def _quote_ident(name: str) -> str:
    """Backtick-quote a column name for a SQL fragment, escaping embedded
    backticks (`` ` `` → ```` `` ````) so unusual names can't produce
    malformed SQL."""
    return "`" + name.replace("`", "``") + "`"


def _drop_zero_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Exclude zero-norm (and null) embeddings up front: cosine against a
    zero vector is 0/0 = NaN, and Spark ranks NaN ABOVE every real score and
    passes it through ``>= threshold`` filters — a single all-zeros padding
    vector would become the rank-1 neighbor of every query. ``F.exists``
    short-circuits, so the guard is cheaper than a norm fold."""
    return df.filter(F.exists(F.col(vec_col), lambda x: x != F.lit(0.0)))


def _observed_dim(df: DataFrame, vec_col: str) -> int | None:
    """One-row probe of the vector width (LIMIT 1 short-circuits the scan);
    None when the frame is empty or the probed vector is NULL. THE probe
    recipe — every dim check routes through here so edge handling can't
    drift between call sites."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).limit(1).collect()
    if row and row[0]["n"] is not None and row[0]["n"] >= 0:
        return row[0]["n"]
    return None


def _assert_dim(df: DataFrame, vec_col: str, dim: int, op: str) -> None:
    """Fail loudly when the configured ``dim`` disagrees with the data: the
    plane-dot SQL zips ``dim`` literal components against the vector, and a
    mismatch silently NULL-poisons every dot so ALL bucket/band keys
    collapse to 0 — the equi-join degenerates to the full O(n²) cross
    product the LSH path exists to avoid."""
    n = _observed_dim(df, vec_col)
    if n is not None and n != dim:
        raise ValueError(
            f"{op}: dim={dim} but {vec_col!r} vectors have "
            f"{n} components — pass dim={n}"
        )


def lsh_bucket_expr(vec: "Column | str", planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from hyperplane dot products. Takes the vector as
    a SQL fragment — built as ONE SQL parse (see :func:`_plane_dot_sql`); a
    Column is accepted for compatibility (slow path: one Py4J round trip per
    plane component, same arithmetic and bucket ids)."""
    if not isinstance(vec, str):
        out = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            out = out + F.when(
                plane_dot_expr(vec, plane) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0)).cast("long")
        return out
    terms = ["CAST(0 AS BIGINT)"]
    for i, plane in enumerate(planes):
        terms.append(
            f"CAST(CASE WHEN {_plane_dot_sql(vec, plane)} >= 0 "
            f"THEN {1 << i} ELSE 0 END AS BIGINT)"
        )
    return F.expr(" + ".join(terms))


def _probe_masks(num_planes: int, radius: int) -> list[int]:
    """XOR masks of all buckets within hamming ``radius`` of a bucket."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    probe_radius: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: compare only within the query's hyperplane bucket
    (+ multiprobe neighbors within hamming ``probe_radius``).

    With p planes the corpus splits into 2^p buckets; multiprobe visits
    Σ C(p,r) of them per query — the recall/candidate-cut knob. For weakly
    clustered vectors (low best-cosine) a larger radius is needed; strongly
    clustered corpora (the realistic 100 TB case) concentrate neighbors in the
    home bucket. Recall vs brute force is asserted in tests.
    """
    _assert_dim(corpus, vec_col, dim, "lsh_topk")
    _assert_dim(queries, vec_col, dim, "lsh_topk")  # both sides dot the planes
    planes = _hyperplanes(dim, num_planes)
    c = _drop_zero_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_expr(F.col(vec_col)).alias("cnorm"),
        lsh_bucket_expr(_quote_ident(vec_col), planes).alias("bucket"),
    )
    # stage the home bucket ONCE: inlined per probe mask the num_planes
    # interpreted plane-dot folds re-evaluate len(masks) times per row
    q = (
        _drop_zero_vectors(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm_expr(F.col(vec_col)).alias("qnorm"),
            lsh_bucket_expr(_quote_ident(vec_col), planes).alias("__home"),
        )
        .select(
            "query_id",
            "qvec",
            "qnorm",
            F.explode(
                F.array(
                    *[
                        F.col("__home").bitwiseXOR(F.lit(m)).cast("long")
                        for m in _probe_masks(num_planes, probe_radius)
                    ]
                )
            ).alias("bucket"),
        )
    )
    scored = c.join(F.broadcast(q), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_from_norms(
            F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute force — O(n²) all-pairs.

    Verification-scale ORACLE ONLY: the production path is
    :func:`lsh_banded_near_dup_pairs` (banded equi-join); this one exists so
    tests can measure the banded path's recall against exact ground truth."""
    df = _drop_zero_vectors(df, vec_col)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def _plane_dot_sql(vec_sql: str, plane: list[float]) -> str:
    """SQL text of the vector·hyperplane dot — one parse instead of one Py4J
    round trip per component (the same driver-time fix as the IVF literal
    centroids; a 16-plane×64-dim signature otherwise costs ~1024 lit()
    calls per call site). Arithmetic is the identical left fold, so bucket
    ids and oracle parity are unchanged."""
    arr = ", ".join(_dlit(v) for v in plane)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
    )


def plane_dot_expr(vec: "Column | str", plane: list[float]) -> Column:
    """Dot of a vector column with a constant hyperplane (codegen'd, no UDF).
    Pass the column as a SQL fragment (e.g. ``\"`embedding`\"``) for the
    one-parse build; a Column is accepted for compatibility (slow path)."""
    if isinstance(vec, str):
        return F.expr(_plane_dot_sql(vec, plane))
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(v) for v in plane]),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def band_key_exprs(
    vec: "Column | str", planes: list[list[float]], num_bands: int
) -> list[Column]:
    """Split the hyperplane sign bits into ``num_bands`` contiguous bands; one
    small integer key per band (the minhash-banding trick applied to
    hyperplane signatures). Built as one SQL parse per band key; a Column is
    accepted for compatibility (slow path, identical keys)."""
    if not isinstance(vec, str):
        per = len(planes) // num_bands
        keys = []
        for b in range(num_bands):
            key = F.lit(0)
            for i, plane in enumerate(planes[b * per : (b + 1) * per]):
                key = key + F.when(
                    plane_dot_expr(vec, plane) >= 0, F.lit(1 << i)
                ).otherwise(F.lit(0))
            keys.append(key.cast("int"))
        return keys
    from .dedup import _validate_banding

    _validate_banding(len(planes), num_bands)  # same guard as MinHash banding
    per = len(planes) // num_bands
    keys: list[Column] = []
    for b in range(num_bands):
        terms = ["0"]
        for i, plane in enumerate(planes[b * per : (b + 1) * per]):
            terms.append(
                f"(CASE WHEN {_plane_dot_sql(vec, plane)} >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        keys.append(F.expr("CAST(" + " + ".join(terms) + " AS INT)"))
    return keys


def lsh_banded_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    num_planes: int = 16,
    num_bands: int = 4,
    dim: int = 64,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded hyperplane-LSH candidates + exact
    cosine verify — the 100 TB path for embedding dedup.

    Shape (mirrors minhash banding, the scale design the brute-force
    all-pairs join cannot provide): each vector's signature splits into
    ``num_bands`` bands of ``num_planes/num_bands`` sign bits; candidates are
    pairs agreeing on at least one band key (a pure **equi-join** on
    ``(band, key)`` — only ids and small ints shuffle, never the vectors),
    then candidates are verified with the exact cosine. Per band, a 2^bits
    fan-out cuts the candidate volume by ~2^bits on isotropic data and far
    more on clustered (real near-dup) corpora, where duplicates share all
    bands. Recall contract: a qualifying pair is found iff it agrees on ≥1
    band — guaranteed for signature hamming distance < num_bands (pigeonhole);
    tighter thresholds concentrate near distance 0. The knobs: more bands →
    higher recall, wider bands (more bits) → bigger candidate cut.

    The banded-key frame feeds BOTH sides of the candidate self-join;
    ``materialize=True`` localCheckpoints the tiny (vid, band, bkey) frame
    (≤ ~16 bytes × num_bands per vector) so the num_planes plane-dot
    signature pass over the raw vectors runs once, not twice — the
    minhash/simhash/ngram-Jaccard shape. The cross-frame twin
    (:func:`lsh_cross_near_pairs`) computes each side's keys once already
    and needs no checkpoint.
    """
    _assert_dim(df, vec_col, dim, "lsh_banded_near_dup_pairs")
    df = _drop_zero_vectors(df, vec_col)
    planes = _hyperplanes(dim, num_planes)
    keys = band_key_exprs(_quote_ident(vec_col), planes, num_bands)
    sigs = df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.array(*keys)).alias("band", "bkey"),
    )
    if materialize:
        sigs = sigs.localCheckpoint(eager=True)
    a = sigs.select(F.col("vid").alias("id_a"), "band", "bkey")
    b = sigs.select(F.col("vid").alias("id_b"), "band", "bkey")
    cand = (
        a.join(b, on=["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm_expr(F.col(vec_col)).alias("na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm_expr(F.col(vec_col)).alias("nb"),
    )
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .filter(
            cosine_from_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
            >= threshold
        )
        .select("id_a", "id_b")
    )


def sampled_centroid_frame(
    corpus: DataFrame, *, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """Deterministic seeded sample as the coarse-quantizer init: order by the
    md5 of the id (a fixed pseudo-random permutation — no RNG state, no bias
    toward low ids) and take the first ``n_centroids``. Exactly replicable in
    SQL, and the k-means++-style 'sample the data' init step."""
    return (
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec"))
        .orderBy(F.md5(F.col("centroid_id").cast("string")), F.col("centroid_id"))
        .limit(n_centroids)
    )


def _collect_centroids(cent_df: DataFrame) -> list[tuple[int, list[float]]]:
    """The quantizer table is tiny (n_centroids × dim) — the one frame IVF is
    allowed to collect. Centroid ids must be NUMERIC (the literal argmax
    negates them to get (score desc, id asc) struct ordering) — string ids
    work everywhere else in this module, so fail with the constraint named
    instead of a bare int() ValueError."""
    out = []
    for r in cent_df.collect():
        try:
            cid = int(r["centroid_id"])
        except (TypeError, ValueError):
            raise ValueError(
                "IVF centroid ids must be numeric (the centroid argmax "
                f"negates them); got {r['centroid_id']!r} — map string ids "
                "to longs first (e.g. xxhash64) or use the 'lsh' strategy"
            ) from None
        out.append((cid, [float(x) for x in r["cent_vec"]]))
    return sorted(out)


def _centroid_pick_expr(
    cents: list[tuple[int, list[float]]], vec: str, vnorm: str | None = None
) -> Column:
    """Array of (cosine score, −centroid_id) structs against LITERAL centroid
    vectors — ONE narrow projection per row, no row inflation, no shuffle.

    This replaces the broadcast-cross-join + row_number window, whose
    ``partitionBy(row id)`` shuffles the n_centroids×-inflated frame WITH the
    vectors — a full-corpus vector shuffle at 100 TB. Ordering by the struct
    gives (score desc, centroid_id asc) because the id is negated; centroid
    norms are precomputed driver-side with the same left-fold double
    arithmetic Catalyst uses, so scores are bit-identical to the join form.

    Measured tradeoff (sf0.1, local[32]): higher-order functions are
    CodegenFallback, so the 16 interpreted cosine folds make this ~2.4×
    slower per row than the join+window form locally (3.1 s vs 1.3 s for the
    whole query) — the price of eliminating the corpus-wide shuffle, which
    dominates at cluster scale. Scalar-expanding the dots into ~3000 codegen
    nodes was measured FAR worse (16.5 s — tree-size planning/codegen cost),
    and numpy-in-Arrow would break bit-exactness with the SQL oracle
    (pairwise vs left-fold summation), so the HOF form is the keeper.

    Built as ONE SQL string → one ``F.expr`` parse: composing it through the
    Column API issues a Py4J round trip per literal (n_centroids × dim
    ``lit`` calls ≈ 1.5–2 s of driver time per assignment — measured as the
    dominant cost of the whole IVF query at sf0.1). Double literals are
    ``repr``-formatted (shortest exact round-trip, parsed by Java
    ``Double.parseDouble``), so the expression tree — and every score — is
    bit-identical to the Column-API form (regression-tested).
    """
    vec_sql = vec
    vnorm_sql = vnorm if vnorm is not None else _sql_norm(vec)
    entries = []
    for cid, cvec in cents:
        cnorm = math.sqrt(sum(x * x for x in cvec))
        arr = ", ".join(_dlit(x) for x in cvec)
        dot = (
            f"aggregate(zip_with({vec_sql}, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"{_dlit(0.0)}, (acc, x) -> acc + x)"
        )
        score = f"{dot} / ({vnorm_sql} * {_dlit(cnorm)})"
        entries.append(f"named_struct('s', {score}, 'nid', {-cid}L)")
    return F.expr("array(" + ", ".join(entries) + ")")


def _dlit(x: float) -> str:
    """Exact SQL double literal: repr() is the shortest string that
    round-trips through Double.parseDouble (what the SQL parser's ``D``
    suffix literal uses)."""
    if not math.isfinite(x):
        raise ValueError(f"non-finite centroid component: {x}")
    return f"{x!r}D"


def _sql_norm(vec_sql: str) -> str:
    return (
        f"sqrt(aggregate(transform({vec_sql}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), {_dlit(0.0)}, (acc, x) -> acc + x))"
    )


def assign_centroids(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    *,
    vec_col: str,
    out_col: str = "bucket",
    n: int = 1,
    norm_col: str | None = None,
) -> DataFrame:
    """Attach each row's ``n`` nearest centroid ids (max cosine, smallest id
    on ties) as ``out_col`` — one row per (input row, probe). Narrow: the
    only fan-out is the explode of ``n`` small ints on the probe side.

    The row's norm is staged as a real column first so the interpreted
    array-fold runs once per row, not once per centroid entry (expression
    trees are inlined per use; CSE is not guaranteed outside codegen)."""
    if norm_col is None:
        staged = df.withColumn("__vnorm", norm_expr(F.col(vec_col)))
        vnorm, drop_cols = "`__vnorm`", ["__vnorm"]
    else:
        staged, vnorm, drop_cols = df, _quote_ident(norm_col), []
    picks = _centroid_pick_expr(cents, _quote_ident(vec_col), vnorm)
    if n == 1:
        best = F.array_max(picks)
        return staged.withColumn(out_col, (-best["nid"]).cast("long")).drop(*drop_cols)
    top = F.slice(F.reverse(F.array_sort(picks)), 1, n)
    return (
        staged.withColumn("__pick", F.explode(top))
        .withColumn(out_col, (-F.col("__pick.nid")).cast("long"))
        .drop("__pick", *drop_cols)
    )


def kmeans_centroid_frame(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Lloyd-refined quantizer: seeded-sample init, then ``iters`` rounds of
    assign (literal-centroid argmax — a genuinely narrow pass, see
    :func:`_centroid_pick_expr`) + per-component mean (posexplode →
    partial-agg groupBy — the shuffle carries n·dim scalars, never pairs).
    Deterministic up to float summation order; only the tiny
    ``n_centroids × dim`` centroid table is ever collected. Empty cells keep
    their previous centroid."""
    _assert_dim(corpus, vec_col, dim, "kmeans_centroid_frame")
    spark = corpus.sparkSession
    cents = _collect_centroids(
        sampled_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
        )
    )
    vecs = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    for _ in range(iters):
        assigned = assign_centroids(vecs, cents, vec_col="vec", out_col="centroid_id")
        means = (
            assigned.select("centroid_id", F.posexplode("vec").alias("pos", "comp"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("comp").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("new_vec")
            )
        )
        updated = {int(r["centroid_id"]): [float(x) for x in r["new_vec"]] for r in means.collect()}
        cents = [(cid, updated.get(cid, prev)) for cid, prev in cents]
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in cents], "centroid_id long, cent_vec array<double>"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    quantizer: str = "sample",
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: the second scale path next to LSH.

    Coarse quantizers (all deterministic, no RNG):
    - ``sample`` (default): md5-seeded sample of corpus vectors — exactly
      replicable in a SQL oracle;
    - ``kmeans``: the sample refined by Lloyd iterations
      (:func:`kmeans_centroid_frame`) — tighter cells, higher recall per
      probe; recall vs brute force is asserted in tests;
    - ``first``: lowest-id vectors (legacy test artifact).

    Every corpus vector is assigned to its max-cosine centroid via the
    LITERAL-centroid argmax expression (:func:`_centroid_pick_expr`) — a
    genuinely narrow projection with no row inflation and no shuffle; each
    query probes its ``n_probe`` nearest centroids and scores only those
    inverted lists. At 100 TB the corpus is hash-partitioned by
    ``centroid_id``, so a probe touches n_probe/n_centroids of the data and
    the per-bucket join shuffles only the probed lists.
    """
    corpus = _drop_zero_vectors(corpus, vec_col)
    queries = _drop_zero_vectors(queries, vec_col)
    # query vectors dot the corpus-derived centroids: a dim mismatch would
    # NULL-poison every probe score silently — check it like the LSH paths
    cdim = _observed_dim(corpus, vec_col)
    if cdim is not None:
        _assert_dim(queries, vec_col, cdim, "ivf_topk (queries vs corpus)")
    if quantizer == "kmeans":
        cent_df = kmeans_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
            iters=kmeans_iters,
        )
    elif quantizer == "sample":
        cent_df = sampled_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
        )
    elif quantizer == "first":
        cent_df = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    cents = _collect_centroids(cent_df)

    c_assigned = assign_centroids(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            norm_expr(F.col(vec_col)).alias("cnorm"),
        ),
        cents, vec_col="cvec", out_col="bucket", n=1, norm_col="cnorm",
    )
    q_assigned = assign_centroids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm_expr(F.col(vec_col)).alias("qnorm"),
        ),
        cents, vec_col="qvec", out_col="bucket", n=n_probe, norm_col="qnorm",
    )
    scored = c_assigned.join(F.broadcast(q_assigned), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_from_norms(
            F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


ANN_INDEX_FORMAT_VERSION = 1


def _require_local_index_path(path: str, op: str) -> None:
    """The index manifest is written/validated with driver-local os.path /
    os.replace while the lists/centroids go through Spark writers — a URI
    path (s3://, hdfs://) would split the index across two filesystems:
    mkstemp fails AFTER the expensive list write, and os.path.exists
    misreports staleness. Refuse loudly and early instead of implicitly
    supporting local paths only."""
    if "://" in str(path):
        raise ValueError(
            f"{op} supports local filesystem paths only (the manifest is "
            f"written with atomic local renames); got URI {path!r} — build "
            "to a local staging dir and upload the directory as a unit"
        )


def build_ann_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    quantizer: str = "sample",
    kmeans_iters: int = 2,
) -> dict:
    """Materialize an IVF index ON DISK — the build-once/probe-many path
    that :func:`ivf_topk` (which re-derives everything per call) is not:

    - ``<path>/lists/`` — the corpus assigned to its max-cosine centroid
      and written ``partitionBy(centroid_id)``: each inverted list is its
      own partition directory, so a probe's ``centroid_id IN (...)`` filter
      becomes STATIC PARTITION PRUNING — at 100 TB a probe opens
      n_probe/n_centroids of the files and the rest never leave object
      storage.
    - ``<path>/centroids/`` — the (centroid_id, cent_vec) quantizer table.
    - ``<path>/manifest.json`` — format version, dim, metric, quantizer,
      actual list count, row count; written ATOMICALLY (temp + rename, the
      ``save_merges`` convention) LAST, so a crashed build never leaves a
      loadable-looking torn index.

    Returns the manifest dict."""
    import json
    import os
    import shutil
    import tempfile

    _require_local_index_path(path, "build_ann_index")
    # validate EVERY argument before the destructive invalidation below: a
    # typo'd quantizer/column or bad knob must not brick a standing index
    # without rebuilding it
    if quantizer not in ("kmeans", "sample"):
        raise ValueError(f"unknown quantizer {quantizer!r}")
    for c in (id_col, vec_col):
        if c not in corpus.columns:
            raise ValueError(
                f"column {c!r} not in corpus (has {corpus.columns})"
            )
    if n_centroids < 1:
        raise ValueError(f"n_centroids must be >= 1, got {n_centroids}")
    if quantizer == "kmeans" and kmeans_iters < 1:
        raise ValueError(f"kmeans_iters must be >= 1, got {kmeans_iters}")
    corpus = _drop_zero_vectors(corpus, vec_col)
    dim = _observed_dim(corpus, vec_col)
    if dim is None:
        raise ValueError("cannot build an ANN index from an empty corpus")
    # REBUILD over an existing index: invalidate FIRST — a stale manifest
    # surviving a crash mid-rebuild would validate against half-overwritten
    # centroids/lists and probe silently wrong (the atomic rename only
    # protects a fresh build)
    stale = os.path.join(path, "manifest.json")
    if os.path.exists(stale):
        os.unlink(stale)
    # then wipe the data dirs OURSELVES: mode('overwrite') under a session
    # with spark.sql.sources.partitionOverwriteMode=dynamic replaces only
    # the partitions PRESENT in the new build — a rebuild with fewer or
    # different centroids would leave stale inverted-list partitions that
    # probes read against the fresh manifest (silently wrong neighbors)
    for sub in ("lists", "centroids"):
        d = os.path.join(path, sub)
        if os.path.isdir(d):
            shutil.rmtree(d)
    if quantizer == "kmeans":
        cent_df = kmeans_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
            iters=kmeans_iters, dim=dim,
        )
    else:  # 'sample' — validated above, before the destructive wipe
        cent_df = sampled_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
        )
    cents = _collect_centroids(cent_df)
    spark = corpus.sparkSession
    spark.createDataFrame(
        list(cents), "centroid_id long, cent_vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    assigned = assign_centroids(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            norm_expr(F.col(vec_col)).alias("vnorm"),
        ),
        cents, vec_col="vec", out_col="centroid_id", norm_col="vnorm",
    )
    # co-locate each inverted list before the partitioned write: without
    # this every upstream task writes a sliver of every centroid directory
    # (tasks × n_centroids small files); one hash exchange on centroid_id
    # lands each list as a few whole files — the layout probes actually
    # scan. (A pathologically hot centroid can be split further with a
    # (centroid_id, salt) composite; the quantizer's job is to keep lists
    # balanced, so the plain key is the right default.)
    assigned.repartition(F.col("centroid_id")).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(os.path.join(path, "lists"))
    n_rows = spark.read.parquet(os.path.join(path, "lists")).count()
    manifest = {
        "format_version": ANN_INDEX_FORMAT_VERSION,
        "dim": dim,
        "metric": "cosine",
        "quantizer": quantizer,
        "n_centroids": len(cents),
        "n_rows": n_rows,
        "vec_type": vec_type,
    }
    mpath = os.path.join(path, "manifest.json")
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, mpath)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return manifest


def load_ann_index(spark, path: str) -> tuple[dict, list]:
    """Load + validate an index written by :func:`build_ann_index`:
    manifest shape/version checked loudly (a torn or foreign directory must
    not probe as an empty index), centroid table re-collected. Returns
    (manifest, centroids)."""
    import json
    import os

    _require_local_index_path(path, "load_ann_index")
    mpath = os.path.join(path, "manifest.json")
    if not os.path.exists(mpath):
        raise ValueError(f"not an ANN index (no manifest.json): {path!r}")
    with open(mpath, encoding="utf-8") as fh:
        manifest = json.load(fh)
    if (
        not isinstance(manifest, dict)
        or manifest.get("format_version") != ANN_INDEX_FORMAT_VERSION
        or not isinstance(manifest.get("dim"), int)
        or manifest.get("metric") != "cosine"
    ):
        raise ValueError(f"unsupported ANN index manifest: {manifest!r}")
    cents = _collect_centroids(
        spark.read.parquet(os.path.join(path, "centroids"))
    )
    if len(cents) != manifest["n_centroids"]:
        raise ValueError(
            f"index corrupt: manifest says {manifest['n_centroids']} centroids, "
            f"found {len(cents)}"
        )
    return manifest, cents


def append_to_ann_index(
    new_vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index growth — the ingest path of a standing ANN index:
    assign ONLY the new batch to the EXISTING centroids (the quantizer is
    frozen at build time, the standard IVF contract — recall degrades
    gracefully as the distribution drifts, and a rebuild is the explicit
    re-quantization event) and append each assignment to its inverted-list
    partition. The manifest's row count is refreshed atomically LAST, so a
    crashed append leaves a loadable index whose manifest undercounts —
    probes stay correct (they scan partitions, not the manifest).

    Scale: one narrow assignment pass over the batch + a partitioned
    append touching only the partitions the batch lands in; the standing
    corpus is never read or rewritten."""
    import json
    import os
    import tempfile

    spark = new_vectors.sparkSession
    manifest, cents = load_ann_index(spark, path)
    new_vectors = _drop_zero_vectors(new_vectors, vec_col)
    _assert_dim(new_vectors, vec_col, manifest["dim"], "append_to_ann_index")
    # cast to the stored element type: an array<double> batch appended to
    # array<float> lists leaves two incompatible parquet schemas and later
    # probes fail (or misread) long after the append "succeeded"
    vec = F.col(vec_col)
    if "vec_type" in manifest:
        vec = vec.cast(manifest["vec_type"])
    assigned = assign_centroids(
        new_vectors.select(
            F.col(id_col).alias("vec_id"),
            vec.alias("vec"),
            # norm over the CAST column: a double batch appended to
            # array<float> lists must store the norm of the vector AS
            # STORED, or appended-row cosines drift from rebuilt-index ones
            norm_expr(vec).alias("vnorm"),
        ),
        cents, vec_col="vec", out_col="centroid_id", norm_col="vnorm",
    )
    n_new = assigned.count()
    assigned.write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(path, "lists")
    )
    manifest = dict(manifest)
    # incremental: old count + this batch — the standing lists are never
    # re-enumerated (the docstring's contract; a full recount would make
    # append cost grow with index size instead of batch size)
    manifest["n_rows"] = manifest["n_rows"] + n_new
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(path, "manifest.json"))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return manifest


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_threshold: int = 100_000,
) -> DataFrame:
    """Probe a persisted IVF index: assign each query to its ``n_probe``
    nearest centroids, then score ONLY those inverted lists. The probed
    buckets are collected first (≤ n_centroids values — bounded by the
    quantizer, never by query volume) and pushed as a literal
    ``centroid_id IN (...)`` filter, so the scan plans static partition
    pruning over the partitionBy layout — the unprobed lists are never
    read. Output schema matches :func:`ivf_topk`.

    The op's contract is probe-MANY small batches, so the assigned query
    frame normally broadcasts into the list join. A caller probing with a
    corpus-sized frame must not OOM the driver on the broadcast:
    ``broadcast_threshold`` bounds the assigned rows (queries × n_probe)
    the hint applies to — above it the join falls back to a plain
    bucket-keyed equi-join (one shuffle of the query frame; the pruned
    list scan is unchanged). The bucket stats collect below is the
    measurement — same single job either way."""
    import os

    manifest, cents = load_ann_index(spark, path)
    queries = _drop_zero_vectors(queries, vec_col)
    _assert_dim(queries, vec_col, manifest["dim"], "ivf_topk_indexed")
    q_assigned = assign_centroids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm_expr(F.col(vec_col)).alias("qnorm"),
        ),
        cents, vec_col="qvec", out_col="bucket", n=n_probe, norm_col="qnorm",
    )
    # one job yields BOTH the probed-bucket list (≤ n_centroids groups) and
    # the assigned-row total that decides the broadcast
    bucket_stats = q_assigned.groupBy("bucket").count().collect()
    buckets = sorted(r["bucket"] for r in bucket_stats)
    n_assigned = sum(r["count"] for r in bucket_stats)
    lists = (
        spark.read.parquet(os.path.join(path, "lists"))
        .filter(F.col("centroid_id").isin(buckets))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("vec").alias("cvec"),
            F.col("vnorm").alias("cnorm"),
            F.col("centroid_id").alias("bucket"),
        )
    )
    q_side = (
        F.broadcast(q_assigned) if n_assigned <= broadcast_threshold else q_assigned
    )
    scored = lists.join(q_side, on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_from_norms(
            F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", *, bits: int = 8
) -> DataFrame:
    """Symmetric per-vector int quantization (the standard embedding-storage
    compression in training pipelines): scale = max|x| / (2^(bits-1) - 1),
    q_i = round(x_i / scale). Entirely narrow Catalyst expressions — no
    shuffle, no UDF; at 100 TB this is a map-only pass that cuts the
    embedding bytes 4×.

    Determinism note: max|x| is order-insensitive and float→double widening
    is exact, so (scale, q) are bit-identical across engines — q travels as
    a csv string so value-hash comparison is representation-stable.
    """
    qmax = (1 << (bits - 1)) - 1
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(vec, F.abs))
    # NULL components quantize to 0 (coalesce BEFORE the divide): a NULL
    # would make concat_ws silently skip the entry, misaligning every later
    # component of the csv against its position
    q_of = lambda v: F.when(  # noqa: E731 - zero vector quantizes to zeros
        F.col("scale") == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            v,
            lambda x: F.round(F.coalesce(x, F.lit(0.0)) / F.col("scale")).cast("int"),
        )
    )
    return df.select(
        F.col(id_col), vec.alias("_v"), (maxabs / F.lit(float(qmax))).alias("scale")
    ).select(
        id_col,
        "scale",
        F.concat_ws(
            ",", F.transform(q_of(F.col("_v")), lambda v: v.cast("string"))
        ).alias("q_csv"),
    )


def project_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    dim: int | None = None,
    seed: str = "vitess-cdc-rp",
    out_col: str = "projected",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``k`` dimensions with the
    SAME deterministic SHA-256 Gaussian planes as the LSH family — no RNG
    state, so the projection matrix is a pure function of (seed, dim, k)
    and any engine (or a later re-run over new data) reproduces it exactly.
    Rows are unit-normalized Gaussians scaled by ``sqrt(dim/k)``, the
    variant that preserves squared norms in expectation, so downstream
    cosine/L2 structure survives at the JL distortion bound.

    Scale: the k plane-dots compile to ONE SQL parse of codegen'd
    ``aggregate(zip_with(...))`` folds — a narrow map-only projection, no
    shuffle, no Python; at 100 TB this is the embedding-width reducer that
    runs fused into the scan before any ANN/dedup pass, cutting every
    downstream vector exchange by dim/k. Compose with
    :func:`quantize_embeddings` for the int8 storage path."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim is None:
        dim = _observed_dim(df, vec_col)
        if dim is None:
            raise ValueError("cannot probe vector dim from an empty frame; pass dim=")
    else:
        _assert_dim(df, vec_col, dim, "project_embeddings")
    planes = _hyperplanes(dim, k, seed=seed)
    scale = math.sqrt(dim / float(k))
    vec_sql = _quote_ident(vec_col)
    comps = ", ".join(
        f"{_plane_dot_sql(vec_sql, p)} * {_dlit(scale)}" for p in planes
    )
    return df.select(
        id_col, *keep_cols, F.expr(f"array({comps})").alias(out_col)
    )


def project_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    k: int = 8,
    dim: int | None = None,
    seed: str = "vitess-cdc-rp",
    bits: int = 8,
    weight_scale_bits: int = 20,
    out_col: str = "q_proj_csv",
) -> DataFrame:
    """Integer-exact random projection: int8-quantize the vector (the
    :func:`quantize_embeddings` scale/codes), then project the CODES with
    integer-quantized plane weights ``round(w · 2^weight_scale_bits)`` —
    every product and sum is BIGINT arithmetic, so the projection is
    bit-identical in ANY engine and under ANY reduction order (the int8-GEMM
    shape production inference uses). The real-valued projection is
    recovered as ``csv_j × scale × sqrt(dim/k) / 2^weight_scale_bits``;
    relative to :func:`project_embeddings` it adds only the int8
    quantization error.

    Scale: one narrow zero-shuffle projection like the float path; |term| ≤
    (2^(bits−1)−1) · 2^weight_scale_bits and dim terms keep the sums far
    inside int64. Returns (id_col, scale, out_col)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim is None:
        dim = _observed_dim(df, vec_col)
        if dim is None:
            raise ValueError("cannot probe vector dim from an empty frame; pass dim=")
    else:
        _assert_dim(df, vec_col, dim, "project_quantized")
    qmax = (1 << (bits - 1)) - 1
    if (qmax << weight_scale_bits) * dim >= 1 << 62:
        raise ValueError("bits + weight_scale_bits too large: int64 overflow risk")
    planes = _hyperplanes(dim, k, seed=seed)
    w_ints = [[int(round(w * (1 << weight_scale_bits))) for w in p] for p in planes]
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.select(
        id_col,
        vec.alias("__v"),
        (F.array_max(F.transform(vec, F.abs)) / F.lit(float(qmax))).alias("scale"),
    ).select(
        id_col,
        "scale",
        F.when(
            F.col("scale") == 0.0,
            F.transform(F.col("__v"), lambda x: F.lit(0).cast("long")),
        )
        .otherwise(
            F.transform(
                F.col("__v"),
                lambda x: F.round(
                    F.coalesce(x, F.lit(0.0)) / F.col("scale")
                ).cast("long"),
            )
        )
        .alias("__q"),
    )
    comps = ", ".join(
        "aggregate(zip_with(`__q`, array("
        + ", ".join(f"{w}L" for w in p)
        + "), (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
        for p in w_ints
    )
    return staged.select(
        id_col,
        "scale",
        F.expr(
            f"concat_ws(',', transform(array({comps}), v -> CAST(v AS STRING)))"
        ).alias(out_col),
    )


def lsh_cross_near_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    num_planes: int = 16,
    num_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Cross-corpus embedding near-matches: for two DIFFERENT frames (e.g.
    eval set vs training corpus — semantic decontamination; or two crawls —
    cross-corpus dedup), find (left_id, right_id) pairs with cosine ≥
    ``threshold`` via the same banded hyperplane-LSH equi-join as
    :func:`lsh_banded_near_dup_pairs`: only (band, key, id) rows shuffle,
    vectors join back per side, candidates verify with the exact cosine.
    Both sides hash with the SAME deterministic hyperplanes, so the recall
    contract (signature hamming < num_bands ⇒ found) carries over. Returns
    (left_id, right_id, score).
    """
    _assert_dim(left, vec_col, dim, "lsh_cross_near_pairs")
    _assert_dim(right, vec_col, dim, "lsh_cross_near_pairs")
    left = _drop_zero_vectors(left, vec_col)
    right = _drop_zero_vectors(right, vec_col)
    planes = _hyperplanes(dim, num_planes)

    def sigs(df: DataFrame, out: str) -> DataFrame:
        keys = band_key_exprs(_quote_ident(vec_col), planes, num_bands)
        return df.select(
            F.col(id_col).alias(out),
            F.posexplode(F.array(*keys)).alias("band", "bkey"),
        )

    cand = (
        sigs(left, "left_id")
        .join(sigs(right, "right_id"), on=["band", "bkey"])
        .select("left_id", "right_id")
        .distinct()
    )
    vl = left.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("vl"),
        norm_expr(F.col(vec_col)).alias("nl"),
    )
    vr = right.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("vr"),
        norm_expr(F.col(vec_col)).alias("nr"),
    )
    return (
        cand.join(vl, on="left_id")
        .join(vr, on="right_id")
        .withColumn(
            "score",
            cosine_from_norms(F.col("vl"), F.col("vr"), F.col("nl"), F.col("nr")),
        )
        .filter(F.col("score") >= threshold)
        .select("left_id", "right_id", "score")
    )


def _assign_centroids_gemm(
    staged: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Centroid assignment as ONE Arrow-batched numpy matmul per batch —
    the 100 TB shape for LARGE centroid counts, where the literal-argmax
    expression stops scaling twice over: per-row cost is an O(k)
    interpreted HOF fold (k ∝ corpus under a constant-cluster-size policy,
    so total assignment work grows n·k), and a k×dim literal tree past a
    few hundred centroids blows up planning/codegen (measured in
    _centroid_pick_expr's docstring). BLAS does the same n·k·d FLOPs at
    memory bandwidth — the faiss/SemDeDup-paper assignment shape — with
    the centroid matrix broadcast in the closure, zero shuffle.

    Trade-off stated honestly: numpy's pairwise summation is NOT the
    sequential fold Catalyst and DuckDB compute, so scores can differ in
    the last ulps and an argmax between near-tied centroids can flip —
    this path is for production scale, while ``assignment='expr'`` stays
    the bit-exact default the driver row's oracle replicates. Ties on
    equal score break to the smaller centroid id in both paths (ids are
    sorted ascending; argmax returns the first maximum).

    Input/output contract: staged carries (__sid, __svec, __snorm); the
    output appends (cluster_id, __cscore) and keeps the vector+norm for
    the within-cluster pair stage."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)  # k × d
    cn = np.sqrt((C * C).sum(axis=1))

    out_schema = StructType(
        list(staged.schema.fields)
        + [
            StructField("cluster_id", LongType()),
            StructField("__cscore", DoubleType()),
        ]
    )

    def assign(batches) -> "Iterator[pd.DataFrame]":  # noqa: F821
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__svec"]])
            vn = pdf["__snorm"].to_numpy(dtype=np.float64)
            scores = (V @ C.T) / (vn[:, None] * cn[None, :])
            best = scores.argmax(axis=1)  # first max = smallest centroid id
            pdf = pdf.copy()
            pdf["cluster_id"] = ids[best]
            pdf["__cscore"] = scores[np.arange(len(pdf)), best]
            yield pdf

    return staged.mapInPandas(assign, schema=out_schema)


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    quantizer: str = "sample",
    kmeans_iters: int = 2,
    threshold: float = 0.95,
    keep: str = "min_id",
    assignment: str = "expr",
    materialize: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    by centroid blocking — cluster the embedding space coarsely, then flag a
    document as a semantic duplicate when a HIGHER-PRIORITY member of its own
    cluster is cosine-similar above ``threshold``. Unlike the pairwise LSH
    path (:func:`lsh_banded_near_dup_pairs`, which targets a similarity
    THRESHOLD globally), this is the curation action the paper validates for
    pruning semantically redundant training data: the candidate set is the
    cluster, not a hash bucket, so near-identical paraphrases that land in
    the same region are caught even when banding would need many more planes.

    Priority (who survives a duplicate group):
    - ``keep='min_id'`` (default): lowest id — the repo-wide
      first-occurrence-wins convention (paragraph/streaming/minhash dedup);
    - ``keep='far_centroid'``: the member LEAST similar to its centroid
      (ties → lowest id) — the paper's diversity-preserving rule (§3: keep
      the point with the lowest centroid cosine inside each dup group).

    Returns one row per (non-zero-vector) input doc:
    ``(id_col, cluster_id, is_dup, witness_id)`` where ``witness_id`` is the
    smallest-id higher-priority neighbor that convicted the doc (NULL when
    kept). Deterministic — no RNG, both quantizers are the seeded/iterated
    deterministic frames IVF uses — and exactly replicable in SQL.

    100 TB shape: assignment is narrow and shuffle-free in both modes —
    ``assignment='expr'`` (default) is the LITERAL-centroid argmax
    projection (:func:`_centroid_pick_expr`), bit-exact against the SQL
    oracle but O(k) interpreted folds per row, right for small k;
    ``assignment='gemm'`` is one Arrow-batched numpy matmul per batch
    against the broadcast centroid matrix (:func:`_assign_centroids_gemm`)
    — the faiss-style shape that holds when a constant-cluster-size policy
    pushes k into the tens of thousands (float-order differs in the last
    ulps; see its docstring). The only vector exchange is ONE hash
    partition on ``cluster_id`` for the within-cluster self-join (inherent
    to SemDeDup's exact within-cluster cosine; cluster size — and thus the
    per-task pair product — is controlled by ``n_centroids``, the paper
    runs ~50k clusters at LAION scale, and an equi-join lets AQE split
    stragglers); the conviction groupBy and the join-back move ids only.
    Cites reference parity: none — extension operator (SURVEY §2.9)."""
    if keep not in ("min_id", "far_centroid"):
        raise ValueError(f"keep must be 'min_id' or 'far_centroid', got {keep!r}")
    if assignment not in ("expr", "gemm"):
        raise ValueError(
            f"assignment must be 'expr' or 'gemm', got {assignment!r}"
        )
    corpus = _drop_zero_vectors(corpus, vec_col)
    if quantizer == "kmeans":
        cent_df = kmeans_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids,
            iters=kmeans_iters,
        )
    elif quantizer == "sample":
        cent_df = sampled_centroid_frame(
            corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    cents = _collect_centroids(cent_df)

    staged = corpus.select(
        F.col(id_col).alias("__sid"),
        F.col(vec_col).alias("__svec"),
        norm_expr(F.col(vec_col)).alias("__snorm"),
    )
    if assignment == "gemm":
        assigned = _assign_centroids_gemm(staged, cents)
    else:
        best = F.array_max(_centroid_pick_expr(cents, "`__svec`", "`__snorm`"))
        assigned = staged.select(
            "__sid", "__svec", "__snorm",
            (-best["nid"]).cast("long").alias("cluster_id"),
            best["s"].alias("__cscore"),
        )
    # materialize-once (the r6 self-join dedup rule): the assigned frame is
    # consumed on BOTH join sides AND by the final join-back — without the
    # checkpoint, the assignment pass (the O(k)-fold argmax or the BLAS
    # seam) re-runs per consumer. Blocks reclaimed by the caller's
    # cache.checkpoint_scope, same as the MinHash/Jaccard materializations.
    if materialize:
        from ..cache import eager_localcheckpoint

        assigned, _release = eager_localcheckpoint(assigned)
    # one exchange keyed on cluster_id feeds BOTH join sides (self-join on
    # the same assigned frame); priority compares inline on the joined row
    a = assigned.select(
        F.col("__sid").alias("__aid"), F.col("__svec").alias("__avec"),
        F.col("__snorm").alias("__anorm"), "cluster_id",
        F.col("__cscore").alias("__acs"),
    )
    b = assigned.select(
        F.col("__sid").alias("__bid"), F.col("__svec").alias("__bvec"),
        F.col("__snorm").alias("__bnorm"), "cluster_id",
        F.col("__cscore").alias("__bcs"),
    )
    if keep == "min_id":
        higher_priority = F.col("__aid") < F.col("__bid")
    else:
        higher_priority = (F.col("__acs") < F.col("__bcs")) | (
            (F.col("__acs") == F.col("__bcs")) & (F.col("__aid") < F.col("__bid"))
        )
    convicted = (
        a.join(b, on="cluster_id")
        .filter(F.col("__aid") != F.col("__bid"))
        .filter(higher_priority)
        .filter(
            cosine_from_norms(
                F.col("__avec"), F.col("__bvec"),
                F.col("__anorm"), F.col("__bnorm"),
            )
            >= threshold
        )
        .groupBy(F.col("__bid").alias("__sid"))
        .agg(F.min("__aid").alias("witness_id"))
    )
    return (
        assigned.select("__sid", "cluster_id")
        .join(convicted, on="__sid", how="left")
        .select(
            F.col("__sid").alias(id_col),
            "cluster_id",
            F.col("witness_id").isNotNull().alias("is_dup"),
            "witness_id",
        )
    )


def topk_recall(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """recall@k of an approximate top-k result against exact ground truth —
    the measurement that justifies every LSH/IVF knob choice
    (num_planes/num_bands/nprobe) before a 100 TB run commits to it.

    Both inputs are frames in the shared (query_id, rank, neighbor_id)
    shape every top-k in this module emits (:func:`brute_force_topk`,
    :func:`lsh_topk`, :func:`ivf_topk`). Returns one row per query:
    (query_id, n_exact, n_hit, recall). Queries the approximate method
    returned NOTHING for (empty bucket/probe set) still appear, with
    recall 0 — dropping them would inflate the average exactly for the
    geometry's worst failure mode. Mean recall is one ``avg("recall")``
    away; it is left to the caller so per-query tails stay inspectable.

    The intended eval flow is sample-sized end to end, so cost is bounded
    regardless of corpus size::

        qs = corpus.filter(hash_uniform_expr(F.col("vec_id"), "anneval") < 2)
        truth = brute_force_topk(corpus, qs, k=10)        # exact, on the sample
        cand  = lsh_topk(corpus, qs, k=10, num_planes=16) # the knob under test
        topk_recall(cand, truth).agg(F.avg("recall")).show()

    Shuffles: two joins keyed by query_id on sample-sized frames — trivial
    at any corpus scale.
    """
    ex = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hit = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            on=["query_id", "neighbor_id"],
            how="left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        ex.join(hit, on="query_id", how="left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact")
            ).alias("recall"),
        )
    )


def hyperplane_collision_prob(
    cosine: float, num_planes: int, num_bands: int
) -> float:
    """Probability that a pair at the given cosine similarity collides in
    ≥1 hyperplane band: a random hyperplane's sign bits agree with
    probability p = 1 − θ/π, θ = arccos(cos) (Goemans–Williamson, the
    SimHash bound of Charikar 2002); a band of r = planes/bands bits
    collides iff all r agree, so P = 1 − (1 − p^r)^bands — the same
    banding s-curve as MinHash, in angle space."""
    import math

    if not -1.0 <= cosine <= 1.0:
        raise ValueError("cosine must be in [-1, 1]")
    from .dedup import _validate_banding

    _validate_banding(num_planes, num_bands)
    rows = num_planes // num_bands
    p = 1.0 - math.acos(max(-1.0, min(1.0, cosine))) / math.pi
    return 1.0 - (1.0 - p**rows) ** num_bands


def tune_hyperplane_bands(
    threshold: float,
    num_planes: int = 16,
    *,
    min_recall: float = 0.95,
) -> tuple[int, int]:
    """Pick (num_bands, rows) for :func:`lsh_banded_near_dup_pairs` /
    :func:`lsh_cross_near_pairs`: among the divisor pairs
    bands·rows = num_planes, choose the FEWEST bands (fewest band keys ⇒
    smallest candidate volume) whose angle-space s-curve still catches
    pairs AT the cosine threshold with probability ≥ ``min_recall``; if no
    geometry reaches the bar, fall back to the recall-maximizing pair
    (raise ``num_planes`` when that happens — more bits is the only real
    lever). The exact twin of :func:`~.dedup.tune_minhash_bands`, with the
    theory bound :func:`topk_recall` then verifies empirically on a query
    sample. Deterministic driver-side arithmetic."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    from .dedup import _pick_banding

    return _pick_banding(
        lambda b: hyperplane_collision_prob(threshold, num_planes, b),
        num_planes,
        min_recall,
    )
