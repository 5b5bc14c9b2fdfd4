"""Block-manager hygiene for ``localCheckpoint``-materialized frames.

``DataFrame.localCheckpoint(eager=True)`` persists the frame's internal RDD
blocks in the block manager and truncates lineage — the right tool for
iterative algorithms and multi-consumer frames (ops/dedup.py) — but the
blocks are NOT released when the DataFrame goes out of scope. A session that
runs many pipeline stages (a bench sweep, a long-lived notebook, a
multi-query driver) accumulates storage monotonically.

Two releases, both built on the only stable handle Spark exposes for
checkpointed RDDs (``JavaSparkContext.getPersistentRDDs``):

- :func:`eager_localcheckpoint` — checkpoint + a ``release()`` callback for
  the exact RDDs that checkpoint created. For operators that can retire an
  intermediate mid-job (each CC round releases the previous round's frame).
- :func:`checkpoint_scope` — a context manager that releases every RDD
  persisted inside the scope on exit. For the caller that OWNS the job
  lifecycle (run query → terminal action → release), since a lazily returned
  DataFrame's checkpoints must outlive the operator that made them.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


def _persistent_ids(spark: SparkSession) -> set[int]:
    return {int(rid) for rid in spark.sparkContext._jsc.getPersistentRDDs().keySet()}


def _unpersist_ids(spark: SparkSession, ids: set[int], *, blocking: bool = False) -> int:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for rid in list(jmap.keySet()):
        if int(rid) in ids:
            jmap.get(rid).unpersist(blocking)
            released += 1
    return released


def eager_localcheckpoint(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """``df.localCheckpoint(eager=True)`` plus a ``release()`` that unpersists
    exactly the RDD blocks that checkpoint materialized. Call ``release()``
    only once no live plan references the checkpointed frame."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    created = _persistent_ids(spark) - before

    def release() -> None:
        _unpersist_ids(spark, created)

    return out, release


def materialize_if_derived(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """:func:`eager_localcheckpoint` unless the frame is already a LEAF
    (LocalRelation / LogicalRDD — a driver literal or an earlier
    checkpoint): re-checkpointing a leaf buys no lineage cut and no shared
    compute, it just pays one copy job. Used where an operator materializes
    a caller-supplied frame that is sometimes a literal (e.g. a fixed
    weight table) and sometimes an expensive derivation."""
    plan = df._jdf.queryExecution().optimizedPlan()
    if plan.children().isEmpty():
        return df, lambda: None
    return eager_localcheckpoint(df)


def lazy_localcheckpoint(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """``df.localCheckpoint(eager=False)`` plus the same ``release()`` as
    :func:`eager_localcheckpoint`.

    The checkpoint materializes during the CALLER'S next action, so a
    probe-and-materialize round costs ONE job instead of two (the eager
    form pays a dedicated checkpoint job before the caller's action can
    run). The caller's first action over the frame must touch EVERY
    partition — a full-pass aggregate does; a short-circuit action
    (``limit``/``take``) would leave unvisited partitions to recompute
    from the untruncated lineage on the next consumer."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=False)
    created = _persistent_ids(spark) - before

    def release() -> None:
        _unpersist_ids(spark, created)

    return out, release


@contextmanager
def checkpoint_scope(spark: SparkSession) -> Iterator[None]:
    """Release every RDD persisted inside the scope on exit.

    The owner-of-the-job pattern: operators materialize freely, the caller
    that runs the terminal action reclaims the block manager afterwards::

        with checkpoint_scope(spark):
            minhash_dedup_pairs(docs, "text", "doc_id").write...save()
        # block manager back to its pre-scope state
    """
    before = _persistent_ids(spark)
    try:
        yield
    finally:
        _unpersist_ids(spark, _persistent_ids(spark) - before)
