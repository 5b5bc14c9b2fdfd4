"""Live VStream gRPC streaming source (S1-S4).

The container has no grpc/vitess-proto packages and no live Vitess, so the
transport is gated behind an import-try; everything around it — request rule
building (server-side filter pushdown F2), retry classification (E1), offset
resolution (O3), shard partitioning (O4) — is real and unit-tested.

Reference semantics: connection/VitessReplicationConnection.java:108-480.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from ..filters import TableFilter
from ..vgtid import CURRENT_GTID, EMPTY_GTID, Vgtid, default_vgtid

try:  # pragma: no cover - transport not present in this environment
    import grpc  # type: ignore

    HAVE_GRPC = True
except ImportError:
    HAVE_GRPC = False


@dataclass(frozen=True)
class VStreamRule:
    """One VStream filter rule: match table, filter query.

    Reference: included tables compiled to ``Rule{match, filter="select * from t"}``
    so VTGate filters before sending (VitessReplicationConnection.java:316-327).
    """

    match: str
    filter: str


def build_rules(tables: list[str]) -> list[VStreamRule]:
    return [VStreamRule(match=t, filter=f"select * from {t}") for t in tables]


def rules_for_filter(all_tables: list[tuple[str, str]], tf: TableFilter) -> list[VStreamRule]:
    """F2: compile the include list into server-side rules (driver-side)."""
    return build_rules([t for ks, t in all_tables if tf.matches(ks, t)])


def is_retriable(exc: Exception) -> bool:
    """E1: all gRPC status errors are retriable (VitessErrorHandler.java:23-31);
    the task restarts from the last committed offset."""
    if HAVE_GRPC and isinstance(exc, grpc.RpcError):  # pragma: no cover
        return True
    return isinstance(exc, (ConnectionError, TimeoutError, OSError))


@dataclass
class RetryPolicy:
    max_attempts: int = 5
    base_delay_s: float = 0.5
    max_delay_s: float = 30.0

    def delays(self):
        d = self.base_delay_s
        for _ in range(self.max_attempts):
            yield min(d, self.max_delay_s)
            d *= 2


VALID_TABLET_TYPES = ("MASTER", "REPLICA", "RDONLY")


@dataclass
class VStreamConfig:
    vtgate_host: str = "localhost:15991"
    keyspace: str = ""
    shards: list[str] = field(default_factory=list)
    snapshot_mode: str = "initial"  # initial | never
    explicit_vgtid: Optional[str] = None
    # tablet type served by the stream (VitessTabletType; the request's
    # topodata tablet_type — VitessReplicationConnection.java:336-338)
    tablet_type: str = "MASTER"
    # ASCII metadata attached to every VStream call
    # (VitessReplicationConnection.java:116-126)
    grpc_headers: dict[str, str] = field(default_factory=dict)
    table_include_list: list[str] = field(default_factory=list)
    snapshot_mode_tables: list[str] = field(default_factory=list)  # F3
    stop_on_reshard: bool = False
    exclude_keyspace_from_table_name: bool = False
    keyspace_heartbeats: bool = False
    max_inbound_message_bytes: int = 4 * 1024 * 1024  # VitessConnectorConfig.java:349-356
    keepalive_interval_ms: Optional[int] = None  # disabled by default (:332-339)
    # channel-level LB policy, e.g. 'pick_first' / 'round_robin'
    # (VitessConnectorConfig.java:361-368 GRPC_DEFAULT_LOAD_BALANCING_POLICY;
    # default = gRPC's own default, so None means "don't set the option")
    load_balancing_policy: Optional[str] = None
    heartbeat_interval_s: int = 0

    def __post_init__(self) -> None:
        if self.tablet_type.upper() not in VALID_TABLET_TYPES:
            raise ValueError(
                f"tablet_type must be one of {VALID_TABLET_TYPES}, "
                f"got {self.tablet_type!r}"
            )

    def resolve_start_vgtid(self) -> Vgtid:
        """O3: explicit vgtid > snapshot.mode default (initial → empty gtid ⇒
        VStream Copy; never → current). VitessReplicationConnection.java:401-480."""
        if self.explicit_vgtid:
            v = Vgtid.from_json(self.explicit_vgtid)
            if self.shards and sorted(v.shards) != sorted(self.shards):
                raise ValueError(
                    f"explicit vgtid shards {v.shards} do not match configured {self.shards}"
                )
            return v
        return default_vgtid(self.keyspace, self.shards, self.snapshot_mode)


def assign_shards_to_tasks(shards: list[str], max_tasks: int) -> list[list[str]]:
    """O4: sorted shards round-robined over min(max_tasks, #shards) tasks
    (VitessConnector.java:87-156). In Spark each group becomes one input
    partition; with max_tasks >= #shards it's one shard per partition."""
    n = min(max_tasks, len(shards)) or 1
    groups: list[list[str]] = [[] for _ in range(n)]
    for i, s in enumerate(sorted(shards)):
        groups[i % n].append(s)
    return [g for g in groups if g]


class VStreamConnection:
    """Owns the gRPC channel + VStream call for one shard group.

    Executor-side; consumed by the streaming source's ``read``. Without grpc
    installed, constructing is fine but ``connect`` raises with guidance.
    """

    def __init__(self, config: VStreamConfig, retry: RetryPolicy | None = None) -> None:
        self.config = config
        self.retry = retry or RetryPolicy()

    def connect(self):  # pragma: no cover - needs live Vitess
        """Build the transport-compatible channel (``vstream(request)`` shape).

        Serialization is the stdlib protobuf codec (sources/proto.py) handed
        to ``unary_stream`` — no generated stubs; channel tuning (max inbound
        message, keepalive — VitessReplicationConnection.java:374-385) lives
        in grpc_adapter.channel_options. Raises with guidance when grpcio is
        absent."""
        from .grpc_adapter import GrpcVStreamChannel

        return GrpcVStreamChannel(self.config)

    def stream_with_retry(self, consume_fn):  # pragma: no cover - needs live Vitess
        """E1/E2: reconnect from the last committed position on retriable
        errors; first error wins otherwise."""
        last_exc: Optional[Exception] = None
        for delay in self.retry.delays():
            try:
                return consume_fn(self.connect())
            except Exception as exc:
                if not is_retriable(exc):
                    raise
                last_exc = exc
                time.sleep(delay)
        raise last_exc  # type: ignore[misc]


@dataclass(frozen=True)
class VStreamFlags:
    """The VStreamFlags the reference sets on every VStream request
    (VitessReplicationConnection.java:302-314). ``tables_to_copy`` is the F3
    ``snapshot.mode.tables`` selection — computed by the driver from live
    metadata, empty when the option is unset (meaning: copy everything the
    snapshot mode implies, not a partial copy)."""

    stop_on_reshard: bool = False
    exclude_keyspace_from_table_name: bool = False
    heartbeat_interval_s: int = 0
    stream_keyspace_heartbeats: bool = False
    tables_to_copy: tuple[str, ...] = ()


def build_flags(
    config: VStreamConfig, metadata: "VitessMetadata | None" = None
) -> VStreamFlags:
    """Compile config → request flags; resolves F3's partial-snapshot table
    list against table discovery (VitessReplicationConnection.java:308-312)."""
    tables_to_copy: tuple[str, ...] = ()
    if config.snapshot_mode_tables:
        from ..filters import SnapshotTableFilter

        all_tables = metadata.get_tables() if metadata is not None else []
        stf = SnapshotTableFilter(list(config.snapshot_mode_tables))
        tables_to_copy = tuple(stf.tables_to_copy(config.keyspace, all_tables))
    return VStreamFlags(
        stop_on_reshard=config.stop_on_reshard,
        exclude_keyspace_from_table_name=config.exclude_keyspace_from_table_name,
        heartbeat_interval_s=config.heartbeat_interval_s,
        stream_keyspace_heartbeats=config.keyspace_heartbeats,
        tables_to_copy=tables_to_copy,
    )


def plan_shard_partitions(
    config: VStreamConfig,
    metadata: "VitessMetadata | None" = None,
    *,
    max_tasks: int = 0,
) -> list[list[str]]:
    """Control-plane partition planning: discover shards (S4), prune empty
    ones (F5), round-robin into input partitions (O4).

    Shard precedence mirrors the reference (VitessReplicationConnection.java:437-480):
    shards named in a stored/explicit VGTID win (reshard safety, O7 — the
    stored offset's shards may differ from the database's current shards),
    then configured shards, then live discovery via the metadata client.
    ``max_tasks<=0`` means one shard per partition.
    """
    if config.explicit_vgtid:
        shards = Vgtid.from_json(config.explicit_vgtid).shards
    elif config.shards:
        shards = list(config.shards)
    elif metadata is not None:
        shards = metadata.get_shards()
    else:
        raise ValueError("no shards configured and no metadata client provided")
    if not shards:
        raise ValueError(f"no shards found for keyspace {config.keyspace!r}")
    return assign_shards_to_tasks(shards, max_tasks if max_tasks > 0 else len(shards))
