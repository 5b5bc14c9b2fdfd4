"""gRPC channel adapter: ``vtgateservice.Vitess/VStream`` over real grpcio.

Bridges a ``grpc.Channel`` to the channel shape ``VStreamTransport`` drives
(``vstream(request) -> Iterator[VStreamResponse]``). Serialization is the
pure-stdlib codec in ``sources/proto.py`` handed to ``unary_stream`` as the
``request_serializer`` / ``response_deserializer`` callables, so no generated
pb2 stubs are required — the adapter works against any object with the
``grpc.Channel.unary_stream`` signature, which is also how the tests drive
the full byte path without grpcio (an in-process fake that round-trips the
serialized frames).

Channel tuning mirrors the reference (VitessReplicationConnection.java:374-385):
max inbound message size (VitessConnectorConfig.java:349-356) and optional
keepalive (:332-339).
"""

from __future__ import annotations

from typing import Iterator, Optional

from .vstream import VStreamConfig
from .wire import VStreamRequest, VStreamResponse

try:  # pragma: no cover - grpcio not present in this environment
    import grpc  # type: ignore

    HAVE_GRPC = True
except ImportError:
    HAVE_GRPC = False

VSTREAM_METHOD = "/vtgateservice.Vitess/VStream"


def channel_options(config: VStreamConfig) -> list[tuple[str, object]]:
    """The reference's channel tuning as grpc channel options."""
    opts: list[tuple[str, object]] = [
        ("grpc.max_receive_message_length", config.max_inbound_message_bytes)
    ]
    if config.keepalive_interval_ms:
        opts.append(("grpc.keepalive_time_ms", config.keepalive_interval_ms))
    if config.load_balancing_policy:
        # defaultLoadBalancingPolicy(...) in the reference
        # (VitessReplicationConnection.java:376); grpcio spells it as the
        # lb_policy_name channel arg
        opts.append(("grpc.lb_policy_name", config.load_balancing_policy))
    return opts


class GrpcVStreamChannel:
    """Channel-shaped VStream client over a (real or injected) gRPC channel.

    ``grpc_channel`` may be any object exposing
    ``unary_stream(method, request_serializer, response_deserializer)`` —
    grpcio's Channel in production, a byte-level fake in tests. When omitted,
    a real ``grpc.insecure_channel`` is built from the config (raises a
    guidance error without grpcio installed).
    """

    def __init__(
        self,
        config: VStreamConfig,
        *,
        grpc_channel=None,
    ) -> None:
        from .proto import decode_vstream_response, encode_vstream_request

        self.config = config
        if grpc_channel is None:  # pragma: no cover - needs grpcio
            if not HAVE_GRPC:
                raise NotImplementedError(
                    "grpcio is required for the live VStream channel; inject a "
                    "channel-shaped object or use the 'vitess-replay' source "
                    "for recorded streams"
                )
            grpc_channel = grpc.insecure_channel(
                config.vtgate_host, options=channel_options(config)
            )
        self._grpc_channel = grpc_channel
        self._call = grpc_channel.unary_stream(
            VSTREAM_METHOD,
            request_serializer=encode_vstream_request,
            response_deserializer=decode_vstream_response,
        )

    def vstream(self, request: VStreamRequest) -> Iterator[VStreamResponse]:
        """One VStream call; per-call ASCII metadata from the request
        (attached via an interceptor in the reference,
        VitessReplicationConnection.java:116-126)."""
        metadata = list(request.headers) or None
        yield from self._call(request, metadata=metadata)

    def close(self) -> None:
        close = getattr(self._grpc_channel, "close", None)
        if close is not None:
            close()


def grpc_channel_factory(options: dict) -> GrpcVStreamChannel:
    """``channelFactory`` target for the live source
    (``debezium_connector_vitess_spark.sources.grpc_adapter:grpc_channel_factory``):
    builds the real gRPC channel from the source options."""
    config = VStreamConfig(
        vtgate_host=options.get("vtgatehost", "localhost:15991"),
        keyspace=options.get("keyspace", ""),
        shards=[s for s in (options.get("shards") or "").split(",") if s],
        snapshot_mode=options.get("snapshotmode", "never"),
        tablet_type=options.get("tablettype", "MASTER"),
        max_inbound_message_bytes=int(
            options.get("maxinboundmessagebytes", 4 * 1024 * 1024)
        ),
        keepalive_interval_ms=(
            int(options["keepaliveintervalms"])
            if options.get("keepaliveintervalms")
            else None
        ),
        load_balancing_policy=options.get("loadbalancingpolicy"),
    )
    return GrpcVStreamChannel(config)
