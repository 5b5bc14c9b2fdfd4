"""Streaming sources: VStream gRPC (live) and file replay (tests/bounded).

SURVEY.md §2.1 S1-S4 + §2.4 offset protocol. Both sources share the
transaction-reassembly buffer and emit the raw VEvent frame
(``decode.RAW_EVENT_SCHEMA``); offsets are VGTID-style JSON documents
committed through the Spark streaming checkpoint.
"""

from .buffer import TransactionBuffer

__all__ = ["TransactionBuffer"]
