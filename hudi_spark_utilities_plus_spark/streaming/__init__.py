"""Structured Streaming layer: CDC source emulation, multi-table demux
sink, and event-time window extensions."""

from .cdc import CDC_SCHEMA, apply_cdc_batch, compact_batch, read_cdc_stream
from .demux import (
    demux_batch,
    resolve_table_config,
    start_binlog_streamer,
    start_console_debug,
)
from .windows import (
    deduped_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "deduped_stream",
    "CDC_SCHEMA",
    "read_cdc_stream",
    "compact_batch",
    "apply_cdc_batch",
    "resolve_table_config",
    "demux_batch",
    "start_binlog_streamer",
    "start_console_debug",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
]
