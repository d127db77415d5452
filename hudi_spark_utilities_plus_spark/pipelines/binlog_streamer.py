"""Streaming CDC pipeline CLI — HoodieBinlogDeltaStreamer equivalent.

Reference shape (``HoodieBinlogDeltaStreamer.scala:65-102, 221-245``):
readStream(binlog source w/ db+table patterns + start position) →
writeStream("binlog-hudi" demux, append, processing-time trigger default
60 s, mandatory checkpoint) → awaitTermination. The source here is the
file-based CDC emulation (streaming.cdc); on a real deployment the same
pipeline binds to a Kafka/Debezium topic with identical envelope.
"""

from __future__ import annotations

import argparse

from ..config import resolve_props
from ..session import build_spark_session
from ..streaming.cdc import read_cdc_stream
from ..streaming.demux import (
    BINLOG_PREFIX_KEY,
    DEFAULT_TRIGGER_SECONDS,
    start_binlog_streamer,
    start_console_debug,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="streaming CDC → multi-table lake demux")
    p.add_argument("--source-path", required=True, help="CDC event stream dir")
    p.add_argument("--database-name-pattern", default=".*")
    p.add_argument("--table-name-pattern", default=".*")
    # binlog start position (reference CLI: HoodieBinlogDeltaStreamer
    # .scala:206-219; defaults mirror it — offset 4 = first real event)
    p.add_argument("--binlog-name-prefix", default="mysql-bin")
    p.add_argument("--binlog-index", default=None)
    p.add_argument("--binlog-offset", default="4")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--trigger-time", type=int, default=DEFAULT_TRIGGER_SECONDS)
    p.add_argument("--props", help="per-table ${db}.${table}.hoodie.* config")
    p.add_argument("--hoodie-conf", action="append", default=[])
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)

    props = resolve_props(props_file=args.props, cli_overrides=args.hoodie_conf)
    # forward the source's binlog series name to the demux sink so
    # compact_batch's position tie-break parses THIS series' file names
    # (an explicit props/CLI value for the key still wins)
    props.setdefault(BINLOG_PREFIX_KEY, args.binlog_name_prefix)
    spark = build_spark_session("hudi-binlog-delta-streamer")
    stream = read_cdc_stream(
        spark,
        args.source_path,
        args.database_name_pattern,
        args.table_name_pattern,
        binlog_name_prefix=args.binlog_name_prefix,
        binlog_index=args.binlog_index,
        binlog_file_offset=args.binlog_offset,
    )
    if args.debug:
        query = start_console_debug(stream)
    else:
        query = start_binlog_streamer(
            spark, stream, props, args.checkpoint, args.trigger_time
        )
    query.awaitTermination()


if __name__ == "__main__":
    main()
