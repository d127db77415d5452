"""Batch importer pipeline — the shape shared by all four reference
"boxer" apps (Excel/JDBC/Mongo/ES): validate → read (connector + routed
extra options) → [flatten] → [SQL transform] → keyed Hudi write, with a
``--debug`` console short-circuit (SURVEY §3.1).

One parameterized implementation replaces four copy-pasted mains; each
CLI below is a thin argparse wrapper choosing the source kind, mirroring
the reference's Config classes (``HoodieExcelImporter.scala:125-167``).
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from ..config import extra_options, resolve_props
from ..lake import HudiTable
from ..operators.flatten import flatten
from ..operators.transform import maybe_transform
from ..session import build_spark_session
from ..sources.registry import read_source

WRITE_OPERATION_KEY = "hoodie.datasource.write.operation"

# Sources whose documents are nested → auto-flatten before transform,
# as Mongo/ES importers do (HoodieMongoBatch.scala:123-126).
FLATTEN_SOURCES = ("mongo", "es", "json")


def run_import(
    spark: SparkSession,
    source_kind: str,
    source_options: dict[str, str],
    props: dict[str, str],
    debug: bool = False,
    auto_flatten: bool | None = None,
) -> DataFrame:
    """Execute the import; returns the final DataFrame (written unless
    debug). The empty-source guard aborts like HoodieMongoBatch
    .scala:134-136."""
    reader_opts = {**source_options, **extra_options(props, source_kind)}
    df = read_source(spark, source_kind, reader_opts)
    df.printSchema()
    if len(df.head(1)) == 0:
        raise ValueError(f"source {source_kind} produced no rows — aborting")
    if auto_flatten if auto_flatten is not None else source_kind in FLATTEN_SOURCES:
        df = flatten(df)
    df = maybe_transform(spark, df, props)
    if debug:
        df.show(50, truncate=False)
        return df
    table = HudiTable.from_props(props)
    table.write(df, props.get(WRITE_OPERATION_KEY, "upsert"))
    return df


def _base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--props", help="properties file (local path)")
    p.add_argument(
        "--hoodie-conf",
        action="append",
        default=[],
        help="k=v overrides (repeatable); wins over --props",
    )
    p.add_argument("--debug", action="store_true", help="console sink, no write")
    p.add_argument("--app-name", default=None)
    return p


def _main(source_kind: str, source_opt_keys: dict[str, str], argv=None) -> None:
    p = _base_parser(f"hudi {source_kind} importer")
    for flag, dest in source_opt_keys.items():
        p.add_argument(flag, dest=dest)
    args = p.parse_args(argv)
    props = resolve_props(props_file=args.props, cli_overrides=args.hoodie_conf)
    source_options = {
        dest: getattr(args, dest)
        for dest in source_opt_keys.values()
        if getattr(args, dest) is not None
    }
    spark = build_spark_session(args.app_name or f"hudi-{source_kind}-importer")
    run_import(spark, source_kind, source_options, props, debug=args.debug)


def excel_main(argv=None) -> None:
    """HoodieExcelImporter equivalent."""
    _main("excel", {"--resource": "path"}, argv)


def jdbc_main(argv=None) -> None:
    """HoodieJDBCImporter equivalent (connection opts come from props /
    extra options namespace)."""
    _main("jdbc", {"--url": "url", "--dbtable": "dbtable", "--query": "query"}, argv)


def mongo_main(argv=None) -> None:
    """HoodieMongoBatch equivalent."""
    _main(
        "mongo",
        {"--uri": "uri", "--database": "database", "--collection": "collection"},
        argv,
    )


def es_main(argv=None) -> None:
    """HoodieEsBatch equivalent."""
    _main("es", {"--resource": "es.resource", "--nodes": "es.nodes"}, argv)


_DISPATCH = {
    "excel": excel_main,
    "jdbc": jdbc_main,
    "mongo": mongo_main,
    "es": es_main,
}


def main(argv=None) -> None:
    """``python -m ...pipelines.importer <source> [opts]`` — the single
    entry point replacing the reference's four per-source binaries; the
    first positional selects the source, everything after is that
    importer's own CLI."""
    import sys as _sys

    argv = list(_sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: importer {excel|jdbc|mongo|es} [--props F] "
            "[--hoodie-conf K=V]... [--debug] [source opts]"
        )
        raise SystemExit(0 if argv else 2)
    kind, rest = argv[0], argv[1:]
    if kind not in _DISPATCH:
        raise SystemExit(
            f"unknown source {kind!r}: expected one of {sorted(_DISPATCH)}"
        )
    _DISPATCH[kind](rest)


if __name__ == "__main__":
    main()
