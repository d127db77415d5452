"""Connector registry: one declarative entry point for every source.

Reference parity: each importer builds ``spark.read.format(<fmt>)``,
routes prefix-namespaced extra options to the reader, and loads
(A3-A11). This registry generalizes that shape: ``read_source(spark,
kind, options)``. Network connectors (jdbc/mongo/es) forward options to
the corresponding Spark data source; their connector jars aren't in this
container, so tests exercise them through local stand-ins while the
option routing/validation logic is fully covered.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .excel import read_excel

# JDBC dialect whitelist (HoodieJDBCImporter.scala:140-152).
JDBC_DIALECTS = (
    "mysql",
    "postgresql",
    "db2",
    "sqlserver",
    "oracle",
    "teradata",
    "h2",
    "derby",
    "dm",
)


def validate_jdbc_url(url: str) -> str:
    """jdbc:<dialect>:... with the reference's dialect whitelist."""
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a jdbc url: {url}")
    dialect = url.split(":", 2)[1].lower()
    if dialect not in JDBC_DIALECTS:
        raise ValueError(
            f"unsupported jdbc dialect '{dialect}' (supported: {JDBC_DIALECTS})"
        )
    return dialect


def read_jdbc(
    spark: SparkSession, options: dict[str, str]
) -> DataFrame:
    """Spark JDBC scan (A4-A6): dialect validation, dbtable/query
    mutual exclusivity, partitioned-read + pushdown options forwarded."""
    url = options.get("url") or ""
    validate_jdbc_url(url)
    if bool(options.get("dbtable")) == bool(options.get("query")):
        raise ValueError("exactly one of dbtable/query must be set")
    return spark.read.format("jdbc").options(**options).load()


def read_mongo(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Mongo scan (A7-A8): credential splicing into the URI
    (HoodieMongoBatch.scala:101-111) + option forwarding."""
    opts = dict(options)
    uri = opts.get("uri", "")
    user, password = opts.pop("username", None), opts.pop("password", None)
    if user and password and "://" in uri and "@" not in uri:
        scheme, rest = uri.split("://", 1)
        opts["uri"] = f"{scheme}://{user}:{password}@{rest}"
    return spark.read.format("mongodb").options(**opts).load()


def read_es(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Elasticsearch scan (A9-A10): es.* option family forwarded
    (query DSL pushdown, array includes, field excludes, SSL/auth).

    Guards the documented ES-vs-Spark case-collision failure
    (docs/document/02.Elasticsearch Ingestion.md:95-131): ES mappings are
    case-sensitive (``outFlag`` and ``outflag`` coexist) while Spark's
    analyzer is case-insensitive by default, so such an index loads into
    a frame whose first downstream analysis throws an opaque
    ``Found duplicate column(s)``. Detect it at the source and raise with
    the reference's remediation: exclude one side via
    ``es.read.field.exclude``."""
    # With the real elasticsearch-hadoop connector the duplicate-column
    # AnalysisException can be thrown during load()/schema resolution
    # itself — wrap it so the friendly remediation is reachable exactly
    # in the production scenario it targets, not only in the post-load
    # column sweep below (which catches connectors that defer analysis).
    try:
        df = spark.read.format("es").options(**options).load()
        columns = df.columns
    except Exception as e:
        msg = str(e)
        if "duplicate column" in msg.lower():
            raise ValueError(
                "ES mapping has case-colliding fields the Spark analyzer "
                f"cannot distinguish ({msg.splitlines()[0]}). Exclude the "
                "unused side with es.read.field.exclude=<field> (ES fields "
                "are case-sensitive; Spark columns are not)."
            ) from e
        raise
    seen: dict[str, str] = {}
    collisions: list[tuple[str, str]] = []
    for c in columns:
        low = c.lower()
        if low in seen and seen[low] != c:
            collisions.append((seen[low], c))
        seen.setdefault(low, c)
    if collisions:
        pairs = ", ".join(f"{a!r}/{b!r}" for a, b in collisions)
        raise ValueError(
            "ES mapping has case-colliding fields the Spark analyzer "
            f"cannot distinguish: {pairs}. Exclude the unused side with "
            "es.read.field.exclude=<field> (ES fields are case-sensitive; "
            "Spark columns are not)."
        )
    return df


def _file_reader(fmt: str):
    def read(spark: SparkSession, options: dict[str, str]) -> DataFrame:
        opts = dict(options)
        path = opts.pop("path")
        # 'schema' is a DDL string, not a reader option: route it through
        # .schema() so the declared schema actually applies (schema-less
        # semi-structured reads would otherwise silently fall back to an
        # inference pass — a full extra scan at 100 TB)
        ddl = opts.pop("schema", None)
        reader = spark.read.format(fmt).options(**opts)
        if ddl:
            reader = reader.schema(ddl)
        return reader.load(path)

    return read


def _excel_reader(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    opts = dict(options)
    path = opts.pop("path")
    return read_excel(spark, path, opts)


SOURCES: dict[str, Callable[[SparkSession, dict[str, str]], DataFrame]] = {
    "excel": _excel_reader,
    "csv": _file_reader("csv"),
    "json": _file_reader("json"),
    "parquet": _file_reader("parquet"),
    "orc": _file_reader("orc"),
    "xml": _file_reader("xml"),
    "jdbc": read_jdbc,
    "mongo": read_mongo,
    "es": read_es,
}


def read_source(
    spark: SparkSession, kind: str, options: dict[str, str]
) -> DataFrame:
    if kind not in SOURCES:
        raise ValueError(f"unknown source '{kind}' (have: {sorted(SOURCES)})")
    return SOURCES[kind](spark, options)
