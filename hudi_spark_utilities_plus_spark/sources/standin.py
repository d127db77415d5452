"""Local stand-in Spark data sources for the network connectors.

The reference drives ``format("mongo")`` (HoodieMongoBatch.scala:113-120)
and ``format("es")`` (HoodieEsBatch.scala:102-109) against live
clusters through connector jars. Those jars don't exist in this
container, so ``registry.read_mongo`` / ``registry.read_es`` could never
execute end to end — the option-splicing logic was pytest-covered but no
test ever went through ``spark.read.format("mongodb")``.

These stand-ins close that gap with PySpark 4's Python Data Source API:
real sources registered under the CONNECTOR'S format names, serving
JSON-lines data staged locally. The full plumbing — format resolution,
option forwarding (including the credential-spliced ``uri`` and the
``es.*`` family), schema declaration, distributed read — is the real
Spark path; only the network hop is simulated. They are NOT registered
by default: call ``register_standin_sources(spark)`` explicitly (tests
and the ``mongo_scan``/``es_scan`` driver ids do).

Options understood by both:

- ``standin.path``   — JSON-lines file to serve (one object per line).
- ``standin.schema`` — DDL schema string for the served rows. When
  ABSENT, the schema is inferred by SAMPLING, honoring the Mongo
  connector's ``samplePoolSize`` option (default 10000 — the reference
  documents it at docs/document/01.MongoDB Ingestion.md:50): only the
  first ``samplePoolSize`` documents are analyzed, so a field that
  first appears later is missing from the schema — the real
  connector's documented inference hazard, reproduced so it can be
  tested.
- ``standin.echo``   — optional path; when set, the reader dumps the
  exact options map it received there (driver-side, at plan time) so
  tests can assert what arrived through the format boundary.

Everything else (``uri``, ``es.resource``, ``es.query``, ...) is
accepted and recorded — exactly what a forwarding test needs.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import StructType


class _StandInReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]) -> None:
        self._schema = schema
        self._options = dict(options)
        echo = self._options.get("standin.echo")
        if echo:  # reader() runs driver-side at plan time
            with open(echo, "w") as fh:
                json.dump(self._options, fh)

    def read(self, partition):
        path = self._options.get("standin.path")
        if not path:
            return
        names = [f.name for f in self._schema.fields]
        types = [f.dataType.simpleString() for f in self._schema.fields]

        def _coerce(v, t):
            # sampled-schema widening can declare STRING over mixed-type
            # fields; serve values in the declared type like a connector
            if v is None:
                return None
            if t == "string" and not isinstance(v, str):
                return json.dumps(v) if isinstance(v, (dict, list)) else str(v)
            if t == "double" and isinstance(v, int):
                return float(v)
            return v

        with open(path) as fh:
            for line in fh:
                if line.strip():
                    obj = json.loads(line)
                    yield tuple(
                        _coerce(obj.get(n), t) for n, t in zip(names, types)
                    )


def _infer_sampled_schema(path: str, pool: int) -> str:
    """Schema-by-sampling over the first ``pool`` documents, mirroring
    the Mongo connector's samplePoolSize semantics: union of fields seen
    in the pool; long/double/boolean/string leaf types, numeric widening
    long→double, any other conflict widening to string. Fields first
    appearing after the pool are (by contract) absent."""
    fields: dict[str, str] = {}
    seen = 0
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            if seen >= pool:
                break
            seen += 1
            for k, v in json.loads(line).items():
                if isinstance(v, bool):
                    t = "BOOLEAN"
                elif isinstance(v, int):
                    t = "BIGINT"
                elif isinstance(v, float):
                    t = "DOUBLE"
                elif v is None:
                    continue  # type unknown; another doc may tell
                else:
                    t = "STRING"
                prev = fields.get(k)
                if prev is None or prev == t:
                    fields[k] = t
                elif {prev, t} == {"BIGINT", "DOUBLE"}:
                    fields[k] = "DOUBLE"
                else:
                    fields[k] = "STRING"
    if not fields:
        return "value STRING"
    # backtick-quote: Mongo field names legally contain '-', '.', spaces
    # (and backticks, escaped by doubling per Spark's DDL rules)
    return ", ".join(
        "`{}` {}".format(k.replace("`", "``"), t) for k, t in fields.items()
    )


class _StandInSource(DataSource):
    """Shared body; subclasses pin the format name."""

    def schema(self):  # DDL string — Spark parses it
        declared = self.options.get("standin.schema")
        if declared:
            return declared
        path = self.options.get("standin.path")
        if path:
            pool = int(self.options.get("samplePoolSize", "10000"))
            return _infer_sampled_schema(path, pool)
        return "value STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _StandInReader(schema, self.options)


class MongoStandInSource(_StandInSource):
    """Serves ``format("mongodb")`` — the Spark Mongo connector's name."""

    @classmethod
    def name(cls) -> str:
        return "mongodb"


class EsStandInSource(_StandInSource):
    """Serves ``format("es")`` — the elasticsearch-hadoop short name."""

    @classmethod
    def name(cls) -> str:
        return "es"


def register_standin_sources(spark) -> None:
    """Idempotently register both stand-ins on the session."""
    spark.dataSource.register(MongoStandInSource)
    spark.dataSource.register(EsStandInSource)
