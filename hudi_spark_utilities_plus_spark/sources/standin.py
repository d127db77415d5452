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
- ``standin.schema`` — DDL schema string for the served rows.
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
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    obj = json.loads(line)
                    yield tuple(obj.get(n) for n in names)


class _StandInSource(DataSource):
    """Shared body; subclasses pin the format name."""

    def schema(self):  # DDL string — Spark parses it
        return self.options.get("standin.schema", "value STRING")

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
