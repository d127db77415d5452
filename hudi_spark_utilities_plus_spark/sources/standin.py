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

The Mongo stand-in APPLIES the connector's ``pipeline`` option
(A8 `$match` pushdown — see ``_compile_mongo_pipeline``); everything
else (``uri``, ``es.resource``, ``es.query``, ...) is accepted and
recorded — exactly what a forwarding test needs.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


# ---------------------------------------------------------------------------
# Mongo $match pipeline (A8): applied server-side by the stand-in
# ---------------------------------------------------------------------------

# The reference forwards ``pipeline=[{"$match": ...}]`` to the Mongo
# connector, which executes it SERVER-side — rows failing the $match
# never cross the wire (docs/document/01.MongoDB Ingestion.md:186-205,
# which also documents that "the pipeline can only execute conditional
# queries" and the MongoCommandException a non-conditional stage
# raises). The stand-in reproduces both halves: the predicate runs
# inside the reader (before any row reaches Spark — no Filter node in
# the plan), and a non-$match stage fails at PLAN time with the
# documented "Unrecognized pipeline stage name" wording.

_MISSING = object()  # "field absent" — distinct from an explicit null


def _mongo_get(doc, path: str):
    """Dotted-path field access (``a.b`` traverses nested documents)."""
    cur = doc
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return _MISSING
    return cur


def _scalar_eq(a, b) -> bool:
    """BSON-bracketed equality: bools only equal bools (Python's
    ``True == 1`` must not leak through), numerics compare cross-width,
    everything else same-type."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    return type(a) is type(b) and a == b


def _mongo_eq(val, lit) -> bool:
    """Mongo equality: ``null`` matches absent OR null; a scalar literal
    against an array field matches by CONTAINMENT (``{tags: "x"}``
    matches ``tags: ["x","y"]`` — Mongo's documented array semantics)."""
    if lit is None:
        return val is None or val is _MISSING
    if val is _MISSING or val is None:
        return False
    if isinstance(val, list) and not isinstance(lit, list):
        return any(_scalar_eq(v, lit) for v in val)
    if isinstance(val, list) and isinstance(lit, list):
        return len(val) == len(lit) and all(
            _mongo_eq(v, x) for v, x in zip(val, lit)
        )
    return _scalar_eq(val, lit)


def _mongo_ord(val, arg, op: str) -> bool:
    """$gt/$gte/$lt/$lte with Mongo's type bracketing: values of
    different BSON brackets (or null/absent) never satisfy an ordered
    comparison."""
    if val is _MISSING or val is None or arg is None:
        return False
    if isinstance(val, bool) or isinstance(arg, bool):
        if not (isinstance(val, bool) and isinstance(arg, bool)):
            return False
    elif isinstance(val, (int, float)) and isinstance(arg, (int, float)):
        pass
    elif isinstance(val, str) and isinstance(arg, str):
        pass
    else:
        return False
    if op == "$gt":
        return val > arg
    if op == "$gte":
        return val >= arg
    if op == "$lt":
        return val < arg
    return val <= arg  # $lte


def _match_value(val, cond) -> bool:
    """One field condition: an operator document or a literal."""
    if isinstance(cond, dict) and any(k.startswith("$") for k in cond):
        for op, arg in cond.items():
            if op == "$eq":
                ok = _mongo_eq(val, arg)
            elif op == "$ne":
                ok = not _mongo_eq(val, arg)
            elif op in ("$gt", "$gte", "$lt", "$lte"):
                ok = _mongo_ord(val, arg, op)
            elif op == "$in":
                ok = any(_mongo_eq(val, a) for a in arg)
            elif op == "$nin":
                ok = not any(_mongo_eq(val, a) for a in arg)
            elif op == "$exists":
                ok = (val is not _MISSING) == bool(arg)
            elif op == "$not":
                ok = not _match_value(val, arg)
            else:
                raise ValueError(
                    f"unsupported $match operator '{op}' (stand-in "
                    "subset: $eq $ne $gt $gte $lt $lte $in $nin "
                    "$exists $not and $and/$or/$nor)"
                )
            if not ok:
                return False
        return True
    return _mongo_eq(val, cond)


def _match_doc(doc: dict, query: dict) -> bool:
    """Standard MongoDB query document: implicit AND of field
    conditions plus $and/$or/$nor combinators."""
    for k, cond in query.items():
        if k == "$and":
            if not all(_match_doc(doc, q) for q in cond):
                return False
        elif k == "$or":
            if not any(_match_doc(doc, q) for q in cond):
                return False
        elif k == "$nor":
            if any(_match_doc(doc, q) for q in cond):
                return False
        elif k.startswith("$"):
            raise ValueError(
                f"unsupported $match operator '{k}' (stand-in subset: "
                "$and/$or/$nor at document level)"
            )
        elif not _match_value(_mongo_get(doc, k), cond):
            return False
    return True


def _compile_mongo_pipeline(raw: str):
    """Parse the ``pipeline`` option into a document predicate, or None
    for an empty pipeline. Multiple ``$match`` stages AND together; any
    OTHER stage name raises with the server's documented wording
    ("Unrecognized pipeline stage name", MongoCommandException 40324 in
    the reference's own troubleshooting section) — the connector
    contract is conditional stages only. Raised driver-side at plan
    time, like the real connector's aggregate() round trip."""
    stages = json.loads(raw)
    if isinstance(stages, dict):
        stages = [stages]
    queries = []
    for st in stages:
        if not isinstance(st, dict) or len(st) != 1:
            raise ValueError(
                f"malformed pipeline stage {st!r}: expected a "
                'single-key document like {"$match": {...}}'
            )
        ((name, query),) = st.items()
        if name != "$match":
            raise ValueError(
                f"Unrecognized pipeline stage name: '{name}' — the "
                "pipeline can only execute conditional ($match) "
                "queries (docs/document/01.MongoDB "
                "Ingestion.md:186-205)"
            )
        if not isinstance(query, dict):
            raise ValueError(f"$match takes a query document, got {query!r}")
        queries.append(query)
    if not queries:
        return None

    def pred(doc: dict) -> bool:
        return all(_match_doc(doc, q) for q in queries)

    return pred


class _StandInReader(DataSourceReader):
    def __init__(
        self, schema: StructType, options: dict[str, str], pred=None
    ) -> None:
        self._schema = schema
        self._options = dict(options)
        # the $match predicate (Mongo only) — compiled DRIVER-side at
        # plan time so a malformed pipeline fails the query, not a task
        self._pred = pred
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
                    # "server-side" $match: a non-matching document
                    # never leaves the reader — Spark's plan carries no
                    # Filter node (test-pinned), exactly the real
                    # connector's pushdown boundary
                    if self._pred is not None and not self._pred(obj):
                        continue
                    yield tuple(
                        _coerce(obj.get(n), t) for n, t in zip(names, types)
                    )


def _infer_sampled_schema(path: str, pool: int, pred=None) -> str:
    """Schema-by-sampling over the first ``pool`` documents, mirroring
    the Mongo connector's samplePoolSize semantics: union of fields seen
    in the pool; long/double/boolean/string leaf types, numeric widening
    long→double, any other conflict widening to string. Fields first
    appearing after the pool are (by contract) absent. ``pred`` is the
    $match pipeline predicate: the real connector infers from the
    AGGREGATED (filtered) stream, so only matching documents count
    toward the pool."""
    fields: dict[str, str] = {}
    seen = 0
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            if seen >= pool:
                break
            obj = json.loads(line)
            if pred is not None and not pred(obj):
                continue
            seen += 1
            for k, v in obj.items():
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

    def _pipeline_pred(self):
        """The compiled ``pipeline`` $match predicate — Mongo only
        (the ES connector has no such option; its pushdown is the
        ``es.query`` DSL, recorded not applied)."""
        return None

    def schema(self):  # DDL string — Spark parses it
        declared = self.options.get("standin.schema")
        if declared:
            return declared
        path = self.options.get("standin.path")
        if path:
            pool = int(self.options.get("samplePoolSize", "10000"))
            return _infer_sampled_schema(path, pool, self._pipeline_pred())
        return "value STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _StandInReader(schema, self.options, self._pipeline_pred())


class MongoStandInSource(_StandInSource):
    """Serves ``format("mongodb")`` — the Spark Mongo connector's name.
    Applies the ``pipeline`` option's $match stages inside the reader
    (A8 — the reference's server-side filter, docs/document/01.MongoDB
    Ingestion.md:186-205)."""

    @classmethod
    def name(cls) -> str:
        return "mongodb"

    def _pipeline_pred(self):
        raw = self.options.get("pipeline")
        return _compile_mongo_pipeline(raw) if raw else None


class EsStandInSource(_StandInSource):
    """Serves ``format("es")`` — the elasticsearch-hadoop short name."""

    @classmethod
    def name(cls) -> str:
        return "es"


def register_standin_sources(spark) -> None:
    """Idempotently register the stand-ins on the session.

    The classes are pickled BY VALUE (not by module reference): the
    data-source instance is cloudpickled to a fresh Python worker
    process, which inherits the driver's cwd but NOT its sys.path
    mutations — so a by-reference pickle only imports when the driver
    happens to run from the repo root. By-value serialization makes the
    format names resolve from any working directory (exactly how a real
    connector ships its classes in a jar rather than assuming the
    cluster has them on PYTHONPATH)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(MongoStandInSource)
    spark.dataSource.register(EsStandInSource)
    spark.dataSource.register(BinlogStandInSource)


# ---------------------------------------------------------------------------
# Streaming stand-in: format("mysql-binlog")
# ---------------------------------------------------------------------------

# The reference's CDC stream originates from
# ``spark.readStream.format("mysql-binlog")`` with the spark-binlog
# connector options (HoodieBinlogDeltaStreamer.scala:77-89: host/port/
# userName/password, databaseNamePattern, tableNamePattern — comma lists
# pre-rewritten to '|' — and the start position bingLogNamePrefix [the
# reference preserves spark-binlog's "bingLog" typo] / binlogIndex /
# binlogFileOffset). This stand-in registers a PySpark 4 STREAMING
# Python Data Source under that exact format name, serving CDC-envelope
# JSON-lines files staged under ``standin.path`` — so the full streaming
# path (format resolution, option forwarding, offset tracking,
# checkpointed replay via readBetweenOffsets) is the real Spark
# machinery; only the MySQL network hop is simulated.
#
# A SimpleDataSourceStreamReader reads driver-side — which matches the
# real topology: a MySQL binlog is ONE ordered byte stream tailed from a
# single connection (spark-binlog does exactly this), then distributed.
# Offsets count fully-consumed files of the sorted directory listing —
# files are immutable and append-only in the emulation, so
# readBetweenOffsets replays any committed batch deterministically.

# one authoritative envelope DDL (streaming/cdc.py) — the stand-in and
# the file-source emulation must agree on schema by construction
from ..streaming.cdc import CDC_SCHEMA as _BINLOG_SCHEMA  # noqa: E402


def _binlog_files(path: str) -> list[str]:
    """Fixture-dir listing, sorted by name. The emulated contract is a
    binlog directory: file names are MONOTONIC in arrival order
    (mysql-bin.000001, .000002, …), so sorted order == stream order. A
    file that lands with a name sorting BEFORE the high-water mark is
    outside the contract and will not be read (same as a real tailer)."""
    import os

    if not path or not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".json") or f.endswith(".jsonl")
    )


def _files_between(files: list[str], start: dict, end: dict | None) -> list[str]:
    """Offset model: ``{"last": <file name>}`` — the name high-water
    mark, exclusive at start, inclusive at end. Name-based (not a
    COUNT of files) so purging consumed binlogs from the front of the
    directory — MySQL ``PURGE BINARY LOGS``, a routine operation under
    a live tailer — cannot shift indices and silently skip unread
    files.

    The pre-r10 ``{"files": n}`` count format is RETIRED (its
    documented criterion was met: every commit rewrites the offset as
    ``{"last": …}``, so one post-upgrade micro-batch on an
    r10/r11-era build ages the count format out of any checkpoint; the
    transition behavior itself was pinned by the r11
    ``binlog_purge_recovery`` driver row before deletion). A count
    offset that still reaches here FAILS LOUDLY rather than resolving
    against the current listing — a silent fallthrough would replay
    the whole directory (duplicates), and a count slice under a purge
    can skip unread files. Recovery path for a genuinely ancient
    checkpoint: run one micro-batch on a pre-retirement build first."""
    import os

    for name, mark in (("start", start), ("end", end)):
        if mark is not None and "files" in mark:
            raise ValueError(
                f"unsupported binlog {name} offset {mark!r}: the "
                "pre-r10 count format was retired — restart from a "
                "checkpoint whose offsets carry a name mark "
                '({"last": ...}), produced by any post-upgrade '
                "micro-batch commit"
            )
    last = start.get("last", "")
    lo = [f for f in files if os.path.basename(f) > last]
    if end is None:
        return lo
    hi = end.get("last", "")
    return [f for f in lo if os.path.basename(f) <= hi]


def _end_offset(files: list[str], start: dict) -> dict:
    """The end offset after reading everything currently listed: the max
    of the newest name and the prior mark (never regresses, even if the
    newest files were purged between micro-batches)."""
    import os

    prior = start.get("last", "")
    newest = os.path.basename(files[-1]) if files else ""
    return {"last": max(prior, newest)}


class _BinlogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict[str, str]) -> None:
        import re

        self._schema = schema
        # Spark hands a CaseInsensitiveDict whose BACKING keys are
        # lowercased — a plain dict() copy silently breaks camelCase
        # lookups like "databaseNamePattern" (the filters would no-op and
        # every decoy row would leak through). Normalize to lowercase and
        # look everything up lowercase.
        self._options = {str(k).lower(): v for k, v in options.items()}
        self._path = self._options.get("standin.path")
        echo = self._options.get("standin.echo")
        if echo:  # driver-side, at stream-start time
            with open(echo, "w") as fh:
                json.dump(self._options, fh)
        # server-side filtering, as the connector does: db/table regex
        # routing + binlog start position (file name, byte offset)
        self._db_re = re.compile(
            "^(%s)$" % self._options.get("databasenamepattern", ".*")
        )
        self._tbl_re = re.compile(
            "^(%s)$" % self._options.get("tablenamepattern", ".*")
        )
        self._prefix = self._options.get(
            "binglognameprefix",  # reference-preserved typo...
            self._options.get("binlognameprefix", "mysql-bin"),  # ...and fixed
        )
        idx = self._options.get("binlogindex")
        self._start_idx = int(idx) if idx is not None else None
        self._start_off = int(self._options.get("binlogfileoffset", "4"))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _keep(self, obj) -> bool:
        import re

        if not self._db_re.match(obj.get("db") or ""):
            return False
        if not self._tbl_re.match(obj.get("table") or ""):
            return False
        if self._start_idx is not None:
            bf, off = obj.get("binlog_file"), obj.get("binlog_offset")
            if bf is not None:  # positionless events are kept (old fixtures)
                # position comparison is scoped to the configured name
                # prefix: a file from a DIFFERENT binlog series
                # ('mysql-bin-changelog.000003') must not be index-
                # compared against this series' start — keep it, like
                # an unparseable name (same rule as read_cdc_stream's
                # NULL-parse branch, so the two read paths agree)
                if not str(bf).startswith(self._prefix + "."):
                    return True
                # compare PARSED integer indexes: file-name strings
                # mis-order at MySQL's 6-digit suffix rollover
                # ('mysql-bin.1000000' < 'mysql-bin.999999' as strings).
                # ASCII-digits-only, NOT bare int(): Python's int()
                # accepts underscores ('0_1') and non-ASCII digits that
                # Spark's try_cast rejects, and the two read paths must
                # agree on the keep rule for identical input
                suffix = str(bf).rsplit(".", 1)[-1]
                if not re.fullmatch(r"[0-9]+", suffix):
                    return True  # unparseable name — keep, like no position
                bf_idx = int(suffix)
                if bf_idx < self._start_idx:
                    return False
                if bf_idx == self._start_idx and off is not None:
                    if off < self._start_off:
                        return False
        return True

    def _rows(self, files: list[str]):
        import datetime as _dt

        names = [f.name for f in self._schema.fields]
        types = [f.dataType.simpleString() for f in self._schema.fields]

        def _coerce(v, t):
            if v is None:
                return None
            if t == "timestamp" and isinstance(v, str):
                # Spark's JSON writer emits ISO-8601 (optionally zoned)
                s = v.replace("Z", "+00:00")
                try:
                    return _dt.datetime.fromisoformat(s)
                except ValueError:
                    return None
            if t == "bigint" and isinstance(v, str):
                return int(v)
            if t == "string" and not isinstance(v, str):
                return json.dumps(v) if isinstance(v, (dict, list)) else str(v)
            return v

        for path in files:
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    obj = json.loads(line)
                    if self._keep(obj):
                        yield tuple(
                            _coerce(obj.get(n), t) for n, t in zip(names, types)
                        )

    # read()/readBetweenOffsets return iter(list), not a bare generator
    # OR a bare list: Spark's SimpleStreamReaderWrapper caches each
    # batch's ITERATOR for exactly-once replay and copy.copy()s it — a
    # generator can't be copied ("cannot pickle 'generator' object" in
    # planPartitions) and a list isn't an iterator (latestOffset's
    # add_result_to_cache). A list_iterator is both copyable and an
    # iterator. Driver-side materialization is the documented
    # SimpleDataSourceStreamReader contract anyway.
    def read(self, start: dict):
        files = _binlog_files(self._path)
        new = _files_between(files, start, None)
        end = _end_offset(files, start)
        return iter(list(self._rows(new))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _binlog_files(self._path)
        return iter(list(self._rows(_files_between(files, start, end))))


class BinlogStandInSource(DataSource):
    """Serves ``format("mysql-binlog")`` — the spark-binlog format name
    the reference's delta streamer reads
    (HoodieBinlogDeltaStreamer.scala:77)."""

    @classmethod
    def name(cls) -> str:
        return "mysql-binlog"

    def schema(self):
        return self.options.get("standin.schema") or _BINLOG_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _BinlogStreamReader(schema, self.options)
