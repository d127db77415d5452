"""SQL-template transform — the reference's entire user-facing query hook.

Reference parity: ``TransformUtils.transform``
(``boxer-common/.../transforms/TransformUtils.scala:26-38``) registers the
source DataFrame as a uuid-suffixed temp view, substitutes the ``<SRC>``
token in the user's SQL string, and executes via ``spark.sql`` — thereby
delegating the full Spark SQL surface (SURVEY §2.B).

The reference's Excel/JDBC/ES importers gate this on a *null* SQL value
(``containsKey && Objects.isNull`` — dead code, SURVEY §2 "observed
defects"); Mongo has the intended non-null gate
(``HoodieMongoBatch.scala:129-132``), which matches every doc. This
rebuild implements the documented (Mongo) semantics everywhere via
:func:`maybe_transform`.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

# TransformUtils.scala:13-15
SRC_TOKEN = "<SRC>"
TMP_TABLE_PREFIX = "HOODIE_SRC_TMP_TABLE_"
# Property key the importers read the SQL from (Config constants in each
# importer, e.g. HoodieMongoBatch.scala:129).
TRANSFORMER_SQL_KEY = "hoodie.deltastreamer.transformer.sql"


def transform(spark: SparkSession, df: DataFrame, sql: str) -> DataFrame:
    """Register ``df`` under a unique temp view, substitute ``<SRC>`` in
    ``sql``, and run it through ``spark.sql`` (Catalyst does the rest)."""
    tmp_table = f"{TMP_TABLE_PREFIX}{uuid.uuid4().hex}"
    df.createOrReplaceTempView(tmp_table)
    try:
        return spark.sql(sql.replace(SRC_TOKEN, tmp_table))
    finally:
        # The reference leaks its temp views; we don't.
        spark.catalog.dropTempView(tmp_table)


def maybe_transform(
    spark: SparkSession, df: DataFrame, props: dict[str, str]
) -> DataFrame:
    """Apply the transform iff a non-empty SQL string is configured —
    the documented gating (HoodieMongoBatch.scala:129-132)."""
    sql = props.get(TRANSFORMER_SQL_KEY)
    if sql:
        return transform(spark, df, sql)
    return df
