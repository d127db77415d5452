"""Recursive auto-flattening of nested schemas.

Reference parity: ``TransformUtils.flatten``
(``boxer-common/.../transforms/TransformUtils.scala:46-76``):

- first ``array<struct>`` column → ``explode_outer`` (parent row kept when
  the array is empty/null), recurse (array case, lines 56-64);
- first ``struct`` column → promote children to ``parent_child``
  top-level columns, recurse (struct case, lines 66-71);
- fixpoint when no struct / array-of-struct columns remain.

Rename rule (line 69), reproduced exactly: ``.`` and ``$`` become
``_``, then one left-to-right pass replaces ``__`` with ``_``, then
spaces and dashes are **deleted** (not underscored); the rename chain
applies to every column in the struct-promotion select, and promoted /
exploded columns are appended at the END of the schema (lines 60-61,
67-68). Multiple array-of-struct columns therefore produce a cartesian
product of their elements — documented behavior
(``docs/document/01.MongoDB Ingestion.md:134-147``), reproduced here.

Scale note: explode_outer and struct promotion are narrow (no shuffle);
flattening a 100 TB document table is embarrassingly parallel. Plain
arrays (non-struct elements) are left intact, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def _flat_name(dotted: str) -> str:
    """The reference's rename chain, verbatim (TransformUtils.scala:69):
    Java String.replace is a literal all-occurrence replace, and the
    ``__`` → ``_`` step is a single left-to-right pass (``a___b`` →
    ``a__b``, not ``a_b``); spaces and dashes are deleted outright."""
    return (
        dotted.replace(".", "_")
        .replace("$", "_")
        .replace("__", "_")
        .replace(" ", "")
        .replace("-", "")
    )


def flatten(df: DataFrame) -> DataFrame:
    """Flatten until no StructType / ArrayType(StructType) columns remain.

    Column ordering matches the reference: the first nested column found
    is removed from its position and its exploded/promoted replacement
    appended at the end of the schema."""
    while True:
        fields = df.schema.fields
        arr = next(
            (
                f
                for f in fields
                if isinstance(f.dataType, ArrayType)
                and isinstance(f.dataType.elementType, StructType)
            ),
            None,
        )
        if arr is not None:
            others = [F.col(f"`{f.name}`") for f in fields if f.name != arr.name]
            df = df.select(
                *others, F.explode_outer(F.col(f"`{arr.name}`")).alias(arr.name)
            )
            continue
        st = next((f for f in fields if isinstance(f.dataType, StructType)), None)
        if st is not None:
            cols = [
                F.col(f"`{f.name}`").alias(_flat_name(f.name))
                for f in fields
                if f.name != st.name
            ]
            cols += [
                F.col(f"`{st.name}`.`{c.name}`").alias(
                    _flat_name(f"{st.name}.{c.name}")
                )
                for c in st.dataType.fields
            ]
            df = df.select(*cols)
            continue
        return df
