"""Column-function library — the engine's reusable expression surface.

Everything here is a pure ``Column -> Column`` function built from
pyspark.sql.functions (JVM-side, whole-stage codegen); import this module
the way you'd import ``pyspark.sql.functions``:

    from hudi_spark_utilities_plus_spark import functions as HF
    df.select(HF.lang_id(F.col("text")), HF.sha_fingerprint(F.col("text")))
"""

from ..operators.dedup import shingles, simhash
from ..operators.similarity import as_double, cosine, dot, l2_norm, lsh_signature
from ..operators.text import (
    lang_id,
    lang_scores,
    occurrences,
    punct_count,
    quality_features,
    rolling_fingerprint,
    sha_fingerprint,
    token_count_bpe,
    token_count_ws,
    ws_tokens,
)

__all__ = [
    "ws_tokens",
    "token_count_ws",
    "token_count_bpe",
    "occurrences",
    "lang_scores",
    "lang_id",
    "punct_count",
    "quality_features",
    "sha_fingerprint",
    "rolling_fingerprint",
    "shingles",
    "simhash",
    "dot",
    "l2_norm",
    "cosine",
    "as_double",
    "lsh_signature",
]
