"""Token-budget sequence packing — concat-and-chunk for training data.

The standard LLM pre-training layout: documents are concatenated in a
deterministic order and the token stream is cut into fixed-size packs
(context windows). Each document is assigned the pack in which its FIRST
token lands: ``pack_id = floor((cum_before_doc) / budget)``. Documents
may straddle a boundary — that is concat-and-chunk semantics, not a bug
(greedy first-fit bin packing is inherently sequential and its output
depends on scan order; the contiguous form is what production pipelines
actually run because it is deterministic and streaming-friendly).

100 TB design: the only global state is the running token sum, computed
with the two-phase range-partition program (no ``Exchange
SinglePartition``); everything else is narrow per-row math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .global_windows import global_running_sum


def pack_assignments(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """(all df columns, ``pack_id``) — the pack containing the document's
    first token under contiguous packing in ``id_col`` order.

    NULL token counts ride as 0 (the doc occupies no budget, lands in
    the current pack) — without the coalesce the subtraction below goes
    NULL and the doc falls into a silent NULL pack. The subtraction
    reuses the SAME cast expression the running sum accumulates, so a
    fractional tokens column cannot skew pack_id off by one (long cum
    minus raw double used to shift every assignment)."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0 tokens; got {budget}")
    tok = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    cum = global_running_sum(df, [F.col(id_col)], tok, out_col="__gw_cum")
    return cum.withColumn(
        "pack_id", F.floor((F.col("__gw_cum") - tok) / budget)
    ).drop("__gw_cum")


def pack_stats(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """(pack_id, n_docs, tok_total) per pack — the pack manifest a
    training loader consumes. One keyed aggregate over the assignments
    (pack_id is contiguous-range partitioned → near-uniform)."""
    return (
        pack_assignments(df, id_col, tokens_col, budget)
        .groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(tokens_col).cast("long")).alias("tok_total"),
        )
    )


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
):
    """Context-window chunking: split each document into token windows
    of ``size`` tokens advancing by ``stride`` (``size - stride`` tokens
    of overlap carry context across chunk boundaries) — the step that
    turns variable-length documents into model-ingestible sequences.

    Chunk count per doc is ``1 + ceil(max(n_tok - size, 0) / stride)``:
    short docs yield one whole-doc chunk; the final window may be
    partial. Returns (id_col, chunk_idx, chunk_text, chunk_tokens).

    Scale shape: pure per-row JVM expressions (split → sequence →
    transform → posexplode); no shuffle at all — chunking pipelines
    straight into the tokenizer/writer stage, and the output inherits
    the scan's partitioning. Row width grows by the overlap factor
    (size/stride), which is the expected amplification of the layout.

    Documents with no tokens (NULL / empty / whitespace-only text)
    yield ZERO chunks: real web corpora contain them, and the
    split-of-empty-string artifact ([''] — one phantom token) would
    otherwise emit a 1-token empty chunk per empty doc, silently
    inflating downstream token budgets.
    """
    from .text import ws_tokens

    if size <= 0 or stride <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    df = df.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    toks = ws_tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n_tok - size, F.lit(0)) + (stride - 1))
            / F.lit(stride)
        ).cast("int")
    )
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, size),
    )
    return (
        df.select(F.col(id_col), F.posexplode(windows).alias("chunk_idx", "w"))
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(" ", "w").alias("chunk_text"),
            F.size("w").alias("chunk_tokens"),
        )
    )
