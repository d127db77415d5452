"""Exact substring (duplicated-span) dedup for LLM training corpora.

The dedup family in dedup.py removes *documents*; this module finds the
duplicated *regions inside* documents — the "memorized boilerplate"
target of suffix-array substring dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"). A distributed suffix
array is the wrong shape for Spark; the equivalent shuffle-bounded
relational program is a fixed-grid shingle join:

1. each document ≥ L chars emits shingles of length L at stride s
   (grid positions 0, s, 2s, …, ≤ n−L) — ``n/s`` rows per doc, each
   carrying a 32-byte SHA-256 key instead of the span text;
2. a shingle key that occurs in ≥ ``min_docs`` DISTINCT documents is
   cross-document duplicated (within-doc repetition is deliberately
   excluded — that is text_repetition's domain);
3. each document's duplicated grid positions merge into maximal
   [span_start, span_end) regions by classic island detection (a
   running max-end window), so overlapping shingles at stride < L
   report one region, not L/s fragments.

Resolution is grid-granular: a true duplicated substring is detected
iff it covers ≥ 1 full grid shingle, and reported region bounds snap to
the grid (extend by up to s−1 chars left / L−1 right of the true span).
stride = L gives the cheapest scan (no overlap), stride = L/2 the usual
recall/cost point — at 100 TB the shingle frame is (n/s)·32 B per doc
through ONE exchange.

Scale notes: the distinct-doc count runs as two combiner-friendly
stages — ``(key, doc_id) distinct`` (map-side combine collapses a
doc's internal repeats) then ``count per key`` — so a boilerplate span
appearing millions of times never funnels raw rows to one reducer;
the island merge is a per-doc window over ≤ n/s rows. No Python UDFs,
no driver collects: every stage is built-in columnar expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grid_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_len: int,
    stride: int,
) -> DataFrame:
    """(doc_id, pos, k): SHA-256 keys of length-L shingles on the
    stride grid, docs shorter than L excluded (they have no grid)."""
    if span_len <= 0 or stride <= 0:
        raise ValueError("span_len and stride must be positive")
    n = F.length(F.col(text_col)).cast("long")
    eligible = df.filter(n >= F.lit(span_len)).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        n.alias("_n"),
    )
    return eligible.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("_n") - F.lit(span_len),
                F.lit(stride).cast("long"),
            )
        ).alias("pos"),
        "_text",
    ).select(
        "doc_id",
        "pos",
        F.sha2(
            F.col("_text").substr(
                (F.col("pos") + 1).cast("int"), F.lit(span_len)
            ),
            256,
        ).alias("k"),
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 64,
    stride: int = 32,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-document duplicated regions per document.

    Returns (doc_id, span_start, span_end, n_shingles): 0-based
    char offsets, end exclusive, one row per merged island of grid
    shingles whose SHA-256 key appears in ≥ ``min_docs`` distinct
    documents. Deterministic for a given corpus and grid.
    """
    sh = _grid_shingles(df, text_col, id_col, span_len, stride)
    hits = sh.join(
        _dup_key_meta(sh, min_docs).select("k"), "k", "semi"
    ).select("doc_id", "pos", (F.col("pos") + F.lit(span_len)).alias("e"))
    return (
        _merge_islands(hits)
        .agg(
            F.min("pos").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count("*").alias("n_shingles"),
        )
        .drop("_grp")
    )


def _dup_key_meta(sh: DataFrame, min_docs: int) -> DataFrame:
    """(k, nd, owner) for keys in ≥ min_docs distinct docs. Two-stage
    distinct-doc count: (k, doc) distinct collapses a doc's internal
    repeats map-side; the per-key agg then sees at most one row per
    (key, doc) — hot boilerplate keys stay partial-aggregable instead
    of funneling raw shingles to one reducer."""
    return (
        sh.select("k", "doc_id")
        .distinct()
        .groupBy("k")
        .agg(
            F.count("*").alias("nd"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("nd") >= F.lit(min_docs))
    )


def _merge_islands(hits: DataFrame):
    """Classic island detection over (doc_id, pos, e): a per-doc
    running max-end window breaks a new group whenever the next hit
    starts past everything seen so far. Returns the GROUPED frame
    (doc_id, _grp) so each caller picks its own aggregates."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    grp = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return hits.withColumn("_grp", grp).groupBy("doc_id", "_grp")


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 64,
    stride: int = 32,
    min_docs: int = 2,
) -> DataFrame:
    """The transformation half of substring dedup: CUT each document's
    cross-document duplicated regions, keeping one canonical copy.

    Retention rule, defined per grid shingle so it stays deterministic
    under merged islands: a hit (doc, pos) is REMOVABLE iff its key
    occurs in ≥ ``min_docs`` distinct docs AND doc ≠ the minimal doc_id
    owning that key. The minimal owner keeps all its occurrences (even
    within-doc repeats); every other owner's removable hits merge into
    islands and are spliced out. Returns one row per input document:
    (doc_id, cleaned_text, removed_chars) — clean/short docs pass
    through verbatim with removed_chars = 0.

    Splicing is a single per-row fold over the doc's sorted cut list
    (array_sort + F.aggregate building the kept segments) — a Catalyst
    HOF, interpreted but SINGLE-fold-per-row, the shape the r13 audit
    measured at µs/row; the per-key owner minimum reuses the two-stage
    distinct aggregation of :func:`duplicated_spans`, so hot
    boilerplate keys stay partial-aggregable.
    """
    sh = _grid_shingles(df, text_col, id_col, span_len, stride)
    removable = (
        sh.join(_dup_key_meta(sh, min_docs).select("k", "owner"), "k")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "pos", (F.col("pos") + F.lit(span_len)).alias("e"))
    )
    cuts = (
        _merge_islands(removable)
        .agg(F.min("pos").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "e"))).alias("cuts"),
            F.sum(F.col("e") - F.col("s")).alias("removed_chars"),
        )
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.length(F.col(text_col)).cast("long").alias("_n"),
    )
    joined = base.join(cuts, "doc_id", "left")
    # fold the sorted cut list into the kept text: accumulator carries
    # (last cut end, spliced prefix); the finisher appends the tail
    spliced = F.aggregate(
        F.col("cuts"),
        F.struct(
            F.lit(0).cast("long").alias("last"), F.lit("").alias("acc")
        ),
        lambda a, c: F.struct(
            c["e"].alias("last"),
            F.concat(
                a["acc"],
                F.col("_text").substr(
                    (a["last"] + 1).cast("int"),
                    (c["s"] - a["last"]).cast("int"),
                ),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.col("_text").substr(
                (a["last"] + 1).cast("int"),
                (F.col("_n") - a["last"]).cast("int"),
            ),
        ),
    )
    return joined.select(
        "doc_id",
        F.when(F.col("cuts").isNull(), F.col("_text"))
        .otherwise(spliced)
        .alias("cleaned_text"),
        F.coalesce(F.col("removed_chars"), F.lit(0).cast("long")).alias(
            "removed_chars"
        ),
    )


def substring_dup_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 64,
    stride: int = 32,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-char budget and the keep/drop verdict.

    Returns one row per input document (including short, clean, and
    empty ones): (doc_id, doc_len, dup_chars, keep) where ``dup_chars``
    sums the merged duplicated regions of :func:`duplicated_spans` and
    ``keep`` is the integer-exact majority test ``2·dup_chars ≤
    doc_len`` — a document MORE than half covered by cross-document
    boilerplate is dropped; exactly-half and empty documents keep
    (dup_chars 0 of 0 is clean, not fully-duplicated). Integer
    arithmetic end to end: no float ratio crosses the engine boundary.
    """
    spans = duplicated_spans(df, text_col, id_col, span_len, stride, min_docs)
    cov = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_chars")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("doc_len"),
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "doc_len",
        F.coalesce(F.col("dup_chars"), F.lit(0).cast("long")).alias(
            "dup_chars"
        ),
        (
            F.lit(2) * F.coalesce(F.col("dup_chars"), F.lit(0).cast("long"))
            <= F.col("doc_len")
        ).alias("keep"),
    )


def _common_prefix_len(a, b):
    """Character count of the common prefix of two string columns —
    a bounded single fold per row (flanks are < stride chars), the
    same interpreted-HOF shape as the strip splice. NULL on either
    side (a window edge) counts as 0."""
    mlen = F.least(F.length(a), F.length(b))
    seq = (
        F.when(mlen >= 1, F.sequence(F.lit(1), mlen.cast("int")))
        .otherwise(F.array().cast("array<int>"))
    )
    fold = F.aggregate(
        seq,
        F.struct(F.lit(True).alias("go"), F.lit(0).alias("n")),
        lambda acc, i: F.struct(
            (acc["go"] & (a.substr(i, F.lit(1)) == b.substr(i, F.lit(1)))).alias("go"),
            F.when(
                acc["go"] & (a.substr(i, F.lit(1)) == b.substr(i, F.lit(1))),
                acc["n"] + 1,
            )
            .otherwise(acc["n"])
            .alias("n"),
        ),
        lambda acc: acc["n"],
    )
    return F.coalesce(
        F.when(a.isNull() | b.isNull(), F.lit(0)).otherwise(fold), F.lit(0)
    )


def refine_span_bounds(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 64,
    stride: int = 32,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-boundary refinement over the grid-snapped islands of
    :func:`duplicated_spans` — the optional second pass VERDICT r14
    named (Lee et al. 2022 exact-boundary semantics at stride > 1).

    Returns one row per island: (doc_id, span_start, span_end,
    n_shingles, exact_start, exact_end) where the exact bounds extend
    the grid bounds by the number of flank characters that are
    genuinely part of a duplicated context: a boundary character run
    counts iff it also flanks ANOTHER occurrence of the island's
    boundary shingle key (the key is already cross-document by
    construction; partner occurrences may sit in any document,
    including same-document repeats of that key). Extensions are
    capped at stride−1 by construction — a shared run of ≥ stride
    chars past the boundary would contain the *adjacent grid shingle*
    of every grid-aligned partner and the island would already have
    grown — so the refinement exactly closes the snap-to-grid gap for
    the alignment class the detector sees.

    Shape, flagged-regions-only (r17 single-pass form): ONE pass over
    the occurrences of duplicated keys computes each occurrence's own
    (lflank, rflank) next to the text; that materialized occurrence
    table feeds BOTH downstream consumers — (a) the island merge, where
    the boundary shingle key and the island's own flanks fall out of
    the per-group argmin/argmax (``min_by/max_by`` on the grid
    position: the island's left boundary IS its min-pos occurrence, so
    that occurrence's lflank/key are exactly the island's — the three
    joins the r16 form paid to re-attach text and boundary keys are
    gone), and (b) the flank groups, both sides fused into one
    (k, side, flank) aggregation with a count — a boilerplate key in a
    million documents still contributes a handful of distinct flanks,
    never a million comparison rows. Per (k, side) group the best
    partner extension is max common-prefix with the lexicographic
    NEIGHBOR flanks (the classic sorted-neighbor LCP bound: for any
    set of strings, each element's maximum LCP is attained at an
    adjacent element in sorted order), plus full flank length when the
    identical flank occurs ≥ 2 times. The extensions re-attach through
    ONE join: islands unpivot to (side, k, flank) rows, join the ext
    table, and re-group on the island identity (exactly one l and one
    r match per island by construction — every island boundary IS an
    occurrence, so its flank group always exists). One window, one
    bounded fold per row, no UDFs, no collects."""
    from .materialize import materialize

    # the shingle grid feeds two consumers (dup-key meta, the island
    # hits via sh_dup) — one materialized SHA-256 pass instead of
    # re-hashing the corpus per consumer. LAZY: the dup-meta distinct
    # exchange is a full-partition scan, so it is the materializing
    # action (no dedicated checkpoint job).
    sh = materialize(
        _grid_shingles(df, text_col, id_col, span_len, stride), eager=False
    )
    dup = _dup_key_meta(sh, min_docs).select("k")
    sh_dup = sh.join(dup, "k")
    if stride <= 1:
        # the grid IS character-exact at stride 1 — nothing to refine
        hits = sh_dup.select(
            "doc_id", "pos", (F.col("pos") + F.lit(span_len)).alias("e")
        )
        spans = (
            _merge_islands(hits)
            .agg(
                F.min("pos").alias("span_start"),
                F.max("e").alias("span_end"),
                F.count("*").alias("n_shingles"),
            )
            .drop("_grp")
        )
        return spans.select(
            "doc_id",
            "span_start",
            "span_end",
            "n_shingles",
            F.col("span_start").alias("exact_start"),
            F.col("span_end").alias("exact_end"),
        )
    fl = stride - 1
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.length(F.col(text_col)).cast("long").alias("_n"),
    )
    # every occurrence of a duplicated key with ITS OWN flanks computed
    # once, next to the text: left flank reversed so common-SUFFIX
    # becomes common-prefix under one shared fold. Materialized (lazy)
    # because both the island merge and the flank-group aggregation
    # consume it — their first exchange is a full-partition scan.
    lfl = F.least(F.lit(fl).cast("long"), F.col("pos"))
    rfl = F.least(
        F.lit(fl).cast("long"),
        F.col("_n") - (F.col("pos") + F.lit(span_len)),
    )
    occ = materialize(
        sh_dup.join(base, "doc_id").select(
            "doc_id",
            "pos",
            "k",
            F.reverse(
                F.col("_text").substr(
                    (F.col("pos") - lfl + 1).cast("int"), lfl.cast("int")
                )
            ).alias("lflank"),
            F.col("_text")
            .substr(
                (F.col("pos") + F.lit(span_len) + 1).cast("int"),
                rfl.cast("int"),
            )
            .alias("rflank"),
        ),
        eager=False,
    )
    # island merge with the boundary keys/flanks captured in-aggregate:
    # grid positions are unique per doc, so min_by/max_by on pos are
    # deterministic, and the min-pos occurrence's lflank (computed over
    # least(fl, pos) chars before pos) IS the island's lflank (pos =
    # span_start there); symmetrically max-pos ⇒ e = span_end for the
    # right boundary (e = pos + span_len is monotone in pos).
    hits = occ.withColumn("e", F.col("pos") + F.lit(span_len))
    spans = (
        _merge_islands(hits)
        .agg(
            F.min("pos").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count("*").alias("n_shingles"),
            F.min_by("k", "pos").alias("k_l"),
            F.max_by("k", "pos").alias("k_r"),
            F.min_by("lflank", "pos").alias("lflank"),
            F.max_by("rflank", "pos").alias("rflank"),
        )
        .drop("_grp")
    )
    # both flank sides in ONE aggregation + ONE window: a row's side
    # tag rides in the group key, so per-(k, side) ordering/LCP is
    # exactly the old per-side computation
    groups = (
        occ.select(
            "k",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("l").alias("side"), F.col("lflank").alias("flank")
                    ),
                    F.struct(
                        F.lit("r").alias("side"), F.col("rflank").alias("flank")
                    ),
                )
            ).alias("sf"),
        )
        .select("k", F.col("sf.side").alias("side"), F.col("sf.flank").alias("flank"))
        .groupBy("k", "side", "flank")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("k", "side").orderBy("flank")
    prev_lcp = _common_prefix_len(F.col("flank"), F.lag("flank").over(w))
    next_lcp = _common_prefix_len(F.col("flank"), F.lead("flank").over(w))
    ext = groups.select(
        "k",
        "side",
        "flank",
        F.when(F.col("cnt") >= 2, F.length("flank"))
        .otherwise(F.greatest(prev_lcp, next_lcp))
        .cast("long")
        .alias("ext"),
    )
    # single attach join: islands unpivot to one row per boundary side,
    # join the ext table on (k, side, flank), re-group on the island
    # identity ((doc_id, span_start) is unique — islands are disjoint
    # per doc). Inner join semantics match the r16 two-join form: every
    # boundary's flank group exists (the boundary is an occurrence), so
    # exactly one l and one r row survive per island.
    unp = spans.select(
        "doc_id",
        "span_start",
        "span_end",
        "n_shingles",
        F.explode(
            F.array(
                F.struct(
                    F.lit("l").alias("side"),
                    F.col("k_l").alias("k"),
                    F.col("lflank").alias("flank"),
                ),
                F.struct(
                    F.lit("r").alias("side"),
                    F.col("k_r").alias("k"),
                    F.col("rflank").alias("flank"),
                ),
            )
        ).alias("sf"),
    ).select(
        "doc_id",
        "span_start",
        "span_end",
        "n_shingles",
        F.col("sf.side").alias("side"),
        F.col("sf.k").alias("k"),
        F.col("sf.flank").alias("flank"),
    )
    out = (
        unp.join(ext, ["k", "side", "flank"])
        .groupBy("doc_id", "span_start", "span_end", "n_shingles")
        .agg(
            F.max(F.when(F.col("side") == "l", F.col("ext"))).alias("ext_l"),
            F.max(F.when(F.col("side") == "r", F.col("ext"))).alias("ext_r"),
        )
    )
    return out.select(
        "doc_id",
        "span_start",
        "span_end",
        "n_shingles",
        (F.col("span_start") - F.col("ext_l")).alias("exact_start"),
        (F.col("span_end") + F.col("ext_r")).alias("exact_end"),
    )
