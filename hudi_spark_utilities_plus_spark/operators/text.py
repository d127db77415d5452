"""Text-analysis operators for LLM-data pipelines, 100 TB-scale design.

All hot-path expressions are JVM-side built-ins — no Python round-trips
anywhere: tokenization via split/regexp, language-ID via stopword-hit
counting, quality scoring via length/punct/stopword ratios,
fingerprinting via SHA-256 and a Karp-Rabin rolling hash expressed with
``F.aggregate``. Precision on the execution tier: the scalar built-ins
run inside whole-stage codegen, but Catalyst higher-order functions
(``aggregate``/``transform``/``filter`` lambdas) evaluate as INTERPRETED
expressions outside the codegen stage — still JVM-side and Arrow-free,
one fold per row, roughly an order cheaper than a Python UDF crossing
but not free (the r13 plan audit's "single-fold-per-row acceptable"
band; the r14 `_band_keys` fix is what the HOT multi-fold shape costs
when this distinction is ignored).

Everything is a narrow per-row transform — embarrassingly parallel, no
shuffle — so throughput scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Stopword marker substrings per language for the n-gram/stopword-hit
# language heuristic. Space-delimited so they only match whole words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " que "],
    "fr": [" le ", " et ", " les "],
    "zh": [" de ", " shi ", " le "],
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens on
    NON-blank input). Known artifact, pinned by every token-count
    oracle: split of an empty/whitespace-only string yields [''] — ONE
    phantom empty token — identically in Spark and DuckDB, so
    token_count_ws('') is 1, not 0. Callers that must not count blank
    docs filter them first (see packing.chunk_documents)."""
    return F.split(F.trim(text), "\\s+")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via regexp pre-tokenization (JVM-side)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), 0))


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    (len(x) - len(replace(x, s))) / len(s), identical math in any engine."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit score per language over ' '-padded text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of stopword hits (ties broken by the
    fixed language order en>de>es>fr>zh, so the result is deterministic).
    NULL text stays NULL — without the guard every CASE condition is
    NULL (not true) and the chain fell through to confidently labeling
    a missing document with the LAST language."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # Build reversed CASE chain: earlier languages win ties.
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(expr)


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit("[.!?,;:]"), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality facets: exact integer counts + ratios formed
    by single double divisions (bit-identical across engines)."""
    n_chars = F.length(text)
    n_words = token_count_ws(text)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": n_chars.cast("double") / n_words,
        "punct_ratio": punct_count(text).cast("double") / n_chars,
        "stopword_ratio": occurrences(
            F.concat(F.lit(" "), F.lower(text), F.lit(" ")), " the "
        ).cast("double")
        / n_words,
    }


# Hashed-feature linear quality model (fasttext-style shape): tokens
# hash into _QM_BUCKETS feature buckets; each bucket carries a fixed
# integer weight derived from a Knuth multiplicative mix. Deliberately
# expressible in BOTH Spark and ANSI SQL built-ins so the score is
# oracle-exact on ANY corpus: the bucket hash uses only char-count and
# UTF-8 byte-count (identical in every engine for every codepoint —
# unlike ascii(), whose first-char semantics diverge between UTF-16
# engines and codepoint engines on astral-plane input), every output is
# integer or boolean (no double in the checkable contract), and the
# normalized score is integer-scaled parts-per-million computed with
# non-negative integer arithmetic (truncation == floor, so Spark `div`
# and DuckDB `//` agree bit-for-bit).
_QM_BUCKETS = 64
_QM_MIX = 2654435761  # Knuth's 2^32 / phi multiplier
_QM_MOD = 997  # prime → weights spread over [-498, 498]


def _qm_weight(token: Column) -> Column:
    """Integer weight of a token's feature bucket.

    bucket = (31·numchars(t) + 17·numbytes(t)) mod 64 — cheap and
    portable for arbitrary Unicode (``length`` counts codepoints and
    ``octet_length`` counts UTF-8 bytes identically in Spark and DuckDB;
    ``ascii()`` is deliberately avoided — on astral-plane first chars
    Spark returns the UTF-16 surrogate unit while codepoint engines
    return the full codepoint);
    weight = (bucket · MIX) mod 997 − 498 ∈ [−498, 498]."""
    bucket = (F.length(token) * 31 + F.octet_length(token) * 17) % _QM_BUCKETS
    return (bucket * F.lit(_QM_MIX)) % _QM_MOD - 498


def quality_model_score(text: Column) -> dict[str, Column]:
    """Linear quality-model score over hashed token features.

    Production shape: a learned weight vector over hashed n-gram
    buckets (fasttext / quality-classifier style) applied as a pure
    Column expression — map-only, JVM-side codegen, no UDF, no shuffle;
    at 100 TB this scores in the scan stage. The fixed weights here are
    the deterministic stand-in for trained weights (swap `_qm_weight`
    for a broadcast weight-array lookup when a trained model exists —
    same plan shape).

    Returns an integer-only contract (portable across engine versions —
    no double ever enters the checkable columns): `raw` (exact BIGINT
    sum of per-token weights), `n_toks`, and `score_ppm` =
    ⌊(raw + 498·n) · 1e6 / (996·n)⌋ ∈ [0, 1e6] — the [−1, 1] score
    shifted to [0, 1] and integer-scaled to parts-per-million. The
    numerator is non-negative by construction, so truncating and floor
    division coincide; the division is computed exactly as
    (num − num % den) / den, a double division of an exact multiple
    (num ≤ 996·n·1e6 < 2^53), hence bit-exact."""
    toks = ws_tokens(F.coalesce(text, F.lit("")))
    raw = F.aggregate(
        F.transform(toks, _qm_weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size(toks).cast("long")
    num = (raw + n * 498) * F.lit(1000000).cast("long")
    den = n * 996
    score_ppm = ((num - num % den) / den).cast("long")
    return {
        "raw": raw,
        "n_toks": n,
        "score_ppm": score_ppm,
    }


def dup_line_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of lines that are
    repeats of an earlier line — ``1 - distinct/total`` over the raw
    newline split (empty lines count; a heavily blank doc IS
    repetitive). Single double division → bit-identical cross-engine.
    Narrow per-row transform, no shuffle."""
    lines = F.split(text, "\n", -1)
    return F.lit(1.0) - F.size(F.array_distinct(lines)).cast(
        "double"
    ) / F.size(lines).cast("double")


def word_counts_exploded(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word, cnt) — whitespace words of the lowercased text. The
    shuffle key is (id, word): high-cardinality, well-spread; partial
    map-side aggregation shrinks it before the exchange."""
    return (
        df.select(
            F.col(id_col), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("cnt"))
    )


def top_word_fraction(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, top_word_frac): share of the document's words taken by its
    most frequent word — the second Gopher repetition axis. Two keyed
    aggregations (id+word, then id); both partial-aggregated."""
    wc = word_counts_exploded(df, id_col, text_col)
    return wc.groupBy(id_col).agg(
        (
            F.max("cnt").cast("double") / F.sum("cnt").cast("double")
        ).alias("top_word_frac")
    )


def bigram_array(text: Column) -> Column:
    """Adjacent word bigrams ("w1 w2") of the lowercased whitespace
    tokens — zip the word list against itself shifted by one. Narrow
    per-row transform; corpus-level counting is explode + a partial-
    aggregated groupBy on the bigram string."""
    w = ws_tokens(F.lower(text))
    n = F.size(w)
    return F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


# PII patterns restricted to syntax valid in BOTH Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround. \b is supported by both.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}[- ][0-9]{4}\b"


def pii_counts(text: Column) -> dict[str, Column]:
    """Exact match counts per PII class (size of extract-all — identical
    semantics in Spark and DuckDB's len(regexp_extract_all))."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0)),
    }


def pii_redact(text: Column) -> Column:
    """Replace every email/phone occurrence with typed placeholder tags.
    Order matters and is part of the contract: emails first (a phone-like
    digit run inside an address must not be half-redacted), then phones."""
    scrubbed = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")


def sha_fingerprint(text: Column) -> Column:
    """SHA-256 hex fingerprint (exact-dedup key at scale: 32 bytes/doc
    instead of shuffling full document bodies)."""
    return F.sha2(text.cast("binary"), 256)


ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


def rolling_fingerprint(text: Column) -> Column:
    """Karp-Rabin rolling hash over UNICODE CODEPOINTS: fold
    (acc*31 + codepoint) mod p. Expressed with ``F.aggregate`` so it
    runs inside codegen — no UDF.

    Codepoints come from hex(encode(text, 'utf-32')) sliced 8 hex chars
    at a time, NOT from ``split('')`` + ``ascii()``: Spark's split
    iterates UTF-16 code units (an astral char becomes TWO surrogate
    elements) and its ascii() returns the surrogate value, while
    codepoint engines (the DuckDB oracle) iterate codepoints — so the
    old form diverged on any non-BMP character. The utf-32 form is
    codepoint-exact in both engines and bit-identical to the old one on
    BMP-only text. NULL text stays NULL; empty text folds to 0.

    ASCII fast path: for pure-ASCII text (the overwhelming bulk of real
    corpora, and where UTF-16 units == codepoints by construction) the
    codes come from the cheap ``split('')`` + ``ascii()`` form instead —
    the utf-32 route inflates every character to 8 hex chars and does a
    base conversion per codepoint, which benched at 2.3x the old plan.
    The two branches agree exactly on ASCII, so the oracle is
    unchanged."""
    hx = F.hex(F.encode(text, "utf-32"))
    n_cp = (F.length(hx) / 8).cast("int")
    ascii_codes = F.transform(
        F.split(text, ""), lambda c: F.ascii(c).cast("long")
    )
    codes = (
        F.when(text.isNull(), F.lit(None).cast("array<long>"))
        .when(text.rlike("^[\\x00-\\x7F]*$"), ascii_codes)
        .when(
            n_cp > 0,
            F.transform(
                F.sequence(F.lit(0), n_cp - 1),
                lambda i: F.conv(
                    F.substring(hx, i * 8 + 1, F.lit(8)), 16, 10
                ).cast("long"),
            ),
        )
        .otherwise(F.array().cast("array<long>"))
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )
