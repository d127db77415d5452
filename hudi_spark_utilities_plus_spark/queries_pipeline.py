"""Pipeline-extension query registrations: as-of join, exact
percentiles, token-budget packing, PII scrubbing, corpus n-grams,
embedding quantization.

These extend the reference's operator surface with the time-series and
training-data primitives the brief calls for; each is oracle-backed
(DuckDB exact compare), with floor-form math and single double divisions
so values are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import load_tables
from .operators import packing as P
from .operators import similarity as S
from .operators import text as T
from .operators.asof import asof_join
from .operators.dedup import scatter
from .queries import query


def _t(spark, sf_dir, *names):
    return load_tables(spark, sf_dir, list(names), register=False)


def _await_stream_rows(q, expected: int, timeout_s: float) -> None:
    """Block until the StreamingQuery's progress log shows ``expected``
    input rows consumed (or the deadline passes), then return.

    Accumulates ``numInputRows`` incrementally, tracking the highest
    ``batchId`` already counted: ``recentProgress`` is a bounded ring
    buffer (default 100 entries), so a one-shot ``sum()`` over it
    undercounts whenever consumption spans more progress updates than
    the buffer holds — the loop would then only exit via the wall-clock
    deadline, or worse stop before the sink committed everything. Each
    poll only adds batches newer than the high-water mark, so entries
    aging out of the ring were already counted."""
    import time

    deadline = time.time() + timeout_s
    done, seen_batch = 0, -1
    while time.time() < deadline:
        for p in q.recentProgress:
            if p["batchId"] > seen_batch:
                done += p["numInputRows"]
                seen_batch = p["batchId"]
        if done >= expected:
            return
        time.sleep(0.2)


@query(
    "join_asof",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id,
             arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts,
           c.click_ts, c.click_id, c.click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase picks up the user's most recent click
    at-or-before the purchase time (backward inclusive, DuckDB ASOF
    parity — exact here because events.ts is non-NULL; on NULL probe ts
    asof_join diverges by design, see operators/asof.py). MERGE shape —
    union + one user-keyed window pass, no per-pair materialization. The
    right side is pre-aggregated to unique (user, ts) so the match is
    tie-free."""
    e = _t(spark, sf_dir, "events")["events"]
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(
            F.max("event_id").alias("click_id"),
            F.max_by("value", "event_id").alias("click_value"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="purchase_ts", right_ts="click_ts"
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS q25,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.5)  AS q50,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.9)  AS q90,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.37) AS price_p37
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark, sf_dir):
    """Exact (interpolated) percentiles per group — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the (n-1)·q linear-interpolation
    definition, repr-identical on doubles. Single keyed aggregate with
    map-side partials."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    q = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.25)).alias("q25"),
        F.percentile(q, F.lit(0.5)).alias("q50"),
        F.percentile(q, F.lit(0.9)).alias("q90"),
        F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.37)).alias(
            "price_p37"
        ),
    )


@query(
    "pack_token_budget",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ), c AS (
      SELECT doc_id, tok,
             SUM(tok) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM t
    )
    SELECT CAST(FLOOR((cum - tok) / 1000) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tok_total
    FROM c GROUP BY 1
    """,
)
def pack_token_budget(spark, sf_dir):
    """Concat-and-chunk sequence packing: documents in doc_id order cut
    into 1000-token packs; a doc belongs to the pack holding its first
    token. The running token sum is the two-phase range-partition
    program — no Exchange SinglePartition."""
    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    toks = d.select(
        "doc_id", T.token_count_ws(F.col("text")).alias("tok")
    )
    return P.pack_stats(toks, "doc_id", "tok", budget=1000).withColumn(
        "tok_total", F.col("tok_total").cast("long")
    )


@query(
    "pii_scrub",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
               AS text2
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text2, '\b[0-9]{3}[- ][0-9]{4}\b')) AS n_phones,
           sha256(regexp_replace(
             regexp_replace(text2,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{3}[- ][0-9]{4}\b', '<PHONE>', 'g')) AS redacted_fp
    FROM aug
    """,
)
def pii_scrub(spark, sf_dir):
    """PII detection + redaction (emails, phone-shaped digit runs) with
    patterns valid in both Java regex and RE2. The corpus contains no
    organic PII, so deterministic synthetic PII is spliced in per doc —
    the scrub then provably finds and redacts it (counts + fingerprint
    of the redacted text are oracle-compared). Narrow per-row transform,
    no shuffle."""
    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("."),
        ).alias("text2"),
    )
    counts = T.pii_counts(F.col("text2"))
    return aug.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        T.sha_fingerprint(T.pii_redact(F.col("text2"))).alias("redacted_fp"),
    )


@query(
    "ngram_bigrams",
    oracle=r"""
    WITH w AS (
      SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
      FROM documents
    ), b AS (
      SELECT UNNEST(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM b GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def ngram_bigrams(spark, sf_dir):
    """Corpus-level top-20 word bigrams: per-row zip-shift bigram arrays
    (narrow), explode, partial-aggregated count on the bigram key, then
    distributed top-k (TakeOrdered — per-partition heaps, no global
    sort). Tie-break on the bigram string = total order."""
    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    return (
        d.select(F.explode(T.bigram_array(F.col("text"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@query(
    "embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
      FROM embeddings
    ), m AS (
      SELECT vec_id, dv, list_min(dv) AS vmin,
             list_max(dv) - list_min(dv) AS span
      FROM v
    )
    SELECT vec_id, vmin, span / 255 AS scale,
           array_to_string(
             CASE WHEN span > 0
                  THEN list_transform(dv, x -> CAST(FLOOR((x - vmin) / span * 255)
                                                    AS INTEGER))
                  ELSE list_transform(dv, x -> 0) END, ',') AS q_csv
    FROM m
    """,
)
def embedding_quantize(spark, sf_dir):
    """Per-vector uint8 scalar quantization (floor-form, engine-agnostic)
    with dequantization params riding along — 4× smaller vectors through
    every downstream shuffle. No shuffle here at all.

    The operator API (S.quantize_embeddings) stays array-valued; the
    registry projection renders ``q`` as a CSV scalar because the
    driver's pandas-based hash cannot digest raw array cells."""
    e = scatter(_t(spark, sf_dir, "embeddings")["embeddings"])
    return S.quantize_embeddings(e).select(
        "vec_id", "vmin", "scale", F.concat_ws(",", F.col("q")).alias("q_csv")
    )


# ---------------------------------------------------------------------------
# streaming window shapes (batch-expressed) + skew-salted join
# ---------------------------------------------------------------------------


@query(
    "stream_sliding",
    oracle="""
    WITH w AS (
      SELECT event_type,
             make_timestamp(epoch_us(ts) - (epoch_us(ts) % 900000000)
                            - i * 900000000) AS window_start
      FROM events, UNNEST(generate_series(0, 3)) AS t(i)
    )
    SELECT window_start, event_type, COUNT(*) AS n
    FROM w GROUP BY window_start, event_type
    """,
)
def stream_sliding(spark, sf_dir):
    """C6 sliding windows (1 h size / 15 min slide, batch-expressed):
    every event lands in exactly size/slide = 4 epoch-aligned windows.
    Same F.window(...) aggregation streaming/windows.sliding_counts runs
    with a watermark; the oracle enumerates each event's 4 window starts
    arithmetically."""
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@query(
    "stream_session",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS seq
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n
    FROM s GROUP BY user_id, seq
    """,
)
def stream_session(spark, sf_dir):
    """C6 session windows (30 min gap, batch-expressed): Spark's native
    ``session_window`` merges intervals [ts, ts+gap) — an event exactly
    ``gap`` after its predecessor starts a NEW session (half-open end),
    which is why the oracle's boundary is >= where ``sessionize_events``
    (strictly-greater custom semantics) uses >. Session end = last event
    + gap, per the merged-interval definition."""
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


@query(
    "stream_trigger",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_trigger(spark, sf_dir):
    """C1/C2 driver-visible smoke: a REAL StreamingQuery — file source →
    stateless projection → append-mode parquet sink — on a
    processing-time trigger (the reference's default mode,
    HoodieBinlogDeltaStreamer.scala:243-245). The query runs until its
    progress log shows every source row consumed, then stops; the
    returned aggregate reads the sink's committed output, so any lost or
    duplicated micro-batch flips the oracle hash.

    Scale: the sink aggregation is the only shuffle; the stream itself
    is a stateless pass-through (no state store), which is exactly the
    ingest shape of the reference's importers."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    # events.ts is TIMESTAMP(NANOS) parquet — a plain session rejects it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(src)
    expected = batch.count()
    root = tempfile.mkdtemp(prefix="stream_trigger_")
    out = os.path.join(root, "out")
    # the streaming file source monitors a DIRECTORY; stage the single
    # parquet file behind one via symlink (no copy, no testdata writes)
    src_dir = os.path.join(root, "src")
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "events.parquet"))
    q = (
        spark.readStream.schema(batch.schema)
        .parquet(src_dir)
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        _await_stream_rows(q, expected, 120)
    finally:
        q.stop()
    from .queries import dsum

    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "stream_recovery",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_recovery(spark, sf_dir):
    """C3 driver-visible smoke: checkpoint recovery as a row-count
    invariant. Run 1 streams the whole source into a parquet sink
    (available-now trigger) and commits its offsets to the checkpoint;
    run 2 RESTARTS from the same checkpoint against the same sink. The
    recovered query must replay nothing — if restart re-processed the
    source, every count in the returned aggregate would double and the
    oracle hash would flip. This is the reference's recovery contract
    (mandatory checkpointLocation, HoodieBinlogDeltaStreamer.scala:
    91-101) expressed as a driver-checkable invariant."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # nanos ts
    schema = spark.read.parquet(src).schema
    root = tempfile.mkdtemp(prefix="stream_recovery_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    src_dir = os.path.join(root, "src")  # dir-staged source, see stream_trigger
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "events.parquet"))

    def run_once() -> None:
        q = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .select("user_id", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # initial run: consumes everything, commits offsets
    run_once()  # restart from checkpoint: must be a no-op replay
    from .queries import dsum

    return (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark, sf_dir):
    """C6-family driver smoke: Spark's STATEFUL streaming dedup — the
    ingest-side exact-dedup a CDC/at-least-once source needs. The events
    table is staged TWICE behind the streaming file source (every row a
    duplicate), and ``dropDuplicates`` on the key keeps per-key state in
    the checkpointed state store across micro-batches; the sink must
    receive each event exactly once, so any state-store miss doubles a
    count and flips the oracle hash.

    Scale: state is hash-partitioned by key across executors (same
    shuffle as a keyed agg); at 100 TB the unbounded key state is the
    knob to watch — production bounds it with
    ``dropDuplicatesWithinWatermark`` once keys have an event-time
    horizon; the smoke's key space is bounded so plain dropDuplicates is
    the honest equivalent here."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # nanos ts
    schema = spark.read.parquet(src).schema
    root = tempfile.mkdtemp(prefix="stream_dedup_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    src_dir = os.path.join(root, "src")
    os.mkdir(src_dir)
    # two links -> two source files -> every event arrives twice
    os.symlink(src, os.path.join(src_dir, "events_a.parquet"))
    os.symlink(src, os.path.join(src_dir, "events_b.parquet"))
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # the copies land in DIFFERENT
        .parquet(src_dir)                 # micro-batches: cross-batch state
        .select("event_id", "event_type", "value")
        .dropDuplicates(["event_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from .queries import dsum

    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark, sf_dir):
    """C6-family: the PRODUCTION form of streaming ingest dedup —
    ``dropDuplicatesWithinWatermark`` bounds per-key state by an
    event-time horizon instead of holding it forever (the scale knob the
    plain ``stream_dedup`` id names as the 100 TB path: unbounded key
    state is what kills a year-long CDC stream). The events table is
    staged twice (every row a duplicate, identical event time), the
    copies land in different micro-batches, and the 1-hour watermark
    horizon comfortably covers the duplicate gap — so the sink must
    still receive each event exactly once while the state store is
    EVICTABLE: expired keys are dropped at watermark advance rather
    than accumulating.

    Scale: state hash-partitions by key like a keyed agg; eviction makes
    state size proportional to the dup-arrival horizon, not stream
    lifetime."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # nanos ts
    schema = spark.read.parquet(src).schema
    # events.ts is TIMESTAMP(NANOS) parquet: depending on session conf
    # history it loads as a nanos BIGINT (legacy conf) or TIMESTAMP_NTZ
    # (native) — derive the event-time column from whichever arrived
    ts_is_long = dict(zip(schema.names, schema.fields))[
        "ts"
    ].dataType.simpleString() in ("bigint", "long")
    event_time = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if ts_is_long
        else F.col("ts").cast("timestamp")
    )
    root = tempfile.mkdtemp(prefix="stream_dedup_wm_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    src_dir = os.path.join(root, "src")
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "events_a.parquet"))
    os.symlink(src, os.path.join(src_dir, "events_b.parquet"))
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # duplicates arrive in a LATER
        .parquet(src_dir)                 # micro-batch: cross-batch state
        .select(
            "event_id",
            "event_type",
            "value",
            event_time.alias("event_time"),
        )
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from .queries import dsum

    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


def _drive_demux_stream(spark, cdc, extra_props, prefix):
    """Materialize a CDC envelope frame as a file-backed binlog stream,
    run the foreachBatch demux to completion, and return the lake root.

    Shared by the stream_demux* drives: the streamer lifecycle (tempdir
    layout, source write, format("mysql-binlog") start / await / stop,
    the path template) must not drift between them — only the envelope
    and the per-table read-back are per-query semantics. The stream
    originates through the CONNECTOR'S format name — readStream
    .format("mysql-binlog") resolved via the registered streaming
    Python Data Source stand-in, exactly the reference's read path
    (HoodieBinlogDeltaStreamer.scala:77)."""
    import os
    import tempfile

    from .streaming.cdc import read_binlog_stream
    from .streaming.demux import start_binlog_streamer

    expected = cdc.count()
    root = tempfile.mkdtemp(prefix=prefix)
    src_dir, lake_root = os.path.join(root, "src"), os.path.join(root, "lake")
    cdc.coalesce(1).write.json(src_dir)
    props = {
        "option.hoodie.path": lake_root + "/{db}/ods_{db}_{table}",
        **extra_props,
    }
    q = start_binlog_streamer(
        spark,
        read_binlog_stream(spark, src_dir, database_pattern="shop"),
        props,
        checkpoint_location=os.path.join(root, "ckpt"),
        trigger_seconds=1,
    )
    try:
        _await_stream_rows(q, expected, 180)
    finally:
        q.stop()
    return lake_root


@query(
    "stream_demux",
    oracle="""
    SELECT event_type AS tbl, COUNT(*) AS n,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY event_type
    """,
)
def stream_demux(spark, sf_dir):
    """A12/C4 driver-visible smoke: the REAL binlog-demux pipeline end to
    end — a file-based CDC source (reference envelope: op/db/table/id/
    data/ts), ``start_binlog_streamer``'s foreachBatch demux routing one
    stream into per-(db, table) keyed lake tables via the
    ``option.hoodie.path`` template (HoodieBinlogDeltaStreamerSuite
    .scala:31-44), then a read-back of every routed table. Each
    event_type becomes its own table, so the invariant is per-table
    row count + key envelope — a routing bug (lost table, crossed rows,
    double-applied batch) flips the oracle hash.

    Scale: routing keys are a metadata-sized distinct collect; per-table
    applies run concurrently on the driver pool, each an independent
    keyed shuffle (streaming/demux.py:64)."""
    from .lake import HudiTable

    e = _t(spark, sf_dir, "events")["events"]
    cdc = e.select(
        F.lit("insert").alias("op"),
        F.lit("shop").alias("db"),
        F.col("event_type").alias("table"),
        F.col("event_id").alias("id"),
        F.col("value").cast("string").alias("data"),
        F.col("ts"),
        F.lit("mysql-bin.000001").alias("binlog_file"),
        F.col("event_id").alias("binlog_offset"),
    )
    tables = sorted(r["table"] for r in cdc.select("table").distinct().collect())
    lake_root = _drive_demux_stream(spark, cdc, {}, "stream_demux_")
    parts = [
        HudiTable(
            path=f"{lake_root}/shop/ods_shop_{t}",
            record_key="id",
            precombine="ts",
        )
        .read(spark)
        .select(
            F.lit(t).alias("tbl"),
            F.col("id").alias("event_id"),
        )
        for t in tables
    ]
    routed = parts[0]
    for p in parts[1:]:
        routed = routed.unionByName(p)
    return routed.groupBy("tbl").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@query(
    "stream_demux_transform",
    oracle="""
    SELECT event_type AS tbl,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), '1970-01-01') AS dt,
           COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY 1, 2
    """,
)
def stream_demux_transform(spark, sf_dir):
    """A1+A12/C4: the per-table SQL-transform hook inside the streaming
    demux path — each routed table's slice runs the reference's exact
    partition-derivation transform (``nvl(cast(to_date(...) as string),
    '1970-01-01') as dt``, HoodieBinlogDeltaTransformationSuite
    .scala:38-40) BEFORE the keyed Hudi write, so a configured
    ``partitionpath.field`` the raw CDC envelope lacks is derived and
    every table lands hive-partitioned by dt. The read-back groups per
    (table, partition), so a transform that didn't run, ran after the
    write, or derived the wrong day flips the oracle hash.

    Scale: the transform is one Catalyst projection folded into each
    per-table slice plan — no extra pass; partitioned writes turn the
    per-day dirs into partition-pruned reads downstream."""
    from .lake import HudiTable
    from .operators.transform import TRANSFORMER_SQL_KEY

    e = _t(spark, sf_dir, "events")["events"]
    cdc = e.select(
        F.lit("insert").alias("op"),
        F.lit("shop").alias("db"),
        F.col("event_type").alias("table"),
        F.col("event_id").alias("id"),
        F.col("value").cast("string").alias("data"),
        F.col("ts"),
    )
    tables = sorted(r["table"] for r in cdc.select("table").distinct().collect())
    extra = {
        # global hook: every table derives dt the reference's way
        TRANSFORMER_SQL_KEY: (
            "SELECT *, nvl(cast(to_date(ts) as string), '1970-01-01') AS dt "
            "FROM <SRC>"
        ),
    }
    for t in tables:
        extra[f"shop.{t}.hoodie.datasource.write.partitionpath.field"] = "dt"
    lake_root = _drive_demux_stream(spark, cdc, extra, "stream_demux_tf_")
    parts = [
        HudiTable(
            path=f"{lake_root}/shop/ods_shop_{t}",
            record_key="id",
            precombine="ts",
            partition_field="dt",
        )
        .read(spark)
        .select(
            F.lit(t).alias("tbl"),
            F.col("id").alias("event_id"),
            # partition discovery types dt as DATE; the oracle (and the
            # transform itself) speak strings
            F.col("dt").cast("string").alias("dt"),
        )
        for t in tables
    ]
    routed = parts[0]
    for p in parts[1:]:
        routed = routed.unionByName(p)
    return routed.groupBy("tbl", "dt").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@query(
    "stream_demux_recovery",
    oracle="""
    SELECT event_type AS tbl,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
           COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id,
           CAST(SUM(CASE WHEN event_id % 3 = 0
                          AND EXTRACT(HOUR FROM ts) <= 22
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM events GROUP BY 1, 2
    """,
)
def stream_demux_recovery(spark, sf_dir):
    """C3+A12/C4+A1: checkpoint recovery of the FULL demux pipeline —
    per-table SQL transform + partitioned tables — the one streaming
    combination stream_recovery (plain parquet sink) never exercised
    (VERDICT r9 item 6; reference checkpoint contract:
    HoodieBinlogDeltaStreamer.scala:91-101).

    Two-phase drive: phase 1 streams every event as an INSERT envelope
    through ``start_binlog_streamer`` (transformer derives the dt
    partition, tables land hive-partitioned), then the query is STOPPED
    — offsets committed. Phase 2 appends a second source file that
    RE-DELIVERS all phase-1 envelopes (at-least-once semantics) plus
    same-day UPDATE envelopes (ts+1h, hour≤22 so dt cannot move; data
    marked ``u:``) for every ``event_id % 3 = 0``, and RESTARTS the
    streamer from the same checkpoint. Recovery must skip the processed
    file, apply the new one, and let precombine resolve the redelivered
    duplicates — a replayed phase-1 batch double-applies nothing
    (idempotent upsert), a lost phase-2 batch drops n_updated, a
    restart-from-zero doubles n; all flip the oracle hash.

    Scale: identical plan shapes to stream_demux_transform — recovery
    adds only the checkpoint's file-source ledger lookup at restart."""
    import os
    import tempfile

    from .lake import HudiTable
    from .operators.transform import TRANSFORMER_SQL_KEY
    from .streaming.cdc import read_binlog_stream
    from .streaming.demux import start_binlog_streamer

    e = _t(spark, sf_dir, "events")["events"]
    envelope = e.select(
        F.lit("shop").alias("db"),
        F.col("event_type").alias("table"),
        F.col("event_id").alias("id"),
        F.col("ts"),
    )
    inserts = envelope.select(
        F.lit("insert").alias("op"),
        "db",
        "table",
        "id",
        F.col("id").cast("string").alias("data"),
        "ts",
    )
    updates = (
        envelope.filter((F.col("id") % 3 == 0) & (F.hour("ts") <= 22))
        .select(
            F.lit("update").alias("op"),
            "db",
            "table",
            "id",
            F.concat(F.lit("u:"), F.col("id").cast("string")).alias("data"),
            # +1h with hour≤22 keeps the derived dt in the same day, so
            # the update competes in-place by precombine instead of
            # landing in a different partition
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        )
    )
    tables = sorted(
        r["table"] for r in envelope.select("table").distinct().collect()
    )
    n_phase1 = inserts.count()
    n_phase2 = n_phase1 + updates.count()

    root = tempfile.mkdtemp(prefix="stream_demux_rec_")
    src_dir, lake_root = os.path.join(root, "src"), os.path.join(root, "lake")
    ckpt = os.path.join(root, "ckpt")
    props = {
        "option.hoodie.path": lake_root + "/{db}/ods_{db}_{table}",
        TRANSFORMER_SQL_KEY: (
            "SELECT *, nvl(cast(to_date(ts) as string), '1970-01-01') AS dt "
            "FROM <SRC>"
        ),
    }
    for t in tables:
        props[f"shop.{t}.hoodie.datasource.write.partitionpath.field"] = "dt"

    def _run(expected_total: int) -> None:
        q = start_binlog_streamer(
            spark,
            read_binlog_stream(spark, src_dir, database_pattern="shop"),
            props,
            checkpoint_location=ckpt,
            trigger_seconds=1,
        )
        try:
            _await_stream_rows(q, expected_total, 180)
        finally:
            q.stop()

    def _stage(df, seq: int) -> None:
        # the binlog contract: file names MONOTONIC in arrival order
        # (sources/standin._binlog_files) — a raw write.json part file
        # carries a random uuid that can sort BEFORE already-consumed
        # files and fall behind the source's name high-water mark
        import glob as _glob
        import shutil

        staging = os.path.join(root, f"staging{seq}")
        df.coalesce(1).write.json(staging)
        os.makedirs(src_dir, exist_ok=True)
        (part,) = _glob.glob(os.path.join(staging, "part-*.json"))
        shutil.move(part, os.path.join(src_dir, f"binlog.{seq:06d}.json"))

    _stage(inserts, 1)
    _run(n_phase1)  # phase 1: inserts land, offsets commit, query dies
    # phase 2: redelivered phase-1 envelopes + the updates, one new file
    _stage(inserts.unionByName(updates), 2)
    _run(n_phase2)  # restart from the same checkpoint

    parts = [
        HudiTable(
            path=f"{lake_root}/shop/ods_shop_{t}",
            record_key="id",
            precombine="ts",
            partition_field="dt",
        )
        .read(spark)
        .select(
            F.lit(t).alias("tbl"),
            F.col("id").alias("event_id"),
            F.col("dt").cast("string").alias("dt"),
            F.col("data"),
        )
        for t in tables
    ]
    routed = parts[0]
    for p in parts[1:]:
        routed = routed.unionByName(p)
    return routed.groupBy("tbl", "dt").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.sum(F.when(F.col("data").startswith("u:"), 1).otherwise(0)).alias(
            "n_updated"
        ),
    )


@query(
    "binlog_stream_scan",
    oracle="""
    SELECT event_type AS tbl, COUNT(*) AS n,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def binlog_stream_scan(spark, sf_dir):
    """A11/C-family driver smoke: ``readStream.format("mysql-binlog")``
    end to end — the reference's exact streaming read path
    (HoodieBinlogDeltaStreamer.scala:77-89) resolved through the
    registered streaming Python Data Source stand-in. The fixture holds
    the events table as CDC envelopes PLUS two planted decoy families —
    a foreign-db copy (db='noise') and a pre-start-position copy
    (binlog_file mysql-bin.000001 when reading from binlogIndex=2) — so
    the oracle only matches if the source's server-side db-pattern and
    binlog-position filtering both engage: a forwarding bug that drops
    an option doubles a count and flips the hash.

    Scale note: a binlog is ONE ordered byte stream tailed from a single
    connection (what spark-binlog does too) — the single-reader source is
    the honest topology; parallelism starts at the demux shuffle."""
    import os
    import tempfile

    from .streaming.cdc import read_binlog_stream

    e = _t(spark, sf_dir, "events")["events"]
    real = e.select(
        F.lit("insert").alias("op"),
        F.lit("shop").alias("db"),
        F.col("event_type").alias("table"),
        F.col("event_id").alias("id"),
        F.col("value").cast("string").alias("data"),
        F.col("ts"),
        F.lit("mysql-bin.000002").alias("binlog_file"),
        # +1000 keeps every offset past the start position (offset 4):
        # low event_ids must not be start-position-filtered away
        (F.col("event_id") + 1000).alias("binlog_offset"),
    )
    decoy_db = real.withColumn("db", F.lit("noise"))
    decoy_pos = real.withColumn("binlog_file", F.lit("mysql-bin.000001"))
    expected = real.count()
    root = tempfile.mkdtemp(prefix="binlog_scan_")
    src_dir = os.path.join(root, "src")
    real.unionByName(decoy_db).unionByName(decoy_pos).coalesce(1).write.json(
        src_dir
    )
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    q = (
        read_binlog_stream(
            spark,
            src_dir,
            database_pattern="shop",
            binlog_index=2,
            binlog_file_offset=4,
        )
        .select("table", "id", "data")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        _await_stream_rows(q, expected, 180)
    finally:
        q.stop()
    from .queries import dsum

    return (
        spark.read.parquet(out)
        .groupBy(F.col("table").alias("tbl"))
        .agg(
            F.count("*").alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
            dsum(F.col("data").cast("double")).alias("total_value"),
        )
    )


@query(
    "binlog_purge_recovery",
    oracle="""
    SELECT event_type AS tbl, event_id % 3 AS phase,
           COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY 1, 2
    """,
)
def binlog_purge_recovery(spark, sf_dir):
    """A11/C3: binlog rotation + ``PURGE BINARY LOGS`` under a live
    tailer, driven end to end through the streaming source (VERDICT
    r10 ask — promotes the purge-under-tailer pytest coverage to a
    driver row, because purge-from-the-front is the offset model's
    riskiest operation).

    Three phases over a disjoint 3-way split of events (event_id % 3),
    one binlog file each, stopping the query between phases:

    1. consume ``binlog.000001`` (commits a name-mark offset);
    2. restart from the checkpoint, consume ``binlog.000002`` (the
       restart must resume past the mark — a regressing mark would
       replay phase 1);
    3. both consumed binlogs are PURGED (MySQL purges from the front
       under live tailers) before ``binlog.000003`` arrives — the name
       mark must hold (an index-based offset would shift and swallow
       the new file; a regressing mark would replay).

    Every event must land exactly once: a replay doubles a phase's n,
    a swallowed file empties one, and either flips the oracle hash.
    The per-(table, phase) aggregate pins all three transitions.

    History note: through r11 phase 2 additionally rewrote the
    checkpoint to the pre-r10 ``{"files": n}`` count offset and pinned
    the upgrade path's transition batch; that branch met its
    documented retirement criterion and was deleted in r12 (a count
    offset now fails loudly — see sources/standin.py
    ``_files_between`` and test_standin_sources' retirement test)."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from .streaming.cdc import read_binlog_stream

    e = _t(spark, sf_dir, "events")["events"]
    envelopes = e.select(
        F.lit("insert").alias("op"),
        F.lit("shop").alias("db"),
        F.col("event_type").alias("table"),
        F.col("event_id").alias("id"),
        F.col("value").cast("string").alias("data"),
        F.col("ts"),
    )
    root = tempfile.mkdtemp(prefix="binlog_purge_")
    src_dir = os.path.join(root, "src")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    os.makedirs(src_dir, exist_ok=True)

    def _stage(df, seq: int) -> None:
        # name-monotonic arrival (the binlog contract): move the single
        # part file under a sequenced name — a raw uuid part name can
        # sort BEFORE the high-water mark and fall outside the stream
        staging = os.path.join(root, f"staging{seq}")
        df.coalesce(1).write.json(staging)
        (part,) = _glob.glob(os.path.join(staging, "part-*.json"))
        shutil.move(part, os.path.join(src_dir, f"binlog.{seq:06d}.json"))

    def _run(expected: int) -> None:
        q = (
            read_binlog_stream(spark, src_dir, database_pattern="shop")
            .select("table", "id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="1 seconds")
            .start()
        )
        try:
            _await_stream_rows(q, expected, 180)
        finally:
            q.stop()

    phases = [envelopes.filter(F.col("id") % 3 == k) for k in (0, 1, 2)]
    counts = [p.count() for p in phases]

    _stage(phases[0], 1)
    _run(counts[0])
    _stage(phases[1], 2)
    _run(counts[1])  # checkpoint restart: resume past the name mark
    for consumed in ("binlog.000001.json", "binlog.000002.json"):
        os.remove(os.path.join(src_dir, consumed))  # PURGE BINARY LOGS
    _stage(phases[2], 3)
    _run(counts[2])  # name mark holds across the purge

    return (
        spark.read.parquet(out)
        .groupBy(
            F.col("table").alias("tbl"), (F.col("id") % 3).alias("phase")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )


@query(
    "stream_stateful",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_stateful(spark, sf_dir):
    """C6+ custom stateful operator, driver-visible: a REAL
    applyInPandasWithState stream (streaming/stateful.py user-profile
    state machine) over the events source, update-mode memory sink,
    available-now trigger. With one micro-batch each user emits exactly
    one final profile row, so the exact-count/last-seen invariant is the
    batch GROUP BY — a state-store bug (lost rows, stale last_ts,
    double-applied batch) flips the oracle hash. total_value stays
    internal: pandas float summation order is engine-specific, and the
    driver hash is repr-strict.

    Scale: per-user state rides the state store (checkpointed,
    RocksDB-capable); each key crosses the JVM→Python boundary once per
    trigger, Arrow-batched."""
    import os
    import tempfile
    import uuid

    from .streaming.stateful import user_profile_stream

    src = os.path.join(sf_dir, "events.parquet")
    # events.ts is TIMESTAMP(NANOS) parquet — read as raw long, truncate
    # to micros (catalog.load_table's convention, DuckDB-matching)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    root = tempfile.mkdtemp(prefix="stream_stateful_")
    src_dir = os.path.join(root, "src")  # dir-staged source, see stream_trigger
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "events.parquet"))
    stream = spark.readStream.schema(schema).parquet(src_dir)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    sink = f"profiles_{uuid.uuid4().hex[:8]}"
    q = (
        user_profile_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select("user_id", "n_events", "last_ts")


@query(
    "join_salted",
    oracle="""
    WITH dim AS (
      SELECT user_id, COUNT(*) AS user_n FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, d.user_n
    FROM events e JOIN dim d ON e.user_id = d.user_id
    """,
)
def join_salted(spark, sf_dir):
    """Skew-salted equi-join ≡ plain join (the oracle): the fact side's
    hot key is sharded into SALT sub-keys via a deterministic row hash,
    the dim side is replicated SALT ways with an exploded salt column,
    and the join runs on (key, salt) — each hot key's rows spread over
    SALT reducers instead of one. The events fixture is exactly the
    shape that needs this: ~150 distinct user_ids, so an unsalted
    shuffle join caps at 150 useful tasks and hot users straggle."""
    SALT = 8
    e = _t(spark, sf_dir, "events")["events"]
    dim = e.groupBy("user_id").agg(F.count("*").alias("user_n"))
    salted_fact = e.select(
        "event_id", "user_id",
        F.pmod(F.hash("event_id"), F.lit(SALT)).alias("_salt"),
    )
    rep_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    return (
        salted_fact.join(rep_dim, ["user_id", "_salt"])
        .select("event_id", "user_id", "user_n")
    )


# ---------------------------------------------------------------------------
# mode / unpivot / multimodal resize
# ---------------------------------------------------------------------------


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status, cnt
    FROM c
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_orderpriority ORDER BY cnt DESC, o_orderstatus DESC
    ) = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Deterministic per-group mode (most frequent value, ties broken by
    the larger value — SQL MODE() leaves ties undefined, so the rank
    form IS the portable contract). Two keyed aggregations, both
    partial-aggregated; the rank window partitions by the group key, so
    no global ordering anywhere."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), F.col("o_orderstatus").desc()
    )
    return (
        c.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_orderpriority", F.col("o_orderstatus").alias("mode_status"), "cnt"
        )
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           CAST(l_quantity AS DOUBLE) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           CAST(l_extendedprice AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           CAST(l_discount AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax',
           CAST(l_tax AS DOUBLE) FROM lineitem
    """,
)
def unpivot_measures(spark, sf_dir):
    """Wide→long melt via the native ``unpivot`` operator (B-surface
    extension): one narrow Generate per row, no shuffle at all — the
    long form is what per-measure aggregation pipelines consume."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    wide = li.select(
        "l_orderkey", "l_linenumber",
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    return wide.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=cols,
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "mm_resize",
    oracle="""
    WITH d AS (
      -- char-wise substr == byte slice ONLY for ASCII; fail loudly if
      -- the corpus ever stops being ASCII instead of hash-mismatching
      SELECT doc_id, text, sha256(text) AS h,
             CASE WHEN octet_length(CAST(text AS BLOB)) <> length(text)
                  THEN error('mm oracle requires an ASCII corpus')
                  ELSE octet_length(CAST(text AS BLOB)) END AS len
      FROM documents
    ), dims AS (
      SELECT doc_id, text, len,
             ('0x' || substr(h, 1, 4))::INTEGER % 1920 + 1 AS in_w,
             ('0x' || substr(h, 5, 4))::INTEGER % 1080 + 1 AS in_h
      FROM d
    ), fit AS (
      -- integer fit: the bound side is EXACTLY 224 (width binds iff
      -- in_h <= in_w), the other side integer-floors — the float form
      -- trunc(in_w * least(224.0/in_w, ...)) emitted 223 for ~9% of
      -- widths (224*x/x computing as 223.99999999999997)
      SELECT doc_id, text, len, in_w, in_h,
             CAST(CASE WHEN in_h <= in_w THEN 224
                       ELSE GREATEST(1, (in_w * 224) // in_h)
                  END AS INT) AS out_w,
             CAST(CASE WHEN in_h <= in_w
                       THEN GREATEST(1, (in_h * 224) // in_w)
                       ELSE 224
                  END AS INT) AS out_h
      FROM dims
    )
    SELECT doc_id, in_w, in_h, out_w, out_h,
           CAST(LEAST(len, GREATEST(1, (out_w * out_h) // 256)) AS INT)
             AS resized_bytes,
           sha256(substr(text, 1,
                         CAST(GREATEST(1, (out_w * out_h) // 256) AS BIGINT)))
             AS resized_sha
    FROM fit
    """,
)
def mm_resize(spark, sf_dir):
    """Multimodal resize plumbing: aspect-preserving fit into a 224×224
    box over Arrow-batched payload batches (mapInPandas) — the codec is
    a deterministic stand-in (no imaging libs in this container), the
    batch shape and scale math are production-real. Exact oracle: the
    fake decode derives (w, h) from the payload's sha256, which DuckDB
    recomputes via hex-cast of the digest prefix; the fit math is plain
    IEEE doubles in both engines; the resized payload is a byte-budget
    prefix, fingerprinted slice-for-slice (ASCII corpus, so char substr
    = byte slice)."""
    from .operators import multimodal as M

    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    # use_codec=False pins the stand-in branch (the oracle contract)
    return M.resize_media(M.attach_payload(d), use_codec=False).select(
        "doc_id",
        "in_w",
        "in_h",
        "out_w",
        "out_h",
        F.octet_length("resized").alias("resized_bytes"),
        F.sha2(F.col("resized"), 256).alias("resized_sha"),
    )


# ---------------------------------------------------------------------------
# TPC-H composite pipelines (multi-join + agg + top-k, the full-query demos)
# ---------------------------------------------------------------------------


@query(
    "tpch_q3_shape",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_shape(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority): selective dimension filter →
    two hash joins → keyed aggregate → top-10. Catalyst pushes both date
    filters to the scans and broadcasts the filtered customer side; the
    top-10 is TakeOrdered (per-partition heaps). Exact decimal revenue,
    l_orderkey tiebreak = total order."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    from .queries import dsum

    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10_shape(spark, sf_dir):
    """TPC-H Q10 shape (returned-item ranking): three hash joins (nation
    broadcast), quarter date window + returnflag pushed to the scans,
    keyed aggregate, top-20 TakeOrdered."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    from .queries import dsum

    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "tpch_q1_shape",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_shape(spark, sf_dir):
    """TPC-H Q1 shape (pricing summary): single-table scan with the ship-
    date filter pushed to parquet, codegen hash aggregate with map-side
    partials over a 6-value grouping key — the canonical "one wide scan,
    one tiny result" report. Averages are emitted as one double division
    of an exact-decimal sum by the group count (bit-identical cross-
    engine, unlike native AVG accumulation order).

    Reference parity: the SQL-transform hook (TransformUtils.scala:26-38)
    makes full aggregate reports like this part of the reference's
    declared surface."""
    t = _t(spark, sf_dir, "lineitem")
    from .queries import dsum

    cnt = F.count(F.lit(1))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "sum_disc_price"
            ),
            (dsum("l_quantity") / cnt).alias("avg_qty"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q5_shape",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_shape(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume): five joins where the
    region filter prunes nation, nation prunes supplier, and the
    local-supplier predicate (c_nationkey = s_nationkey) rides the
    supplier join. nation/region are broadcast (tiny dims); the
    customer-orders-lineitem chain stays as shuffled hash joins keyed on
    the natural keys — at 100 TB those are the co-partitioned fact
    spine, everything else is map-side."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier",
           "nation", "region")
    from .queries import dsum

    asia_nations = (
        F.broadcast(t["nation"])
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q18_shape",
    oracle="""
    WITH heavy AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM heavy
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def tpch_q18_shape(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): aggregate lineitem once
    into per-order quantities, keep the heavy tail, then enrich with
    orders + customer. The classic formulation re-joins lineitem and
    re-aggregates; folding the HAVING aggregate into the output avoids
    that second pass entirely — one lineitem scan instead of two. The
    heavy set is a tiny fraction of orders, so both enrichment joins
    broadcast the aggregated side at any scale where orders ≫ heavy."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    from .queries import dsum

    heavy = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        t["orders"]
        .join(F.broadcast(heavy), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
      FROM documents) WHERE rn <= 10
    """,
)
def sample_stratified(spark, sf_dir):
    """LLM-pipeline stratified sampling: an exact per-stratum quota (10
    docs per source) selected by a deterministic multiplicative hash of
    the key — a replay-stable "random" sample with guaranteed stratum
    counts, vs the Bernoulli-style bucket sample of sample_hash_docs.
    The Knuth hash (id × 2654435761 mod 2^32) is plain BIGINT
    arithmetic, so both engines rank identically — no engine-specific
    hash function in the contract.

    Scale: one hash-partitioned window per stratum (no global sort, no
    single-partition exchange); quota selection is rank-truncation
    inside each group. Mirrors the data-mixture step of corpus curation
    (fixed documents-per-domain budgets)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    w = (
        Window.partitionBy("source")
        .orderBy(F.pmod(F.col("doc_id") * 2654435761, F.lit(4294967296)), "doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "lang", "source")
    )


@query(
    "contamination_check",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                  THEN [array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')]
                  ELSE list_distinct([
                    array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' ')
                    FOR i IN range(1, len(regexp_split_to_array(trim(text), '\s+')) - 1)
                  ])
             END AS sh
      FROM documents
    ),
    bench AS (
      SELECT list_distinct(flatten(list(sh))) AS bg FROM s WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           len(list_intersect(sh, bg)) AS n_overlap,
           len(list_intersect(sh, bg)) / len(sh) AS overlap_frac
    FROM s, bench
    WHERE len(list_intersect(sh, bg)) / len(sh) >= 0.5
    """,
)
def contamination_check(spark, sf_dir):
    """LLM-pipeline decontamination: flag corpus documents whose 3-gram
    shingles overlap an eval benchmark (stand-in: every 50th document)
    at >= 50% — benchmark members themselves surface at 1.0 and their
    planted near-duplicates at their true overlap, exactly the leaks a
    training run must drop. Broadcast benchmark shingle hashes +
    map-side join; see operators.dedup.benchmark_overlap for the 100 TB
    shape."""
    from .operators.dedup import benchmark_overlap

    d = _t(spark, sf_dir, "documents")["documents"]
    return benchmark_overlap(
        d, d.filter(F.col("doc_id") % 50 == 0), "text", "doc_id", 3, 0.5
    )


@query(
    "chunk_documents",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ),
    c AS (
      SELECT doc_id, toks,
             1 + CAST(FLOOR((GREATEST(len(toks) - 64, 0) + 47) / 48.0)
                      AS BIGINT) AS n_chunks
      FROM t
    )
    SELECT doc_id,
           i - 1 AS chunk_idx,
           array_to_string(toks[(i - 1) * 48 + 1 : (i - 1) * 48 + 64], ' ')
               AS chunk_text,
           len(toks[(i - 1) * 48 + 1 : (i - 1) * 48 + 64]) AS chunk_tokens
    FROM c, UNNEST(range(1, n_chunks + 1)) AS u(i)
    """,
)
def chunk_documents(spark, sf_dir):
    """LLM-pipeline context-window chunking: 64-token windows advancing
    by 48 (16-token overlap carries context across boundaries), the
    document → training-sequence step. Pure per-row codegen (split →
    sequence → slice → posexplode), zero shuffles — see
    operators.packing.chunk_documents."""
    from .operators.packing import chunk_documents as chunk

    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    return chunk(d, "text", "doc_id", size=64, stride=48)


@query(
    "agg_percentile_sketch",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS exact_p50,
           TRUE AS sketch_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentile_sketch(spark, sf_dir):
    """Sketch quantiles (approx_percentile / KLL-style) — the 100 TB
    path for percentiles: mergeable per-partition sketches, no global
    sort, bounded memory, vs the exact interpolated quantile of
    agg_percentile. The raw sketch value is engine-specific, so the
    checkable output is the invariant part: group keys, the exact
    interpolated median, and ``sketch_ok`` — whether the sketch landed
    within 2% of exact (same contract shape as agg_approx_distinct).
    If the sketch machinery regresses the flag flips and the driver
    hash catches it."""
    o = _t(spark, sf_dir, "orders")["orders"]
    exact = F.expr(
        "percentile(CAST(o_totalprice AS DOUBLE), 0.5)"
    ).alias("exact_p50")
    approx = F.expr(
        "approx_percentile(CAST(o_totalprice AS DOUBLE), 0.5, 10000)"
    ).alias("approx_p50")
    return (
        o.groupBy("o_orderpriority")
        .agg(exact, approx)
        .select(
            "o_orderpriority",
            F.col("exact_p50"),
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= F.abs(F.col("exact_p50")) * F.lit(0.02)
            ).alias("sketch_ok"),
        )
    )


@query(
    "hist_totalprice",
    oracle="""
    WITH b AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
               FROM orders)
    SELECT CAST(LEAST(19, FLOOR((o_totalprice - mn) / ((mx - mn) / 20)))
                AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM orders, b GROUP BY 1
    """,
)
def hist_totalprice(spark, sf_dir):
    """Data-profiling histogram: 20 equi-width buckets over
    o_totalprice — the distribution snapshot that drives partition-key
    and skew decisions. The min/max pre-pass is a 2-scalar aggregate
    broadcast into the bucketing expression (1-row crossJoin = a free
    BroadcastNestedLoop of one row); bucket math is a single double
    division identical in both engines, and the top edge folds into the
    last bucket. One scan + one partial-agg shuffle of 20 groups."""
    o = _t(spark, sf_dir, "orders")["orders"]
    b = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    return (
        o.crossJoin(F.broadcast(b))
        .select(
            F.least(
                F.lit(19),
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / 20)
                ),
            )
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "keyword_extract",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term)
    SELECT doc_id, term, tf, df FROM (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rn
      FROM tf JOIN df USING (term)) WHERE rn <= 3
    """,
)
def keyword_extract(spark, sf_dir):
    """Keyword extraction (the TF-IDF plan shape): per-document top-3
    terms ranked by term frequency with document-frequency rarity as
    the tie-break — the contract stays in integers (tf, df), so the
    ranking is engine-exact while exercising the full pipeline: token
    explode → per-doc tf agg → corpus df agg → broadcast df join →
    per-doc top-k window. At 100 TB the df side is the vocabulary
    (small after the agg) and broadcasts; the window partitions by doc,
    never globally."""
    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df falls out of tf — one row per (doc, term) already — as a count
    # window over the term partition: the corpus is tokenized and
    # scanned exactly once (a tf⋈df join would re-evaluate the whole
    # tf subtree on the build side; Spark does not dedupe shared
    # subtrees across join branches)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), "term"
    )
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df")
    )


# ---------------------------------------------------------------------------
# corpus curation composites: filter funnel + deterministic split
# ---------------------------------------------------------------------------


@query(
    "corpus_filter_funnel",
    oracle=r"""
    WITH q AS (
      SELECT doc_id, lang, sha256(text) AS fp,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             length(text)
               / len(regexp_split_to_array(trim(text), '\s+')) AS awl
      FROM documents
    ), flagged AS (
      SELECT lang, fp,
             CASE WHEN n_words >= 25 AND n_words <= 85
                       AND awl < 5.6 THEN 1 ELSE 0 END AS ok
      FROM q
    )
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(ok) AS BIGINT) AS n_quality,
           COUNT(DISTINCT CASE WHEN ok = 1 THEN fp END) AS n_kept
    FROM flagged GROUP BY lang
    """,
)
def corpus_filter_funnel(spark, sf_dir):
    """Pretraining filter funnel, end to end in one pass: per language,
    how many documents enter, how many survive the quality gate
    (word-count band + average-word-length cap — the Gopher-style rule
    shapes that fit this corpus), and how many remain after exact
    dedup (distinct content fingerprints among survivors). One scan,
    one hash aggregate keyed on lang; the dedup stage rides the same
    aggregate as a conditional distinct count rather than a second
    shuffle — at 100 TB this is the report you run before and after
    every new filter rule."""
    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    n_words = T.token_count_ws(F.col("text"))
    awl = F.length("text") / n_words
    ok = ((n_words >= 25) & (n_words <= 85) & (awl < 5.6)).cast("int")
    return (
        d.select(
            "lang",
            F.sha2(F.col("text"), 256).alias("fp"),
            ok.alias("ok"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("ok").alias("n_quality"),
            F.count_distinct(
                F.when(F.col("ok") == 1, F.col("fp"))
            ).alias("n_kept"),
        )
    )


@query(
    "split_train_val",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             (('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
               % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM b GROUP BY 1, 2
    """,
)
def split_train_val(spark, sf_dir):
    """Deterministic stratified train/val/test assignment: each doc's
    split comes from a content-free, engine-portable hash of its id
    (first 8 hex chars of sha256 → bucket 0-99 → 80/10/10), so the
    assignment is stable across runs, engines, and re-partitioning —
    the property that keeps eval sets fixed as the corpus grows. Narrow
    per-row hashing + one tiny keyed aggregate for the report; the
    per-doc assignment (b.bucket) is the reusable operator surface."""
    d = scatter(_t(spark, sf_dir, "documents")["documents"])
    bucket = (
        F.conv(F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"), "doc_id")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# event analytics composites: ordered funnel + retention cohorts
# ---------------------------------------------------------------------------


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase, strictly
    later timestamps): how many users reach each stage. Each stage is a
    keyed MIN aggregate joined to the previous stage's anchor time —
    every join and aggregate shares the user_id partitioning, so at
    100 TB the three stages ride one co-partitioned shuffle chain
    (exchange reuse), never a per-event self-join of the full log."""
    e = _t(spark, sf_dir, "events")["events"].select("user_id", "ts", "event_type")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events
    )
    SELECT cohort_week, active_week, COUNT(*) AS n_users
    FROM first_seen JOIN activity USING (user_id)
    GROUP BY cohort_week, active_week
    """,
)
def retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-seen week,
    counted in every week they were active — the triangle matrix every
    growth dashboard draws. Two user-keyed aggregates joined on user
    (co-partitioned — one shuffle chain), then a small keyed count; the
    week floor is ISO-Monday date_trunc in both engines."""
    e = _t(spark, sf_dir, "events")["events"]
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def _events_event_time(schema):
    """Event-time Column for the events fixture's ``ts``, whichever way it
    loaded: the parquet column is TIMESTAMP(NANOS), which arrives as a
    nanos BIGINT when ``spark.sql.legacy.parquet.nanosAsLong`` was set
    earlier in the session, or as TIMESTAMP_NTZ natively. Both forms are
    floored to microseconds — matching DuckDB's nanos->micros truncation,
    so micro-resolution comparisons agree cross-engine."""
    ts_is_long = dict(zip(schema.names, schema.fields))[
        "ts"
    ].dataType.simpleString() in ("bigint", "long")
    if ts_is_long:
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


@query(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id AS user_id,
           CAST(date_diff('microsecond', v.ts, c.ts) AS BIGINT)
             AS usec_between
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark, sf_dir):
    """C-family extension: WATERMARKED STREAM-STREAM INNER JOIN — the
    click-attribution shape (every click within 1 hour after a view by
    the same user) joined across two live streams, the one Structured
    Streaming feature class the registry didn't yet exercise. Both sides
    are real ``readStream`` file sources over the events fixture; each
    carries a 2-hour watermark and the join condition bounds click_time
    to [view_time, view_time + 1h], so Spark derives a state-eviction
    horizon for BOTH buffers instead of holding either stream forever.
    Inner-join matches emit exactly once as they are found; the oracle is
    the equivalent batch self-join, so a dropped buffer row, a premature
    state eviction, or a double-emit flips the hash.

    Scale: both streams hash-partition on user_id (the equi-key) — state
    and matching are distributed per key; the time-bound condition keeps
    per-key buffered state to the 1-2 h horizon, the knob that makes
    stream-stream joins feasible on unbounded 100 TB streams."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    root = tempfile.mkdtemp(prefix="stream_ssjoin_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    src_dir = os.path.join(root, "src")
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "events.parquet"))

    def side(event_type, id_alias, time_alias, user_alias):
        return (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user_alias),
                _events_event_time(schema).alias(time_alias),
            )
            .withWatermark(time_alias, "2 hours")
        )

    views = side("view", "view_id", "view_time", "user_id")
    clicks = side("click", "click_id", "click_time", "c_user_id")
    # State-partition sizing: a streaming join pins its state-store
    # partition count to spark.sql.shuffle.partitions at FIRST run (it's
    # baked into the checkpoint). Each partition pays fixed WAL-commit +
    # snapshot cost per micro-batch (~0.18 s/partition measured,
    # BASELINE.md), so pick the SMALLEST count whose per-partition state
    # fits executor memory: 4 at this fixture's volume (probe:
    # 4 -> 1.95 s vs 8 -> 2.50 s vs 32 -> 7.80 s); a 100 TB/day stream
    # raises it proportionally to keyed state volume BEFORE first start.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    joined = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_time") >= F.col("view_time"))
        & (
            F.col("click_time")
            <= F.col("view_time") + F.expr("INTERVAL 1 HOUR")
        ),
        "inner",
    ).select(
        "view_id",
        "click_id",
        "user_id",
        (
            F.unix_micros(F.col("click_time"))
            - F.unix_micros(F.col("view_time"))
        ).alias("usec_between"),
    )
    try:
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.read.parquet(out)


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark, sf_dir):
    """C-family extension: STREAM-STATIC ENRICHMENT JOIN — the standard
    ingest-time dimension lookup (each streaming event joined to the
    static customer dim on user_id = c_custkey) running inside a real
    StreamingQuery. The static side is broadcast per micro-batch (no
    stream-side shuffle, no state store — unlike stream-stream joins a
    static join is stateless), the enriched rows land in a parquet sink,
    and the read-back aggregates per market segment; a missed or
    duplicated enrichment flips the oracle hash.

    Scale: the dim is broadcast once per batch to every executor — the
    map-side-join pattern that enriches a 100 TB/day stream without
    shuffling it; a dim too large to broadcast falls back to a keyed
    shuffle join, which Spark picks automatically without code changes."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    dim = _t(spark, sf_dir, "customer")["customer"].select(
        "c_custkey", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="stream_static_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    src_dir = os.path.join(root, "src")
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "events.parquet"))
    enriched = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .select("event_id", "user_id", "value")
        .join(
            F.broadcast(dim),
            F.col("user_id") == F.col("c_custkey"),
            "inner",
        )
        .select("event_id", "c_mktsegment", "value")
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from .queries import dsum

    return (
        spark.read.parquet(out)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "scd2_build",
    oracle="""
    SELECT user_id, event_id, value, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_build(spark, sf_dir):
    """Lakehouse dimension versioning: build a SLOWLY-CHANGING-DIMENSION
    TYPE 2 table from a change log — each per-user event becomes a
    versioned row with a [valid_from, valid_to) validity interval, the
    newest version open-ended (valid_to NULL, is_current true). This is
    the merge shape every warehouse dim table needs on top of CDC ingest
    (the reference's binlog path lands the raw changes; SCD2 is the
    queryable history). LEAD over (user, time) closes each interval with
    the next version's start; (ts, event_id) breaks same-timestamp ties
    deterministically.

    Scale: one keyed window — state is per-user and the shuffle is the
    same user_id hash partition the CDC apply already needs; no global
    ordering anywhere."""
    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "outlier_zscore",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), g AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS q
      FROM c GROUP BY o_orderpriority
    )
    SELECT c.o_orderkey, c.o_orderpriority, c.cents
    FROM c JOIN g USING (o_orderpriority)
    WHERE (n * c.cents - s) * (n * c.cents - s) > 9 * (n * q - s * s)
    """,
)
def outlier_zscore(spark, sf_dir):
    """EXACT distributed outlier detection — rows more than 3 population
    standard deviations from their group mean, decided in INTEGER
    arithmetic so the cut is bit-identical across engines and partition
    counts: |x-mu| > 3*sigma is algebraically (n*x - s)^2 > 9*(n*q - s^2)
    with s=SUM(x), q=SUM(x^2) over integer cents, evaluated in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — no doubles anywhere after
    the cents floor, so no borderline row can flip on association order.

    Scale: one partial+final aggregate for the 5-row group-stats table,
    broadcast back, map-side filter — the scan is the only full pass and
    the decision is pipelined into it. The 128-bit headroom holds to
    ~1e6 rows/group x 8-digit cents; beyond that (true 100 TB groups)
    swap the q/s moments to DOUBLE and accept float tolerance — the
    two-phase plan is unchanged."""
    o = _t(spark, sf_dir, "orders")["orders"]
    c = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * F.lit(100)).cast("long").alias("cents"),
    )
    dec = F.col("cents").cast("decimal(38,0)")
    g = c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("q"),
    )
    joined = c.join(F.broadcast(g), "o_orderpriority")
    dev = F.col("n") * dec - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return joined.filter(dev * dev > F.lit(9).cast("decimal(38,0)") * var_n2).select(
        "o_orderkey", "o_orderpriority", "cents"
    )


@query(
    "stream_stream_left_join",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id AS user_id,
           CAST(date_diff('microsecond', v.ts, c.ts) AS BIGINT)
             AS usec_between
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_left_join(spark, sf_dir):
    """C-family extension: WATERMARKED STREAM-STREAM LEFT OUTER JOIN —
    attribution with explicit non-conversion rows: every view emits,
    matched views as they pair with clicks, UNMATCHED views only when
    the watermark proves no in-horizon click can still arrive (outer
    results require state-expiry certainty, the semantics inner joins
    don't need). To make the expiry observable under availableNow, a
    sentinel file (one far-future view + click on out-of-band negative
    user ids) lands in the LAST micro-batch: it pushes both watermarks
    past every real view's horizon, and the engine's no-data micro-batch
    then flushes all surviving NULL-padded rows to the sink. The
    sentinels themselves never emit — the view sentinel's own horizon
    stays beyond the final watermark, and unmatched right-side rows
    don't emit from a left join.

    Scale: identical state layout to the inner form (user_id-keyed
    buffers, horizon-bounded); the only addition is the expiry pass,
    which is how production left-outer attribution decides
    'no conversion' without a batch backfill."""
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    batch = spark.read.schema(schema).parquet(src)
    ts_is_long = dict(zip(schema.names, schema.fields))[
        "ts"
    ].dataType.simpleString() in ("bigint", "long")
    # sentinel event time: far past every real view's +1h horizon
    if ts_is_long:
        far = F.lit(10 * 365 * 24 * 3600 * 10**9).cast("long")
    else:
        far = F.expr("INTERVAL 3650 DAYS")
    sent = (
        batch.groupBy()
        .agg(F.max("ts").alias("mx"))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(-1).cast("long").alias("event_id"),
                        (F.col("mx") + far).alias("ts"),
                        F.lit(-1).cast("long").alias("user_id"),
                        F.lit("view").alias("event_type"),
                        F.lit(0.0).alias("value"),
                        F.lit(None).cast("string").alias("props"),
                    ),
                    F.struct(
                        F.lit(-2).cast("long").alias("event_id"),
                        (F.col("mx") + far).alias("ts"),
                        F.lit(-2).cast("long").alias("user_id"),
                        F.lit("click").alias("event_type"),
                        F.lit(0.0).alias("value"),
                        F.lit(None).cast("string").alias("props"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
        .select([f.name for f in schema.fields])
    )
    root = tempfile.mkdtemp(prefix="stream_ssloj_")
    out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    src_dir = os.path.join(root, "src")
    os.mkdir(src_dir)
    os.symlink(src, os.path.join(src_dir, "a_events.parquet"))
    sent_tmp = os.path.join(root, "sent")
    sent.coalesce(1).write.parquet(sent_tmp)
    part = [p for p in os.listdir(sent_tmp) if p.endswith(".parquet")][0]
    # written after the symlink -> later mtime -> last micro-batch
    shutil.copyfile(
        os.path.join(sent_tmp, part), os.path.join(src_dir, "z_sentinel.parquet")
    )

    def side(event_type, id_alias, time_alias, user_alias):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user_alias),
                _events_event_time(schema).alias(time_alias),
            )
            .withWatermark(time_alias, "2 hours")
        )

    views = side("view", "view_id", "view_time", "user_id")
    clicks = side("click", "click_id", "click_time", "c_user_id")
    # state-partition sizing: see stream_stream_join
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    joined = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_time") >= F.col("view_time"))
        & (
            F.col("click_time")
            <= F.col("view_time") + F.expr("INTERVAL 1 HOUR")
        ),
        "leftOuter",
    ).select(
        "view_id",
        "click_id",
        "user_id",
        (
            F.unix_micros(F.col("click_time"))
            - F.unix_micros(F.col("view_time"))
        ).alias("usec_between"),
    )
    try:
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


@query(
    "stream_complete_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_complete_agg(spark, sf_dir):
    """C2-family completion: COMPLETE output mode — the third streaming
    output mode (append and update are exercised elsewhere): a running
    grouped aggregate whose FULL result is re-emitted every trigger into
    a memory sink. The source is split across micro-batches
    (maxFilesPerTrigger=1 over two half-files), so the final table is
    only correct if the aggregation state carried across batches and the
    last emission replaced, not appended to, the earlier partials.

    Scale: complete mode re-emits the whole result per trigger — viable
    exactly when the aggregate output is small (keyed rollups,
    dashboards); the state itself is the same hash-partitioned agg state
    update mode uses."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    batch = spark.read.schema(schema).parquet(src)
    root = tempfile.mkdtemp(prefix="stream_complete_")
    src_dir = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    os.mkdir(src_dir)
    # two half-files -> the aggregate must merge state across batches
    batch.filter(F.col("event_id") % 2 == 0).write.parquet(
        os.path.join(src_dir, "a")
    )
    batch.filter(F.col("event_id") % 2 == 1).write.parquet(
        os.path.join(src_dir, "b")
    )
    from .queries import dsum

    name = "complete_agg_" + os.path.basename(root)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "url_canonicalize",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'HTTPS://CDN-' || source || '.Example.COM:443/a/b/'
               || CAST(doc_id % 7 AS VARCHAR)
               || '/?utm_source=x&id=' || CAST(doc_id % 13 AS VARCHAR)
               || '&utm_campaign=y#frag' AS url
      FROM documents
    ), canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(url), '#.*$', ''),
                   '&?utm_[a-z]+=[^&#]*', '', 'g'),
                 ':443/', '/'),
               '/\\?&?', '?') AS cu
      FROM urls
    )
    SELECT regexp_replace(cu, '\\?$', '') AS canonical_url,
           COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM canon GROUP BY 1
    """,
)
def url_canonicalize(spark, sf_dir):
    """Web-corpus URL CANONICALIZATION + dedup-by-URL: lowercase the
    scheme/host (and here the whole URL — the path set is constructed
    case-insensitive), strip the fragment, drop utm_* tracking params,
    remove the default :443 port, collapse the emptied query — then
    group by canonical form. Distinct raw URLs that differ only in
    case/port/tracking/fragment collapse to one canonical key (the
    fixture builds 91 such collision classes from 500 docs). Both
    engines run the identical regex pipeline, so the check pins the
    cross-engine regex semantics the real crawler dedup would rely on.

    Scale: map-only canonicalization pipelined into the scan; the
    group-by shuffles canonical keys once with map-side partial agg."""
    d = _t(spark, sf_dir, "documents")["documents"]
    url = F.concat(
        F.lit("HTTPS://CDN-"),
        F.col("source"),
        F.lit(".Example.COM:443/a/b/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("/?utm_source=x&id="),
        (F.col("doc_id") % 13).cast("string"),
        F.lit("&utm_campaign=y#frag"),
    )
    cu = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(url), "#.*$", ""),
                "&?utm_[a-z]+=[^&#]*",
                "",
            ),
            ":443/",
            "/",
        ),
        "/\\?&?",
        "?",
    )
    return (
        d.select(F.regexp_replace(cu, "\\?$", "").alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "agg_hll_partitioned_union",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS exact_distinct, TRUE AS sketch_ok
    FROM orders
    """,
)
def agg_hll_partitioned_union(spark, sf_dir):
    """MERGEABLE-SKETCH distinct counting — the 100 TB pattern behind
    every federated dashboard: each group/partition builds an HLL
    sketch (datasketches hll_sketch_agg), the per-group sketches MERGE
    associatively (hll_union_agg) into a global estimate — no re-scan,
    no re-shuffle of raw values, and the same sketches could be stored
    per-day and unioned per-quarter for free. The flag-form oracle pins
    the estimate within HLL's error envelope (lgK=14 → ~1.6% rel. std
    error; 5% gate) of the exact count computed in the same query."""
    o = _t(spark, sf_dir, "orders")["orders"]
    per_group = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk")
    )
    est = per_group.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("est")
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * F.lit(0.05)
        ).alias("sketch_ok"),
    )


# NOT a registry id: transformWithStateInPandas's worker protocol needs
# google.protobuf, which this container lacks — the driver gate would
# always fail. tests/test_streaming.py runs the full oracle-parity
# check for this op whenever protobuf IS importable (skip-if-absent,
# same pattern as the Hudi-bundle passthrough test), so a real
# deployment gets the coverage.
TRANSFORM_WITH_STATE_ORACLE = """
    SELECT user_id, COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS total_cents
    FROM events GROUP BY user_id
    """


def stream_transform_with_state(spark, sf_dir):
    """Spark 4's NEW arbitrary-stateful-processing API
    (``transformWithStateInPandas`` — the successor to
    applyInPandasWithState, with typed state handles and timer
    support): a StatefulProcessor keeps per-user running totals in a
    ValueState across micro-batches (the source is split in two files,
    maxFilesPerTrigger=1, so the second batch MUST read back the
    first's state), emitting the running row per update. The final
    answer per user is the update with the highest event count
    (monotone — so the reduction is deterministic), which must equal
    the batch aggregate exactly; money travels as integer cents.

    Scale: state is keyed and RocksDB-backed (the provider this API
    requires) — per-key lookups, incremental checkpointing; the same
    processor gains TTL/timers without replumbing."""
    import os
    import tempfile

    import pandas as pd_  # noqa: N813

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    src = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    batch = spark.read.schema(schema).parquet(src)
    root = tempfile.mkdtemp(prefix="stream_tws_")
    src_dir, ckpt = os.path.join(root, "src"), os.path.join(root, "ckpt")
    os.mkdir(src_dir)
    batch.filter(F.col("event_id") % 2 == 0).write.parquet(
        os.path.join(src_dir, "a")
    )
    batch.filter(F.col("event_id") % 2 == 1).write.parquet(
        os.path.join(src_dir, "b")
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("tot", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (
                tuple(self._tot.get()) if self._tot.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._tot.update((n, cents))
            yield pd_.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    prev = {
        "spark.sql.streaming.stateStore.providerClass": spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        ),
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
    }
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    name = "tws_" + os.path.basename(root)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/*")
            .select(
                "user_id",
                F.floor(F.col("value") * 100).cast("long").alias("cents"),
            )
        )
        q = (
            stream.groupBy("user_id")
            .transformWithStateInPandas(
                RunningTotals(),
                outputStructType=(
                    "user_id BIGINT, n_events BIGINT, total_cents BIGINT"
                ),
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    updates = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
    )


@query(
    "mixture_interleave",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             (CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 3) + 1
               AS weight,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
               AS rank_in_source
      FROM documents
    ), sched AS (
      SELECT doc_id, source, weight,
             (rank_in_source * 1000000) // weight AS schedule_key
      FROM w
    )
    SELECT doc_id, source, schedule_key,
           ROW_NUMBER() OVER (ORDER BY schedule_key, source, doc_id)
             AS global_pos
    FROM sched
    """,
)
def mixture_interleave(spark, sf_dir):
    """Training-data MIXTURE SCHEDULING: interleave documents from many
    sources at per-source sampling weights — the step that turns "wiki
    3x, web 1x" into one deterministic global training order. Each
    source's k-th document is scheduled at virtual time k/weight
    (integer-scaled, so the schedule is bit-exact), and the global
    order is the merge of those virtual timelines with (source, doc)
    tie-breaks — heavier sources appear proportionally more often per
    unit of schedule. Replay-stable: same corpus, same weights → the
    byte-identical order every epoch.

    Scale: per-source rank is a keyed window (source-hash shuffle); the
    global position runs through the repo's TWO-PHASE global row-number
    (range-partitioned local ranks + a metadata-sized offset broadcast,
    operators/global_windows.global_row_number) — no Exchange
    SinglePartition anywhere, same as every other global ordering in
    the package."""
    from .operators.global_windows import global_row_number

    d = _t(spark, sf_dir, "documents")["documents"]
    w = d.select(
        "doc_id",
        "source",
        (
            F.regexp_extract("source", "[0-9]+", 0).cast("long") % 3 + 1
        ).alias("weight"),
    ).withColumn(
        "rank_in_source",
        F.row_number().over(
            Window.partitionBy("source").orderBy("doc_id")
        ),
    )
    sched = w.select(
        "doc_id",
        "source",
        "weight",
        F.expr("(rank_in_source * 1000000) div weight").alias("schedule_key"),
    )
    out, _ = global_row_number(
        sched,
        [F.col("schedule_key"), F.col("source"), F.col("doc_id")],
        out_col="global_pos",
    )
    return out.select("doc_id", "source", "schedule_key", "global_pos")


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT event_id AS view_id, user_id, ts AS v_ts
      FROM events WHERE event_type = 'view'
    ), cand AS (
      SELECT p.purchase_id, v.view_id,
             ABS(date_diff('microsecond', v.v_ts, p.p_ts)) AS usec_gap,
             CAST(date_diff('microsecond', v.v_ts, p.p_ts) AS BIGINT)
               AS signed_gap
      FROM p JOIN v USING (user_id)
      WHERE ABS(date_diff('microsecond', v.v_ts, p.p_ts))
              <= 3600000000::BIGINT
    )
    SELECT purchase_id, view_id, usec_gap FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY purchase_id
        ORDER BY usec_gap, signed_gap DESC, view_id) AS rn
      FROM cand) WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """NEAREST-neighbor as-of join — the merge DuckDB's ASOF can't
    express (it is backward-only): each purchase pairs with its single
    CLOSEST view by absolute time distance within a 1-hour tolerance,
    looking BOTH directions. Ties (one view before, one after, equal
    gap) resolve to the earlier view (signed_gap DESC: the positive
    purchase-after-view gap wins), then by view id — fully
    deterministic, so the oracle brute-forces the same relation with a
    window instead of ASOF syntax.

    Scale: user-keyed equi-join bounded by the tolerance predicate +
    per-purchase argmin window — the same one-shuffle family as
    join_asof; no sort-merge interleave is required for nearest
    semantics."""
    e = _t(spark, sf_dir, "events")["events"]
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_uid"),
        F.col("ts").alias("v_ts"),
    )
    signed = F.unix_micros(F.col("p_ts").cast("timestamp")) - F.unix_micros(
        F.col("v_ts").cast("timestamp")
    )
    cand = (
        p.join(v, F.col("p_uid") == F.col("v_uid"))
        .withColumn("signed_gap", signed)
        .withColumn("usec_gap", F.abs(F.col("signed_gap")))
        .filter(F.col("usec_gap") <= F.lit(3600000000))
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("usec_gap").asc(), F.col("signed_gap").desc(), F.col("view_id").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "view_id", "usec_gap")
    )
