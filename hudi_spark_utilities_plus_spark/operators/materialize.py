"""Shared materialize-and-cut-lineage helper for multi-consumer
intermediates.

``persist()`` has two problems as the freeze mechanism for an
intermediate that a RETURNED DataFrame still references:

1. **It leaks.** Nothing inside the producing function can unpersist it
   (the caller's frame still needs the blocks), so every call adds a
   CacheManager entry that lives until the session dies. A long-lived
   service calling a dedup/similarity operator per request accretes
   cached full-corpus tables; eviction is LRU-best-effort, and the
   CacheManager's plan registry (used to NAME cached relations) grows
   without bound — the exact class that OOMed the driver in the
   connected-components loop (operators/graph.py).
2. **It caches data but keeps the logical plan.** Downstream re-analysis
   still walks the full upstream tree; for iterative or deeply-nested
   plans the tree itself is the cost.

``checkpoint(eager=True)`` (reliable form when the session has a
checkpoint directory — survives executor loss, the cluster posture) or
``localCheckpoint(eager=True)`` (MEMORY_AND_DISK blocks on the
executors) replaces the plan with a scan of the materialized RDD.
The interleaved A/B (BASELINE.md, round 9) measured checkpoint ≈
persist on the global-window operators.

Reclamation differs by form, so the reliable branch is CONDITIONAL:
``localCheckpoint`` blocks are freed by the ContextCleaner once the
last RDD reference is GC'd — no leak, no conf needed. Reliable
checkpoint FILES, however, are only deleted by the cleaner when
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (default
false — Spark core's ``ReliableRDDCheckpointData.cleanCheckpoint``
path); with the default, every operator call would strand a full
materialized corpus copy under the checkpoint dir for the session's
lifetime. So a set checkpoint dir opts IN to reliable materialization
only when that conf is also enabled; otherwise localCheckpoint is used
and the checkpoint dir is left to explicitly-managed checkpoints
(iterative drivers that clean up after themselves).

Use for: (a) nondeterministic intermediates whose single evaluation is a
CORRECTNESS requirement (monotonic ids, sampled range boundaries —
operators/global_windows.py); (b) deterministic compute-once
intermediates that outlive their producing function (shingle/signature
tables feeding both a candidate join and a verify join).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)

# app-ids already warned about the localCheckpoint downgrade — the
# session sets a checkpoint dir ONCE, so one notice per context is
# signal and one per operator call is noise
_WARNED_APPS: set[str] = set()


def _reliable_cleanup_enabled(sc) -> bool:
    """Whether the ContextCleaner will actually delete reliable-checkpoint
    files. Read from the STARTUP SparkConf, not the runtime session conf:
    spark.cleaner.* is a core conf the cleaner captures at context start
    (Spark 4 rejects runtime modification with CANNOT_MODIFY_CONFIG), so
    the startup value is the only one that governs reclamation."""
    return (
        sc.getConf()
        .get("spark.cleaner.referenceTracking.cleanCheckpoints", "false")
        .lower()
        == "true"
    )


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` NOW and return a frame whose plan is a scan of
    the materialized blocks (lineage cut, no CacheManager entry, no
    unreclaimed checkpoint files — module note on the conf gate).

    ``eager=False`` cuts the lineage immediately but defers the
    materializing computation to the FIRST action over the returned
    frame — one job instead of two when the caller's next step is
    already a full-partition pass (an aggregate/collect that consumes
    every partition). Only for deterministic frames whose first consumer
    provably scans everything; nondeterministic single-evaluation
    callers (global_windows) must stay eager."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        if _reliable_cleanup_enabled(sc):
            return df.checkpoint(eager=eager)
        # a caller who set a checkpoint dir for executor-loss resilience
        # is being silently downgraded (localCheckpoint blocks die with
        # their executors) — say why, once per context, so the fix
        # (enable the cleaner conf at startup) is discoverable
        app_id = sc.applicationId
        if app_id not in _WARNED_APPS:
            _WARNED_APPS.add(app_id)
            _LOG.warning(
                "materialize(): a checkpoint dir is set but "
                "spark.cleaner.referenceTracking.cleanCheckpoints is "
                "false, so reliable checkpoints would strand files "
                "there for the session lifetime — falling back to "
                "localCheckpoint (blocks do NOT survive executor "
                "loss). Set the cleaner conf at context startup to "
                "opt in to reliable materialization."
            )
    return df.localCheckpoint(eager=eager)


def materialize_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """``materialize`` fused with a row count: ONE job instead of two.

    The eager form runs a dedicated materialization job, after which
    callers needing the row count (broadcast-strategy gates) pay a second
    scan of the blocks. Marking the checkpoint LAZY and driving it with
    ``count()`` materializes every partition (count consumes each
    partition's full iterator, so the checkpoint stores complete blocks)
    and returns the count from the same job. Plan-level count pruning
    cannot bypass the work: the returned frame's plan is already a scan
    of the to-be-checkpointed RDD, not the logical tree above it.

    Only for DETERMINISTIC frames where the first consumer is this
    full-partition count — nondeterministic single-evaluation callers
    (global_windows) must keep the eager form so no partial evaluation
    can ever precede materialization.

    Reliable-checkpoint caveat (ADVICE r16): the one-job fusion holds
    for the localCheckpoint branch (blocks are stored by the count's
    own tasks). On the RELIABLE branch, ``checkpoint(eager=False)``
    writes its files in a separate job scheduled after the count — a
    second full lineage recompute (Spark core's two-pass reliable
    checkpoint; no persist() is injected here because the frames on
    this path are deterministic and typically count-once). Callers on
    the reliable branch that want one compute pass should persist()
    before calling and unpersist() after — not done by default since
    the cluster-posture branch is opt-in via the cleaner conf and the
    common path here is localCheckpoint."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None and _reliable_cleanup_enabled(sc):
        out = df.checkpoint(eager=False)
    else:
        # same downgrade-warning policy as materialize()
        if sc.getCheckpointDir() is not None:
            app_id = sc.applicationId
            if app_id not in _WARNED_APPS:
                _WARNED_APPS.add(app_id)
                _LOG.warning(
                    "materialize_counted(): checkpoint dir set but the "
                    "cleaner conf is off — using localCheckpoint."
                )
        out = df.localCheckpoint(eager=False)
    return out, out.count()
