"""Streaming drift monitor: PSI over an events stream, exactly once.

The batch `events_psi_drift` query splits into an additive counting pass
and a bounded report (operators/drift.py). This module runs the counting
pass per micro-batch and folds it into the standing counts table through
`aggregating_sink` — the same batchId-replay-guarded, atomic-snapshot
machinery as every other sink here — so the monitor's state after any
drain equals the batch-built counts bit for bit, replays are no-ops, and
the PSI report can be served at ANY time from the standing table without
touching the event history. The per-batch work is one map-side-combined
aggregation over the batch plus a (types × 2 × 10)-sized merge; state
never grows with events, only with the bounded key space.

Reference scope: EXT (the reference is batch-only); parity with the batch
query is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.drift import psi_binned_counts, psi_report
from .sinks import aggregating_sink, read_table

PSI_KEYS = ["event_type", "phase", "bucket"]


def psi_monitor_sink(target: str):
    """``foreachBatch`` body: bin + count the batch, merge additively into
    the standing counts table at ``target``."""
    merge = aggregating_sink(target, PSI_KEYS, ["c"])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge(psi_binned_counts(batch_df), batch_id)

    return write_batch


def psi_report_from_store(spark: SparkSession, target: str) -> DataFrame | None:
    """The PSI report served from the monitor's standing counts table —
    or None before the first commit. Runs entirely on the bounded
    (types × 2 × 10) relation; the event history is never re-read."""
    counts = read_table(spark, target)
    if counts is None:
        return None
    return psi_report(counts.select(*PSI_KEYS, "c"))
