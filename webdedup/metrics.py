"""Lineage counters and per-partition metrics (north-rule observability).

Counters — pages shingled, signatures emitted, candidate pairs, verified
dups — are collected with ``df.observe`` (zero extra actions: metrics ride
the job that materializes the DataFrame) plus per-partition row lineage via
``spark_partition_id``. Persisted as JSON next to the run's checkpoint
manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, functions as F


class PipelineMetrics:
    def __init__(self):
        self._obs: dict[str, Observation] = {}
        self.extra: dict = {}

    def observe(self, df: DataFrame, stage: str, *exprs) -> DataFrame:
        """Attach an Observation to df; metrics harvest after the next action."""
        ob = Observation(stage)
        self._obs[stage] = ob
        if not exprs:
            exprs = (F.count(F.lit(1)).alias("rows"),)
        return df.observe(ob, *exprs)

    def harvest(self) -> dict:
        out = dict(self.extra)
        for stage, ob in self._obs.items():
            try:
                out[stage] = ob.get
            except Exception:
                out[stage] = None  # stage never executed (e.g. skipped pass)
        return out

    def save(self, path: str) -> dict:
        m = self.harvest()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, default=str)
        os.replace(tmp, path)
        return m


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts — the partition-level lineage record."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("partition")
        .collect()
    )
    return [{"partition": r["partition"], "rows": r["rows"]} for r in rows]
