"""Structured Streaming ingestion for the incremental dedup pipeline.

The reference is batch-only; this is the Spark-native continuous-ingest
face the north rule's crawl scenario implies: new page files land in a
directory (or any readStream source), each micro-batch is committed as one
catalog snapshot, and the checkpoint-resumable incremental engine
(webdedup.incremental) processes it — candidates restricted to pairs
touching new docs, clusters re-resolved over the full edge store.

Streaming here is TRANSPORT, not a parallel implementation: every
micro-batch goes through exactly the batch-tested code path
(Catalog.append → IncrementalDedup.process), so streaming output ==
replaying the same batches by hand (asserted in tests/test_streaming.py).

Exactly-once ingest on top of foreachBatch's at-least-once delivery: each
micro-batch is appended with an idempotency key derived from (checkpoint
location, epoch_id), committed atomically with the catalog manifest swap.
A crash between ``source.append`` and Spark's epoch commit re-delivers the
epoch; the keyed append recognises it and returns the already-manifested
snapshot instead of ingesting the rows twice, and IncrementalDedup's
state.json + rollback make the downstream processing idempotent as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from webdedup.catalog import Catalog
from webdedup.config import DedupConfig
from webdedup.incremental import IncrementalDedup


class StreamingDedup:
    """foreachBatch bridge: micro-batch → catalog snapshot → incremental run."""

    def __init__(
        self,
        spark: SparkSession,
        work_root: str,
        cfg: DedupConfig | None = None,
        source_table: str = "pages",
    ):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.table = source_table
        import os

        self.source = Catalog(os.path.join(work_root, "ingest"))
        self.engine = IncrementalDedup(spark, self.source, work_root, self.cfg)
        self.batches_processed = 0
        self._checkpoint_dir: str | None = None

    def _epoch_key(self, epoch_id: int) -> str:
        # epoch ids restart at 0 for a fresh checkpoint (a new query), so
        # the key must be scoped to the checkpoint IDENTITY — the resolved
        # location, not the spelling the caller used: restarting the same
        # query via a relative path / trailing slash / symlink variant must
        # produce the same key, or replayed epochs re-ingest and
        # exactly-once silently degrades to at-least-once (ADVICE r3).
        # URI-form locations (file://, hdfs://, s3a://) must NOT go through
        # realpath/abspath — that would splice in the driver's cwd and make
        # the key restart-unstable; they are already absolute, so only the
        # trailing slash is normalized.
        import os

        loc = self._checkpoint_dir or ""
        if "://" in loc:
            ident = loc.rstrip("/")
        else:
            ident = os.path.realpath(os.path.abspath(loc))
        return f"ckpt={ident}#epoch={epoch_id}"

    def _legacy_epoch_key(self, epoch_id: int) -> str:
        # pre-normalization key format (raw caller spelling of the
        # checkpoint location): a manifest written before the realpath
        # upgrade stores its epochs under THIS spelling, so a stream
        # restarted across the upgrade must probe it on replay or the
        # replayed epoch misses the stored key and double-ingests once —
        # exactly-once would break at the upgrade boundary (ADVICE r4)
        return f"ckpt={self._checkpoint_dir or ''}#epoch={epoch_id}"

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        key = self._epoch_key(epoch_id)
        legacy = self._legacy_epoch_key(epoch_id)
        if legacy != key and self.source.has_key(self.table, legacy):
            # epoch already ingested under the pre-upgrade key spelling:
            # skip the append (replay), still run the engine so any
            # unprocessed manifested snapshot drains — same behavior as a
            # same-spelling keyed replay
            self.engine.process(self.table)
            return
        # batches_processed counts GENUINELY INGESTED batches only (ADVICE
        # r5): a same-spelling keyed replay (append returns the existing
        # snapshot id, writes nothing) must not count, exactly like the
        # legacy-key replay path above doesn't
        replay = self.source.has_key(self.table, key)
        self.source.append(self.table, batch_df, key=key)
        self.engine.process(self.table)
        if not replay:
            self.batches_processed += 1

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        """Attach to a streaming DataFrame (e.g. spark.readStream.schema(...)
        .parquet(dir)) and run the dedup engine per micro-batch.

        available_now=True drains everything currently available and stops
        (batch-style test/backfill); False runs continuously.
        """
        self._checkpoint_dir = checkpoint_dir
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def clusters(self) -> DataFrame:
        return self.engine.clusters()
