"""Streaming ingest: the continuous /write path.

Reference: HTTP /write accepts line-protocol batches at any time, fans out
to replicas per partition-key hash group, persists failures for hinted
handoff (write_handler.go:117-137; recovery.go:89-109; SURVEY §3.2 step 5-6).

Spark-native: `readStream` (file dir / Kafka / socket of raw lines) →
vectorized parse → partition-key validation split → `foreachBatch` writing
valid rows into the partitioned measurement table and rejects into a
dead-letter directory. Checkpointing + idempotent batch writes replace
retry/handoff; storage replication replaces RF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ingest import validate_partition_key, write_measurement
from ..lineprotocol import parse_lines_df, pivot_points
from ..model import Catalog


def stream_ingest_lines(catalog: Catalog, lines_stream: DataFrame,
                        database: str, measurement: str, tag_keys: list[str],
                        table_path: str, checkpoint_path: str,
                        dead_letter_path: str | None = None,
                        default_time_ns: int | None = None,
                        trigger_once: bool = False,
                        dedup_replicas: bool = False):
    """Attach the ingest pipeline to a streaming DataFrame of raw lines.

    Returns the started StreamingQuery. `trigger(availableNow=True)` mode
    drains what exists and stops — the same shape as the reference's
    mirror/bookmark incremental copy (syncing/importer.go:114-139), with the
    checkpoint playing the bookmark's role.
    """
    pk = catalog.partition_key_for(database, measurement)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        long_df = parse_lines_df(batch_df, default_time_ns=default_time_ns)
        wide = pivot_points(long_df, measurement, tag_keys)
        if dedup_replicas:
            # replicated-write idempotency within a batch (the engine-side
            # form of the reference's point-hash dedup on read,
            # coordinator.go:97-118); cross-batch duplicates are handled
            # by the checkpoint (a batch is never re-ingested)
            wide = wide.dropDuplicates()
        valid, rejected = validate_partition_key(wide, pk)
        write_measurement(valid, table_path, pk)
        if dead_letter_path is not None:
            bad = rejected.select(F.lit(batch_id).alias("batch_id"),
                                  *[F.col(c).cast("string") for c in
                                    rejected.columns if c == "reject_reason"])
            errs = long_df.where(F.col("error").isNotNull()).select(
                F.lit(batch_id).alias("batch_id"),
                F.col("error").alias("reject_reason"))
            bad.unionByName(errs).write.mode("append").json(dead_letter_path)

    writer = (lines_stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_path))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
