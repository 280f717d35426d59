"""Structured Streaming ingestion — the streaming face of the versioned
NDF ingest (SURVEY.md §2.6: "foreachBatch ingestion of new versions").

The reference ingests one backup version per CLI invocation
(/root/reference/main.cpp:115-205). Here the same job runs continuously:
a file stream watches an arrival directory for new version partitions and
``foreachBatch`` applies the exact batch ingest per version, in order —
ingest_version's idempotent partition writes + manifest swap make the
foreachBatch at-least-once delivery exactly-once in effect (re-delivered
versions are skipped via the manifest check).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mfdedup_spark.config import EngineConfig
from mfdedup_spark.store import DedupStore

log = logging.getLogger(__name__)


def pending_versions(store: DedupStore) -> list[int]:
    """Versions staged by the stream but not yet ingested (waiting on a
    predecessor). Surfaced in admin ``status`` so a gap — a version whose
    predecessor never arrives — is visible instead of silently parked
    (ADVICE r02 low #4)."""
    import os

    pending_root = store.path("pending_versions")
    if not os.path.exists(pending_root):
        return []
    return sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(pending_root)
        if e.startswith("version=")
    )

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("seq_no", T.LongType()),
    ]
)


def stream_ingest(
    spark: SparkSession,
    store: DedupStore,
    cfg: EngineConfig,
    source_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 4,
):
    """Watch ``source_dir`` for image-version parquet files and ingest
    each complete version through the batch NDF path. Returns the started
    StreamingQuery (awaitTermination on the caller's side).

    Arrival contract: ONE parquet file per version (the file-stream source
    delivers whole files per micro-batch, so a version can never be split
    across batches — a split version would half-ingest and then be
    manifest-skipped on redelivery). Producers writing multi-file versions
    must land them under a staging name and atomically rename the single
    merged file in.

    Out-of-order arrivals: the file source does NOT deliver files in
    version order (discovery order ≠ version order, and maxFilesPerTrigger
    splits a backlog across micro-batches). Every arriving version is
    staged under ``pending_versions/version=v`` and each micro-batch then
    drains the pending set strictly in manifest order — a version that
    arrives early simply waits for its predecessor instead of killing the
    query (ingest_version raises OutOfOrderVersionError; round-1 used a
    bare assert, see ADVICE r01). Staging + drain are both idempotent:
    re-delivered files overwrite the same pending partition, and versions
    ≤ total_version are dropped on drain via the manifest skip.
    """
    from mfdedup_spark.plans.ingest import ingest_version

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    pending_root = store.path("pending_versions")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        batch_df = batch_df.persist()
        versions = [
            r["version"]
            for r in batch_df.select("version").distinct().orderBy("version").collect()
        ]
        # stage every arrival (idempotent partition overwrite)
        for v in versions:
            batch_df.where(F.col("version") == v).write.mode("overwrite").parquet(
                os.path.join(pending_root, f"version={v}")
            )
        batch_df.unpersist()
        # drain in order: ingest total_version+1 while it is pending; drop
        # stale (≤ total_version) stagings
        while os.path.exists(pending_root):
            manifest = store.read_manifest()
            total = manifest["total_version"]
            pend = sorted(
                int(e.split("=", 1)[1])
                for e in os.listdir(pending_root)
                if e.startswith("version=")
            )
            stale = [v for v in pend if v <= total]
            for v in stale:
                shutil.rmtree(os.path.join(pending_root, f"version={v}"))
            nxt = total + 1
            if nxt not in pend:
                break
            pdir = os.path.join(pending_root, f"version={nxt}")
            ingest_version(
                store, spark.read.schema(IMAGES_SCHEMA).parquet(pdir), cfg,
                apply_arrangement=True,
            )
            shutil.rmtree(pdir)
        # nothing is silently parked: versions still staged after the
        # drain are waiting on a missing predecessor — say so every batch
        still = pending_versions(store)
        if still:
            log.warning(
                "stream_ingest: versions %s staged in %s awaiting version %s",
                still, pending_root, store.read_manifest()["total_version"] + 1,
            )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hourly_metrics(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window aggregation over a streamed events
    table — the late-data-tolerant metrics stream (SURVEY §2.6 streaming
    row). Returns (query, memory table name)."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("hourly_metrics")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, "hourly_metrics"
