"""Versioned dedup store — the engine's table layout.

Re-expresses the reference's five on-disk file families (SURVEY.md §1.1)
as partitioned parquet tables plus an atomic JSON manifest. Iceberg is the
production target (partition evolution, snapshot commits); this container
has no Iceberg jars, so the same semantics are emulated with partition-dir
writes + last-writer-wins manifest swap — exactly the contingency SURVEY
§7 hard part (d) calls out, mirroring the reference's 16-byte manifest
overwrite (/root/reference/Utility/Manifest.h:14-21).

Layout under ``warehouse/``:
  manifest.json     {total_version, arrangement_fall_behind}
                    (reference: Utility/Manifest.h:7-10)
  fp_index_prev/    fps of the previous version — the NDF earlierTable
                    (MetadataManager.h:39-52); rolled atomically each
                    ingest (tableRolling, :115-122)
  chunk_store/      category=N/ partitions of live unique image records;
                    N = x(x-1)/2+y for first-written y, live-at x
                    (README.md:51-57, ChunkWriterManager.h:30)
  archived/         archive_version=W/ volumes of records whose last live
                    version is W (ArrangementWritePipeline.h:62-124)
  recipes/          version=V/ ordered (seq_no, image_id, fp) lists
                    (Recipe files, WriteFilePipeline.h:87-100)
  clusters/         version=V/ near-dup cluster assignments (graft output)
  drop_log/         version=V/ hot-bucket overflow log from the capped
                    pair generators (north_rule: logged drops) —
                    (space, band, bucket, members, kept, dropped)
  metrics/          per-version dedup counters
                    (DeduplicationPipeline.h:40-43)
  lineage/          per-partition manifest rows (partition_id, version,
                    rows, bytes, state) for checkpoint-resume (north_star)
  stage_stats/      per-stage ingest durations (getStatistics analogue)

Iceberg drop-in mapping (the production backend this API is shaped for;
an IcebergStore would implement the same six methods against a catalog):
  write_partition(df, t, k, v)  → INSERT OVERWRITE t PARTITION (k=v)
  write_partitions(df, t, k)    → dynamic-overwrite snapshot commit
                                  (spark.sql.sources.partitionOverwriteMode
                                  =dynamic ≡ Iceberg overwrite-by-filter)
  read_partitions(t, k, vs)     → scan with partition predicate k IN (vs)
                                  (partition pruning from table metadata)
  drop_partition(t, k, v)       → ALTER TABLE DROP PARTITION — metadata-only
  list_partitions(t, k)         → table partitions metadata query
  write_manifest / read_manifest→ snapshot commit / current-snapshot read
                                  (the JSON swap is the same single-pointer
                                  atomicity Iceberg's catalog provides)
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: parquet row-group size for store writes. The default 128 MiB block
#: makes every concurrent writer buffer a full group of raw binary
#: payload in heap (ConcatenatingByteBufferCollector holds the whole
#: chunk) — 32 write tasks x 128 MiB OOMed a 24 GiB heap during the 1M
#: warehouse build (r04 scale finding). 32 MiB bounds writer memory to
#: ~2 GiB at 32-way concurrency and gives restore scans 4x more
#: row-group parallelism; raw image bytes gain nothing from big groups.
PARQUET_BLOCK_BYTES = 32 * 1024 * 1024


#: on-disk layout generation. 2 = recipes carry per-copy metadata
#: (w/h/fmt/caption/phash) + length, chunk payloads carry length/phash/
#: first_version. A warehouse stamped with a different generation cannot
#: be read by this code — fail loudly instead of erroring mid-plan on
#: missing columns (ADVICE r02: backward-incompatible schema change).
STORE_FORMAT = 2


class StoreFormatError(RuntimeError):
    """Warehouse written by an incompatible engine generation."""


class DedupStore:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.root = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ------------------------------------------------------------- manifest
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict:
        """Defaults to zeros if missing (ManifestReader, Manifest.h:23-39).
        Refuses a manifest stamped by another engine generation."""
        if not os.path.exists(self._manifest_path):
            return {"total_version": 0, "arrangement_fall_behind": 0}
        with open(self._manifest_path) as f:
            m = json.load(f)
        fmt = m.get("format", 1)
        if fmt != STORE_FORMAT:
            raise StoreFormatError(
                f"warehouse {self.root} is store format {fmt}, this engine "
                f"reads format {STORE_FORMAT}: reingest required (recipes/"
                "chunk partitions lack the per-copy metadata columns)"
            )
        return m

    def write_manifest(self, m: dict) -> None:
        """Atomic overwrite — the commit point of every job (Manifest.h:14-21)."""
        tmp = self._manifest_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {**m, "format": STORE_FORMAT, "updated_at": time.time()}, f
            )
        os.replace(tmp, self._manifest_path)

    # --------------------------------------------------------------- tables
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and any(
            not e.startswith((".", "_")) for e in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write_partition(
        self, df: DataFrame, table: str, key: str, value, sort_cols=None
    ) -> None:
        """Idempotent partition overwrite: re-running a failed job rewrites
        the same partition deterministically (the resume story — commits
        are per-partition, the manifest swap is the global commit).

        ``sort_cols`` applies the NDF-locality layout (north_star:
        sort-within-partitions by (phash prefix, MinHash band) so
        candidate neighbors co-locate in row groups — the AVAR sequential
        layout re-expressed; reference: category-ordered volumes,
        ArrangementReadPipeline.h:57-73). Parquet min/max stats on the
        sorted columns then skip row groups during verification scans.
        """
        target = os.path.join(self.path(table), f"{key}={value}")
        out = df.drop(key)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.option(
            "parquet.block.size", PARQUET_BLOCK_BYTES
        ).mode("overwrite").parquet(target)

    def write_partitions(
        self, df: DataFrame, table: str, key: str, sort_cols=None
    ) -> None:
        """Multi-partition overwrite in ONE Spark job: dynamic partition
        overwrite (Iceberg's overwrite-by-filter analogue) replaces exactly
        the partitions present in ``df`` and leaves the rest of the table
        untouched. ``sort_cols`` keeps the NDF-locality layout per file —
        tasks are NOT repartitioned by ``key`` (that would serialize each
        category onto one task); each task writes its own slice of every
        category it holds, sorted by (key, sort_cols)."""
        out = df
        if sort_cols:
            out = out.sortWithinPartitions(F.col(key), *sort_cols)
        (
            out.write.mode("overwrite")
            .option("parquet.block.size", PARQUET_BLOCK_BYTES)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(key)
            .parquet(self.path(table))
        )

    # ------------------------------------------------- staged self-overwrite
    def _stage_path(self, table: str, key: str, value) -> str:
        return os.path.join(self.path(table), f".stage-{key}={value}")

    def list_stages(self, table: str, key: str) -> list[int]:
        """Pending staged overwrites (crashed write_partition_staged)."""
        p = self.path(table)
        if not os.path.exists(p):
            return []
        pre = f".stage-{key}="
        return sorted(
            int(e[len(pre):]) for e in os.listdir(p) if e.startswith(pre)
        )

    def recover_partition_stage(
        self, table: str, key: str, value, delete_incomplete: bool = True
    ) -> bool:
        """Roll a crashed staged overwrite forward (or discard it).

        A stage dir is COMPLETE iff Spark's job commit wrote ``_SUCCESS``.
        If the target partition is missing and the stage is complete, the
        crash happened between the swap's rmtree and rename — finish the
        rename (the content is the full merged result). Otherwise the
        stage is an incomplete or superseded leftover: discard it when
        ``delete_incomplete`` (writers), leave it alone for read-only
        callers (restore must not race a live writer's stage)."""
        stage = self._stage_path(table, key, value)
        target = os.path.join(self.path(table), f"{key}={value}")
        if not os.path.exists(stage):
            return False
        complete = os.path.exists(os.path.join(stage, "_SUCCESS"))
        if not os.path.exists(target) and complete:
            os.rename(stage, target)
            return True
        if delete_incomplete:
            shutil.rmtree(stage)
        return False

    def read_stage_partition(self, table: str, key: str, value) -> DataFrame | None:
        """Read a COMPLETE crashed stage IN PLACE — the non-mutating
        reader view of a mid-swap crash (ADVICE r04: the old reader-path
        recover renamed the stage dir, so a restore racing a live
        arrange's swap could make the writer's own rename fail). Returns
        None when the target partition exists (the stage is a superseded
        leftover) or the stage is incomplete (no ``_SUCCESS``); rolling
        the stage forward remains exclusively the writer's job
        (``recover_partition_stage``)."""
        stage = self._stage_path(table, key, value)
        target = os.path.join(self.path(table), f"{key}={value}")
        if os.path.exists(target) or not os.path.exists(
            os.path.join(stage, "_SUCCESS")
        ):
            return None
        return self.spark.read.parquet(stage).withColumn(key, F.lit(value))

    def write_partition_staged(
        self, df: DataFrame, table: str, key: str, value, sort_cols=None
    ) -> None:
        """Crash-safe overwrite for partitions whose CURRENT content feeds
        the new content (self-overwrite, e.g. the archive-volume merge on
        arrange's recovery path — ADVICE r03 medium). A plain
        ``mode("overwrite")`` deletes the target before the job runs, so a
        lost cache block would recompute from files being deleted; here
        the Spark job only ever READS the live partition and writes a
        hidden ``.stage-`` dir, then the swap is two renames. A crash
        between them is rolled forward by ``recover_partition_stage``
        (Iceberg analogue: snapshot commit — new files written first, the
        metadata pointer swap is the atomic step)."""
        stage = self._stage_path(table, key, value)
        if os.path.exists(stage):
            shutil.rmtree(stage)
        out = df.drop(key)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.option(
            "parquet.block.size", PARQUET_BLOCK_BYTES
        ).mode("overwrite").parquet(stage)
        assert os.path.exists(os.path.join(stage, "_SUCCESS")), stage
        target = os.path.join(self.path(table), f"{key}={value}")
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(stage, target)

    def read_partitions(self, table: str, key: str, values: list) -> DataFrame | None:
        paths = [
            os.path.join(self.path(table), f"{key}={v}")
            for v in values
            if os.path.exists(os.path.join(self.path(table), f"{key}={v}"))
        ]
        if not paths:
            return None
        # basePath keeps the partition column in the schema
        return self.spark.read.option("basePath", self.path(table)).parquet(*paths)

    def read_table(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def list_partitions(self, table: str, key: str) -> list[int]:
        p = self.path(table)
        if not os.path.exists(p):
            return []
        out = []
        for e in os.listdir(p):
            if e.startswith(f"{key}="):
                out.append(int(e.split("=", 1)[1]))
        return sorted(out)

    def drop_partition(self, table: str, key: str, value) -> bool:
        """Metadata-only delete (Iceberg DROP PARTITION; reference:
        near-zero-cost GC, Eliminator.h:15-101)."""
        target = os.path.join(self.path(table), f"{key}={value}")
        if os.path.exists(target):
            shutil.rmtree(target)
            return True
        return False

    # ------------------------------------------------------------- fp index
    def write_fp_index(self, df: DataFrame, generation: str = "next") -> None:
        """Stage the new index, then swap — tableRolling
        (MetadataManager.h:115-122) as an atomic directory rename."""
        staged = self.path(f"fp_index_{generation}_staging")
        df.write.option(
            "parquet.block.size", PARQUET_BLOCK_BYTES
        ).mode("overwrite").parquet(staged)

    def roll_fp_index(self) -> None:
        prev = self.path("fp_index_prev")
        staged = self.path("fp_index_next_staging")
        if os.path.exists(prev):
            shutil.rmtree(prev)
        os.replace(staged, prev)

    def read_fp_index(self) -> DataFrame | None:
        if not self.exists("fp_index_prev"):
            return None
        return self.read("fp_index_prev")

    # -------------------------------------------------------------- lineage
    def append_lineage(self, rows: list[dict]) -> None:
        """Append per-partition lineage rows (north_star: per-partition
        lineage manifests enabling checkpoint-resumable runs)."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.path("lineage"), exist_ok=True)
        df = pd.DataFrame(rows)
        df["updated_at"] = time.time()
        schema = pa.schema(
            [
                ("partition_id", pa.string()),
                ("version", pa.int32()),
                ("rows", pa.int64()),
                ("bytes", pa.int64()),
                ("state", pa.string()),
                ("updated_at", pa.float64()),
            ]
        )
        fname = os.path.join(self.path("lineage"), f"lineage-{time.time_ns()}.parquet")
        pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), fname)

    def read_lineage(self) -> DataFrame | None:
        if not self.exists("lineage"):
            return None
        return self.read("lineage")

    def read_lineage_rows(self):
        """Driver-side lineage read (pyarrow, no Spark job): the lineage
        dir is a handful of KB-scale parquet files — the same class of
        metadata the manifest reader already loads driver-side. Returns a
        pandas frame with ONE row per partition_id (latest updated_at
        wins: re-runs append a fresh, complete set of rows per
        partition), or None when no lineage exists."""
        if not self.exists("lineage"):
            return None
        import pyarrow.parquet as pq

        df = pq.read_table(self.path("lineage")).to_pandas()
        if df.empty:
            return df
        return (
            df.sort_values("updated_at", kind="mergesort")
            .groupby("partition_id", as_index=False)
            .last()
        )

    # ---------------------------------------------------------- stage stats
    def append_stage_stats(self, version: int, rows: list[dict]) -> None:
        """Per-stage wall-clock durations for one ingest — the analogue of
        the reference's getStatistics() printout (main.cpp:151-155),
        persisted so ``status`` and the bench can read them back."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not rows:
            return
        os.makedirs(self.path("stage_stats"), exist_ok=True)
        df = pd.DataFrame(rows)
        df["version"] = version
        schema = pa.schema(
            [
                ("stage", pa.string()),
                ("seconds", pa.float64()),
                ("version", pa.int32()),
            ]
        )
        fname = os.path.join(
            self.path("stage_stats"), f"stats-{time.time_ns()}.parquet"
        )
        pq.write_table(
            pa.Table.from_pandas(df[["stage", "seconds", "version"]], schema=schema,
                                 preserve_index=False),
            fname,
        )

    def read_stage_stats(self) -> DataFrame | None:
        if not self.exists("stage_stats"):
            return None
        return self.read("stage_stats")
