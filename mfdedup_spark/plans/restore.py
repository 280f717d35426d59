"""Restore — the reference's ``--task=restore`` (/root/reference/main.cpp
:50-79, SURVEY.md §3.2) as one pruned-scan + join + sort job.

The reference plans volume/category reads (RestoreReadPipeline.h:34-105),
builds an fp→offsets map from the recipe with a sequential prefix sum
(RestoreParserPipeline.h:52-57) and pwrite()s chunks at each offset. In
Spark the same query is:

  recipes(version=v)                          -- partition-pruned scan
    + window prefix-sum over seq_no           -- the offset map
  ⋈ (live chunk_store ∪ archived volumes w≥v) -- partition pruning ≡ the
                                                 volume-prefix read plan
  orderBy seq_no                              -- placement via sort, no
                                                 random I/O

The fall-behind case (RestoreReadPipeline.h:66-87) needs no special plan:
live categories always hold whatever was not yet archived, and the join
filters the superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mfdedup_spark.store import DedupStore


def restore_version(store: DedupStore, v: int) -> tuple[DataFrame, dict]:
    """→ (restored rows in recipe order, stats incl. read amplification).

    Restored schema: (seq_no, image_id, offset, bytes, w, h, fmt, caption,
    phash) — image_id is the recipe's id (dup copies restored under their
    own ids, payload fetched by fp like the reference's restoreMap
    fan-out, RestoreParserPipeline.h:128-137).
    """
    manifest = store.read_manifest()
    oldest = manifest.get("oldest_version", 1)
    assert oldest <= v <= manifest["total_version"], (
        f"version {v} not restorable (retained: {oldest}..{manifest['total_version']})"
    )

    recipes = store.read_partitions("recipes", "version", [v])
    w = Window.orderBy("seq_no").rowsBetween(Window.unboundedPreceding, -1)
    recipes = recipes.select(
        "seq_no",
        "image_id",
        "fp",
    )

    live_cats = store.list_partitions("chunk_store", "category")
    live = store.read_partitions("chunk_store", "category", live_cats)
    pool = live.select("fp", "bytes", "w", "h", "fmt", "caption", "phash", "first_version")
    arch_versions = [
        a for a in store.list_partitions("archived", "archive_version") if a >= v
    ]
    scanned_parts = [f"chunk_store/category={c}" for c in live_cats]
    if arch_versions:
        arch = store.read_partitions("archived", "archive_version", arch_versions)
        pool = pool.unionByName(
            arch.select(
                "fp", "bytes", "w", "h", "fmt", "caption", "phash", "first_version"
            )
        )
        scanned_parts += [f"archived/archive_version={a}" for a in arch_versions]
    # file-skipping analogue: only chunks first written ≤ v can be in v
    pool = pool.where(F.col("first_version") <= v).dropDuplicates(["fp"])

    restored = (
        recipes.join(pool, "fp")
        .withColumn("length", F.length("bytes").cast("long"))
        .withColumn("offset", F.coalesce(F.sum("length").over(w), F.lit(0)))
        .select(
            "seq_no", "image_id", "offset", "bytes", "w", "h", "fmt",
            "caption", "phash",
        )
        .orderBy("seq_no")
    )

    n_recipe = recipes.count()
    n_restored = restored.count()
    restored_bytes = int(restored.agg(F.sum(F.length("bytes"))).first()[0] or 0)
    scanned_bytes = int(pool.agg(F.sum(F.length("bytes"))).first()[0] or 0)
    stats = {
        "version": v,
        "rows": n_restored,
        "recipe_rows": n_recipe,
        "restored_bytes": restored_bytes,
        "scanned_bytes": scanned_bytes,
        # RestoreParserPipeline.h:86 prints the same ratio
        "read_amplification": (
            scanned_bytes / restored_bytes if restored_bytes else float("nan")
        ),
        "scanned_partitions": scanned_parts,
    }
    return restored, stats
