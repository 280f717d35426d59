"""The flagship single-version dedup pipeline — SURVEY.md §7 step 2.

Answers the reference's ``--task=write`` question — "which images are
duplicates of which, and what is the dedup ratio"
(/root/reference/DedupPipeline/DeduplicationPipeline.h:40-43 statistics) —
as one Spark job:

    images ──mapInPandas──► signatures            (narrow, Arrow)
       │                        │
       │                   explode bands
       │                        ▼
       │              salted groupBy buckets      (shuffle 1)
       │                        ▼
       │                 anchor-star pairs
       │                        ▼
       │             verify (JVM zip_with/xor)    (shuffle 2: sig join)
       └──caption grams──► suffix-array verify    (shuffle 3)
                                ▼
              connected components (iterative)    (shuffles 4..4+k)
                                ▼
                clusters + dedup metrics (agg)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mfdedup_spark.config import SignatureConfig
from mfdedup_spark.functions.signatures import compute_signatures
from mfdedup_spark.operators.caption_match import caption_pairs
from mfdedup_spark.operators.connected_components import (
    _prefetch,
    connected_components,
)
from mfdedup_spark.operators.lsh import candidate_pairs
from mfdedup_spark.operators.verify import verify_pairs


def dedup_images(
    images: DataFrame, cfg: SignatureConfig | None = None, with_captions: bool = True
) -> dict[str, DataFrame]:
    """Run the full near-dup pipeline; returns the intermediate and final
    DataFrames: signatures, candidates, bucket_stats, pairs, clusters,
    metrics."""
    cfg = cfg or SignatureConfig()
    sig = compute_signatures(images, cfg)
    sig.persist()  # reused by candidate gen + verification joins
    # overlap (guide §2.6): start the Arrow/Python signature stage now so
    # decode+hash runs while the driver builds the candidate/caption/CC
    # fragments (connected_components alone spends ~1 s of pure Catalyst
    # planning at bench scale); downstream actions find sig cached
    _prefetch(sig)

    cand, lsh_stats = candidate_pairs(sig, cfg)
    verified = verify_pairs(cand, sig, cfg)
    stats = lsh_stats
    if with_captions:
        cpairs, cap_stats = caption_pairs(images, cfg)
        verified = verified.unionByName(cpairs)
        stats = lsh_stats.select("members", "kept", "dropped").unionByName(
            cap_stats.select("members", "kept", "dropped")
        )
    pairs = verified.dropDuplicates(["image_id_a", "image_id_b", "method"])

    # edges straight from verified (NOT via pairs): the per-method
    # dropDuplicates would add a second shuffle, and r06 drops the id-only
    # distinct too — connected_components is min-aggregation based and
    # therefore duplicate-insensitive, so the ≤ #bands-fold edge
    # multiplicity collapses in its first map-side partial aggregation
    # instead of paying a dedicated exchange (guide §2.4)
    clusters = connected_components(
        verified.select("image_id_a", "image_id_b"),
        sig.select("image_id"),
    )

    # dedup metrics — reference counters re-expressed as one aggregation
    # (DeduplicationPipeline.h:94-108): bytes kept = one representative per
    # cluster (the cluster anchor), exact-dup bytes = non-first sha1 copies
    sizes = sig.select("image_id", "length", "sha1")
    with_cluster = sizes.join(clusters, "image_id")
    metrics = with_cluster.agg(
        F.count("*").alias("n_images"),
        F.sum("length").alias("total_len"),
        F.count_distinct("cluster_id").alias("n_clusters"),
        F.count_distinct("sha1").alias("n_exact_distinct"),
    ).withColumn(
        "cluster_dedup_ratio",
        F.col("n_images").cast("double") / F.col("n_clusters"),
    )
    return {
        "signatures": sig,
        "candidates": cand,
        "bucket_stats": stats,
        "pairs": pairs,
        "clusters": clusters,
        "metrics": metrics,
    }


def load_images(spark: SparkSession, path: str) -> DataFrame:
    """Read an images table (parquet dir or file)."""
    return spark.read.parquet(path)
