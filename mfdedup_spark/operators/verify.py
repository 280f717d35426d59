"""Candidate-pair verification — entirely JVM-side (whole-stage codegen),
no Python in the loop.

Mirrors the oracle's rule exactly (oracle.verify_pairs): exact SHA-1
equality wins, else MinHash-estimated Jaccard ≥ threshold, else SimHash
hamming distance ≤ threshold. The MinHash estimate is an
``aggregate(zip_with(...))`` fold and the hamming distance is
``bit_count(xor)`` — both built-in expressions, so Catalyst keeps the whole
stage in codegen.

Reference analogue: the 3-way dedupLookup switch
(/root/reference/DedupPipeline/DeduplicationPipeline.h:96-108) — there the
"verification" is exact fp equality; the graft adds the two similarity
tiers on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mfdedup_spark.config import SignatureConfig


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: SignatureConfig
) -> DataFrame:
    """pairs(image_id_a, image_id_b) × signatures → verified
    pairs(image_id_a, image_id_b, method, score)."""
    sig = signatures.select("image_id", "sha1", "minhash", "simhash")
    a = sig.select(
        F.col("image_id").alias("image_id_a"),
        F.col("sha1").alias("sha1_a"),
        F.col("minhash").alias("mh_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = sig.select(
        F.col("image_id").alias("image_id_b"),
        F.col("sha1").alias("sha1_b"),
        F.col("minhash").alias("mh_b"),
        F.col("simhash").alias("sim_b"),
    )
    j = pairs.join(a, "image_id_a").join(b, "image_id_b")

    eq = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = eq / F.lit(cfg.num_perms)
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))

    method = (
        F.when(F.col("sha1_a") == F.col("sha1_b"), F.lit("sha1"))
        .when(est >= F.lit(cfg.minhash_jaccard_threshold), F.lit("minhash"))
        .when(ham <= F.lit(cfg.simhash_hamming_threshold), F.lit("simhash"))
    )
    score = (
        F.when(F.col("sha1_a") == F.col("sha1_b"), F.lit(1.0))
        .when(
            est >= F.lit(cfg.minhash_jaccard_threshold),
            est.cast("double"),
        )
        .otherwise(1.0 - ham.cast("double") / F.lit(64.0))
    )
    return (
        j.withColumn("method", method)
        .where(F.col("method").isNotNull())
        .select("image_id_a", "image_id_b", "method", score.alias("score"))
    )
