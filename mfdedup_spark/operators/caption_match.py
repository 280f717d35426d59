"""Caption exact-substring duplicate matching (north_star: "Suffix-array
substring matching over captions (via applyInPandas per LSH bucket)
catches exact-substring dup captions that signature hashing misses").

No reference analogue (the reference matches exact chunks only) —
spec'd in SURVEY.md §2.6.

Dataflow:
1. Blocking — JVM-side: tokenize, build word k-grams with
   ``transform(sequence(...))``, hash each gram with
   ``conv(substring(md5(g),1,15),16,10)`` (identical to the oracle's
   ``core.hashes.gram_hash`` and DuckDB's hex-cast — portable), explode →
   (bucket, image_id). A caption that is a substring of another shares
   *all* of its word k-grams with the host, so any shared-gram bucket is a
   complete blocking scheme for whole-word-aligned substrings.
2. Candidate pairs — the same salted/capped anchor-star generator as the
   MinHash LSH path (operators/lsh.anchor_star_pairs).
3. Verification — per-anchor suffix-array groups: rows are repartitioned
   by anchor and processed by ``mapInPandas`` with a pandas groupby
   inside each Arrow batch (same semantics as applyInPandas-per-group,
   but the per-group Arrow round-trip — milliseconds × #groups — is
   amortized to one per batch). Each group builds one suffix array over
   the member captions (core.suffix_array.BucketMatcher) to find members
   hosting the anchor caption, plus the reverse containment per member.

Scale note: gram explosion multiplies caption rows by ≤ (tokens-k+1);
at 10^12 rows that blocking-key volume is tokens× the corpus, so the
engine path blocks on only the ``cfg.caption_max_grams`` smallest gram
hashes per caption BY DEFAULT (the numpy oracle applies the identical
bottom-m rule, keeping parity exact). A contained caption shares all its
grams with its host, so the sample loses a pair only when the host's
bottom-m misses every gram of the substring — ~0 at realistic caption
lengths (test_caption_bounded_recall plants long-host containments and
requires recall ≥ 0.99).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mfdedup_spark.config import SignatureConfig
from mfdedup_spark.operators.lsh import anchor_star_pairs

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("image_id_a", T.StringType()),
        T.StructField("image_id_b", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def caption_gram_buckets(
    images: DataFrame, cfg: SignatureConfig, max_grams_per_caption: int | None = None
) -> DataFrame:
    """images → (bucket, image_id): one row per distinct word-k-gram.

    Shuffle-free: dedup, ordering and the bottom-m bound all happen
    INSIDE the per-caption array (array_distinct → array_sort → slice)
    before the explode, so blocking keys reach the pair generator without
    a distinct or window exchange — at any m, bounded or not. Identical
    to the oracle's ``sorted(set(hashes))[:m]``."""
    k = cfg.caption_gram_k
    toks = F.split(F.col("caption"), " ")
    n_grams = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), n_grams - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), k)),
    )
    hashes = F.array_sort(
        F.array_distinct(
            F.transform(
                grams,
                lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
                    "long"
                ),
            )
        )
    )
    if max_grams_per_caption is not None:
        hashes = F.slice(hashes, 1, max_grams_per_caption)
    return images.select("image_id", F.explode(hashes).alias("bucket")).select(
        "image_id", "bucket"
    )


def caption_pairs(
    images: DataFrame, cfg: SignatureConfig, pin: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """→ (verified caption pairs, overflow bucket stats). Blocking is
    bounded to cfg.caption_max_grams keys per caption by default
    (VERDICT r02 wrong #6: unbounded gram volume at web scale); the
    numpy oracle applies the identical bottom-m rule."""
    buckets = caption_gram_buckets(
        images, cfg, max_grams_per_caption=cfg.caption_max_grams
    )
    cand, stats = anchor_star_pairs(
        buckets, cfg, key_cols=["bucket"], id_col="image_id", pin=pin
    )
    caps = images.select("image_id", "caption")
    joined = (
        cand.join(
            caps.select(
                F.col("image_id").alias("image_id_a"),
                F.col("caption").alias("caption_a"),
            ),
            "image_id_a",
        )
        .join(
            caps.select(
                F.col("image_id").alias("image_id_b"),
                F.col("caption").alias("caption_b"),
            ),
            "image_id_b",
        )
        # identical captions don't establish a dup by themselves (oracle rule)
        .where(F.col("caption_a") != F.col("caption_b"))
    )

    def verify_batch(batches):
        """Anchor groups are co-located by the repartition below; a single
        pandas groupby per Arrow batch amortizes the per-group overhead
        that per-group applyInPandas would pay (~ms × #groups)."""
        from mfdedup_spark.core.suffix_array import BucketMatcher, contains

        cols = [f.name for f in PAIR_SCHEMA.fields]
        for pdf in batches:
            out = []
            for anchor, group in pdf.groupby("image_id_a", sort=False):
                cap_a = group["caption_a"].iloc[0]
                members = group["image_id_b"].tolist()
                caps_b = group["caption_b"].tolist()
                # one suffix array over the member captions: which host the
                # anchor? plus the reverse containment per member
                m = BucketMatcher(caps_b)
                hosts = m.hosts_of(cap_a)
                for i, (mid, cb) in enumerate(zip(members, caps_b)):
                    if i in hosts or contains(cap_a, cb):
                        out.append((anchor, mid, "caption", 1.0))
            yield pd.DataFrame(out, columns=cols)

    verified = joined.repartition("image_id_a").mapInPandas(
        verify_batch, schema=PAIR_SCHEMA
    )
    return verified, stats
