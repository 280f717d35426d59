"""Signature stage: one Arrow-batched ``mapInPandas`` pass computing every
per-row signature.

This is the Spark re-expression of the reference's chunk+hash pipeline
stages (/root/reference/DedupPipeline/ChunkingPipeline.h:64-159 FastCDC,
HashingPipeline.h:40-86 SHA-1): a *narrow* transformation — no shuffle —
whose inner loop is the same numpy core the oracle uses
(mfdedup_spark.core.hashes), so signatures match the parity oracle
bit-for-bit. Per input_hint: vectorized pandas/Arrow UDFs, no per-row
Python in the hot path (numpy does the window math; hashlib's C SHA-1
handles the exact fingerprint).

Column pruning matters at 100 TB: the output drops ``bytes`` so every
downstream shuffle moves ~100 B/row signatures instead of image payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mfdedup_spark.config import SignatureConfig
from mfdedup_spark.core import codecs
from mfdedup_spark.core.hashes import (
    SignatureTables,
    lsh_band_buckets,
    minhash_signature,
    sha1_hex,
    shingles_for,
    simhash64,
    simhash_bands,
)

SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("seq_no", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("simhash", T.LongType()),
        T.StructField("minhash", T.ArrayType(T.LongType())),
        T.StructField("mh_bands", T.ArrayType(T.LongType())),
        T.StructField("sh_bands", T.ArrayType(T.LongType())),
    ]
)


def compute_signatures(images: DataFrame, cfg: SignatureConfig) -> DataFrame:
    """images(image_id, bytes, w, h, fmt, caption, phash[, version, seq_no])
    → signatures DataFrame (SIGNATURE_SCHEMA). Narrow, Arrow-batched."""

    has_version = "version" in images.columns
    has_seq = "seq_no" in images.columns
    cols = ["image_id", "bytes", "w", "h", "fmt", "phash"]
    if has_version:
        cols.append("version")
    if has_seq:
        cols.append("seq_no")
    pruned = images.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mfdedup_spark.core.hashes import phash64

        t = SignatureTables.get(cfg)  # built once per python worker
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pixels = codecs.decode(r.bytes, int(r.w), int(r.h), r.fmt)
                sh = shingles_for(pixels.tobytes(), cfg, t)
                mh = minhash_signature(sh, t)
                sim = simhash64(sh, int(r.phash), t)
                # integrity check: the stored pHash must match the decoded
                # pixels (the SimHash seed and the NDF-locality sort both
                # trust it; reference precedent: index-insert asserts,
                # MetadataManager.h:98,109)
                ok = phash64(pixels) == int(r.phash)
                out.append(
                    (
                        r.image_id,
                        int(getattr(r, "version", 1)),
                        int(getattr(r, "seq_no", 0)),
                        len(r.bytes),
                        sha1_hex(r.bytes),
                        int(r.phash),
                        ok,
                        sim,
                        mh.tolist(),
                        lsh_band_buckets(mh, t).tolist(),
                        simhash_bands(sim, cfg.simhash_bands).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[f.name for f in SIGNATURE_SCHEMA.fields],
            )

    return pruned.mapInPandas(run, schema=SIGNATURE_SCHEMA)
