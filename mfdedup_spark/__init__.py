"""mfdedup_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine with the capabilities of HIT-HSSL/MFDedup.

The reference (/root/reference, FAST '21 MFDedup) is a single-process C++
pipeline doing content-defined chunking + SHA-1 fingerprinting + NDF
(neighbor-duplicate-focus) classification + AVAR volume arrangement.
This package re-expresses those semantics Spark-first, per SURVEY.md:

- chunking/hashing  -> Arrow-vectorized pandas UDFs computing byte-shingle
  MinHash, pHash-seeded SimHash and SHA-1 over image rows
  (reference: DedupPipeline/ChunkingPipeline.h, HashingPipeline.h)
- dedup lookup      -> semi/anti joins against the previous-version
  fingerprint index (reference: MetadataManager/MetadataManager.h:60-77)
- category/volume   -> partitioned parquet tables + lineage manifests
  (reference: ArrangementPipeline/*, Utility/ChunkWriterManager.h:30)
- restore           -> window prefix-sum + pruned join + ordered write
  (reference: RestorePipeline/*)
- retention GC      -> metadata-only partition ops
  (reference: DedupPipeline/Eliminator.h)
"""

__version__ = "0.1.0"
