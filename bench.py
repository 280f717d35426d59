"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE
JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headliners:
- image_dedup:      the flagship image near-dup pipeline (signatures →
                    salted LSH → verify → caption SA → CC) over a cached
                    deterministic synthetic images table sized ∝ sf
- doc_cluster:      text near-dup clustering over documents
- ndf_classify:     NDF UNIQUE/INTERNAL/ADJACENT over events
- restore_prefix:   recipe-offset window prefix sum over lineitem
- ngram_jaccard:    LSH candidates + exact n-gram Jaccard over documents
- ann_topk:         brute-force cosine top-k over embeddings

Every query is forced through a noop sink so full materialization is
measured, not just the count fast-path.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


FIXTURE_VERSION = "v5"  # bump when codec/fixture semantics change


def ensure_image_fixture(n_images: int, cache_root: str = "/tmp/mfdedup_bench") -> str:
    """Deterministic synthetic images table (web-like: jpeg-heavy format
    mix, 64-256 px), generated once and cached."""
    path = os.path.join(cache_root, f"images_{FIXTURE_VERSION}_{n_images}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(cache_root, exist_ok=True)
    from mfdedup_spark.fixtures import generate_images, write_parquet

    df, _ = generate_images(
        n_images=n_images, seed=42, fmt_weights=[0.1, 0.2, 0.7],
        dims=[64, 128, 256],
    )
    tmp = path + f".tmp{os.getpid()}"
    write_parquet(df, tmp)
    os.replace(tmp, path)
    return path


def run(sf_dir: str, cpus: int, image_rows: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from mfdedup_spark import contract, textops
    from mfdedup_spark.config import SignatureConfig
    from mfdedup_spark.plans.pipeline import dedup_images
    from mfdedup_spark.session import get_spark

    sf = _sf_from_dir(sf_dir)
    n_images = image_rows if image_rows is not None else max(200, int(80_000 * sf))
    img_path = ensure_image_fixture(n_images)

    spark = get_spark(
        app="mfdedup-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm to steady state (python workers, JIT, codegen for the big
    # plans) with a tiny end-to-end pass — excluded like cluster warmup
    import pandas as _pd

    spark.range(0, cpus, 1, cpus).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [len(b)]}) for b in it), "x long"
    ).count()
    warm = dedup_images(spark.read.parquet(img_path).limit(400), SignatureConfig())
    warm["clusters"].write.format("noop").mode("overwrite").save()
    warm["signatures"].unpersist()
    force_warm = contract.flagship(spark, "/root/testdata/sf0.001")
    force_warm.write.format("noop").mode("overwrite").save()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # flagship: image near-dup dedup end-to-end (pipeline construction is
    # inside the timer — connected components materializes eagerly)
    def run_image_dedup() -> None:
        images = spark.read.parquet(img_path).repartition(cpus)
        out = dedup_images(images, SignatureConfig())
        force(out["clusters"])
        out["signatures"].unpersist()

    timed("image_dedup", run_image_dedup)

    timed(
        "doc_cluster",
        lambda: force(contract.flagship(spark, sf_dir)),
    )
    timed(
        "ndf_classify",
        lambda: force(contract.q_ndf_classification_events(spark, sf_dir)),
    )
    timed(
        "restore_prefix",
        lambda: force(contract.q_restore_prefix_sum(spark, sf_dir)),
    )
    timed(
        "ngram_jaccard",
        lambda: force(contract.q_ngram_jaccard_docs(spark, sf_dir)),
    )
    timed("ann_topk", lambda: force(contract.q_ann_cosine_topk(spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "image_rows": n_images,
        "images_per_sec": round(n_images / timings["image_dedup"], 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    image_rows = os.environ.get("MFDEDUP_BENCH_IMAGES")
    result = run(sf_dir, cpus, int(image_rows) if image_rows else None)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
