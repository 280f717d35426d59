"""Round-6 diagnostic bench (guide §1.4): per-query noop-sink isolation,
N in-JVM reps with per-query minima, and a phase breakdown of the
image_dedup pipeline (signatures / candidates / verify / caption / CC).

`bench.py` stays frozen (driver contract); this file is the measurement
instrument for OPTIMIZATION_r06.md. Usage:

  python bench_extra.py [--reps 3] [--phases] [--queries q1,q2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--phases", action="store_true",
                    help="also break image_dedup into pipeline phases")
    ap.add_argument("--queries", default=None,
                    help="comma list: image_dedup,doc_cluster,ndf_classify,"
                         "restore_prefix,ngram_jaccard,ann_topk")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from bench import ensure_image_fixture, _sf_from_dir
    from mfdedup_spark import contract
    from mfdedup_spark.config import SignatureConfig
    from mfdedup_spark.plans.pipeline import dedup_images
    from mfdedup_spark.session import get_spark

    sf = _sf_from_dir(sf_dir)
    n_images = max(200, int(80_000 * sf))
    img_path = ensure_image_fixture(n_images)

    spark = get_spark(
        app="mfdedup-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # identical warmup to bench.py
    import pandas as _pd

    spark.range(0, cpus, 1, cpus).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [len(b)]}) for b in it), "x long"
    ).count()
    warm = dedup_images(spark.read.parquet(img_path).limit(400), SignatureConfig())
    force(warm["clusters"])
    warm["signatures"].unpersist()
    force(contract.flagship(spark, "/root/testdata/sf0.001"))

    def run_image_dedup() -> None:
        images = spark.read.parquet(img_path).repartition(cpus)
        out = dedup_images(images, SignatureConfig())
        force(out["clusters"])
        out["signatures"].unpersist()

    QUERIES = {
        "image_dedup": run_image_dedup,
        "doc_cluster": lambda: force(contract.flagship(spark, sf_dir)),
        "ndf_classify": lambda: force(
            contract.q_ndf_classification_events(spark, sf_dir)
        ),
        "restore_prefix": lambda: force(
            contract.q_restore_prefix_sum(spark, sf_dir)
        ),
        "ngram_jaccard": lambda: force(
            contract.q_ngram_jaccard_docs(spark, sf_dir)
        ),
        "ann_topk": lambda: force(contract.q_ann_cosine_topk(spark, sf_dir)),
    }
    names = list(QUERIES) if args.queries is None else args.queries.split(",")

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            sc.setJobDescription(f"r06[{rep}] {name}")
            t0 = time.time()
            QUERIES[name]()
            samples[name].append(round(time.time() - t0, 3))
            sc.setJobDescription(None)

    result = {
        "sf": sf,
        "cpus": cpus,
        "reps": args.reps,
        "samples": samples,
        "min": {n: min(v) for n, v in samples.items()},
        "min_total": round(sum(min(v) for v in samples.values()), 3),
    }

    if args.phases:
        from mfdedup_spark.operators.caption_match import caption_pairs
        from mfdedup_spark.operators.connected_components import (
            connected_components,
        )
        from mfdedup_spark.operators.lsh import candidate_pairs
        from mfdedup_spark.operators.verify import verify_pairs

        cfg = SignatureConfig()
        phases: dict[str, list[float]] = {}

        def ph(name: str, fn) -> None:
            sc.setJobDescription(f"r06-phase {name}")
            t0 = time.time()
            fn()
            phases.setdefault(name, []).append(round(time.time() - t0, 3))
            sc.setJobDescription(None)

        from mfdedup_spark.functions.signatures import compute_signatures

        for _ in range(args.reps):
            images = spark.read.parquet(img_path).repartition(cpus)
            sig = compute_signatures(images, cfg)
            sig.persist()
            ph("signatures", lambda: force(sig))
            cand, _ = candidate_pairs(sig, cfg)
            ph("candidates", lambda: force(cand))
            verified = verify_pairs(cand, sig, cfg)
            ph("verify", lambda: force(verified))
            cpairs, _ = caption_pairs(images, cfg)
            ph("caption", lambda: force(cpairs))
            edges = (
                verified.unionByName(cpairs)
                .select("image_id_a", "image_id_b")
                .distinct()
            )
            ph("cc", lambda: force(
                connected_components(edges, sig.select("image_id"))
            ))
            sig.unpersist()
        result["image_dedup_phases"] = {
            "samples": phases, "min": {n: min(v) for n, v in phases.items()}
        }

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
