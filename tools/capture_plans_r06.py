"""Capture `.explain("formatted")` for headline/contract queries into
plans/r06/<query>_{before,after}.txt (round-6 judge evidence).

  python tools/capture_plans_r06.py before [query ...]
  python tools/capture_plans_r06.py after  [query ...]

With no query list, captures the six headline queries plus any contract
query named on the command line. Runs at sf0.1 with the bench session
shape so plans match what bench.py executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = [
    "image_dedup", "doc_cluster", "ndf_classify",
    "restore_prefix", "ngram_jaccard", "ann_topk",
]


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = sys.argv[2:] or HEADLINERS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import ensure_image_fixture, _sf_from_dir
    from mfdedup_spark import contract
    from mfdedup_spark.config import SignatureConfig
    from mfdedup_spark.plans.pipeline import dedup_images
    from mfdedup_spark.session import get_spark

    spark = get_spark(
        app="plans-r06", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_from_dir(sf_dir)
    n_images = max(200, int(80_000 * sf))

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    def build(name: str):
        if name == "image_dedup":
            images = spark.read.parquet(
                ensure_image_fixture(n_images)).repartition(cpus)
            return dedup_images(images, SignatureConfig())["clusters"]
        if name == "doc_cluster":
            return contract.flagship(spark, sf_dir)
        if name == "ndf_classify":
            return contract.q_ndf_classification_events(spark, sf_dir)
        if name == "restore_prefix":
            return contract.q_restore_prefix_sum(spark, sf_dir)
        if name == "ngram_jaccard":
            return contract.q_ngram_jaccard_docs(spark, sf_dir)
        if name == "ann_topk":
            return contract.q_ann_cosine_topk(spark, sf_dir)
        return contract.QUERIES[name](spark, sf_dir)

    for name in wanted:
        df = build(name)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
