"""spark-submit entry point (BASELINE.md scaling protocol):

  spark-submit --master local[8] --py-files dist/engine.zip jobs/ingest.py \\
      --input /tmp/mfdedup_bench/images_50000.parquet --mode dedup \\
      --out /tmp/bench/run8

Modes:
  signatures  — signature stage + exact-fp classification only (the
                UDF-dominated ingest hot path)
  dedup       — full near-dup pipeline (signatures → LSH → verify →
                caption SA → connected components)
  ingest      — versioned NDF ingest into --warehouse (full reference
                --task=write semantics)

Prints exactly one JSON line with wall time and images/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow running as a plain script (spark-submit --py-files also works)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--mode", default="dedup",
                    choices=["signatures", "dedup", "ingest",
                             "restore_setup", "restore"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--warehouse", default="/tmp/mfdedup_warehouse")
    ap.add_argument("--fidelity", default="sampled", choices=["sampled", "full"])
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--profile-stages", action="store_true",
                    help="after the timed e2e, run an instrumented pass "
                    "attributing wall time per pipeline stage")
    ap.add_argument("--stage-metrics", action="store_true",
                    help="report per-stage input/shuffle byte volumes for "
                    "the timed section from the driver's status REST API "
                    "(requires spark.ui.enabled=true); the byte-level "
                    "account of where the wall time goes")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mfdedup_spark.config import EngineConfig, SignatureConfig

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    sig_cfg = SignatureConfig() if args.fidelity == "sampled" else SignatureConfig(
        shingle_sample_bits=0
    )

    # warm the python worker pool (startup excluded from throughput, like
    # any cluster warmup)
    import pandas as pd

    spark.range(0, cpus, 1, cpus).mapInPandas(
        lambda it: (pd.DataFrame({"x": [len(b)]}) for b in it), "x long"
    ).count()

    images = spark.read.parquet(args.input)
    if images.rdd.getNumPartitions() < cpus:
        images = images.repartition(cpus)
    n = images.count()  # row count outside the timed section

    def versioned_slices(df):
        """Derive a deterministic 3-version backup series from the
        single-version bench fixture, entirely in Spark (no 1M-row numpy
        regeneration): versions overlap ~85% (→ AdjacentDedup) and each
        introduces a fresh ~10-15% slice (→ Unique), keyed on the numeric
        image_id suffix so every run derives the identical series."""
        seq = F.regexp_replace("image_id", "[^0-9]", "").cast("long")
        d = df.withColumn("seq_no", seq).withColumn(
            "version", F.lit(0).cast("int")
        )
        cuts = {
            1: [(0.00, 0.80)],
            2: [(0.00, 0.68), (0.80, 0.90)],
            3: [(0.00, 0.58), (0.68, 0.73), (0.90, 1.00)],
        }
        out = {}
        for v, ranges in cuts.items():
            cond = None
            for lo, hi in ranges:
                c = (F.col("seq_no") >= int(lo * n)) & (
                    F.col("seq_no") < int(hi * n)
                )
                cond = c if cond is None else (cond | c)
            out[v] = d.where(cond).withColumn("version", F.lit(v).cast("int"))
        return out

    def run_signatures() -> None:
        from mfdedup_spark.functions.signatures import compute_signatures
        from mfdedup_spark.operators.classification import classify

        sig = compute_signatures(images, sig_cfg)
        classify(sig, None).write.format("noop").mode("overwrite").save()

    def run_dedup(df) -> None:
        """Timed e2e: ONE action forces the whole DAG, so independent
        branches (signature LSH vs caption suffix-array) run concurrently
        — no instrumentation barriers in the measured pass."""
        from mfdedup_spark.plans.pipeline import dedup_images

        res = dedup_images(df, sig_cfg)
        res["clusters"].write.format("noop").mode("overwrite").save()
        res["signatures"].unpersist()

    def profile_dedup(df) -> dict:
        """Separate instrumented pass (NOT the timed e2e): forces each
        pipeline stage behind a persist+count barrier to attribute wall
        time per stage — the getStatistics() analogue (main.cpp:151-155).
        Barriers serialize branches, so the stage sum exceeds the true
        pipelined e2e wall; use it for WHERE the time goes, not totals."""
        from mfdedup_spark.functions.signatures import compute_signatures
        from mfdedup_spark.operators.caption_match import caption_pairs
        from mfdedup_spark.operators.connected_components import (
            connected_components,
        )
        from mfdedup_spark.operators.lsh import candidate_pairs
        from mfdedup_spark.operators.verify import verify_pairs

        stages: dict = {}

        def mark(name, t0):
            t = time.time()
            stages[name] = round(t - t0, 2)
            return t

        t = time.time()
        sig = compute_signatures(df, sig_cfg).persist()
        sig.count()
        t = mark("signatures", t)
        cand, _ = candidate_pairs(sig, sig_cfg)
        cand = cand.persist()
        cand.count()
        t = mark("lsh_candidates", t)
        verified = verify_pairs(cand, sig, sig_cfg).persist()
        verified.count()
        t = mark("verify", t)
        cpairs, _ = caption_pairs(df, sig_cfg)
        cpairs = cpairs.persist()
        cpairs.count()
        t = mark("caption_sa", t)
        edges = (
            verified.select("image_id_a", "image_id_b")
            .unionByName(cpairs.select("image_id_a", "image_id_b"))
            .distinct()
        )
        clusters = connected_components(edges, sig.select("image_id"))
        clusters.write.format("noop").mode("overwrite").save()
        t = mark("connected_components", t)
        for fr in (sig, cand, verified, cpairs):
            fr.unpersist()
        return stages

    # steady-state measurement (identical at every parallelism level, like
    # cluster warmup): a full-file byte scan warms the OS page cache, and
    # an end-to-end pass over a 1/8 slice warms JVM JIT / codegen / python
    # workers with the same plan shapes at ~1/8 the cost of a full pass
    if args.mode in ("signatures", "dedup"):
        images.select(F.sum(F.length("bytes"))).collect()
        warm = spark.read.parquet(args.input).sample(0.125, seed=1).repartition(cpus)
        if args.mode == "signatures":
            from mfdedup_spark.functions.signatures import compute_signatures
            from mfdedup_spark.operators.classification import classify

            classify(compute_signatures(warm, sig_cfg), None).write.format(
                "noop"
            ).mode("overwrite").save()
        else:
            run_dedup(warm)

    if args.mode == "restore_setup":
        # one-time warehouse build for the restore scaling protocol: the
        # derived 3-version series is deterministic, so every later timed
        # restore run (at any core count) reuses this exact store
        from mfdedup_spark.plans.ingest import ingest_version
        from mfdedup_spark.store import DedupStore

        store = DedupStore(spark, args.warehouse)
        cfg = EngineConfig(warehouse=args.warehouse, signature=sig_cfg)
        slices = versioned_slices(images)
        done = store.read_manifest()["total_version"]
        for v in (1, 2, 3):
            if v > done:
                ingest_version(store, slices[v], cfg)
        print(json.dumps({
            "mode": "restore_setup", "cpus": cpus, "rows": n,
            "total_version": store.read_manifest()["total_version"],
            "time_sec": 0, "images_per_sec": 0,
        }))
        return

    restore_stats: dict = {}
    if args.mode == "restore":
        from mfdedup_spark.store import DedupStore

        store = DedupStore(spark, args.warehouse)
        assert store.read_manifest()["total_version"] >= 3, (
            "run --mode restore_setup first"
        )
        # page-cache warm identical at every level: scan the pool +
        # recipe partitions the timed restore will read
        from mfdedup_spark.plans.restore import chunk_pool

        pool, _, _, _ = chunk_pool(store, 2)
        pool.select(F.sum(F.length("bytes"))).collect()
        store.read_partitions("recipes", "version", [2]).select(
            F.sum("length")
        ).collect()

    def fetch_stages(spark) -> list[dict]:
        """All stage attempts from the driver's own status REST API
        (empty when the UI is disabled)."""
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        if not base:
            return []
        app_id = spark.sparkContext.applicationId
        try:
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages", timeout=10
            ) as r:
                return json.load(r)
        except Exception:
            return []

    pre_stage_ids = (
        {s["stageId"] for s in fetch_stages(spark)} if args.stage_metrics else set()
    )

    stage_timings: dict = {}
    t0 = time.time()
    if args.mode == "signatures":
        run_signatures()
    elif args.mode == "dedup":
        run_dedup(images)
    elif args.mode == "ingest":
        from mfdedup_spark.plans.ingest import ingest_series
        from mfdedup_spark.store import DedupStore

        store = DedupStore(spark, args.warehouse)
        cfg = EngineConfig(warehouse=args.warehouse, signature=sig_cfg)
        ingest_series(store, images, cfg)
    elif args.mode == "restore":
        from mfdedup_spark.plans.restore import restore_version

        restored, restore_stats = restore_version(store, 2)
        restored.write.format("noop").mode("overwrite").save()
        n = restore_stats["rows"]  # throughput = restored rows/sec

    dt = time.time() - t0
    if args.mode == "dedup" and args.profile_stages:
        # after the timed e2e: one instrumented pass for the per-stage
        # attribution (barriers serialize branches — never in the timing)
        stage_timings = profile_dedup(images)
    result = {
        "mode": args.mode,
        "fidelity": args.fidelity,
        "cpus": cpus,
        "rows": n,
        "time_sec": round(dt, 2),
        "images_per_sec": round(n / dt, 1),
    }
    if stage_timings:
        result["stages"] = stage_timings
    if args.stage_metrics:
        # byte-level account of the TIMED section only (stages that
        # started before t0 — setup, warmup, cache-warm scans — are
        # excluded): the reference's restore-at-IO-speed framing
        # (RestoreWritePipeline.h:124) demands knowing how many bytes
        # each stage actually moved, not just the wall clock
        # /stages returns every ATTEMPT; a stage retried after a fetch
        # failure would double-count its bytes/time — keep only the
        # latest attempt per stageId (ADVICE r05 low)
        latest: dict[int, dict] = {}
        for s in fetch_stages(spark):
            if s["stageId"] in pre_stage_ids or s["status"] != "COMPLETE":
                continue
            cur = latest.get(s["stageId"])
            if cur is None or s.get("attemptId", 0) > cur.get("attemptId", 0):
                latest[s["stageId"]] = s
        stages = [latest[k] for k in sorted(latest)]
        rows = [
            {
                "stage": s["stageId"],
                "name": s.get("name", "").split("\n")[0][:90],
                "input_bytes": s.get("inputBytes", 0),
                "output_bytes": s.get("outputBytes", 0),
                "shuffle_read_bytes": s.get("shuffleReadBytes", 0),
                "shuffle_write_bytes": s.get("shuffleWriteBytes", 0),
                "executor_run_ms": s.get("executorRunTime", 0),
                "tasks": s.get("numCompleteTasks", 0),
            }
            for s in stages
        ]
        rows.sort(key=lambda r: r["executor_run_ms"], reverse=True)
        result["stage_io"] = {
            "totals": {
                k: sum(r[k] for r in rows)
                for k in (
                    "input_bytes", "output_bytes",
                    "shuffle_read_bytes", "shuffle_write_bytes",
                    "executor_run_ms",
                )
            },
            "stages": rows,
        }
    if restore_stats:
        result["read_amplification"] = round(
            restore_stats["read_amplification"], 4
        )
        result["read_amplification_pruned"] = round(
            restore_stats["read_amplification_pruned"], 4
        )
        result["restored_bytes"] = restore_stats["restored_bytes"]
        result["scanned_bytes"] = restore_stats["scanned_bytes"]
        result["scanned_bytes_pruned"] = restore_stats["scanned_bytes_pruned"]
    line = json.dumps(result)
    print(line)
    if args.out:
        import os

        os.makedirs(args.out, exist_ok=True)
        with open(f"{args.out}/result.json", "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
