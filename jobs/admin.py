"""Admin CLI — the reference's ``--task=status`` / init.sh analogues
(/root/reference/main.cpp:218-221, build/init.sh).

  python jobs/admin.py status  --warehouse /tmp/wh
  python jobs/admin.py init    --warehouse /tmp/wh
  python jobs/admin.py restore --warehouse /tmp/wh --version 2 --out /tmp/r2
  python jobs/admin.py delete  --warehouse /tmp/wh --retention 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("task", choices=["status", "init", "restore", "delete"])
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--version", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--retention", type=int, default=2)
    ap.add_argument(
        "--ordered",
        action="store_true",
        help="sort restored output by seq_no (a second full payload "
        "exchange — placement normally rides the offset column; use for "
        "seek-less sequential sinks)",
    )
    args = ap.parse_args()

    if args.task == "init":
        if os.path.exists(args.warehouse):
            shutil.rmtree(args.warehouse)
        os.makedirs(args.warehouse)
        print(json.dumps({"initialized": args.warehouse}))
        return

    from mfdedup_spark.session import get_spark
    from mfdedup_spark.store import DedupStore

    spark = get_spark(app="mfdedup-admin")
    spark.sparkContext.setLogLevel("ERROR")
    store = DedupStore(spark, args.warehouse)

    if args.task == "status":
        m = store.read_manifest()
        out = {
            "total_version": m["total_version"],
            "arrangement_fall_behind": m["arrangement_fall_behind"],
            "oldest_version": m.get("oldest_version", 1),
            "live_categories": store.list_partitions("chunk_store", "category"),
            "archived_volumes": store.list_partitions("archived", "archive_version"),
        }
        from mfdedup_spark.streaming.ingest_stream import pending_versions

        # streamed versions parked behind a gap (ADVICE r02: must surface)
        out["pending_versions"] = pending_versions(store)
        lineage = store.read_lineage()
        if lineage is not None:
            out["lineage_rows"] = lineage.count()
        # per-stage durations (reference: getStatistics(), main.cpp:151-155)
        stats = store.read_stage_stats()
        if stats is not None:
            from pyspark.sql import functions as F

            out["stage_seconds"] = {
                r["stage"]: round(r["s"], 3)
                for r in stats.groupBy("stage")
                .agg(F.sum("seconds").alias("s"))
                .collect()
            }
        print(json.dumps(out))
    elif args.task == "restore":
        from mfdedup_spark.plans.restore import restore_version

        restored, stats = restore_version(store, args.version, ordered=args.ordered)
        if args.out:
            restored.write.mode("overwrite").parquet(args.out)
        stats.pop("scanned_partitions", None)
        print(json.dumps(stats))
    else:  # delete
        from mfdedup_spark.plans.retention import apply_retention

        print(json.dumps(apply_retention(store, args.retention)))


if __name__ == "__main__":
    sys.exit(main())
