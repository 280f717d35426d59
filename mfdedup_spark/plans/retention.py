"""Retention GC — the reference's ``--task=delete`` / Eliminator
(/root/reference/DedupPipeline/Eliminator.h:15-101, SURVEY.md §3.3).

The reference's "near-zero-cost GC" merges/renames category files and
patches volume offset arrays without touching chunk payloads. Here the
same outcome is pure partition metadata:

- the expired version's recipe partition is dropped
- archived volumes whose chunks' last live version < the new oldest
  retained version are dropped (their chunks can't appear in any retained
  recipe — the NDF liveness-interval property)
- fp_index / classification / clusters / metrics partitions of the
  expired version are dropped
- lineage rows record the drops

No chunk bytes are read or rewritten (BASELINE.md: "metadata-only").
"""

from __future__ import annotations

from mfdedup_spark.store import DedupStore


def apply_retention(store: DedupStore, retention: int) -> dict:
    """Expire oldest versions while more than ``retention`` are live
    (main.cpp:170-175: triggered inside write when exceeded)."""
    manifest = store.read_manifest()
    total = manifest["total_version"]
    oldest_retained = manifest.get("oldest_version", 1)
    dropped: list[str] = []
    while total - oldest_retained + 1 > retention:
        o = oldest_retained
        for table, key in (
            ("recipes", "version"),
            ("fp_index", "version"),
            ("classification", "version"),
            ("clusters", "version"),
            ("drop_log", "version"),
            ("metrics", "version"),
        ):
            if store.drop_partition(table, key, o):
                dropped.append(f"{table}/{key}={o}")
        # volume o holds chunks last-live at o → unreachable from any
        # retained version > o (Eliminator.h:54-75 offset-merge analogue)
        if store.drop_partition("archived", "archive_version", o):
            dropped.append(f"archived/archive_version={o}")
        oldest_retained += 1
    if dropped or oldest_retained != manifest.get("oldest_version", 1):
        store.write_manifest({**manifest, "oldest_version": oldest_retained})
        store.append_lineage(
            [
                {
                    "partition_id": p,
                    "version": oldest_retained - 1,
                    "rows": 0,
                    "bytes": 0,
                    "state": "dropped",
                }
                for p in dropped
            ]
        )
    return {"oldest_version": oldest_retained, "dropped": dropped}
