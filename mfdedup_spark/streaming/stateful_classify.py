"""Stateful streaming NDF classification — the reference's sequential
DeduplicationPipeline probe loop (/root/reference/DedupPipeline/
DeduplicationPipeline.h:47-131) as an ``applyInPandasWithState`` operator
(SURVEY §2.6: custom stateful streaming).

The batch classifier (operators/classification.py) vectorizes NDF into a
window + semi-join against the PREVIOUS version's fp index. The streaming
twin keeps the equivalent knowledge as per-fp GroupState: the last
version each fingerprint appeared in. For a record of version v:

  state.last_version == v      → INTERNAL   (already seen within v)
  state.last_version == v - 1  → ADJACENT   (in the NDF earlierTable)
  otherwise                    → UNIQUE     (older-than-adjacent fps do
                                             NOT dedup — the reference's
                                             O(1)-memory two-table trick,
                                             MetadataManager.h:60-77)

then last_version := v. Cross-micro-batch state makes the classification
identical to running the batch classifier version-by-version, as long as
versions arrive in order (the stream_ingest arrival contract; within a
batch rows are sorted by (version, seq_no) so a batch may carry several
versions). State is one int per live fingerprint — the same O(previous
version) footprint as the batch index, sharded by Spark's state store.

Scale note: state lives in the HDFS-backed state store keyed by fp —
partitioned across executors, checkpointed per micro-batch; no driver
state, no broadcast of a growing index.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: input rows: the signature-stage output the batch classifier consumes
CLASSIFY_INPUT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("seq_no", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("fp", T.StringType()),
    ]
)

CLASSIFY_OUTPUT_SCHEMA = T.StructType(
    CLASSIFY_INPUT_SCHEMA.fields
    + [T.StructField("result", T.StringType())]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_version", T.IntegerType())])


def _classify_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """One fingerprint's records (possibly spanning versions) against its
    last-seen-version state.

    The runtime hands the group as an ITERATOR of Arrow chunks in shuffle
    order, NOT version order — chunks must be concatenated before the
    sort or a later-version chunk processed first poisons the state
    (observed: 620/10000 under-classifications). One fp's records per
    batch must therefore fit in worker memory — fine for this operator:
    a group is one fingerprint's occurrences within one micro-batch."""
    (last_v,) = state.get if state.exists else (None,)
    chunks = [pdf for pdf in pdfs]
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values(["version", "seq_no"])
    results = []
    for v in pdf["version"]:
        v = int(v)
        if last_v == v:
            results.append("INTERNAL")
        elif last_v == v - 1:
            results.append("ADJACENT")
        else:
            results.append("UNIQUE")
        last_v = v
    out = pdf.copy()
    out["result"] = results
    yield out
    if last_v is not None:
        state.update((int(last_v),))


def stateful_classify(records: DataFrame) -> DataFrame:
    """Streaming DataFrame of signature records → classified records.
    Attach to a readStream source and any sink; state checkpointing rides
    the query's checkpointLocation."""
    return records.groupBy("fp").applyInPandasWithState(
        _classify_group,
        outputStructType=CLASSIFY_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_classify(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "ndf_stream",
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Watch ``source_dir`` for signature-record parquet files (one file
    per version, in-order mtimes — the stream_ingest arrival contract)
    and emit NDF classifications to an in-memory table. Returns
    (query, table_name)."""
    stream = (
        spark.readStream.schema(CLASSIFY_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = (
        stateful_classify(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), query_name
