"""Distributed exclusive prefix sum over a total order — the shared
two-phase primitive behind global sequence numbering
(scheduler.with_crawl_seq) and token-budget shard packing
(text.shard_by_token_budget).

Two-phase shape: range-partition + sort on the order key, materialize
that frame ONCE (eager localCheckpoint), collect the P per-partition
subtotals (P longs of driver traffic, never rows), turn them into
partition prefix offsets, then assign offset + local exclusive cumsum
inside a streaming mapInPandas. No task ever holds more than ~1/P of
the rows.

Correctness hinge: the subtotal job and the assignment pass MUST see
the identical partitioning. A bare repartitionByRange does not
guarantee that — each action plans a fresh physical RDD graph, so the
range exchange could re-execute with fresh boundaries and land
boundary rows in a different partition per job, corrupting every
downstream offset. Round 5 pinned this with a MEMORY_AND_DISK persist,
which is only *probabilistically* safe: a cached block evicted under a
long-lived session's memory pressure (or dropped by
``spark.catalog.clearCache()`` between the subtotal collect and the
assignment pass — exactly what a multi-query driver harness can do)
recomputes through a re-planned exchange, and the recompute path is
what the round-5 driver flake on shard01_token_shards hit. The eager
``localCheckpoint`` removes the recompute path entirely: both passes
read the SAME materialized blocks (MEMORY_AND_DISK-backed, lineage
truncated, not registered in the CacheManager so clearCache cannot
touch it); a lost block fails loudly instead of silently re-planning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _CheckpointHandle:
    """Duck-typed stand-in for the DataFrame the ``release_into``
    contract hands back: ``unpersist()`` frees the localCheckpoint's
    materialized blocks promptly (they are not in the CacheManager, so
    ``DataFrame.unpersist()`` would be a no-op — the underlying RDD is
    reached through the LogicalRDD instead; best-effort, since a leak
    merely waits for the ContextCleaner)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False):
        try:
            (self._df._jdf.queryExecution().analyzed()
             .rdd().unpersist(blocking))
        except Exception:
            pass
        return self._df


def exclusive_prefix_sum(df: DataFrame, order: list[Column],
                         value: Column, out_col: str,
                         num_partitions: int,
                         release_into: list | None = None) -> DataFrame:
    """``df`` plus ``out_col`` = sum of ``value`` over all rows strictly
    before this one in the total order defined by ``order`` (which must
    be total — include a unique key — or the result is tie-ambiguous).
    Output rows arrive range-partitioned and sorted by ``order``.

    ``release_into``: a handle for the boundary-pinning checkpointed
    frame is appended here so the caller can ``unpersist()`` it once
    the output has been fully materialized (e.g. into its own cache) —
    otherwise the blocks live until the frame is garbage-collected.
    Releasing early is safe only after the output no longer needs to be
    re-evaluated (the checkpoint IS the output's lineage root)."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    part = (df.withColumn("_val", value.cast("long"))
            .repartitionByRange(num_partitions, *order)
            .sortWithinPartitions(*order)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    if release_into is not None:
        release_into.append(_CheckpointHandle(part))
    subtotals = {int(r["_pid"]): int(r["s"]) for r in
                 part.groupBy("_pid").agg(F.sum("_val").alias("s"))
                 .collect()}
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]

    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, LongType(), False)])
    out_cols = [f.name for f in out_schema.fields]

    def assign(batches):
        done = 0
        off = None
        for pdf in batches:
            if len(pdf) == 0:
                continue  # an empty leading batch must not pin off=0
            if off is None:
                off = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            vals = pdf["_val"].to_numpy(dtype="int64")
            excl = off + done + np.concatenate(([0], np.cumsum(vals)[:-1]))
            pdf = pdf.assign(**{out_col: excl})
            done += int(vals.sum())
            yield pdf[out_cols]

    return part.mapInPandas(assign, out_schema)
