"""Distributed exclusive prefix sum over a total order — the shared
two-phase primitive behind global sequence numbering
(scheduler.with_crawl_seq) and token-budget shard packing
(text.shard_by_token_budget).

Two-phase shape: range-partition + sort on the order key, collect the
P per-partition subtotals (P longs of driver traffic, never rows),
turn them into partition prefix offsets, then assign
offset + local exclusive cumsum inside a streaming mapInPandas. No
task ever holds more than ~1/P of the rows.

Correctness hinge: the subtotal job and the assignment pass MUST see
the identical partitioning. A bare repartitionByRange does not
guarantee that — each action plans a fresh physical RDD graph, so the
range exchange re-executes with a new sample seed and boundary rows
could land in different partitions per job, corrupting every
downstream offset. The sorted frame is therefore persisted
(MEMORY_AND_DISK): the subtotal job fills the cache, the assignment
pass reads the same blocks, and even a block lost to eviction
recomputes from the ORIGINAL exchange's shuffle files (same rdd graph,
boundaries already baked into the map output) — deterministic either
way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exclusive_prefix_sum(df: DataFrame, order: list[Column],
                         value: Column, out_col: str,
                         num_partitions: int,
                         release_into: list | None = None) -> DataFrame:
    """``df`` plus ``out_col`` = sum of ``value`` over all rows strictly
    before this one in the total order defined by ``order`` (which must
    be total — include a unique key — or the result is tie-ambiguous).
    Output rows arrive range-partitioned and sorted by ``order``.

    ``release_into``: the boundary-pinning cached frame is appended
    here so the caller can ``unpersist()`` it once the output has been
    fully materialized (e.g. into its own cache) — otherwise the blocks
    live until the frame is garbage-collected. Releasing early is safe
    for correctness (lineage recomputes through the original shuffle
    files) but costs a recompute per later evaluation."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    from pyspark import StorageLevel

    part = (df.withColumn("_val", value.cast("long"))
            .repartitionByRange(num_partitions, *order)
            .sortWithinPartitions(*order)
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))
    if release_into is not None:
        release_into.append(part)
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
