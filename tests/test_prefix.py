"""operators/prefix.exclusive_prefix_sum: the shared two-phase
distributed prefix sum behind with_crawl_seq and
shard_by_token_budget."""

from pyspark.sql import functions as F

from data_crawler_spark.operators.prefix import exclusive_prefix_sum


def test_prefix_sum_partial_sampling_regime(spark):
    """At >100 rows per upstream partition, repartitionByRange's
    boundaries come from a PARTIAL reservoir sample — the regime where
    an unpinned two-phase pass could see different boundaries in its
    subtotal and assignment jobs. The boundary-pinning checkpoint must
    make the result exact (== the window cumsum) for every width, on
    repeated invocations."""
    n = 50_000
    df = (spark.range(n, numPartitions=2)
          .select(F.col("id").alias("k"),
                  (F.pmod(F.col("id") * 2654435761, F.lit(997)) + 1)
                  .alias("v")))
    from pyspark.sql import Window
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {r.k: r.e for r in
            df.withColumn("e", F.coalesce(F.sum("v").over(w), F.lit(0)))
            .collect()}
    for p in (4, 16):
        for _ in range(2):  # repeated invocations must agree exactly
            rel = []
            out = exclusive_prefix_sum(df, [F.asc("k")], F.col("v"),
                                       "e", p, release_into=rel)
            got = {r.k: r.e for r in out.collect()}
            assert got == want, f"num_partitions={p}"
            assert len(rel) == 1
            rel[0].unpersist()


def test_prefix_sum_survives_cache_eviction(spark):
    """Round-6 torture test for the round-5 driver flake
    (shard01_token_shards hash_match=false): under a long-lived session
    the boundary pin must hold even when every CacheManager entry is
    dropped between the subtotal collect (which runs at construction
    time) and the assignment materialization — a cheap simulation of
    memory-pressure eviction mid-query. The eager localCheckpoint is
    immune (not a CacheManager entry, no recompute path); the old
    MEMORY_AND_DISK persist pin was not."""
    from pyspark.sql import Window

    n = 20_000
    df = (spark.range(n, numPartitions=3)
          .select(F.col("id").alias("k"),
                  (F.pmod(F.col("id") * 2654435761, F.lit(997)) + 1)
                  .alias("v")))
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {r.k: r.e for r in
            df.withColumn("e", F.coalesce(F.sum("v").over(w), F.lit(0)))
            .collect()}
    for _ in range(3):
        rel = []
        # construction runs the checkpoint + subtotal collect ...
        out = exclusive_prefix_sum(df, [F.asc("k")], F.col("v"),
                                   "e", 8, release_into=rel)
        # ... now drop every cached plan before the assignment pass
        spark.catalog.clearCache()
        got = {r.k: r.e for r in out.collect()}
        assert got == want
        # and a SECOND materialization of the same frame must agree
        got2 = {r.k: r.e for r in out.collect()}
        assert got2 == want
        rel[0].unpersist(blocking=True)


def test_prefix_sum_releases_checkpoint(spark):
    """release_into hands back exactly the checkpointed frame; draining
    it leaves no persistent RDDs behind."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    rel = []
    df = spark.range(1000).select(F.col("id").alias("k"),
                                  F.lit(1).alias("v"))
    out = exclusive_prefix_sum(df, [F.asc("k")], F.col("v"), "e", 4,
                               release_into=rel)
    assert out.count() == 1000
    for c in rel:
        c.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == before
