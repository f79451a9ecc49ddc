"""The machine-CPU-ceiling burner shared by every bench job: a
pure-numpy pandas UDF with NO engine code. It must stay byte-identical
across jobs — the ceiling normalizes engine numbers, so two diverging
burners would silently skew one job's norm against another's."""

import time

import numpy as np
import pandas as pd


def burn_seconds(spark, repeats: int = 2) -> float:
    """Min wall seconds over ``repeats`` runs of the 400-iteration
    sqrt burner on a 2M-row/128-partition frame. Callers normalizing
    engine numbers must pass THEIR inner-repeat count so the ceiling
    gets the same noise rejection as the jobs it divides."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def burn(x: pd.Series) -> pd.Series:
        v = x.to_numpy(dtype=np.float64)
        acc = np.zeros_like(v)
        for _ in range(400):
            acc = np.sqrt(acc + v * 1.0000001)
        return pd.Series(acc)

    bdf = spark.range(0, 2_000_000, 1, 128).select(
        F.col("id").cast("double").alias("x"))
    bdf.select(burn("x").alias("y")).selectExpr("sum(y)").collect()  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        bdf.select(burn("x").alias("y")).selectExpr("sum(y)").collect()
        best = min(best, time.monotonic() - t0)
    return best
