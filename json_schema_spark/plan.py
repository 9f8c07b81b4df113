"""Plan-shaping helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Guarantee at least the cluster's default parallelism ahead of a
    row-EXPANDING stage (exploding char-grams, shingles, or tokens —
    expansion factors of 50-500x per document).

    Why: Spark's narrow stages inherit the SCAN's split count. A corpus
    that arrives as few splits (one small parquet file locally; a
    coalesced or non-splittable block on a cluster; a single row-group
    file that file-split configs cannot cut further) runs the whole
    expansion — the md5/tokenize hot loop — on that many cores while
    the rest of the cluster idles, and no downstream exchange can
    recover the lost work. Measured locally: winnowing 5k docs in one
    split = 2.9s, after fan_out 0.8s on 32 cores.

    Cost: one round-robin exchange of the UN-expanded rows — a small
    fraction of the bytes the expanded stream pushes into the next
    exchange (window / groupBy) anyway. No-op whenever the input
    already has enough partitions, which is the normal 100-TB case
    (~10^6 parquet blocks), so big scans never pay a gratuitous full
    shuffle.
    """
    target = min_partitions
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
