"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of existing DataFrame operators (the
task's preferred order: composition > pandas-UDF > mapPartitions):

- ``asof_join``: the classic union-and-carry formulation — tag both
  sides, sort within each key partition by (ts, side), and carry the
  most recent right-side payload forward with last(ignorenulls) over an
  unbounded-preceding window. ONE shuffle on the key, one local sort —
  the same cost profile as a sort-merge join, with no range explosion.
- ``range_join``: equi-bucketized interval join — index intervals and
  probes onto coarse time buckets, equi-join on (key, bucket), then
  filter to the exact containment. Turns the O(rows x intervals)
  cross-range comparison into bucket-local work, with AQE handling any
  residual bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | list[str] | None = None,
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              keyless_buckets: int = 32) -> DataFrame:
    """For every left row, attach the payload of the LATEST right row
    with right.on <= left.on (inclusive), optionally per ``by`` key —
    matching DuckDB/kdb ASOF JOIN semantics. Left rows with no prior
    right row get NULLs.

    Columns: all left columns + each requested right column renamed
    with ``suffix``. ``right_cols`` defaults to every non-key right
    column.

    With ``by`` keys the carry window partitions on the key — one
    shuffle, parallel per key. WITHOUT keys a naive global window is a
    single-partition global sort (the r2 review's scale hazard), so the
    keyless path range-buckets rows by ``on`` quantiles
    (``keyless_buckets`` of them, one approxQuantile pass), runs the
    carry window per bucket in parallel, and stitches buckets with a
    bucket-count-sized cumulative carry-in table joined back by
    broadcast — same semantics, no global sort.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c != on and c not in by_cols]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols])
    r_tag = right.select(
        *[(F.col(c) if (c in by_cols or c == on)
           else F.lit(None).cast(left.schema[c].dataType)).alias(c)
          for c in left.columns],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols])

    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (_side 0 < 1), making
    # the match inclusive; a right row's payload is carried by
    # last(ignorenulls) to every later left row in the key partition.
    # A right row carrying a genuinely-NULL payload value cannot be
    # distinguished from "no right row yet" per column, so the carried
    # marker is a struct (non-null as a whole once ANY right row was
    # seen), unpacked after the window.
    marker = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"_r_{c}").alias(c) for c in right_cols]))

    if by_cols:
        w = (Window.partitionBy(*by_cols)
             .orderBy(F.col(on).asc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = (unioned.withColumn("_carried",
                                  F.last(marker, ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
        return out.select(
            *[F.col(c) for c in left.columns],
            *[F.col("_carried").getField(c).alias(f"{c}{suffix}")
              for c in right_cols])

    # ---- keyless path: range-bucketed parallel carry ----
    # Bucket boundaries from one approxQuantile pass over the union;
    # rows at a boundary value all land in the SAME bucket (count of
    # boundaries <= ts), so bucket order is consistent with ts order and
    # the within-bucket (ts, _side) sort preserves inclusive semantics.
    if unioned.schema[on].dataType.typeName() in (
            "timestamp", "timestamp_ntz", "date"):
        ts_ep = F.col(on).cast("timestamp").cast("double")
    else:
        ts_ep = F.col(on).cast("double")
    # persist: the union feeds THREE plan branches below (the carry
    # window, bucket_last, all_bkts) and would otherwise recompute per
    # branch; the approxQuantile action materializes the cache
    # immediately. Caller releases via cache.release_caches() (see the
    # registry's ownership contract) or spark.catalog.clearCache().
    from json_schema_spark.cache import register_cache

    tagged = register_cache(unioned.withColumn("_ts_ep", ts_ep))
    n_b = max(1, keyless_buckets)
    qs = [i / n_b for i in range(1, n_b)]
    boundaries = sorted(set(
        tagged.approxQuantile("_ts_ep", qs, 0.001))) if qs else []
    if boundaries:
        bnd = F.array(*[F.lit(b) for b in boundaries])
        bkt = F.aggregate(
            bnd, F.lit(0),
            lambda acc, b: acc + F.when(F.col("_ts_ep") >= b,
                                        F.lit(1)).otherwise(F.lit(0)))
    else:
        bkt = F.lit(0)
    # NULL ts rows get bucket -1 so they sort before every real bucket
    # — matching the keyed path, where NULLS FIRST puts them ahead of
    # all timestamps. (The aggregate above maps NULL _ts_ep to 0, never
    # NULL, so the isNull branch — not a coalesce — is what routes
    # them.)
    rows = tagged.withColumn(
        "_bkt", F.when(F.col("_ts_ep").isNull(), F.lit(-1)).otherwise(bkt))

    w_in = (Window.partitionBy("_bkt")
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rows = rows.withColumn("_carried_in_bkt",
                           F.last(marker, ignorenulls=True).over(w_in))

    # carry-in per bucket: the last right-side marker of every EARLIER
    # bucket — bucket-count-sized tables, cumulated with a window over
    # <= keyless_buckets rows, broadcast back onto the data
    # the max_by ordering key coalesces NULL ts to -inf so bucket -1
    # (all-NULL ts) still yields a marker — its last right row must
    # carry into later buckets exactly as in the keyed path, where a
    # NULL-ts right row sorts first and carries until overridden
    bucket_last = (rows.filter(F.col("_side") == 0)
                   .groupBy("_bkt")
                   .agg(F.max_by(
                       F.struct(*[F.col(f"_r_{c}").alias(c)
                                  for c in right_cols]),
                       F.struct(F.coalesce(F.col("_ts_ep"),
                                           F.lit(float("-inf"))),
                                F.col("_side"))).alias("_m")))
    all_bkts = rows.select("_bkt").distinct()
    w_cum = (Window.orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    carry_in = (all_bkts.join(bucket_last, "_bkt", "left")
                .withColumn("_carry_in",
                            F.last("_m", ignorenulls=True).over(w_cum))
                .select("_bkt", "_carry_in"))

    out = (rows.join(F.broadcast(carry_in), "_bkt")
           .filter(F.col("_side") == 1)
           .withColumn("_carried", F.coalesce(F.col("_carried_in_bkt"),
                                              F.col("_carry_in"))))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col("_carried").getField(c).alias(f"{c}{suffix}")
          for c in right_cols])


def range_join(probes: DataFrame, intervals: DataFrame,
               probe_ts: str = "ts", start_col: str = "start",
               end_col: str = "end",
               by: str | list[str] | None = None,
               bucket: float = 3600.0) -> DataFrame:
    """Rows of ``probes`` joined to every interval containing them:
    start <= probe_ts < end (per optional ``by`` key).

    Each interval is exploded onto the coarse buckets it overlaps; each
    probe maps to exactly one bucket — the join is then an equi-join on
    (key, bucket) plus the exact range filter. Bucket width trades
    replication (long intervals explode onto more buckets) against
    bucket-local pair counts; pick it near the typical interval length.
    """
    from pyspark.sql import types as T

    by_cols = [by] if isinstance(by, str) else list(by or [])
    b = float(bucket)

    def _epoch(df: DataFrame, name: str):
        c = F.col(name)
        if isinstance(df.schema[name].dataType,
                      (T.TimestampType, T.TimestampNTZType, T.DateType)):
            # TIMESTAMP_NTZ has no direct double cast; route via
            # timestamp (epoch seconds) — bucketing only needs a
            # monotonic mapping consistent within this engine
            return c.cast("timestamp").cast("double")
        return c.cast("double")

    p_b = F.floor(_epoch(probes, probe_ts) / b).cast("long")
    s_b = F.floor(_epoch(intervals, start_col) / b).cast("long")
    e_b = F.floor(_epoch(intervals, end_col) / b).cast("long")

    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(s_b, e_b)))
    pr = probes.withColumn("_bucket", p_b)
    cond = [pr["_bucket"] == iv["_bucket"]] + [
        pr[c] == iv[c] for c in by_cols]
    joined = (pr.join(iv, cond)
              .filter((pr[probe_ts] >= iv[start_col])
                      & (pr[probe_ts] < iv[end_col])))
    keep = [pr[c] for c in probes.columns] + [
        iv[c] for c in intervals.columns if c not in by_cols]
    return joined.select(*keep)
