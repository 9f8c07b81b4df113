"""Bucketed co-located joins (no exchange) and salted skew joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed-table warehouse for bucketed writes
    return spark


def test_bucketed_join_has_no_shuffle(spark):
    from json_schema_spark.sources.bucketing import (
        co_located_join, plan_has_shuffle, write_bucketed)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.select("event_id", "user_id", "value")
    right = ev.select("event_id", "event_type")
    write_bucketed(left, "b_left", ["event_id"], 8)
    write_bucketed(right, "b_right", ["event_id"], 8)
    try:
        joined = co_located_join(spark, "b_left", "b_right", ["event_id"])
        assert not plan_has_shuffle(joined), \
            "bucketed equi-join must not exchange"
        # and it's still correct
        assert joined.count() == ev.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_salted_join_matches_plain_join(spark):
    from json_schema_spark.sources.bucketing import salted_join

    # skewed left: one hot key with most rows
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)],
        "k long, payload long")
    right = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "unmatched")],
        "k long, name string")
    plain = {(r["k"], r["payload"], r["name"])
             for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["payload"], r["name"])
              for r in salted_join(left, right, "k", salt=4).collect()}
    assert salted == plain
    assert len(salted) == 502


def test_salted_join_rejects_outer_and_collisions(spark):
    import pytest
    from pyspark.sql import functions as F

    from json_schema_spark.sources.bucketing import salted_join

    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(3).select(F.col("id").alias("k"),
                                  F.lit("x").alias("v"))
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(left.withColumn("__jss_salt__", F.lit(1)), right, "k")
    # left join keeps unmatched left rows exactly once
    out = salted_join(left, right, "k", how="left")
    assert out.count() == 10


def test_snapshot_diff_on_bucketed_snapshots_has_no_shuffle(spark):
    """snapshot_diff's scale claim: writing both snapshots bucketed on
    the id makes the full-outer join co-located — zero exchange — and
    the delta itself is unchanged."""
    from json_schema_spark.sources.bucketing import (plan_has_shuffle,
                                                     write_bucketed)
    from json_schema_spark.textops.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string")
    plain = {(r.doc_id, r.status)
             for r in snapshot_diff(old, new).collect()}
    assert plain == {(2, "changed"), (3, "removed"), (4, "added")}

    write_bucketed(old, "b_snap_old", ["doc_id"], 4)
    write_bucketed(new, "b_snap_new", ["doc_id"], 4)
    try:
        out = snapshot_diff(spark.table("b_snap_old"),
                            spark.table("b_snap_new"))
        assert not plan_has_shuffle(out), \
            "bucketed snapshot diff must not exchange"
        assert {(r.doc_id, r.status) for r in out.collect()} == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_snap_old")
        spark.sql("DROP TABLE IF EXISTS b_snap_new")
