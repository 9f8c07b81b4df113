"""t-digest sketch: accuracy, mergeability, Spark integration, drift."""

from __future__ import annotations

import random

from json_schema_spark.checks.tdigest import TDigest, ks_between


def test_quantile_accuracy_uniform():
    rng = random.Random(42)
    vals = [rng.random() for _ in range(50_000)]
    d = TDigest.of(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        assert abs(d.quantile(q) - q) < 0.02, q
    # centroid count bounded by compression
    assert len(d.means) <= 2 * d.compression


def test_merge_equals_whole():
    rng = random.Random(7)
    a = [rng.gauss(0, 1) for _ in range(20_000)]
    b = [rng.gauss(0, 1) for _ in range(20_000)]
    merged = TDigest.of(a).merge(TDigest.of(b))
    whole = TDigest.of(a + b)
    for q in (0.05, 0.5, 0.95):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 0.05
    assert merged.total_weight == 40_000


def test_ks_separates_distributions():
    rng = random.Random(3)
    base = TDigest.of([rng.gauss(0, 1) for _ in range(20_000)])
    same = TDigest.of([rng.gauss(0, 1) for _ in range(20_000)])
    shifted = TDigest.of([rng.gauss(1.5, 1) for _ in range(20_000)])
    assert ks_between(base, same) < 0.05
    assert ks_between(base, shifted) > 0.4


def test_daily_sketch_detects_webtext_drift(spark):
    """The webtext generator shifts text length in its last 5 days; the
    t-digest KS per day vs the pre-drift baseline must flag exactly the
    drifted window."""
    from pyspark.sql import functions as F

    from json_schema_spark.checks.tdigest import daily_tdigest_sketch
    from json_schema_spark.sources.webtext import DRIFT_DAY, generate_webtext

    web = generate_webtext(spark, 30_000).withColumn(
        "text_len", F.length("text"))
    digests = daily_tdigest_sketch(web, "text_len")
    days = sorted(digests)
    assert len(days) == 30

    base = None
    for day in days[:20]:
        base = digests[day] if base is None else base.merge(digests[day])
    ks = {day: ks_between(base, digests[day]) for day in days}
    pre = [ks[d] for d in days[:DRIFT_DAY - 5]]
    post = [ks[d] for d in days[DRIFT_DAY:]]
    assert max(pre) < 0.2
    assert min(post) > 0.3, f"drift days not flagged: {post}"
