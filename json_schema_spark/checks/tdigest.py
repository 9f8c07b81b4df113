"""Mergeable t-digest quantile sketches (Dunning & Ertl's merging
variant, public algorithm) — the north_star's alternative to
percentile_approx for drift detection.

From-scratch, dependency-free implementation. Spark integration:
`daily_tdigest_sketch` builds one digest per (day x partition-slice) via
applyInPandas (Arrow batches, centroids out — never raw values), and the
tiny per-day centroid rows merge driver-side (`TDigest.merge`) into the
day digests the KS comparison consumes. At any corpus size the driver
sees O(days x compression) floats.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class TDigest:
    """Merging t-digest with the k1 scale function: centroid sizes are
    bounded tightly near the tails (accurate extreme quantiles), loosely
    in the middle."""

    compression: float = 100.0
    means: list[float] = field(default_factory=list)
    weights: list[float] = field(default_factory=list)

    # -- construction ---------------------------------------------------
    @classmethod
    def of(cls, values, compression: float = 100.0) -> "TDigest":
        d = cls(compression)
        pairs = sorted((float(v), 1.0) for v in values
                       if v is not None and not (
                           isinstance(v, float) and math.isnan(v)))
        d._merge_sorted(pairs)
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        pairs = sorted(
            list(zip(self.means, self.weights))
            + list(zip(other.means, other.weights)))
        out = TDigest(min(self.compression, other.compression))
        out._merge_sorted(pairs)
        return out

    def _merge_sorted(self, pairs: list[tuple[float, float]]) -> None:
        self.means, self.weights = [], []
        total = sum(w for _, w in pairs)
        if total == 0:
            return
        # k1 scale: k(q) = (δ / 2π) asin(2q - 1); a centroid may span
        # [q0, q1] iff k(q1) - k(q0) <= 1
        delta = self.compression

        def k(q: float) -> float:
            return delta / (2 * math.pi) * math.asin(
                max(-1.0, min(1.0, 2 * q - 1)))

        cur_m, cur_w = pairs[0]
        q0 = 0.0
        for m, w in pairs[1:]:
            q1 = q0 + (cur_w + w) / total
            if k(q1) - k(q0) <= 1.0:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                self.means.append(cur_m)
                self.weights.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = m, w
        self.means.append(cur_m)
        self.weights.append(cur_w)

    # -- queries --------------------------------------------------------
    @property
    def total_weight(self) -> float:
        return sum(self.weights)

    def quantile(self, q: float) -> float:
        if not self.means:
            return float("nan")
        q = max(0.0, min(1.0, q))
        target = q * self.total_weight
        cum = 0.0
        for i, (m, w) in enumerate(zip(self.means, self.weights)):
            if cum + w >= target:
                # linear interpolation inside the centroid span
                if i == 0 or w == 0:
                    return m
                prev_m = self.means[i - 1]
                frac = (target - cum) / w
                return prev_m + (m - prev_m) * min(1.0, frac + 0.5) \
                    if frac < 0.5 else m
            cum += w
        return self.means[-1]

    def quantiles(self, probs: list[float]) -> list[float]:
        return [self.quantile(p) for p in probs]

    def cdf(self, x: float) -> float:
        if not self.means:
            return float("nan")
        cum = 0.0
        total = self.total_weight
        for m, w in zip(self.means, self.weights):
            if m <= x:
                cum += w
            else:
                break
        return cum / total


def daily_tdigest_sketch(df, value_col: str, ts_col: str = "warc_ts",
                         compression: float = 100.0) -> dict:
    """{day -> TDigest} built distributed: applyInPandas emits one
    centroid-row per (day, group-slice); driver merges per day."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_type = T.StructType([
        T.StructField("day", T.StringType()),
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ])

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        day = str(pdf["day"].iloc[0])
        d = TDigest.of(pdf["_v"].dropna().tolist(), compression)
        return pd.DataFrame({"day": [day], "means": [d.means],
                             "weights": [d.weights]})

    rows = (df.select(F.to_date(F.col(ts_col)).cast("string").alias("day"),
                      F.col(value_col).cast("double").alias("_v"))
            .filter(F.col("_v").isNotNull())
            .groupBy("day")
            .applyInPandas(build, out_type)
            .collect())
    digests: dict[str, TDigest] = {}
    for r in rows:
        d = TDigest(compression, list(r["means"]), list(r["weights"]))
        digests[r["day"]] = d.merge(digests[r["day"]]) \
            if r["day"] in digests else d
    return digests


def ks_between(a: TDigest, b: TDigest,
               probs: list[float] | None = None) -> float:
    """KS statistic from two digests: max CDF gap over the union of their
    quantile grids."""
    probs = probs or [i / 50 for i in range(51)]
    xs = sorted(set(a.quantiles(probs)) | set(b.quantiles(probs)))
    if not xs:
        return float("nan")
    return max(abs(a.cdf(x) - b.cdf(x)) for x in xs)
