"""Structured Streaming validation: the same compiled ConstraintSet,
applied to an unbounded stream.

The row-level constraint projection is stateless, so it transfers to
streams unchanged (same Catalyst expressions, same codegen). Stateful
additions:
- windowed violation counts per constraint with a watermark for late
  events (`violation_counts`) — tumbling event-time windows,
- streaming violation feed (`stream_violations`) for an append sink.

Dataset-level checks (uniqueness, drift) are micro-batch-global, not
stream-global — for stream-global uniqueness use `dropDuplicates` with a
watermark upstream, or reconcile in the batch layer.

Checkpointing is Spark's own streaming checkpoint (offset + state store);
pass `checkpoint_dir` to every sink for exactly-once file output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from json_schema_spark.constraints.compiler import compile_constraints
from json_schema_spark.constraints.spec import ConstraintSet


def annotate_stream(stream_df: DataFrame, cset: ConstraintSet) -> DataFrame:
    """Add `_violations` (array of (constraint_id, observed_value)) to a
    streaming DataFrame — identical expression set as the batch path
    (evaluator.validate), re-derived here because streams cannot observe()
    or run dataset-level joins."""
    compiled = compile_constraints(cset, stream_df.schema)
    tagged = [
        F.when(~c.predicate,
               F.struct(F.lit(c.constraint_id).alias("constraint_id"),
                        c.observed.cast("string").alias("observed_value")))
        for c in compiled]
    varr = (F.filter(F.array(*tagged), lambda x: x.isNotNull()) if tagged
            else F.array().cast(
                "array<struct<constraint_id:string,observed_value:string>>"))
    return (stream_df
            .withColumn("_violations", varr)
            .withColumn("_ok", F.size("_violations") == 0))


def stream_violations(stream_df: DataFrame, cset: ConstraintSet,
                      id_col: str = "url",
                      ts_col: str | None = None) -> DataFrame:
    """Streaming violation feed: (id, constraint_id, observed_value,
    event_ts) — append-mode safe (stateless projection + filter).

    ``ts_col`` names the event-time column explicitly; when omitted the
    schema must contain at most ONE timestamp column (ambiguity raises
    instead of silently stamping the wrong event time), falling back to
    processing time when there is none."""
    ann = annotate_stream(stream_df, cset)
    if ts_col is not None:
        ts = F.col(ts_col)
    else:
        ts_cols = [f.name for f in stream_df.schema.fields
                   if f.dataType.typeName() == "timestamp"]
        if len(ts_cols) > 1:
            raise ValueError(
                f"multiple timestamp columns {ts_cols}; pass ts_col=")
        ts = F.col(ts_cols[0]) if ts_cols else F.current_timestamp()
    return (ann.filter(F.size("_violations") > 0)
            .select(F.col(id_col).cast("string").alias(id_col),
                    F.explode("_violations").alias("v"),
                    ts.alias("event_ts"))
            .select(id_col, F.col("v.constraint_id").alias("constraint_id"),
                    F.col("v.observed_value").alias("observed_value"),
                    "event_ts"))


def violation_counts(stream_df: DataFrame, cset: ConstraintSet,
                     ts_col: str = "warc_ts",
                     window_duration: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Windowed violation counts per constraint id with late-data
    tolerance: watermark bounds state, tumbling windows aggregate. Output
    mode `append` emits a window once the watermark passes it."""
    ann = annotate_stream(stream_df, cset)
    return (ann
            .withWatermark(ts_col, watermark)
            .select(F.col(ts_col),
                    F.explode_outer("_violations").alias("v"))
            .groupBy(F.window(F.col(ts_col), window_duration),
                     F.coalesce(F.col("v.constraint_id"), F.lit("__ok__"))
                      .alias("constraint_id"))
            .agg(F.count(F.lit(1)).alias("n")))


def host_violation_monitor(stream_df: DataFrame, cset: ConstraintSet,
                           url_col: str = "url") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-host CUMULATIVE row/violation counts across micro-batches.

    Built-in windowed aggregation forgets state outside the window; this
    keeps a running (rows_total, rows_failed) per host for the lifetime
    of the query — the "is this host degrading?" monitor. State is two
    longs per host (bounded by host cardinality); per batch the Arrow
    path hands each host's rows to one Python call.
    """
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout)
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    ann = annotate_stream(stream_df, cset)
    hosted = ann.select(
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://([^/]*)",
                         1).alias("host"),
        F.col("_ok"))

    out_type = StructType([
        StructField("host", StringType()),
        StructField("rows_total", LongType()),
        StructField("rows_failed", LongType()),
    ])
    state_type = StructType([
        StructField("rows_total", LongType()),
        StructField("rows_failed", LongType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        total, failed = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += len(pdf)
            failed += int((~pdf["_ok"]).sum())
        state.update((total, failed))
        yield pd.DataFrame({"host": [key[0]], "rows_total": [total],
                            "rows_failed": [failed]})

    return (hosted.groupBy("host")
            .applyInPandasWithState(update, out_type, state_type,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def start_violation_sink(stream_df: DataFrame, cset: ConstraintSet,
                         output_path: str, checkpoint_dir: str,
                         id_col: str = "url",
                         trigger_once: bool = True) -> StreamingQuery:
    """Write the violation feed to parquet with exactly-once semantics
    (streaming checkpoint). `trigger_once` drains available data and
    stops — the batch-style backfill pattern."""
    feed = stream_violations(stream_df, cset, id_col=id_col)
    writer = (feed.writeStream
              .format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class StreamingNovelFilter:
    """Cross-micro-batch incremental dedup: a foreachBatch processor
    that keeps a Bloom filter of every key seen in PRIOR batches on the
    driver (~1 MB at the default 8 Mbit), probes each new batch against
    it, hands the definitely-novel rows to ``sink``, then folds the
    batch's keys into the filter.

    Semantics: a key is emitted at most once across the stream's
    lifetime (no false negatives in the filter means no duplicate
    emissions); at the configured false-positive rate a genuinely novel
    key may be mistaken for seen and dropped — this is a PRE-FILTER for
    volume reduction (route `_maybe_seen` rows to exact reconciliation
    if completeness matters). The filter state lives on the driver, so
    restarts need re-priming: pass a `bloom` built over the already-
    emitted corpus (build_bloom), mirroring how the batch seen_filter
    primes from a reference table. All per-row work (md5 positions,
    bitmap scatter/probe) runs on executors via the same vectorized
    build/probe as the batch path; only the O(n_bits/8) byte OR runs
    per batch on the driver.

    Usage::

        f = StreamingNovelFilter(sink=lambda df, bid: df.write...)
        q = (stream.writeStream.foreachBatch(f)
             .option("checkpointLocation", ckpt).start())
    """

    def __init__(self, key_col: str = "digest", n_bits: int = 1 << 23,
                 n_hashes: int = 3, sink=None,
                 bloom: bytes | None = None):
        import numpy as np

        self.key_col = key_col
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.sink = sink
        if bloom is not None and len(bloom) != n_bits // 8:
            raise ValueError(
                f"priming bloom is {len(bloom)} bytes but n_bits="
                f"{n_bits} needs {n_bits // 8} — the filter must be "
                "re-primed with a bloom built at the same n_bits "
                "(mismatched sizes probe wrong bit positions)")
        self.bits = (np.frombuffer(bloom, dtype=np.uint8).copy()
                     if bloom is not None
                     else np.zeros(n_bits // 8, dtype=np.uint8))
        self.novel_count = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import numpy as np

        from json_schema_spark.textops.dedup import bloom_probe, build_bloom

        novel = (bloom_probe(batch_df, self.bits.tobytes(), self.key_col,
                             self.n_bits, self.n_hashes)
                 .filter(~F.col("_maybe_seen")).drop("_maybe_seen"))
        # the sink must consume novel BEFORE the filter absorbs the
        # batch (probe uses the pre-batch bitmap; within-batch
        # duplicates therefore all pass — dropDuplicates upstream or in
        # the sink if per-batch uniqueness matters)
        if self.sink is not None:
            self.sink(novel, batch_id)
        else:
            self.novel_count += novel.count()
        self.bits |= np.frombuffer(
            build_bloom(batch_df, self.key_col, self.n_bits,
                        self.n_hashes), dtype=np.uint8)


class ShardedNovelFilter:
    """Web-scale cross-batch incremental dedup: the sharded-bloom
    analog of StreamingNovelFilter. The filter state is a (shard,
    bloom) PARQUET TABLE under ``state_dir`` — built, probed, merged,
    and stored entirely on executors/disk, never materialized on the
    driver — so membership state scales past the single-bitmap
    driver cap (~10^9 keys) to whatever n_shards x bits_per_shard the
    cluster's storage holds (see textops.dedup's sharding sizing
    rule).

    Per batch: probe the batch against the current state epoch
    (cogrouped applyInPandas — one task per touched shard), hand the
    definitely-novel rows to ``sink``, then OR-merge the batch's shard
    bitmaps into a NEW state epoch directory (write-then-promote:
    ``state_dir/epoch=N`` is only adopted after its write completes,
    so a mid-write crash leaves the previous epoch intact; once the
    new epoch is adopted the superseded one is deleted — state on
    disk stays ONE filter copy, not one per batch). Restart
    recovery is automatic — the newest complete epoch on disk primes
    the filter, mirroring how Spark's own streaming state store
    versions per batch. Same semantics as StreamingNovelFilter: no
    false negatives (a key never re-emits), false positives at the
    configured rate drop novel keys — a volume pre-filter, not an
    exact dedup.
    """

    def __init__(self, state_dir: str, key_col: str = "digest",
                 n_shards: int = 16, bits_per_shard: int = 1 << 23,
                 n_hashes: int = 3, sink=None):
        import os
        import re

        self.state_dir = state_dir
        self.key_col = key_col
        self.n_shards = n_shards
        self.bits_per_shard = bits_per_shard
        self.n_hashes = n_hashes
        self.sink = sink
        self.novel_count = 0
        self._epoch_re = re.compile(r"^epoch=(\d+)$")
        os.makedirs(state_dir, exist_ok=True)
        # refuse state from a different bit-position scheme: bitmaps
        # are length-compatible across schemes, so without this stamp
        # a restart would probe stale bits silently (re-emitting seen
        # keys AND dropping novel ones)
        from json_schema_spark.textops.dedup import BLOOM_SCHEME

        marker = os.path.join(state_dir, "_scheme.txt")
        if os.path.exists(marker):
            with open(marker) as fh:
                found = fh.read().strip()
            if found != BLOOM_SCHEME:
                raise ValueError(
                    f"state_dir was written under bloom scheme "
                    f"{found!r} but the engine now uses "
                    f"{BLOOM_SCHEME!r} — stale bitmaps probe "
                    "uselessly; start from a fresh state_dir")
        else:
            with open(marker, "w") as fh:
                fh.write(BLOOM_SCHEME)
        self.current_epoch = self._latest_epoch()

    def _latest_epoch(self) -> int | None:
        import os

        epochs = []
        for name in os.listdir(self.state_dir):
            m = self._epoch_re.match(name)
            # _SUCCESS marks a complete parquet write — a torn epoch
            # from a mid-write crash is ignored (and superseded)
            if m and os.path.exists(
                    os.path.join(self.state_dir, name, "_SUCCESS")):
                epochs.append(int(m.group(1)))
        return max(epochs) if epochs else None

    def _epoch_path(self, epoch: int) -> str:
        import os

        return os.path.join(self.state_dir, f"epoch={epoch}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from json_schema_spark.textops.dedup import (
            bloom_probe_shards, build_bloom_shards, merge_bloom_shards)

        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            if self.current_epoch is not None:
                state = spark.read.parquet(
                    self._epoch_path(self.current_epoch))
                novel = (bloom_probe_shards(
                    batch_df, state, self.key_col, self.n_shards,
                    self.bits_per_shard, self.n_hashes)
                    .filter(~F.col("_maybe_seen")).drop("_maybe_seen"))
            else:
                state = None
                novel = batch_df
            if self.sink is not None:
                self.sink(novel, batch_id)
            else:
                self.novel_count += novel.count()
            fresh = build_bloom_shards(batch_df, self.key_col,
                                       self.n_shards,
                                       self.bits_per_shard,
                                       self.n_hashes)
            merged = (merge_bloom_shards(state, fresh)
                      if state is not None else fresh)
            next_epoch = (self.current_epoch or 0) + 1
            merged.write.mode("overwrite").parquet(
                self._epoch_path(next_epoch))
            prev = self.current_epoch
            self.current_epoch = next_epoch
            # each epoch is a FULL filter copy (n_shards x
            # bits_per_shard/8 bytes) — drop the superseded one or the
            # state store grows by one copy per micro-batch
            if prev is not None:
                import shutil

                shutil.rmtree(self._epoch_path(prev),
                              ignore_errors=True)
        finally:
            batch_df.unpersist()


class StreamingNearNovelFilter:
    """Cross-batch NEAR-dup novelty on the live ingest path: the
    MinHash-LSH analog of the Bloom novel filters — "have we seen
    something LIKE this" instead of "this exact key". State is the
    persistable LSH bucket index (textops.dedup.build_minhash_index
    rows) under ``index_dir``, APPEND-ONLY parquet: bucket rows are
    immutable facts, so there is no epoch merge — each batch appends
    the buckets of its NOVEL rows only (keep-first: near-dups of an
    indexed doc never enter the index, so state grows with the
    distinct corpus, not the stream). Restart recovery is automatic —
    the index on disk IS the state.

    Per batch: probe against the index so far (candidates only — LSH
    recall applies: a near-dup that shares no band bucket re-emits),
    hand rows with no candidate to ``sink``, append their buckets.
    Caveats, shared with the Bloom filters: within-batch near-dups
    all pass (the probe sees only prior batches — near_dedup_corpus
    the batch first if that matters); a crash between sink and append
    re-runs the batch (the usual foreachBatch at-least-once contract;
    re-appended buckets are harmless duplicates). Rows whose text
    yields no shingle (< k words) never index and re-emit every
    batch — route them through an exact novel filter first."""

    def __init__(self, index_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3,
                 num_hashes: int = 16, bands: int = 4,
                 max_bucket_size: int | None = None, sink=None):
        import os

        self.index_dir = index_dir
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.max_bucket_size = max_bucket_size
        self.sink = sink
        self.novel_count = 0
        os.makedirs(index_dir, exist_ok=True)

    def _has_index(self) -> bool:
        import os

        return any(n.startswith("part-") and n.endswith(".parquet")
                   for n in os.listdir(self.index_dir))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from json_schema_spark.textops.dedup import (build_minhash_index,
                                                     novel_vs_index)

        spark = batch_df.sparkSession
        if self._has_index():
            index = spark.read.parquet(self.index_dir)
            novel = novel_vs_index(
                batch_df, index, self.text_col, self.id_col,
                k=self.k, num_hashes=self.num_hashes, bands=self.bands,
                max_bucket_size=self.max_bucket_size)
        else:
            novel = batch_df
        # two consumers (sink + the bucket append) — persist so the
        # probe anti-join doesn't run twice
        novel = novel.persist()
        try:
            if self.sink is not None:
                self.sink(novel, batch_id)
            else:
                self.novel_count += novel.count()
            (build_minhash_index(novel, self.text_col, self.id_col,
                                 self.k, self.num_hashes, self.bands)
             .write.mode("append").parquet(self.index_dir))
        finally:
            novel.unpersist()


class StreamingDriftMonitor:
    """Distribution-drift monitoring on the live ingest path: a
    foreachBatch processor that keeps CUMULATIVE per-(day, category)
    counts across micro-batches and emits per-day PSI and
    Jensen-Shannon divergence against a FIXED baseline frequency map
    after each batch — the streaming face of
    checks.drift.drift_vs_baseline (same formulas, same eps clamp,
    same rounding; once the stream has drained, report() equals the
    batch operator run over the same rows).

    Scale: the heavy work — counting — runs as a per-batch Spark
    aggregation on executors; the driver folds and holds only the
    O(days x categories) count grid (bytes, the same "sketches are
    tiny" contract as the batch drift layer — a web corpus has a few
    hundred langs/categories and a bounded day range). ``sink``
    receives (report_rows, batch_id) after each batch for alert
    routing.
    """

    def __init__(self, baseline_freqs: dict[str, float],
                 cat_col: str = "lang", ts_col: str = "ts",
                 eps: float = 1e-6, sink=None):
        self.baseline = dict(baseline_freqs)
        self.cat_col = cat_col
        self.ts_col = ts_col
        self.eps = eps
        self.sink = sink
        self.counts: dict = {}  # (day, cat) -> n

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = (batch_df
                .select(F.to_date(F.col(self.ts_col)).alias("day"),
                        F.coalesce(F.col(self.cat_col),
                                   F.lit("__null__")).alias("cat"))
                .groupBy("day", "cat")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect())
        for r in rows:
            key = (r["day"], r["cat"])
            self.counts[key] = self.counts.get(key, 0) + r["n"]
        if self.sink is not None:
            self.sink(self.report(), batch_id)

    def report(self) -> list[dict]:
        """Per-day drift vs the baseline from the cumulative counts:
        [{day, psi, js_divergence}] sorted by day."""
        from json_schema_spark.checks.drift import js_divergence, psi

        by_day: dict = {}
        for (day, cat), n in self.counts.items():
            by_day.setdefault(day, {})[cat] = n
        out = []
        for day in sorted(by_day):
            total = sum(by_day[day].values())
            freqs = {c: n / total for c, n in by_day[day].items()}
            out.append({
                "day": day,
                "psi": round(psi(freqs, self.baseline, self.eps), 6),
                "js_divergence": round(
                    js_divergence(freqs, self.baseline), 6),
            })
        return out


class StreamingRateMonitor:
    """Event-rate spike monitoring on the live ingest path: a
    foreachBatch processor keeping CUMULATIVE per-(entity, bucket)
    counts across micro-batches; report() replays the exact integer
    z-score formula of checks.drift.rate_anomalies (same trailing
    window, same zero-variance sentinel, Decimal HALF_UP rounding to
    match Spark's round()), so once the stream has drained the report
    equals the batch operator over the same rows — parity-tested.

    Scale: counting runs as a per-batch Spark aggregation on
    executors; the driver folds and holds only the O(entities x
    buckets) grid. That grid is bounded by monitored-entity count x
    time range — scope the stream to the entities under watch (or
    shard monitors by entity hash) when the population is large; the
    rate math itself is O(grid)."""

    def __init__(self, entity_col: str = "user_id",
                 ts_col: str = "ts", bucket: str = "hour",
                 baseline_windows: int = 24, z_threshold: float = 3.0,
                 min_baseline: int = 6, sink=None):
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.bucket = bucket
        self.baseline_windows = baseline_windows
        self.z_threshold = z_threshold
        self.min_baseline = min_baseline
        self.sink = sink
        self.counts: dict = {}  # (entity, bucket_dt) -> n

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = (batch_df
                .filter(F.col(self.ts_col).isNotNull())
                .select(F.col(self.entity_col).alias("e"),
                        F.date_trunc(self.bucket,
                                     F.col(self.ts_col)).alias("b"))
                .groupBy("e", "b").agg(F.count(F.lit(1)).alias("n"))
                .collect())
        for r in rows:
            key = (r["e"], r["b"])
            self.counts[key] = self.counts.get(key, 0) + r["n"]
        if self.sink is not None:
            self.sink(self.report(), batch_id)

    @staticmethod
    def _round6(x: float) -> float:
        # Spark's round() is HALF_UP on the double's SHORTEST
        # decimal repr (BigDecimal.valueOf -> Double.toString), not on
        # the exact binary expansion; Python's repr() produces the
        # same shortest round-trip digits, so quantize that. Plain
        # round() (banker's) or Decimal(x) (exact binary) both
        # diverge on boundary values.
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    def report(self) -> list[dict]:
        """Flagged (entity, bucket, n, baseline_mean, z) rows — the
        same rows batch rate_anomalies returns for the drained data."""
        import math

        by_entity: dict = {}
        for (e, b), n in self.counts.items():
            by_entity.setdefault(e, []).append((b, n))
        out = []
        for e in by_entity:
            series = sorted(by_entity[e])
            for i, (b, n) in enumerate(series):
                frame = series[max(0, i - self.baseline_windows):i]
                k = len(frame)
                # k < 2 also never flags in the batch operator (its
                # variance is NULL there) — keep exact parity even
                # when min_baseline is 1
                if k < max(2, self.min_baseline):
                    continue
                s = sum(x for _, x in frame)
                ss = sum(x * x for _, x in frame)
                mean = s / k
                num = k * ss - s * s
                if num > 0:
                    z = (n - mean) / math.sqrt(num / (k * (k - 1)))
                    if z >= self.z_threshold:
                        out.append({"entity": e,
                                    "bucket": b.strftime(
                                        "%Y-%m-%d %H:%M:%S"),
                                    "n": n,
                                    "baseline_mean": self._round6(mean),
                                    "z": self._round6(z)})
                elif num == 0 and n > mean:
                    out.append({"entity": e,
                                "bucket": b.strftime(
                                    "%Y-%m-%d %H:%M:%S"),
                                "n": n,
                                "baseline_mean": self._round6(mean),
                                "z": -1.0})
        out.sort(key=lambda r: (str(r["entity"]), r["bucket"]))
        return out


def stream_sessions(stream_df: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Event-time sessionization on an unbounded stream: per-user
    session windows that close after ``gap`` of inactivity, with a
    watermark bounding how late events may arrive (later ones are
    dropped, earlier state is finalized and evicted — state size stays
    proportional to OPEN sessions, not history). The streaming analog
    of the batch sessionize query; append-mode sinks emit each session
    exactly once, when the watermark passes its close."""
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("session"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col(user_col),
                    F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    "n_events"))
