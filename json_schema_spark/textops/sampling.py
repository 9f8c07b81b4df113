"""Deterministic sampling / splitting for training-data pipelines.

`sample()`/`sampleBy()` draw from a per-task RNG — results change with
partitioning, retries, and engine, which breaks reproducible corpus
construction and oracle checks. These operators key every decision off
md5(seed:id) instead: pure projections, stable under any partitioning,
identical in any engine that has md5 (the repo-wide determinism trick).

The hash value u = first-8-hex-digits(md5) / 16^8 is uniform on [0,1);
selection is `u < fraction` (or bucket boundaries for splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def _unit_hash(col: Column, seed: str) -> Column:
    """Deterministic uniform [0,1) from md5(seed:key)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 8),
        16, 10).cast("double")
    return h / F.lit(_DENOM)


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         seed: str = "jss-sample",
                         strata_col: str | None = None,
                         fractions: dict | None = None) -> DataFrame:
    """Keep ~fraction of rows, decided per row by hash(seed:id) — same
    rows survive regardless of partitioning, retries, or engine.
    With ``strata_col``/``fractions``, each stratum gets its own rate
    (absent strata default to ``fraction``)."""
    u = _unit_hash(F.col(id_col), seed)
    if strata_col is None:
        return df.filter(u < F.lit(float(fraction)))
    rate = F.lit(float(fraction))
    for value, frac in (fractions or {}).items():
        rate = F.when(F.col(strata_col) == value,
                      F.lit(float(frac))).otherwise(rate)
    return df.filter(u < rate)


def temperature_sample(df: DataFrame, strata_col: str,
                       alpha: float = 0.5,
                       target_fraction: float = 0.5,
                       id_col: str = "doc_id",
                       seed: str = "jss-temp") -> DataFrame:
    """Temperature-weighted stratum rebalancing (the XLM/mT5 corpus
    recipe): target stratum share p_s ∝ n_s^alpha — alpha < 1 boosts
    small strata (languages, sources) and damps head strata; alpha=1
    is proportional (plain sampling), alpha=0 is uniform-over-strata.
    Keeps ~``target_fraction`` of the corpus overall by sampling
    stratum s at rate min(1, target_fraction * N * p_s / n_s), decided
    per row by the same md5(seed:id) unit hash as
    deterministic_sample — reproducible under any partitioning, any
    engine. Rates are rounded to 6 decimals so the arithmetic is
    engine-replayable despite pow() ulp differences. A stratum whose
    boosted rate caps at 1 keeps everything (the overall kept fraction
    then lands slightly under target — standard behavior).

    Scale story: one partial+final count aggregation over the corpus,
    a single-partition window over the #strata-row count table for the
    rate derivation, and ONE broadcast join of the rate table
    (#strata rows — a bounded dimension, same contract as the
    referential check) back onto the corpus: no corpus shuffle.
    NULL strata form their own stratum (null-safe join)."""
    from pyspark.sql import Window

    counts = (df.groupBy(F.col(strata_col).alias("_s"))
              .agg(F.count(F.lit(1)).alias("_n")))
    # totals via an unpartitioned window over the counts table — a
    # single-partition pass over #strata rows, not over the corpus
    w = Window.partitionBy()
    rate = F.round(F.lit(target_fraction) * F.sum("_n").over(w)
                   * F.pow("_n", F.lit(alpha))
                   / F.sum(F.pow("_n", F.lit(alpha))).over(w)
                   / F.col("_n"), 6)
    rates = counts.select(
        "_s", F.least(F.lit(1.0), rate).alias("_rate"))
    u = _unit_hash(F.col(id_col), seed)
    return (df.join(F.broadcast(rates),
                    df[strata_col].eqNullSafe(rates["_s"]))
            .filter(u < F.col("_rate"))
            .drop("_s", "_rate"))


def pack_sequences(df: DataFrame, budget: int,
                   token_col: str = "n_tokens",
                   id_col: str = "doc_id",
                   n_shards: int = 32,
                   pack_col: str = "pack_id") -> DataFrame:
    """Assign every document to a training-sequence pack of ~``budget``
    tokens: documents are sharded deterministically (md5 of the id, so
    shards are stable under repartitioning), ordered by id within the
    shard, and chunked by exclusive cumulative token count — pack k of
    shard s holds the docs whose running total lands in
    [k*budget, (k+1)*budget). The LAST doc of a pack may overflow the
    budget by up to its own length (the standard streaming-packing
    trade; split or drop over-long docs upstream if hard caps matter).

    Scale: each shard packs independently — the window sort is
    per-shard (one shuffle), so parallelism = n_shards regardless of
    corpus size, and pack ids ('shard:seq') are globally unique and
    reproducible. Returns df + pack_col."""
    from pyspark.sql import Window as W

    shard = F.conv(F.substring(
        F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("bigint") % n_shards
    w = (W.partitionBy("_shard").orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, -1))
    excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (df.withColumn("_shard", shard)
            .withColumn(pack_col,
                        F.concat_ws(":", F.col("_shard"),
                                    F.floor(excl / budget)))
            .drop("_shard"))


def hash_split(df: DataFrame, weights: dict[str, float],
               id_col: str = "doc_id",
               seed: str = "jss-split",
               split_col: str = "split") -> DataFrame:
    """Assign every row to one named split (train/val/test/...) by hash
    bucket — disjoint, exhaustive, reproducible; weights need not sum
    to 1 (they are normalized)."""
    total = sum(weights.values())
    u = _unit_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def mix_corpus(df: DataFrame, weights: dict[str, float],
               token_budget: int,
               source_col: str = "source",
               text_col: str = "text",
               token_col: str | None = None,
               id_col: str = "doc_id",
               seed: str = "jss-mix") -> DataFrame:
    """Weighted corpus mixing to a token budget — the mixture-spec
    step of LLM pre-training prep (Pile/LLaMA-style source recipes):
    source s receives a token_budget share proportional to
    ``weights[s]``; sources absent from the spec are DROPPED. Each
    source is then sampled at rate
    least(1, round(budget * w_s / sum(w) / tokens_s, 6)), so the
    expected kept-token count per source matches its share (a source
    smaller than its share keeps everything — the overall mixture then
    lands under budget, the standard behavior; rebalance weights or
    upsample upstream if hard shares matter). Selection is the
    md5(seed:id) unit hash — reproducible under any partitioning, any
    engine. Contrast temperature_sample, which derives the shares from
    corpus counts; here the recipe is explicit.

    ``token_col`` names a precomputed per-doc token count; by default
    whitespace tokens are counted inline. Output: input columns +
    n_tokens.

    Scale story: one partial+final token-sum aggregation per source
    (bounded #sources rows), rate derivation on that tiny table, and
    ONE broadcast join of the rates back onto the corpus — no corpus
    shuffle, same contract as temperature_sample."""
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    from json_schema_spark.textops.textanalysis import token_count

    total_w = float(sum(weights.values()))
    n_tok = (F.col(token_col).cast("bigint") if token_col
             else token_count(F.col(text_col)).cast("bigint"))
    base = (df.filter(F.col(source_col).isin(list(weights)))
            .withColumn("n_tokens", n_tok))
    totals = base.groupBy(F.col(source_col).alias("_s")) \
                 .agg(F.sum("n_tokens").alias("_tn"))
    w_expr = None
    for src, w in weights.items():
        branch = (F.col("_s") == src, F.lit(float(w)))
        w_expr = F.when(*branch) if w_expr is None else w_expr.when(*branch)
    rate = F.least(F.lit(1.0), F.round(
        F.lit(float(token_budget)) * w_expr / F.lit(total_w)
        / F.col("_tn").cast("double"), 6))
    rates = totals.select("_s", rate.alias("_rate"))
    u = _unit_hash(F.col(id_col), seed)
    return (base.join(F.broadcast(rates),
                      base[source_col] == rates["_s"])
            .filter(u < F.col("_rate"))
            .drop("_s", "_rate"))


def take_per_stratum(df: DataFrame, n: int, strata_col: str,
                     id_col: str = "doc_id",
                     seed: str = "jss-take") -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is
    smaller) — the eval-set construction primitive that rate-based
    deterministic_sample cannot express. Rows are ranked inside each
    stratum by md5(seed:id) (a deterministic shuffle: no positional or
    insertion-order bias, identical in any engine), id as tie-break,
    and the first n win.

    Scale story: ONE shuffle — the per-stratum window sort. Per-task
    memory is bounded by the stratum's rows in that partition;
    pathological single-stratum corpora degrade to a single-reducer
    sort, so keep strata cardinality > parallelism or pre-filter.
    (A top-n-per-key aggregate would bound memory at O(n) per task;
    this form keeps the plan to one window and stays exact.)"""
    from pyspark.sql import Window as W

    if n < 1:
        raise ValueError("n must be >= 1")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        W.partitionBy(strata_col).orderBy(h, F.col(id_col)))
    return (df.withColumn("_rn", rn)
            .filter(F.col("_rn") <= n).drop("_rn"))


def weighted_sample(df: DataFrame, weight_col: str, n: int,
                    id_col: str = "doc_id",
                    seed: str = "jss-wsample") -> DataFrame:
    """Exactly ``n`` rows drawn WITHOUT replacement with probability
    proportional to ``weight_col`` — the Efraimidis-Spirakis (2006)
    reservoir rule, deterministic: each row's key is u^(1/w) with u
    the repo's md5-uniform (no RNG, stable under partitioning,
    engine-replayable), and the n largest keys win. Rank runs on
    ln(u)/w (monotone in u^(1/w), better float behavior than the pow)
    ROUNDED to 6 dp with id tie-break, the engine-exact-boundary
    discipline every ranked oracle here uses. Rows with NULL or
    non-positive weight are excluded (they have zero mass; ln is
    undefined there). Complements temperature_sample (rate-based,
    approximate counts) with exact-count weighted selection — e.g.
    'give me 10k docs, longer ones proportionally likelier'.

    Scale note: a global top-n — single-partition window, fine for
    bounded n; for huge n use an approxQuantile threshold on the key
    (same escape hatch as dsir_select)."""
    from pyspark.sql import Window as W

    if n < 1:
        raise ValueError("n must be >= 1")
    # u in (0, 1]: (first-8-hex + 1) / 2^32 — the +1 keeps ln(u)
    # finite at the all-zero hash
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"),
                       F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double") + 1.0) / F.lit(_DENOM))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 6)
    win = W.partitionBy().orderBy(F.col("_key").desc(), F.col(id_col))
    return (df.filter(w.isNotNull() & (w > 0))
            .withColumn("_key", key)
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= n)
            .drop("_key"))


def cap_per_group(df: DataFrame, group_col: str, n: int,
                  order_by: list[Column],
                  salt_shards: int | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """Keep at most ``n`` rows per group, BEST-first under the
    caller's ``order_by`` (e.g. quality score descending) — the
    domain-capping cut every crawl-derived training mix applies so a
    handful of link-farm hosts can't dominate the corpus (C4 and
    RefinedWeb both cap per-host contributions). Unlike
    take_per_stratum's hash-random pick, the survivors here are the
    group's TOP rows; make the ordering deterministic (append a
    unique id column) or ranking inside ties is engine-arbitrary.

    Skew story: one domain with billions of rows turns a plain
    per-group window into a single-reducer sort. ``salt_shards=S``
    runs a two-phase top-n: phase 1 ranks within (group,
    md5(id) mod S) shards and keeps n per shard — S parallel
    reducers per hot group, each emitting at most n rows — phase 2
    re-ranks the <= S*n survivors per group. Identical output to the
    unsalted window (every global top-n row wins its shard), one
    extra (small) shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from pyspark.sql import Window as W

    out = df
    if salt_shards:
        shard = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                               1, 15), 16, 10)
            .cast("bigint") % salt_shards)
        rn1 = F.row_number().over(
            W.partitionBy(F.col(group_col), shard).orderBy(*order_by))
        out = (out.withColumn("_rn", rn1)
               .filter(F.col("_rn") <= n).drop("_rn"))
    rn = F.row_number().over(
        W.partitionBy(group_col).orderBy(*order_by))
    return (out.withColumn("rank_in_group", rn)
            .filter(F.col("rank_in_group") <= n))
