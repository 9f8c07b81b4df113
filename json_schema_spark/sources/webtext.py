"""Deterministic Common-Crawl-style webtext synthesizer.

Shape fixed by BASELINE.json input_hint:
(url string, warc_ts timestamp, html binary, text string, lang string).

Every column is a pure JVM-side expression of `spark.range(n)` + seeded
xxhash64/md5 — generation is itself distributed (no driver-side data, no
Python row loop), so the same generator scales from the 6k-row smoke table
to bench-scale without changing shape. Seed=42 everywhere; same (n, seed)
→ byte-identical table.

Injected anomalies (per FIXTURES.md §1):
- ~1% duplicate urls (uniqueness violations), a few skewed hot hosts
- ~0.5% malformed urls (scheme missing / bad hostname chars)
- text: ~3% null, ~1% empty; length long-tail; BYTE-IDENTICAL function of
  url (the per-url extracted-text invariant: text = f(url) exactly)
- html: pseudo-HTML bytes, ~2% null
- lang: Zipf over 10 allow-listed codes + ~0.8% bad codes + ~1% null
- drift: last 5 of 30 days draw text-length and lang from a shifted
  distribution (the drift-detection positive case); the day is encoded in
  the url path so text stays a pure function of url
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
DAYS = 30
DRIFT_DAY = 25  # days >= this draw from the shifted distribution
T0 = "2025-06-01 00:00:00"

LANG_ALLOWLIST = ["en", "de", "fr", "es", "ru", "zh", "ja", "pt", "it", "nl"]
# cumulative permille thresholds (Zipf-ish), pre-drift
_LANG_CUM = [380, 570, 680, 760, 820, 870, 910, 945, 975, 1000]
# drifted: mass shifted toward zh/ru
_LANG_CUM_DRIFT = [220, 340, 420, 490, 640, 820, 890, 940, 975, 1000]

WEBTEXT_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")


def _h(col, salt: int):
    return F.abs(F.xxhash64(col, F.lit(SEED + salt)))


def _lang_expr(r, day):
    """Piecewise Zipf pick with a drifted variant for late days."""
    def pick(cum):
        expr = F.lit(LANG_ALLOWLIST[-1])
        for code, hi in reversed(list(zip(LANG_ALLOWLIST, cum))):
            expr = F.when(r < hi, code).otherwise(expr)
        return expr

    return F.when(day >= DRIFT_DAY, pick(_LANG_CUM_DRIFT)) \
            .otherwise(pick(_LANG_CUM))


def generate_webtext(spark: SparkSession, n_rows: int,
                     partitions: int | None = None) -> DataFrame:
    """Build the webtext DataFrame. Deterministic in (n_rows, SEED)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_rows, 1, partitions)
    rid = F.col("id")

    # ~1% of rows point at a neighbor's base_id → duplicate urls
    dup_roll = F.pmod(_h(rid, 1), F.lit(100))
    base_id = F.when(dup_roll == 0, (rid / 13).cast("long") * 13) \
               .otherwise(rid).alias("base_id")
    df = df.select(rid, base_id)
    b = F.col("base_id")

    # day is a function of base_id so duplicated urls share a day
    day = F.pmod(_h(b, 2), F.lit(DAYS))
    df = df.withColumn("day", day)
    day = F.col("day")

    # hosts: 20% of traffic on 5 hot hosts (skew), rest across 10k hosts
    hot_roll = F.pmod(_h(b, 3), F.lit(100))
    host_id = F.when(hot_roll < 20, F.pmod(_h(b, 4), F.lit(5))) \
               .otherwise(F.pmod(_h(b, 5), F.lit(10_000)) + 5)
    host = F.concat(F.lit("www.host"), host_id.cast("string"), F.lit(".example"))

    path = F.concat(F.lit("/d"), day.cast("string"),
                    F.lit("/page/"), b.cast("string"))
    good_url = F.concat(F.lit("https://"), host, path)
    # ~0.5% malformed: missing scheme or an illegal hostname character
    bad_roll = F.pmod(_h(b, 6), F.lit(1000))
    url = (F.when(bad_roll < 3, F.concat(host, path))                  # no scheme
            .when(bad_roll < 5, F.concat(F.lit("https://bad_host!"),
                                         host_id.cast("string"),
                                         F.lit(".example"), path))     # bad char
            .otherwise(good_url))
    df = df.withColumn("url", url)
    u = F.col("url")

    # ---- text: STRICT function of url (byte-identical per-url invariant) --
    hu = F.md5(u)
    troll = F.pmod(F.abs(F.xxhash64(u, F.lit(SEED + 7))), F.lit(1000))
    word = F.substring(hu, 1, 8)
    # length factor: long-tail; urls on drifted days (day in path) run longer
    base_len = F.when(day >= DRIFT_DAY, F.lit(24)).otherwise(F.lit(8))
    tail = F.pmod(F.conv(F.substring(hu, 9, 4), 16, 10).cast("long"),
                  F.lit(32))
    nrep = (base_len + tail * tail / F.lit(16)).cast("int")
    body = F.concat(F.lit("doc "), hu, F.lit(" "),
                    F.repeat(F.concat(word, F.lit(" ")), nrep))
    text = (F.when(troll < 30, F.lit(None).cast("string"))  # ~3% null
             .when(troll < 40, F.lit(""))                   # ~1% empty
             .otherwise(body))
    df = df.withColumn("text", text)

    # ---- html: pseudo-HTML bytes correlated with text, ~2% null ----------
    hroll = F.pmod(_h(b, 8), F.lit(100))
    html_str = F.concat(F.lit("<html><head><title>"), word,
                        F.lit("</title></head><body><p>"),
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit("</p></body></html>"))
    html = F.when(hroll < 2, F.lit(None).cast("binary")) \
            .otherwise(F.encode(html_str, "UTF-8"))
    df = df.withColumn("html", html)

    # ---- lang: Zipf + bad codes + nulls, drifted in late days ------------
    lroll = F.pmod(_h(b, 9), F.lit(1000))
    lang = (F.when(lroll < 10, F.lit(None).cast("string"))       # ~1% null
             .when(lroll < 14, F.lit("xx"))                      # bad codes
             .when(lroll < 18, F.lit("q1"))                      # ~0.8% total
             .otherwise(_lang_expr(F.pmod(_h(b, 10), F.lit(1000)), day)))
    df = df.withColumn("lang", lang)

    # ---- warc_ts: day (from base_id) + per-row second-of-day -------------
    sec = day * 86400 + F.pmod(_h(rid, 11), F.lit(86400))
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(T0).cast("timestamp")) + sec)
    df = df.withColumn("warc_ts", warc_ts)

    return df.select("url", "warc_ts", "html", "text", "lang")


def write_webtext(spark: SparkSession, path: str, n_rows: int,
                  partitioned: bool = True) -> None:
    """Materialize to parquet, hive-partitioned by day(warc_ts) — the
    parquet stand-in for the production Iceberg `days(warc_ts)` partition
    transform; partition pruning on warc_day works the same way."""
    df = generate_webtext(spark, n_rows)
    if partitioned:
        (df.withColumn("warc_day", F.to_date("warc_ts"))
           .write.mode("overwrite").partitionBy("warc_day").parquet(path))
    else:
        df.write.mode("overwrite").parquet(path)


def load_webtext(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select("url", "warc_ts", "html", "text", "lang")


def generate_skewed_corpus(spark: SparkSession, n_rows: int,
                           n_dup: int | None = None,
                           n_hot_band: int | None = None,
                           zipf_s: float = 1.2,
                           dim: int = 8) -> DataFrame:
    """Adversarial-skew fixture (VERDICT r4 #5): the three hot-key
    pathologies a real crawl throws at dedup/sampling, combined in one
    deterministic table (doc_id, host, text, embedding):

    - hosts ~ Zipf(``zipf_s``) via inverse-CDF of a seeded uniform
      (rank = ceil(u^(-1/(s-1))), capped at n_rows) — a handful of
      link-farm hosts own a huge share of rows (stresses
      cap_per_domain's salted two-phase top-n);
    - one hot DIGEST: the first ``n_dup`` docs carry byte-identical
      text (default n_rows/10, the "10^5-duplicate digest" at a 10^6
      corpus) — stresses salted exact dedup AND parks every one of
      those docs in the same LSH band buckets;
    - one hot LSH BAND: the next ``n_hot_band`` docs share a 30-word
      prefix with a unique 3-word tail (jaccard ~0.8 pairwise) — a
      giant near-dup clique whose banded buckets must be capped
      (max_bucket_size), not joined m^2;
    - embeddings: the hot-digest docs share ONE vector (a degenerate
      IVF cell for semantic_dedup's max_cluster_size guard); the rest
      are deterministic pseudo-random unit-scale vectors.

    Like generate_webtext: pure JVM expressions over spark.range —
    distributed generation, same (args) -> byte-identical table."""
    if n_dup is None:
        n_dup = n_rows // 10
    if n_hot_band is None:
        n_hot_band = n_rows // 15
    if n_dup + n_hot_band > n_rows:
        raise ValueError("n_dup + n_hot_band must be <= n_rows")
    rid = F.col("id")
    df = spark.range(n_rows)

    # Zipf hosts: u in (0,1] from a seeded hash; rank = ceil(u^-(1/(s-1)))
    u = (F.pmod(_h(rid, 21), F.lit(1_000_000)) + 1) / 1_000_000.0
    rank = F.least(F.ceil(F.pow(u, F.lit(-1.0 / (zipf_s - 1.0)))),
                   F.lit(float(n_rows))).cast("bigint")
    host = F.concat(F.lit("host-"), rank.cast("string"))

    def words(prefix: str, start: int, count: int, salt: int):
        # `count` unique-ish vocabulary words derived from (doc, pos)
        return F.transform(
            F.sequence(F.lit(start), F.lit(start + count - 1)),
            lambda i: F.concat(
                F.lit(prefix),
                F.pmod(_h(F.concat(rid.cast("string"), F.lit(":"),
                                   i.cast("string")), salt),
                       F.lit(50_000)).cast("string")))

    dup_text = " ".join(f"dupword{i * 17 % 101}" for i in range(36))
    hot_prefix = " ".join(f"hotband{i * 13 % 97}" for i in range(30))
    text = (F.when(rid < n_dup, F.lit(dup_text))
            .when(rid < n_dup + n_hot_band,
                  F.concat(F.lit(hot_prefix + " "),
                           F.array_join(words("tail", 0, 3, 22), " ")))
            .otherwise(F.array_join(words("w", 0, 30, 23), " ")))

    # embeddings: hot docs one shared vector; others hash-derived
    hot_vec = F.array(*[F.lit(float((j * 7) % 5) + 1.0)
                        for j in range(dim)])
    rand_vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(_h(F.concat(rid.cast("string"), F.lit("#"),
                                      j.cast("string")), 24),
                          F.lit(2_000)).cast("double") - 1000.0) / 500.0)
    emb = F.when(rid < n_dup, hot_vec).otherwise(rand_vec)

    return df.select(rid.alias("doc_id"), host.alias("host"),
                     text.alias("text"), emb.alias("embedding"))
