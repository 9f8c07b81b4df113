"""URL canonicalization for webtext dedup — pure Catalyst expressions.

Common-Crawl-style pipelines dedup on a CANONICAL url, not the raw
string: scheme/host case, default ports, trailing slashes, fragments,
and tracking parameters (utm_*, fbclid, gclid) all produce distinct raw
urls for the same resource. `normalize_url` folds those out in one
projection (regex extraction + array HOFs — no UDF, no shuffle), so
`duplicate_urls` is a plain hash-aggregate on the canonical form: the
same salted two-phase shape as checks/uniqueness at any corpus size.

Every step is an ANCHORED single-match regex, so engines that replace
only the first match (DuckDB) and engines that replace all matches
(Spark) produce identical output — keeps the operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RX = r"^(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid)="


def normalize_url(col: Column) -> Column:
    """Canonical form of an absolute http(s) URL:
    - fragment removed;
    - scheme and host lowercased; default ports (:80, :443) stripped;
    - empty path -> '/', trailing slashes collapsed off non-root paths;
    - tracking params dropped, remaining query params sorted.
    Non-http(s) or relative inputs pass through unchanged (null-safe)."""
    no_frag = F.regexp_replace(col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(
        no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1)),
        r":(80|443)$", "")
    pathq = F.regexp_extract(rest, r"^[^/?]*(.*)$", 1)
    raw_path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(raw_path.rlike(r"^/*$"), F.lit("/")) \
        .otherwise(F.regexp_replace(raw_path, r"/+$", ""))
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RX))
    qnorm = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"),
                                                          qnorm)))
    return F.when(scheme.isin("http", "https"), rebuilt).otherwise(col)


def duplicate_urls(df: DataFrame, url_col: str = "url",
                   max_examples: int | None = None) -> DataFrame:
    """(canonical_url, dup_count, urls) for canonical forms reached by
    more than one raw url — one groupBy on the canonical key.

    ``max_examples`` bounds the per-group url sample to the first N
    (sorted): at web scale one hot canonical (a redirect target, a link
    farm) would otherwise collect millions of raw urls into a single
    aggregation buffer. The capped path window-limits to N rows per
    canonical BEFORE collecting, so the buffer itself is bounded;
    dup_count stays exact either way."""
    canon = normalize_url(F.col(url_col))
    base = (df.filter(F.col(url_col).isNotNull())
            .select(canon.alias("canonical_url"),
                    F.col(url_col).alias("_raw")))
    if max_examples is None:
        return (base.groupBy("canonical_url")
                .agg(F.count(F.lit(1)).alias("dup_count"),
                     F.concat_ws(",", F.array_sort(F.collect_list("_raw")))
                     .alias("urls"))
                .filter(F.col("dup_count") > 1))
    from pyspark.sql import Window as W

    counts = (base.groupBy("canonical_url")
              .agg(F.count(F.lit(1)).alias("dup_count"))
              .filter(F.col("dup_count") > 1))
    rn = F.row_number().over(
        W.partitionBy("canonical_url").orderBy("_raw"))
    examples = (base.withColumn("_rn", rn)
                .filter(F.col("_rn") <= max_examples)
                .groupBy("canonical_url")
                .agg(F.concat_ws(",", F.array_sort(F.collect_list("_raw")))
                     .alias("urls")))
    return counts.join(examples, "canonical_url")
