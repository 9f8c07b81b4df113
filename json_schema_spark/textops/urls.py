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


# static-asset / binary path extensions a text-crawl frontier drops
# (alternation + anchor only — Java regex and RE2 agree)
BINARY_EXT_RX = (r"\.(jpe?g|png|gif|webp|bmp|ico|svg|mp3|wav|ogg|mp4"
                 r"|avi|mkv|mov|zip|gz|tar|rar|7z|exe|dmg|iso|css"
                 r"|js|woff2?)$")
_SCHEME_RX = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
# the authority may carry userinfo ('user:pass@host') — skip it with a
# non-capturing group, or 'https://x@blocked.net/' would bypass the
# domain blocklist (host would extract as 'x@blocked.net')
# greedy [^/?#]*@ consumes up to the LAST @ in the authority (WHATWG
# semantics) and the host class excludes @ itself — with the old
# ([^/?#]*) capture, 'https://a@b@evil.example.com/' reported host
# 'b@evil.example.com' and a suffix blocklist missed evil.example.com
_HOST_RX = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?([^/?#@]*)"
_PATH_RX = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def host_of(col: Column) -> Column:
    """Lowercased host of an absolute URL, port stripped, authority
    userinfo skipped; '' when no host is extractable. THE single
    definition of host extraction — every operator keying on host
    (profiles, gates, rollups, schedules) uses this, so a parsing fix
    (e.g. IPv6 brackets) lands once."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(col, _HOST_RX, 1)), r":[0-9]+$", "")


def filter_urls(df: DataFrame, url_col: str = "url",
                allowed_schemes: tuple[str, ...] = ("http", "https"),
                block_domains: tuple[str, ...] = (),
                block_extensions: bool = True,
                out_host_col: str = "url_host") -> DataFrame:
    """Crawl-frontier URL policy filter — the gate every web pipeline
    runs before fetch/parse:
    - scheme allowlist (default http/https);
    - domain blocklist: a listed domain blocks the exact host AND
      every subdomain (host == d or host ends with '.'+d — so
      'blocked.net' blocks 'a.blocked.net' but NOT 'notblocked.net');
    - static-asset extension blocklist on the pre-query path
      (case-insensitive, BINARY_EXT_RX).
    NULL urls drop. Output: surviving rows + ``out_host_col`` (the
    lowercased host, port stripped) for downstream per-domain stats.

    Scale story: a pure filter+projection — regex extractions only,
    the blocklist ships as an array literal probed with an exists HOF
    (right for policy lists up to ~10^4 entries; beyond that switch
    to a broadcast anti-join on the registered domain). Zero shuffle,
    zero Python; combines with scan pushdown on any other
    predicate."""
    if not allowed_schemes:
        raise ValueError("allowed_schemes must be non-empty")
    col = F.col(url_col)
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RX, 1))
    host = host_of(col)
    path = F.lower(F.regexp_extract(col, _PATH_RX, 1))
    keep = scheme.isin(*[s.lower() for s in allowed_schemes])
    if block_domains:
        doms = F.array(*[F.lit(d.lower()) for d in block_domains])
        blocked = F.exists(
            doms, lambda d: (host == d)
            | host.endswith(F.concat(F.lit("."), d)))
        keep = keep & ~blocked
    if block_extensions:
        keep = keep & ~path.rlike(BINARY_EXT_RX)
    return (df.filter(col.isNotNull() & keep)
            .withColumn(out_host_col, host))


# template rewrite rules, applied in order: hex runs first (a hex id
# is also a digit run when purely numeric — the longer class must win),
# then digit runs. Both classes are Java/RE2 common subset; Spark's
# regexp_replace is replace-all, the DuckDB oracle passes the 'g' flag.
TEMPLATE_HEX_RX = r"[0-9a-f]{8,}"
TEMPLATE_DIGIT_RX = r"[0-9]+"


def path_template(col: Column) -> Column:
    """Collapse volatile URL-path tokens to placeholders: hex runs of
    8+ chars -> '{x}' (content hashes, session ids), digit runs ->
    '{d}' (pagination, calendar, numeric ids). '/product/8213?x' and
    '/product/97' both become '/product/{d}' — the shape a crawler
    trap repeats millions of times."""
    path = F.regexp_extract(col, _PATH_RX, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.regexp_replace(
        F.regexp_replace(path, TEMPLATE_HEX_RX, "{x}"),
        TEMPLATE_DIGIT_RX, "{d}")


def url_path_templates(df: DataFrame, url_col: str = "url",
                       text_col: str = "text",
                       min_urls: int = 2) -> DataFrame:
    """Per-host URL path-template mining — the crawler-trap detector:
    (host, path_template, n_urls, n_unique_texts, dup_frac). A
    template with thousands of urls but a handful of distinct texts
    is an infinite URL space (calendar pages, session-id permutations,
    faceted search) and gets dropped from the frontier; a template
    with distinct text per url is real content paginated.

    Plan: one projection (host + template regexes + text digest) and
    ONE hash aggregate keyed on (host, template) — count_distinct
    collapses repeated (host, template, digest) map-side, so the
    shuffle carries at most one row per distinct triple regardless of
    corpus size. Keys are (host, template), which SUBDIVIDE hot hosts
    across their templates; a single hot (host, template) cell has
    constant-size aggregate state (counts), so skew costs merge time,
    not memory. Zero Python."""
    host = host_of(F.col(url_col))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return (df.filter(F.col(url_col).isNotNull())
            .select(host.alias("host"),
                    path_template(F.col(url_col)).alias("path_template"),
                    F.md5(txt).alias("_d"))
            .filter(F.col("host") != "")
            .groupBy("host", "path_template")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.count_distinct(F.col("_d")).alias("n_unique_texts"))
            .filter(F.col("n_urls") >= min_urls)
            .withColumn(
                "dup_frac",
                F.round(F.lit(1.0) - F.col("n_unique_texts")
                        / F.col("n_urls"), 6)))


def host_profile(df: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-host corpus profile: (host, n_docs, n_unique_texts,
    total_chars, dup_frac) — the first thing a crawl-curation pass
    computes. A host with dup_frac near 1 is a boilerplate mill
    (calendar pages, tag indexes, session-id permutations of one
    article) and gets down-weighted or re-crawled less; total_chars /
    n_docs separates link farms (tiny pages) from content hosts.

    Plan: one projection (host regex + text digest + length), ONE hash
    aggregate keyed on host. Exact distinct-text counts ride the same
    aggregate via count_distinct — Spark rewrites it to a two-level
    expand/agg whose partial side collapses each task's repeated
    (host, digest) pairs before the shuffle, so a 10^12-row corpus
    shuffles at most one row per distinct (host, digest). Hosts are
    Zipf-skewed but the per-group STATE is constant-size (counts and
    sums), so a hot host costs merge time, not memory; for
    sketch-grade profiles at extreme skew swap count_distinct for
    approx_count_distinct (HLL, checks/stats.py does this for
    column profiling) and the shuffle drops to one sketch per task.

    Parity: digest = md5(coalesce(text, '')) so NULL and '' collapse
    to the same bucket deliberately (both are "no content");
    dup_frac = round(1 - unique/docs, 6) evaluates in double precision
    identically on any engine."""
    host = host_of(F.col(url_col))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return (df.filter(F.col(url_col).isNotNull())
            .select(host.alias("host"), F.md5(txt).alias("_d"),
                    F.length(txt).alias("_len"))
            .filter(F.col("host") != "")
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct(F.col("_d")).alias("n_unique_texts"),
                 F.sum("_len").alias("total_chars"))
            .withColumn(
                "dup_frac",
                F.round(F.lit(1.0) - F.col("n_unique_texts")
                        / F.col("n_docs"), 6)))


# Deterministic snapshot SUBSET of the multi-label public suffixes
# (publicsuffix.org) — the common ccTLD second-level registries. A
# built-in literal (not a fetched list) so results are reproducible
# run-to-run and engine-to-engine; callers union site-specific entries
# via ``extra_suffixes``. Single-label suffixes (com, org, de, ...)
# need no table — they are the default "last two labels" rule.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "com.ar", "com.tr", "com.sg", "com.my",
    "com.hk", "com.tw", "co.za", "org.za", "co.kr", "or.kr",
    "com.pl", "net.pl", "org.pl", "com.ua", "co.il", "org.il",
    "com.eg", "com.sa", "com.vn", "com.ph", "co.th", "or.th",
)


def registered_domain(host: Column,
                      extra_suffixes: tuple[str, ...] = ()) -> Column:
    """Registrable-domain extraction (public-suffix-lite): the label
    directly under the public suffix — 'news.bbc.co.uk' ->
    'bbc.co.uk', 'a.b.example.com' -> 'example.com', 'localhost' ->
    'localhost'. Per-domain policy (crawl caps, quality priors,
    blocklists) keyed on raw hosts over-splits: every subdomain of a
    blog farm would get its own cap.

    Rule: longest known public suffix wins — if the last THREE labels
    form a known 3-label suffix (extras like 'k12.ma.us') keep four
    labels; else if the last TWO form a known 2-label suffix
    (MULTI_SUFFIXES + extras) keep three; else keep two. A bare
    suffix host passes through unchanged. Suffix entries must have 2
    or 3 labels (ValueError otherwise — a silently-ignored entry is
    the worse failure). Lowercases; expects a bare host (no
    scheme/port — pair with host_of). Pure string ops (split +
    element_at + isin), zero shuffle, zero Python; the suffix probes
    are constant IN-lists the optimizer folds."""
    suffixes = [s.lower() for s in
                tuple(MULTI_SUFFIXES) + tuple(extra_suffixes)]
    s2 = [s for s in suffixes if s.count(".") == 1]
    s3 = [s for s in suffixes if s.count(".") == 2]
    bad = [s for s in suffixes if s.count(".") not in (1, 2)]
    if bad:
        raise ValueError(
            f"suffix entries must have 2 or 3 labels: {bad}")
    h = F.lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat(F.element_at(labels, -2), F.lit("."),
                     F.element_at(labels, -1))
    last3 = F.concat(F.element_at(labels, -3), F.lit("."), last2)
    out = F.when(n >= 3, F.when(last2.isin(s2), last3)
                 .otherwise(last2)) \
        .when(n == 2, last2) \
        .otherwise(h)
    if s3:
        last4 = F.concat(F.element_at(labels, -4), F.lit("."), last3)
        out = (F.when((n >= 4) & last3.isin(s3), last4)
               .when((n == 3) & last3.isin(s3), h)
               .otherwise(out))
    return out


def domain_rollup(df: DataFrame, url_col: str = "url",
                  text_col: str = "text",
                  extra_suffixes: tuple[str, ...] = ()) -> DataFrame:
    """Per-REGISTERED-DOMAIN corpus rollup: (domain, n_docs, n_hosts,
    n_unique_texts, dup_frac) — host_profile's coarser sibling, the
    granularity crawl budgets and per-domain caps actually operate at
    (a blog platform is one domain with 10^6 subdomain hosts; capping
    per host misses it entirely).

    Plan: one projection (host regex -> registered_domain + text
    digest), ONE hash aggregate keyed on domain; both distinct counts
    (hosts, digests) ride Spark's expand/partial-agg rewrite, so the
    shuffle carries at most one row per distinct (domain, host) /
    (domain, digest) — the same 10^12-row story as host_profile.
    Parity: digest = md5(coalesce(text, '')); dup_frac rounded once."""
    host = host_of(F.col(url_col))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return (df.filter(F.col(url_col).isNotNull())
            .select(host.alias("_h"), F.md5(txt).alias("_d"))
            .filter(F.col("_h") != "")
            .select(registered_domain(F.col("_h"), extra_suffixes)
                    .alias("domain"), "_h", "_d")
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct(F.col("_h")).alias("n_hosts"),
                 F.count_distinct(F.col("_d")).alias("n_unique_texts"))
            .withColumn(
                "dup_frac",
                F.round(F.lit(1.0) - F.col("n_unique_texts")
                        / F.col("n_docs"), 6)))
