"""HTML text/link extraction — pure Catalyst regex projections.

The flagship webtext table carries raw ``html`` alongside extracted
``text``; these operators re-derive text and the outbound link set
without a parser: the classic cheap path (script/style subtree drop,
tag strip, basic entity decode, href harvest). A DOM parser is more
faithful on pathological markup — swap one in via mapInPandas when
fidelity matters more than scan speed; these expressions run at scan
throughput with zero shuffle and zero Python, and every regex is a
construct Java regex and RE2 interpret identically (no lookarounds,
non-greedy spans only), so oracles replay them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?is) = case-insensitive + dot-matches-newline, both RE2-supported.
# One pattern per tag: a </\1> backreference would be Java-only (RE2
# has no backrefs), breaking oracle replay.
_SCRIPT_RX = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RX = r"(?is)<style\b[^>]*>.*?</style\s*>"
_TAG_RX = r"(?s)<[^>]*>"
_HREF_RX = r"""(?i)href\s*=\s*"([^"]*)\""""

_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&"))  # &amp; LAST


def strip_tags(col: Column) -> Column:
    """Visible text of an HTML fragment: script/style subtrees
    dropped, all tags removed, the five basic entities decoded
    (&amp; last, so '&amp;lt;' decodes to the literal '&lt;'),
    whitespace collapsed and trimmed."""
    out = F.regexp_replace(col, _SCRIPT_RX, " ")
    out = F.regexp_replace(out, _STYLE_RX, " ")
    out = F.regexp_replace(out, _TAG_RX, " ")
    for ent, ch in _ENTITIES:
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def extract_links(col: Column) -> Column:
    """All double-quoted href values, in document order (the crawl
    frontier's outlink set — feed through filter_urls/normalize_url
    downstream)."""
    return F.regexp_extract_all(col, F.lit(_HREF_RX), 1)


def html_to_text(df: DataFrame, html_col: str = "html",
                 text_col: str = "text_extracted",
                 links_col: str = "links") -> DataFrame:
    """df + extracted text and outbound links — one zero-shuffle
    projection over the raw html."""
    return df.withColumn(text_col, strip_tags(F.col(html_col))) \
             .withColumn(links_col, extract_links(F.col(html_col)))


# Host of an ABSOLUTE http(s) URL. The authority userinfo is skipped
# with a GREEDY (?:[^/?#]*@)? — greedy matters: it consumes up to the
# LAST @ in the authority (WHATWG semantics), so "https://a@b@evil.example.com/"
# reports evil.example.com, not "b@evil.example.com"; the host class excludes @ and the
# port colon. RE2-safe: no lookarounds, no backrefs.
_HOST_RX = r"(?i)^https?://(?:[^/?#]*@)?([^/?#:@]+)"


def link_hosts(col: Column) -> Column:
    """Lowercased hosts of the absolute http(s) outlinks of an HTML
    fragment, in document order. Relative links and exotic schemes
    drop out (empty extraction filtered)."""
    hosts = F.transform(
        extract_links(col),
        lambda u: F.lower(F.regexp_extract(u, _HOST_RX, 1)))
    return F.filter(hosts, lambda h: h != "")


def link_graph(df: DataFrame, html_col: str = "html",
               src_col: str = "src_host") -> DataFrame:
    """Host-level outlink edges (src_host, dst_host, n_links) — the
    web-graph aggregate crawl schedulers and PageRank-style quality
    priors start from (Common Crawl publishes exactly this as its
    host-level webgraph). One explode + one hash aggregate: partial
    aggregation collapses each page's repeated outlinks map-side, so
    the shuffle carries host-pair cardinality, not link cardinality.
    Hot hosts (everyone links to wikipedia.org) are absorbed by the
    same partial agg; the final agg keys on the PAIR, which is far
    less skewed than dst alone."""
    return (df.select(F.col(src_col),
                      F.explode(link_hosts(F.col(html_col)))
                      .alias("dst_host"))
            .groupBy(src_col, "dst_host")
            .agg(F.count(F.lit(1)).alias("n_links")))


# Whole <a href="...">...</a> elements. Non-greedy body, (?is) flags —
# legal in both Java regex (Spark) and RE2 (DuckDB); no lookarounds, no
# backreferences. Nested <a> is invalid HTML and terminates at the
# first </a>, matching browser recovery behavior.
_ANCHOR_RX = r'(?is)<a\s[^>]*href\s*=\s*"[^"]*"[^>]*>.*?</a>'
_ANCHOR_HREF_RX = r'(?i)href\s*=\s*"([^"]*)"'
# the opening <a ...> tag or the closing </a> — stripped before the
# body text is cleaned (alternation + replace-all in both engines)
_ANCHOR_WRAP_RX = r"(?is)^<a[^>]*>|</a>$"


def anchor_text_index(df: DataFrame, html_col: str = "html",
                      min_count: int = 1) -> DataFrame:
    """Anchor-text index: (dst_host, term, n_anchors) — how the web
    describes each target host, aggregated over every absolute
    http(s) anchor in the corpus. The classic off-page relevance /
    quality signal (anchor text was the original web-search ranking
    feature) and, for crawl curation, a cheap language-and-topic prior
    for hosts the crawler has not fetched yet.

    Plan: one regexp_extract_all + explode per page (anchor elements),
    a projection deriving (dst_host, visible text) per element —
    href host via the same userinfo-safe _HOST_RX as link_graph, body
    via strip_tags so inner markup and entities fold away — then a
    token explode and ONE hash aggregate on (dst_host, term). Partial
    aggregation collapses a page's repeated anchors map-side; the
    shuffle carries (host, term) cardinality, not anchor cardinality.
    Hot terms ("click", "here") spread across dst_host keys, so no
    single reducer sees a celebrity key unless one HOST dominates —
    the same skew profile link_graph already absorbs.

    ``min_count`` drops sub-threshold (host, term) rows AFTER the
    aggregate (a HAVING, not a second shuffle)."""
    a = (df.select(F.explode(F.regexp_extract_all(
             F.col(html_col), F.lit(_ANCHOR_RX), 0)).alias("_a"))
         .select(F.lower(F.regexp_extract(
                     F.regexp_extract("_a", _ANCHOR_HREF_RX, 1),
                     _HOST_RX, 1)).alias("dst_host"),
                 strip_tags(F.regexp_replace(
                     F.col("_a"), _ANCHOR_WRAP_RX, " ")).alias("_txt"))
         .filter(F.col("dst_host") != ""))
    terms = (a.select("dst_host",
                      F.explode(F.split(F.lower(F.col("_txt")),
                                        r"\s+")).alias("term"))
             .filter(F.col("term") != ""))
    out = (terms.groupBy("dst_host", "term")
           .agg(F.count(F.lit(1)).alias("n_anchors")))
    if min_count > 1:
        out = out.filter(F.col("n_anchors") >= min_count)
    return out


# <head> metadata extraction. One regex per element; attribute ORDER
# inside the tag does not matter because the whole tag is extracted
# first (the [^>]* before the marker attribute skips any attributes
# ahead of it) and the wanted attribute is then pulled from the tag
# text — '<meta content="x" name="description">' and
# '<meta name="description" content="x">' both resolve. All patterns
# are Java/RE2 common subset.
_TITLE_RX = r"(?is)<title[^>]*>(.*?)</title"
_META_NAME_DESC_RX = (
    r'(?is)<meta\s[^>]*name\s*=\s*"description"[^>]*>')
_LINK_CANONICAL_RX = r'(?is)<link\s[^>]*rel\s*=\s*"canonical"[^>]*>'
_CONTENT_ATTR_RX = r'(?i)content\s*=\s*"([^"]*)"'
_HREF_ATTR_RX = r'(?i)href\s*=\s*"([^"]*)"'
_HTML_LANG_RX = r'(?is)<html[^>]*\slang\s*=\s*"([^"]*)"'


def html_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """df + <head> metadata columns — the page-level signals a crawl
    curator reads before the body: ``title`` (tags stripped, entities
    decoded, whitespace collapsed), ``meta_description`` (the
    name="description" content, decoded the same way),
    ``canonical_url`` (rel="canonical" href — THE dedup key search
    engines honor ahead of any content hash), ``html_lang`` (the
    <html lang> attribute, lowercased — the declared-language prior
    a language-ID model is checked against). Absent elements are
    NULL, not ''.

    Scale story: a pure zero-shuffle projection (regexp extractions
    only) that runs at scan throughput and composes with predicate
    pushdown; at 10^12 pages this is a map stage with no state."""
    html = F.col(html_col)
    title_raw = F.regexp_extract(html, _TITLE_RX, 1)
    title = strip_tags(title_raw)
    desc_tag = F.regexp_extract(html, _META_NAME_DESC_RX, 0)
    desc = strip_tags(F.regexp_extract(desc_tag, _CONTENT_ATTR_RX, 1))
    canon_tag = F.regexp_extract(html, _LINK_CANONICAL_RX, 0)
    canon = F.regexp_extract(canon_tag, _HREF_ATTR_RX, 1)
    lang = F.lower(F.regexp_extract(html, _HTML_LANG_RX, 1))

    def _nn(c: Column) -> Column:
        return F.when(c != "", c)

    return (df.withColumn("title", _nn(title))
            .withColumn("meta_description", _nn(desc))
            .withColumn("canonical_url", _nn(canon))
            .withColumn("html_lang", _nn(lang)))


def collapse_by_canonical(df: DataFrame, url_col: str = "url",
                          html_col: str = "html") -> DataFrame:
    """Canonical-declaration dedup: pages that declare the same
    ``rel="canonical"`` target collapse to ONE survivor — the dedup
    signal search engines honor BEFORE any content hash, and the only
    one that catches parameter permutations serving byte-different
    HTML (ads, timestamps) of the same logical page.

    Group key = the page's declared canonical target (absolute
    http(s) hrefs only, canonicalized by normalize_url; relative or
    absent declarations -> the page's own normalized URL, i.e. no
    collapse). Survivor = the page whose own URL IS the target (the
    canonical page itself) when crawled, else the lexicographically
    smallest URL — chosen with ONE min-of-struct aggregate
    ((is_not_self, url) — field-by-field struct min is engine-exact),
    never a window sort, so a 10^6-permutation URL family collapses
    map-side. Output: (canonical_url, url, n_pages) — one row per
    logical page.

    Plan: zero-shuffle projection + ONE hash aggregate keyed on the
    canonical target; same 10^12-row story as host_profile."""
    from json_schema_spark.textops.urls import normalize_url

    html = F.col(html_col)
    canon_tag = F.regexp_extract(html, _LINK_CANONICAL_RX, 0)
    declared = F.regexp_extract(canon_tag, _HREF_ATTR_RX, 1)
    own = normalize_url(F.col(url_col))
    target = F.when(declared.rlike(r"(?i)^https?://"),
                    normalize_url(declared)).otherwise(own)
    staged = (df.filter(F.col(url_col).isNotNull())
              .select(own.alias("_own"), target.alias("_key")))
    pick = F.min(F.struct(
        (F.col("_own") != F.col("_key")).cast("int").alias("ns"),
        F.col("_own").alias("u"))).alias("_pick")
    return (staged.groupBy("_key")
            .agg(pick, F.count(F.lit(1)).alias("n_pages"))
            .select(F.col("_key").alias("canonical_url"),
                    F.col("_pick.u").alias("url"), "n_pages"))
