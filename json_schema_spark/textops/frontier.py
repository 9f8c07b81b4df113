"""Crawl-frontier expansion — the one-call composition of the crawl
loop's read side: crawled pages -> outlinks -> policy gate -> robots
gate -> novelty cut -> politeness batches.

Every piece exists as a standalone oracle-checked operator (html
extract_links, urls normalize/filter, robots robots_filter,
dedup/Bloom novelty, robots fetch_batches); this module wires them in
the order a real frontier builder runs them, so a pipeline gets the
next fetch list in one call instead of re-deriving the glue. See
examples/llm_dataset_pipeline.py for the loop context.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expand_frontier"]


def expand_frontier(crawled: DataFrame, robots: DataFrame | None = None,
                    seen: DataFrame | None = None,
                    html_col: str = "html", url_col: str = "url",
                    agent: str = "*", per_host: int = 2,
                    block_domains: tuple[str, ...] = ()) -> DataFrame:
    """The next fetch list from this batch of crawled pages:

    1. outlinks: every double-quoted href in ``html_col``, absolute
       http(s) only (relative resolution is the caller's choice of
       base — pass pre-resolved pages for that);
    2. canonicalize (normalize_url) + distinct;
    3. policy gate (filter_urls: scheme allowlist, optional domain
       blocklist, static-asset extensions);
    4. robots gate when a (host, robots_txt) table is given
       (robots_filter, RFC 9309 longest-prefix semantics for
       ``agent``) — disallowed URLs drop;
    5. novelty: left_anti against ``seen`` (any DataFrame with
       ``url_col`` — the prior frontier, a crawl log, or
       bloom-filtered candidates for web scale);
    6. politeness batches (fetch_batches, ``per_host`` per round).

    Returns (url, host, batch). Deterministic end to end — reruns
    produce identical batches.

    Scale story: steps 1-3 are explode + projections (zero shuffle);
    step 4 joins rules by host (bounded fan-out, broadcast-eligible);
    step 5 is one anti-join keyed on the canonical url (bucket the
    seen table on url to co-locate; swap in the sharded Bloom filter
    when `seen` outgrows a join); step 6 is one host-keyed window.
    Nothing is quadratic; the frontier's size is bounded by outlink
    count, not corpus^2."""
    from json_schema_spark.textops.html import extract_links
    from json_schema_spark.textops.robots import (
        fetch_batches,
        robots_filter,
    )
    from json_schema_spark.textops.urls import filter_urls, normalize_url

    # the scheme prefilter overlaps filter_urls' allowlist on purpose:
    # it prunes relative/garbage hrefs BEFORE the distinct() shuffle
    links = (crawled.filter(F.col(html_col).isNotNull())
             .select(F.explode(extract_links(F.col(html_col)))
                     .alias("_raw"))
             .filter(F.col("_raw").rlike(r"(?i)^https?://")))
    urls = (links.select(normalize_url(F.col("_raw")).alias(url_col))
            .distinct())
    # host extracted ONCE here and threaded to the batcher (robots
    # gating re-derives internally — its rule join owns that path)
    urls = filter_urls(urls, url_col=url_col,
                       block_domains=block_domains,
                       out_host_col="host")
    if robots is not None:
        gated = robots_filter(urls.drop("host"), robots, agent=agent,
                              url_col=url_col)
        urls = (gated.filter(F.col("allowed"))
                .select(F.col(url_col),
                        F.col("url_host").alias("host")))
    if seen is not None:
        urls = urls.join(
            seen.select(normalize_url(F.col(url_col)).alias(url_col))
            .distinct(),
            url_col, "left_anti")
    return fetch_batches(urls, url_col=url_col, host_col="host",
                         per_host=per_host)
