"""robots.txt parsing and URL gating — pure Catalyst expressions.

Every crawl pipeline holds a (host, robots_txt) table fetched once per
host and gates its frontier against it. Both halves are expressible as
DataFrame ops with zero Python:

- `robots_rules`: line-parse every robots.txt in one pass — posexplode
  lines, classify (user-agent / allow / disallow), reconstruct the
  GROUP structure (a run of consecutive User-agent lines opens a group
  whose rules extend to the next run) with two window functions over
  (host, line-position), then attach each group's agent set to its
  rules. Per-host state is one robots file (KBs), so the windows are
  tiny per-partition sorts keyed by host — no global sort, no skew
  (hot hosts have ONE robots file like everyone else).

- `robots_filter`: urls join rules on host (rules-per-host is bounded
  by robots-file size, so the join fans out by at most a few hundred
  rules — broadcast-eligible and left unhinted for AQE), longest-path
  prefix match wins, allow beats disallow on ties (RFC 9309 "least
  restrictive"), no matching rule means allowed. Group selection
  follows the spec: if any group names the caller's agent
  specifically, ONLY those groups apply; otherwise the '*' groups.

Simplifications (documented, unit-tested): rule paths are matched as
LITERAL prefixes — RFC 9309 '*' wildcards and '$' anchors inside rule
paths are not expanded (rows whose path contains them still match
literally); matching uses the url path only (query strings excluded);
crawl-delay lines are ignored (sitemap lines feed
`sitemap_urls` instead of the gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from json_schema_spark.textops.urls import _HOST_RX, _PATH_RX

__all__ = ["robots_rules", "robots_filter", "sitemap_urls"]

_DIRECTIVE_RX = r"(?i)^([a-z-]+)\s*:"
_VALUE_RX = r"(?i)^[a-z-]+\s*:\s*(.*)$"


def robots_rules(df: DataFrame, host_col: str = "host",
                 robots_col: str = "robots_txt") -> DataFrame:
    """(host, agents, rule, path, pos): one row per allow/disallow
    directive, tagged with the lowercased agent set of its group.
    Comments strip at '#'; empty-path directives drop (an empty
    Disallow means "allow everything" — it must never match);
    directives before any User-agent line drop (no group)."""
    w = Window.partitionBy("host").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    lines = (df.filter(F.col(robots_col).isNotNull())
             .select(F.col(host_col).alias("host"),
                     F.posexplode(F.split(F.col(robots_col), "\n"))
                     .alias("pos", "_raw"))
             .select("host", "pos",
                     F.trim(F.regexp_replace(F.col("_raw"), "#.*$", ""))
                     .alias("line"))
             .filter(F.col("line") != ""))
    kind = F.lower(F.regexp_extract(F.col("line"), _DIRECTIVE_RX, 1))
    val = F.trim(F.regexp_extract(F.col("line"), _VALUE_RX, 1))
    tagged = lines.select(
        "host", "pos", kind.alias("kind"), val.alias("val"))
    is_ua = F.col("kind") == "user-agent"
    prev_ua = F.lag(is_ua).over(w)
    run_start = F.when(is_ua & ~F.coalesce(prev_ua, F.lit(False)),
                       F.col("pos"))
    blocked = tagged.withColumn(
        "block", F.last(run_start, ignorenulls=True).over(cum))
    ua = (blocked.filter(is_ua & (F.col("val") != ""))
          .groupBy("host", "block")
          .agg(F.collect_set(F.lower(F.col("val"))).alias("agents")))
    rules = (blocked
             .filter(F.col("kind").isin("allow", "disallow")
                     & (F.col("val") != "")
                     & F.col("block").isNotNull())
             .select("host", "block", F.col("kind").alias("rule"),
                     F.col("val").alias("path"), "pos"))
    return (rules.join(ua, ["host", "block"])
            .select("host", "agents", "rule", "path", "pos"))


def robots_filter(urls_df: DataFrame, robots_df: DataFrame,
                  agent: str = "*", url_col: str = "url",
                  host_col: str = "host",
                  robots_col: str = "robots_txt") -> DataFrame:
    """urls annotated with (allowed, matched_rule, matched_path):
    RFC 9309 longest-prefix-match against the caller's applicable
    groups. A host with no robots file (or no applicable rules)
    allows everything."""
    a = agent.lower()
    rules = robots_rules(robots_df, host_col, robots_col)
    applies = F.array_contains("agents", a) | \
        F.array_contains("agents", "*")
    specific = F.array_contains("agents", a) & F.lit(a != "*")
    rules = rules.filter(applies).withColumn("_spec", specific)
    # spec: groups naming the agent EXACTLY shadow the '*' groups
    host_spec = (rules.groupBy("host")
                 .agg(F.max("_spec").alias("_has_spec")))
    rules = (rules.join(host_spec, "host")
             .filter(F.col("_spec") | ~F.col("_has_spec"))
             .select("host", "rule", "path", "pos"))

    u = (urls_df.filter(F.col(url_col).isNotNull())
         # per-row key so duplicate urls each keep their own verdict
         # (used only to partition the ranking window — the verdict
         # itself is id-independent, so nondeterministic ids are safe)
         .withColumn("_uid", F.monotonically_increasing_id())
         .withColumn("_host", F.regexp_replace(
             F.lower(F.regexp_extract(F.col(url_col), _HOST_RX, 1)),
             r":[0-9]+$", ""))
         .withColumn("_path", F.when(
             F.regexp_extract(F.col(url_col), _PATH_RX, 1) == "",
             F.lit("/")).otherwise(
             F.regexp_extract(F.col(url_col), _PATH_RX, 1))))
    cand = u.join(rules, u["_host"] == rules["host"], "left") \
        .withColumn("_hit", F.col("path").isNotNull()
                    & F.col("_path").startswith(F.col("path")))
    # longest matching path wins; allow beats disallow on equal
    # length; earliest rule as the final deterministic tie-break
    rk = Window.partitionBy("_uid").orderBy(
        F.col("_hit").desc(),
        F.length("path").desc(),
        F.when(F.col("rule") == "allow", 0).otherwise(1),
        F.col("pos"))
    best = (cand.withColumn("_rn", F.row_number().over(rk))
            .filter(F.col("_rn") == 1))
    return best.select(
        F.col(url_col),
        F.col("_host").alias("url_host"),
        (~F.col("_hit") | (F.col("rule") == "allow"))
        .alias("allowed"),
        F.when(F.col("_hit"), F.col("rule")).alias("matched_rule"),
        F.when(F.col("_hit"), F.col("path")).alias("matched_path"))


def sitemap_urls(df: DataFrame, host_col: str = "host",
                 robots_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url) for every ``Sitemap:`` line in every robots
    file — the crawl seeder's discovery table. RFC 9309 §2.3 makes
    sitemap lines group-INDEPENDENT, so this is a flat extraction:
    explode lines, keep the sitemap directive (case-insensitive,
    leading whitespace tolerated), trim the value, drop empties and
    comment-only lines. Slash-prefixed relative sitemap values (rare but seen
    in the wild) are resolved against https://host; other non-URL
    values pass through for the caller to triage.

    One explode + one projection, zero shuffle, zero Python; the
    distinct() is per-(host, url) and collapses map-side."""
    lines = (df.filter(F.col(robots_col).isNotNull())
             .select(F.col(host_col).alias("host"),
                     F.explode(F.split(F.col(robots_col), "\n"))
                     .alias("_raw")))
    val = F.trim(F.regexp_extract(
        F.trim(F.col("_raw")), r"(?i)^sitemap\s*:\s*([^#]*)", 1))
    resolved = F.when(val.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), val) \
        .when(val.startswith("/"),
              F.concat(F.lit("https://"), F.col("host"), val)) \
        .otherwise(val)
    return (lines
            .filter(F.trim(F.col("_raw")).rlike(r"(?i)^sitemap\s*:"))
            .select("host", resolved.alias("sitemap_url"))
            .filter(F.col("sitemap_url") != "")
            .distinct())
