"""Host-graph analytics over link_graph edges — fixed-point PageRank.

The crawl-scheduling / quality-prior companion to
``textops.html.link_graph``: Common Crawl publishes host-level
PageRank-ish ranks with its webgraph, and curation pipelines use them
as a cheap document-quality prior (a page on a well-linked host is
likelier to be worth keeping).

Determinism design: PageRank is classically float math, but distributed
float SUMS are order-dependent — two engines (or two runs with
different partitioning) disagree in the last ulps, which breaks the
repo's value-identical oracle discipline. This implementation does the
entire computation in scaled INT64 fixed-point (default 10^9 units of
mass per node): every transfer is ``(rank * d_num) // d_den // out_deg``
with floor division, and integer sums are exact and order-independent,
so the ranks are bit-identical on any engine, any partitioning, any
retry. The floor truncation loses at most out_deg units of mass per
node per round — relative error ~1e-9 at the default scale, far below
anything a quality prior can use.

Overflow headroom: total mass is n_nodes * scale and a single node's
rank is bounded by it; rank * d_num must stay under 2^63, so
n_nodes * scale * d_num < 9.2e18 — at the default scale=10^9 and
d_num=85 that caps at ~10^8 nodes (hosts, not pages — comfortably
above any real host graph); pass scale=10^6 for more headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000  # fixed-point units of rank mass per node


def pagerank(edges: DataFrame, src_col: str = "src_host",
             dst_col: str = "dst_host", iterations: int = 3,
             damping_num: int = 85, damping_den: int = 100,
             scale: int = PR_SCALE) -> DataFrame:
    """Fixed-point PageRank over a (src, dst) edge list (parallel
    edges collapse to one — link COUNT is not link endorsement
    multiplicity in the classic formulation). Returns
    (node, rank) with rank in integer ``scale`` units; sum over nodes
    stays <= n_nodes * scale (floor truncation only ever removes
    mass). Damping is the rational damping_num/damping_den (default
    85/100) applied by integer multiply-then-floor-divide.

    Semantics: dangling nodes (no outlinks) do NOT leak their mass
    (VERDICT r4 #4 — on real webgraphs 20-30% of hosts are dangling,
    so a leak systematically deflates every rank): each iteration
    their damped mass is summed into one INT64 scalar and
    redistributed uniformly, ``dangling_sum DIV n_nodes`` per node —
    still pure integer arithmetic, so ranks stay bit-identical on any
    engine/partitioning. Floor truncation now loses at most
    ``out_deg`` units per linking node plus ``n_nodes`` units total
    for the dangling pot per round.

    Plan: nodes/out-degrees/dangling-set derive once and persist
    (every round joins them); each iteration is one join edges->ranks,
    one partial+final sum aggregate (shuffle keyed on dst, the same
    key-distribution story as link_graph itself), and one 1-row
    dangling-mass aggregate broadcast back via crossJoin (the
    sanctioned one-row-totals BNLJ pattern). O(iterations) stages,
    lineage grows linearly; for many rounds localCheckpoint like
    dedup_groups (3-5 rounds is the curation-prior sweet spot)."""
    from json_schema_spark.cache import register_cache

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_d"))
         .distinct())
    e = register_cache(e)
    nodes = register_cache(
        e.select(F.col("_s").alias("_n"))
        .unionByName(e.select(F.col("_d").alias("_n")))
        .distinct())
    deg = register_cache(
        e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")))
    # dangling = nodes with no outgoing edge; loop-invariant set
    dangling = register_cache(
        nodes.join(deg, nodes["_n"] == deg["_s"], "left_anti"))
    # n_nodes is loop-invariant — one bounded driver scalar off the
    # persisted nodes table (same precedent as dedup_groups'
    # persist+count), folded into both engines as a literal
    n_cnt = nodes.count()
    # (scale * (den - num)) // den is a CONSTANT — fold it in Python
    # so both engines see the same literal
    base_lit = F.lit((scale * (damping_den - damping_num))
                     // damping_den).cast("bigint")
    # NOTE each iteration consumes `ranks` twice (contrib join +
    # dangling aggregate) with no ReusedExchange, so the iteration
    # subtree formally re-executes per consumer — but the recompute
    # bottoms out at the PERSISTED e/nodes/deg leaves, so it is k
    # cheap cached-table joins, not k corpus scans. Measured at
    # sf0.1/3 iters: per-iteration register_cache(ranks) is ~25%
    # SLOWER (2.1 -> 2.7s) than recompute — materialization overhead
    # beats the saved joins. For many-iteration runs (>5) persist
    # every few rounds instead (dedup_groups' localCheckpoint
    # pattern).
    ranks = nodes.select("_n", F.lit(scale).cast("bigint").alias("_r"))
    for _i in range(iterations):
        # integer DIV end to end: long '/' would detour through a
        # DOUBLE (inexact past 2^53, and DuckDB's double->int cast
        # ROUNDS where Spark's truncates); DIV / '//' are true
        # integer division in Spark SQL and DuckDB respectively
        contrib = (e.join(ranks, e["_s"] == ranks["_n"])
                   .join(deg, "_s")
                   .select(F.col("_d").alias("_n"),
                           F.expr(f"(_r * {damping_num}) "
                                  f"DIV {damping_den}").alias("_m"),
                           F.col("_deg"))
                   .select("_n",
                           F.expr("_m DIV _deg").alias("_c")))
        inflow = contrib.groupBy("_n").agg(F.sum("_c").alias("_in"))
        # damped mass stranded on dangling nodes this round — one
        # integer scalar, exact under any summation order
        dang = (ranks.join(dangling.select("_n"), "_n")
                .agg(F.sum(F.expr(f"(_r * {damping_num}) "
                                  f"DIV {damping_den}")).alias("_dm")))
        ranks = (nodes.join(inflow, "_n", "left")
                 .crossJoin(dang)
                 .select("_n",
                         (base_lit
                          + F.coalesce(F.col("_in"), F.lit(0))
                          + F.expr(f"coalesce(_dm, 0) DIV {n_cnt}"))
                         .alias("_r")))
    return ranks.select(F.col("_n").alias("node"),
                        F.col("_r").alias("rank"))


HITS_SCALE = 1_000_000  # fixed-point units of hub/authority mass


def hits(edges: DataFrame, src_col: str = "src_host",
         dst_col: str = "dst_host", iterations: int = 2,
         scale: int = HITS_SCALE) -> DataFrame:
    """Fixed-point HITS (Kleinberg hubs & authorities) over a
    (src, dst) edge list; parallel edges collapse to one. Returns
    (node, hub, authority) in integer ``scale`` units.

    Complements ``pagerank``: PageRank measures endorsement flow,
    HITS separates DIRECTORY hosts (hubs — link out to many good
    authorities) from CONTENT hosts (authorities — linked from many
    good hubs). A crawl frontier wants both: hubs are where new
    authorities get discovered first.

    Determinism (same discipline as ``pagerank``): classic HITS
    L2-normalizes each round, which is float math and order-dependent
    across engines. Normalization in HITS is a UNIFORM scalar per
    round — it exists only to stop the values growing as
    (principal eigenvalue)^k, it never changes the ranking — so this
    implementation replaces it with integer floor division by
    ``q = max(1, total_mass DIV (n_nodes * scale))``: every value is
    an exact INT64 sum divided by one exact INT64 scalar, bit-identical
    on any engine/partitioning/retry. q floors, so total mass decays
    toward ~n_nodes*scale instead of equalling it — harmless for a
    ranking signal, exact for the oracle.

    Overflow headroom: one round's raw authority sum is bounded by
    max_indeg * n_nodes * scale (all normalized mass funneled through
    the hottest node); at the default scale=10^6 that caps around
    n_nodes * max_indeg < 9.2e12 — a 10^7-host graph with a 10^5-indeg
    hub fits with 10x room. Pass a smaller scale for more.

    Plan: edges/nodes persist once; each half-iteration is one
    edges->scores join + one partial+final sum (shuffled on the
    receiving key — the link_graph key distribution) + a 1-row total
    crossJoin (the sanctioned one-row-totals BNLJ). 2 joins + 2 aggs
    per iteration, O(iterations) stages."""
    from json_schema_spark.cache import register_cache

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_d"))
         .distinct())
    e = register_cache(e)
    nodes = register_cache(
        e.select(F.col("_s").alias("_n"))
        .unionByName(e.select(F.col("_d").alias("_n")))
        .distinct())
    # bounded driver scalar off the persisted nodes table (same
    # precedent as pagerank/dedup_groups), folded in as a literal
    n_cnt = nodes.count()
    full = n_cnt * scale
    hub = nodes.select("_n", F.lit(scale).cast("bigint").alias("_h"))

    def _half(scores: DataFrame, val: str, join_key: str,
              out_key: str, out_val: str) -> DataFrame:
        # one propagation: sum sender scores onto the receiving side,
        # then divide every node by the one-row q scalar
        raw = (e.join(scores, e[join_key] == scores["_n"])
               .groupBy(F.col(out_key).alias("_n"))
               .agg(F.sum(val).alias("_raw")))
        tot = raw.agg(F.sum("_raw").alias("_tot"))
        return (nodes.join(raw, "_n", "left")
                .crossJoin(tot)
                .select("_n",
                        F.expr(f"coalesce(_raw, 0) DIV "
                               f"greatest(coalesce(_tot, 0) DIV {full},"
                               f" 1)").alias(out_val)))

    auth = None
    for _i in range(iterations):
        # authority(v) = sum of hub(u) over u->v, then hub(u) = sum of
        # authority(v) over u->v — each normalized by its own q.
        # The FINAL auth has two consumers (the last hub half-step and
        # the output join) and Spark recomputes unpersisted branches
        # per consumer — persist it (repo-wide self-join rule)
        auth = _half(hub, "_h", "_s", "_d", "_a")
        if _i == iterations - 1:
            auth = register_cache(auth)
        hub = _half(auth, "_a", "_d", "_s", "_h")
    return (hub.join(auth, "_n")
            .select(F.col("_n").alias("node"),
                    F.col("_h").alias("hub"),
                    F.col("_a").alias("authority")))


def degree_stats(edges: DataFrame, src_col: str = "src_host",
                 dst_col: str = "dst_host") -> DataFrame:
    """Per-node webgraph degree features: (node, out_deg, in_deg,
    n_reciprocal) over the distinct edge set — the cheap link-farm
    screen that runs before (and explains) PageRank/HITS. A link farm
    shows huge out_deg with near-zero in_deg; a mutual-admiration
    ring shows n_reciprocal ~ out_deg (organic webgraphs have low
    edge reciprocity); a real hub shows balanced degrees. Missing
    sides are 0, not NULL.

    Plan: two keyed aggregates (out on src, in on dst) + ONE
    left-semi self-join against the reversed edge set for
    reciprocity, merged on node via outer joins of
    node-cardinality aggregates. No quadratic step: reciprocity is an
    equi-join on (src, dst) — edge-cardinality, co-partitioned with
    the out-degree shuffle."""
    from json_schema_spark.cache import register_cache

    e = register_cache(
        edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_d")).distinct())
    out_deg = e.groupBy(F.col("_s").alias("_n")) \
        .agg(F.count(F.lit(1)).alias("out_deg"))
    in_deg = e.groupBy(F.col("_d").alias("_n")) \
        .agg(F.count(F.lit(1)).alias("in_deg"))
    rev = e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    recip = (e.join(rev, ["_s", "_d"], "left_semi")
             .groupBy(F.col("_s").alias("_n"))
             .agg(F.count(F.lit(1)).alias("n_reciprocal")))
    merged = (out_deg.join(in_deg, "_n", "full_outer")
              .join(recip, "_n", "left"))
    return merged.select(
        F.col("_n").alias("node"),
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"))


def crawl_priority(ranks: DataFrame, host_quality: DataFrame,
                   node_col: str = "node", rank_col: str = "rank",
                   host_col: str = "host") -> DataFrame:
    """Crawl-schedule priority per host: the PageRank mass (link-based
    authority) discounted by the host's OWN content record —
    ``priority = rank * keep_rate * (1 - dup_frac)`` — so a
    well-linked boilerplate mill (high rank, dup_frac near 1) drops
    below a modest host that publishes unique, gate-passing pages.
    This is the join a frontier scheduler actually consumes: rank
    alone over-crawls link farms, quality alone under-crawls big
    hubs.

    Inputs are the outputs of ``pagerank`` (node, rank) and
    ``textanalysis.host_quality``. Determinism: both inputs are
    engine-exact (INT64 ranks, integer-ratio rates); the priority is
    one per-row double product of already-rounded values — no float
    aggregation anywhere — rounded once to 6.

    Scale story: both sides are HOST-cardinality aggregates (millions
    of rows at web scale, not trillions), so this is a tiny unhinted
    equi-join on host — AQE broadcasts whichever side measures small;
    the corpus-sized work already happened upstream."""
    j = ranks.join(host_quality,
                   ranks[node_col] == host_quality[host_col])
    priority = F.round(
        F.col(rank_col).cast("double") * F.col("keep_rate")
        * (F.lit(1.0) - F.col("dup_frac")), 6)
    return j.select(
        host_quality[host_col].alias("host"),
        F.col(rank_col).alias("rank"),
        "n_docs", "keep_rate", "dup_frac",
        priority.alias("priority"))
