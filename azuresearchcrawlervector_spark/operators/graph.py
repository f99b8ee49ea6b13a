"""Link-graph analytics over the crawl's discovered edges — PageRank,
the canonical frontier-prioritization signal (crawl high-rank pages
first; the reference crawler has no ranking concept, its queue is
FIFO — AbotCrawler.cs — so this is part of the beyond-reference
pipeline family).

Scale shape (same discipline as the star-CC loop in operators/dedup.py):
- every step is an equi-join or groupBy on the node id — candidates
  never go all-pairs and rank state is one row per node,
- each round's ranks are EAGERLY localCheckpoint-ed so Catalyst
  analysis stays O(1) per round instead of growing with the unrolled
  loop (executor loss therefore fails the job and needs a caller-level
  retry — same documented trade as the CC loop),
- the only driver-side values are O(1) scalars per round: the node
  count (once) and the dangling-rank mass (one aggregated row), like
  the CC convergence probe.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, iters: int = 20, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(node, rank) after `iters` power iterations with uniform
    teleport and dangling-mass redistribution. Ranks sum to 1 every
    round (a test pins it), so the result is the stationary
    distribution estimate, not an unnormalized score.

    Duplicate edges are counted once (distinct) — rank flows along the
    link structure, not link multiplicity."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("contrib"))
        )
        # dangling mass: nodes with no out-edges leak their rank; it is
        # redistributed uniformly (one O(1) scalar to the driver)
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select("node",
                    (F.lit(base)
                     + F.lit(damping) * F.coalesce(F.col("contrib"),
                                                   F.lit(0.0))).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_local(edges: list[tuple], iters: int = 20,
                   damping: float = 0.85) -> dict:
    """Pure-python golden twin of `pagerank` for oracle/test use —
    same semantics (distinct edges, no self-loops, dangling
    redistribution), no Spark."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    if n == 0:
        return {}
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in e:
            contrib[d] += ranks[s] / out[s]
        dangling = sum(r for v, r in ranks.items() if v not in out)
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = {v: base + damping * contrib[v] for v in nodes}
    return ranks


def rank_priorities(frontier_log: DataFrame, iters: int = 20,
                    damping: float = 0.85) -> DataFrame:
    """Recrawl priorities from a finished crawl's own frontier_log:
    PageRank over the discovered (parent_url → url) edges, emitted as
    (url, rank, priority) with priority = zero-padded rank order — the
    same lexicographic-priority contract the engine's frontier uses
    (plans/crawl.py PENDING_SCHEMA), so a rank-guided recrawl is just
    seeding pending from this table instead of depth|path.

    The reference crawler has no ranking: its queue is FIFO. This is
    the at-scale recrawl policy a 10^10 frontier wants — fetch budget
    goes to high-centrality pages first.

    The priority string is derived PER ROW from the rank value
    (fixed-point of 1 - rank, so lexicographic ascending = rank
    descending) — no global sort/row_number, which would be a
    single-partition window at frontier scale."""
    edges = (frontier_log
             .filter(F.col("parent_url").isNotNull())
             .select(F.col("parent_url").alias("src"),
                     F.col("url").alias("dst")))
    ranks = pagerank(edges, iters=iters, damping=damping)
    return (ranks
            .withColumn("priority",
                        F.format_string("%.12f", F.lit(1.0) - F.col("rank")))
            .select(F.col("node").alias("url"), "rank", "priority"))


def hits(edges: DataFrame, iters: int = 20,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(node, hub, authority) after `iters` rounds of Kleinberg's HITS
    with L2 normalization each half-step — the hub/authority complement
    to PageRank for frontier prioritization (a good HUB page is where
    a crawler harvests many good links per fetch).

    Same scale discipline as pagerank: equi-joins/groupBys on node id
    only, one row of state per node, eager localCheckpoint per round
    (O(1) Catalyst analysis; executor loss ⇒ caller-level retry), and
    the per-round L2 norms are the only driver scalars."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    if nodes.count() == 0:
        return nodes.withColumn("hub", F.lit(0.0)) \
                    .withColumn("authority", F.lit(0.0))
    state = nodes.select("node", F.lit(1.0).alias("hub"),
                         F.lit(1.0).alias("authority"))
    for _ in range(iters):
        # authority(d) = sum of hub(s) over in-edges, then L2-normalize
        auth = (
            e.join(state.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a"))
            .localCheckpoint(eager=True)   # norm collect + join reuse ONE computation
        )
        a_norm = auth.agg(
            F.sqrt(F.sum(F.col("a") * F.col("a")))).collect()[0][0] or 1.0
        auth = auth.select("node", (F.col("a") / F.lit(a_norm)).alias("a"))
        # hub(s) = sum of authority(d) over out-edges, L2-normalize
        hub = (
            e.join(auth.select(F.col("node").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
            .localCheckpoint(eager=True)
        )
        h_norm = hub.agg(
            F.sqrt(F.sum(F.col("h") * F.col("h")))).collect()[0][0] or 1.0
        hub = hub.select("node", (F.col("h") / F.lit(h_norm)).alias("h"))
        state = (
            nodes.join(auth, "node", "left").join(hub, "node", "left")
            .select("node",
                    F.coalesce("h", F.lit(0.0)).alias("hub"),
                    F.coalesce("a", F.lit(0.0)).alias("authority"))
            .localCheckpoint(eager=True)
        )
    return state


def hits_local(edges: list[tuple], iters: int = 20) -> dict:
    """Pure-python golden twin of `hits` (same edge dedup, same L2
    half-step normalization, sums in sorted-edge order)."""
    import math
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iters):
        na = {v: 0.0 for v in nodes}
        for s, d in e:
            na[d] += hub[s]
        nrm = math.sqrt(sum(x * x for x in na.values())) or 1.0
        auth = {v: x / nrm for v, x in na.items()}
        nh = {v: 0.0 for v in nodes}
        for s, d in e:
            nh[s] += auth[d]
        nrm = math.sqrt(sum(x * x for x in nh.values())) or 1.0
        hub = {v: x / nrm for v, x in nh.items()}
    return {v: (hub[v], auth[v]) for v in nodes}
