"""Graph operators over edge relations (the crawl/link-graph side of
corpus curation).

The reference engine has no graph surface (structa profiles document
structure only); this module exists for the curation pipeline — host
authority from the crawl's link graph is the classic reputation
signal next to :func:`~.text.host_reputation`'s content-derived one
(Page et al. 1999; Common Crawl publishes exactly this ranking for
its host graph).

Everything here is deterministic and oracle-replayable: iteration
counts are fixed by the caller, per-iteration sums are rounded
column-side (SQL ``round``, half away from zero — identical in Spark
and DuckDB), and no randomness or wall-clock enters the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             iters: int = 3, src: str = "src", dst: str = "dst",
             round_to: int = 9,
             checkpoint_every: int = 0) -> DataFrame:
    """PageRank over a directed edge relation, ``iters`` fixed
    power-iterations with uniform init, dangling-mass redistribution
    and per-iteration rounding:

    ``r'(v) = round((1-d)/N + d * (sum_{u->v} r(u)/outdeg(u)
    + dangling_mass/N), round_to)``

    Parallel edges collapse (DISTINCT) and self-loops drop before
    iterating — the web-graph convention. Returns ``(v, rank)`` for
    every node on either side of an edge.

    The per-iteration ``round`` makes the fixpoint path replayable
    bit-for-bit by an external SQL oracle: division and the damping
    mix are order-independent IEEE ops, and rounding the one
    order-dependent term (the contribution sum) to ``round_to``
    decimals absorbs summation-order ulps before they can compound
    across iterations.

    Scale shape: the plan never touches the driver — N and the
    dangling mass are 1-row broadcast relations, not collects — and
    each iteration is one src-keyed join (contributions), one
    dst-keyed aggregation, and one left join back onto the node set:
    shuffles bounded by the node/edge relation, never the corpus
    that derived it. The rank vector localCheckpoints (lazily) every
    round — each iteration reads it twice, so an unpinned plan
    doubles per iteration; ``checkpoint_every`` remains for callers
    that want an EAGER cut every k rounds on very deep iteration
    counts (the :func:`~.dedup.connected_components` discipline).
    """
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
         .where(F.col(src) != F.col(dst))
         .distinct()
         # the edge relation is read by EVERY iteration (contribution
         # join) and everything below derives from it — without this
         # barrier each iteration re-runs the upstream corpus scan
         # that derived the edges, turning 3 iterations into 7+ full
         # scans. The checkpointed relation is graph-sized, not
         # corpus-sized.
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("s").alias("v"))
             .union(e.select(F.col("t").alias("v")))
             .distinct()
             .localCheckpoint(eager=False))
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    n_rel = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))

    r = (nodes.join(F.broadcast(n_rel))
         .select("v", (F.lit(1.0) / F.col("__n")).alias("rank")))
    for i in range(iters):
        dang = (r.join(deg, r["v"] == deg["s"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                     .alias("__dm")))
        contrib = (e.join(r, e["s"] == r["v"])
                   .join(deg, "s")
                   .groupBy("t")
                   .agg(F.sum(F.col("rank") / F.col("d"))
                        .alias("__c")))
        r = (nodes.join(contrib, nodes["v"] == contrib["t"], "left")
             .join(F.broadcast(n_rel))
             .join(F.broadcast(dang))
             .select("v", F.round(
                 F.lit(1.0 - damping) / F.col("__n")
                 + F.lit(damping)
                 * (F.coalesce(F.col("__c"), F.lit(0.0))
                    + F.col("__dm") / F.col("__n")),
                 round_to).alias("rank"))
             # each iteration reads the previous rank vector TWICE
             # (dangling mass + contributions); without a barrier the
             # logical plan doubles per iteration — 2^iters copies of
             # iteration 1 that the analyzer re-optimizes and the
             # executor re-runs wherever pruning can't collapse them.
             # The lazy checkpoint pins the node-sized vector once per
             # round, keeping plan size and executed work linear in
             # `iters` (optimization guide §3.3: materialise
             # intermediates to truncate very large plans).
             .localCheckpoint(eager=False))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            r = r.localCheckpoint(eager=False)
    return r


def hits(edges: DataFrame, iters: int = 3, src: str = "src",
         dst: str = "dst", round_to: int = 9,
         checkpoint_every: int = 0) -> DataFrame:
    """HITS hubs and authorities (Kleinberg 1999, the mutual-
    reinforcement counterpart to :func:`pagerank`): ``iters`` fixed
    iterations of

    ``a'(v) = round(sum_{u->v} h(u) / sum_all, round_to)``
    ``h'(v) = round(sum_{v->w} a'(w) / sum_all, round_to)``

    with all-ones hub init and L1 normalization (each vector divides
    by its own sum — the rational-friendly norm; L2 would put an
    irrational sqrt between the engine and any SQL replay). The hub
    update reads the CURRENT iteration's authorities, the classic
    update order. Parallel edges collapse (DISTINCT) and self-loops
    drop before iterating, the :func:`pagerank` convention. Returns
    ``(v, authority, hub)`` for every node on either side of an edge.

    Why beside pagerank: HITS separates "points at good content"
    (hub) from "is pointed at" (authority) — a link-farm aggregator
    scores as a hub but never as an authority, where pagerank folds
    both into one number. For host curation the authority column is
    the anti-spam signal; the hub column finds index/portal hosts
    whose OWN pages are usually boilerplate.

    Replay discipline: the one order-dependent term per update (the
    contribution sum) is divided by the L1 total and rounded to
    ``round_to`` decimals before the next update reads it, so
    summation-order ulps die per half-iteration instead of
    compounding — identical to pagerank's per-iteration round.

    Scale shape: the edge relation localCheckpoints once (graph-
    sized, not corpus-sized) and each half-iteration is one edge-
    keyed join + one node-keyed aggregation, with the L1 total
    folding back as a 1-row broadcast — the plan never touches the
    driver. ``checkpoint_every`` truncates lineage every k rounds
    for deep iteration counts.
    """
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
         .where(F.col(src) != F.col(dst))
         .distinct()
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("s").alias("v"))
             .union(e.select(F.col("t").alias("v")))
             .distinct()
             .localCheckpoint(eager=False))
    h = nodes.select("v", F.lit(1.0).alias("hub"))
    a = nodes.select("v", F.lit(0.0).alias("authority"))
    for i in range(iters):
        a_raw = (e.join(h, e["s"] == h["v"])
                 .groupBy("t")
                 .agg(F.sum("hub").alias("__a")))
        a_sum = a_raw.agg(F.sum("__a").alias("__as"))
        a = (nodes.join(a_raw, nodes["v"] == a_raw["t"], "left")
             .join(F.broadcast(a_sum))
             .select("v", F.round(
                 F.coalesce(F.col("__a"), F.lit(0.0))
                 / F.col("__as"), round_to).alias("authority"))
             # every half-iteration reads its input vector twice (the
             # contribution join + the L1 total), so the unchecked
             # plan QUADRUPLES per iteration — 4^iters copies of the
             # first contribution join to analyze and, where pruning
             # can't collapse them, to execute. Pinning each node-
             # sized vector with a lazy checkpoint keeps plan size
             # and executed work linear in `iters` (guide §3.3).
             .localCheckpoint(eager=False))
        h_raw = (e.join(a, e["t"] == a["v"])
                 .groupBy("s")
                 .agg(F.sum("authority").alias("__h")))
        h_sum = h_raw.agg(F.sum("__h").alias("__hs"))
        h = (nodes.join(h_raw, nodes["v"] == h_raw["s"], "left")
             .join(F.broadcast(h_sum))
             .select("v", F.round(
                 F.coalesce(F.col("__h"), F.lit(0.0))
                 / F.col("__hs"), round_to).alias("hub"))
             .localCheckpoint(eager=False))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            a = a.localCheckpoint(eager=False)
            h = h.localCheckpoint(eager=False)
    return a.join(h, "v").select("v", "authority", "hub")
