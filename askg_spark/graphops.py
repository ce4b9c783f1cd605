"""Generic distributed graph operators beyond the KG-specific ones
(webgraph.py: pagerank/in-degree; cc.py: connected components).

Triangle counting uses the degree-ordered orientation (the classic
MapReduce formulation — Suri & Vassilvitskii, "Counting Triangles and
the Curse of the Last Reducer", WWW'11): orient every undirected edge
from the (degree, id)-smaller endpoint to the larger, then count
directed paths s->t->w that close with an s->w edge. The orientation
bounds every node's OUT-degree by O(sqrt(m)) regardless of its raw
degree, so the hot-node quadratic blowup (a celebrity node with 10^6
neighbors would otherwise contribute 10^12 wedge candidates to one
reducer) becomes at most m^(3/2) wedges spread evenly — the skew
guard that makes the two equi-joins survive a web-scale graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_edges(df: DataFrame, group_col: str,
                       item_col: str) -> DataFrame:
    """Distinct undirected co-occurrence edges between items sharing a
    group: -> (u, v) with u < v, one row per unordered pair that
    co-occurs in at least one group.

    Scale shape: the pair join is an equi-join on the GROUP key, so
    pair generation per group is bounded by that group's fan-out
    squared (orders hold ~O(10) items; a crawl page holds ~O(10^2)
    links) — bounded work per key, never corpus-quadratic. A genuinely
    hot group (fan-out 10^4+) should be capped upstream the same way
    relations.py caps hot entity keys. The final distinct is one
    shuffle on the pair itself."""
    pp = df.select(F.col(group_col).alias("g"),
                   F.col(item_col).alias("i")).distinct()
    b = pp.select(F.col("g"), F.col("i").alias("j"))
    return (pp.join(b, "g")
              .filter(F.col("i") < F.col("j"))
              .select(F.col("i").alias("u"), F.col("j").alias("v"))
              .distinct())


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over undirected (u, v) edges
    (u <> v, each undirected edge present once in either direction):
    -> one row (n_nodes, n_edges, n_triangles), all BIGINT.

    Plan: degree -> orient each edge low-to-high by (degree, id) ->
    wedge join (e1.t = e2.s) -> closing join ((s, w) edge exists).
    Both joins are equi-joins on oriented endpoints whose fan-out the
    orientation bounds by O(sqrt(m)); with AQE on, the wedge join's
    residual skew is runtime-split. The two degree lookups broadcast
    when the node dim is small and degrade to shuffled hash joins
    otherwise — never a cross join."""
    from pyspark import StorageLevel

    spark = edges.sparkSession
    e = (edges.select(F.col("u"), F.col("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("u"),
                 F.greatest("u", "v").alias("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("n"))
           .unionAll(e.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    da = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | \
        ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    # the oriented frame feeds BOTH sides of the wedge join AND the
    # closing join (3 scans) — persist it or the whole
    # co-occurrence + distinct + degree pipeline above re-runs 3x
    # (measured 25.4s -> 9.7s at the 1.2M-edge sf0.1 graph)
    de = (e.join(da, "u").join(db, "v")
          .select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                  .alias("s"),
                  F.when(u_first, F.col("v")).otherwise(F.col("u"))
                  .alias("t"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        n_edges = de.count()  # also materializes the persist
        n_nodes = deg.count()
        e1 = de.select(F.col("s").alias("a"), F.col("t").alias("b"))
        e2 = de.select(F.col("s").alias("b"), F.col("t").alias("c"))
        e3 = de.select(F.col("s").alias("a"), F.col("t").alias("c"))
        # the wedge stream (sum of oriented-outdeg^2 rows — 60x the
        # edge count on the dense sf0.1 co-occurrence graph) is the
        # expensive frame: when the EDGE list itself is
        # broadcast-sized, hash-build both join sides from it so the
        # wedges are generated AND closed map-side, never shuffled;
        # past that, fall back to shuffled equi-joins whose per-key
        # fan-out the degree orientation bounds by O(sqrt(m))
        if n_edges <= 8_000_000:
            e2, e3 = F.broadcast(e2), F.broadcast(e3)
        n_triangles = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    finally:
        de.unpersist()
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_triangles)],
        "n_nodes long, n_edges long, n_triangles long")


def bfs_depths(edges: DataFrame, seeds: DataFrame,
               max_depth: int = 4) -> DataFrame:
    """Multi-source BFS: minimum hop distance (<= max_depth) from any
    seed, over an undirected edge set. -> (node, depth).

    Level-synchronous frontier expansion — the textbook distributed
    BFS: each round joins the CURRENT frontier (small) against the
    edge frame on the frontier's node key, anti-joins already-visited
    nodes, and advances. Per round that is one equi-join shuffle
    keyed by node plus one aggregation; rounds = max_depth, so the
    total work is O(edges touched) with no plan growth (each round's
    frontier is a fresh aggregation result, not a deepening lineage —
    bounded loops at fixed depth need no checkpoint). Web-scale BFS
    (friend-of-friend audiences, link-distance features) runs this
    exact shape; hub-node skew lands on the edge join's build side
    where AQE's skew split handles it.

    `edges` (src, dst) is treated as undirected; `seeds` is one
    column of node ids, depth 0."""
    bidir = (edges.selectExpr("src AS u", "dst AS v")
             .unionByName(edges.selectExpr("dst AS u", "src AS v"))
             .distinct()
             .persist())  # scanned once per round — without this the
    # doubled+distinct edge shuffle re-runs every hop
    node_col = seeds.columns[0]
    visited = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).alias("depth")).distinct()
    frontier = visited
    try:
        for d in range(1, max_depth + 1):
            nxt = (frontier.join(bidir, frontier["node"] == bidir["u"])
                   .select(F.col("v").alias("node"))
                   .distinct()
                   .join(visited.select("node"), "node", "left_anti")
                   .withColumn("depth", F.lit(d)))
            # materialize the (small) frontier once so visited's
            # growing union doesn't recompute every prior hop's joins
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt)
            frontier = nxt
        # pin the result before releasing the cached edge frame
        visited = visited.localCheckpoint(eager=True)
    finally:
        bidir.unpersist()
    return visited


def kcore(edges: DataFrame, k: int, max_rounds: int = 16,
          broadcast_limit: int = 100_000_000) -> DataFrame:
    """k-core of an undirected graph — the maximal subgraph where
    every node keeps degree >= k — by the standard iterative peel:
    drop all nodes of degree < k, recompute degrees (removals cascade),
    repeat to the fixed point. -> (node, degree) of the surviving
    core, degrees measured INSIDE the core. Cores are the classic
    web-graph density filter (spam farms and boilerplate link blocks
    live in shallow cores; genuinely-linked hubs survive deep ones).

    Per round: one degree aggregation (map-side combine) plus two
    left_semi joins keying the edge frame by each endpoint; the
    surviving-NODE frame is broadcast (node dimension << edge mass —
    20k nodes vs 1.2M edges at sf0.1, and the ratio only widens on
    denser graphs), so the edge frame is never shuffled inside the
    loop — each round is the degree exchange plus two map-side hash
    probes (two edge-frame shuffles per round removed; ~6.7s -> ~4.8s
    warm at the sf0.1 graph on a contended host). No collect of
    data rows; the only driver sync is one scalar count per round for
    the convergence test, and each round's frame is an eager
    localCheckpoint so lineage stays flat (same bounded-loop shape as
    bfs_depths). The broadcast is gated, not forced (advisor r4:
    F.broadcast is a hard hint — Spark attempts it regardless of size
    and OOMs the driver rather than falling back): the loop already
    holds each round's edge count as a driver-side int, and nodes <=
    2*edges, so when the surviving edge count exceeds
    ``broadcast_limit`` the hint is SKIPPED and the semi-joins run as
    ordinary shuffled joins — same plan shape, automatic degradation.
    Rounds are data-bounded: peel cascades are shallow in
    practice (<= 7 on the co-occurrence graphs here; max_rounds is a
    runaway backstop and the oracle unrolls the same bound — a graph
    still peeling after max_rounds raises rather than returning a
    non-fixed-point)."""
    cur = (edges.select(F.least("u", "v").alias("u"),
                        F.greatest("u", "v").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .distinct()
           .localCheckpoint(eager=True))
    n_edges = cur.count()
    for _ in range(max_rounds):
        deg = (cur.select(F.col("u").alias("n"))
               .unionAll(cur.select(F.col("v").alias("n")))
               .groupBy("n").agg(F.count(F.lit(1)).alias("c")))
        keep = deg.filter(F.col("c") >= k).select("n")
        if n_edges <= broadcast_limit:
            keep = F.broadcast(keep)
        nxt = (cur.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
               .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
               .select("u", "v")
               .localCheckpoint(eager=True))
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
        if n_edges == 0:
            break
    else:
        # rounds exhausted with the LAST round still removing edges —
        # but if that removal landed exactly on the fixed point
        # (cascade depth == max_rounds), the state is correct and only
        # the confirming no-op round is missing: check stability with
        # one extra aggregate instead of raising on a right answer
        deg = (cur.select(F.col("u").alias("n"))
               .unionAll(cur.select(F.col("v").alias("n")))
               .groupBy("n").agg(F.count(F.lit(1)).alias("c")))
        if deg.filter(F.col("c") < k).limit(1).count() > 0:
            raise RuntimeError(
                f"k-core peel did not converge within {max_rounds} rounds")
    return (cur.select(F.col("u").alias("n"))
            .unionAll(cur.select(F.col("v").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
            .select(F.col("n").alias("node"),
                    F.col("degree").cast("long").alias("degree")))


def random_walks(edges: DataFrame, starts: DataFrame,
                 length: int = 4) -> DataFrame:
    """Deterministic random walks over an undirected edge set — the
    corpus-generation step of DeepWalk/node2vec-style graph embedding
    training (walk sequences feed a skip-gram model), with the RNG
    replaced by RENDEZVOUS (highest-random-weight) hashing: hop t
    from node n moves to argmin over neighbors d of
    md5(start | t | d). Pseudo-uniform over the neighbor set,
    bit-reproducible on any partitioning and in SQL, and walks from
    different starts decorrelate (the start is in the hash).

    ``starts`` is a one-column frame of start nodes; the result is
    one WIDE row per start: (start, hop_1, ..., hop_length); an
    isolated start keeps NULL hops (mid-walk dead ends cannot happen
    on an undirected graph).

    Plan: NO adjacency ranking, NO degree table, NO shuffle of the
    edge mass — the HRW argmin replaces the rank-mod-degree
    convention precisely so the per-hop work is one broadcast probe
    of the raw bidirected edge frame (the walk frame is tiny) plus a
    walk-keyed min_by aggregation over ~Σ degree(frontier) rows.
    Duplicate edge rows are harmless (argmin is idempotent), so the
    usual bidir+distinct exchange disappears too — this variant reads
    4.4 s warm over the 3M-pair sf0.1 relation graph vs 12.5 s for
    the rank-window formulation (the residue is the caller's edge
    derivation, materialized once). Hub starts contribute their full
    neighbor list to one aggregation key: bounded by max degree, the
    same envelope every per-node op here carries."""
    raw = (edges.select(F.col("u").alias("s"), F.col("v").alias("d"))
           .unionByName(edges.select(F.col("v").alias("s"),
                                     F.col("u").alias("d")))
           # each hop probes this frame; pin it once or the caller's
           # upstream lineage (typically a distinct over the triple
           # store) re-executes per hop — 8 scans for a 4-hop walk
           .localCheckpoint(eager=True))
    start_col = starts.columns[0]
    base = starts.select(F.col(start_col).alias("start")).distinct()
    cur, cols = base, ["start"]
    for t in range(1, length + 1):
        hop = f"hop_{t}"
        nbr = raw.select(F.col("s").alias(cols[-1]),
                         F.col("d").alias(hop))
        weight = F.md5(F.concat_ws(
            "|", F.col("start").cast("string"), F.lit(str(t)),
            F.col(hop).cast("string")))
        cur = (F.broadcast(cur).join(nbr, cols[-1])
               .groupBy(*cols)
               .agg(F.min_by(hop, weight).alias(hop)))
        cols.append(hop)
    return base.join(cur, "start", "left")
