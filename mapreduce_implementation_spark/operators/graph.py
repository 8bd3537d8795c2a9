"""Distributed connected components over a pair/edge DataFrame.

The LLM-dedup pipeline's clustering step: near-dup *pairs* (MinHash / LSH /
Jaccard joins, operators/dedup.py) become dedup *clusters* by computing the
connected components of the pair graph and keeping min(doc_id) per component
as the canonical representative.

Algorithm: the alternating **large-star / small-star** method of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SoCC'14) — the standard
formulation for exactly this setting (GraphFrames/GraphX use the same
scheme).  Each round is two hash aggregations + joins on the edge list (pure
DataFrame ops, map-side combinable), and the edge list *contracts* toward
star graphs rooted at component minima in O(log n) rounds — unlike naive
min-label flooding, which needs O(graph diameter) rounds and keeps the full
edge list live throughout.  At 100 TB the edge list is the near-dup pair
output (orders of magnitude smaller than the corpus), every round shrinks
it, and nothing ever reaches the driver except a per-round convergence
scalar (count + order-insensitive checksum of the edge list).

Reference parity: the reference engine (mapreduce.c) has no graph operator;
this is north-star surface (SURVEY §2b Q10/Q11 — dedup at scale needs the
clustering step, not just pairwise candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .caching import tracked_persist

__all__ = ["connected_components", "pagerank", "label_propagation",
           "triangle_count", "bfs_distances", "kcore", "hits"]

# Rounds are O(log n); 25 covers any graph that fits on a real cluster
# (2^25 nodes of *diameter* after contraction).  Hitting the cap raises —
# silently returning a half-contracted clustering would be wrong.
_MAX_ROUNDS = 25


def _canon(edges: DataFrame) -> DataFrame:
    """Distinct edges oriented large→small, self-loops dropped."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighborhood.

    Emit (v, m(u)) for v in N(u), v > u, where m(u) = min(N(u) ∪ {u});
    operates on the symmetrized edge list.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor (and u itself) to the minimum.

    Operates on large→small oriented edges: for each u with smaller
    neighbors N(u), m = min(N(u)); emit (v, m) for v in N(u) ∪ {u}, v != m.
    """
    e = _canon(edges)
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        e.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _signature(edges: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive checksum) — the only values that ever
    reach the driver; used purely as the convergence test."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cluster assignment for every node appearing in ``pairs``.

    Returns ``(node, cluster_id)`` with ``cluster_id`` = the minimum node id
    of the component (deterministic canonical representative).  Runs
    large-star/small-star rounds until the edge list is a fixed point (a
    star forest rooted at each component's minimum).
    """
    nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .union(pairs.select(F.col(b_col).alias("node")))
        .distinct()
    )
    edges = _canon(pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")))
    edges = edges.localCheckpoint(eager=True)
    sig = _signature(edges)
    for _ in range(_MAX_ROUNDS):
        stepped = _small_star(_large_star(edges))
        # localCheckpoint truncates the per-round lineage (plans would
        # otherwise nest one analysis tree per round) and materializes the
        # contracted edge list so each round scans its predecessor once.
        stepped = stepped.localCheckpoint(eager=True)
        new_sig = _signature(stepped)
        edges = stepped
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {_MAX_ROUNDS} rounds")
    # Fixed point: every edge is (member, root).  Roots map to themselves.
    membership = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    return (
        nodes.join(membership, "node", "left")
        .select("node", F.coalesce("cluster_id", "node").alias("cluster_id"))
    )


def pagerank(edges: DataFrame, nodes: DataFrame, iters: int = 5,
             damping: float = 0.85, broadcast_ranks: bool | None = None,
             broadcast_node_limit: int = 1_000_000,
             reset: DataFrame | None = None) -> DataFrame:
    """Weighted PageRank over an edge list ``(src, dst, w)``.

    ``reset`` (optional) personalizes the walk: a ``(v, s)`` frame whose
    ``s`` sums to 1 replaces the uniform teleport — each round's
    restart mass lands as ``(1-d)*s_v`` via one broadcast join, and the
    initial rank vector is the reset distribution itself, so seeded
    relevance costs the same per round as global PageRank.

    Power iteration expressed as DataFrame ops: each round is ONE join of
    the rank vector onto the (large) edge list + one aggregation on dst —
    the edge list is hash-partitioned once and reused, and nothing
    touches the driver.  ``edges``/out-weights are persisted so the
    expensive edge build runs once, not once per iteration.
    Dangling-node mass is dropped (the standard simplification); node
    count enters the plan as a broadcast 1-row aggregate, never a Python
    scalar.

    Rank-vector strategy (the 100 TB honesty knob): the vector is
    O(nodes).  For dimension-sized graphs (the 25-node trade graph) it
    broadcasts — zero shuffle per iteration.  At web-scale node counts a
    broadcast exceeds executor memory, so past ``broadcast_node_limit``
    nodes the vector joins by ``src`` as a plain shuffled hash join
    instead (same result, one extra exchange per iteration — the
    Pregel-style layout).  ``broadcast_ranks=None`` probes with a
    LIMIT-capped count (never scans more than limit+1 node rows);
    True/False forces a mode.  Both modes are oracle-identical —
    tests/test_graph_text.py::test_pagerank_shuffle_mode_matches_broadcast.

    Reference parity: none — mapreduce.c has no graph surface; this is
    north-star iterative-analytics surface (the PageRank-in-MapReduce
    formulation of Page et al. / the classic Hadoop example, re-expressed
    declaratively).
    """
    e = tracked_persist(
        edges.select("src", "dst", F.col("w").cast("double").alias("w")))
    outw = tracked_persist(e.groupBy("src").agg(F.sum("w").alias("_ow")))
    n1 = nodes.select(F.col("v")).distinct()
    if broadcast_ranks is None:
        broadcast_ranks = (
            n1.limit(broadcast_node_limit + 1).count() <= broadcast_node_limit)
    hint = F.broadcast if broadcast_ranks else (lambda df: df)
    cnt = n1.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    rs = None
    if reset is None:
        ranks = n1.crossJoin(F.broadcast(cnt)).select(
            "v", (F.lit(1.0) / F.col("_n")).alias("r"))
    else:
        rs = tracked_persist(
            n1.join(reset.select("v", F.col("s").cast("double").alias("_rs")),
                    "v", "left")
            .select("v", F.coalesce("_rs", F.lit(0.0)).alias("_rs")))
        ranks = rs.select("v", F.col("_rs").alias("r"))
    for _i in range(iters):
        contrib = (
            e.join(outw, "src")
            .join(hint(ranks), F.col("src") == F.col("v"))
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("w") / F.col("_ow")).alias("_s"))
        )
        base = (n1.crossJoin(F.broadcast(cnt))
                .join(contrib, F.col("v") == F.col("dst"), "left"))
        if rs is None:
            tele = (1.0 - damping) / F.col("_n")
        else:
            base = base.join(F.broadcast(rs), "v", "left")
            tele = (1.0 - damping) * F.coalesce(F.col("_rs"), F.lit(0.0))
        ranks = base.select(
            "v",
            (tele + damping * F.coalesce(F.col("_s"), F.lit(0.0))).alias("r"),
        )
        # truncate the per-round lineage (the CC idiom): without this the
        # plan nests one join tree per iteration and Catalyst re-analyzes
        # the whole stack each round — measured ~1 s/round locally.  The
        # rank vector is O(nodes); a cluster deployment caring about
        # executor loss swaps this for reliable checkpoint().  The LAST
        # round stays lazy so the returned frame's plan still shows the
        # iteration shape (plan-pinned by tests) and composes with
        # downstream pushdown.
        if _i < iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def kcore(edges: DataFrame, a_col: str, b_col: str, k: int,
          rounds: int) -> DataFrame:
    """k-core decomposition by synchronous iterative peeling: repeatedly
    drop every node of degree < ``k`` (with the cascade — removing a
    node lowers its neighbors' degrees, which may push THEM under k)
    until a fixed point.  Returns ``(node, core_deg)`` for the nodes of
    the ``rounds``-round peel, with their degree inside the surviving
    subgraph.  The k-core is the standard dense-subgraph primitive
    (Seidman 1983, "Network structure and minimum degree"); in a dedup
    pipeline it separates tight near-duplicate communities from
    stragglers that LSH banding happened to pair once.

    Each round is one symmetrized degree aggregate (map-side
    combinable) + two semi joins restricting the edge list to surviving
    endpoints — all keyed operations, nothing driver-side, and the edge
    list only ever SHRINKS, so the 100 TB posture is the
    connected_components one: iteration cost tracks the (contracting)
    edge list.  The fixed unrolled ``rounds`` keeps the computation
    oracle-able (the DuckDB twin unrolls identical CTE rounds, so both
    sides agree even mid-cascade); production at unknown diameter swaps
    the fixed count for connected_components' signature-convergence
    loop.  Lineage truncates per round (see pagerank; last round stays
    lazy).
    """
    e = tracked_persist(
        edges.select(F.least(F.col(a_col), F.col(b_col)).alias("u"),
                     F.greatest(F.col(a_col), F.col(b_col)).alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct())
    for _i in range(rounds):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        keep = (sym.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
                .filter(F.col("_d") >= k).select("u"))
        e = (e.join(keep, "u", "left_semi")
             .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
             .select("u", "v"))
        if _i < rounds - 1:
            e = e.localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (sym.groupBy("u").agg(F.count(F.lit(1)).alias("core_deg"))
            .select(F.col("u").alias("node"), "core_deg"))


def triangle_count(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Per-node triangle counts via the ordered two-path join (Suri &
    Vassilvitskii, WWW'11 "Counting triangles and the curse of the last
    reducer").

    Edges are canonicalized to u < v (undirected, loops dropped), so each
    triangle {a<b<c} exists exactly once as the edge triple (a,b), (a,c),
    (b,c): one self-join builds ordered 2-paths (a,b)-(a,c) with b<c, one
    semi-ish join against the edge set closes them.  The ordering is the
    scale trick — a high-degree hub only fans out pairs among its
    HIGHER-ordered neighbors, killing the quadratic last-reducer that a
    naive undirected 2-path join hits on skewed graphs.  (The classic
    refinement orders by degree instead of id for worst-case m^1.5; id
    order keeps the operator deterministic and oracle-checkable and is
    the same join plan.)

    Returns (node, n_triangles) for every node that closes >=1 triangle.
    """
    e = (edges.select(F.least(F.col(a_col), F.col(b_col)).alias("u"),
                      F.greatest(F.col(a_col), F.col(b_col)).alias("v"))
         .filter(F.col("u") < F.col("v"))
         .distinct())
    p1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    p2 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    paths = p1.join(p2, "a").filter(F.col("b") < F.col("c"))
    closing = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tris = paths.join(closing, ["b", "c"])
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def label_propagation(edges: DataFrame, nodes: DataFrame,
                      iters: int = 5) -> DataFrame:
    """Synchronous weighted label propagation (community detection,
    Raghavan et al. 2007) — deterministic variant: every node
    simultaneously adopts the label with the highest incident edge
    weight among its neighbors, ties broken by smallest label;
    isolated nodes keep their own id.  Returns ``(v, label)`` after
    ``iters`` rounds from the all-singleton start.

    Scale shape mirrors ``pagerank``: the (contracted) edge list is
    persisted and hash-partitioned once; each round is one equi-join of
    the label vector onto edges, one (dst, label) partial-aggregable
    sum, and one KEYED window (partitioned by dst — never a global
    window) to pick the argmax.  The label vector is O(nodes) and joins
    by key — no broadcast requirement, so the operator is web-scale by
    construction.  Synchronous update + min-label tie-break makes the
    fixed iteration count exactly reproducible (and therefore
    oracle-able), unlike the asynchronous/random-order formulation.
    """
    from pyspark.sql.window import Window

    from .caching import tracked_persist

    e = tracked_persist(
        edges.select("src", "dst", F.col("w").cast("double").alias("w")))
    n1 = nodes.select(F.col("v")).distinct()
    labels = n1.select("v", F.col("v").alias("label"))
    w_pick = Window.partitionBy("dst").orderBy(F.desc("_s"), F.asc("label"))
    for _i in range(iters):
        scores = (
            e.join(labels, F.col("src") == F.col("v"))
            .groupBy("dst", "label").agg(F.sum("w").alias("_s"))
        )
        picked = (
            scores.withColumn("_rn", F.row_number().over(w_pick))
            .filter(F.col("_rn") == 1)
            .select(F.col("dst"), F.col("label").alias("_new"))
        )
        labels = (
            n1.join(picked, F.col("v") == F.col("dst"), "left")
            .select("v", F.coalesce("_new", F.col("v")).alias("label"))
        )
        # lineage truncation per round (see pagerank; last round stays
        # lazy for plan inspection): label vector is O(nodes), and
        # without it plan analysis grows per iteration
        if _i < iters - 1:
            labels = labels.localCheckpoint(eager=True)
    return labels


def bfs_distances(edges: DataFrame, nodes: DataFrame, source,
                  max_hops: int = 5) -> DataFrame:
    """Single-source shortest HOP distances (multi-round distributed
    BFS / the unit-weight Bellman-Ford relaxation): ``(v, dist)`` with
    NULL dist for nodes unreachable within ``max_hops``.

    Each round relaxes every edge once — one equi-join of the current
    distance vector onto the edge list, one (dst) min-aggregate, one
    key-joined merge with the previous vector: the Pregel superstep
    expressed declaratively.  The distance vector is O(nodes) and joins
    by key (no broadcast requirement — same web-scale posture as the
    shuffled-rank PageRank mode); rounds run a fixed count with
    ``localCheckpoint`` lineage truncation per round (the CC idiom) —
    deterministic, so still oracle-able.  At true web diameter, swap
    the fixed count for the convergence test ``connected_components``
    uses.
    """
    # infinity sentinel derived from max_hops (a reachable distance is
    # <= max_hops, so max_hops + 1 can never collide with a real value);
    # a magic constant here silently mis-NULLed distances >= it
    inf = max_hops + 1
    e = tracked_persist(edges.select("src", "dst"))
    n1 = nodes.select(F.col("v")).distinct()
    dist = n1.select(
        "v", F.when(F.col("v") == source, 0).cast("int").alias("d"))
    for _i in range(max_hops):
        relaxed = (
            e.join(dist.filter(F.col("d").isNotNull()),
                   F.col("src") == F.col("v"))
            .groupBy("dst").agg((F.min("d") + 1).alias("_nd"))
        )
        dist = (
            dist.join(relaxed, dist.v == relaxed.dst, "left")
            .select(dist.v,
                    F.least(F.coalesce(F.col("d"), F.lit(inf)),
                            F.coalesce(F.col("_nd"), F.lit(inf))).alias("_m"))
            .select("v", F.when(F.col("_m") < inf,
                                F.col("_m")).cast("int").alias("d"))
        )
        # lineage truncation per round (see pagerank; last round stays
        # lazy for plan inspection): the nested join-per-hop plan costs
        # ~1 s/round of pure analysis otherwise; the distance vector is
        # O(nodes) and the edge list is persisted, so each round's job
        # is one cached-edge join + tiny aggregate
        if _i < max_hops - 1:
            dist = dist.localCheckpoint(eager=True)
    return dist.withColumnRenamed("d", "dist")


def sssp_weighted(edges: DataFrame, nodes: DataFrame, source,
                  rounds: int, max_edge_w: int) -> DataFrame:
    """Single-source shortest WEIGHTED path distances (Bellman-Ford):
    ``(v, dist)`` with NULL dist for nodes not reached within
    ``rounds`` relaxation rounds.  Generalizes :func:`bfs_distances`
    from hop counting to integer edge weights — each round relaxes
    every edge once with ``min(dist[src] + w)`` instead of
    ``min(dist) + 1``.

    ``max_edge_w`` must upper-bound every edge weight; the infinity
    sentinel is derived as ``rounds * max_edge_w + 1`` (no reachable
    distance can collide — the magic-constant lesson from the BFS
    sentinel).  Integer weights keep the min-plus algebra exact in any
    engine; callers with float costs should scale to integers first.

    Scale shape: the distance vector is O(nodes) and joins by key (no
    broadcast requirement); each round is one edge equi-join + one
    (dst) min-aggregate + one keyed merge — the Pregel superstep,
    declaratively, a fixed round count with ``localCheckpoint``
    lineage truncation per round (deterministic, so still oracle-able).
    At true web scale swap the fixed count for the convergence test
    ``connected_components`` uses.
    """
    if max_edge_w < 1:
        raise ValueError("max_edge_w must be >= 1")
    inf = rounds * max_edge_w + 1
    e = tracked_persist(edges.select("src", "dst", "w"))
    n1 = nodes.select(F.col("v")).distinct()
    dist = n1.select(
        "v", F.when(F.col("v") == source, 0).cast("long").alias("d"))
    for _i in range(rounds):
        relaxed = (
            e.join(dist.filter(F.col("d").isNotNull()),
                   F.col("src") == F.col("v"))
            .groupBy("dst").agg(F.min(F.col("d") + F.col("w")).alias("_nd"))
        )
        dist = (
            dist.join(relaxed, dist.v == relaxed.dst, "left")
            .select(dist.v,
                    F.least(F.coalesce(F.col("d"), F.lit(inf)),
                            F.coalesce(F.col("_nd"), F.lit(inf))).alias("_m"))
            .select("v", F.when(F.col("_m") < inf,
                                F.col("_m")).cast("long").alias("d"))
        )
        # lineage truncation per round (see bfs_distances; last round
        # stays lazy): flattens the nested Bellman-Ford plan from
        # O(rounds^2) analysis to O(rounds)
        if _i < rounds - 1:
            dist = dist.localCheckpoint(eager=True)
    return dist.withColumnRenamed("d", "dist")


def hits(edges: DataFrame, nodes: DataFrame, iters: int = 2,
         broadcast_vecs: bool | None = None,
         broadcast_node_limit: int = 1_000_000) -> DataFrame:
    """Weighted HITS (Kleinberg, "Authoritative sources in a hyperlinked
    environment", JACM 1999): alternating hub/authority power iteration
    with L2 normalization after every half-step.  Same execution shape
    as pagerank(): the edge list is persisted and reused across rounds;
    each half-step is one join of the O(nodes) score vector onto the
    edges + one partial-aggregable sum keyed on the opposite endpoint;
    the L2 normalizer enters the plan as a broadcast 1-row aggregate,
    never a Python scalar.  The score vector broadcasts for
    dimension-sized graphs and falls back to a shuffled hash join past
    ``broadcast_node_limit`` nodes — pagerank's 100 TB honesty knob.

    Returns (v, hub, authority) after ``iters`` full authority-then-hub
    rounds from the all-ones hub start (deterministic, RNG-free, so an
    oracle can unroll the identical rounds as chained CTEs).
    """
    e = tracked_persist(
        edges.select("src", "dst", F.col("w").cast("double").alias("w")))
    n1 = nodes.select("v").distinct()
    if broadcast_vecs is None:
        broadcast_vecs = (
            n1.limit(broadcast_node_limit + 1).count() <= broadcast_node_limit)
    hint = F.broadcast if broadcast_vecs else (lambda df: df)

    def norm(scored: DataFrame, key: str) -> DataFrame:
        """Left-join partial sums back onto all nodes (missing = 0) and
        L2-normalize via a broadcast 1-row aggregate."""
        full = (n1.join(scored, F.col("v") == F.col(key), "left")
                .select("v", F.coalesce("s", F.lit(0.0)).alias("s")))
        nrm = full.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("_nrm"))
        return full.crossJoin(F.broadcast(nrm)).select(
            "v", (F.col("s") / F.col("_nrm")).alias("x"))

    h = n1.select("v", F.lit(1.0).alias("x"))
    a = h
    for _i in range(iters):
        ar = (e.join(hint(h), F.col("src") == F.col("v"))
              .groupBy("dst").agg(F.sum(F.col("w") * F.col("x")).alias("s")))
        a = norm(ar, "dst")
        # truncate per-half-step lineage (the pagerank/CC idiom): the
        # nested join tree otherwise grows by 2 joins + 2 aggregates per
        # round and Catalyst re-analyzes the whole stack each time.  The
        # FINAL round's frames stay lazy so the returned plan shows the
        # iteration shape and composes with downstream pushdown.
        if _i < iters - 1:
            a = a.localCheckpoint(eager=True)
        hr = (e.join(hint(a), F.col("dst") == F.col("v"))
              .groupBy("src").agg(F.sum(F.col("w") * F.col("x")).alias("s")))
        h = norm(hr, "src")
        if _i < iters - 1:
            h = h.localCheckpoint(eager=True)
    return (h.select("v", F.col("x").alias("hub"))
            .join(a.select("v", F.col("x").alias("authority")), "v"))
