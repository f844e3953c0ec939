"""Connected components over pair graphs — the clustering step AFTER
pairwise near-dup detection (minhash/simhash/embedding pairs in, one
cluster id per document out; the survivor-selection policy then picks
min doc_id per cluster exactly like exact_dedup's 'first wins',
cli.rs:466-474).

Algorithm: min-label propagation WITH POINTER JUMPING — each round
(1) every node takes the min label across its neighborhood, then
(2) relabels through the current labels (lab <- lab(lab(node))), so
label paths halve every round and convergence takes O(log diameter)
rounds, not O(diameter). Every round ends in localCheckpoint: an
iterative Spark loop that keeps logical lineage re-analyzes a tree
that grows per round — truncating it is what keeps round k as cheap
as round 1.

Convergence is detected by the label SUM (labels only ever decrease,
so an unchanged sum means a fixpoint — one cheap aggregate per round,
no join-and-compare). max_rounds=20 therefore supports component
diameters up to ~2^19; beyond it the loop raises loudly instead of
silently emitting a non-converged labeling.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_rounds: int = 20,
) -> DataFrame:
    """edges(a, b) -> (node, cluster) where cluster = min node id in
    the node's connected component. Exact; nodes = every id appearing
    in edges. Returns an empty frame for an empty edge set."""
    sym = edges.select(
        F.col(a).cast("long").alias("src"), F.col(b).cast("long").alias("dst")
    ).unionByName(
        edges.select(
            F.col(b).cast("long").alias("src"), F.col(a).cast("long").alias("dst")
        )
    )
    sym = sym.localCheckpoint(eager=True)
    lab = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    cached = [sym, lab]
    prev_sum = lab.agg(F.sum("lab")).first()[0]
    if prev_sum is None:  # no edges at all
        out = lab.select("node", F.col("lab").alias("cluster"))
        out._cadastre_cached = cached
        return out
    # measured strategy gate (house rule): the label table is one
    # (node, lab) long-pair per node — under ~5M nodes it broadcasts
    # (<~100 MB build), turning BOTH per-round joins map-side so the
    # static edge table is never re-shuffled per round; above that the
    # joins fall back to shuffle plans unchanged
    bcast = lab.count() <= 5_000_000

    def _b(d):
        return F.broadcast(d) if bcast else d

    for _ in range(max_rounds):
        # (1) neighborhood min — checkpoint HERE: this aggregate is the
        # round's one unavoidable edge-sized exchange, and both the
        # pointer jump below and the next round reuse it
        nbr = sym.join(_b(lab), sym.src == lab.node).select(
            F.col("dst").alias("node"), "lab"
        )
        stepped = (
            lab.select("node", "lab")
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        cached.append(stepped)
        # (2) pointer jump: lab <- lab(lab(node)). Labels are node ids
        # with lab(m) <= m, so the jump only ever lowers a label; the
        # left join covers the (impossible in practice) dangling case.
        # The map side is REBUILT with renamed columns (fresh exprIds)
        # — an alias-based self-join of `stepped` loses an attribute in
        # the optimizer on some plans (NoSuchElementException).
        jump = stepped.select(
            F.col("node").alias("m_node"), F.col("lab").alias("m_lab")
        )
        new = (
            stepped.join(_b(jump), F.col("lab") == F.col("m_node"), "left")
            .select(
                "node",
                F.coalesce(F.col("m_lab"), F.col("lab")).alias("lab"),
            )
        )
        if not bcast:
            # shuffle path: `new` is consumed twice next round — keep
            # it materialized so the SMJ is not replayed per use (the
            # broadcast path recomputes it from the cached `stepped`
            # with a map-side join, which is cheaper than a second
            # checkpoint write)
            new = new.localCheckpoint(eager=True)
            cached.append(new)
        new_sum = new.agg(F.sum("lab")).first()[0]
        lab = new
        if new_sum == prev_sum:
            out = lab.select("node", F.col("lab").alias("cluster"))
            out._cadastre_cached = cached
            return out
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_rounds} rounds — "
        f"component diameter exceeds ~2^{max_rounds - 1}; raise max_rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup CLUSTERS from the minhash pair graph: (doc_id, cluster)
    for every document participating in at least one pair; cluster =
    min doc_id of its component (the dedup survivor)."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, threshold=threshold, hash_fn=hash_fn)
    cc = connected_components(pairs)
    out = cc.select(F.col("node").alias("doc_id"), "cluster")
    out._cadastre_cached = getattr(cc, "_cadastre_cached", []) + getattr(
        pairs, "_cadastre_cached", []
    )
    return out


RANK_UNIT = 1e14  # 1 rank unit = 1e-14; max rank (=1) fits 2^53 exactly


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    n_nodes: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over edges(src, dst) — the link-graph
    authority score a web-corpus pipeline feeds into crawl scheduling
    and quality weighting. Returns (node, rank) after `iters` rounds.

    Exactness contract: between iterations ranks are QUANTIZED to
    INTEGER UNITS of 1e-14 via floor(x * 1e14), and per-edge
    contributions are floored to units before the inbound SUM — so the
    aggregation is an exact BIGINT sum (order-independent) and every
    step replays bitwise in plain SQL (the driver oracle unrolls the
    identical iterations in DuckDB). Integer floor + IEEE double ops
    only: no double->DECIMAL casts, whose round-half mode differs
    between engines. The <=1e-14 floor loss per step is ~8 orders
    below anything a ranking consumer can see.

    Scale shape per round: one broadcast-or-shuffle equi-join of edges
    to the current rank vector on src (narrow long keys), one
    map-side-partial SUM keyed on dst, one left join back to nodes.
    localCheckpoint truncates the per-round lineage exactly like
    connected_components — round k plans as cheap as round 1. Dangling
    nodes (no out-edges) contribute nothing (their mass leaks; the
    standard redistribution term is deliberately out of scope and
    documented, keeping the recurrence join-local — no global
    aggregate barrier per round beyond the SUM).
    """
    if n_nodes is None:
        n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes  # python double, shared with the oracle
    u0 = int((1.0 / n_nodes) * RANK_UNIT)  # floor, exact python int

    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)

    ranks = nodes.select(
        F.col("node").cast("long").alias("v"), F.lit(u0).alias("u")
    ).localCheckpoint(eager=True)
    cached = [ed, ranks]
    # measured gate (same rule as connected_components): a node-sized
    # rank/contrib table under ~5M rows broadcasts, so the static edge
    # table is never re-shuffled per round
    bcast = n_nodes <= 5_000_000

    def _b(d):
        return F.broadcast(d) if bcast else d

    out = None
    for _ in range(iters):
        contrib = (
            ed.join(_b(ranks), ed.src == ranks.v)
            .select(
                "dst",
                # units/out-degree, floored to integer units; F.floor on
                # a double returns LONG — DuckDB twin: CAST(floor(..))
                F.floor(F.col("u").cast("double") / F.col("d")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        stepped = nodes.select(F.col("node").cast("long").alias("v")).join(
            _b(contrib), F.col("v") == F.col("dst"), "left"
        )
        rd = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(RANK_UNIT)
        )
        out = stepped.select("v", rd.alias("rd")).localCheckpoint(eager=True)
        cached.append(out)
        ranks = out.select("v", F.floor(F.col("rd") * F.lit(RANK_UNIT)).alias("u"))
    res = out.select(F.col("v").alias("node"), F.col("rd").alias("rank"))
    res._cadastre_cached = cached
    return res


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 5,
    n_nodes: int | None = None,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over
    edges(src, dst) — pagerank's link-analysis twin: authorities are
    the pages good hubs point AT (crawl-prioritization signal beside
    PageRank), hubs are the pages that point at good authorities
    (directory/spam-farm detector). Returns (node, hub, authority)
    after `iters` full rounds.

    Exactness contract (same as pagerank): scores live as BIGINT units
    of 1e-14. Each half-round is an exact BIGINT inbound SUM of units,
    then an L1 normalization computed in IEEE doubles with a literal-
    identical op shape — floor((s / t) * 1e14) — so every step replays
    bitwise in DuckDB's unrolled-CTE twin. Initial hub mass is
    floor(1e14 / n) per node, keeping every unit value <= ~1e14 and
    every SUM far inside the 2^53 exact-double range, so the
    BIGINT->DOUBLE casts are exact. A dead half-round (t = 0 or NULL:
    no edges) yields all-zero scores via an ANSI-gated CASE, never a
    0/0.

    Scale shape per half-round: one edges-to-scores equi-join (the
    node-sized score table broadcasts under the ~5M house gate, so the
    static edge table is never re-shuffled per round), one map-side-
    partial SUM keyed on the receiving endpoint, and the normalizer is
    a ONE-ROW global agg crossed back in via broadcast — no collect,
    no driver round-trip. localCheckpoint truncates per-round lineage
    exactly like pagerank/connected_components."""
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    if n_nodes is None:
        n_nodes = nodes.count()
    unit = F.lit(float(RANK_UNIT))
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    nv = nodes.select(F.col("node").cast("long").alias("v"))
    u0 = int(RANK_UNIT / n_nodes)
    h = nv.select("v", F.lit(u0).cast("long").alias("u")).localCheckpoint(
        eager=True
    )
    cached = [e, h]
    bcast = n_nodes <= 5_000_000

    def _b(d):
        return F.broadcast(d) if bcast else d

    def _half(scores, src_col, dst_col):
        """One half-round: inbound unit SUM onto dst_col, L1-normalize,
        re-floor to units. Returns the new node-sized (v, u) table."""
        s = (
            e.join(_b(scores), F.col(src_col) == scores.v)
            .select(F.col(dst_col).alias("w"), "u")
            .groupBy("w")
            .agg(F.sum("u").alias("s"))
        )
        t = s.agg(F.sum("s").alias("t"))
        out = (
            nv.join(_b(s), F.col("v") == F.col("w"), "left")
            .crossJoin(F.broadcast(t))
            .select(
                "v",
                F.when(
                    F.col("t") > 0,
                    F.floor(
                        (
                            F.coalesce(F.col("s"), F.lit(0)).cast("double")
                            / F.col("t").cast("double")
                        )
                        * unit
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("u"),
            )
            .localCheckpoint(eager=True)
        )
        cached.append(out)
        return out

    a = None
    for _ in range(iters):
        a = _half(h, "src", "dst")  # authority <- sum of in-edge hub mass
        h = _half(a, "dst", "src")  # hub <- sum of out-edge authority mass
    hub = h.select("v", (F.col("u").cast("double") / unit).alias("hub"))
    auth = a.select(
        F.col("v").alias("va"),
        (F.col("u").cast("double") / unit).alias("authority"),
    )
    res = hub.join(_b(auth), F.col("v") == F.col("va")).select(
        F.col("v").alias("node"), "hub", "authority"
    )
    res._cadastre_cached = cached
    return res


def kcore(edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """k-core of the undirected simple graph of `edges` (src, dst):
    the maximal subgraph in which every node has degree >= k. Output
    (node, core_deg) — core_deg is the node's degree WITHIN the core.

    Algorithm: iterative peel — each round computes the degree census
    on the surviving edge set and drops nodes below k; the fixpoint is
    unique (independent of peel order), so the oracle can replay it by
    unrolling rounds until idempotent. All integer arithmetic.

    Scale shape per round: one narrow-key degree agg (map-side
    partials) + two left-semi joins restricting the edge list, with
    localCheckpoint truncating lineage so round r plans as cheap as
    round 1 (same regime as connected_components). Convergence is
    detected by the surviving-node COUNT: alive sets only shrink, so
    an unchanged count is set equality — one cheap aggregate per
    round, no join-and-compare.
    """
    und = (
        edges.select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cached = [und]
    n_prev = -1
    for _ in range(max_rounds):
        deg = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )
        # checkpoint: both semi-join sides (and their broadcast builds)
        # consume `alive`; without it each build replays the degree agg
        alive = deg.where(F.col("core_deg") >= k).localCheckpoint(
            eager=True
        )
        cached.append(alive)
        n_alive = alive.count()
        if n_alive == 0 or n_alive == n_prev:
            out = alive.select("node", "core_deg")
            out._cadastre_cached = cached
            return out
        # node-sized alive set under ~5M rows broadcasts both semi
        # joins (measured gate, n_alive is already counted) — the edge
        # list is filtered map-side instead of re-shuffling per round
        def _ab(col):
            side = alive.select(F.col("node").alias(col))
            return F.broadcast(side) if n_alive <= 5_000_000 else side

        und = (
            und.join(_ab("a"), "a", "left_semi")
            .join(_ab("b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        cached.append(und)
        n_prev = n_alive
    raise RuntimeError(
        f"kcore: no fixpoint after {max_rounds} peel rounds "
        f"(still {n_prev} nodes alive); raise max_rounds"
    )


def triangle_counts(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Per-node triangle participation over the undirected simple
    graph of `edges` (src, dst): each triangle increments all three
    corners; nodes in no triangle report 0 (when `nodes` is given).
    Output (node, n_triangles).

    Algorithm: the degree-ordered orientation (the standard
    shuffle-bounded shape) — every undirected edge points from the
    (degree, id)-smaller endpoint to the larger, so each node's
    out-neighborhood is O(sqrt(E)) on skewed graphs and the wedge join
    e1(u,v) x e2(v,w) cannot explode on hub nodes; a wedge closes iff
    the oriented edge (u,w) exists. Each triangle is counted exactly
    once (its corners are totally ordered by rank). All integer
    arithmetic — the SQL twin replays it exactly.

    Scale shape: degree census (narrow-key agg), two equi-joins on
    node ids, one explode + final agg. The orientation is the skew
    defense — without it a single hub of degree d contributes d^2
    wedges.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    wd = und.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    orient = wd.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e2 = orient.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = orient.join(e2, "v").select("u", "v", "w")
    close = orient.select(
        F.col("u").alias("u"), F.col("v").alias("w"), F.lit(1).alias("_c")
    )
    tris = wedges.join(close, ["u", "w"]).select("u", "v", "w")
    corners = tris.select(
        F.explode(F.array("u", "v", "w")).alias("node")
    ).groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    if nodes is None:
        return corners
    return nodes.join(corners, "node", "left").select(
        "node",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )


def clustering_coefficient(
    edges: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """Local clustering coefficient per node over the undirected
    simple graph of `edges` (src, dst): cc = 2*T / (deg * (deg - 1))
    where T is the node's triangle count — how tightly a page's link
    neighborhood closes on itself (link-farm / community signal).
    Output (node, deg, n_triangles, cc); cc NULL when deg < 2.

    Exactness contract: deg and T are exact integer aggregates
    (triangle_counts' degree-ordered wedge join); cc is ONE division
    of doubles cast from those integers — bitwise identical in the
    SQL twin. Scale shape: triangle_counts' plan plus one extra
    narrow-key join of the degree census (same agg the orientation
    already computes).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(edges, nodes)
    base = tri.join(deg, "node", "left").select(
        "node",
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
        "n_triangles",
    )
    d = F.col("deg").cast("double")
    cc = (F.lit(2.0) * F.col("n_triangles").cast("double")) / (d * (d - F.lit(1.0)))
    return base.select(
        "node", "deg", "n_triangles", F.when(F.col("deg") >= 2, cc).alias("cc")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 30,
) -> DataFrame:
    """Multi-source BFS over DIRECTED edges(src, dst): for every node
    reachable from the seed set, the minimum hop count from any seed.
    Output (node, hop); unreachable nodes are absent. The crawl-depth /
    seed-distance primitive (how far is each page from the seed list).

    Algorithm: frontier-synchronous BFS (the Pregel shape) — per round
    one equi-join of the CURRENT FRONTIER (not the full visited set)
    against the edge list, one distinct, one left-anti against the
    visited set. Work per round is proportional to the frontier, the
    labels are final the round they are assigned (hop = first round
    seen == minimum, because rounds expand in hop order), and the
    frontier empties at convergence — detected by its count, which the
    round must materialize anyway. localCheckpoint truncates lineage
    so round r plans as cheap as round 1. The fixpoint is unique, so
    the oracle replays it as unrolled idempotent rounds.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).localCheckpoint(eager=True)
    lab = (
        seeds.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("hop"))
        .localCheckpoint(eager=True)
    )
    cached = [e, lab]
    frontier = lab
    # measured gate (the connected_components rule): frontier and
    # visited sets under ~5M rows broadcast, keeping the static edge
    # table out of per-round exchanges; counts are already materialized
    # by the convergence check
    _B = 5_000_000
    n_frontier = lab.count()
    n_lab = n_frontier
    for r in range(1, max_rounds + 1):
        f_side = frontier.select(F.col("node").alias("src"))
        if n_frontier <= _B:
            f_side = F.broadcast(f_side)
        anti_side = lab.select("node")
        if n_lab <= _B:
            anti_side = F.broadcast(anti_side)
        nxt = (
            e.join(f_side, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(anti_side, "node", "left_anti")
            .select("node", F.lit(r).alias("hop"))
            .localCheckpoint(eager=True)
        )
        cached.append(nxt)
        n_frontier = nxt.count()
        if n_frontier == 0:
            out = lab.select("node", F.col("hop").cast("int").alias("hop"))
            out._cadastre_cached = cached
            return out
        lab = lab.unionByName(nxt).localCheckpoint(eager=True)
        cached.append(lab)
        n_lab += n_frontier
        frontier = nxt
    raise RuntimeError(
        f"bfs_hops: frontier still non-empty after {max_rounds} rounds — "
        "graph eccentricity exceeds the budget; raise max_rounds"
    )


def neighborhood_overlap(
    edges: DataFrame,
    min_common: int = 1,
    max_center_deg: int | None = None,
) -> DataFrame:
    """Link prediction over the undirected simple graph of edges(src,
    dst): for every NON-ADJACENT pair (u, w), u < w, sharing >=
    min_common neighbors, the common-neighbor count and neighborhood
    Jaccard |N(u) & N(w)| / |N(u) | N(w)|. Output (u, w, common,
    deg_u, deg_w, jaccard) — the "suggest an edge" / duplicate-entity
    candidate primitive on co-citation graphs.

    Exactness: counts and degrees are exact integers; jaccard =
    common / (deg_u + deg_w - common) is ONE IEEE division of exactly
    representable integers — bitwise identical across engines, no
    rounding grid.

    Scale shape: adjacency census (narrow-key agg), one self-join of
    the adjacency list on the CENTER node (each center of degree d
    emits d*(d-1)/2 candidate pairs — the true output-complexity of
    the problem), one (u, w) count agg, an anti-join against the edge
    set, two degree joins. The quadratic term is per-center: a super
    hub of degree d contributes O(d^2) wedges, so `max_center_deg`
    optionally EXCLUDES hub centers (their common-neighbor signal is
    noise at web scale — everyone co-cites the homepage) and reports
    how many were dropped via the `_skipped_hubs` attribute, the
    engine's no-silent-caps rule.
    """
    und = (
        edges.select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und.select(
        F.col("a").alias("v"), F.col("b").alias("x")
    ).unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("x")))
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    skipped = 0
    if max_center_deg is not None:
        hubs = deg.where(F.col("deg") > max_center_deg)
        skipped = hubs.count()
        adj_c = adj.join(
            hubs.select("v"), "v", "left_anti"
        )
    else:
        adj_c = adj
    left = adj_c.select("v", F.col("x").alias("u"))
    right = adj_c.select("v", F.col("x").alias("w"))
    pairs = (
        left.join(right, "v")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    non_adj = pairs.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("deg_u"))
    dw = deg.select(F.col("v").alias("w"), F.col("deg").alias("deg_w"))
    out = (
        non_adj.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            F.col("common").cast("long").alias("common"),
            F.col("deg_u").cast("long").alias("deg_u"),
            F.col("deg_w").cast("long").alias("deg_w"),
            (
                F.col("common").cast("double")
                / (F.col("deg_u") + F.col("deg_w") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )
    out._skipped_hubs = skipped
    return out


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 40,
) -> DataFrame:
    """Multi-source single-source-shortest-path (Bellman–Ford) over
    DIRECTED weighted edges(src, dst, w>=0, integer): for every node
    reachable from the seed set, the minimum total weight from any
    seed. Output (node, dist BIGINT); unreachable nodes absent. The
    weighted sibling of bfs_hops — crawl cost, latency radius,
    cheapest-route labeling.

    Algorithm: frontier Bellman–Ford — per round, relax only edges
    leaving nodes whose label IMPROVED last round (the delta frontier;
    a full-edge relax every round would be E x rounds work), min-merge
    candidates per target map-side, then compare against the label
    set (full-outer shape via left join on the candidate side). The
    frontier empties exactly at the fixpoint, which is unique (labels
    only decrease, bounded below), so the oracle replays it as
    unrolled idempotent FULL relaxation rounds. Integer weights keep
    every label exact. localCheckpoint truncates per-round lineage.

    Scale shape: each round is one equi-join keyed on src (edges can
    be pre-partitioned on src once — the loop reuses the layout), one
    map-side-combinable min agg on dst, one narrow join against the
    label set. Work is proportional to the frontier's out-edges, the
    Pregel bound.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    lab = (
        seeds.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    cached = [e, lab]
    frontier = lab
    # measured gate (the connected_components rule): node-sized
    # frontier/label tables under ~5M rows broadcast so the static
    # edge table never re-shuffles; frontier counts come free from the
    # convergence check, the label count is tracked as an upper bound
    _B = 5_000_000
    n_frontier = lab.count()
    n_lab = n_frontier

    def _gate(d, n):
        return F.broadcast(d) if n <= _B else d

    for _ in range(max_rounds):
        cand = (
            e.join(
                _gate(
                    frontier.select(F.col("node").alias("src"), "dist"),
                    n_frontier,
                ),
                "src",
            )
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("_d"))
            .groupBy("node")
            .agg(F.min("_d").alias("_d"))
        )
        improved = (
            cand.join(
                _gate(
                    lab.select("node", F.col("dist").alias("_old")), n_lab
                ),
                "node",
                "left",
            )
            .filter(F.col("_old").isNull() | (F.col("_d") < F.col("_old")))
            .select("node", F.col("_d").alias("dist"))
            .localCheckpoint(eager=True)
        )
        cached.append(improved)
        n_frontier = improved.count()
        if n_frontier == 0:
            out = lab.select("node", "dist")
            out._cadastre_cached = cached
            return out
        lab = (
            lab.join(
                _gate(
                    improved.select("node", F.col("dist").alias("_new")),
                    n_frontier,
                ),
                "node",
                "left",
            )
            .select(
                "node",
                F.when(
                    F.col("_new").isNotNull()
                    & (F.col("_new") < F.col("dist")),
                    F.col("_new"),
                )
                .otherwise(F.col("dist"))
                .alias("dist"),
            )
            .unionByName(
                improved.join(
                    _gate(lab.select("node"), n_lab), "node", "left_anti"
                )
            )
            .localCheckpoint(eager=True)
        )
        cached.append(lab)
        n_lab += n_frontier
        frontier = improved
    raise RuntimeError(
        f"sssp: labels still improving after {max_rounds} rounds — "
        "negative weights or a deeper graph than the budget; raise max_rounds"
    )


def label_prop(
    edges: DataFrame,
    a: str = "src",
    b: str = "dst",
    iters: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan-style LPA) -> (node,
    label): the community-detection pass a link-graph pipeline runs
    after connected components -- CC finds reachability islands, LPA
    finds dense neighborhoods INSIDE one island (host clusters, topic
    hubs). Deterministic contract: labels start as node ids, each of
    the FIXED `iters` rounds every node adopts the most frequent label
    among its (undirected, deduplicated) neighbors with ties broken by
    the SMALLEST label, and isolated nodes keep their own label --
    synchronous fixed-round semantics make the result exact and let
    the DuckDB oracle unroll the identical rounds (asynchronous LPA's
    visit-order dependence would be unverifiable).

    Scale shape (100 TB): the symmetrized edge table is checkpointed
    ONCE and never re-shuffles -- under the measured ~5M-node gate the
    per-round label and winner tables broadcast (the connected_
    components house pattern), so each round is one map-side join +
    one (node, label) count with map-side partials + one map-side
    winner pick via max(struct(n, -label)) -- no window function, no
    sort. Per-round localCheckpoint truncates lineage.
    """
    sym = (
        edges.select(
            F.col(a).cast("long").alias("src"),
            F.col(b).cast("long").alias("dst"),
        )
        .unionByName(
            edges.select(
                F.col(b).cast("long").alias("src"),
                F.col(a).cast("long").alias("dst"),
            )
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    cached = [sym, lab]
    bcast = lab.count() <= 5_000_000

    def _b(d):
        return F.broadcast(d) if bcast else d

    for _ in range(iters):
        votes = sym.join(_b(lab), sym.src == lab.node).select(
            F.col("dst").alias("node"), "lab"
        )
        cnt = votes.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("n"))
        best = cnt.groupBy("node").agg(
            F.max(
                F.struct(
                    F.col("n"), (-F.col("lab")).alias("neg"), F.col("lab")
                )
            ).alias("s")
        ).select("node", F.col("s.lab").alias("new_lab"))
        lab = (
            lab.join(_b(best), "node", "left")
            .select(
                "node", F.coalesce("new_lab", "lab").alias("lab")
            )
            .localCheckpoint(eager=True)
        )
        cached.append(lab)
    out = lab.select("node", F.col("lab").alias("label"))
    out._cadastre_cached = cached
    return out


def personalized_pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    n_seeds: int | None = None,
) -> DataFrame:
    """Personalized PageRank -> (node, rank): the pagerank recurrence
    with the teleport mass concentrated on a SEED set instead of
    spread uniformly -- the crawl-scheduling / related-page primitive
    (authority relative to a trusted frontier, not globally). Seeds
    get base = (1-d)/|seeds| per round; non-seeds get 0; everything
    else (integer-unit quantization, per-edge floor, exact BIGINT
    inbound sums, unrolled-round DuckDB replay) is identical to
    `pagerank` -- see its docstring for the exactness contract.

    Ranks start at 1/|seeds| on seeds and 0 elsewhere (the standard
    PPR initialization, so round 0 already integrates to 1).

    Scale shape: same as pagerank -- the seed flag joins once into the
    node-sized rank table (broadcast under the 5M gate); per round one
    edge-to-rank join, one map-side-partial SUM on dst, one node join.
    """
    if n_seeds is None:
        n_seeds = seeds.count()
    if n_seeds <= 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    base = (1.0 - damping) / n_seeds
    u0 = int((1.0 / n_seeds) * RANK_UNIT)

    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    n_nodes = nodes.count()
    sd = seeds.select(
        F.col("node").cast("long").alias("v"), F.lit(True).alias("is_seed")
    )
    nod = (
        nodes.select(F.col("node").cast("long").alias("v"))
        .join(F.broadcast(sd), "v", "left")
        .select("v", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    ranks = nod.select(
        "v",
        F.when(F.col("is_seed"), F.lit(u0)).otherwise(F.lit(0)).alias("u"),
    )
    cached = [ed, nod]
    bcast = n_nodes <= 5_000_000

    def _b(d):
        return F.broadcast(d) if bcast else d

    out = None
    for _ in range(iters):
        contrib = (
            ed.join(_b(ranks), ed.src == ranks.v)
            .select(
                "dst",
                F.floor(F.col("u").cast("double") / F.col("d")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        stepped = nod.join(_b(contrib), F.col("v") == F.col("dst"), "left")
        rd = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0.0)) + (
            F.lit(damping)
            * (
                F.coalesce(F.col("s"), F.lit(0)).cast("double")
                / F.lit(RANK_UNIT)
            )
        )
        out = stepped.select("v", "is_seed", rd.alias("rd")).localCheckpoint(
            eager=True
        )
        cached.append(out)
        ranks = out.select(
            "v", F.floor(F.col("rd") * F.lit(RANK_UNIT)).alias("u")
        )
    res = out.select(F.col("v").alias("node"), F.col("rd").alias("rank"))
    res._cadastre_cached = cached
    return res
