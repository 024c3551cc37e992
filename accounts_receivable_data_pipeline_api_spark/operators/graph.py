"""Graph analytics over near-duplicate pair graphs ([EXT] north star).

The dedup family (minhash/cosine/simhash pair miners + connected
components in operators/dedup.py) produces an undirected PAIR GRAPH;
this module adds the two classic whole-graph signals a curation
pipeline derives from it:

  pagerank_portable — power-iteration PageRank: which documents sit at
                      the center of a duplication cluster (centrality is
                      a standard spam / boilerplate-hub signal — hubs
                      that near-duplicate against many pages rank high).
  triangle_counts   — per-node triangle counts via the degree-ordered
                      edge-iterator (compact-forward): local clustering
                      density separates tight copy-cliques from loose
                      chains at the same component size.

Both are pure DataFrame compositions (no Python UDFs) whose per-round
cost is bounded by O(|E|) shuffles, and both use deterministic math
(fixed iteration counts, 6-dp per-term rounding + exact DECIMAL sums)
so their full output hash-checks against an independent DuckDB
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _release_checkpoint


def pagerank_portable(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    iterations: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair graph by fixed-round power
    iteration: (node, rank) for every pair endpoint. Input pairs are
    canonicalized first (low->high, self-loops dropped, duplicates
    collapsed — the triangle_counts contract), so reversed or repeated
    representations of the same undirected edge count one neighbor.

    Determinism / oracle portability (the house recipe): per-edge
    contributions are round()ed to ``round_dp`` and summed through
    DECIMAL(28,dp) (order-free); every OTHER value — the initial 1/N
    and each updated rank — is the RAW IEEE result of an identical op
    sequence, never re-rounded. Rounding ranks looked safer but is the
    known half-tie trap: a 6-dp rank times 1/deg lands EXACTLY on a
    7th-digit tie whenever deg is 2/4/5/8/..., and Spark (shortest-
    decimal-repr HALF_UP) and DuckDB (exact-binary) then round to
    DIFFERENT sides (measured: 0.00144 vs 0.001439 in iteration 1).
    Raw ranks keep mantissas long, so the per-term round sites are
    tie-free with the same odds the BM25/tfidf entries rely on. The
    damping constants are embedded via repr() by callers that mirror
    this in SQL (1 - 0.85 in Python is 0.15000000000000002, NOT the
    SQL literal 0.15 — interpolating repr() keeps both engines on the
    same double).

    Dangling mass: an undirected pair graph has no dangling nodes
    (every endpoint has degree >= 1), so no redistribution term is
    needed; rank mass is exactly conserved up to the per-term rounding.

    Scale: the degree weighting is folded into the edge list ONCE
    before the loop (edges_w = symmetric edges + 1/deg at the source),
    so each round is exactly one equi-join (ranks ⋈ edges_w on src —
    shuffle keyed by node id) and one map-side-combinable SUM keyed by
    dst. State per round is one (node, rank) row per node; lineage is
    truncated every round (localCheckpoint, released deterministically
    when superseded — the iterative-operator rule from
    connected_components). At 100 TB the joins shuffle O(|E|) rows of
    (long, double) — no corpus text ever enters the loop.
    """
    # canonicalize like triangle_counts: low -> high orientation,
    # self-loops out, duplicates collapsed — a caller handing both
    # orientations of an undirected edge (or repeated pairs) must not
    # double every degree, and a self-loop must not diverge from the
    # set-semantics UNION a SQL twin uses for its symmetric edge list.
    # The checkpoint sits BEFORE the self-union so the (possibly
    # expensive, un-checkpointed) pair-generation pipeline materializes
    # exactly ONCE — union-then-checkpoint puts two copies of the
    # subtree under a single job and runs the pipeline twice.
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("src"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one-time fold of 1/deg onto the edges; the loop never touches deg
    edges_w = (
        sym.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("inv_deg"))
        .localCheckpoint(eager=True)
    )
    _release_checkpoint(e)
    nodes = edges_w.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        # edges_w is dead on this path (the returned frame reads only
        # the nodes checkpoint) — release it like the normal exit does
        _release_checkpoint(edges_w)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n  # python double; oracle interpolates repr()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    dec = f"decimal(28,{round_dp})"
    # r14 (guide §2.4/§1.2): the rank recurrence is a SINGLE-REFERENCE
    # chain — each round consumes the previous ranks exactly once, and
    # the multiply-referenced frames (edges_w, nodes) are already
    # eagerly checkpointed above — so the rounds unroll LAZILY into one
    # plan with no per-round materialization barrier: no per-round
    # localCheckpoint job, no initial-ranks checkpoint job (it was a
    # pure projection of the nodes checkpoint). The old shape paid
    # 1 + iterations eager checkpoint jobs to truncate a lineage that
    # cannot blow up here (the exponential-replan hazard needs a frame
    # referenced more than once per round, as in connected_components).
    # Plan depth grows linearly with the fixed iteration count; since
    # analyzer/optimizer time grows superlinearly in that depth, an
    # eager checkpoint every _TRUNCATE_EVERY rounds re-bounds the plan
    # for callers passing large iteration counts (round-14 ADVICE) —
    # a no-op at the bench's default 3.
    _TRUNCATE_EVERY = 8
    prev_ck = None
    for _i in range(iterations):
        contrib = (
            ranks.join(edges_w, ranks.node == edges_w.src)
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") * F.col("inv_deg"), round_dp)
                .cast(dec)
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (_i + 1) % _TRUNCATE_EVERY == 0 and _i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
            if prev_ck is not None:
                _release_checkpoint(prev_ck)
            prev_ck = ranks
    # ONE eager materialization runs every unrolled round; it must
    # complete before edges_w/nodes are released below (their blocks
    # back the lazy chain), and it becomes the single result-backing
    # checkpoint the hygiene contract allows
    # (tests/test_memory_hygiene.py).
    ranks = ranks.localCheckpoint(eager=True)
    if prev_ck is not None:
        _release_checkpoint(prev_ck)
    _release_checkpoint(edges_w)
    _release_checkpoint(nodes)
    return ranks


def triangle_counts(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-node triangle counts over an undirected pair graph:
    (node, n_triangles) for every pair endpoint (0 for endpoints in no
    triangle).

    Algorithm: the degree-ordered edge-iterator (Schank & Wagner's
    compact-forward — the standard distributed formulation, e.g.
    Suri & Vassilvitskii's MR-friendly variant). Edges are oriented
    low -> high by the TOTAL order (degree, id); wedges are enumerated
    only at their minimum-order apex and closed by joining the oriented
    edge list. Orienting by degree bounds per-node out-degree by
    O(sqrt(|E|)) on any graph, so wedge volume is O(|E|^{3/2}) worst
    case instead of sum(deg^2) — the difference between a hub node
    exploding the join and not. The (degree, id) tuple is compared as
    a struct (Spark) / row value (SQL), never materialized as a global
    rank — a global dense rank would need a one-partition window.

    Plan: degree agg (one shuffle) -> orient (broadcastable-free
    projection after one join back to degrees) -> wedge self-join on
    the apex -> closing equi-join on (lo, hi) -> explode the 3 corners
    -> count per node, left-joined back to endpoints so zero-triangle
    nodes surface. All shuffles carry (long, long) pairs only.
    """
    # the canonical edge list feeds FIVE plan branches (degree agg, two
    # orientation joins, both wedge sides, the closing join); one eager
    # checkpoint stops each branch from re-running the (possibly LSH-
    # candidate-generating) pair pipeline — this is the call's one
    # result-backing checkpoint (hygiene contract; swap for
    # checkpoint(dir) on a cluster, as in connected_components)
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # r15 (guide §2.4 — share work across plan branches): the degree
    # table feeds THREE consumers (both orientation joins and the final
    # zero-triangle left join) and the oriented edge list feeds three
    # more (both wedge sides and the closing join); without a
    # materialization point the r14 plan re-executed the degree agg ~7x
    # and the 2-join orientation subtree 3x per build
    # (plans/r15/op_triangles_before.txt — zero ReusedExchange fired:
    # the consumers re-key every copy differently, so no two exchanges
    # canonicalize equal). Both frames are (long, long[, long]) rows
    # bounded by |V| / |E| — tiny next to the wedge volume — so LAZY
    # localCheckpoints (the minhash-candidate rule: no job at plan
    # construction) pin each exactly once per build. On a cluster,
    # swap for checkpoint(dir), as in connected_components.
    deg = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("a", "node")
        .localCheckpoint(eager=False)
    )
    # orient every canonical edge by the (deg, id) total order
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # identical field names in both branches — a struct CASE/least is
    # type-checked on field NAMES as well as types
    ka = F.struct(F.col("deg_a").alias("deg"), F.col("a").alias("id"))
    kb = F.struct(F.col("deg_b").alias("deg"), F.col("b").alias("id"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(ka < kb, kb).otherwise(ka).alias("hi_key"),
        )
        .localCheckpoint(eager=False)
    )
    w1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("hi_key").alias("kv"))
    w2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("hi_key").alias("kw"))
    # wedges at the minimum-order apex u; close with the oriented edge
    # (v, w) — v precedes w in the order by construction (kv < kw)
    wedges = w1.join(w2, "u").filter(F.col("kv") < F.col("kw")).select("u", "v", "w")
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    corner_counts = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.select("node")
        .join(corner_counts, "node", "left")
        .select("node", F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )


def kcore_nodes(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Fixed-round k-core peeling over an undirected pair graph:
    (node, degree, converged) for every node surviving ``rounds``
    rounds of "remove nodes with degree < k" — the standard coreness
    gate separating densely-embedded duplicate clusters from loose
    chains (a triangle count is LOCAL density; the k-core is the
    GLOBAL "still dense after the fringe peels away" signal).

    Fixed-round determinism (the pagerank/kmeans recipe): full k-core
    runs to a data-dependent fixed point, which no unrolled SQL twin
    can mirror, so the operator pins the round count and REPORTS
    convergence instead of iterating to it. The alive set only ever
    SHRINKS, so "no node was removed in the last round" — checked as
    count equality, which for a monotone set chain IS set equality —
    certifies the fixed point was reached: converged=true means these
    ARE the k-core members (plus exact degrees within it), not an
    approximation; converged=false says rounds were too few, loudly.

    ``degree`` is the node's degree within the SURVIVOR-induced
    subgraph (the final alive set), all integer counts — the whole
    output hash-checks cross-engine with no float anywhere but the
    converged flag's encoding at the caller.

    Scale: each round is two alive-set equi-joins against the
    symmetric edge list + one map-side-combinable degree agg — O(|E|)
    shuffles of (long, long) rows, alive-set lineage truncated per
    round (localCheckpoint, released when superseded; the iterative-
    operator rule). The per-round count() actions read checkpointed
    frames. Cite: reference has no graph surface ([EXT] north star).
    """
    if rounds < 1:
        raise ValueError(
            f"kcore_nodes needs at least one peel round (got {rounds}); "
            "the convergence certificate compares the last two rounds"
        )
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("src"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    alive = sym.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    counts = [alive.count()]

    def _induced(alive_df: DataFrame) -> DataFrame:
        return sym.join(
            alive_df.select(F.col("node").alias("src")), "src"
        ).join(alive_df.select(F.col("node").alias("dst")), "dst")

    for _ in range(rounds):
        # r14 note: a lazy checkpoint materialized by the per-round
        # convergence count (one fused job instead of checkpoint+count)
        # was tried and MEASURED SLOWER on the A/B harness (op_kcore
        # min 3.67 -> 4.78 s over 6 interleaved runs); kept eager.
        new_alive = (
            _induced(alive)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=True)
        )
        _release_checkpoint(alive)
        alive = new_alive
        counts.append(alive.count())
        if counts[-1] == counts[-2]:
            # the monotone count check already certifies the fixed
            # point — the remaining rounds are provably no-ops (two
            # O(|E|) joins + an agg each), so stop paying for them;
            # output and certificate are exactly what the full loop
            # would produce
            break
    converged = counts[-1] == counts[-2]
    # LEFT join: a not-yet-converged alive set can contain nodes with
    # ZERO induced degree (a path peels one layer per round and the
    # middle node outlives its neighbors) — they are survivors of the
    # rounds run so far and must surface with degree 0, not vanish
    # (an inner groupBy would silently drop them). A CONVERGED core
    # never has them (every member's degree >= k by definition).
    deg = (
        _induced(alive)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .select(F.col("src").alias("node"), "degree")
    )
    result = (
        alive.join(deg, "node", "left")
        .select("node", F.coalesce(F.col("degree"), F.lit(0)).cast("bigint").alias("degree"))
        .localCheckpoint(eager=True)
    )
    _release_checkpoint(alive)
    _release_checkpoint(e)
    return result.select(
        "node", "degree", F.lit(converged).alias("converged")
    )
