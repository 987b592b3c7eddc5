"""Connected components over an edge DataFrame — the cluster-resolution
step of a near-dup dedup pipeline (near-dup pairs -> clusters ->
canonical representative per cluster).

The reference (scratchdata/ScratchDB) has no graph operator — its query
surface is SQL pass-through (pkg/api/data.go:58-72) — this is a driver
north-star extension (BASELINE.json: dedup at 100 TB scale).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014). Each
half-round is one shuffle (groupBy min + equi-join); the pair converges
in O(log^2 n) rounds on ANY graph shape. The naive alternative —
propagate min labels to neighbors until fixpoint — needs O(diameter)
rounds, which is pathological on chain-shaped duplicate clusters at
scale. Every round the edge set only shrinks toward a star forest, so
shuffle volume decreases monotonically; lineage is truncated with
localCheckpoint per round so the physical plan stays O(1) deep instead
of growing by two joins per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "components_for_pairs"]

#: r15 (VERDICT item 6 — fewer jobs per iteration): pagerank's
#: per-iteration localCheckpoint is NOT lazy under AQE (r14 measured:
#: eager=False still executes at the call), so every iteration ran its
#: own job during plan construction. Checkpoint every K iterations
#: instead: lineage depth stays bounded at K join+agg rounds (the O(1)
#: plan-depth property within a constant) while a short run — the
#: catalog's 3-iteration query — fuses into ONE action that AQE plans
#: jointly. Module-level so tools/r15_ab.py can run both shapes.
_PAGERANK_CKPT_EVERY = 4


def _canonical(e: DataFrame) -> DataFrame:
    """Orient every edge (u, v) as u > v and drop loops/duplicates."""
    return (
        e.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) ∪ {u}).

    Emits (v, m) for each symmetric adjacency (u, v) with v > u, where
    m = min over u's neighborhood including u itself. Result stays
    canonically oriented because v > u >= m.
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v <= u (and u itself) to the min neighbor.

    Input must be canonically oriented (u > v): for each u, with
    m = min of its smaller neighbors, emit (v, m) for all smaller
    neighbors v != m plus (u, m).
    """
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    keep = mins.select(F.col("u"), F.col("m").alias("v"))
    return relink.union(keep).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Return (node BIGINT, component BIGINT): every node that appears
    in `edges` labeled with the minimum node id of its component.

    Nodes with no edges are absent — the caller coalesces isolated
    nodes to themselves (see `components_for_pairs`). `max_rounds` is a
    safety backstop far above the O(log^2 n) bound (30 rounds covers
    any realistic graph; 2^30 nodes would already exceed 100 TB of
    edges).
    """
    e = _canonical(
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    ).localCheckpoint()

    # Convergence: the canonical edge set is unchanged. One cheap
    # distributed checksum instead of a full set-difference join:
    # (count, xor-fold of per-edge hashes — order-independent and,
    # unlike sum, can't overflow under ANSI arithmetic). The previous
    # round's checksum is reused, so each round costs ONE extra job.
    checksum_cols = [
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ]

    def checksum(df: DataFrame) -> tuple:
        row = df.select(*checksum_cols).first()
        return (row["n"], row["h"])

    prev = checksum(e)
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = checksum(e)
        if cur == prev:
            break
        prev = cur

    # At the fixpoint the edge set is a star forest: u -> component min.
    roots = e.select(F.col("v").alias("node")).distinct()
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(roots.select("node", F.col("node").alias("component")))
        .distinct()
    )


def components_for_pairs(
    nodes: DataFrame,
    pairs: DataFrame,
    node_col: str,
    pair_a: str,
    pair_b: str,
) -> DataFrame:
    """Cluster assignment for a full node universe: every node in
    `nodes` gets the min-id of its connected component over `pairs`
    (itself when isolated). Output: (node_col, cluster_id).
    """
    cc = connected_components(pairs, pair_a, pair_b)
    return (
        nodes.select(F.col(node_col).cast("long").alias(node_col))
        .join(cc, F.col(node_col) == F.col("node"), "left")
        .select(
            F.col(node_col),
            F.coalesce(F.col("component"), F.col(node_col)).alias(
                "cluster_id"
            ),
        )
    )


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_e2: int = 85,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """PageRank with EXACT integer arithmetic (ranks in micro-units):
    contribution = r_e6 div deg (floor), summed as BIGINT, then
    r' = 150000 + (damping * sum) div 100. Every operation is integer,
    so the result is bit-identical under any partitioning, engine, or
    AQE decision — and an unrolled-SQL oracle can reproduce it exactly
    (float PageRank sums are order-dependent and cannot be
    hash-compared across engines).

    ``edges`` must be DIRECTED (src, dst) — pass both orientations for
    an undirected graph, which also guarantees no dangling nodes.

    Plan per iteration: join edges->ranks (shuffle on src, or broadcast
    when ranks fit), groupBy dst (one shuffle, map-side combine). Rank
    state is one long per node. This is the standard Pregel-style
    iteration expressed as DataFrame joins; localCheckpoint per
    iteration keeps the plan O(1) deep like connected_components.
    (Public algorithm: Page et al. 1999; integer-scaling determinism
    is this repo's discipline, not reference code.)
    """
    # Loop-invariant prep, persisted once: Spark shares no subtrees
    # across plan branches, so an unpersisted edge list would re-run
    # its upstream (e.g. a fact-table join + distinct) every
    # iteration. Degree is pre-joined INTO the edge frame so each
    # iteration is exactly ONE ranks join + ONE dst agg — no
    # per-iteration deg join, and (because both orientations are
    # required, so every node has inbound edges) no dangling-node
    # left join either. Caller/bench clears the cache.
    edges_deg = (
        edges.join(
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")),
            "src",
        ).persist()
    )
    ranks = (
        edges.select("src")
        .distinct()
        .select("src", F.lit(1_000_000).cast("long").alias("r_e6"))
    )
    # broadcast_ranks: rank state is one long per node, so whenever
    # the node set fits in executor memory (it does for any graph
    # whose rank vector you'd materialize anyway), broadcasting it
    # turns the per-iteration join map-side: the (big) edge list is
    # never re-shuffled after the one-time persist, and the only
    # exchange per iteration carries the partial dst sums. Leave
    # False for graphs whose node count itself is at data scale.
    for i in range(iterations):
        rhs = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = edges_deg.join(rhs, "src").select(
            F.col("dst"), F.expr("r_e6 div deg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("src"),
                (
                    F.lit(150_000).cast("long")
                    + F.expr(f"{damping_e2} * s div 100")
                ).alias("r_e6"),
            )
        )
        # checkpoint every K-th iteration only (see _PAGERANK_CKPT_EVERY):
        # the lineage chain is LINEAR (ranks_i references ranks_{i-1}
        # once), so a K-deep tail is a bounded plan, and skipping the
        # (AQE-eager) checkpoint lets short runs execute as one action.
        if (i + 1) % _PAGERANK_CKPT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("src").alias("node"), "r_e6")


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list —
    (node BIGINT, n_triangles BIGINT), nodes in >= 1 triangle only.

    Algorithm: degree-ordered wedge join (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011,
    public literature). Each undirected edge is oriented from its
    lower-(degree, id) endpoint to the higher one, so every node's
    OUT-degree is bounded by ~sqrt(2m) regardless of how skewed the
    raw degree distribution is — the wedge self-join (the quadratic
    step) fans out per-apex on the oriented degree, never on a hub's
    raw degree. Wedges close into triangles via one equi-join back
    against the canonical edge set; each triangle is found exactly
    once (at its unique (degree, id)-minimal apex). Cost: two
    data-sized shuffles (degree count, wedge join) + one edge-set
    join — no driver state, no iteration. The reference has no graph
    surface (SQL pass-through, pkg/api/data.go:58-72); this is the
    driver's training-pipeline extension (graph stats over
    co-occurrence/link graphs at 100 TB).
    """
    e = _canonical(
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # orient: (deg, id)-smaller endpoint -> larger; total order, so
    # the orientation is acyclic and deterministic
    du = deg.select(F.col("u").alias("__au"), F.col("deg").alias("__da"))
    dv = deg.select(F.col("u").alias("__bu"), F.col("deg").alias("__db"))
    lower_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, F.col("u") == F.col("__au"))
        .join(dv, F.col("v") == F.col("__bu"))
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = o1.join(o2, "a").filter(F.col("x") < F.col("y"))
    tri = wedges.join(
        e,
        # _canonical orients u > v
        (F.col("u") == F.greatest("x", "y"))
        & (F.col("v") == F.least("x", "y")),
    ).select("a", "x", "y")
    corners = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("x").alias("node")))
        .union(tri.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def cooccurrence_edges(
    occurrences: DataFrame,
    node_col: str,
    cell_cols: list[str],
    max_cell_nodes: int | None = 10_000,
) -> DataFrame:
    """Undirected co-occurrence edges: (u, v) with u < v for every
    pair of distinct nodes sharing a cell (same values of
    `cell_cols`) — the standard construction of co-purchase /
    co-click / co-citation graphs.

    A cell of c nodes emits c*(c-1)/2 pairs — QUADRATIC PER CELL by
    definition, not by implementation. A single viral cell (one hot
    item-day) dominates the whole job at scale: the round-8 10x
    rehearsal measured a 9,400x shuffle blowup when replication
    accidentally made every cell 10x denser (r8c_rehearsal.json,
    PERF.md). So the same contract as the dedup family's exact
    baselines: `refuse_hot_groups` probes the hottest cell (one
    map-side-combined count, linear) and fails loudly above
    `max_cell_nodes` — at scale you cap, sample, or TF-IDF-weight
    hot cells EXPLICITLY instead of discovering them as a 25 GB
    straggler shuffle. Pass None to opt out.
    """
    from .guards import refuse_hot_groups

    occ = occurrences.select(
        F.col(node_col).alias("__n"), *cell_cols
    ).distinct()
    refuse_hot_groups(
        occ, list(cell_cols), max_cell_nodes,
        "cooccurrence_edges",
        "a per-cell cap/sample or TF-IDF cell weighting",
    )
    b = occ.select(
        F.col("__n").alias("__m"),
        *[F.col(c).alias(f"__c_{c}") for c in cell_cols],
    )
    cond = F.col("__n") < F.col("__m")
    for c in cell_cols:
        cond = cond & (F.col(c) == F.col(f"__c_{c}"))
    return (
        occ.join(b, cond)
        .select(F.col("__n").alias("u"), F.col("__m").alias("v"))
        .distinct()
    )
