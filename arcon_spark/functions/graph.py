"""Iterative graph algorithms on DataFrames.

The reference has no graph processing (and structurally cannot join two
streams — SURVEY.md §2.9, dfg.rs:61-114 builds linear chains only);
together with dedup.dedup_connected_clusters this module demonstrates
the driver-loop-of-joins pattern every distributed graph algorithm on
Spark uses: the loop lives in Python; each iteration is one shuffled
join+aggregate whose lineage is cut by persist/checkpoint.

Determinism across engines: ranks are integer fixed-point (1e9 units)
and every step uses integer division with explicit rounding-free
truncation — the same value sequence in any execution order, in Spark
and DuckDB. (True float PageRank sums are order-dependent and would
never hash-match.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcon_spark.io import load_table
from arcon_spark.plans.registry import register

_UNIT = 1_000_000_000  # rank fixed-point scale
_TELEPORT = 150_000_000  # 0.15 in units
_DAMP = 850_000_000  # 0.85 in units
_ITERS = 5

# per-edge contribution of source u with rank r and out-degree d, all
# integer ops: (0.85 * (r div d)) div 1  —  multiply stays < 2^63 while
# ranks stay O(n_nodes * UNIT); see docstring caveat for huge graphs
_CONTRIB = f"({_DAMP} * (rank div outdeg)) div {_UNIT}"
_SQL_CONTRIB = f"({_DAMP} * (r.rank // d.outdeg)) // {_UNIT}"


def _sql_iterations() -> str:
    parts = []
    prev = "r0"
    for k in range(1, _ITERS + 1):
        parts.append(
            f"""c{k} AS MATERIALIZED (
      SELECT e.dst AS node, SUM({_SQL_CONTRIB}) AS s
      FROM edges e JOIN {prev} r ON r.node = e.src
                   JOIN deg d ON d.node = e.src
      GROUP BY e.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node, {_TELEPORT} + COALESCE(c.s, 0) AS rank
      FROM nodes n LEFT JOIN c{k} c ON c.node = n.node
    )"""
        )
        prev = f"r{k}"
    return ",\n    ".join(parts)


@register(
    "pagerank_trade_network",
    oracle=f"""
    WITH flows AS MATERIALIZED (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
    ),
    edges AS MATERIALIZED (SELECT src, dst FROM flows),
    nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
    deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    r0 AS MATERIALIZED (SELECT node, CAST({_UNIT} AS BIGINT) AS rank FROM nodes),
    {_sql_iterations()}
    SELECT node AS nationkey, CAST(rank AS BIGINT) AS pagerank_units
    FROM r{_ITERS}
    """,
    tags=("graph", "iterative", "pagerank"),
)
def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade network (edge sn→cn when
    any lineitem flows from a supplier in sn to a customer in cn;
    self-trade excluded). Five fixed iterations of the integer
    fixed-point recurrence

        R'(v) = 0.15 + sum over u→v of 0.85 · (R(u) div outdeg(u))
        [1e9 units]

    Spark side: the canonical distributed-PageRank loop — the edge
    frame (already shuffled by src) is persisted once; each iteration
    is one join on src + one aggregate on dst; the driver only steers.
    The oracle unrolls the same iterations as chained CTEs.

    Scale: at web-graph sizes swap nation ids for 64-bit node ids and
    persist→checkpoint every few rounds (same loop; lineage cut).
    Integer overflow bound: per-edge product is 0.85e9 · R(u), safe
    while ranks stay below ~1e10 units (holds for any graph whose max
    in-degree · avg-rank is bounded — switch the contribution column
    to decimal(38,0) past that)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
        .persist()
    )
    deg = edges.groupBy(F.col("src").alias("dnode")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    edges_deg = edges.join(deg, edges.src == F.col("dnode")).select(
        "src", "dst", "outdeg"
    ).persist()
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    ranks = nodes.select("node", F.lit(_UNIT).cast("long").alias("rank"))
    for _ in range(_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(F.col("dst"), F.expr(_CONTRIB).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left_outer")
            .select(
                "node",
                (F.lit(_TELEPORT) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)  # flat ~|V|-row frame per round, as in
            # BFS/SSSP: cuts the unrolled-iteration lineage so the final plan
            # is one scan of the checkpointed ranks (driver compile cost and
            # executor-loss recompute stay O(1 round), not O(all rounds))
        )
    edges.unpersist()
    edges_deg.unpersist()
    return ranks.select(
        F.col("node").alias("nationkey"), F.col("rank").alias("pagerank_units")
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH flows AS MATERIALIZED (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM flows
    )
    SELECT (SELECT CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) FROM nation) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    tags=("graph", "triangle"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the undirected nation trade graph. Edges are
    canonically oriented low→high id, so each triangle a<b<c is counted
    exactly once by the two-join wedge closure (e1=(a,b) ⋈ e2=(b,c) ⋈
    e3=(a,c)).

    Scale: id-orientation is the standard trick that bounds the wedge
    join by Σ d_out², with d_out ≤ degree of the HIGHER-degree endpoint
    halved on average; for power-law graphs orient by (degree, id)
    instead — same plan, one extra broadcast of the degree table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    und = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
        # scan leaf: feeds the three wedge-join aliases AND the edge
        # count — persist dedupes work but each branch repeats the
        # 4-table lineage in the audited plan
        .localCheckpoint(eager=True)
    )
    e1 = und.select(F.col("a").alias("a1"), F.col("b").alias("b1"))
    e2 = und.select(F.col("a").alias("a2"), F.col("b").alias("b2"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
    tri = (
        e1.join(e2, F.col("b1") == F.col("a2"))
        .join(e3, (F.col("a3") == F.col("a1")) & (F.col("b3") == F.col("b2")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    n_nodes = (
        load_table(spark, sf_dir, "nation")
        .agg(F.countDistinct("n_nationkey").cast("long").alias("n_nodes"))
    )
    n_edges = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_nodes.join(F.broadcast(n_edges)).join(F.broadcast(tri)).select(
        "n_nodes", "n_edges", "n_triangles"
    )


_BFS_ITERS = 5
_UNREACHED = 999  # distance sentinel (graph diameter ≪ this)


def _bfs_sql_iter(k: int) -> str:
    prev = f"d{k - 1}"
    return f"""d{k} AS MATERIALIZED (
      SELECT n.node, LEAST(d.dist, COALESCE(m.c, {_UNREACHED})) AS dist
      FROM nodes n
        JOIN {prev} d ON d.node = n.node
        LEFT JOIN (SELECT e.dst AS node, MIN(d.dist + 1) AS c
                   FROM edges e JOIN {prev} d ON d.node = e.src
                   GROUP BY e.dst) m ON m.node = n.node
    )"""


@register(
    "graph_bfs_distances",
    oracle=f"""
    WITH flows AS MATERIALIZED (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
    ),
    edges AS MATERIALIZED (SELECT src, dst FROM flows),
    nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
    d0 AS MATERIALIZED (SELECT node, CASE WHEN node = 0 THEN 0 ELSE {_UNREACHED} END AS dist
           FROM nodes),
    {",".join(_bfs_sql_iter(k) for k in range(1, _BFS_ITERS + 1))}
    SELECT node AS nationkey, CAST(dist AS BIGINT) AS dist
    FROM d{_BFS_ITERS}
    """,
    tags=("graph", "iterative", "bfs"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest hop counts (BFS) over the directed nation
    trade graph from nation 0 — driver-loop relaxation rounds with
    per-round lineage cuts; see _graph_bfs_distances_impl for the full
    mechanics, and sql_recursive_reachability for the same reachable
    set computed by the engines' native WITH RECURSIVE."""
    return _graph_bfs_distances_impl(spark, sf_dir)


@register(
    "sql_recursive_reachability",
    oracle="""
    WITH RECURSIVE flows AS MATERIALIZED (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
    ),
    r(node, depth) AS (
      SELECT CAST((SELECT MIN(src) FROM flows) AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT CAST(e.dst AS BIGINT), r.depth + 1
      FROM r JOIN flows e ON e.src = r.node
      WHERE r.depth < 2
    )
    SELECT node, CAST(MIN(depth) AS BIGINT) AS min_depth
    FROM r GROUP BY node
    """,
    tags=("graph", "sql", "recursive_cte", "survey2.9"),
)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE reachability run NATIVELY in both engines — Spark
    4's `WITH RECURSIVE` (UNION ALL bodies, the probe pinned in
    tests/test_spark4_surfaces.py) against DuckDB's, text-identical
    modulo the view source: min hop depth ≤ 2 from the smallest
    trading nation (scalar-subquery seed — robust at every SF) over
    the trade graph. Complements the driver-loop BFS twin
    (graph_bfs_distances): same reachable set, recursion planned by the
    engine instead of the driver — the declarative form a SQL user
    writes. Depth guard bounds the UNION ALL expansion; at 100 TB the
    per-level plan is the same join+filter the loop form runs, chosen
    by Catalyst's recursion operator."""
    edges = _trade_edges(spark, sf_dir)
    view = "trade_edges_rec_tmp"
    edges.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE r(node, depth) AS (
          SELECT CAST((SELECT MIN(src) FROM {view}) AS BIGINT), CAST(0 AS BIGINT)
          UNION ALL
          SELECT CAST(e.dst AS BIGINT), r.depth + 1
          FROM r JOIN {view} e ON e.src = r.node
          WHERE r.depth < 2
        )
        SELECT node, CAST(MIN(depth) AS BIGINT) AS min_depth
        FROM r GROUP BY node
        """
    )


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed nation trade edges (shared by BFS/SSSP/the
    recursive-CTE query)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )


def _graph_bfs_distances_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest hop counts (BFS) over the directed nation
    trade graph from nation 0, {_BFS_ITERS} fixed Bellman-Ford-style
    relaxation rounds: dist'(v) = min(dist(v), min over u→v of
    dist(u)+1), unreachable = {_UNREACHED}. Same driver-loop-of-joins
    pattern as pagerank_trade_network — each round is one join on src +
    one min-aggregate on dst against the persisted edge frame; all
    integer arithmetic, so the round sequence is engine- and
    partition-order-independent (the oracle unrolls identical CTEs).

    Scale: fixed-round relaxation is how Pregel-style BFS runs on
    DataFrames; for unbounded diameters loop until
    `changed.count() == 0` with periodic checkpoints (lineage cut),
    same body."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
        .persist()
    )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    dist = nodes.select(
        "node",
        F.when(F.col("node") == 0, 0).otherwise(_UNREACHED).alias("dist"),
    )
    for _ in range(_BFS_ITERS):
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select("dst", (F.col("dist") + 1).alias("cand"))
            .groupBy("dst")
            .agg(F.min("cand").alias("c"))
        )
        dist = nodes.join(relaxed, nodes.node == relaxed.dst, "left_outer").join(
            dist.select(F.col("node").alias("pnode"), F.col("dist").alias("pdist")),
            F.col("node") == F.col("pnode"),
        ).select(
            "node",
            F.least(F.col("pdist"), F.coalesce(F.col("c"), F.lit(_UNREACHED))).alias(
                "dist"
            ),
        ).localCheckpoint(eager=True)  # flat 25-row frame per round: the
        # plan (and SCALE.md exchange count) stays O(1) in round count
        # instead of compounding a join chain — same lineage hygiene as
        # dedup_connected_clusters
    edges.unpersist()
    return dist.select(
        F.col("node").alias("nationkey"), F.col("dist").cast("long").alias("dist")
    )


# ---------------------------------------------------------------------------
# Label propagation (community detection)
# ---------------------------------------------------------------------------

_LPA_ITERS = 3


def _sql_lpa_iterations() -> str:
    parts = []
    prev = "l0"
    for k in range(1, _LPA_ITERS + 1):
        parts.append(
            f"""v{k} AS MATERIALIZED (
      SELECT u.dst AS node, p.lab, CAST(COUNT(*) AS BIGINT) AS c
      FROM undirected u JOIN {prev} p ON p.node = u.src
      GROUP BY u.dst, p.lab
    ),
    m{k} AS MATERIALIZED (
      SELECT node, lab FROM (
        SELECT node, lab,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
        FROM v{k}) WHERE rn = 1
    ),
    l{k} AS MATERIALIZED (
      SELECT p.node, COALESCE(m.lab, p.lab) AS lab
      FROM {prev} p LEFT JOIN m{k} m ON m.node = p.node
    )"""
        )
        prev = f"l{k}"
    return ",\n    ".join(parts)


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH flows AS MATERIALIZED (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
    ),
    undirected AS MATERIALIZED (
      SELECT src, dst FROM flows
      UNION
      SELECT dst AS src, src AS dst FROM flows
    ),
    nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
    l0 AS MATERIALIZED (SELECT node, CAST(node AS BIGINT) AS lab FROM nodes),
    {_sql_lpa_iterations()}
    SELECT node AS nationkey, lab AS community
    FROM l{_LPA_ITERS}
    """,
    tags=("graph", "iterative", "community"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds) over the undirected
    nation trade network: every node starts as its own community; each
    round it adopts the most frequent label among its neighbours
    (ties → smallest label; isolated nodes keep their own). The
    deterministic argmax (count desc, label asc via row_number) makes
    the synchronous schedule reproducible across engines — the known
    LPA pitfall (random tie-breaking) is exactly what the oracle
    forbids. Spark side is the driver-loop-of-joins pattern shared
    with pagerank: per round one join on src + one (node, lab) count
    + one WindowGroupLimit argmax; edges persisted once. The oracle
    unrolls the same rounds as chained CTEs."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    flows = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )
    undirected = (
        flows.union(flows.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("node"))
        .withColumn("lab", F.col("node").cast("long"))
    )
    rn_w = W.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(_LPA_ITERS):
        votes = (
            undirected.join(
                labels.select(F.col("node").alias("src"), "lab"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(rn_w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("lab").alias("newlab"))
        )
        prev = labels
        # eager checkpoint: materializes this round (labels is consumed
        # twice next round) and truncates lineage; the superseded
        # round's checkpoint blocks are released by the ContextCleaner
        # once dereferenced (GC-bounded, not unpersist-immediate)
        labels = (
            labels.join(winner, "node", "left")
            .select(
                "node", F.coalesce(F.col("newlab"), F.col("lab")).alias("lab")
            )
            .localCheckpoint(eager=True)
        )
        # NOTE: unpersist() only releases CacheManager entries; a
        # localCheckpoint()'ed predecessor's blocks are freed by the
        # ContextCleaner once this frame is dereferenced (GC-bounded
        # retention, one round's blocks at a time)
        prev.unpersist()
    undirected.unpersist()
    return labels.select(
        F.col("node").alias("nationkey"), F.col("lab").alias("community")
    )


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (Bellman-Ford)
# ---------------------------------------------------------------------------

_SSSP_ITERS = 5
_SSSP_INF = 999_999_999  # > any real path cost; diameter * max weight bound


def _sssp_sql_iter(k: int) -> str:
    prev = f"d{k - 1}"
    return f"""d{k} AS MATERIALIZED (
      SELECT n.node, LEAST(d.dist, COALESCE(m.c, {_SSSP_INF})) AS dist
      FROM nodes n
        JOIN {prev} d ON d.node = n.node
        LEFT JOIN (SELECT e.dst AS node, MIN(d.dist + e.w) AS c
                   FROM edges e JOIN {prev} d ON d.node = e.src
                   GROUP BY e.dst) m ON m.node = n.node
    )"""


@register(
    "graph_shortest_path_weighted",
    oracle=f"""
    WITH flows AS MATERIALIZED (
      SELECT s_nationkey AS src, c_nationkey AS dst,
             CAST(MIN(round(l_quantity)) AS BIGINT) AS w
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (SELECT src, dst, w FROM flows),
    nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
    d0 AS MATERIALIZED (SELECT node, CASE WHEN node = 0 THEN 0 ELSE {_SSSP_INF} END AS dist
           FROM nodes),
    {",".join(_sssp_sql_iter(k) for k in range(1, _SSSP_ITERS + 1))}
    SELECT node AS nationkey, CAST(dist AS BIGINT) AS dist
    FROM d{_SSSP_ITERS}
    """,
    tags=("graph", "iterative", "sssp", "weighted"),
)
def graph_shortest_path_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford) from nation
    0 over the trade graph, edge weight = cheapest observed shipment
    quantity on that lane. Generalizes graph_bfs_distances: each of the
    {_SSSP_ITERS} rounds relaxes dist'(v) = min(dist(v), min over u→v
    of dist(u) + w(u,v)). Weights are exact integers (round(l_quantity))
    so every round is engine- and order-independent; the oracle unrolls
    the identical recurrence as CTEs.

    Scale: the edge build is the only full-data pass (MIN-aggregated to
    one row per lane, map-side partial); each round then shuffles the
    node frame — rows = |V|, not |E| — joined against the persisted
    edge list. Negative-weight-free by construction, so {_SSSP_ITERS}
    rounds certify exactness once round k equals round k-1 (for
    unbounded graphs: loop until no dist changed, checkpoint each few
    rounds to cut lineage — same body)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.min(F.round(F.col("l_quantity"))).cast("long").alias("w"))
        .persist()
    )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    dist = nodes.select(
        "node",
        F.when(F.col("node") == 0, F.lit(0).cast("long"))
        .otherwise(F.lit(_SSSP_INF).cast("long"))
        .alias("dist"),
    )
    for _ in range(_SSSP_ITERS):
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select("dst", (F.col("dist") + F.col("w")).alias("cand"))
            .groupBy("dst")
            .agg(F.min("cand").alias("c"))
        )
        dist = (
            nodes.join(relaxed, nodes.node == relaxed.dst, "left_outer")
            .join(
                dist.select(F.col("node").alias("pnode"), F.col("dist").alias("pdist")),
                F.col("node") == F.col("pnode"),
            )
            .select(
                "node",
                F.least(
                    F.col("pdist"), F.coalesce(F.col("c"), F.lit(_SSSP_INF))
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)  # lineage cut per round, as in BFS
        )
    edges.unpersist()
    return dist.select(
        F.col("node").alias("nationkey"), F.col("dist").cast("long").alias("dist")
    )


_KCORE_K = 3
_KCORE_ROUNDS = 5

_KCORE_EDGES_SQL = """
    flows AS MATERIALIZED (
      SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
    ),
    sym AS MATERIALIZED (
      SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst FROM flows
      UNION
      SELECT DISTINCT GREATEST(src, dst) AS src, LEAST(src, dst) AS dst FROM flows
    )"""


def _kcore_sql_rounds() -> str:
    parts = []
    prev = "sym"
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM {prev} GROUP BY src
    ),
    keep{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM {prev} e
      JOIN keep{r} a ON a.node = e.src
      JOIN keep{r} b ON b.node = e.dst
    )"""
        )
        prev = f"e{r}"
    return ",\n    ".join(parts)


@register(
    "graph_kcore",
    oracle=f"""
    WITH {_KCORE_EDGES_SQL},
    {_kcore_sql_rounds()}
    SELECT d.node, d.deg AS core_degree
    FROM (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM e{_KCORE_ROUNDS} GROUP BY src) d
    WHERE d.deg >= {_KCORE_K}
    """,
    tags=("graph", "kcore"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the undirected nation trade graph
    by synchronous peeling: each round recomputes degrees over the
    surviving subgraph and drops nodes with deg < k plus their incident
    edges; 5 rounds reach the fixpoint on this graph (asserted in
    tests/test_integrity.py — a further round removes nothing).

    Scale shape: each round is degree-aggregate + two semi-joins on the
    node key — the same join-loop skeleton as BFS/LPA/SSSP here, so the
    100 TB guidance is shared: persist each round's edge frame, cut
    lineage every few rounds, and stop when `removed == 0` (driver-side
    count on a frame that is one aggregate, not a collect of data).
    Peeling is confluent — any removal order yields THE unique k-core —
    so the synchronous rounds are deterministic and engine-portable;
    the unrolled-CTE oracle mirrors them round for round."""
    flows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey")
        .join(
            F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )
    lo = F.least("src", "dst")
    hi = F.greatest("src", "dst")
    sym = (
        flows.select(lo.alias("src"), hi.alias("dst"))
        .union(flows.select(hi.alias("src"), lo.alias("dst")))
        .distinct()
        .persist()
    )
    edges = sym
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= _KCORE_K).select(F.col("src").alias("node"))
        prev = edges
        # eager checkpoint; the superseded round's blocks are freed by
        # the ContextCleaner once dereferenced (GC-bounded) — without
        # the checkpoint the peel loop compounds lineage per round
        edges = (
            edges.join(F.broadcast(keep).withColumnRenamed("node", "src"), "src")
            .join(F.broadcast(keep).withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        prev.unpersist()
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= _KCORE_K)
    )


@register(
    "graph_link_prediction",
    oracle="""
    WITH pairs AS MATERIALIZED (
      SELECT LEAST(s_nationkey, c_nationkey) AS a,
             GREATEST(s_nationkey, c_nationkey) AS b,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
      GROUP BY 1, 2
    ),
    tot AS MATERIALIZED (SELECT SUM(n) AS total, CAST(COUNT(*) AS BIGINT) AS np FROM pairs),
    strong AS MATERIALIZED (
      SELECT a, b FROM pairs, tot WHERE n * np > total
    ),
    sym AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM strong
      UNION
      SELECT b AS src, a AS dst FROM strong
    ),
    deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src),
    wedge AS MATERIALIZED (
      SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS common
      FROM sym a JOIN sym b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    ),
    nonedge AS MATERIALIZED (
      SELECT w.u, w.v, w.common
      FROM wedge w
      LEFT JOIN sym e ON e.src = w.u AND e.dst = w.v
      WHERE e.src IS NULL
    )
    SELECT n.u, n.v, n.common,
           CAST(n.common AS DOUBLE)
             / CAST(du.deg + dv.deg - n.common AS DOUBLE) AS jaccard
    FROM nonedge n
    JOIN deg du ON du.node = n.u
    JOIN deg dv ON dv.node = n.v
    """,
    tags=("graph", "link_prediction", "similarity"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the STRONG-TIE nation trade graph: nations
    are linked when their pair's distinct-order volume exceeds the
    all-pairs average (an integer-exact cut: n·|pairs| > Σn — the raw
    trade graph is complete at every SF, so scoring needs the
    above-average backbone); for every NON-edge (u,v) of that
    backbone, the common-neighbor count and neighbor-set Jaccard —
    the classic topology-only link-prediction scores (Liben-Nowell &
    Kleinberg) ranking "which strong relationships are missing".

    Plan: wedges (u−w−v paths) come from ONE self-join of the
    symmetric edge list on the middle node — the same wedge join as
    triangle counting, but ANTI-joined against the edge list to keep
    only open wedges. Common counts and degrees are integers; the
    Jaccard division is the single float op. At 100 TB-scale graphs
    the middle-node join is the skew point (celebrity nodes create
    d² wedges): cap or sample high-degree middles (the standard
    wedge-sampling estimator) — here the 25-node graph is exact."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey")
        .join(
            F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .agg(F.countDistinct("o_orderkey").alias("n"))
        .persist()  # feeds the totals scalar AND the strong-edge filter:
        # without this the 3-join countDistinct pipeline runs twice
        # (self-join-branch recompute, MEASURE.md session-5)
    )
    tot = pairs.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("np")
    )
    strong = (
        pairs.join(F.broadcast(tot))
        .filter(F.col("n") * F.col("np") > F.col("total"))
        .select("a", "b")
    )
    sym = (
        strong.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(strong.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # feeds wedges (twice), the anti-join,
        # and degrees: a plain persist dedupes the work but every branch
        # still carries the 6-shuffle backbone lineage in the plan (the
        # executed adaptive plan repeated it ~15x); checkpointing makes the
        # small backbone a scan leaf
    )
    pairs.unpersist()
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    a = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedge = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    nonedge = wedge.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    jac = F.col("common").cast("double") / (
        F.col("du") + F.col("dv") - F.col("common")
    ).cast("double")
    return (
        nonedge.join(F.broadcast(deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))), "u")
        .join(F.broadcast(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))), "v")
        .select("u", "v", "common", jac.alias("jaccard"))
    )


_MOD_SCALE = 1_000_000_000


@register(
    "graph_modularity",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
      SELECT LEAST(s_nationkey, c_nationkey) AS a,
             GREATEST(s_nationkey, c_nationkey) AS b,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
      GROUP BY 1, 2
    ),
    tot AS MATERIALIZED (SELECT SUM(n) AS total, CAST(COUNT(*) AS BIGINT) AS np FROM pairs),
    strong AS MATERIALIZED (SELECT a, b FROM pairs, tot WHERE n * np > total),
    undirected AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM strong
      UNION
      SELECT b AS src, a AS dst FROM strong
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM undirected),
    l0 AS MATERIALIZED (SELECT node, CAST(node AS BIGINT) AS lab FROM nodes),
    {{lpa}},
    labels AS MATERIALIZED (SELECT node, lab FROM l{{iters}}),
    m AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) // 2 AS m FROM undirected),
    internal AS MATERIALIZED (
      SELECT la.lab, CAST(COUNT(*) AS BIGINT) // 2 AS e_c
      FROM undirected u
      JOIN labels la ON la.node = u.src
      JOIN labels lb ON lb.node = u.dst AND lb.lab = la.lab
      GROUP BY la.lab
    ),
    degs AS MATERIALIZED (
      SELECT la.lab, CAST(COUNT(*) AS BIGINT) AS d_c
      FROM undirected u JOIN labels la ON la.node = u.src
      GROUP BY la.lab
    )
    SELECT d.lab AS community,
           CAST((SELECT COUNT(*) FROM labels WHERE lab = d.lab) AS BIGINT) AS n_nodes,
           COALESCE(i.e_c, 0) AS internal_edges,
           d.d_c AS degree_sum,
           CAST((4 * m.m * COALESCE(i.e_c, 0) - d.d_c * d.d_c) * {_MOD_SCALE}
                // (4 * m.m * m.m) AS BIGINT) AS q_units
    FROM degs d LEFT JOIN internal i ON i.lab = d.lab, m
    """.format(lpa=_sql_lpa_iterations(), iters=_LPA_ITERS),
    tags=("graph", "community", "modularity"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA communities on the STRONG-TIE
    trade backbone (the above-average-volume edges of
    graph_link_prediction — the raw trade graph is complete, where
    every partition scores Q=0): per community c, Q_c =
    e_c/m − (D_c/2m)², emitted in integer fixed-point
    ((4m·e_c − D_c²)·10⁹ div 4m²) alongside its raw ingredients
    (node count, internal edges, degree mass). Σ q_units ≈ Q·10⁹ —
    the figure of merit community detection is judged by.

    Plan: LPA reruns its 3 synchronous deterministic rounds on the
    backbone (driver-loop of join+argmax, same skeleton as
    pagerank/kcore); modularity then needs only (a) edges joined to
    labels twice — the same wedge-style equi-join, counting
    label-concordant endpoints — and (b) a per-label degree count.
    All integers until the final fixed-point division; LEFT JOIN
    keeps communities with zero internal edges (possible under
    synchronous LPA label oscillation)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    pairs = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .agg(F.countDistinct("o_orderkey").alias("n"))
        .persist()  # totals scalar + strong-edge filter both read it
    )
    tot = pairs.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("np"))
    strong = (
        pairs.join(F.broadcast(tot))
        .filter(F.col("n") * F.col("np") > F.col("total"))
        .select("a", "b")
    )
    und = (
        strong.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(strong.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # backbone leaf: the LPA loop, internal-
        # edge join, degree count, and m_edges count all read it; persist
        # alone leaves its 6-shuffle lineage in every branch's plan
    )
    pairs.unpersist()
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "lab", F.col("node").cast("long")
    )
    rn_w = W.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(_LPA_ITERS):
        votes = (
            und.join(labels.select(F.col("node").alias("src"), "lab"), "src")
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            votes.withColumn("rn", F.row_number().over(rn_w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("lab").alias("new_lab"))
        )
        prev = labels
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_lab", "lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        prev.unpersist()
    m_edges = und.count() // 2
    la = labels.select(F.col("node").alias("src"), F.col("lab").alias("lab_a"))
    lb = labels.select(F.col("node").alias("dst"), F.col("lab").alias("lab_b"))
    internal = (
        und.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("internal_edges"))
    )
    degs = (
        und.join(F.broadcast(la), "src")
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("degree_sum"))
    )
    sizes = labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    q = F.expr(
        f"cast((4 * {m_edges} * coalesce(internal_edges, 0) - degree_sum * degree_sum)"
        f" * {_MOD_SCALE} div (4 * {m_edges} * {m_edges}) as bigint)"
    )
    return (
        degs.join(internal, "community", "left")
        .join(F.broadcast(sizes), "community")
        .select(
            "community",
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            q.alias("q_units"),
        )
    )


_PPR_SEED = 0


def _ppr_sql_iterations() -> str:
    parts = []
    prev = "r0"
    for k in range(1, _ITERS + 1):
        parts.append(
            f"""c{k} AS MATERIALIZED (
      SELECT e.dst AS node, SUM({_SQL_CONTRIB}) AS s
      FROM edges e JOIN {prev} r ON r.node = e.src
                   JOIN deg d ON d.node = e.src
      GROUP BY e.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CASE WHEN n.node = {_PPR_SEED} THEN {_TELEPORT} ELSE 0 END
               + COALESCE(c.s, 0) AS rank
      FROM nodes n LEFT JOIN c{k} c ON c.node = n.node
    )"""
        )
        prev = f"r{k}"
    return ",\n    ".join(parts)


@register(
    "ppr_from_seed",
    oracle=f"""
    WITH flows AS MATERIALIZED (
      SELECT s_nationkey AS src, c_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
      WHERE s_nationkey <> c_nationkey
      GROUP BY 1, 2
    ),
    edges AS MATERIALIZED (SELECT src, dst FROM flows),
    deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
    r0 AS MATERIALIZED (
      SELECT node,
             CASE WHEN node = {_PPR_SEED} THEN CAST({_UNIT} AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS rank
      FROM nodes
    ),
    {{iters}}
    SELECT node AS nationkey, CAST(rank AS BIGINT) AS ppr_units
    FROM r{_ITERS} WHERE rank > 0
    """.format(iters=_ppr_sql_iterations()),
    tags=("graph", "pagerank", "iterative", "recommendation"),
)
def ppr_from_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seed nation 0: the teleport mass
    returns to THE SEED instead of spreading uniformly, so the
    stationary mass ranks nodes by proximity-weighted reachability
    FROM that seed — the random-walk recommendation primitive
    (who-to-follow, related-items) rather than global importance.
    Same integer fixed-point transition as pagerank_trade_network
    (contributions are floor-divided units, deterministic in any
    execution order and engine); only r0 and the teleport term
    change. Nodes the walk cannot reach stay at exactly 0 and are
    filtered — an exact-zero test that would be meaningless with
    float ranks.

    Scale: identical loop skeleton and costs as the global pagerank;
    at 100 TB batch many seeds at once by adding a seed column to the
    rank frame (the standard multi-source PPR batching)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .select("src", "dst")
        .persist()
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    edges_deg = edges.join(
        deg.withColumnRenamed("node", "src"), "src"
    )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    ranks = nodes.select(
        "node",
        F.when(F.col("node") == _PPR_SEED, F.lit(_UNIT))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(F.col("dst"), F.expr(_CONTRIB).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left_outer")
            .select(
                "node",
                (
                    F.when(F.col("node") == _PPR_SEED, F.lit(_TELEPORT)).otherwise(
                        F.lit(0)
                    )
                    + F.coalesce(F.col("s"), F.lit(0))
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)  # per-round lineage cut, as in BFS
        )
    edges.unpersist()
    return ranks.filter(F.col("rank") > 0).select(
        F.col("node").alias("nationkey"), F.col("rank").alias("ppr_units")
    )
