"""Graph analytics: weighted PageRank by power iteration.

Third member of the engine's iterative family (connected components =
fixpoint label propagation in plans/extended.py, k-means = Lloyd
rounds in plans/kmeans.py, PageRank = damped power iteration here),
value-checked across iteration boundaries with the same discipline:
round the per-round state to 6 dp so both engines agree on the exact
doubles entering the next round.

The graph: nation→nation trade edges weighted by order volume
(supplier's nation ships to customer's nation — the q7 trade
relationship as an adjacency list). 25 nodes at any SF, but the PLAN
SHAPE is the distributed one: each round is one edge-keyed join
(contributions = pr[src]·w/out_w[src]) plus one dst-keyed aggregate —
exactly what a billion-edge PageRank runs per round on a cluster,
where rank state stays partitioned by node id and only (node, rank)
pairs shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from compendium_spark.functions.numeric import quantize6
from compendium_spark.localframe import local_df
from compendium_spark.plans.registry import plan
from compendium_spark.tables import load, maybe_broadcast

DAMPING = 0.85
N_ROUNDS = 2

_EDGES_SQL = """
  SELECT sn.n_name AS src, cn.n_name AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  WHERE sn.n_name <> cn.n_name
  GROUP BY sn.n_name, cn.n_name
"""

PAGERANK_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
nodes AS (SELECT n_name AS node FROM nation),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes),
c1 AS (
  SELECT e.dst AS node, SUM(p.pr * e.w / o.ow) AS contrib
  FROM edges e JOIN pr0 p ON e.src = p.node JOIN outw o ON e.src = o.src
  GROUP BY e.dst
),
pr1 AS (
  SELECT n.node,
         CAST(FLOOR(CAST(((1 - {DAMPING}) / (SELECT n FROM nn)
               + {DAMPING} * COALESCE(c1.contrib, 0)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS pr
  FROM nodes n LEFT JOIN c1 ON n.node = c1.node
),
c2 AS (
  SELECT e.dst AS node, SUM(p.pr * e.w / o.ow) AS contrib
  FROM edges e JOIN pr1 p ON e.src = p.node JOIN outw o ON e.src = o.src
  GROUP BY e.dst
),
pr2 AS (
  SELECT n.node,
         CAST(FLOOR(CAST(((1 - {DAMPING}) / (SELECT n FROM nn)
               + {DAMPING} * COALESCE(c2.contrib, 0)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS pr
  FROM nodes n LEFT JOIN c2 ON n.node = c2.node
)
SELECT node, pr FROM pr2 ORDER BY pr DESC, node
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    supp = maybe_broadcast(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = maybe_broadcast(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = maybe_broadcast(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            nation.select(
                F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")
            ),
            F.col("s_nationkey") == F.col("sk"),
        )
        .join(
            nation.select(
                F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")
            ),
            F.col("c_nationkey") == F.col("ck"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


@plan("graph_pagerank", oracle=PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{N_ROUNDS} damped power-iteration rounds of weighted PageRank
    over the nation trade graph — see module docstring. Per round: one
    edge⋈rank join + one dst aggregate; rank state is rounded to 6 dp
    between rounds for cross-engine parity (same discipline as
    cluster_kmeans' centroid update)."""
    # lazy for the same reason as graph_triangle_count: plan
    # construction must not trigger a Spark job
    edges = _trade_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = load(spark, sf_dir, "nation").select(F.col("n_name").alias("node"))
    n = nodes.count()  # 25 at every SF (constant dim of the graph)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(N_ROUNDS):
        # rank state, out-weights and per-round contributions are all
        # node-dimension frames — bounded by the nation dim (25 rows at
        # EVERY SF, 100 TB included), the canonical broadcast side
        # (guide §3.1). Unhinted, each reference planned a shuffle
        # exchange pair and AQE ran every tiny stage as its own job:
        # 27 driver-blocking jobs for 0.7 CPU-s of work. Broadcast,
        # each round's only exchange is the dst aggregate — the
        # billion-EDGE shape of the module docstring is unchanged
        # (edges stay partitioned; only (node, rank) broadcasts).
        bpr = F.broadcast(pr)
        contrib = (
            edges.join(bpr, edges.src == bpr["node"])
            .join(F.broadcast(outw), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") * F.col("w") / F.col("ow")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = nodes.join(F.broadcast(contrib), "node", "left").select(
            "node",
            quantize6(F.lit((1 - DAMPING) / n)
                + DAMPING * F.coalesce("contrib", F.lit(0.0))).alias("pr"),
        )
    return pr.orderBy(F.desc("pr"), "node")


TRIANGLE_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
member AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, COUNT(*) AS n_triangles
FROM member
GROUP BY node
ORDER BY node
"""


@plan("graph_triangle_count", oracle=TRIANGLE_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count over the undirected trade graph.

    Canonical-orientation triangle enumeration: orient every edge
    low→high (a < b), then each triangle {a<b<c} is found exactly once
    as e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) — two equi-joins, no candidate
    ever counted twice, no DISTINCT over triangles. At billion-edge
    scale the same shape holds with one refinement: orient by
    (degree, id) instead of id alone, so every node's out-list is
    O(sqrt(edges)) even for celebrity nodes and the e1⋈e2 wedge join
    cannot blow up on a hub (the standard compact-forward algorithm).
    Only (node, node) string pairs shuffle. All-integer math.
    """
    edges = _trade_edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        # reused 3x; lazy checkpoint so merely BUILDING the plan
        # (explain/plan-shape tooling) stays job-free — lineage is
        # truncated at first materialization, not at construction
        .localCheckpoint(eager=False)
    )
    e2 = und.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    # the undirected nation graph is bounded by the nation dim
    # (≤ 25·24/2 edges at every SF): broadcast the wedge/closure
    # probe sides so the triangle joins are map-side (guide §3.1) —
    # at billion-edge scale the compact-forward orientation in the
    # docstring is the shape, and there the probe side is the
    # O(sqrt(edges))-capped out-lists, not a broadcast.
    tri = (
        und.join(F.broadcast(e2), F.col("b") == F.col("b2"))
        .join(F.broadcast(e3), (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    member = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return (
        member.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# common-neighbor link prediction
# ---------------------------------------------------------------------------

# sparsification: keep each nation's TOP-K out-edges by trade volume.
# The raw 25-nation trade graph is near-complete, so "non-adjacent
# pairs sharing a neighbor" is the empty set and a common-neighbor
# plan over it verifies nothing; the k-NN-graph sparsification is also
# the realistic input for link prediction (you predict over the
# strong-tie graph, not the everyone-touches-everyone one).
CN_TOPK_OUT = 3
# per-wedge-center neighbor-list cap: a center of degree d contributes
# d·(d−1)/2 pairs to the wedge join, which on a power-law graph is the
# textbook skew bomb. Cap every center's member list at the CAP
# lowest-(degree, id) members — low-degree members are the informative
# ones for common-neighbor evidence (a hub is everyone's neighbor), so
# the documented bias drops the least-informative wedges first. Both
# engines apply the identical rule, so parity holds even when the cap
# binds; tests/test_graph_cap.py proves the per-center pair bound on a
# synthetic hub.
CN_CENTER_CAP = 16

# shared CTE prefix: sparsified undirected trade graph + degree table
# + hub-capped per-center adjacency (reused by graph_2hop_features)
_CN_GRAPH_CTES = f"""edges AS ({_EDGES_SQL}),
sparse AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM edges
  ) r WHERE rn <= {CN_TOPK_OUT}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM sparse
),
nbr AS (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL SELECT b, a FROM und
),
deg AS (SELECT node, COUNT(*) AS d FROM nbr GROUP BY node),
capped AS (
  SELECT center, member FROM (
    SELECT n.nbr AS center, n.node AS member,
           ROW_NUMBER() OVER (PARTITION BY n.nbr ORDER BY d.d, n.node) AS rn
    FROM nbr n JOIN deg d ON d.node = n.node
  ) c WHERE rn <= {CN_CENTER_CAP}
)"""

CN_SQL = f"""
WITH {_CN_GRAPH_CTES},
wedge AS (
  SELECT c1.member AS x, c2.member AS y, COUNT(*) AS cn
  FROM capped c1 JOIN capped c2
    ON c1.center = c2.center AND c1.member < c2.member
  GROUP BY c1.member, c2.member
),
cand AS (
  SELECT w.x, w.y, w.cn FROM wedge w
  WHERE NOT EXISTS (
    SELECT 1 FROM und u WHERE u.a = w.x AND u.b = w.y
  )
)
SELECT c.x, c.y, c.cn,
       CAST(FLOOR(CAST((CAST(c.cn AS DOUBLE) / (dx.d + dy.d - c.cn)) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS jaccard
FROM cand c
JOIN deg dx ON dx.node = c.x
JOIN deg dy ON dy.node = c.y
ORDER BY c.x, c.y
"""


def _sparse_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected top-{CN_TOPK_OUT}-out-edges trade graph (lazy
    checkpoint — reused across the wedge-family joins), shared by
    graph_common_neighbors and graph_2hop_features."""
    topk = Window.partitionBy("src").orderBy(F.desc("w"), "dst")
    sparse = (
        _trade_edges(spark, sf_dir)
        .withColumn("rn", F.row_number().over(topk))
        .filter(F.col("rn") <= CN_TOPK_OUT)
        .select("src", "dst")
    )
    return (
        sparse.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


def neighbor_tables(und: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(nbr, deg) for an undirected edge frame (a, b): the symmetric
    (node, nbr) adjacency and the (node, d) degree table — shared by
    every wedge-family plan so the union+aggregate has ONE definition
    and is built once per plan."""
    nbr = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    return nbr, deg


def capped_neighbor_lists(
    und: DataFrame,
    cap: int,
    nbr: DataFrame | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """(center, member) adjacency with every center's member list
    capped at the ``cap`` lowest-(degree, id) members — the skew guard
    for wedge self-joins (a center of degree d otherwise emits d²/2
    pairs). Deterministic: (d, member) is a total order within a
    center. Callers that already built nbr/deg (neighbor_tables) pass
    them in so the union+aggregate isn't re-derived. Returns columns
    (center, member)."""
    if nbr is None or deg is None:
        nbr, deg = neighbor_tables(und)
    w = Window.partitionBy("center").orderBy("d", "member")
    # deg is a node-dimension frame (guide §3.1: broadcast the side
    # that fits — here bounded by the nation dim at every SF)
    return (
        nbr.select(F.col("nbr").alias("center"), F.col("node").alias("member"))
        .join(F.broadcast(deg.withColumnRenamed("node", "member")), "member")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("center", "member")
    )


@plan("graph_common_neighbors", oracle=CN_SQL)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common neighbors: every NON-adjacent node
    pair of the top-{CN_TOPK_OUT} trade graph that shares at least one
    neighbor, scored by common-neighbor count and neighborhood Jaccard
    cn / (deg_x + deg_y − cn) — the classic similarity features behind
    friend-of-friend and related-entity suggestions.

    Shape: top-k-per-src sparsification (one window over the edge
    aggregate), then a wedge self-join keyed on the SHARED NEIGHBOR
    where each center's member list is CAPPED at {CN_CENTER_CAP}
    lowest-(degree, id) members (capped_neighbor_lists) so a celebrity
    hub contributes at most CAP²/2 pairs instead of deg²/2 — the same
    skew discipline as graph_triangle_count's orientation, here as an
    explicit budget with a documented bias. A count aggregate, an
    anti-join against existing edges, and two broadcast degree lookups
    finish it; only (node, node) pairs ever shuffle. Jaccard is one
    integer division, FLOOR-quantized.
    """
    und = _sparse_und(spark, sf_dir)
    nbr, deg = neighbor_tables(und)
    capped = capped_neighbor_lists(und, CN_CENTER_CAP, nbr=nbr, deg=deg)
    c2 = capped.select(
        F.col("center").alias("center2"), F.col("member").alias("y")
    )
    # capped adjacency and the undirected edge list are bounded by
    # nodes×CAP and the nation dim respectively (constant at every
    # SF): broadcast the probe sides (guide §3.1) so only the wedge
    # aggregate exchanges.
    wedge = (
        capped.join(
            F.broadcast(c2),
            (F.col("center") == F.col("center2"))
            & (F.col("member") < F.col("y")),
        )
        .groupBy(F.col("member").alias("x"), "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    cand = wedge.join(
        F.broadcast(und),
        (wedge["x"] == und["a"]) & (wedge["y"] == und["b"]),
        "left_anti",
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    return (
        cand.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            "x",
            "y",
            "cn",
            quantize6(
                F.col("cn").cast("double")
                / (F.col("dx") + F.col("dy") - F.col("cn"))
            ).alias("jaccard"),
        )
        .orderBy("x", "y")
    )


# the o6_skew_report decision rule, specialized to the wedge join's
# shuffle key (the wedge center). skew_ratio = max_deg·n_nodes/Σdeg is
# exactly o6's hot-key ratio (max key rows ÷ mean key rows); above the
# threshold a hot center dominates one task with deg²/2 pairs and the
# CAP must be applied (or the center split/salted). The threshold is
# the measured point where one task's pair count exceeds ~16× the
# mean — same alarm level the a11/j12 salting story uses.
WEDGE_SKEW_THRESHOLD = 4.0


def wedge_cap_decision(
    und: DataFrame, budget: int = CN_CENTER_CAP
) -> tuple[float, int | None]:
    """Pre-flight skew check for a wedge self-join over undirected
    edges (a, b): returns (skew_ratio, cap) where cap is ``budget``
    when the center-degree distribution is hot (ratio >
    WEDGE_SKEW_THRESHOLD) and None (uncapped — the join is naturally
    balanced) otherwise. One aggregate pass + a 1-row collect; at
    100 TB this runs on the (node, degree) aggregate you need anyway.
    graph_common_neighbors applies the cap unconditionally so its
    output is deterministic; a production pipeline calls this first
    and skips the cap's bias when the graph is near-regular."""
    nbr = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    row = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("total"),
        F.max("d").alias("mx"),
    ).collect()[0]
    ratio = float(row["mx"] * row["n"]) / float(row["total"])
    return ratio, (budget if ratio > WEDGE_SKEW_THRESHOLD else None)


# ---------------------------------------------------------------------------
# 2-hop neighborhood features
# ---------------------------------------------------------------------------

TWOHOP_SQL = f"""
WITH {_CN_GRAPH_CTES},
twohop AS (
  SELECT n1.node AS x, c.member AS y
  FROM nbr n1 JOIN capped c ON c.center = n1.nbr
  WHERE c.member <> n1.node
),
fresh AS (
  SELECT DISTINCT t.x, t.y FROM twohop t
  WHERE NOT EXISTS (SELECT 1 FROM nbr n WHERE n.node = t.x AND n.nbr = t.y)
)
SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS n_2hop
FROM fresh GROUP BY x ORDER BY node
"""


@plan("graph_2hop_features", oracle=TWOHOP_SQL)
def graph_2hop_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood size per node — the expansion feature behind
    friend-of-friend reach, influence estimates and GNN receptive-
    field sizing: how many DISTINCT nodes sit at exactly distance 2
    (reachable through a neighbor, not adjacent, not self).

    The second hop traverses the HUB-CAPPED adjacency
    (capped_neighbor_lists, same {CN_CENTER_CAP} budget and documented
    bias as graph_common_neighbors): hop-2 is where a celebrity node
    multiplies the frontier by its full degree, so the cap is applied
    exactly there; hop-1 stays exact. One join per hop, a distinct on
    (x, y) pairs, one anti-join against direct edges, one count —
    only node-pair rows ever shuffle."""
    und = _sparse_und(spark, sf_dir)
    nbr, deg = neighbor_tables(und)
    capped = capped_neighbor_lists(und, CN_CENTER_CAP, nbr=nbr, deg=deg)
    # hub-capped adjacency and the direct-edge probe are bounded by
    # nodes×CAP / the nation dim (constant at every SF): broadcast
    # them (guide §3.1) so only the distinct and the final count
    # exchange.
    twohop = (
        nbr.join(F.broadcast(capped), nbr["nbr"] == capped["center"])
        .filter(F.col("member") != F.col("node"))
        .select(F.col("node").alias("x"), F.col("member").alias("y"))
    )
    direct = nbr.select(F.col("node").alias("x"), F.col("nbr").alias("y"))
    fresh = twohop.distinct().join(F.broadcast(direct), ["x", "y"], "left_anti")
    return (
        fresh.groupBy(F.col("x").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_2hop"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# graph_kcore — coreness by iterative peeling
# ---------------------------------------------------------------------------

# k-core decomposition (Seidman 1983; the distributed form is
# Montresor et al.'s iterative peel): repeatedly remove nodes of
# degree < k until none remain — the standard density/robustness
# screen a graph pipeline runs before community detection, and the
# prune an ANN-graph maintainer applies to weakly-connected vectors.
# Coreness(v) = the largest k whose k-core contains v.
#
# Round 10 (ADVICE r9 #1, confirmed live): the previous fixed 6-round
# unroll did NOT reach the fixpoint at sf0.1 — the k=4 cascade there
# is 7 removals deep, so both engines shipped identical-but-wrong
# coreness that the parity gate could never catch. Peel depth is a
# DATA property (bounded only by the removal-cascade length), so the
# Spark side now iterates to the observed fixpoint (one bounded
# driver count per round — Montresor's actual termination rule),
# while the DuckDB oracle, which cannot express a fixpoint loop
# (no recursive-CTE fixpoint semantics in 1.0), unrolls to a generous
# KCORE_SQL_ROUNDS: extra rounds on a converged edge list are no-ops,
# so the oracle equals the fixpoint whenever the true depth ≤ the
# unroll — asserted against a pandas-replicated fixpoint at sf0.001 /
# 0.01 / 0.1 in tests (test_r9b_plans.py, test_r10_plans.py).
KCORE_MAX_K = 4
KCORE_SQL_ROUNDS = 16  # oracle unroll; measured cascade ≤ 7 at sf0.1
KCORE_SPARK_ROUND_CAP = 64  # runaway guard for the fixpoint loop


def _kcore_rounds(k: int) -> int:
    """Oracle unroll depth: k=1 PROVABLY converges in one round
    (peeling an isolated node cannot drop any other node's degree);
    higher ks can cascade, so they get the full unroll."""
    return 1 if k == 1 else KCORE_SQL_ROUNDS


def _kcore_sql() -> str:
    parts = [f"""WITH {_CN_GRAPH_CTES},
nodes AS (SELECT DISTINCT node FROM nbr)"""]
    prev_e = "und"
    survivor_cte = []
    for k in range(1, KCORE_MAX_K + 1):
        # WARM START: the k-core of G equals the k-core of the
        # (k-1)-core of G (cores are nested), so each k peels the
        # previous k's converged edge list, not the full graph
        for r in range(1, _kcore_rounds(k) + 1):
            parts.append(f""",
d_{k}_{r} AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM {prev_e} UNION ALL SELECT b FROM {prev_e}
  ) GROUP BY node
),
s_{k}_{r} AS MATERIALIZED (SELECT node FROM d_{k}_{r} WHERE deg >= {k}),
e_{k}_{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev_e} e
  JOIN s_{k}_{r} sa ON e.a = sa.node
  JOIN s_{k}_{r} sb ON e.b = sb.node
)""")
            prev_e = f"e_{k}_{r}"
        survivor_cte.append(f"SELECT node FROM s_{k}_{_kcore_rounds(k)}")
    union = " UNION ALL ".join(survivor_cte)
    parts.append(f""",
surv AS ({union}),
core AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS coreness
         FROM surv GROUP BY node)
SELECT n.node, CAST(COALESCE(c.coreness, 0) AS BIGINT) AS coreness
FROM nodes n LEFT JOIN core c ON n.node = c.node
ORDER BY coreness DESC, n.node
""")
    return "".join(parts)


@plan("graph_kcore", oracle=_kcore_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the sparsified trade graph: coreness(v)
    = the largest k (≤ KCORE_MAX_K) such that v survives iterative
    peeling of all degree-<k nodes — Seidman's density measure, the
    screen community detection and ANN-graph pruning run first. Cores
    are NESTED, which buys two structural wins: coreness = the count
    of k-sweeps survived (one union + count, no per-k join chain),
    and each k WARM-STARTS from the previous k's converged edge list
    (the k-core of G equals the k-core of its (k-1)-core), so later
    sweeps peel already-shrunk graphs and round counts stay small.

    Shape: per (k, round) one degree aggregation over the surviving
    edge list and one semi-join filter — each round is a keyed
    groupBy + two joins on the (shrinking) edge list, never anything
    quadratic. The Spark side iterates each k TO THE FIXPOINT: a
    round whose edge count is unchanged removed nothing (the filter
    can only shrink), so that k's peel is converged — one bounded
    driver-side count per round, which Montresor's algorithm needs
    anyway as its termination vote. The oracle unrolls to
    KCORE_SQL_ROUNDS instead (module comment); equality of the two
    at the fixpoint is pinned at three SFs in tests. Each round's
    edge frame is EAGERLY checkpointed: every round references the
    previous frame three times, so skipping the barrier re-executes
    that subtree thrice (measured 8.3 s vs 5.4 s in the unrolled r9
    form) and an unbarriered loop accumulates exponential lineage
    (planning alone times out). At scale the peel is the textbook
    distributed k-core: rounds bounded by the removal-cascade depth,
    state = the surviving edge list, all integer."""
    und = _sparse_und(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select("b"))
        .distinct()
    )
    # k=1 is a PROVABLE no-op peel: every endpoint of a surviving edge
    # has degree >= 1 by construction, so its converged survivor set is
    # exactly the distinct endpoints — `nodes` — and the edge list is
    # unchanged. Starting the sweep at k=2 saves one full
    # degree+join+checkpoint round (r14; measured 0.34 s/round at
    # sf0.1) without touching any value: coreness still counts k=1
    # survival via the appended `nodes` frame.
    survivors = [nodes]
    e = und
    for k in range(2, KCORE_MAX_K + 1):
        for _ in range(KCORE_SPARK_ROUND_CAP):
            # r15: the round's ONLY job is the degree collect. The
            # degree table is node-dimension (nation-bounded at every
            # SF — the same boundedness argument the r14 broadcasts
            # stated), so collecting it is bounded driver work, and it
            # doubles as (a) the convergence vote — no endpoint
            # dropped ⟺ the peel filter keeps every edge ⟺ the old
            # n2 == n_edges count — and (b) the survivor-id literal
            # for the peel filter. The r14 shape spent ~3 extra stage
            # jobs per round materializing two broadcast probes and a
            # separate convergence count (53 jobs / 0.6 CPU-s / 46 KB
            # shuffle profiled — pure job-floor); survivor selection
            # over ≤nation-dim rows is driver arithmetic, while the
            # degree aggregation — the per-round DATA work — stays
            # distributed. The collect also materializes the previous
            # round's lazy checkpoint, preserving the round barrier
            # the module docstring requires (bounded lineage).
            rows = (
                e.select(F.col("a").alias("node"))
                .unionAll(e.select(F.col("b").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).cast("long").alias("deg"))
                .collect()
            )
            s_ids = sorted(str(r.node) for r in rows if r.deg >= k)
            if len(s_ids) == len(rows):
                break  # converged: nothing peeled, e unchanged
            if s_ids:
                keep = F.col("a").isin(s_ids) & F.col("b").isin(s_ids)
            else:  # every node peeled at once — empty k-core
                keep = F.lit(False)
            e = (
                e.filter(keep)
                .select("a", "b")
                .localCheckpoint(eager=False)
            )
        else:  # pragma: no cover — data would need a >cap cascade
            raise RuntimeError(
                f"k-core peel exceeded {KCORE_SPARK_ROUND_CAP} rounds at k={k}"
            )
        survivors.append(
            local_df(spark, [(n,) for n in s_ids], "node string")
        )
    surv = survivors[0]
    for frame in survivors[1:]:
        surv = surv.unionAll(frame)
    core = surv.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("coreness")
    )
    return (
        nodes.join(F.broadcast(core), "node", "left")
        .select(
            "node",
            F.coalesce("coreness", F.lit(0)).cast("long").alias("coreness"),
        )
        .orderBy(F.desc("coreness"), "node")
    )
