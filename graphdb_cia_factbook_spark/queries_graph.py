"""Graph operator queries (SURVEY.md §2.9) with DuckDB oracles.

The trade graph is the testdata analog of the reference's
trade_partners edge table (supplier-nation -> customer-nation revenue
flows).  PageRank / ArticleRank run as iterative DataFrame supersteps
on Spark; their oracles are GENERATED SQL -- a 20-step chained CTE
that performs the identical power iteration in DuckDB (one CTE per
superstep, same damping / dangling-mass / share definitions).  Both
sides round to 8 decimals; per-iteration float drift between engines
is ~1e-15 and damping is a contraction, so 8 decimals is stable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.graph import articlerank, build_trade_graph, pagerank
from .operators.relational import dsum
from .registry import register


def _nation_vertex_count(default: int = 25) -> int:
    """|V| of the trade graph = rows of the nation table, read from
    the parquet FOOTER at import time (oracle SQL is generated at
    module import, before any SparkSession exists; a footer read costs
    microseconds and no engine).  The generated fixed-round oracles
    (k-core peel, condensation levels, MIS/coloring rounds, Brandes
    levels) are exact only while rounds >= |V| -- deriving the count
    here means a larger synthetic nation table grows the oracles
    automatically instead of invalidating them (VERDICT round 3 item
    5).  The per-query asserts remain as the backstop for a driver
    running a DIFFERENT sf_dir than the one visible here (nation is
    scale-factor-invariant in TPC-H-style generators, so in practice
    they agree)."""
    import os
    try:
        import pyarrow.parquet as pq
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                                "/root/testdata/sf0.01")
        path = os.path.join(sf_dir, "nation.parquet")
        if os.path.exists(path):
            return max(default,
                       int(pq.ParquetFile(path).metadata.num_rows))
    except Exception:  # noqa: BLE001 -- footer read is best-effort
        pass
    return default


_N_VERTS = _nation_vertex_count()

# Shared edge definition (must mirror operators.graph.build_trade_graph
# exactly: decimal-exact revenue sums, self-loops removed).
EDGES_CTE = """
verts AS MATERIALIZED (SELECT n_name AS id FROM nation),
edges AS MATERIALIZED (
  SELECT sn.n_name AS src, cn.n_name AS dst,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(27,4))) AS DOUBLE) AS amount,
         COUNT(*) AS n_lines
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE sn.n_name != cn.n_name
  GROUP BY sn.n_name, cn.n_name
)"""


def _power_iteration_sql(share_sql: str, out_name: str,
                         damping: float = 0.85, iters: int = 20) -> str:
    """Generate the chained-CTE power iteration.  ``share_sql`` defines
    shares(src, dst, share) = the per-edge fraction of the source's
    rank transferred each superstep."""
    n = "(SELECT CAST(COUNT(*) AS DOUBLE) FROM verts)"
    dangling = ("(SELECT COALESCE(SUM(r.rank), 0) FROM {prev} r WHERE r.id "
                "NOT IN (SELECT src FROM edges))")
    parts = [f"WITH {EDGES_CTE},", share_sql + ",",
             f"r0 AS (SELECT id, 1.0 / {n} AS rank FROM verts)"]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(f""",
r{k} AS MATERIALIZED (
  SELECT v.id,
         (1 - {damping}) / {n}
         + {damping} * (COALESCE(c.contrib, 0)
                        + {dangling.format(prev=prev)} / {n}) AS rank
  FROM verts v
  LEFT JOIN (SELECT s.dst AS id, SUM(r.rank * s.share) AS contrib
             FROM shares s JOIN {prev} r ON s.src = r.id
             GROUP BY s.dst) c ON v.id = c.id
)""")
    parts.append(f"\nSELECT id AS nation, ROUND(rank, 8) AS {out_name} "
                 f"FROM r{iters}")
    return "".join(parts)


UNWEIGHTED_SHARES = """
shares AS MATERIALIZED (
  SELECT src, dst, 1.0 / COUNT(*) OVER (PARTITION BY src) AS share
  FROM edges
)"""

WEIGHTED_SHARES = """
shares AS MATERIALIZED (
  SELECT src, dst, amount / SUM(amount) OVER (PARTITION BY src) AS share
  FROM edges
)"""

ARTICLERANK_SHARES = """
shares AS MATERIALIZED (
  SELECT src, dst,
         1.0 / (COUNT(*) OVER (PARTITION BY src)
                + (SELECT COUNT(*) FROM edges) * 1.0
                  / (SELECT COUNT(*) FROM verts)) AS share
  FROM edges
)"""


@register("g_edge_build", f"""
WITH {EDGES_CTE}
SELECT src, dst, amount, n_lines FROM edges
""")
def g_edge_build(spark, sf):
    """S4/J7 edge construction: the trade_partners analog -- fact
    tables collapse to a nation^2-sized edge list (map-side partial
    agg does the 100-TB heavy lifting)."""
    return build_trade_graph(spark, sf).edges


@register("g_degrees", f"""
WITH {EDGES_CTE}
SELECT v.id,
       COALESCE(o.out_deg, 0) AS out_deg,
       COALESCE(o.out_amount, 0.0) AS out_amount,
       COALESCE(i.in_deg, 0) AS in_deg,
       COALESCE(i.in_amount, 0.0) AS in_amount
FROM verts v
LEFT JOIN (SELECT src, COUNT(*) AS out_deg,
                  CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                    AS out_amount
           FROM edges GROUP BY src) o ON v.id = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS in_deg,
                  CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                    AS in_amount
           FROM edges GROUP BY dst) i ON v.id = i.dst
""")
def g_degrees(spark, sf):
    """A5/G-degrees: weighted in/out degrees per vertex
    (country totals, preprocess_upload_neo4j.py:194-201)."""
    return build_trade_graph(spark, sf).hold().degrees()


@register("g_trade_rank", f"""
WITH {EDGES_CTE}
SELECT src, dst, amount,
       RANK() OVER (PARTITION BY src ORDER BY amount DESC)
         AS export_trade_rank,
       RANK() OVER (PARTITION BY dst ORDER BY amount DESC)
         AS import_trade_rank
FROM edges
""")
def g_trade_rank(spark, sf):
    """W1 on the graph: export/import trade ranks
    (preprocess_upload_neo4j.py:184-185)."""
    edges = build_trade_graph(spark, sf).edges
    return (edges
            .withColumn("export_trade_rank", F.rank().over(
                Window.partitionBy("src").orderBy(F.desc("amount"))))
            .withColumn("import_trade_rank", F.rank().over(
                Window.partitionBy("dst").orderBy(F.desc("amount"))))
            .select("src", "dst", "amount",
                    "export_trade_rank", "import_trade_rank"))


@register("g_top_partner", f"""
WITH {EDGES_CTE}
SELECT src, dst AS top_partner, amount
FROM (SELECT src, dst, amount,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY amount DESC, dst) AS rn
      FROM edges)
WHERE rn = 1
""")
def g_top_partner(spark, sf):
    """The README flagship sub-query: each nation's #1 export partner
    (top-1-per-key with deterministic tiebreak)."""
    edges = build_trade_graph(spark, sf).edges
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    return (edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("src", F.col("dst").alias("top_partner"), "amount"))


@register("g1_pagerank", _power_iteration_sql(UNWEIGHTED_SHARES, "pagerank"))
def g1_pagerank(spark, sf):
    """G1: PageRank, 20 iterations, damping 0.85, UNWEIGHTED (matches
    the reference's actual GDS invocation -- weights projected but
    unused, preprocess_upload_neo4j.py:406-430)."""
    g = build_trade_graph(spark, sf)
    return (pagerank(g, damping=0.85, max_iter=20, weighted=False)
            .select(F.col("id").alias("nation"),
                    F.round("pagerank", 8).alias("pagerank")))


@register("g1_pagerank_weighted",
          _power_iteration_sql(WEIGHTED_SHARES, "pagerank"))
def g1_pagerank_weighted(spark, sf):
    """G1 variant: amount-weighted PageRank (the rank the reference
    author probably intended when projecting the weight)."""
    g = build_trade_graph(spark, sf)
    return (pagerank(g, damping=0.85, max_iter=20, weighted=True)
            .select(F.col("id").alias("nation"),
                    F.round("pagerank", 8).alias("pagerank")))


@register("g2_articlerank",
          _power_iteration_sql(ARTICLERANK_SHARES, "articlerank"))
def g2_articlerank(spark, sf):
    """G2: ArticleRank with GDS defaults (damping 0.85, 20 iters,
    divisor out_deg + avg_out_deg; preprocess_upload_neo4j.py:442-447)."""
    g = build_trade_graph(spark, sf)
    return (articlerank(g, damping=0.85, max_iter=20)
            .select(F.col("id").alias("nation"),
                    F.round("articlerank", 8).alias("articlerank")))


_HITS_ITERS = 10


def _hits_sql(iters: int) -> str:
    """Generate the HITS power iteration as chained CTEs: one
    (auth, hub) pair of half-steps per iteration, mirroring
    operators.graph.hits exactly (0-weight self-edges for zero-degree
    coverage, single L1 normalization at the END, 1/N fallback on a
    zero total)."""
    n = "(SELECT CAST(COUNT(*) AS DOUBLE) FROM verts)"
    parts = [f"WITH {EDGES_CTE},", """
he AS MATERIALIZED (
  SELECT src, dst, 1.0 AS w FROM edges
  UNION ALL SELECT id AS src, id AS dst, 0.0 AS w FROM verts
),""", f"h0 AS (SELECT id, 1.0 / {n} AS hub FROM verts)"]
    for k in range(1, iters + 1):
        parts.append(f""",
a{k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(h.hub * e.w) AS auth
  FROM he e JOIN h{k - 1} h ON e.src = h.id GROUP BY 1
),
h{k} AS MATERIALIZED (
  SELECT e.src AS id, SUM(a.auth * e.w) AS hub
  FROM he e JOIN a{k} a ON e.dst = a.id GROUP BY 1
)""")
    norm = ("CASE WHEN SUM({c}) OVER () > 0 "
            "THEN {c} / SUM({c}) OVER () ELSE 1.0 / {n} END")
    parts.append(f""",
hn AS (SELECT id, {norm.format(c='hub', n=n)} AS hub FROM h{iters}),
an AS (SELECT id, {norm.format(c='auth', n=n)} AS auth FROM a{iters})
SELECT h.id, ROUND(h.hub, 8) AS hub, ROUND(a.auth, 8) AS auth
FROM hn h JOIN an a ON h.id = a.id""")
    return "".join(parts)


@register("g_hits", _hits_sql(_HITS_ITERS))
def g_hits(spark, sf):
    """EXT graph algorithm: HITS hubs & authorities over the directed
    trade graph (who aggregates trade from strong sources vs who is a
    strong source), 10 L1-normalized power iterations -- the companion
    centrality to the reference's PageRank/ArticleRank family.  Oracle
    = generated per-half-step CTE chain."""
    from .operators.graph import hits
    g = build_trade_graph(spark, sf)
    return (hits(g, max_iter=_HITS_ITERS)
            .select("id", F.round("hub", 8).alias("hub"),
                    F.round("auth", 8).alias("auth")))


_PPR_SOURCES = ["NATION_0", "NATION_1"]


def _ppr_sql(sources: list, damping: float = 0.85, iters: int = 20) -> str:
    """Personalized power iteration: identical chain to
    _power_iteration_sql but the restart and dangling mass land on the
    teleport distribution over ``sources`` instead of 1/N."""
    src_list = ", ".join(f"'{x}'" for x in sources)
    dangling = ("(SELECT COALESCE(SUM(r.rank), 0) FROM {prev} r WHERE r.id "
                "NOT IN (SELECT src FROM edges))")
    parts = [f"WITH {EDGES_CTE},", UNWEIGHTED_SHARES + ",", f"""
tele AS MATERIALIZED (
  SELECT id, CASE WHEN id IN ({src_list})
                  THEN 1.0 / {len(sources)} ELSE 0.0 END AS tele
  FROM verts
),
r0 AS (SELECT id, tele AS rank FROM tele)"""]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(f""",
r{k} AS MATERIALIZED (
  SELECT t.id,
         (1 - {damping}) * t.tele
         + {damping} * (COALESCE(c.contrib, 0)
                        + {dangling.format(prev=prev)} * t.tele) AS rank
  FROM tele t
  LEFT JOIN (SELECT s.dst AS id, SUM(r.rank * s.share) AS contrib
             FROM shares s JOIN {prev} r ON s.src = r.id
             GROUP BY s.dst) c ON t.id = c.id
)""")
    parts.append(f"\nSELECT id AS nation, ROUND(rank, 8) AS ppr "
                 f"FROM r{iters}")
    return "".join(parts)


@register("g_ppr", _ppr_sql(_PPR_SOURCES))
def g_ppr(spark, sf):
    """EXT graph algorithm: PERSONALIZED PageRank seeded at NATION_0/
    NATION_1 -- importance as seen from those nations (the similar-
    node/recommendation primitive).  Restart AND dangling mass land on
    the seed set; same superstep plan as g1_pagerank with a stationary
    teleport broadcast."""
    from .operators.graph import personalized_pagerank
    g = build_trade_graph(spark, sf)
    return (personalized_pagerank(g, _PPR_SOURCES, damping=0.85,
                                  max_iter=20)
            .select(F.col("id").alias("nation"),
                    F.round("ppr", 8).alias("ppr")))


@register("g_triangles", f"""
WITH {EDGES_CTE},
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src != dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ue e1
  JOIN ue e2 ON e1.b = e2.a
  JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
),
pv AS (
  SELECT id, COUNT(*) AS n_triangles
  FROM (SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY id
)
SELECT v.id, COALESCE(p.n_triangles, 0) AS n_triangles
FROM verts v LEFT JOIN pv p ON v.id = p.id
""")
def g_triangles(spark, sf):
    """EXT graph metric: triangles per vertex on the undirected trade
    graph (two equi-joins over canonical a<b edges; each triangle
    counted once, credited to its three corners)."""
    from .operators.graph import triangle_count
    return triangle_count(build_trade_graph(spark, sf))


@register("g_clustering_coeff", f"""
WITH {EDGES_CTE},
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src != dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ue e1
  JOIN ue e2 ON e1.b = e2.a
  JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
),
pv AS (
  SELECT id, COUNT(*) AS n_triangles
  FROM (SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY id
),
deg AS (
  SELECT id, COUNT(*) AS deg
  FROM (SELECT a AS id FROM ue UNION ALL SELECT b FROM ue)
  GROUP BY id
)
SELECT v.id,
       COALESCE(d.deg, 0) AS degree,
       COALESCE(p.n_triangles, 0) AS n_triangles,
       CASE WHEN COALESCE(d.deg, 0) >= 2
            THEN COALESCE(p.n_triangles, 0)
                 / (d.deg * (d.deg - 1) / 2.0)
            ELSE 0.0 END AS clustering_coeff
FROM verts v
LEFT JOIN pv p ON v.id = p.id
LEFT JOIN deg d ON v.id = d.id
""")
def g_clustering_coeff(spark, sf):
    """EXT graph metric: local clustering coefficient (triangles over
    neighbor pairs) -- hub-and-spoke vs trading-bloc structure per
    nation.  Integer/integer division, engine-exact."""
    from .operators.graph import clustering_coefficient
    return clustering_coefficient(build_trade_graph(spark, sf))


@register("g_connected_components", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
top2 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 2
),
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM top2 WHERE src != dst
),
bi AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
reach(a, b) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a
)
SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a
""")
def g_connected_components(spark, sf):
    """EXT graph algorithm: connected components of the sparsified
    trade graph (top-2 partners per exporter), by iterative min-label
    propagation; oracle = recursive-CTE transitive closure."""
    from .operators.graph import Graph, connected_components
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top2 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2).select("src", "dst"))
    return connected_components(Graph(g.vertices, top2))


@register("g_property_edges", f"""
WITH {EDGES_CTE},
contains AS (
  SELECT r.r_name AS src, n.n_name AS dst, 'contains' AS type,
         CAST(NULL AS DOUBLE) AS amount
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
),
exp AS (
  SELECT sn.n_name AS src, p.p_brand AS dst, 'exports' AS type,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(27,4))) AS DOUBLE) AS amount
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  GROUP BY sn.n_name, p.p_brand
),
imp AS (
  SELECT p.p_brand AS src, cn.n_name AS dst, 'imports' AS type,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(27,4))) AS DOUBLE) AS amount
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  GROUP BY p.p_brand, cn.n_name
)
SELECT src, dst, 'trades' AS type, amount FROM edges
UNION ALL SELECT src, dst, type, amount FROM contains
UNION ALL SELECT src, dst, type, amount FROM exp
UNION ALL SELECT src, dst, type, amount FROM imp
""")
def g_property_edges(spark, sf):
    """S4 parity on driver data: the reference's labeled property graph
    (country/region/good nodes; ALL FOUR edge types -- trades,
    contains, exports country->good, imports good->country,
    preprocess_upload_neo4j.py:217-395) as ONE typed edge DataFrame --
    the bulk-load replacement for the per-row Cypher MERGE loops.
    'good' nodes map to part brands; exports/imports edges carry
    summed revenue (exports from the supplier side, imports from the
    customer side, mirroring :348-369 / :371-395)."""
    from .sources import read_table
    g = build_trade_graph(spark, sf)
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    part = read_table(spark, sf, "part")
    supplier = read_table(spark, sf, "supplier")
    lineitem = read_table(spark, sf, "lineitem")
    from .operators.relational import dsum

    trades = g.edges.select("src", "dst", F.lit("trades").alias("type"),
                            "amount")
    contains = (nation.join(F.broadcast(region),
                            nation.n_regionkey == region.r_regionkey)
                .select(F.col("r_name").alias("src"),
                        F.col("n_name").alias("dst"),
                        F.lit("contains").alias("type"),
                        F.lit(None).cast("double").alias("amount")))
    supp_nation = (supplier.join(F.broadcast(nation),
                                 supplier.s_nationkey == nation.n_nationkey)
                   .select("s_suppkey", F.col("n_name").alias("src")))
    exports = (lineitem
               .join(F.broadcast(part.select("p_partkey", "p_brand")),
                     lineitem.l_partkey == F.col("p_partkey"))
               .join(F.broadcast(supp_nation),
                     lineitem.l_suppkey == F.col("s_suppkey"))
               .groupBy("src", F.col("p_brand").alias("dst"))
               .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .alias("amount"))
               .select("src", "dst", F.lit("exports").alias("type"),
                       "amount"))
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    cust_nation = (customer.join(F.broadcast(nation),
                                 customer.c_nationkey == nation.n_nationkey)
                   .select("c_custkey", F.col("n_name").alias("dst")))
    imports = (lineitem
               .join(orders.select("o_orderkey", "o_custkey"),
                     lineitem.l_orderkey == F.col("o_orderkey"))
               .join(F.broadcast(cust_nation),
                     F.col("o_custkey") == F.col("c_custkey"))
               .join(F.broadcast(part.select("p_partkey", "p_brand")),
                     lineitem.l_partkey == F.col("p_partkey"))
               .groupBy(F.col("p_brand").alias("src"), "dst")
               .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .alias("amount"))
               .select("src", "dst", F.lit("imports").alias("type"),
                       "amount"))
    return (trades.unionByName(contains).unionByName(exports)
            .unionByName(imports))


@register("g_bfs_hops", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
reach(id, dist) AS (
  SELECT id, 0 FROM verts WHERE id = 'NATION_0'
  UNION
  SELECT e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
)
SELECT v.id, CAST(MIN(r.dist) AS BIGINT) AS dist
FROM verts v LEFT JOIN reach r ON v.id = r.id
GROUP BY v.id
""")
def g_bfs_hops(spark, sf):
    """EXT graph algorithm: BFS hop distance from NATION_0 over the
    top-3-partner digraph (frontier-expansion supersteps; oracle =
    bounded recursive CTE + MIN per vertex)."""
    from .operators.graph import Graph, bfs_hops
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return bfs_hops(Graph(g.vertices, top3), ["NATION_0"])


@register("g_closeness", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY root, id
),
stats AS (
  SELECT root, COUNT(*) AS n_reached,
         SUM(dist) AS sum_dist, MAX(dist) AS eccentricity
  FROM mind WHERE dist > 0 GROUP BY root
)
SELECT v.id,
       COALESCE(s.n_reached, 0) AS n_reached,
       CASE WHEN s.sum_dist IS NOT NULL THEN
         (CAST(s.n_reached AS DOUBLE) / CAST(s.sum_dist AS DOUBLE))
         * (CAST(s.n_reached AS DOUBLE)
            / CAST((SELECT COUNT(*) - 1 FROM verts) AS DOUBLE))
       ELSE 0.0 END AS closeness,
       s.eccentricity
FROM verts v LEFT JOIN stats s ON v.id = s.root
""")
def g_closeness(spark, sf):
    """EXT graph algorithm: closeness centrality + eccentricity over
    the top-3-partner digraph.  All |V| roots share one frontier, so
    the whole all-pairs closure costs diameter-many supersteps; the
    closeness uses the GDS Wasserman-Faust normalization from exact
    integer inputs (engine-identical doubles).  Matches the GDS
    centrality family next to the reference's pageRank calls
    (preprocess_upload_neo4j.py:400-447)."""
    from .operators.graph import Graph, closeness_centrality
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return closeness_centrality(Graph(g.vertices, top3))


#: top-3-partner sparsification with the edge's partner rank kept as an
#: integer COST (1 = strongest link) -- shared by the SSSP/LPA oracles
_TOP3_COST_CTE = """
top3 AS (
  SELECT src, dst, rn AS cost FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
)"""


def _top3_cost(spark, sf):
    """Spark twin of _TOP3_COST_CTE."""
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("cost", F.row_number().over(w))
            .where(F.col("cost") <= 3).select("src", "dst", "cost"))
    return g, top3


@register("g_sssp_weighted", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_COST_CTE.lstrip()},
reach(id, dist) AS (
  SELECT id, CAST(0 AS BIGINT) FROM verts WHERE id = 'NATION_0'
  UNION
  SELECT e.dst, r.dist + e.cost
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 100
)
SELECT v.id, CAST(MIN(r.dist) AS BIGINT) AS dist
FROM verts v LEFT JOIN reach r ON v.id = r.id
GROUP BY v.id
""")
def g_sssp_weighted(spark, sf):
    """EXT graph algorithm: weighted single-source shortest path from
    NATION_0 over the top-3-partner digraph, edge cost = the partner
    rank (1 = strongest link), i.e. the cheapest chain of strong trade
    relationships.  Bellman-Ford supersteps; oracle = bounded
    recursive-CTE path closure + MIN per vertex.  The closure cap
    (dist < 100) is exact only while every shortest distance stays
    under it; since costs are <= 3 (top-3 rank) any shortest path is
    bounded by 3*(|V|-1), which the builder asserts against the
    actual vertex count so a larger graph cannot silently truncate
    the oracle's closure."""
    from .operators.graph import Graph, sssp
    g, top3 = _top3_cost(spark, sf)
    n_verts = g.vertices.count()
    assert 3 * (n_verts - 1) < 100, (
        f"g_sssp_weighted oracle caps the path closure at dist < 100 "
        f"but 3*(|V|-1) = {3 * (n_verts - 1)} can exceed it; raise the "
        "cap in the oracle SQL")
    return sssp(Graph(g.vertices, top3), ["NATION_0"], weight_col="cost")


_LPA_ITERS = 4


def _lpa_sql(iters: int) -> str:
    """Generate the synchronous-LPA oracle: one (count -> argmax ->
    relabel) CTE stage per superstep, mirroring
    operators.graph.label_propagation exactly."""
    parts = [f"WITH {EDGES_CTE.lstrip()},", f"{_TOP3_COST_CTE.lstrip()},",
             """
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM top3 WHERE src != dst
),
bi AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
l0 AS (SELECT id, id AS label FROM verts)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
c{k} AS (
  SELECT e.b AS id, l.label, COUNT(*) AS n
  FROM bi e JOIN l{k - 1} l ON e.a = l.id GROUP BY 1, 2
),
b{k} AS (
  SELECT id, label FROM (
    SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY n DESC, label) AS rn
    FROM c{k}
  ) WHERE rn = 1
),
l{k} AS MATERIALIZED (
  SELECT p.id, COALESCE(b.label, p.label) AS label
  FROM l{k - 1} p LEFT JOIN b{k} b ON p.id = b.id
)""")
    parts.append(f"\nSELECT id, label AS community FROM l{iters}")
    return "".join(parts)


_KCORE_K, _KCORE_ROUNDS = 4, _N_VERTS


def _kcore_sql(k: int, rounds: int) -> str:
    """Generate the k-core peel as fixed CTE rounds: degree filter +
    edge restriction per round.  Peeling is idempotent once converged,
    so running |V| rounds in SQL exactly matches the Spark operator's
    fixpoint exit no matter which round it converged on."""
    parts = [f"WITH {EDGES_CTE.lstrip()},", f"{_TOP3_COST_CTE.lstrip()},",
             """
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM top3 WHERE src != dst
),
e0 AS MATERIALIZED (SELECT a, b FROM ue
                    UNION ALL SELECT b AS a, a AS b FROM ue)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
k{r} AS MATERIALIZED (
  SELECT a AS id FROM e{r - 1} GROUP BY a HAVING COUNT(*) >= {k}
),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r - 1} e
  JOIN k{r} x ON e.a = x.id JOIN k{r} y ON e.b = y.id
)""")
    parts.append(f"""
SELECT v.id, s.id IS NOT NULL AS in_kcore
FROM verts v
LEFT JOIN (SELECT DISTINCT a AS id FROM e{rounds}) s ON v.id = s.id""")
    return "".join(parts)


@register("g_kcore", _kcore_sql(_KCORE_K, _KCORE_ROUNDS))
def g_kcore(spark, sf):
    """EXT graph algorithm: k-core membership (k=4) of the undirected
    top-3-partner graph by iterative peeling -- the dense trading-bloc
    backbone.  Spark side exits at the fixpoint; the oracle peels a
    fixed number of rounds, identical because converged peels are
    idempotent -- VALID ONLY while rounds >= |V| (peeling removes at
    least one vertex per non-converged round), which the builder
    asserts against the actual vertex count so a data change cannot
    silently under-peel the oracle."""
    from .operators.graph import Graph, k_core
    g, top3 = _top3_cost(spark, sf)
    n_verts = g.vertices.count()
    assert n_verts <= _KCORE_ROUNDS, (
        f"g_kcore oracle peels {_KCORE_ROUNDS} rounds but the graph has "
        f"{n_verts} vertices; raise _KCORE_ROUNDS to >= |V| or the "
        "oracle may stop before the peel converges")
    return k_core(Graph(g.vertices, top3), k=_KCORE_K)


@register("g_scc", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_COST_CTE.lstrip()},
e AS (SELECT src, dst FROM top3 WHERE src != dst),
reach(a, b) AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
scc AS (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc_id
  FROM verts v LEFT JOIN mutual m ON m.u = v.id
  GROUP BY v.id
)
SELECT id, scc_id,
       COUNT(*) OVER (PARTITION BY scc_id) AS scc_size
FROM scc
""")
def g_scc(spark, sf):
    """EXT graph algorithm: strongly connected components of the
    top-3-partner DIGRAPH by FW-BW-Trim (trim singletons, then
    forward ∩ backward reachability from a min-id pivot per round).
    scc_id = min member id, so the oracle -- a recursive-CTE mutual-
    reachability closure -- reproduces the labeling exactly.  The
    directed complement of g_connected_components: one-way trade
    chains do NOT merge blocs."""
    from .operators.graph import Graph, strongly_connected_components
    g, top3 = _top3_cost(spark, sf)
    return strongly_connected_components(
        Graph(g.vertices, top3.select("src", "dst")))


@register("g_label_propagation", _lpa_sql(_LPA_ITERS))
def g_label_propagation(spark, sf):
    """EXT graph algorithm: community detection by synchronous label
    propagation ({_LPA_ITERS} supersteps, most-frequent-neighbor-label
    with smallest-label tie-break) on the undirected top-3-partner
    graph.  Fixed iteration count keeps sync LPA deterministic and
    lets the oracle replay it stage for stage."""
    from .operators.graph import Graph, label_propagation
    g, top3 = _top3_cost(spark, sf)
    return label_propagation(Graph(g.vertices, top3.select("src", "dst")),
                             max_iter=_LPA_ITERS)


@register("sql_top_partner_top10", f"""
WITH {EDGES_CTE},
ranked AS (
  SELECT src AS nation, dst AS top_partner, amount,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY amount DESC, dst) AS rn,
         CAST(SUM(CAST(amount AS DECIMAL(27,4)))
              OVER (PARTITION BY src) AS DOUBLE) AS total_exports
  FROM edges
)
SELECT nation, top_partner, amount, total_exports
FROM ranked WHERE rn = 1
ORDER BY total_exports DESC, nation
LIMIT 10
""")
def sql_top_partner_top10(spark, sf):
    """SURVEY §3.3: the ad-hoc SQL surface (the Neo4j-browser Cypher
    analog).  The graph registers as temp views and the query runs
    through spark.sql -- SQL text -> Catalyst parse/analyze/optimize
    -> same physical plan as the DataFrame API."""
    g = build_trade_graph(spark, sf)
    g.edges.createOrReplaceTempView("trade_edges")
    return spark.sql("""
        WITH ranked AS (
          SELECT src AS nation, dst AS top_partner, amount,
                 ROW_NUMBER() OVER (PARTITION BY src
                                    ORDER BY amount DESC, dst) AS rn,
                 CAST(SUM(CAST(amount AS DECIMAL(27,4)))
                      OVER (PARTITION BY src) AS DOUBLE) AS total_exports
          FROM trade_edges
        )
        SELECT nation, top_partner, amount, total_exports
        FROM ranked WHERE rn = 1
        ORDER BY total_exports DESC, nation
        LIMIT 10
    """)


@register("g_diameter", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY root, id
),
pairs AS (SELECT * FROM mind WHERE dist > 0),
ecc AS (SELECT root, MAX(dist) AS ecc FROM pairs GROUP BY root)
SELECT (SELECT COUNT(*) FROM pairs) AS n_reachable_pairs,
       (SELECT MAX(dist) FROM pairs) AS diameter,
       (SELECT MIN(ecc) FROM ecc) AS radius,
       CAST((SELECT SUM(dist) FROM pairs) AS DOUBLE)
         / (SELECT COUNT(*) FROM pairs) AS avg_path_len
""")
def g_diameter(spark, sf):
    """EXT graph summary: diameter / radius / average shortest path
    over the top-3-partner digraph -- one row distilled from the same
    shared-frontier all-pairs closure as g_closeness."""
    from .operators.graph import Graph, graph_diameter
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return graph_diameter(Graph(g.vertices, top3))


_CONDENSATION_ROUNDS = _N_VERTS


def _condensation_sql(rounds: int) -> str:
    """Generate the condensation oracle: the g_scc mutual-reachability
    closure, component contraction, then ``rounds`` longest-path level
    iterations (idempotent once converged -- exact while rounds >=
    DAG depth, which the builder asserts via rounds >= |V|)."""
    parts = [f"""WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_COST_CTE.lstrip()},
e AS (SELECT src, dst FROM top3 WHERE src != dst),
reach(a, b) AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
scc AS (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc_id
  FROM verts v LEFT JOIN mutual m ON m.u = v.id
  GROUP BY v.id
),
comps AS MATERIALIZED (
  SELECT scc_id AS comp, COUNT(*) AS n_members FROM scc GROUP BY scc_id
),
cedges AS MATERIALIZED (
  SELECT DISTINCT s1.scc_id AS csrc, s2.scc_id AS cdst
  FROM e JOIN scc s1 ON e.src = s1.id JOIN scc s2 ON e.dst = s2.id
  WHERE s1.scc_id != s2.scc_id
),
l0 AS (SELECT comp, 0 AS lvl FROM comps)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
l{r} AS MATERIALIZED (
  SELECT c.comp, COALESCE(MAX(l.lvl + 1), 0) AS lvl
  FROM comps c
  LEFT JOIN cedges ce ON ce.cdst = c.comp
  LEFT JOIN l{r - 1} l ON l.comp = ce.csrc
  GROUP BY c.comp
)""")
    parts.append(f"""
SELECT c.comp, c.n_members, l.lvl AS level
FROM comps c JOIN l{rounds} l ON c.comp = l.comp""")
    return "".join(parts)


@register("g_condensation", _condensation_sql(_CONDENSATION_ROUNDS))
def g_condensation(spark, sf):
    """EXT graph algorithm: condensation DAG of the top-3-partner
    digraph -- SCCs contracted to nodes with topological (longest-
    path-from-source) levels: the supply-chain depth chart.  Oracle =
    SCC closure + fixed-round level iteration (idempotent once
    converged; exact while rounds >= |V| >= DAG depth, asserted)."""
    from .operators.graph import Graph, condensation
    g, top3 = _top3_cost(spark, sf)
    n_verts = g.vertices.count()
    assert n_verts <= _CONDENSATION_ROUNDS, (
        f"g_condensation oracle iterates {_CONDENSATION_ROUNDS} level "
        f"rounds but the graph has {n_verts} vertices; raise "
        "_CONDENSATION_ROUNDS to >= |V| or the oracle may stop before "
        "the longest path converges")
    return condensation(Graph(g.vertices, top3.select("src", "dst")))


def _walks_sql(length: int) -> str:
    """Generate the random-walk oracle: one (candidate-rank -> md5-coin
    pick + dead-end carry) CTE pair per step, mirroring
    operators.graph.random_walks exactly."""
    parts = [f"""WITH {EDGES_CTE.lstrip()},
top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
w0 AS (SELECT id AS walk_id, id AS cur, id AS path, 0 AS n_steps
       FROM verts)"""]
    for k in range(1, length + 1):
        prev = f"w{k - 1}"
        parts.append(f""",
s{k} AS (
  SELECT w.walk_id, w.path, w.n_steps, e.dst,
         ROW_NUMBER() OVER (PARTITION BY w.walk_id ORDER BY e.dst) - 1
           AS rn,
         COUNT(*) OVER (PARTITION BY w.walk_id) AS n
  FROM {prev} w JOIN top3 e ON e.src = w.cur
),
w{k} AS (
  SELECT walk_id, dst AS cur, path || '>' || dst AS path,
         n_steps + 1 AS n_steps
  FROM s{k}
  WHERE rn = ('0x' || substr(md5(walk_id || ':{k}'), 1, 7))::BIGINT % n
  UNION ALL
  SELECT w.walk_id, w.cur, w.path, w.n_steps FROM {prev} w
  WHERE NOT EXISTS (SELECT 1 FROM top3 e WHERE e.src = w.cur)
)""")
    parts.append(f"""
SELECT walk_id, path, cur AS end_id, n_steps FROM w{length}""")
    return "".join(parts)


_WALK_LEN = 4


@register("g_random_walks", _walks_sql(_WALK_LEN))
def g_random_walks(spark, sf):
    """EXT graph -> training-data op: deterministic random walks over
    the top-3-partner digraph (one walk per vertex, ``_WALK_LEN``
    steps), next hop chosen by a replayable md5 coin over the
    dst-ordered neighbor rank -- the DeepWalk/node2vec
    sequence-generation stage with zero seed state.  Oracle replays
    every step as generated SQL."""
    from .operators.graph import Graph, random_walks
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return random_walks(Graph(g.vertices, top3), length=_WALK_LEN)


@register("g_skipgram_pairs", _walks_sql(_WALK_LEN).replace(
    f"\nSELECT walk_id, path, cur AS end_id, n_steps FROM w{_WALK_LEN}",
    f""",
toks AS (
  SELECT walk_id, string_split(path, '>') AS arr FROM w{_WALK_LEN}
),
pos AS (
  SELECT walk_id, arr[i] AS center, i, len(arr) AS n
  FROM toks, unnest(range(1, len(arr) + 1)) AS u(i)
)
SELECT p.walk_id, p.center, p.i AS center_pos,
       p2.arr[j] AS context, j - p.i AS offset
FROM pos p
JOIN toks p2 ON p.walk_id = p2.walk_id,
     unnest(range(1, len(p2.arr) + 1)) AS v(j)
WHERE abs(j - p.i) BETWEEN 1 AND 2"""))
def g_skipgram_pairs(spark, sf):
    """Skip-gram training pairs from the walk corpus (window 2): the
    final DeepWalk data-prep stage -- each walk explodes to (center,
    context, offset) rows ready for embedding training.  Pure array
    ops over the walk table; pair volume is walks x length x window,
    never graph-squared."""
    from .operators.graph import Graph, random_walks
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    walks = random_walks(Graph(g.vertices, top3), length=_WALK_LEN)
    toks = walks.select("walk_id", F.split("path", ">").alias("arr"))
    center = toks.select(
        "walk_id", "arr",
        F.posexplode("arr").alias("i0", "center")) \
        .select("walk_id", "arr", "center",
                (F.col("i0") + 1).alias("center_pos"))
    ctx = center.select(
        "walk_id", "center", "center_pos",
        F.posexplode("arr").alias("j0", "context")) \
        .select("walk_id", "center", "center_pos", "context",
                (F.col("j0") + 1 - F.col("center_pos")).alias("offset"))
    return (ctx.where(F.abs("offset").between(1, 2))
            .select("walk_id", "center", "center_pos", "context",
                    "offset"))


@register("g_reciprocity", f"""
WITH {EDGES_CTE}
SELECT COUNT(*) AS n_edges,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM edges r
                                  WHERE r.src = e.dst AND r.dst = e.src)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM edges r
                                  WHERE r.src = e.dst AND r.dst = e.src)
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS reciprocity
FROM edges e
""")
def g_reciprocity(spark, sf):
    """Edge reciprocity: the fraction of trade flows with a
    counter-flow (dyadic mutuality -- near 1 on a trade graph, near 0
    on a citation graph).  One self-semi-join on the reversed key;
    edge-sized shuffles only."""
    edges = build_trade_graph(spark, sf).edges.select("src", "dst") \
        .localCheckpoint()
    rev = edges.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"),
                       F.lit(1).alias("__has_rev"))
    marked = edges.join(rev, ["src", "dst"], "left")
    return marked.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("__has_rev").isNotNull().cast("int"))
        .alias("n_reciprocal"),
        (F.sum(F.col("__has_rev").isNotNull().cast("int")).cast("double")
         / F.count(F.lit(1))).alias("reciprocity"))


@register("g_assortativity", f"""
WITH {EDGES_CTE},
deg AS (
  SELECT id, COALESCE(o.n, 0.0) + COALESCE(i.n, 0.0) AS d
  FROM verts v
  LEFT JOIN (SELECT src AS id2,
                    CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                      AS n
             FROM edges GROUP BY src) o
    ON v.id = o.id2
  LEFT JOIN (SELECT dst AS id3,
                    CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                      AS n
             FROM edges GROUP BY dst) i
    ON v.id = i.id3
)
SELECT COUNT(*) AS n_edges,
       round(corr(ds.d, dd.d), 6) AS strength_assortativity
FROM edges e
JOIN deg ds ON e.src = ds.id
JOIN deg dd ON e.dst = dd.id
""")
def g_assortativity(spark, sf):
    """Strength assortativity: correlation of endpoint STRENGTHS
    (decimal-exact total trade amount, in + out) across edges -- do
    heavy traders link to heavy traders or to the periphery?  Strength
    replaces count-degree because a dense small-world graph has
    near-constant degrees (zero variance makes count-degree corr
    undefined).  Two broadcast strength joins + one co-moment
    aggregate (rounded 6, the corr contract)."""
    g = build_trade_graph(spark, sf).hold()
    edges = g.edges.select("src", "dst")
    out = g.edges.groupBy(F.col("src").alias("id")) \
        .agg(dsum("amount").alias("od"))
    inn = g.edges.groupBy(F.col("dst").alias("id")) \
        .agg(dsum("amount").alias("idg"))
    deg = (g.vertices.select("id")
           .join(out, "id", "left").join(inn, "id", "left")
           .select("id", (F.coalesce("od", F.lit(0.0))
                          + F.coalesce("idg", F.lit(0.0))).alias("d")))
    ds = deg.select(F.col("id").alias("src"), F.col("d").alias("sd"))
    dd = deg.select(F.col("id").alias("dst"), F.col("d").alias("dd"))
    return (edges.join(F.broadcast(ds), "src")
            .join(F.broadcast(dd), "dst")
            .agg(F.count(F.lit(1)).alias("n_edges"),
                 F.round(F.corr("sd", "dd"), 6)
                 .alias("strength_assortativity")))


_LP_TOPK = 3


@register("g_link_prediction", f"""
WITH {EDGES_CTE},
strong AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           RANK() OVER (PARTITION BY src
                        ORDER BY amount DESC, dst) AS r
    FROM edges) t WHERE r <= {_LP_TOPK}
),
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM strong WHERE src != dst
),
sym AS (
  SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue
),
deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
wedges AS (
  SELECT e1.b AS u, e2.b AS v, d.deg AS mdeg
  FROM sym e1
  JOIN sym e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN deg d   ON d.id = e1.a
),
pairs AS (
  SELECT u AS a, v AS b, COUNT(*) AS common_neighbors,
         CAST(SUM(CAST(1.0 / ln(CAST(mdeg AS DOUBLE))
                       AS DECIMAL(27,12))) AS DOUBLE) AS aa
  FROM wedges GROUP BY 1, 2
),
new_pairs AS (
  SELECT p.* FROM pairs p
  LEFT JOIN ue ON ue.a = p.a AND ue.b = p.b
  WHERE ue.a IS NULL
)
SELECT p.a, p.b, p.common_neighbors,
       CAST(p.common_neighbors AS DOUBLE)
       / CAST(da.deg + db.deg - p.common_neighbors AS DOUBLE) AS jaccard,
       ROUND(p.aa, 8) AS adamic_adar
FROM new_pairs p
JOIN deg da ON da.id = p.a
JOIN deg db ON db.id = p.b
""")
def g_link_prediction(spark, sf):
    """Link prediction (common neighbors / Jaccard / Adamic-Adar) on
    the strongest-partner subgraph: each nation keeps its top-{k}
    export routes (the README's 'strongest partner' theme), and the
    scores rank the absent edges most likely to appear next.  The full
    trade graph is near-complete, so the top-k projection is what
    makes 'predicted links' a meaningful set.  Scale shape: see
    operators.graph.link_prediction (wedge-join candidates, hub cap,
    decimal-exact Adamic-Adar)."""
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    strong = (g.edges.withColumn("__r", F.rank().over(w))
              .where(F.col("__r") <= _LP_TOPK).select("src", "dst"))
    from .operators.graph import Graph, link_prediction
    return link_prediction(Graph(g.vertices, strong))


@register("g_harmonic", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY root, id
),
stats AS (
  SELECT root, COUNT(*) AS n_reached,
         CAST(SUM(CAST(1.0 / CAST(dist AS DOUBLE) AS DECIMAL(27,12)))
              AS DOUBLE) AS hsum
  FROM mind WHERE dist > 0 GROUP BY root
)
SELECT v.id,
       COALESCE(s.n_reached, 0) AS n_reached,
       ROUND(COALESCE(s.hsum, 0.0)
             / CAST((SELECT COUNT(*) - 1 FROM verts) AS DOUBLE), 8)
         AS harmonic
FROM verts v LEFT JOIN stats s ON v.id = s.root
""")
def g_harmonic(spark, sf):
    """EXT graph algorithm: harmonic centrality over the top-3-partner
    digraph -- the disconnection-robust closeness (unreached vertices
    contribute zero rather than undefined means).  Shares the
    multi-root BFS closure with g_closeness/g_diameter."""
    from .operators.graph import Graph, harmonic_centrality
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return harmonic_centrality(Graph(g.vertices, top3))


@register("g_neighborhood_agg", f"""
WITH {EDGES_CTE},
deg AS (
  SELECT v.id,
         COALESCE(o.out_deg, 0) AS out_deg,
         COALESCE(o.out_amount, 0.0) AS out_amount
  FROM verts v
  LEFT JOIN (SELECT src AS id, COUNT(*) AS out_deg,
                    CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                      AS out_amount
             FROM edges GROUP BY 1) o ON v.id = o.id
),
msgs AS (
  SELECT e.dst AS id, d.out_deg, d.out_amount
  FROM edges e JOIN deg d ON d.id = e.src
),
agg AS (
  SELECT id, COUNT(*) AS n_in_neighbors,
         CAST(SUM(CAST(out_deg AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*)
           AS m_deg,
         CAST(SUM(CAST(out_amount AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*)
           AS m_amt
  FROM msgs GROUP BY id
)
SELECT d.id, d.out_deg, d.out_amount,
       COALESCE(a.n_in_neighbors, 0) AS n_in_neighbors,
       COALESCE(a.m_deg, 0.0) AS nbr_mean_out_deg,
       COALESCE(a.m_amt, 0.0) AS nbr_mean_out_amount
FROM deg d LEFT JOIN agg a ON a.id = d.id
""")
def g_neighborhood_agg(spark, sf):
    """GraphSAGE-style message passing: each nation's features
    (out-degree, export volume) averaged over its trade suppliers --
    one GNN aggregation layer as a DataFrame plan.  See
    operators.graph.neighborhood_agg."""
    from .operators.graph import build_trade_graph, neighborhood_agg
    g = build_trade_graph(spark, sf).hold()
    return neighborhood_agg(g, ["out_deg", "out_amount"])


_TOP3_CTE = """
top3 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
)"""

#: level-synchronous path-count CTEs generated up to |V|-1 levels (a
#: shortest path can never be longer); g_betweenness asserts the vertex
#: count fits at query time (same guard style as g_kcore).
_BETW_LEVELS = _N_VERTS


def _betweenness_sql(levels: int) -> str:
    """Generate the DuckDB twin of betweenness_centrality on the top-3
    subgraph: recursive reachability gives min distances; shortest-path
    COUNTS are computed level-synchronously (np_d from np_{d-1} --
    recursive UNION ALL would enumerate all walks and explode on
    cycles); the Brandes pair-dependency is the same closure join the
    Spark operator runs."""
    parts = [f"WITH RECURSIVE {EDGES_CTE.lstrip()},", _TOP3_CTE.lstrip(),
             f""",
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < {levels}
),
mind AS MATERIALIZED (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY root, id
),
np0 AS (SELECT id AS root, id, CAST(1 AS BIGINT) AS npaths FROM verts)"""]
    for d in range(1, levels + 1):
        parts.append(f""",
np{d} AS MATERIALIZED (
  SELECT r.root, e.dst AS id, SUM(r.npaths) AS npaths
  FROM np{d - 1} r
  JOIN top3 e ON e.src = r.id
  JOIN mind m ON m.root = r.root AND m.id = e.dst AND m.dist = {d}
  GROUP BY 1, 2
)""")
    union = "\n  UNION ALL ".join(
        f"SELECT root, id, {d} AS dist, npaths FROM np{d}"
        for d in range(0, levels + 1))
    parts.append(f""",
closure AS MATERIALIZED (
  {union}
),
sv AS (SELECT root AS s, id AS v, dist AS d1, npaths AS p1
       FROM closure WHERE dist > 0),
vt AS (SELECT root AS vv, id AS t, dist AS d2, npaths AS p2
       FROM closure WHERE dist > 0),
bc AS (
  SELECT sv.v AS id,
         CAST(SUM(CAST(CAST(sv.p1 * vt.p2 AS DOUBLE)
                       / CAST(st.npaths AS DOUBLE)
                       AS DECIMAL(27,12))) AS DOUBLE) AS bsum
  FROM sv
  JOIN vt ON vt.vv = sv.v AND vt.t != sv.s
  JOIN closure st ON st.root = sv.s AND st.id = vt.t
                 AND st.dist = sv.d1 + vt.d2
  GROUP BY 1
)
SELECT v.id, ROUND(COALESCE(b.bsum, 0.0), 8) AS betweenness
FROM verts v LEFT JOIN bc b ON v.id = b.id""")
    return "".join(parts)


@register("g_betweenness", _betweenness_sql(_BETW_LEVELS))
def g_betweenness(spark, sf):
    """EXT graph algorithm: exact betweenness centrality on the
    top-3-partner digraph -- which nations sit on the most shortest
    trade routes (the brokerage sibling of the closeness/harmonic
    entries; GDS exposes betweenness in the same centrality family the
    reference's stack uses, preprocess_upload_neo4j.py:400-447).
    Spark side: one path-counting multi-root BFS + the Brandes
    pair-dependency as closure joins (operators.graph.
    betweenness_centrality); oracle: identical math from generated
    level-synchronous path-count SQL."""
    from .operators.graph import Graph, betweenness_centrality
    g = build_trade_graph(spark, sf)
    n_verts = g.vertices.count()
    assert n_verts - 1 <= _BETW_LEVELS, (
        f"g_betweenness oracle counts paths over {_BETW_LEVELS} levels "
        f"but the graph has {n_verts} vertices; raise _BETW_LEVELS to "
        f">= |V| - 1 or the oracle can under-count")
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return betweenness_centrality(Graph(g.vertices, top3))


_WL_ITERS = 3


def _wl_sql(iters: int) -> str:
    """Generate the DuckDB twin of wl_refinement on the top-3 subgraph:
    one CTE per refinement round; the neighbor multiset is
    string_agg(color ORDER BY color), matching Spark's
    array_join(array_sort(collect_list))."""
    parts = [f"WITH {EDGES_CTE},", _TOP3_CTE.lstrip(), """,
ind AS (SELECT dst AS id, COUNT(*) AS d FROM top3 GROUP BY 1),
outd AS (SELECT src AS id, COUNT(*) AS d FROM top3 GROUP BY 1),
c0 AS MATERIALIZED (
  SELECT v.id,
         md5(CAST(COALESCE(i.d, 0) AS VARCHAR) || '|' ||
             CAST(COALESCE(o.d, 0) AS VARCHAR)) AS color
  FROM verts v
  LEFT JOIN ind i ON i.id = v.id
  LEFT JOIN outd o ON o.id = v.id
)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
c{k} AS MATERIALIZED (
  SELECT c.id, md5(c.color || '|' || COALESCE(s.sig, '')) AS color
  FROM c{k - 1} c
  LEFT JOIN (SELECT e.dst AS id,
                    string_agg(p.color, ',' ORDER BY p.color) AS sig
             FROM top3 e JOIN c{k - 1} p ON p.id = e.src
             GROUP BY e.dst) s ON s.id = c.id
)""")
    parts.append(f"""
SELECT c.id, c.color AS wl_color, cls.class_size
FROM c{iters} c
JOIN (SELECT color, COUNT(*) AS class_size
      FROM c{iters} GROUP BY 1) cls
  ON cls.color = c.color""")
    return "".join(parts)


@register("g_wl_colors", _wl_sql(_WL_ITERS))
def g_wl_colors(spark, sf):
    """EXT graph algorithm: Weisfeiler-Lehman color refinement on the
    top-3-partner digraph -- structural-role fingerprints (two nations
    share a color iff their depth-3 trade neighborhoods are
    isomorphic).  Engine-portable md5 colors; see
    operators.graph.wl_refinement for the superstep shape."""
    from .operators.graph import Graph, wl_refinement
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return wl_refinement(Graph(g.vertices, top3), iters=_WL_ITERS)


_N2V_LEN, _N2V_WR, _N2V_WC, _N2V_WF = 4, 1, 4, 2


def _node2vec_sql(length: int, wr: int, wc: int, wf: int) -> str:
    """Generate the node2vec-walk oracle: per step, the weighted
    cumulative-range draw as SQL windows -- mirrors
    operators.graph.node2vec_walks exactly (uniform first step = the
    prev-IS-NULL weight case)."""
    parts = [f"""WITH {EDGES_CTE.lstrip()},
top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
w0 AS (SELECT id AS walk_id, id AS cur, CAST(NULL AS VARCHAR) AS prev,
              id AS path, 0 AS n_steps
       FROM verts)"""]
    for k in range(1, length + 1):
        prev = f"w{k - 1}"
        parts.append(f""",
s{k} AS (
  SELECT w.walk_id, w.cur, w.prev, w.path, w.n_steps, e.dst,
         CAST(CASE WHEN w.prev IS NULL THEN 1
                   WHEN e.dst = w.prev THEN {wr}
                   WHEN c.prev IS NOT NULL THEN {wc}
                   ELSE {wf} END AS BIGINT) AS wt
  FROM {prev} w
  JOIN top3 e ON e.src = w.cur
  LEFT JOIN (SELECT DISTINCT src AS prev, dst FROM top3) c
         ON c.prev = w.prev AND c.dst = e.dst
),
t{k} AS (
  SELECT *, SUM(wt) OVER (PARTITION BY walk_id ORDER BY dst
                          ROWS UNBOUNDED PRECEDING) AS cum,
            SUM(wt) OVER (PARTITION BY walk_id) AS total
  FROM s{k}
),
w{k} AS (
  SELECT t.walk_id, t.dst AS cur, t.cur AS prev,
         t.path || '>' || t.dst AS path, t.n_steps + 1 AS n_steps
  FROM t{k} t
  WHERE t.total > 0
    AND ('0x' || substr(md5(t.walk_id || ':{k}'), 1, 7))::BIGINT % t.total
        BETWEEN t.cum - t.wt AND t.cum - 1
  UNION ALL
  SELECT w.walk_id, w.cur, w.prev, w.path, w.n_steps FROM {prev} w
  WHERE NOT EXISTS (SELECT 1 FROM top3 e WHERE e.src = w.cur)
  UNION ALL
  SELECT DISTINCT t.walk_id, t.cur, t.prev, t.path, t.n_steps
  FROM t{k} t WHERE t.total = 0
)""")
    parts.append(f"""
SELECT walk_id, path, cur AS end_id, n_steps FROM w{length}""")
    return "".join(parts)


@register("g_node2vec_walks",
          _node2vec_sql(_N2V_LEN, _N2V_WR, _N2V_WC, _N2V_WF))
def g_node2vec_walks(spark, sf):
    """EXT graph -> training-data op: node2vec-BIASED walks over the
    top-3-partner digraph (integer 1/p:1:1/q weights 1:4:2 -- mildly
    BFS-ish), next hop drawn from the md5-coin cumulative-weight range.
    Generalizes g_random_walks (uniform = all weights equal); the
    biased corpus is what node2vec actually trains on.  See
    operators.graph.node2vec_walks."""
    from .operators.graph import Graph, node2vec_walks
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return node2vec_walks(Graph(g.vertices, top3), length=_N2V_LEN,
                          w_return=_N2V_WR, w_common=_N2V_WC,
                          w_far=_N2V_WF)


@register("g_mst", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
t3 AS (
  SELECT src, dst, amount FROM (
    SELECT src, dst, amount,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY amount DESC, dst) AS rn
    FROM edges
  ) WHERE rn <= 3
),
ue AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         MAX(amount) AS am
  FROM t3 GROUP BY 1, 2
),
uw AS MATERIALIZED (
  SELECT a, b, ROW_NUMBER() OVER (ORDER BY am DESC, a, b) AS w
  FROM ue
),
sym AS (
  SELECT a, b, w FROM uw UNION ALL SELECT b AS a, a AS b, w FROM uw
),
reach(a, b, bw) AS (
  SELECT a, b, w FROM sym
  UNION
  SELECT r.a, e.b, GREATEST(r.bw, e.w)
  FROM reach r JOIN sym e ON e.a = r.b
  WHERE e.b != r.a
),
minimax AS (
  SELECT a, b, MIN(bw) AS bw FROM reach GROUP BY 1, 2
)
SELECT u.a, u.b, u.w
FROM uw u JOIN minimax m ON m.a = u.a AND m.b = u.b
WHERE m.bw = u.w
""")
def g_mst(spark, sf):
    """Minimum spanning forest of the undirected top-3-partner trade
    graph by BORUVKA supersteps (components halve per round --
    log-round parallel, the MST algorithm that works at cluster
    scale).  Edge weights are the (amount DESC, a, b) rank, so weights
    are DISTINCT integers and the forest is unique -- which lets the
    oracle verify via the cycle property (edge is in the MSF iff no
    alternative path has a smaller bottleneck weight; minimax closure
    as a recursive CTE) instead of replaying rounds.  See
    operators.graph.boruvka_mst."""
    from .operators.graph import boruvka_mst
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    t3 = (g.edges.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") <= 3).select("src", "dst", "amount"))
    ue = (t3.groupBy(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
          .agg(F.max("amount").alias("am")))
    # global rank window: edge-count-sized (the collapsed nation graph),
    # never fact-sized -- same posture as the other top3 projections
    uw = (ue.withColumn("w", F.row_number().over(
        Window.orderBy(F.desc("am"), F.asc("a"), F.asc("b"))))
          .select("a", "b", "w"))
    return boruvka_mst(g.vertices.select("id"), uw)


_MIS_ROUNDS = _N_VERTS


def _mis_sql(rounds: int) -> str:
    """Generate the Luby-MIS oracle: per round, the enter/eliminate
    pair as NOT EXISTS CTEs over the shrinking undecided set --
    mirrors operators.graph.maximal_independent_set (each round at
    least the global minimum priority enters, so |V| rounds always
    converge; g_mis asserts the vertex count fits)."""
    parts = [f"WITH {EDGES_CTE},", _TOP3_CTE.lstrip(), """,
ue AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM top3 WHERE src != dst),
sym AS (SELECT a, b FROM ue UNION SELECT b AS a, a AS b FROM ue),
u0 AS (SELECT id, md5(id) AS pri FROM verts)"""]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(f""",
m{k} AS MATERIALIZED (
  SELECT u.id FROM u{p} u
  WHERE NOT EXISTS (
    SELECT 1 FROM sym e JOIN u{p} n ON n.id = e.b
    WHERE e.a = u.id
      AND (n.pri < u.pri OR (n.pri = u.pri AND n.id < u.id)))
),
u{k} AS MATERIALIZED (
  SELECT u.id, u.pri FROM u{p} u
  WHERE u.id NOT IN (SELECT id FROM m{k})
    AND NOT EXISTS (SELECT 1 FROM sym e JOIN m{k} m ON m.id = e.a
                    WHERE e.b = u.id)
)""")
    union = "\n  UNION ALL ".join(f"SELECT id FROM m{k}"
                                  for k in range(1, rounds + 1))
    parts.append(f""",
mis AS (
  {union}
)
SELECT v.id, m.id IS NOT NULL AS in_mis
FROM verts v LEFT JOIN mis m ON m.id = v.id""")
    return "".join(parts)


@register("g_mis", _mis_sql(_MIS_ROUNDS))
def g_mis(spark, sf):
    """Maximal independent set on the undirected top-3-partner graph
    (Luby rounds, deterministic md5 priorities) -- the parallel
    symmetry-breaking primitive under distributed coloring/scheduling.
    See operators.graph.maximal_independent_set."""
    from .operators.graph import Graph, maximal_independent_set
    g = build_trade_graph(spark, sf)
    n_verts = g.vertices.count()
    assert n_verts <= _MIS_ROUNDS, (
        f"g_mis oracle runs {_MIS_ROUNDS} rounds but the graph has "
        f"{n_verts} vertices; raise _MIS_ROUNDS to >= |V|")
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return maximal_independent_set(Graph(g.vertices, top3))


_EIG_ITERS = 15


def _eigenvector_sql(iters: int) -> str:
    """Generate the eigenvector-centrality oracle: the identical
    max-rescaled power iteration, one CTE pair per superstep.  The
    CASE guards mirror the engine's m > 0 / n > 0 degeneracy handling
    (operators/graph.py eigenvector_centrality) so both engines emit
    0.0 -- not NULL -- on edgeless/nilpotent graphs (ADVICE r4)."""
    parts = [f"WITH {EDGES_CTE},", """
x0 AS (SELECT id, 1.0::DOUBLE AS x FROM verts)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
y{k} AS MATERIALIZED (
  SELECT v.id,
         COALESCE(CAST((SELECT SUM(CAST(x.x AS DECIMAL(27,12)))
                        FROM edges e JOIN x{p} x ON x.id = e.src
                        WHERE e.dst = v.id) AS DOUBLE), 0.0) AS y
  FROM verts v
),
x{k} AS MATERIALIZED (
  SELECT id, CASE WHEN (SELECT MAX(y) FROM y{k}) > 0
                  THEN y / (SELECT MAX(y) FROM y{k})
                  ELSE 0.0 END AS x
  FROM y{k}
)""")
    parts.append(f"""
SELECT id,
       CASE WHEN (SELECT sqrt(CAST(SUM(CAST(x * x AS DECIMAL(27,12)))
                                   AS DOUBLE)) FROM x{iters}) > 0
            THEN ROUND(x / (SELECT sqrt(CAST(SUM(CAST(x * x
                                   AS DECIMAL(27,12)))
                                   AS DOUBLE)) FROM x{iters}), 8)
            ELSE 0.0 END AS eigenvector
FROM x{iters}""")
    return "".join(parts)


@register("g_eigenvector", _eigenvector_sql(_EIG_ITERS))
def g_eigenvector(spark, sf):
    """Eigenvector centrality of the trade digraph (raw-adjacency
    power iteration, max-rescaled in-loop, L2-normalized at the end)
    -- the prestige member of the centrality family (PageRank = its
    stochastic+teleport variant, GDS exposes both).  See
    operators.graph.eigenvector_centrality."""
    from .operators.graph import eigenvector_centrality
    g = build_trade_graph(spark, sf)
    return eigenvector_centrality(g, max_iter=_EIG_ITERS)


# truss peels EDGES: the top-3 digraph has <= 3|V| undirected edges
_TRUSS_K, _TRUSS_ROUNDS = 4, 3 * _N_VERTS


def _ktruss_sql(k: int, rounds: int) -> str:
    """Generate the k-truss peel oracle: per round, wedge-join support
    + filter (mirrors operators.graph.k_truss).  At least one edge
    drops per active round, so rounds >= |undirected edges| always
    reach the fixpoint (g_ktruss asserts the edge count fits);
    post-fixpoint rounds are no-ops."""
    parts = [f"WITH {EDGES_CTE},", _TOP3_CTE.lstrip(), """,
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
)"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f""",
sym{p} AS (SELECT a, b FROM e{p} UNION ALL SELECT b AS a, a AS b
           FROM e{p}),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{p} e
  LEFT JOIN (SELECT x.a AS wa, y.a AS wb, COUNT(*) AS sup
             FROM sym{p} x JOIN sym{p} y
               ON x.b = y.b AND x.a < y.a
             GROUP BY 1, 2) t ON t.wa = e.a AND t.wb = e.b
  WHERE COALESCE(t.sup, 0) >= {k - 2}
)""")
    parts.append(f"""
SELECT e.a, e.b, t.a IS NOT NULL AS in_truss
FROM e0 e LEFT JOIN e{rounds} t ON t.a = e.a AND t.b = e.b""")
    return "".join(parts)


@register("g_ktruss", _ktruss_sql(_TRUSS_K, _TRUSS_ROUNDS))
def g_ktruss(spark, sf):
    """4-truss of the undirected top-3-partner graph: every surviving
    edge closes >= 2 triangles -- the edge-cohesion community core
    (the edge sibling of g_kcore).  See operators.graph.k_truss."""
    from .operators.graph import Graph, k_truss
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    n_ue = (top3.where(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst"), F.greatest("src", "dst"))
            .distinct().count())
    assert n_ue <= _TRUSS_ROUNDS, (
        f"g_ktruss oracle peels {_TRUSS_ROUNDS} rounds but the graph "
        f"has {n_ue} undirected edges; raise _TRUSS_ROUNDS")
    return k_truss(Graph(g.vertices, top3), k=_TRUSS_K)


def _modularity_sql(lpa_iters: int) -> str:
    """Reuse the generated LPA chain, then score the partition:
    per-community Newman modularity contribution."""
    base = _lpa_sql(lpa_iters)
    tail = f"\nSELECT id, label AS community FROM l{lpa_iters}"
    assert base.endswith(tail)
    return base[:-len(tail)] + f""",
labels AS (SELECT id, label AS community FROM l{lpa_iters}),
deg AS (SELECT a AS id, COUNT(*) AS k FROM bi GROUP BY 1),
mm AS (SELECT COUNT(*) AS m FROM ue),
internal AS (
  SELECT l1.community, COUNT(*) AS e_c
  FROM ue e
  JOIN labels l1 ON l1.id = e.a
  JOIN labels l2 ON l2.id = e.b AND l2.community = l1.community
  GROUP BY 1
),
degsum AS (
  SELECT l.community, COUNT(*) AS n_nodes,
         SUM(COALESCE(d.k, 0)) AS k_c
  FROM labels l LEFT JOIN deg d ON d.id = l.id GROUP BY 1
)
SELECT ds.community, ds.n_nodes,
       COALESCE(i.e_c, 0) AS internal_edges,
       CAST(ds.k_c AS BIGINT) AS degree_sum,
       ROUND(CAST(COALESCE(i.e_c, 0) AS DOUBLE)
             / CAST((SELECT m FROM mm) AS DOUBLE)
             - (CAST(ds.k_c AS DOUBLE)
                / (2.0 * CAST((SELECT m FROM mm) AS DOUBLE)))
               * (CAST(ds.k_c AS DOUBLE)
                  / (2.0 * CAST((SELECT m FROM mm) AS DOUBLE))), 8)
         AS q_contrib
FROM degsum ds LEFT JOIN internal i ON i.community = ds.community"""


@register("g_modularity", _modularity_sql(_LPA_ITERS))
def g_modularity(spark, sf):
    """Newman modularity of the LPA partition on the undirected
    top-3-partner graph: per-community internal-edge share minus the
    configuration-model expectation -- the score Louvain-family
    detectors optimize, here auditing the g_label_propagation
    communities.  See operators.graph.partition_modularity."""
    from .operators.graph import (Graph, label_propagation,
                                  partition_modularity, undirected_edges)
    g, top3 = _top3_cost(spark, sf)
    graph = Graph(g.vertices, top3.select("src", "dst"))
    labels = label_propagation(graph, max_iter=_LPA_ITERS)
    return partition_modularity(undirected_edges(graph.edges), labels)


_KATZ_A, _KATZ_B, _KATZ_ITERS = 0.02, 1.0, 15


def _katz_sql(alpha: float, beta: float, iters: int) -> str:
    """Generate the Katz oracle: x' = alpha A^T x + beta per
    superstep, decimal-exact sums, coefficients as repr()."""
    parts = [f"WITH {EDGES_CTE},", f"""
x0 AS (SELECT id, CAST({beta!r} AS DOUBLE) AS x FROM verts)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
x{k} AS MATERIALIZED (
  SELECT v.id,
         CAST({alpha!r} AS DOUBLE)
         * COALESCE(CAST((SELECT SUM(CAST(x.x AS DECIMAL(27,12)))
                          FROM edges e JOIN x{k - 1} x ON x.id = e.src
                          WHERE e.dst = v.id) AS DOUBLE), 0.0)
         + CAST({beta!r} AS DOUBLE) AS x
  FROM verts v
)""")
    parts.append(f"\nSELECT id, ROUND(x, 8) AS katz FROM x{iters}")
    return "".join(parts)


@register("g_katz", _katz_sql(_KATZ_A, _KATZ_B, _KATZ_ITERS))
def g_katz(spark, sf):
    """Katz centrality of the trade digraph (alpha = 0.02 -- under
    1/max-degree so the walk series converges; beta = 1): every
    incoming walk counts, damped by length.  Completes the centrality
    family next to eigenvector (no floor) and PageRank (stochastic).
    See operators.graph.katz_centrality."""
    from .operators.graph import katz_centrality
    g = build_trade_graph(spark, sf)
    return katz_centrality(g, alpha=_KATZ_A, beta=_KATZ_B,
                           max_iter=_KATZ_ITERS)


_SR_C, _SR_ITERS, _SR_TOPK = 0.8, 5, 3


def _simrank_sql(c: float, iters: int, topk: int) -> str:
    """Generate the SimRank oracle on the top-3 subgraph: per
    superstep, the sparse pair recurrence as one CTE (decimal-exact
    sums, C as repr, diagonal pinned to 1)."""
    parts = [f"WITH {EDGES_CTE},", _TOP3_CTE.lstrip(), """,
ind AS (SELECT dst AS id, COUNT(*) AS n FROM top3 GROUP BY 1),
s0 AS (SELECT id AS a, id AS b, 1.0::DOUBLE AS s FROM verts)"""]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
s{k} AS MATERIALIZED (
  SELECT id AS a, id AS b, 1.0::DOUBLE AS s FROM verts
  UNION ALL
  SELECT t.a, t.b,
         CAST({c!r} AS DOUBLE) * t.ssum
         / CAST(ia.n * ib.n AS DOUBLE) AS s
  FROM (SELECT e1.dst AS a, e2.dst AS b,
               CAST(SUM(CAST(s.s AS DECIMAL(27,12))) AS DOUBLE) AS ssum
        FROM s{p} s
        JOIN top3 e1 ON e1.src = s.a
        JOIN top3 e2 ON e2.src = s.b
        WHERE TRUE
        GROUP BY 1, 2) t
  JOIN ind ia ON ia.id = t.a
  JOIN ind ib ON ib.id = t.b
  WHERE t.a != t.b
)""")
    parts.append(f"""
SELECT a, b, ROUND(s, 8) AS simrank, sim_rank
FROM (SELECT a, b, s,
             ROW_NUMBER() OVER (PARTITION BY a
                                ORDER BY s DESC, b) AS sim_rank
      FROM s{iters} WHERE a != b)
WHERE sim_rank <= {topk}""")
    return "".join(parts)


@register("g_simrank", _simrank_sql(_SR_C, _SR_ITERS, _SR_TOPK))
def g_simrank(spark, sf):
    """SimRank structural similarity on the top-3-partner digraph
    (C = 0.8, 5 supersteps): nations are similar when the same
    partners export to them -- link-based similarity with no feature
    vectors, the graph sibling of the embedding-cosine family.  See
    operators.graph.simrank."""
    from .operators.graph import Graph, simrank
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return simrank(Graph(g.vertices, top3), c=_SR_C,
                   max_iter=_SR_ITERS, topk=_SR_TOPK)


@register("g_attention_agg", f"""
WITH {EDGES_CTE},
deg AS (
  SELECT v.id,
         COALESCE(o.out_deg, 0) AS out_deg,
         COALESCE(o.out_amount, 0.0) AS out_amount
  FROM verts v
  LEFT JOIN (SELECT src AS id, COUNT(*) AS out_deg,
                    CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                      AS out_amount
             FROM edges GROUP BY 1) o ON v.id = o.id
),
msgs AS (
  SELECT e.dst AS id, ln(CAST(e.amount AS DOUBLE)) AS ev,
         d.out_deg, d.out_amount
  FROM edges e JOIN deg d ON d.id = e.src
),
mx AS (SELECT id, MAX(ev) AS mx FROM msgs GROUP BY 1),
wts AS (
  SELECT m.id, ROUND(exp(m.ev - x.mx), 9) AS w,
         m.out_deg, m.out_amount
  FROM msgs m JOIN mx x ON x.id = m.id
),
agg AS (
  -- big-double -> decimal casts go through VARCHAR: Spark's cast
  -- uses the SHORTEST round-trip decimal representation
  -- (BigDecimal.valueOf), DuckDB's direct cast rounds the exact
  -- binary expansion -- at sf10 product magnitudes (~1e12) the two
  -- differ at the 5th fractional digit and broke strict parity.
  -- DuckDB's double->VARCHAR is shortest-rep, so the VARCHAR route
  -- mirrors Spark bit-for-bit at any scale.
  SELECT id,
         CAST(SUM(CAST(w AS DECIMAL(27,12))) AS DOUBLE) AS z,
         CAST(SUM(CAST(CAST(w * out_deg AS VARCHAR)
                       AS DECIMAL(27,12))) AS DOUBLE) AS ws_deg,
         CAST(SUM(CAST(CAST(w * out_amount AS VARCHAR)
                       AS DECIMAL(27,12))) AS DOUBLE) AS ws_amt,
         COUNT(*) AS n_in
  FROM wts GROUP BY 1
)
SELECT d.id, d.out_deg, d.out_amount,
       COALESCE(a.n_in, 0) AS n_in_neighbors,
       CAST(ROUND(CAST(CAST(COALESCE(a.ws_deg / a.z, 0.0) AS VARCHAR)
                       AS DECIMAL(38,8)), 4) AS DOUBLE) AS attn_out_deg,
       CAST(ROUND(CAST(CAST(COALESCE(a.ws_amt / a.z, 0.0) AS VARCHAR)
                       AS DECIMAL(38,8)), 4) AS DOUBLE) AS attn_out_amount
FROM deg d LEFT JOIN agg a ON a.id = d.id
""")
def g_attention_agg(spark, sf):
    """GAT-style attention layer: in-neighbor features averaged under
    a softmax over ln(edge amount) -- bigger trade routes attend
    harder.  Stable softmax via the order-free per-vertex max;
    decimal-exact weight and feature sums.  The attention sibling of
    g_neighborhood_agg (mean-pool GraphSAGE).  See
    operators.graph.attention_agg."""
    from .operators.graph import attention_agg, build_trade_graph
    g = build_trade_graph(spark, sf)
    return attention_agg(g, ["out_deg", "out_amount"])


def _edge_betweenness_sql(levels: int) -> str:
    """Reuse the betweenness path-count pyramid; the pair dependency
    lands on edges (dist(s,u) + 1 + dist(v,t) = dist(s,t)), endpoints
    included via the dist-0 closure rows."""
    base = _betweenness_sql(levels)
    tail_start = base.index(",\nsv AS (")
    return base[:tail_start] + """,
su AS (SELECT root AS s, id AS u, dist AS d1, npaths AS p1
       FROM closure),
vt AS (SELECT root AS vv, id AS t, dist AS d2, npaths AS p2
       FROM closure),
eb AS (
  SELECT e.src AS u, e.dst AS v,
         CAST(SUM(CAST(CAST(su.p1 * vt.p2 AS DOUBLE)
                       / CAST(st.npaths AS DOUBLE)
                       AS DECIMAL(27,12))) AS DOUBLE) AS bsum
  FROM top3 e
  JOIN su ON su.u = e.src
  JOIN vt ON vt.vv = e.dst
  JOIN closure st ON st.root = su.s AND st.id = vt.t
                 AND st.dist = su.d1 + 1 + vt.d2
  GROUP BY 1, 2
)
SELECT e.src, e.dst,
       ROUND(COALESCE(b.bsum, 0.0), 8) AS edge_betweenness
FROM top3 e LEFT JOIN eb b ON b.u = e.src AND b.v = e.dst"""


@register("g_edge_betweenness", _edge_betweenness_sql(_BETW_LEVELS))
def g_edge_betweenness(spark, sf):
    """Edge betweenness on the top-3-partner digraph -- the
    Girvan-Newman community-splitting score (which trade routes carry
    the most shortest paths).  Shares the path-counting BFS closure
    with g_betweenness.  See operators.graph.edge_betweenness."""
    from .operators.graph import Graph, edge_betweenness
    g = build_trade_graph(spark, sf).hold()
    n_verts = g.vertices.count()
    assert n_verts - 1 <= _BETW_LEVELS
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return edge_betweenness(Graph(g.vertices, top3))


@register("g_bridges", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
reach(ea, eb, id) AS (
  SELECT a, b, a FROM ue
  UNION
  SELECT r.ea, r.eb, s.b
  FROM reach r JOIN sym s ON s.a = r.id
  WHERE NOT (r.id = r.ea AND s.b = r.eb)
    AND NOT (r.id = r.eb AND s.b = r.ea)
)
SELECT u.a, u.b, h.id IS NULL AS is_bridge
FROM ue u
LEFT JOIN (SELECT DISTINCT ea, eb, id FROM reach WHERE id = eb) h
  ON h.ea = u.a AND h.eb = u.b
""")
def g_bridges(spark, sf):
    """Bridge (cut-edge) detection on the undirected top-3-partner
    graph: ONE exclusion-keyed batched BFS decides every edge at once
    -- the network's single points of failure.  See
    operators.graph.bridges."""
    from .operators.graph import Graph, bridges
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return bridges(Graph(g.vertices, top3))


_RC_K = 5


@register("g_rich_club", f"""
WITH {EDGES_CTE},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
deg AS (
  SELECT id, COUNT(*) AS k FROM (
    SELECT a AS id FROM ue UNION ALL SELECT b AS id FROM ue
  ) GROUP BY 1
),
rich AS (
  SELECT id FROM (
    SELECT id, ROW_NUMBER() OVER (ORDER BY k DESC, id) AS r FROM deg
  ) WHERE r <= {_RC_K}
),
amongst AS (
  SELECT COUNT(*) AS e_rich
  FROM ue JOIN rich ra ON ra.id = ue.a
          JOIN rich rb ON rb.id = ue.b
)
SELECT {_RC_K} AS k,
       (SELECT e_rich FROM amongst) AS edges_among_rich,
       {_RC_K * (_RC_K - 1) // 2} AS possible_edges,
       ROUND(CAST((SELECT e_rich FROM amongst) AS DOUBLE)
             / {float(_RC_K * (_RC_K - 1) // 2)!r}, 8)
         AS rich_club_coefficient
""")
def g_rich_club(spark, sf):
    """Rich-club coefficient: edge density among the ``_RC_K``
    highest-degree nations of the undirected top-3 graph -- do the
    hubs trade with EACH OTHER more than chance (the network-science
    elite-interconnection metric).  Degree ranking + one
    hub-restricted join; everything is dimension-sized."""
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    from .operators.graph import undirected_edges
    ue = (undirected_edges(top3.withColumnRenamed("src", "src")
                           .select("src", "dst"))
          .select("a", "b").distinct().localCheckpoint())
    deg = (ue.select(F.col("a").alias("id"))
           .union(ue.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("k")))
    w2 = Window.orderBy(F.desc("k"), F.asc("id"))
    rich = (deg.withColumn("__r", F.row_number().over(w2))
            .where(F.col("__r") <= _RC_K).select("id"))
    e_rich = (ue.join(rich.withColumnRenamed("id", "a"), "a")
              .join(rich.withColumnRenamed("id", "b"), "b").count())
    possible = _RC_K * (_RC_K - 1) // 2
    return spark.createDataFrame(
        [(_RC_K, e_rich, possible, round(e_rich / possible, 8))],
        "k int, edges_among_rich long, possible_edges int, "
        "rich_club_coefficient double")


_COLOR_ROUNDS, _COLOR_CANDS = _N_VERTS, _N_VERTS + 1


def _coloring_sql(rounds: int, cands: int) -> str:
    """Generate the Jones-Plassmann oracle: per round, local-max
    winners + smallest-unused-color pick + shrink, mirroring
    operators.graph.greedy_coloring (at least the global max priority
    wins each round, so |V| rounds converge)."""
    parts = [f"WITH {EDGES_CTE},", _TOP3_CTE.lstrip(), """,
ue AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM top3 WHERE src != dst),
sym AS (SELECT a, b FROM ue UNION SELECT b AS a, a AS b FROM ue),
u0 AS (SELECT id, md5(id) AS pri FROM verts),
colored0 AS (SELECT id, 0 AS color FROM verts WHERE FALSE)"""]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(f""",
w{k} AS MATERIALIZED (
  SELECT u.id FROM u{p} u
  WHERE NOT EXISTS (
    SELECT 1 FROM sym e JOIN u{p} n ON n.id = e.b
    WHERE e.a = u.id
      AND (n.pri > u.pri OR (n.pri = u.pri AND n.id > u.id)))
),
used{k} AS MATERIALIZED (
  SELECT DISTINCT w.id, c.color AS used
  FROM w{k} w
  JOIN sym e ON e.a = w.id
  JOIN colored{p} c ON c.id = e.b
),
pick{k} AS MATERIALIZED (
  SELECT cand.id, MIN(cand.c) AS color
  FROM (SELECT w.id, u2.c
        FROM w{k} w, unnest(range(0, {cands})) AS u2(c)) cand
  LEFT JOIN used{k} u ON u.id = cand.id AND u.used = cand.c
  WHERE u.used IS NULL
  GROUP BY 1
),
colored{k} AS MATERIALIZED (SELECT * FROM colored{p} UNION ALL
               SELECT * FROM pick{k}),
u{k} AS MATERIALIZED (
  SELECT u.* FROM u{p} u
  WHERE u.id NOT IN (SELECT id FROM w{k})
)""")
    parts.append(f"""
SELECT id, CAST(color AS INTEGER) AS color FROM colored{rounds}""")
    return "".join(parts)


@register("g_coloring", _coloring_sql(_COLOR_ROUNDS, _COLOR_CANDS))
def g_coloring(spark, sf):
    """Distance-1 greedy coloring (Jones-Plassmann, md5 priorities) of
    the undirected top-3-partner graph -- the parallel scheduling /
    conflict-partitioning primitive (vertices of one color form an
    independent set that can process concurrently).  See
    operators.graph.greedy_coloring."""
    from .operators.graph import Graph, greedy_coloring
    g = build_trade_graph(spark, sf)
    n_verts = g.vertices.count()
    assert n_verts <= _COLOR_ROUNDS, "raise _COLOR_ROUNDS to >= |V|"
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    out = greedy_coloring(Graph(g.vertices, top3),
                          max_colors=_COLOR_CANDS)
    return out.select("id", F.col("color").cast("int").alias("color"))


_PERC_KEEP = (75, 50, 25)  # percent of strongest edges kept


def _percolation_sql(keeps) -> str:
    """Generate the bond-percolation oracle: one recursive
    reachability closure per retention level over the weight-ranked
    undirected edge list."""
    parts = [f"""WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
t3a AS (
  SELECT e.src, e.dst, ed.amount
  FROM top3 e JOIN edges ed ON ed.src = e.src AND ed.dst = e.dst
),
ue AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         MAX(amount) AS am
  FROM t3a GROUP BY 1, 2
),
ranked AS (
  SELECT a, b,
         ROW_NUMBER() OVER (ORDER BY am DESC, a, b) AS r,
         COUNT(*) OVER () AS m
  FROM ue
)"""]
    sels = []
    for pct in keeps:
        parts.append(f""",
keep{pct} AS MATERIALIZED (
  SELECT a, b FROM ranked WHERE r <= CAST(floor(m * {pct} / 100.0)
                                          AS BIGINT)
),
sym{pct} AS (SELECT a, b FROM keep{pct}
             UNION ALL SELECT b, a FROM keep{pct}),
reach{pct}(root, id) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.root, e.b FROM reach{pct} r JOIN sym{pct} e ON e.a = r.id
),
comp{pct} AS (
  SELECT root, MIN(id) AS label
  FROM (SELECT id AS root, root AS id FROM reach{pct}) x
  GROUP BY root
),
big{pct} AS (
  SELECT COUNT(*) AS c FROM comp{pct} GROUP BY label
  ORDER BY c DESC LIMIT 1
)""")
        sels.append(f"""
SELECT {pct} AS pct_edges_kept,
       (SELECT COUNT(*) FROM keep{pct}) AS n_edges,
       (SELECT c FROM big{pct}) AS largest_component,
       ROUND(CAST((SELECT c FROM big{pct}) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM verts) AS DOUBLE), 8)
         AS largest_fraction""")
    parts.append("\nUNION ALL".join(sels))
    return "".join(parts)


@register("g_percolation", _percolation_sql(_PERC_KEEP))
def g_percolation(spark, sf):
    """Bond-percolation robustness curve: keep only the strongest
    75/50/25% of undirected trade edges and measure the largest
    connected component's share of vertices -- how fast does the
    network fragment as weak routes fail (the resilience sweep every
    infrastructure-graph study runs).  Spark side reuses
    connected_components per retention level; labels are min-id, so
    'largest component' is a deterministic count."""
    from .operators.graph import Graph, connected_components
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    t3 = (g.edges.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") <= 3).select("src", "dst", "amount"))
    ue = (t3.groupBy(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
          .agg(F.max("amount").alias("am")))
    wr = Window.orderBy(F.desc("am"), F.asc("a"), F.asc("b"))
    ranked = (ue.withColumn("r", F.row_number().over(wr))
              .localCheckpoint())
    m = ranked.count()
    n_verts = g.vertices.count()
    rows = []
    for pct in _PERC_KEEP:
        keep = ranked.where(F.col("r") <= int(m * pct // 100)) \
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        n_edges = keep.count()
        comp = connected_components(Graph(g.vertices, keep))
        big = (comp.groupBy("component").agg(F.count(F.lit(1)).alias("c"))
               .agg(F.max("c")).first()[0])
        rows.append((pct, n_edges, big, round(big / n_verts, 8)))
    return spark.createDataFrame(
        rows, "pct_edges_kept int, n_edges long, largest_component long, "
        "largest_fraction double")


@register("g_degree_distribution", f"""
WITH {EDGES_CTE},
deg AS (
  SELECT v.id, COALESCE(o.d, 0) AS out_deg
  FROM verts v
  LEFT JOIN (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1) o
    ON o.src = v.id
),
hist AS (
  SELECT out_deg AS degree, COUNT(*) AS n_vertices
  FROM deg GROUP BY 1
),
fit AS (
  SELECT regr_slope(ln(CAST(n_vertices AS DOUBLE)),
                    ln(CAST(degree AS DOUBLE))) AS slope
  FROM hist WHERE degree > 0
)
SELECT h.degree, h.n_vertices,
       ROUND((SELECT slope FROM fit), 8) AS loglog_slope
FROM hist h
""")
def g_degree_distribution(spark, sf):
    """Out-degree distribution of the trade digraph with the log-log
    least-squares slope over the positive-degree buckets -- the
    power-law-tail diagnostic (slope ~ -2..-3 = scale-free; the trade
    graph is near-complete so the slope exposes that immediately).
    Histogram is degree-bucket-sized; the slope is one regr_slope
    aggregate, broadcast back onto every bucket row."""
    from .operators.graph import build_trade_graph
    g = build_trade_graph(spark, sf)
    deg = (g.vertices.select("id")
           .join(g.edges.groupBy(F.col("src").alias("id"))
                 .agg(F.count(F.lit(1)).alias("d")), "id", "left")
           .select(F.coalesce("d", F.lit(0)).alias("out_deg")))
    hist = (deg.groupBy(F.col("out_deg").alias("degree"))
            .agg(F.count(F.lit(1)).alias("n_vertices"))
            .localCheckpoint())
    fit = (hist.where(F.col("degree") > 0)
           .agg(F.regr_slope(
               F.log(F.col("n_vertices").cast("double")),
               F.log(F.col("degree").cast("double"))).alias("slope")))
    return (hist.crossJoin(F.broadcast(fit))
            .select("degree", "n_vertices",
                    F.round("slope", 8).alias("loglog_slope")))


_VR_K = 5


def _voterank_sql(k: int) -> str:
    """Generate the VoteRank oracle: per election round, the decimal
    vote sum + argmax + voting-ability update as CTEs.  delta =
    1 / mean-degree computed from the same integer counts."""
    parts = [f"WITH {EDGES_CTE},", _TOP3_CTE.lstrip(), """,
ue AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
dlt AS (SELECT 1.0 / (2.0 * (SELECT COUNT(*) FROM ue)
                      / CAST((SELECT COUNT(*) FROM verts) AS DOUBLE))
          AS d),
va0 AS (SELECT id, 1.0::DOUBLE AS va FROM verts),
sel0 AS (SELECT id FROM verts WHERE FALSE)"""]
    for r in range(1, k + 1):
        p = r - 1
        parts.append(f""",
score{r} AS MATERIALIZED (
  SELECT s.a AS id,
         CAST(SUM(CAST(v.va AS DECIMAL(27,12))) AS DOUBLE) AS votes
  FROM sym s JOIN va{p} v ON v.id = s.b
  WHERE s.a NOT IN (SELECT id FROM sel{p})
  GROUP BY 1
),
pick{r} AS MATERIALIZED (
  SELECT id, {r} AS vote_round, ROUND(votes, 8) AS votes, votes AS raw
  FROM (SELECT id, votes,
               ROW_NUMBER() OVER (ORDER BY votes DESC, id) AS rr
        FROM score{r}) WHERE rr = 1
),
va{r} AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN v.id IN (SELECT id FROM pick{r}) THEN 0.0
              WHEN EXISTS (SELECT 1 FROM sym s
                           JOIN pick{r} pk ON pk.id = s.a
                           WHERE s.b = v.id)
              THEN GREATEST(0.0, v.va - (SELECT d FROM dlt))
              ELSE v.va END AS va
  FROM va{p} v
),
sel{r} AS (SELECT id FROM sel{p} UNION ALL SELECT id FROM pick{r})"""
                     )
    union = "\nUNION ALL ".join(
        f"SELECT id, vote_round, votes FROM pick{r}"
        for r in range(1, k + 1))
    parts.append(f"\n{union}")
    return "".join(parts)


@register("g_voterank", _voterank_sql(_VR_K))
def g_voterank(spark, sf):
    """VoteRank top-5 influential spreaders on the undirected
    top-3-partner graph: elected one per round, each election draining
    its neighborhood's voting ability -- seeds that SPREAD rather than
    cluster (the influence-maximization sibling of the centrality
    family).  See operators.graph.voterank."""
    from .operators.graph import Graph, voterank
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    return voterank(Graph(g.vertices, top3), k=_VR_K)


@register("g_graph_card", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
n AS (SELECT COUNT(*) AS n FROM verts),
m AS (SELECT COUNT(*) AS m FROM top3),
recip AS (
  SELECT COUNT(*) AS r FROM top3 a
  WHERE EXISTS (SELECT 1 FROM top3 b
                WHERE b.src = a.dst AND b.dst = a.src)
),
ue AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM top3 WHERE src != dst),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b, a FROM ue),
cc(root, id) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.root, e.b FROM cc r JOIN sym e ON e.a = r.id
),
comp AS (
  SELECT id, MIN(root) AS label
  FROM (SELECT id AS root, root AS id FROM cc) x GROUP BY id
),
ncomp AS (SELECT COUNT(DISTINCT label) AS c FROM comp),
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY 1, 2
),
paths AS (
  SELECT COUNT(*) AS np, MAX(dist) AS diam, SUM(dist) AS sd
  FROM mind WHERE dist > 0
)
SELECT (SELECT n FROM n) AS n_vertices,
       (SELECT m FROM m) AS n_edges,
       ROUND(CAST((SELECT m FROM m) AS DOUBLE)
             / ((SELECT n FROM n) * ((SELECT n FROM n) - 1.0)), 8)
         AS density,
       ROUND(CAST((SELECT r FROM recip) AS DOUBLE)
             / (SELECT m FROM m), 8) AS reciprocity,
       (SELECT c FROM ncomp) AS n_components,
       (SELECT diam FROM paths) AS directed_diameter,
       ROUND(CAST((SELECT sd FROM paths) AS DOUBLE)
             / (SELECT np FROM paths), 8) AS avg_path_len
FROM (SELECT 1)
""")
def g_graph_card(spark, sf):
    """One-row graph card for the top-3-partner digraph: order, size,
    density, reciprocity, undirected component count, directed
    diameter, mean shortest path -- the dataset-card analog for the
    graph surface, composed from the SAME kernels the individual
    entries verify (degrees, CC, multi-root BFS)."""
    from .operators.graph import (Graph, _multi_root_bfs,
                                  connected_components)
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst")
            .localCheckpoint())
    graph = Graph(g.vertices, top3)
    n = g.vertices.count()
    m = top3.count()
    rev = top3.select(F.col("dst").alias("src"),
                      F.col("src").alias("dst"))
    recip = top3.join(rev, ["src", "dst"], "left_semi").count()
    ncomp = (connected_components(graph)
             .select("component").distinct().count())
    closure = _multi_root_bfs(graph, None, 25, directed=True)
    paths = (closure.where(F.col("dist") > 0)
             .agg(F.count(F.lit(1)).alias("np"),
                  F.max("dist").alias("diam"),
                  F.sum("dist").alias("sd")).first())
    return spark.createDataFrame(
        [(n, m, round(m / (n * (n - 1.0)), 8), round(recip / m, 8),
          ncomp, paths["diam"],
          round(paths["sd"] / paths["np"], 8))],
        "n_vertices long, n_edges long, density double, "
        "reciprocity double, n_components long, "
        "directed_diameter int, avg_path_len double")


@register("g_center_periphery", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY 1, 2
),
ecc AS (
  SELECT root AS id, MAX(dist) AS eccentricity
  FROM mind WHERE dist > 0 GROUP BY root
),
bounds AS (
  SELECT MIN(eccentricity) AS radius, MAX(eccentricity) AS diameter
  FROM ecc
)
SELECT e.id, e.eccentricity,
       e.eccentricity = (SELECT radius FROM bounds) AS is_center,
       e.eccentricity = (SELECT diameter FROM bounds) AS is_periphery
FROM ecc e
""")
def g_center_periphery(spark, sf):
    """Center/periphery classification: vertices whose eccentricity
    equals the radius are the graph CENTER (best worst-case reach --
    facility-location seeds); diameter-eccentricity vertices are the
    PERIPHERY.  One multi-root BFS closure + two scalar bounds."""
    from .operators.graph import Graph, closeness_centrality
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    ecc = (closeness_centrality(Graph(g.vertices, top3))
           .where(F.col("eccentricity").isNotNull())
           .select("id", "eccentricity").localCheckpoint())
    bounds = ecc.agg(F.min("eccentricity").alias("radius"),
                     F.max("eccentricity").alias("diameter"))
    return (ecc.crossJoin(F.broadcast(bounds))
            .select("id", "eccentricity",
                    (F.col("eccentricity") == F.col("radius"))
                    .alias("is_center"),
                    (F.col("eccentricity") == F.col("diameter"))
                    .alias("is_periphery")))


@register("g_effective_diameter", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY 1, 2
),
pairs AS (SELECT dist FROM mind WHERE dist > 0)
SELECT COUNT(*) AS n_reachable_pairs,
       MAX(dist) AS diameter,
       ROUND(quantile_cont(CAST(dist AS DOUBLE), 0.9), 6)
         AS effective_diameter_90
FROM pairs
""")
def g_effective_diameter(spark, sf):
    """Effective (90th-percentile) diameter: the robust small-world
    metric (the max-distance diameter is one weird pair; the 90th
    percentile is what 'six degrees' measurements actually report).
    Same BFS closure as g_diameter + one interpolated percentile."""
    from .operators.graph import Graph, _multi_root_bfs
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    closure = _multi_root_bfs(Graph(g.vertices, top3), None, 25, True)
    pairs = closure.where(F.col("dist") > 0)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_reachable_pairs"),
        F.max("dist").alias("diameter"),
        F.round(F.percentile(F.col("dist").cast("double"),
                             F.lit(0.9)), 6)
        .alias("effective_diameter_90"))


@register("g_motifs_directed", f"""
WITH {EDGES_CTE},
{_TOP3_CTE.lstrip()},
ffl AS (
  SELECT COUNT(*) AS n FROM top3 e1
  JOIN top3 e2 ON e2.src = e1.dst
  JOIN top3 e3 ON e3.src = e1.src AND e3.dst = e2.dst
  WHERE e1.src != e2.dst
),
fbl AS (
  SELECT COUNT(*) AS n FROM top3 e1
  JOIN top3 e2 ON e2.src = e1.dst
  JOIN top3 e3 ON e3.src = e2.dst AND e3.dst = e1.src
  WHERE e1.src < e1.dst AND e1.src < e2.dst
),
mutual AS (
  SELECT COUNT(*) AS n FROM top3 a
  JOIN top3 b ON b.src = a.dst AND b.dst = a.src
  WHERE a.src < a.dst
)
SELECT (SELECT n FROM ffl) AS feed_forward_loops,
       (SELECT n FROM fbl) AS feedback_loops,
       (SELECT n FROM mutual) AS mutual_dyads
FROM (SELECT 1)
""")
def g_motifs_directed(spark, sf):
    """Directed triad motif census on the top-3-partner digraph:
    feed-forward loops (A->B->C with the A->C shortcut -- the
    dominance motif), feedback 3-cycles (counted once via the
    smallest-vertex anchor), and mutual dyads -- the motif-level
    fingerprint undirected triangle counts cannot see.  Three
    edge-keyed joins, never vertex-cubed."""
    from .operators.graph import build_trade_graph
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    t3 = (g.edges.withColumn("rn", F.row_number().over(w))
          .where(F.col("rn") <= 3).select("src", "dst")
          .localCheckpoint())
    e1 = t3.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = t3.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3f = t3.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    ffl = (e1.join(e2, "b").join(e3f, ["a", "c"])
           .where(F.col("a") != F.col("c")).count())
    e3b = t3.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    fbl = (e1.join(e2, "b").join(e3b, ["c", "a"])
           .where((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
           .count())
    rev = t3.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = (t3.join(rev, ["src", "dst"], "left_semi")
              .where(F.col("src") < F.col("dst")).count())
    return spark.createDataFrame(
        [(ffl, fbl, mutual)],
        "feed_forward_loops long, feedback_loops long, "
        "mutual_dyads long")


@register("g_bowtie", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_COST_CTE.lstrip()},
e AS (SELECT src, dst FROM top3 WHERE src != dst),
reach(a, b) AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
scc AS (
  SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc_id
  FROM verts v LEFT JOIN mutual m ON m.u = v.id
  GROUP BY v.id
),
core AS (
  SELECT scc_id FROM (
    SELECT scc_id, COUNT(*) AS sz,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, scc_id) AS r
    FROM scc GROUP BY scc_id) WHERE r = 1
),
core_ids AS (SELECT id FROM scc WHERE scc_id = (SELECT scc_id
                                                FROM core)),
into_core AS (
  SELECT DISTINCT r.a AS id FROM reach r
  JOIN core_ids c ON c.id = r.b
),
from_core AS (
  SELECT DISTINCT r.b AS id FROM reach r
  JOIN core_ids c ON c.id = r.a
)
SELECT v.id,
       CASE WHEN v.id IN (SELECT id FROM core_ids) THEN 'CORE'
            WHEN v.id IN (SELECT id FROM into_core) THEN 'IN'
            WHEN v.id IN (SELECT id FROM from_core) THEN 'OUT'
            ELSE 'OTHER' END AS bowtie_class
FROM verts v
""")
def g_bowtie(spark, sf):
    """Bow-tie macro-structure of the trade digraph (Broder et al.):
    the largest strongly connected component is the CORE; IN reaches
    it, OUT is reached from it, everything else is OTHER -- the
    structural map that explains where flow can and cannot circulate.
    Composes the verified SCC labels with the directed reachability
    closure; all joins are closure-sized."""
    from .operators.graph import (Graph, _multi_root_bfs,
                                  strongly_connected_components)
    g, top3 = _top3_cost(spark, sf)
    graph = Graph(g.vertices, top3.select("src", "dst"))
    scc = strongly_connected_components(graph).localCheckpoint()
    w = Window.orderBy(F.desc("sz"), F.asc("scc_id"))
    core_label = (scc.groupBy("scc_id")
                  .agg(F.count(F.lit(1)).alias("sz"))
                  .withColumn("__r", F.row_number().over(w))
                  .where(F.col("__r") == 1).select("scc_id"))
    core_ids = (scc.join(F.broadcast(core_label), "scc_id")
                .select("id").localCheckpoint())
    closure = _multi_root_bfs(graph, None, 25, directed=True) \
        .where(F.col("dist") > 0).localCheckpoint()
    into_core = (closure.join(core_ids.withColumnRenamed("id", "cid"),
                              closure.id == F.col("cid"))
                 .select(F.col("root").alias("id")).distinct())
    from_core = (closure.join(core_ids.withColumnRenamed("id", "cid"),
                              closure.root == F.col("cid"))
                 .select(F.col("id")).distinct())
    return (g.vertices.select("id")
            .join(core_ids.withColumn("__core", F.lit(1)), "id", "left")
            .join(into_core.withColumn("__in", F.lit(1)), "id", "left")
            .join(from_core.withColumn("__out", F.lit(1)), "id", "left")
            .select("id",
                    F.when(F.col("__core").isNotNull(), "CORE")
                    .when(F.col("__in").isNotNull(), "IN")
                    .when(F.col("__out").isNotNull(), "OUT")
                    .otherwise("OTHER").alias("bowtie_class")))


@register("g_local_bridges", f"""
WITH {EDGES_CTE},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
common AS (
  SELECT e.a, e.b, COUNT(*) AS n_common
  FROM ue e
  JOIN sym x ON x.a = e.a
  JOIN sym y ON y.a = e.b AND y.b = x.b
  GROUP BY e.a, e.b
)
SELECT e.a, e.b,
       COALESCE(c.n_common, 0) AS n_common_neighbors,
       COALESCE(c.n_common, 0) = 0 AS is_local_bridge
FROM ue e LEFT JOIN common c ON c.a = e.a AND c.b = e.b
""")
def g_local_bridges(spark, sf):
    """Local bridges (Granovetter's weak ties): undirected edges whose
    endpoints share NO common neighbor -- removing one lengthens the
    a-b path to > 2, so these are the shortcuts between otherwise
    separate neighborhoods (the tie-strength theory workhorse).  One
    wedge join per edge; the global-bridge strict form is g_bridges."""
    from graphdb_cia_factbook_spark.operators.graph import (
        undirected_edges)
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    ue = (undirected_edges(top3).select("a", "b").distinct()
          .localCheckpoint())
    sym = ue.union(ue.select(F.col("b").alias("a"),
                             F.col("a").alias("b")))
    x = sym.select(F.col("a").alias("a"), F.col("b").alias("n1"))
    y = sym.select(F.col("a").alias("b"), F.col("b").alias("n2"))
    common = (ue.join(x, "a").join(y, "b")
              .where(F.col("n1") == F.col("n2"))
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    return (ue.join(common, ["a", "b"], "left")
            .select("a", "b",
                    F.coalesce("n_common", F.lit(0))
                    .alias("n_common_neighbors"),
                    (F.coalesce("n_common", F.lit(0)) == 0)
                    .alias("is_local_bridge")))


@register("g_rank_agreement", f"""
WITH {EDGES_CTE},
deg AS (
  SELECT v.id,
         COALESCE(o.d, 0) AS out_deg,
         COALESCE(o.amt, 0.0) AS out_amount
  FROM verts v
  LEFT JOIN (SELECT src, COUNT(*) AS d,
                    CAST(SUM(CAST(amount AS DECIMAL(27,4))) AS DOUBLE)
                      AS amt
             FROM edges GROUP BY 1) o ON o.src = v.id
),
ranked AS (
  SELECT id,
         ROW_NUMBER() OVER (ORDER BY out_deg, id) AS rx,
         ROW_NUMBER() OVER (ORDER BY out_amount, id) AS ry
  FROM deg
),
pairs AS (
  SELECT CASE WHEN (a.rx - b.rx) * (a.ry - b.ry) > 0 THEN 1
              WHEN (a.rx - b.rx) * (a.ry - b.ry) < 0 THEN -1
              ELSE 0 END AS s
  FROM ranked a JOIN ranked b ON a.id < b.id
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS concordant,
       CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS discordant,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 8) AS kendall_tau
FROM pairs
""")
def g_rank_agreement(spark, sf):
    """Kendall tau between the out-degree and export-volume rankings
    of nations: do the two notions of 'biggest trader' order countries
    the same way?  Exact concordant/discordant pair counts (the
    all-pairs join is vertex-squared -- fine on dimension-sized
    rankings, sample at web scale); completes the rank-statistics
    family next to Spearman."""
    g = build_trade_graph(spark, sf).hold()
    from pyspark.sql import Window as W
    deg = (g.vertices.select("id")
           .join(g.edges.groupBy(F.col("src").alias("id"))
                 .agg(F.count(F.lit(1)).alias("d"),
                      F.sum(F.col("amount").cast("decimal(27,4)"))
                      .cast("double").alias("amt")), "id", "left")
           .select("id", F.coalesce("d", F.lit(0)).alias("out_deg"),
                   F.coalesce("amt", F.lit(0.0)).alias("out_amount")))
    ranked = deg.select(
        "id",
        F.row_number().over(W.orderBy("out_deg", "id")).alias("rx"),
        F.row_number().over(W.orderBy("out_amount", "id")).alias("ry"))
    a = ranked.select(F.col("id").alias("ia"), F.col("rx").alias("xa"),
                      F.col("ry").alias("ya"))
    b = ranked.select(F.col("id").alias("ib"), F.col("rx").alias("xb"),
                      F.col("ry").alias("yb"))
    s = (F.when((F.col("xa") - F.col("xb"))
                * (F.col("ya") - F.col("yb")) > 0, 1)
         .when((F.col("xa") - F.col("xb"))
               * (F.col("ya") - F.col("yb")) < 0, -1).otherwise(0))
    # ranking tables are dimension-sized: broadcast one side so the
    # non-equi pair join plans as BroadcastNestedLoop, never Cartesian
    pairs = (a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
             .select(s.alias("s")))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long")
        .alias("concordant"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("long")
        .alias("discordant"),
        F.round(F.sum("s").cast("double") / F.count(F.lit(1)), 8)
        .alias("kendall_tau"))


@register("g_constraint", f"""
WITH {EDGES_CTE},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
deg AS (SELECT a AS id, COUNT(*) AS d FROM sym GROUP BY 1),
p AS (
  SELECT s.a AS i, s.b AS j,
         1.0 / CAST(d.d AS DOUBLE) AS pij
  FROM sym s JOIN deg d ON d.id = s.a
),
indirect AS (
  SELECT p1.i, p2.j,
         CAST(SUM(CAST(p1.pij * p2.pij AS DECIMAL(27,12)))
              AS DOUBLE) AS piq_pqj
  FROM p p1 JOIN p p2 ON p2.i = p1.j
  WHERE p2.j != p1.i
  GROUP BY p1.i, p2.j
),
cterm AS (
  SELECT d.i, (d.pij + COALESCE(ind.piq_pqj, 0.0))
               * (d.pij + COALESCE(ind.piq_pqj, 0.0)) AS term
  FROM p d
  LEFT JOIN indirect ind ON ind.i = d.i AND ind.j = d.j
)
SELECT i AS id,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE), 8)
         AS constraint_score
FROM cterm GROUP BY i
""")
def g_constraint(spark, sf):
    """Burt's network constraint (structural holes): how redundant a
    nation's trade contacts are -- high constraint means its partners
    all trade with EACH OTHER (no brokerage opportunity); low means it
    bridges holes.  c_i = sum_j (p_ij + sum_q p_iq p_qj)^2 over
    uniform-weight proportions; the indirect term is one
    proportion-table self-join, decimal-exact sums."""
    from .operators.graph import undirected_edges
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    ue = (undirected_edges(top3).select("a", "b").distinct()
          .localCheckpoint())
    sym = ue.union(ue.select(F.col("b").alias("a"),
                             F.col("a").alias("b"))).localCheckpoint()
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    p = (sym.join(deg.withColumnRenamed("id", "a"), "a")
         .select(F.col("a").alias("i"), F.col("b").alias("j"),
                 (F.lit(1.0) / F.col("d").cast("double")).alias("pij"))
         .localCheckpoint())
    p1 = p.select(F.col("i"), F.col("j").alias("q"),
                  F.col("pij").alias("piq"))
    p2 = p.select(F.col("i").alias("q"), F.col("j"),
                  F.col("pij").alias("pqj"))
    indirect = (p1.join(p2, "q")
                .where(F.col("j") != F.col("i"))
                .groupBy("i", "j")
                .agg(F.sum((F.col("piq") * F.col("pqj"))
                           .cast("decimal(27,12)")).cast("double")
                     .alias("piq_pqj")))
    term = ((F.col("pij") + F.coalesce("piq_pqj", F.lit(0.0)))
            * (F.col("pij") + F.coalesce("piq_pqj", F.lit(0.0))))
    return (p.join(indirect, ["i", "j"], "left")
            .select(F.col("i").alias("id"), term.alias("term"))
            .groupBy("id")
            .agg(F.round(F.sum(F.col("term").cast("decimal(27,12)"))
                         .cast("double"), 8).alias("constraint_score")))


@register("g_degree_assortativity", f"""
WITH {EDGES_CTE},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
deg AS (SELECT a AS id, COUNT(*) AS d FROM sym GROUP BY 1),
ends AS (
  SELECT CAST(da.d AS DOUBLE) AS x, CAST(db.d AS DOUBLE) AS y
  FROM sym e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
),
mom AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(27,4))
                  * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(27,4))
                  * CAST(x AS DECIMAL(27,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(27,4))
                  * CAST(y AS DECIMAL(27,4))) AS DOUBLE) AS syy
  FROM ends
)
SELECT n AS n_edge_ends,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 8)
         AS degree_assortativity
FROM mom
""")
def g_degree_assortativity(spark, sf):
    """Newman degree assortativity: Pearson correlation of endpoint
    DEGREES over every directed edge-end of the undirected top-3 graph
    (positive = hubs befriend hubs, negative = hub-and-spoke) -- the
    degree-mixing companion to the strength variant (g_assortativity)
    and the rich-club coefficient.  Decimal-exact moments over exact
    integer degrees."""
    from .operators.graph import undirected_edges
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    ue = (undirected_edges(top3).select("a", "b").distinct()
          .localCheckpoint())
    sym = ue.union(ue.select(F.col("b").alias("a"),
                             F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    ends = (sym.join(deg.withColumnRenamed("id", "a")
                     .withColumnRenamed("d", "x"), "a")
            .join(deg.withColumnRenamed("id", "b")
                  .withColumnRenamed("d", "y"), "b")
            .select(F.col("x").cast("double").alias("x"),
                    F.col("y").cast("double").alias("y")))
    dx = F.col("x").cast("decimal(27,4)")
    dy = F.col("y").cast("decimal(27,4)")
    mom = ends.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(dx).cast("double").alias("sx"),
                   F.sum(dy).cast("double").alias("sy"),
                   F.sum(dx * dy).cast("double").alias("sxy"),
                   F.sum(dx * dx).cast("double").alias("sxx"),
                   F.sum(dy * dy).cast("double").alias("syy"))
    n = F.col("n").cast("double")
    r = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
         / F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx"))
                  * (n * F.col("syy") - F.col("sy") * F.col("sy"))))
    return mom.select(F.col("n").alias("n_edge_ends"),
                      F.round(r, 8).alias("degree_assortativity"))


@register("g_centralization", f"""
WITH {EDGES_CTE},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
deg AS (
  SELECT v.id, COALESCE(d.d, 0) AS d
  FROM verts v
  LEFT JOIN (SELECT a AS id, COUNT(*) AS d FROM sym GROUP BY 1) d
    ON d.id = v.id
),
s AS (
  SELECT COUNT(*) AS n, MAX(d) AS dmax,
         CAST(SUM(d) AS BIGINT) AS dsum
  FROM deg
)
SELECT n, dmax AS max_degree,
       ROUND(CAST(dsum AS DOUBLE) / n, 8) AS mean_degree,
       ROUND(CAST(n * dmax - dsum AS DOUBLE)
             / ((n - 1.0) * (n - 2.0)), 8)
         AS degree_centralization
FROM s
""")
def g_centralization(spark, sf):
    """Freeman degree centralization of the undirected top-3 graph:
    how star-like the network is (1 = perfect star, 0 = regular) --
    the one-number hub-dominance summary computed as the normalized
    deviation of degrees from the maximum.  Exact integer degree
    sums."""
    from .operators.graph import undirected_edges
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    ue = undirected_edges(top3).select("a", "b").distinct()
    sym = ue.union(ue.select(F.col("b").alias("a"),
                             F.col("a").alias("b")))
    deg = (g.vertices.select("id")
           .join(sym.groupBy(F.col("a").alias("id"))
                 .agg(F.count(F.lit(1)).alias("d")), "id", "left")
           .select(F.coalesce("d", F.lit(0)).alias("d")))
    s = deg.agg(F.count(F.lit(1)).alias("n"),
                F.max("d").alias("dmax"),
                F.sum("d").cast("long").alias("dsum"))
    return s.select(
        "n", F.col("dmax").alias("max_degree"),
        F.round(F.col("dsum").cast("double") / F.col("n"), 8)
        .alias("mean_degree"),
        F.round((F.col("n") * F.col("dmax") - F.col("dsum"))
                .cast("double")
                / ((F.col("n") - 1.0) * (F.col("n") - 2.0)), 8)
        .alias("degree_centralization"))


@register("g_hop_plot", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
reach(root, id, dist) AS (
  SELECT id, id, 0 FROM verts
  UNION
  SELECT r.root, e.dst, r.dist + 1
  FROM reach r JOIN top3 e ON e.src = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach GROUP BY 1, 2
),
hist AS (
  SELECT dist, COUNT(*) AS n_pairs FROM mind WHERE dist > 0 GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_pairs) AS DOUBLE) AS t FROM hist)
SELECT h.dist AS hop, h.n_pairs,
       ROUND(CAST(SUM(h.n_pairs) OVER (ORDER BY h.dist
                                       ROWS UNBOUNDED PRECEDING)
                  AS DOUBLE) / (SELECT t FROM tot), 8)
         AS cum_pair_fraction
FROM hist h
""")
def g_hop_plot(spark, sf):
    """Hop plot of the top-3-partner digraph: reachable-pair counts by
    shortest distance with the cumulative fraction -- the
    neighborhood-growth curve (how fast the small world saturates)
    that effective-diameter reads one point from.  Same BFS closure,
    distance-histogram-sized output."""
    from .operators.graph import Graph, _multi_root_bfs
    from pyspark.sql import Window as W
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    closure = _multi_root_bfs(Graph(g.vertices, top3), None, 25, True)
    hist = (closure.where(F.col("dist") > 0)
            .groupBy(F.col("dist").alias("hop"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .localCheckpoint())
    tot = hist.agg(F.sum("n_pairs").cast("double").alias("t"))
    w_cum = W.orderBy("hop").rowsBetween(W.unboundedPreceding, 0)
    return (hist.crossJoin(F.broadcast(tot))
            .select("hop", "n_pairs",
                    F.round(F.sum("n_pairs").over(w_cum).cast("double")
                            / F.col("t"), 8)
                    .alias("cum_pair_fraction")))


@register("g_small_world", f"""
WITH RECURSIVE {EDGES_CTE.lstrip()},
{_TOP3_CTE.lstrip()},
ue AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM top3 WHERE src != dst
),
sym AS (SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue),
wedges AS (
  SELECT x.a AS u, x.b AS c, y.b AS v
  FROM sym x JOIN sym y ON x.a = y.a AND x.b < y.b
),
tri AS (
  SELECT COUNT(*) AS closed FROM wedges w
  WHERE EXISTS (SELECT 1 FROM sym e
                WHERE e.a = w.c AND e.b = w.v)
),
wt AS (SELECT COUNT(*) AS total FROM wedges),
reach(root, id, dist) AS (
  SELECT a, b, 1 FROM sym
  UNION
  SELECT r.root, e.b, r.dist + 1
  FROM reach r JOIN sym e ON e.a = r.id
  WHERE r.dist < 25
),
mind AS (
  SELECT root, id, MIN(dist) AS dist FROM reach
  WHERE root != id GROUP BY 1, 2
),
lstat AS (
  SELECT CAST(SUM(dist) AS DOUBLE) / COUNT(*) AS l_actual FROM mind
),
gstat AS (
  SELECT CAST((SELECT COUNT(*) FROM verts) AS DOUBLE) AS n,
         2.0 * (SELECT COUNT(*) FROM ue)
         / CAST((SELECT COUNT(*) FROM verts) AS DOUBLE) AS k
)
SELECT ROUND((SELECT CAST(closed AS DOUBLE) FROM tri)
             / (SELECT total FROM wt), 8) AS clustering_c,
       ROUND((SELECT k FROM gstat) / (SELECT n FROM gstat), 8)
         AS c_random,
       ROUND((SELECT l_actual FROM lstat), 8) AS path_l,
       ROUND(ln((SELECT n FROM gstat)) / ln((SELECT k FROM gstat)), 8)
         AS l_random,
       ROUND(((SELECT CAST(closed AS DOUBLE) FROM tri)
              / (SELECT total FROM wt)
              / ((SELECT k FROM gstat) / (SELECT n FROM gstat)))
             / ((SELECT l_actual FROM lstat)
                / (ln((SELECT n FROM gstat))
                   / ln((SELECT k FROM gstat)))), 8)
         AS small_world_sigma
FROM (SELECT 1)
""")
def g_small_world(spark, sf):
    """Small-world coefficient sigma = (C/C_rand)/(L/L_rand) with the
    analytic Erdos-Renyi baselines (C_rand = <k>/n, L_rand =
    ln n / ln <k>): sigma >> 1 = Watts-Strogatz small world (clustered
    AND short).  Composes the verified transitivity and
    undirected-path kernels into the one-number regime test."""
    from .operators.graph import Graph, _multi_root_bfs, undirected_edges
    g = build_trade_graph(spark, sf)
    w = Window.partitionBy("src").orderBy(F.desc("amount"), F.asc("dst"))
    top3 = (g.edges.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).select("src", "dst"))
    ue = (undirected_edges(top3).select("a", "b").distinct()
          .localCheckpoint())
    sym = ue.union(ue.select(F.col("b").alias("a"),
                             F.col("a").alias("b"))).localCheckpoint()
    x = sym.select(F.col("a").alias("u"), F.col("b").alias("c"))
    y = sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
    wedges = (x.join(y, "u").where(F.col("c") < F.col("v"))
              .localCheckpoint())
    closer = sym.select(F.col("a").alias("c"), F.col("b").alias("v"))
    closed = wedges.join(closer, ["c", "v"], "left_semi").count()
    total = wedges.count()
    n = g.vertices.count()
    m = ue.count()
    k = 2.0 * m / n
    closure = _multi_root_bfs(Graph(g.vertices, top3), None, 25,
                              directed=False)
    lrow = (closure.where(F.col("dist") > 0)
            .agg((F.sum("dist").cast("double")
                  / F.count(F.lit(1))).alias("l")).first())
    import math
    c_actual = closed / total
    c_rand = k / n
    l_actual = lrow["l"]
    l_rand = math.log(n) / math.log(k)
    sigma = (c_actual / c_rand) / (l_actual / l_rand)
    return spark.createDataFrame(
        [(round(c_actual, 8), round(c_rand, 8), round(l_actual, 8),
          round(l_rand, 8), round(sigma, 8))],
        "clustering_c double, c_random double, path_l double, "
        "l_random double, small_world_sigma double")


@register("g_edge_weight_gini", f"""
WITH {EDGES_CTE},
ranked AS (
  SELECT amount,
         ROW_NUMBER() OVER (ORDER BY amount, src, dst) AS i,
         COUNT(*) OVER () AS n,
         CAST(SUM(CAST(amount AS DECIMAL(27,4))) OVER () AS DOUBLE)
           AS tot
  FROM edges
)
SELECT MAX(n) AS n_edges,
       ROUND((2.0 * CAST(SUM(CAST(i * amount AS DECIMAL(27,4)))
                         AS DOUBLE))
             / (MAX(n) * MAX(tot))
             - (CAST(MAX(n) AS DOUBLE) + 1.0) / MAX(n), 8)
         AS edge_weight_gini
FROM ranked
""")
def g_edge_weight_gini(spark, sf):
    """Gini concentration of trade-route weights: is world trade a few
    giant corridors or many equal flows?  The edge-level companion to
    the per-nation spend concentration (agg_concentration) -- the same
    rank formula over the (amount, src, dst) total order, edge-table
    sized."""
    from pyspark.sql import Window as W
    g = build_trade_graph(spark, sf)
    w = W.orderBy("amount", "src", "dst")
    wt = W.partitionBy()
    ranked = (g.edges
              .withColumn("i", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(wt))
              .withColumn("tot", F.sum(F.col("amount")
                                       .cast("decimal(27,4)"))
                          .over(wt).cast("double")))
    gini = (F.lit(2.0)
            * F.sum((F.col("i") * F.col("amount"))
                    .cast("decimal(27,4)")).cast("double")
            / (F.max("n") * F.max("tot"))
            - (F.max("n").cast("double") + 1.0) / F.max("n"))
    return ranked.agg(F.max("n").alias("n_edges"),
                      F.round(gini, 8).alias("edge_weight_gini"))


# ---------------------------------------------------------------------------
# temporal graph: time-respecting reachability over event co-occurrence
# ---------------------------------------------------------------------------

_TEMP_ROUNDS, _TEMP_BUCKET_US, _TEMP_BUCKET_CAP = 6, 300_000_000, 1000
_TEMP_BIG = 1 << 62


def _temporal_sql(rounds: int) -> str:
    """Generate the temporal-reachability oracle: per-superstep CTE
    twins of operators.graph.temporal_reachability (LEFT-JOIN min
    relax with the integer sentinel), over the same capped
    co-occurrence contact edges."""
    parts = [f"""WITH b AS (
  SELECT DISTINCT
         epoch_us(CAST(ts AS TIMESTAMP)) // {_TEMP_BUCKET_US} AS t,
         user_id
  FROM events
),
bc AS (SELECT t FROM b GROUP BY t HAVING COUNT(*) <= {_TEMP_BUCKET_CAP}),
bb AS (SELECT b.t, b.user_id FROM b JOIN bc ON bc.t = b.t),
e AS (
  SELECT a.t, a.user_id AS u, c.user_id AS v
  FROM bb a JOIN bb c ON a.t = c.t AND a.user_id <> c.user_id
),
seed AS (SELECT MIN(user_id) AS s FROM b),
a0 AS (
  SELECT user_id,
         CASE WHEN user_id = (SELECT s FROM seed)
              THEN (SELECT MIN(t) FROM b
                    WHERE user_id = (SELECT s FROM seed))
              ELSE {_TEMP_BIG} END AS arr
  FROM (SELECT DISTINCT user_id FROM b)
)"""]
    for i in range(rounds):
        parts.append(f""",
a{i + 1} AS (
  SELECT a.user_id, LEAST(a.arr, COALESCE(m.t, a.arr)) AS arr
  FROM a{i} a LEFT JOIN (
    SELECT e.v AS user_id, MIN(e.t) AS t
    FROM e JOIN a{i} s ON s.user_id = e.u AND e.t >= s.arr
    GROUP BY e.v
  ) m ON m.user_id = a.user_id
)""")
    parts.append(f"""
SELECT user_id,
       CASE WHEN arr < {_TEMP_BIG} THEN arr END AS arrival_bucket,
       arr < {_TEMP_BIG} AS reached
FROM a{rounds}""")
    return "".join(parts)


@register("g_temporal_reachability", _temporal_sql(_TEMP_ROUNDS))
def g_temporal_reachability(spark, sf):
    """Time-respecting reachability over the event co-occurrence
    contact graph (the temporal family the static graph suite lacks
    -- contact tracing / influence-spread semantics): users co-active
    in the same 5-minute bucket are in contact at that bucket; from
    the lowest-id seed, a contact transmits only at times at or after
    the sender was reached, so paths must be TIME-INCREASING --
    static reachability over the same edges would badly overcount.
    Fixed relay budget of 6 supersteps on both engines (the PageRank
    fixed-iteration pattern): the answer is "who is reached within 6
    relays, and at which earliest bucket".

    Scale shape: bucketing is scan-side integer division; contact
    pairs are generated per bucket under a hot-bucket cap
    (co-occurrence is the LSH-bucket shape -- a flash-crowd bucket
    would be quadratic without it); each superstep is one edge-sized
    join + one MIN, lineage checkpoint-truncated.

    Reference parity: extends the reference's static graph analytics
    (preprocess_upload_neo4j.py builds a static property graph) with
    the temporal dimension its event-shaped data implies."""
    from .operators.graph import (TEMPORAL_UNREACHED,
                                  temporal_reachability_cooccurrence)
    from .sources import read_table
    ev = read_table(spark, sf, "events")
    b = (ev.select(
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) "
               f"DIV {_TEMP_BUCKET_US}").alias("t"),
        "user_id").distinct())
    bc = (b.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
          .where(F.col("n") <= _TEMP_BUCKET_CAP).select("t"))
    # the capped membership table feeds the BUCKET-FACTORED relay --
    # the per-bucket all-pairs contact expansion (the oracle's ``e``
    # CTE) never materializes on the Spark side; see
    # operators.graph.temporal_reachability_cooccurrence for the
    # exact-equivalence argument (measured: the pair form was 5.2x
    # wall on 3x data at the sf1->sf3 rung, the bucket form is linear)
    bb = b.join(bc, "t").localCheckpoint(eager=False)
    seed = b.agg(F.min("user_id")).first()[0]
    seed_arr = (b.where(F.col("user_id") == seed)
                .agg(F.min("t")).first()[0])
    arrivals = (b.select("user_id").distinct()
                .select("user_id",
                        F.when(F.col("user_id") == seed,
                               F.lit(seed_arr))
                        .otherwise(F.lit(TEMPORAL_UNREACHED))
                        .cast("long").alias("arr")))
    arr = temporal_reachability_cooccurrence(bb, arrivals,
                                             rounds=_TEMP_ROUNDS)
    return arr.select(
        "user_id",
        F.when(F.col("arr") < TEMPORAL_UNREACHED, F.col("arr"))
        .alias("arrival_bucket"),
        (F.col("arr") < TEMPORAL_UNREACHED).alias("reached"))
