"""Factbook pipeline parity (SURVEY.md §3.2 / Phase 4).

Re-expresses the reference's relational preprocessing phase
(/root/reference/preprocess_upload_neo4j.py:116-208) as one lazy Spark
DAG over factbook-shaped DataFrames (schemas in :mod:`.schemas`):

- country dimension: primary region (rank==0) + population + 5
  latest-year economic indicators (amount_/year_ columns),
- trade edge table: export+import partner shares joined to country
  totals, deduped highest-(year, amount)-wins, ranked per exporter and
  importer, re-derived percentage_exports/imports,
- goods rollup: mapped_good -> sorted list of sub-goods.

The reference then MERGEs these into Neo4j per row (:217-395, its
bottleneck); here they land as vertex/edge DataFrames
(:func:`to_property_graph`) ready for bulk parquet write and the
:mod:`.operators.graph` rank algorithms.

Determinism: the reference's ``drop_duplicates(keep="first")`` after a
single-key sort inherits pandas input order on ties; we add explicit
tiebreaks (amount desc, country asc) so results are stable under any
partitioning -- the one place the reference itself needed this it also
added tiebreak keys (:181).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .operators.relational import latest_per_key, union_tagged
from .sources import assert_unique_key


@dataclass
class FactbookTables:
    """The reference's 12-CSV input contract (preprocess_upload_neo4j.py:98-112)."""
    exports: DataFrame
    imports: DataFrame
    gdp: DataFrame
    real_gdp: DataFrame
    real_gdp_per_capita: DataFrame
    exports_partners: DataFrame
    imports_partners: DataFrame
    exports_goods: DataFrame
    imports_goods: DataFrame
    goods_grouping: DataFrame
    population: DataFrame
    regions: DataFrame


def build_country(t: FactbookTables) -> DataFrame:
    """Country dimension (preprocess_upload_neo4j.py:116-144):
    primary region filter (rank==0), population left-join, then the x5
    indicator join loop with latest-year dedup and amount/year renames;
    fills: year->1970, amount/population->0."""
    country = (t.regions.where(F.col("rank") == 0)
               .select("link", "country",
                       F.col("regions").alias("primary_region"),
                       "retrieved")
               # Cypher MERGE would collapse repeated country rows into
               # one node (preprocess_upload_neo4j.py:237-255); dedup
               # before the joins so the S6 key assertion holds.
               .dropDuplicates(["country"]))
    pop = t.population.select("country", "population",
                              F.col("year").alias("year_population"))
    country = (country.join(F.broadcast(pop), "country", "left")
               .na.fill({"year_population": 1970.0, "population": 0.0}))

    indicators = {
        "exports": t.exports, "imports": t.imports, "gdp": t.gdp,
        "real_gdp": t.real_gdp, "real_gdp_per_capita": t.real_gdp_per_capita,
    }
    for name, ind in indicators.items():
        latest = latest_per_key(
            ind, ["country"],
            [F.desc_nulls_last("year"), F.desc_nulls_last("amount")])
        dim = latest.select(
            "country",
            F.col("amount").alias(f"amount_{name}"),
            F.col("year").alias(f"year_{name}"))
        country = (country.join(F.broadcast(dim), "country", "left")
                   .na.fill({f"amount_{name}": 0.0, f"year_{name}": 1970.0}))
    return country


def build_trade(t: FactbookTables, country: DataFrame) -> DataFrame:
    """Trade edges (preprocess_upload_neo4j.py:159-201).

    Partner shares x latest country totals -> absolute amounts; the
    export and import sources union with swapped roles (exporter is
    ``country`` on the export page but ``trade_country`` on the import
    page); conflict resolution keeps the highest (year, amount) row
    with trade_type asc tiebreak (:181-182); grouped min-ranks per
    exporter/importer; percentages re-derived against country totals.
    """
    def partner_amounts(ind: DataFrame, part: DataFrame) -> DataFrame:
        latest = latest_per_key(
            ind, ["country"],
            [F.desc_nulls_last("year"), F.desc_nulls_last("amount")])
        return (part.join(F.broadcast(latest.select("country", "amount")),
                          "country", "left")
                .withColumn("amount", F.col("amount") * F.col("percentage")))

    exp = (partner_amounts(t.exports, t.exports_partners)
           .withColumnRenamed("country", "exports")
           .withColumnRenamed("trade_country", "imports"))
    imp = (partner_amounts(t.imports, t.imports_partners)
           .withColumnRenamed("country", "imports")
           .withColumnRenamed("trade_country", "exports"))

    trade = exp.unionByName(imp, allowMissingColumns=True)
    trade = trade.where(F.col("imports").isNotNull()
                        & F.col("exports").isNotNull())
    trade = latest_per_key(
        trade, ["imports", "exports"],
        [F.desc_nulls_last("year"), F.desc_nulls_last("amount"),
         F.asc("trade_type")])
    trade = trade.na.fill({"amount": 0.0, "year": 1970.0})

    w_exp = Window.partitionBy("exports").orderBy(F.desc("amount"))
    w_imp = Window.partitionBy("imports").orderBy(F.desc("amount"))
    trade = (trade
             .withColumn("export_trade_rank", F.rank().over(w_exp))
             .withColumn("import_trade_rank", F.rank().over(w_imp))
             .drop("percentage"))

    totals = country.select(
        "country",
        F.col("amount_exports").alias("__tot_exp"),
        F.col("amount_imports").alias("__tot_imp"))
    trade = (trade
             .join(F.broadcast(totals.withColumnRenamed("country", "exports")),
                   "exports", "left")
             .join(F.broadcast(totals.select(
                 F.col("country").alias("imports"),
                 F.col("__tot_imp").alias("__tot_imp2"))), "imports", "left")
             .withColumn("percentage_exports",
                         F.coalesce(F.col("amount") / F.col("__tot_exp"),
                                    F.lit(0.0)))
             .withColumn("percentage_imports",
                         F.coalesce(F.col("amount") / F.col("__tot_imp2"),
                                    F.lit(0.0)))
             .drop("__tot_exp", "__tot_imp", "__tot_imp2"))
    return trade


def build_goods(t: FactbookTables) -> DataFrame:
    """Goods rollup (preprocess_upload_neo4j.py:153-157, 204-208):
    goods->mapped_good broadcast join on both trade directions, then
    mapped_good -> sorted distinct sub-goods list."""
    exp = t.exports_goods.join(F.broadcast(t.goods_grouping), "goods", "left")
    imp = t.imports_goods.join(F.broadcast(t.goods_grouping), "goods", "left")
    both = exp.select("goods", "mapped_good").unionByName(
        imp.select("goods", "mapped_good"))
    return (both.groupBy("mapped_good")
            .agg(F.array_sort(F.collect_set("goods")).alias("goods")))


def build_goods_edges(t: FactbookTables) -> DataFrame:
    """Goods relationship edges (preprocess_upload_neo4j.py:348-395):
    ``exports`` = country -> good and ``imports`` = good -> country,
    each carrying (rank, year, sub_good) where the good node id is the
    ``mapped_good`` and the raw goods string becomes ``sub_good``.
    Rows whose goods have no mapping are dropped -- parity with the
    reference, whose ``MATCH (m:good {name})`` silently fails for an
    unmapped (null) name so no edge is MERGEd."""
    def one_side(part: DataFrame, typ: str) -> DataFrame:
        mapped = (part.join(F.broadcast(t.goods_grouping), "goods", "left")
                  .where(F.col("mapped_good").isNotNull()))
        cols = [F.lit(typ).alias("type"),
                F.col("rank").cast("double").alias("amount"),
                F.col("year"), F.col("goods").alias("sub_good")]
        if typ == "exports":
            return mapped.select(F.col("country").alias("src"),
                                 F.col("mapped_good").alias("dst"), *cols)
        return mapped.select(F.col("mapped_good").alias("src"),
                             F.col("country").alias("dst"), *cols)

    return one_side(t.exports_goods, "exports").unionByName(
        one_side(t.imports_goods, "imports"))


def dedup_regions(t: FactbookTables) -> DataFrame:
    """Region-country dedup (preprocess_upload_neo4j.py:150-151) with
    an explicit total order (rank asc) replacing pandas keep-first."""
    return latest_per_key(t.regions, ["regions", "country"], [F.asc("rank")])


@dataclass
class PropertyGraph:
    vertices: DataFrame  # id, label, properties...
    edges: DataFrame     # src, dst, type, properties...


def to_property_graph(country: DataFrame, trade: DataFrame,
                      goods: DataFrame, regions: DataFrame,
                      goods_edges: DataFrame | None = None) -> PropertyGraph:
    """S4 load-phase parity: the per-row Cypher MERGE loops
    (preprocess_upload_neo4j.py:217-395) collapse into two bulk
    DataFrames.  Node-key constraints (S6) become assertions; the
    region->country ``contains`` edges reproduce the reference's
    semantics FIXED: the reference has a latent bug (literal
    ``country=["country"]`` at :332) that makes its contains edges
    never match a country node -- we join on the real country name.

    ``goods_edges`` (from :func:`build_goods_edges`) adds the
    reference's exports (country->good) and imports (good->country)
    relationship types (:348-395); endpoints are validated against the
    country/good node sets (J7) -- the bulk equivalent of MERGE only
    firing when both MATCHes succeed.
    """
    countries = country.select(
        F.col("country").alias("id"), F.lit("country").alias("label"))
    region_nodes = (regions.select(F.col("regions")).distinct()
                    .select(F.col("regions").alias("id"),
                            F.lit("region").alias("label")))
    good_nodes = goods.select(F.col("mapped_good").alias("id"),
                              F.lit("good").alias("label"))
    for nodes in (countries, region_nodes, good_nodes):
        assert_unique_key(nodes, "id")
    vertices = countries.unionByName(region_nodes).unionByName(good_nodes)

    trades = trade.select(
        F.col("exports").alias("src"), F.col("imports").alias("dst"),
        F.lit("trades").alias("type"), "amount", "year",
        "export_trade_rank", "import_trade_rank",
        "percentage_exports", "percentage_imports")
    contains = regions.select(
        F.col("regions").alias("src"), F.col("country").alias("dst"),
        F.lit("contains").alias("type"),
        F.col("rank").cast("double").alias("amount"),
        F.lit(None).cast("double").alias("year"),
        F.lit(None).cast("int").alias("export_trade_rank"),
        F.lit(None).cast("int").alias("import_trade_rank"),
        F.lit(None).cast("double").alias("percentage_exports"),
        F.lit(None).cast("double").alias("percentage_imports"))
    edges = trades.unionByName(contains, allowMissingColumns=True)
    if goods_edges is not None:
        c_ids = countries.select("id")
        g_ids = good_nodes.select("id")
        exp = (goods_edges.where(F.col("type") == "exports")
               .join(F.broadcast(c_ids.withColumnRenamed("id", "src")),
                     "src", "left_semi")
               .join(F.broadcast(g_ids.withColumnRenamed("id", "dst")),
                     "dst", "left_semi"))
        imp = (goods_edges.where(F.col("type") == "imports")
               .join(F.broadcast(g_ids.withColumnRenamed("id", "src")),
                     "src", "left_semi")
               .join(F.broadcast(c_ids.withColumnRenamed("id", "dst")),
                     "dst", "left_semi"))
        edges = edges.unionByName(exp.unionByName(imp),
                                  allowMissingColumns=True)
    return PropertyGraph(vertices=vertices, edges=edges)
