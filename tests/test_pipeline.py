"""Factbook pipeline parity on a hand-built fixture with hand-derived
expected values (SURVEY.md §5 strategy (2))."""

import pytest
from pyspark.sql import functions as F

from graphdb_cia_factbook_spark import schemas
from graphdb_cia_factbook_spark.pipeline import (
    FactbookTables,
    build_country,
    build_goods,
    build_goods_edges,
    build_trade,
    dedup_regions,
    to_property_graph,
)

RET = "2023-03-31"


@pytest.fixture(scope="module")
def tables(spark):
    def mk(schema, rows):
        return spark.createDataFrame(rows, schema)

    ind = schemas.FACTBOOK_INDICATOR  # link country amount note year retrieved
    exports = mk(ind, [
        ("l/a", "Alpha", 100.0, None, 2020.0, RET),
        ("l/a", "Alpha", 90.0, None, 2021.0, RET),   # latest wins
        ("l/b", "Beta", 50.0, None, 2020.0, RET),
    ])
    imports = mk(ind, [
        ("l/a", "Alpha", 80.0, None, 2021.0, RET),
        ("l/b", "Beta", 60.0, None, None, RET),      # null year
        ("l/c", "Gamma", 40.0, None, 2020.0, RET),
    ])
    gdp = mk(ind, [("l/a", "Alpha", 1000.0, None, 2021.0, RET)])
    real_gdp = mk(ind, [("l/a", "Alpha", 900.0, None, 2021.0, RET)])
    real_gdp_pc = mk(ind, [("l/a", "Alpha", 9.0, None, 2021.0, RET)])

    pschema = schemas.FACTBOOK_PARTNERS
    exports_partners = mk(pschema, [
        ("l/a", "Alpha", 2021.0, "Beta", 0.5, "exports", RET),
        ("l/a", "Alpha", 2021.0, "Gamma", 0.3, "exports", RET),
        ("l/b", "Beta", 2020.0, "Alpha", 0.6, "exports", RET),
        ("l/b", "Beta", 2020.0, None, 0.1, "exports", RET),  # null endpoint
    ])
    imports_partners = mk(pschema, [
        # Beta imports from Alpha: conflicts with Alpha->Beta export row,
        # lower year -> loses the dedup
        ("l/b", "Beta", 2020.0, "Alpha", 0.7, "imports", RET),
    ])

    gschema = schemas.FACTBOOK_GOODS
    exports_goods = mk(gschema, [
        ("wheat", "Alpha", "l/a", 2021.0, 1, "exports", RET),
        ("corn", "Alpha", "l/a", 2021.0, 2, "exports", RET),
    ])
    imports_goods = mk(gschema, [
        ("wheat", "Beta", "l/b", 2020.0, 1, "imports", RET),
        ("oil", "Gamma", "l/c", 2020.0, 1, "imports", RET),
    ])
    goods_grouping = mk(schemas.FACTBOOK_GOODS_GROUPING, [
        ("wheat", "agri"), ("corn", "agri"), ("oil", "energy")])

    population = mk(schemas.FACTBOOK_POPULATION, [
        ("l/a", "Alpha", 1000.0, 2020.0, RET),
        ("l/c", "Gamma", 500.0, 2019.0, RET),
    ])
    regions = mk(schemas.FACTBOOK_REGIONS, [
        ("l/a", "Alpha", "North", 0, RET),
        ("l/b", "Beta", "North", 0, RET),
        ("l/b", "Beta", "North", 0, RET),   # exact dupe -> dedup_regions
        ("l/c", "Gamma", "South", 0, RET),
        ("l/c", "Gamma", "North", 1, RET),  # France-style secondary region
    ])
    return FactbookTables(
        exports=exports, imports=imports, gdp=gdp, real_gdp=real_gdp,
        real_gdp_per_capita=real_gdp_pc,
        exports_partners=exports_partners, imports_partners=imports_partners,
        exports_goods=exports_goods, imports_goods=imports_goods,
        goods_grouping=goods_grouping, population=population, regions=regions)


def test_country(tables):
    rows = {r["country"]: r for r in build_country(tables).collect()}
    assert set(rows) == {"Alpha", "Beta", "Gamma"}
    a = rows["Alpha"]
    assert a["primary_region"] == "North"
    assert a["population"] == 1000.0 and a["year_population"] == 2020.0
    assert a["amount_exports"] == 90.0 and a["year_exports"] == 2021.0
    assert a["amount_gdp"] == 1000.0
    b = rows["Beta"]
    assert b["population"] == 0.0 and b["year_population"] == 1970.0
    assert b["amount_imports"] == 60.0 and b["year_imports"] == 1970.0
    g = rows["Gamma"]
    assert g["amount_exports"] == 0.0 and g["year_exports"] == 1970.0


def test_trade(tables):
    country = build_country(tables)
    trade = build_trade(tables, country)
    rows = {(r["exports"], r["imports"]): r for r in trade.collect()}
    # null-endpoint row dropped; conflict Alpha->Beta resolved to the
    # higher-year export-side row (45.0 @ 2021)
    assert set(rows) == {("Alpha", "Beta"), ("Alpha", "Gamma"),
                         ("Beta", "Alpha")}
    ab = rows[("Alpha", "Beta")]
    assert ab["amount"] == 45.0 and ab["year"] == 2021.0
    assert ab["trade_type"] == "exports"
    assert ab["export_trade_rank"] == 1
    assert rows[("Alpha", "Gamma")]["export_trade_rank"] == 2
    assert rows[("Beta", "Alpha")]["export_trade_rank"] == 1
    # percentages re-derived against country totals
    assert ab["percentage_exports"] == 45.0 / 90.0
    assert ab["percentage_imports"] == 45.0 / 60.0
    assert rows[("Alpha", "Gamma")]["percentage_imports"] == 27.0 / 40.0
    assert rows[("Beta", "Alpha")]["percentage_exports"] == 30.0 / 50.0


def test_goods(tables):
    rows = {r["mapped_good"]: r["goods"] for r in build_goods(tables).collect()}
    assert rows == {"agri": ["corn", "wheat"], "energy": ["oil"]}


def test_goods_edges(tables):
    rows = build_goods_edges(tables).collect()
    got = {(r["src"], r["dst"], r["type"], r["sub_good"]): r for r in rows}
    assert set(got) == {
        ("Alpha", "agri", "exports", "wheat"),
        ("Alpha", "agri", "exports", "corn"),
        ("agri", "Beta", "imports", "wheat"),
        ("energy", "Gamma", "imports", "oil"),
    }
    assert got[("Alpha", "agri", "exports", "wheat")]["amount"] == 1.0
    assert got[("Alpha", "agri", "exports", "corn")]["amount"] == 2.0


def test_property_graph(tables):
    country = build_country(tables)
    trade = build_trade(tables, country)
    goods = build_goods(tables)
    regions = dedup_regions(tables)
    pg = to_property_graph(country, trade, goods, regions,
                           goods_edges=build_goods_edges(tables))
    labels = dict(pg.vertices.groupBy("label").count().collect())
    assert labels == {"country": 3, "region": 2, "good": 2}
    types = dict(pg.edges.groupBy("type").count().collect())
    # 3 trades + 4 contains (Beta deduped; Gamma in 2 regions)
    # + 2 exports (wheat/corn -> agri) + 2 imports (agri/energy -> country)
    assert types == {"trades": 3, "contains": 4, "exports": 2, "imports": 2}
    sub = {r["sub_good"] for r in
           pg.edges.where(F.col("type") == "exports").collect()}
    assert sub == {"wheat", "corn"}
    # trades edges must carry null sub_good after the widening union
    assert pg.edges.where((F.col("type") == "trades")
                          & F.col("sub_good").isNotNull()).count() == 0
