"""Parser-expression parity tests (reference scrape_cia.py semantics)."""

from pyspark.sql import functions as F

from graphdb_cia_factbook_spark.functions import (
    canonicalize_country,
    extract_percentage,
    extract_year,
    parse_currency,
    parse_population,
    strip_percentage_token,
)


def run_one(spark, expr, value):
    return spark.createDataFrame([(value,)], "s string").select(
        expr(F.col("s")).alias("out")).first()["out"]


def test_parse_currency(spark):
    cases = {
        "$2.1 billion (2020 est.)": 2.1e9,
        "$500 million (2019 est.)": 5e8,
        "$1.5 trillion": 1.5e12,
        "$2,732,370,000,000 (2020 est.)": 2732370000000.0,
        "$5 (2020 est.)": 5.0,
        "NA": None,
        "almost $3 billion": None,  # gate requires ^\$\d+
    }
    for raw, want in cases.items():
        assert run_one(spark, parse_currency, raw) == want, raw


def test_extract_year(spark):
    cases = {
        "$2.1 billion (2020 est.)": "2020",
        "wheat, oil (2019)": "2019",
        "no year here": None,      # split returns whole string, gate fails
        "text (note)": None,
        # split(" (", 1): first " (" is before 2001 (the leading paren
        # has no preceding space), matching the reference's behavior
        "(1999 est.) (2001 est.)": "2001",
    }
    for raw, want in cases.items():
        assert run_one(spark, extract_year, raw) == want, raw


def test_percentage_and_token(spark):
    assert run_one(spark, extract_percentage, "Germany 29%") == 0.29
    assert run_one(spark, extract_percentage, "almost entirely France") == 0.9
    assert run_one(spark, extract_percentage, "Germany") is None
    assert run_one(spark, strip_percentage_token, "Germany 29%") == "Germany"
    assert run_one(spark, strip_percentage_token,
                   "almost entirely France") == "France"
    assert run_one(spark, strip_percentage_token, " Spain ") == "Spain"


def test_parse_population(spark):
    def run(value):
        pop, year = parse_population(F.col("s"))
        return spark.createDataFrame([(value,)], "s string").select(
            pop.alias("p"), year.alias("y")).first()

    r = run("total: 1,234,567 (2020 est.)")
    assert r["p"] == 1234567.0 and r["y"] == "2020"
    r = run("approximately (2020 est.)")  # only 4-len groups: both unset
    assert r["p"] is None and r["y"] is None
    r = run("22 (2020)")
    assert r["p"] == 22.0 and r["y"] == "2020"
    r = run("no digits at all")
    assert r["p"] is None and r["y"] is None


def test_canonicalize(spark):
    assert run_one(spark, canonicalize_country, "Korea, South") == "South Korea"
    assert run_one(spark, canonicalize_country, "Untied States") == "United States"
    assert run_one(spark, canonicalize_country, "France") == "France"


def test_zvalue_interleaves_bits(spark):
    """z(0b11, 0b00) = 0b0101 = 5; z(0b00, 0b11) = 0b1010 = 10;
    z(1,1) = 3; adjacency: sorting by z groups small (a,b) together."""
    from pyspark.sql import functions as F
    from graphdb_cia_factbook_spark.functions import zvalue
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (1, 1), (0, 0)], "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b", zvalue(F.col("a"), F.col("b"))
                     .alias("z")).collect()}
    assert got == {(3, 0): 5, (0, 3): 10, (1, 1): 3, (0, 0): 0}
