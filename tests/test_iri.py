"""jena-iri checker parity (``IRIFactory.java`` / ``ViolationCodes.java``
syntax-level subset)."""

from pyspark.sql import functions as F

from jena_spark.functions.iri import (
    CHECKS,
    TEST_BATTERY,
    has_violation,
    iri_violations,
    oracle_conditions,
)


def _frame(spark, iris):
    return spark.createDataFrame([(s,) for s in iris], "iri string")


def _codes(spark, iri):
    out = iri_violations(_frame(spark, [iri])).collect()
    return {r.code: r.is_error for r in out}


def test_every_code_fires_on_its_exemplar(spark):
    got = {
        r.code
        for r in iri_violations(_frame(spark, TEST_BATTERY)).collect()
    }
    want = {code for code, _, _ in CHECKS}
    assert got == want  # each implemented code has a firing exemplar


def test_clean_iri_no_violations(spark):
    assert _codes(spark, "http://ex.org/ok") == {}
    assert _codes(spark, "urn:isbn:0451450523") == {}
    assert _codes(spark, "https://ex.org:8443/p?q=1#frag") == {}


def test_specific_codes(spark):
    assert _codes(spark, "http://ex.org/<bad>") == {"ILLEGAL_CHARACTER": True}
    assert _codes(spark, "http://ex.org/a%2fb") == {
        "PERCENT_ENCODING_SHOULD_BE_UPPERCASE": False
    }
    assert _codes(spark, "http://ex.org/100%") == {"ILLEGAL_PERCENT_ENCODING": True}
    assert _codes(spark, "HTTP://ex.org/x") == {"LOWERCASE_PREFERRED": False}
    assert _codes(spark, "1http://ex.org/x") == {
        "SCHEME_MUST_START_WITH_LETTER": True
    }
    assert _codes(spark, "http://user:pw@ex.org/x") == {"HAS_PASSWORD": False}
    assert _codes(spark, "http://ex.org/a/../b") == {
        "NON_INITIAL_DOT_SEGMENT": False
    }
    # port 80 on http: both the default-port and well-known warnings,
    # like the reference's overlapping catalogue
    assert _codes(spark, "http://ex.org:80/x") == {
        "DEFAULT_PORT_SHOULD_BE_OMITTED": False,
        "PORT_SHOULD_NOT_BE_WELL_KNOWN": False,
    }
    # a dotted FILE name is not a dot segment
    assert _codes(spark, "http://ex.org/a.b/c..d") == {}


def test_has_violation_split(spark):
    iris = ["http://ex.org/ok", "HTTP://ex.org/x", "http://ex.org/<bad>"]
    df = _frame(spark, iris)
    errors = {r.iri for r in has_violation(df).collect()}
    assert errors == {"http://ex.org/<bad>"}
    warned = {r.iri for r in has_violation(df, include_warnings=True).collect()}
    assert warned == {"HTTP://ex.org/x", "http://ex.org/<bad>"}


def test_oracle_conditions_cover_all_checks():
    assert [c for c, _, _ in oracle_conditions()] == [c for c, _, _ in CHECKS]


def test_oracle_agrees_with_spark_on_battery(spark):
    """The DuckDB mirror and the distributed checker agree row-for-row
    on the battery (the registry query's premise)."""
    import duckdb

    vals = ", ".join("('" + s.replace("'", "''") + "')" for s in TEST_BATTERY)
    branches = "\nUNION ALL\n".join(
        f"SELECT iri, '{code}' AS code, {'TRUE' if err else 'FALSE'} AS is_error"
        f" FROM iris WHERE {cond}"
        for code, cond, err in oracle_conditions()
    )
    sql = f"WITH iris AS (SELECT iri FROM (VALUES {vals}) AS b(iri)) {branches}"
    duck = {
        (r[0], r[1], bool(r[2]))
        for r in duckdb.connect().execute(sql).fetchall()
    }
    ours = {
        (r.iri, r.code, r.is_error)
        for r in iri_violations(_frame(spark, TEST_BATTERY)).collect()
    }
    assert duck == ours
