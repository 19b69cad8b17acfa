"""PII redaction: Python-re twin equality, counts, pattern ordering."""

import re

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.functions.pii import PII_PATTERNS, redact_pii

SAMPLES = [
    "reach Jo at jo.doe+x@mail.example.org or 25-989-741-2988 now",
    "server 192.168.0.255 logged card 4000123456789010 twice",
    "no pii here at all",
    "edge: a@b.co,c@d.io and 10.0.0.1 10.0.0.2",
    "",
    None,
    "bad ip 999.999.999.999 still screens; 13 digits 1234567890123 too",
]


def _py_redact(s):
    if s is None:
        return None
    for k, p in PII_PATTERNS.items():
        s = re.sub(p, f"<{k}>", s)
    return s


def _py_counts(s):
    if s is None:
        return {k: None for k in PII_PATTERNS}
    return {k: len(re.findall(p, s)) for k, p in PII_PATTERNS.items()}


def test_redact_matches_python_twin(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i long, t string")
    got = {r["i"]: r for r in redact_pii(df, "t", out_col="clean").collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i]["clean"] == _py_redact(s), (i, s)
        want = _py_counts(s)
        for k in PII_PATTERNS:
            assert got[i][f"n_{k}"] == want[k], (i, s, k)


def test_counts_are_independent_of_order(spark):
    # counts run on the ORIGINAL text: an email containing digits is still
    # counted as email even though ccn/phone run later in the redact chain
    df = spark.createDataFrame([("x 4000123456789010 at 4000123456789010@mail.com",)], "t string")
    r = redact_pii(df, "t").collect()[0]
    assert r["n_email"] == 1 and r["n_ccn"] == 2


def test_in_place_and_unknown_kind(spark):
    df = spark.createDataFrame([("mail a@b.co",)], "t string")
    r = redact_pii(df, "t", kinds=("email",)).collect()[0]
    assert r["t"] == "mail <email>"  # redacted in place when no out_col
    with pytest.raises(KeyError, match="unknown PII kinds"):
        redact_pii(df, "t", kinds=("ssn",))


def test_pii_query_matches_duckdb_oracle(spark, sf_dir):
    """Full mirror of the driver gate for the 51st (past-cap) entry."""
    import duckdb

    from ton_etl_spark.plans.queries import ORACLES, QUERIES

    got = QUERIES["pii_redaction"](spark, sf_dir).orderBy("custkey").collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    want = con.execute(ORACLES["pii_redaction"] + " ORDER BY custkey").fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["custkey"], g["clean"], g["n_email"], g["n_ipv4"],
                g["n_ccn"], g["n_phone"]) == tuple(w)
    # non-vacuous: every kind fires on every row
    assert all(g["n_email"] >= 1 and g["n_phone"] >= 1 and g["n_ipv4"] >= 1
               and g["n_ccn"] >= 1 for g in got)
