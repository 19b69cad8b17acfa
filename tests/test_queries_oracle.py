"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() in DuckDB on the same parquet; compare row count,
column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "__float__") and type(v).__name__ == "Decimal":
        # Exact, not via float: round 2's decimal_money_rollup mismatch slipped
        # past this mirror because float-rounding is lossier than the driver's
        # hasher.  Compare the canonical fixed-point string instead.
        return format(v, "f")
    return v


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(entrymod.oracle_sql()[name])
    dcols = res.columns
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert _rowset(srows, scols) == _rowset(drows, dcols), f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_backed_queries_precede_rows_only():
    """The correctness driver records at most ~50 registry entries in
    insertion order (round 4 silently dropped the last five, including
    three oracle-backed ANN queries).  Guard the ordering invariant:
    the 50 driver-visible slots are ALL oracle-backed and stay stable;
    oracle-backed entries past the cap are allowed (this local mirror
    hash-gates them), and every rows-only entry comes after every
    oracle-backed one."""
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert all(n in oracles for n in names[:50])
    # round-6 promotion: pii_redaction must hold a driver-visible slot
    # (it was the only operator whose hard signal was dark in round 5).
    assert "pii_redaction" in names[:50]
    oracle_pos = [names.index(k) for k in oracles]
    rows_only_pos = [i for i, n in enumerate(names) if n not in oracles]
    assert not rows_only_pos or max(oracle_pos) < min(rows_only_pos)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
