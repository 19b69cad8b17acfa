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


def test_driver_visible_census_composition():
    """The correctness driver records the FIRST 50 registry entries in
    insertion order (round 4 silently dropped oracle-backed entries past
    the cap).  Under the round-7 rotation policy the visible 50 are: the
    20 pinned engine-core entries, 28 rotating oracle-backed entries, and
    2 rotating rows-only entries — never fewer than 48 hard oracle rows."""
    from ton_etl_spark.plans.queries import _PINNED

    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    visible = names[:50]
    assert set(_PINNED) <= set(visible)
    assert sum(1 for n in visible if n in oracles) == 48
    # pii_redaction stays pinned (round-5 ask: its hard signal was dark)
    assert "pii_redaction" in _PINNED


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0


def test_rotation_policy_invariants():
    """Standing driver-visibility rotation (r6 verdict ask #1): pinned core
    always visible; every oracle-backed entry earns a driver row at least
    every other round; the census partitions exactly into the 50-row cap."""
    from ton_etl_spark.plans.queries import (
        _ALL_QUERIES,
        _DRIVER_CAP,
        _ORACLE_SLOTS,
        _PINNED,
        _ROWS_ONLY_SLOTS,
        _rotate,
        ORACLES,
    )

    oracle_pool = sorted(k for k in _ALL_QUERIES if k in ORACLES and k not in _PINNED)
    rows_only = sorted(k for k in _ALL_QUERIES if k not in ORACLES)
    assert len(_PINNED) + _ORACLE_SLOTS + _ROWS_ONLY_SLOTS == _DRIVER_CAP
    assert set(_PINNED) <= set(ORACLES)
    # the sliding-window guarantee needs window >= dark count; when the
    # census outgrows 2x the slots this fails loudly -> raise _ORACLE_SLOTS
    # trade-offs consciously instead of silently weakening the cadence
    assert len(oracle_pool) <= 2 * _ORACLE_SLOTS, "pool outgrew every-other-round guarantee"
    for r in range(7, 40):
        union = set(_rotate(oracle_pool, _ORACLE_SLOTS, r)) | set(
            _rotate(oracle_pool, _ORACLE_SLOTS, r + 1)
        )
        assert union == set(oracle_pool), f"round {r}: oracle entry dark 2 rounds running"
    # rows-only entries cycle through their 2 slots within ceil(n/slots) rounds
    n, per = len(rows_only), -(-len(rows_only) // _ROWS_ONLY_SLOTS)
    for r in range(7, 20):
        seen: set = set()
        for k in range(per):
            seen |= set(_rotate(rows_only, _ROWS_ONLY_SLOTS, r + k))
        assert seen == set(rows_only)


def test_round7_census_includes_formerly_dark_oracles():
    """The six r6-dark oracle entries + media_features hold hard driver rows
    this round (r6 verdict done-criterion)."""
    import ton_etl_spark.plans.queries as qm

    visible = list(qm._build_registry())[:50]
    for t in [
        "label_centroid_norm",
        "lake_point_lookup",
        "lake_binpack_roundtrip",
        "lake_changes_diff",
        "lake_time_travel",
        "lake_widen_rebucket",
        "media_features",
    ]:
        if qm._current_round() == 7:
            assert t in visible, t


def test_rotation_dark_first_guarantee():
    """Round-7 policy upgrade: the visible window is DARK-FIRST — every
    pool entry without a recorded row in the previous round's
    CORRECTNESS file (including entries added since) is visible this
    round, regardless of how pool growth shifts the positional window
    (the failure mode that twice displaced verdict-required entries)."""
    from ton_etl_spark.plans.queries import (
        _ALL_QUERIES,
        _ORACLE_SLOTS,
        _PINNED,
        _current_round,
        _recorded_last_round,
        ORACLES,
    )

    rnd = _current_round()
    prev = _recorded_last_round(rnd)
    if prev is None:
        pytest.skip("no previous-round CORRECTNESS file to anchor on")
    pool = [k for k in _ALL_QUERIES if k in ORACLES and k not in _PINNED]
    dark_last_round = sorted(set(pool) - prev)
    assert len(dark_last_round) <= _ORACLE_SLOTS, (
        "pool grew past one round's slot capacity — split the additions "
        "across rounds or raise the slot count"
    )
    visible = list(entrymod.queries())[:50]
    missing = [k for k in dark_last_round if k not in visible]
    assert not missing, f"dark-last-round entries displaced: {missing}"
