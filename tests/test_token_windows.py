"""1-to-N mapInArrow converter: explode_token_windows must agree with the
Spark-native explode equivalent, including the 1-to-0 (tombstone) and
1-to-many shapes, and approx_count_distinct must track the exact count."""

import pyspark.sql.functions as F

from ton_etl_spark.functions.tokens import explode_token_windows


def _native_windows(df, window: int):
    """Reference implementation with built-in ops: slice + posexplode."""
    n = F.ceil(F.size("tokens") / F.lit(window)).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    ex = df.select("doc_id", "tokens", F.explode(idx).alias("window_idx"))
    win = F.slice(F.col("tokens"), F.col("window_idx") * window + 1, window)
    return ex.select(
        "doc_id",
        F.col("window_idx").cast("int").alias("window_idx"),
        win.alias("win_tokens"),
        F.size(win).cast("int").alias("win_len"),
    )


def test_explode_token_windows_vs_native(spark):
    rows = [
        ("a", list(range(12))),   # 3 windows of 5,5,2
        ("b", [7]),               # 1 window of 1
        ("c", None),              # tombstone: 0 rows
        ("d", []),                # empty: 0 rows
        ("e", list(range(10))),   # 2 exact windows
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        (r["doc_id"], r["window_idx"]): (list(r["win_tokens"]), r["win_len"])
        for r in explode_token_windows(df, window=5).collect()
    }
    want = {
        (r["doc_id"], r["window_idx"]): (list(r["win_tokens"]), r["win_len"])
        for r in _native_windows(df, 5).collect()
    }
    assert got == want
    assert ("a", 2) in got and got[("a", 2)] == ([10, 11], 2)
    assert not any(k[0] in ("c", "d") for k in got)


def test_explode_token_windows_on_generated_log(spark):
    """Same equality on a realistic CDC batch (variable lengths, null
    tombstone payloads, many Arrow batches)."""
    from ton_etl_spark.cdc.generator import generate_cdc_log

    log = generate_cdc_log(spark, 3000, seed=5).select("doc_id", "lsn", "tokens")
    # unique id per row (doc_id repeats across events)
    df = log.select(F.concat("doc_id", F.lit("#"), "lsn").alias("doc_id"), "tokens")
    got = explode_token_windows(df, window=16)
    want = _native_windows(df, 16)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_approx_count_distinct_bounds(spark, sf_dir):
    """A7 in the form you'd run at 100 TB: HLL++ estimate within rsd bounds
    of the exact per-group count."""
    from ton_etl_spark.plans.queries import QUERIES, load_table

    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])
