"""§2.10 external-state UDF plumbing: side-effecting fetch with
retry/backoff + incremental cache, and the stateful get-method emulator
with per-task library-cache re-priming.

The VM / network kernels are injectable and deliberately NOT faked by
default; these tests inject deterministic ones (failure is a pure
function of (key, attempt), so behavior is identical on every executor)
and verify every plumbing path the reference exercises
(model/parser.py:119-182 retries; emulator.py:74-159 library recursion).
"""

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.functions.emulator import run_get_method
from ton_etl_spark.operators.sideload import (
    TransientFetchError,
    fetch_sideload,
    fetch_with_cache,
    make_sideload_cache,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_fetch_retries_and_records_permanent_failures(spark):
    # defined INSIDE the test: cloudpickle then ships it by value (a
    # module-level function would be pickled by reference to a module the
    # python workers cannot import)
    def _flaky_fetcher(keys, attempt):
        out = {}
        for k in keys:
            if k == "dead":
                continue  # never succeeds
            if k.endswith("2") and attempt == 0:
                continue  # transiently missing on the first round
            out[k] = f"payload:{k}".encode()
        return out

    df = _keys_df(spark, ["a1", "b2", "dead"])
    rows = {
        r["key"]: r
        for r in fetch_sideload(df, "key", fetcher=_flaky_fetcher, max_attempts=3).collect()
    }
    assert rows["a1"]["status"] == "ok" and rows["a1"]["attempts"] == 1
    assert rows["a1"]["payload"] == b"payload:a1"
    assert rows["b2"]["status"] == "ok" and rows["b2"]["attempts"] == 2
    # a permanently dead key is RECORDED failed after max_attempts — the
    # pipeline never raises (NonCriticalParserError discipline)
    assert rows["dead"]["status"] == "failed" and rows["dead"]["attempts"] == 3
    assert rows["dead"]["payload"] is None


def test_fetch_whole_slice_transient_error_retries(spark):
    def fetcher(keys, attempt):
        if attempt == 0:
            raise TransientFetchError("rpc timeout")
        return {k: b"x" for k in keys}

    rows = fetch_sideload(_keys_df(spark, ["p", "q"]), "key", fetcher=fetcher).collect()
    assert all(r["status"] == "ok" and r["attempts"] == 2 for r in rows)


def test_fetch_without_fetcher_fails_loudly(spark):
    with pytest.raises(Exception, match="no fetcher injected"):
        fetch_sideload(_keys_df(spark, ["k"]), "key").collect()


def test_fetch_with_cache_fetches_each_key_once(spark, tmp_path):
    cache = make_sideload_cache(spark, str(tmp_path / "cache"))

    def v1(keys, attempt):
        return {k: f"v1:{k}".encode() for k in keys}

    def v2(keys, attempt):
        return {k: f"v2:{k}".encode() for k in keys}

    d1 = _keys_df(spark, ["a", "b"])
    out1 = fetch_with_cache(d1, cache, "key", fetcher=v1, commit_key="f1")
    assert {r["key"]: bytes(r["payload"]) for r in out1.collect()} == {
        "a": b"v1:a", "b": b"v1:b",
    }
    # second call with NEW keys + a DIFFERENT fetcher: cached keys must
    # keep their v1 payloads (never refetched); only 'c' goes to v2
    d2 = _keys_df(spark, ["a", "b", "c"])
    out2 = fetch_with_cache(d2, cache, "key", fetcher=v2, commit_key="f2")
    got = {r["key"]: bytes(r["payload"]) for r in out2.collect()}
    assert got == {"a": b"v1:a", "b": b"v1:b", "c": b"v2:c"}
    assert cache.read().count() == 3

    # a fully-cached call performs no fetch and mints NO new cache version
    v_before = cache.current_version()

    def exploding(keys, attempt):
        raise AssertionError("fetcher must not be called for cached keys")

    out3 = fetch_with_cache(d2, cache, "key", fetcher=exploding)
    assert out3.where(F.col("status") == "ok").count() == 3
    assert cache.current_version() == v_before


def test_fetch_with_cache_failure_policies(spark, tmp_path):
    def half(keys, attempt):
        return {k: b"x" for k in keys if k != "bad"}

    # default: failures surface for THIS call but are not cached (retried)
    cache = make_sideload_cache(spark, str(tmp_path / "c1"))
    out = fetch_with_cache(
        _keys_df(spark, ["good", "bad"]), cache, "key", fetcher=half, max_attempts=2
    )
    rows = {r["key"]: r for r in out.collect()}
    assert rows["good"]["status"] == "ok"
    assert rows["bad"]["status"] == "failed" and rows["bad"]["payload"] is None
    assert cache.read().where(F.col("key") == "bad").count() == 0

    def healed(keys, attempt):
        return {k: b"y" for k in keys}

    out_retry = fetch_with_cache(_keys_df(spark, ["bad"]), cache, "key", fetcher=healed)
    assert out_retry.collect()[0]["status"] == "ok"

    # negative caching: the failure is recorded and NEVER refetched
    cache2 = make_sideload_cache(spark, str(tmp_path / "c2"))
    fetch_with_cache(
        _keys_df(spark, ["good", "bad"]), cache2, "key",
        fetcher=half, max_attempts=2, cache_failures=True,
    )
    assert cache2.read().where(F.col("status") == "failed").count() == 1

    def exploding(keys, attempt):
        raise AssertionError("negative-cached key must not be refetched")

    out2 = fetch_with_cache(
        _keys_df(spark, ["good", "bad"]), cache2, "key",
        fetcher=exploding, cache_failures=True,
    )
    rows2 = {r["key"]: r for r in out2.collect()}
    assert rows2["bad"]["status"] == "failed"
    assert rows2["good"]["status"] == "ok"


def test_fetch_with_cache_failed_then_ok_is_deterministic(spark, tmp_path):
    """Alternating policies can legally leave BOTH a 'failed' and an 'ok'
    row in the append-only cache for one key; every reader must resolve
    that pair the same way ('ok' wins), never an arbitrary pick."""
    from ton_etl_spark.operators.sideload import read_sideload_cache

    cache = make_sideload_cache(spark, str(tmp_path / "c3"))

    def failing(keys, attempt):
        return {}

    # 1) negative-cache the failure
    fetch_with_cache(
        _keys_df(spark, ["k"]), cache, "key",
        fetcher=failing, max_attempts=1, cache_failures=True, commit_key="neg",
    ).collect()
    assert cache.read().collect()[0]["status"] == "failed"

    def healed(keys, attempt):
        return {k: b"fresh" for k in keys}

    # 2) a cache_failures=False call refetches it (ok-only anti-join) and
    # appends the ok row — the cache now holds two rows for 'k'
    out = fetch_with_cache(
        _keys_df(spark, ["k"]), cache, "key", fetcher=healed, commit_key="pos"
    )
    assert out.collect()[0]["status"] == "ok"
    assert cache.read().count() == 2

    def exploding(keys, attempt):
        raise AssertionError("key resolved ok must not be refetched")

    # 3) BOTH policies must now deterministically see the ok row, every call
    for policy in (False, True, False, True):
        rows = fetch_with_cache(
            _keys_df(spark, ["k"]), cache, "key",
            fetcher=exploding, cache_failures=policy,
        ).collect()
        assert rows[0]["status"] == "ok" and bytes(rows[0]["payload"]) == b"fresh"
    resolved = read_sideload_cache(cache).collect()
    assert len(resolved) == 1 and resolved[0]["status"] == "ok"


def test_fetch_with_cache_rejects_clashing_columns(spark):
    df = spark.createDataFrame([("k", "x")], "key string, status string")
    cache = None  # guard fires before the cache is touched
    with pytest.raises(ValueError, match="rename them first"):
        fetch_with_cache(df, cache, "key", fetcher=lambda ks, a: {})


# ---------------------------------------------------------------- emulator


def test_emulator_plumbing_paths(spark):
    from ton_etl_spark.functions.emulator import MissingLibraryError as MLE

    def _fake_vm_factory():
        def emu(code, data, method, cache):
            assert method == "get_wallet_data"
            if code == b"NEEDLIB":
                if "lib1" not in cache:
                    raise MLE("lib1")
                return int.from_bytes(cache["lib1"], "big") + len(data)
            if code == b"NEEDGHOST":
                raise MLE("ghost")
            if code == b"BOOM":
                raise ValueError("bad cell")
            return sum(code) + sum(data)

        return emu

    df = (
        spark.createDataFrame(
            [
                (0, b"AB", b"C"),        # plain success
                (1, b"NEEDLIB", b"xy"),  # primes lib1, then succeeds
                (2, b"NEEDLIB", b"z"),   # cache already primed: 0 hops
                (3, b"NEEDGHOST", b""),  # unknown library -> recorded
                (4, b"BOOM", b""),       # per-row error -> recorded
            ],
            "id long, code binary, data binary",
        )
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    out = run_get_method(
        df,
        "get_wallet_data",
        emulator_factory=_fake_vm_factory,
        libraries={"lib1": (100).to_bytes(2, "big")},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[0]["status"] == "ok" and rows[0]["result"] == str(65 + 66 + 67)
    assert rows[1]["status"] == "ok" and rows[1]["result"] == str(100 + 2)
    assert rows[1]["lib_hops"] == 1
    # the library cache is PER TASK and long-lived: the second NEEDLIB row
    # in the same partition finds lib1 already primed (emulator.py:89-105
    # pre-warm analog)
    assert rows[2]["status"] == "ok" and rows[2]["lib_hops"] == 0
    assert rows[3]["status"] == "missing_library:ghost" and rows[3]["result"] is None
    assert rows[4]["status"] == "error:ValueError"


def test_emulator_without_vm_fails_loudly(spark):
    df = spark.createDataFrame([(b"AB", b"C")], "code binary, data binary")
    with pytest.raises(Exception, match="no emulator_factory injected"):
        run_get_method(df, "m").collect()
