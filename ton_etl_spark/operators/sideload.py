"""Side-effecting enrichment fetch: network-UDF plumbing, Spark-first.

The reference enriches rows with out-of-band lookups — toncenter RPC
account fallback with retry (``model/parser.py:119-182``) and HTTP/IPFS
metadata fetch with a tonapi fallback and DB-backed cache
(``jetton_masters/jetton_metadata.py:40-66``, policy
``datalake/README.md:135-167``).  SURVEY.md §2.10 lists this as the
"side-effecting UDF with network I/O + retry/backoff" slot.

This module implements ALL of the Spark-side machinery — batched
``mapInPandas`` execution, per-key retry with deterministic backoff
bookkeeping, swallow-don't-crash error accounting (the
``NonCriticalParserError`` discipline), and an incremental LakeTable
cache so a key is fetched ONCE across the table's lifetime — around an
injectable ``fetcher``.  The default fetcher raises ``NotImplementedError``
LOUDLY: this sandbox has no network, and a silent fake would be
dishonest.  Tests inject deterministic fetchers (failure is a pure
function of (key, attempt), so behavior is identical on every executor).

100 TB shape: the fetch runs where the keys live (no collect); the cache
anti-join prunes already-fetched keys before any side effect; distinct()
bounds the fetch to unique keys.  Rate limiting beyond ``backoff_base``
belongs in the fetcher itself (it sees whole batches, so it can pool
connections and pace requests per task — exactly where the reference
does it).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_etl_spark.lake.table import LakeTable

# fetcher contract: (keys, attempt) -> {key: payload-bytes}.  Keys absent
# from the result are retried; a raised TransientFetchError retries the
# whole batch slice; any other exception fails those keys permanently
# (recorded, not raised).
Fetcher = Callable[[list[str], int], dict[str, bytes]]


class TransientFetchError(Exception):
    """Raise from a fetcher to signal 'retry these keys' (the RPC-timeout
    class of failure, reference model/parser.py:119-182)."""


def _no_network_fetcher(keys: list[str], attempt: int) -> dict[str, bytes]:
    raise NotImplementedError(
        "sideload.fetch_sideload: no fetcher injected and this environment "
        "has no network access — pass fetcher=... (see module docstring); "
        "the Spark-side plumbing (batching, retry, cache) is real, the "
        "network call is deliberately not faked"
    )


def fetch_sideload(
    df: DataFrame,
    key_col: str,
    fetcher: Fetcher | None = None,
    max_attempts: int = 3,
    backoff_base: float = 0.0,
) -> DataFrame:
    """Fetch a payload per distinct key: ``(key, payload, status, attempts)``.

    ``status`` ∈ {'ok', 'failed'} — a permanently failing key is RECORDED,
    never raised (the reference swallows NonCriticalParserError and moves
    on, parser/model/parser.py:77-79).  ``attempts`` counts fetch rounds
    the key participated in.  ``backoff_base`` > 0 sleeps
    ``backoff_base * 2**round`` between rounds inside each task (keep 0 in
    tests; real deployments set it to the API's pacing)."""
    the_fetcher = fetcher or _no_network_fetcher
    clash = {"payload", "status", "attempts"} & set(df.columns) - {key_col}
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} that the fetch "
            f"output would shadow; rename them first"
        )

    def _run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            keys = [k for k in pdf[key_col].tolist()]
            got: dict[str, bytes] = {}
            attempts: dict[str, int] = {k: 0 for k in keys}
            pending = [k for k in dict.fromkeys(keys)]  # unique, ordered
            for rnd in range(max_attempts):
                if not pending:
                    break
                if rnd and backoff_base:
                    time.sleep(backoff_base * (2 ** (rnd - 1)))
                for k in pending:
                    attempts[k] += 1
                try:
                    res = the_fetcher(pending, rnd)
                except TransientFetchError:
                    continue  # whole slice retries next round
                except NotImplementedError:
                    raise  # configuration error: surface loudly
                except Exception:
                    break  # permanent failure for everything still pending
                got.update({k: v for k, v in res.items() if v is not None})
                pending = [k for k in pending if k not in got]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "payload": [got.get(k) for k in keys],
                    "status": ["ok" if k in got else "failed" for k in keys],
                    "attempts": [attempts[k] for k in keys],
                }
            )

    schema = f"{key_col} string, payload binary, status string, attempts int"
    return df.select(key_col).distinct().mapInPandas(_run, schema=schema)


def make_sideload_cache(spark, root: str, key_col: str = "key") -> LakeTable:
    """The DB-backed metadata cache of the reference, as a LakeTable."""
    schema = spark.createDataFrame(
        [], f"{key_col} string, payload binary, status string, attempts int"
    ).schema
    return LakeTable.get_or_create(spark, root, schema=schema, key_cols=[key_col], n_buckets=4)


def read_sideload_cache(cache: LakeTable, key_col: str = "key") -> DataFrame:
    """One row per key from the append-only cache log, resolved with a
    DETERMINISTIC preference: 'ok' beats 'failed', then more attempts,
    then larger payload.  The cache can legitimately hold two rows for one
    key — a 'failed' row recorded under ``cache_failures=True`` and an
    'ok' row appended by a later ``cache_failures=False`` call that
    retried it (the upgrade path).  Every reader must resolve that pair
    the same way; an arbitrary ``dropDuplicates`` pick would return a
    different status/payload run to run."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.desc(F.col("status") == "ok"), F.desc("attempts"), F.desc("payload")
    )
    return (
        cache.read()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def fetch_with_cache(
    df: DataFrame,
    cache: LakeTable,
    key_col: str,
    fetcher: Fetcher | None = None,
    max_attempts: int = 3,
    backoff_base: float = 0.0,
    commit_key: str | None = None,
    cache_failures: bool = False,
) -> DataFrame:
    """Enrich ``df`` with fetched payloads, fetching ONLY keys the cache
    has no record for, and appending this call's results to the cache —
    the reference's fetch-once-then-DB-cache policy
    (jetton_metadata.py:40-66).

    Successful keys are fetched once EVER.  Failed keys: with
    ``cache_failures=False`` (default) the failure is returned for this
    call (``status='failed'``) but not cached, so a later call retries it
    — the transient-outage policy; with ``cache_failures=True`` the
    failure IS cached and never retried — the permanent-404 policy
    (choose per source, like the reference's per-API retry rules).

    Returns ``df`` left-joined with ``(payload, status)`` per key —
    ``status`` is 'ok', 'failed', or NULL only for keys genuinely never
    attempted (absent from ``df``'s current call and the cache).
    An all-cached call performs no fetch and writes NO new cache version.

    Determinism: the cache is an append-only log, so a key retried across
    calls with different ``cache_failures`` policies can hold both a
    'failed' and a later 'ok' row.  All reads here go through
    ``read_sideload_cache``, which resolves multi-row keys with a fixed
    preference ('ok' first) — the enrichment never returns an arbitrary
    row."""
    clash = {"payload", "status"} & set(df.columns) - {key_col}
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} that the cache "
            f"enrichment would shadow; rename them first"
        )
    # ONE resolved-cache scan serves both the miss set and the enrichment
    # below: the post-append view minus this call's fetched keys equals the
    # pre-append view minus them (appends only touch fetched keys), so
    # re-scanning after the append would pay a second full window pass over
    # the cache for an identical result.
    resolved = read_sideload_cache(cache, key_col)
    known = resolved if cache_failures else resolved.where(F.col("status") == "ok")
    missing = df.select(key_col).distinct().join(
        known.select(key_col), on=key_col, how="left_anti"
    )
    # localCheckpoint (eager): the fetch runs EXACTLY once — every later
    # consumer (cache append, emptiness check, enrichment join) reads the
    # materialized result instead of re-invoking the side-effecting fetcher
    fetched = fetch_sideload(
        missing, key_col, fetcher, max_attempts, backoff_base
    ).localCheckpoint()
    to_cache = fetched if cache_failures else fetched.where(F.col("status") == "ok")
    # skip the commit entirely when nothing was fetched — a hot loop over
    # fully-cached keys must not mint empty table versions
    if to_cache.limit(1).count() > 0:
        cache.append(to_cache, commit_key=commit_key)
    # enrich from every cached record PLUS this call's results, so a failed
    # key surfaces as status='failed' whether cached or fresh — NULL status
    # means only "never attempted".  Fresh results win over cached rows for
    # the same key (a retried key's new outcome supersedes its cached
    # failure this call); the cached side is already one
    # deterministically-preferred row per key.
    cols = [key_col, "payload", "status"]
    fresh_keys = fetched.select(key_col)
    enrich = (
        resolved.select(*cols)
        .join(fresh_keys, on=key_col, how="left_anti")
        .unionByName(fetched.select(*cols))
    )
    return df.join(enrich, on=key_col, how="left")
