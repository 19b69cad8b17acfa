"""Deterministic, scale-parametric CDC log generator.

Everything derives JVM-side from ``spark.range(n)`` + hash expressions — no
driver-side loops, no Python RNG — so the same (n_events, seed) yields the
same log at any parallelism, and generation itself scales linearly (the
10^10-event log of BASELINE.json is the same code with a bigger ``n``).

Injected hazards (FIXTURES.md F1):
  (a) out-of-order lsn within and across delivery batches (delivery group and
      within-file order come from a hash, not from lsn),
  (b) duplicate redelivery (a deterministic subset of events is emitted twice,
      the copy landing in a *later* delivery group),
  (c) interleaved c/r/u/d per doc_id with zipf-ish hot-key skew,
  (d) mid-stream additive schema evolution: events with lsn >= evolve_frac*n
      carry a new ``extra_meta`` column; earlier delivery files genuinely do
      not contain the column.

Reference analogs: at-least-once redelivery (``parser/main.py:98-113``),
op mix (``parser/main.py:15-16``), schema evolution
(``parser/createdb.sql:93,114-121``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ["web", "code", "books", "synth"]


def _h(col, seed: int, salt: int):
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def _u01(col, seed: int, salt: int):
    # uniform [0,1) from a 64-bit hash
    return (F.pmod(_h(col, seed, salt), F.lit(1 << 40))).cast("double") / F.lit(float(1 << 40))


def generate_cdc_log(
    spark: SparkSession,
    n_events: int,
    n_docs: int | None = None,
    seed: int = 42,
    evolve_frac: float = 0.6,
    max_tokens: int = 128,
) -> DataFrame:
    """Return the logical change log, one row per event, lsn == id (monotone,
    unique).  Columns: doc_id, op, lsn, ts_ms, tokens, n_tok, source,
    extra_meta (null before the evolution point)."""
    if n_docs is None:
        n_docs = max(16, n_events // 8)
    df = spark.range(n_events).withColumnRenamed("id", "lsn")
    lsn = F.col("lsn")

    # zipf-ish skew: doc rank is log-uniform => rank 1..k gets ~uniform mass
    # per decade, i.e. a handful of hot doc_ids dominate (hot-key churn).
    rank = F.floor(F.pow(F.lit(float(n_docs)), _u01(lsn, seed, 1))).cast("long")
    df = df.withColumn("doc_id", F.concat(F.lit("doc_"), rank))

    opv = F.pmod(_h(lsn, seed, 2), F.lit(100))
    op = (
        F.when(opv < 25, F.lit("c"))
        .when(opv < 80, F.lit("u"))
        .when(opv < 88, F.lit("d"))
        .otherwise(F.lit("r"))
    )
    df = df.withColumn("op", op)
    df = df.withColumn(
        "ts_ms", (F.lit(1700000000000) + lsn * 13 + F.pmod(_h(lsn, seed, 3), F.lit(7))).cast("long")
    )

    n_tok = (F.lit(4) + F.pmod(_h(lsn, seed, 4), F.lit(max_tokens - 4))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(lsn * 131 + i.cast("long"), F.lit(seed)), F.lit(32000)).cast(
            "int"
        ),
    )
    is_del = F.col("op") == "d"
    df = df.withColumn("tokens", F.when(is_del, F.lit(None)).otherwise(tokens))
    df = df.withColumn("n_tok", F.when(is_del, F.lit(None)).otherwise(n_tok).cast("int"))
    df = df.withColumn(
        "source",
        F.element_at(F.array(*[F.lit(s) for s in SOURCES]), (F.pmod(_h(lsn, seed, 5), F.lit(4)) + 1).cast("int")),
    )
    evolve_lsn = int(n_events * evolve_frac)
    df = df.withColumn(
        "extra_meta",
        F.when(
            lsn >= evolve_lsn,
            F.concat(F.lit("meta_"), F.pmod(_h(lsn, seed, 6), F.lit(1000))),
        ).otherwise(F.lit(None).cast("string")),
    )
    return df.select("doc_id", "op", "lsn", "ts_ms", "tokens", "n_tok", "source", "extra_meta")


def write_cdc_log(
    log: DataFrame,
    path: str,
    n_batches: int = 8,
    dup_pct: int = 10,
    seed: int = 42,
    files_per_batch: int = 8,
) -> list[str]:
    """Materialize the log as delivery batches under ``path``.

    Layout: ``path/phase=0/seq=K`` (pre-evolution files WITHOUT the
    extra_meta column) and ``path/phase=1/seq=K`` (evolved files WITH it).
    An event's phase derives from the DATA (``extra_meta`` non-null), so a
    log generated with any ``evolve_frac`` splits correctly.  Within a
    phase, an event's delivery group and within-file order come from hashes
    of its lsn — so arrival order ≠ lsn order.  ``dup_pct``% of events are
    redelivered verbatim, the copy landing in the last third of its phase's
    delivery groups; since originals hash over ALL groups, a copy may share
    its original's batch (exercising within-batch dedup) or arrive in a
    later one (cross-batch redelivery) — both hazards the engine must
    absorb.  Duplicates never cross phases (the copy is byte-identical,
    including its schema).
    Each delivery directory holds ~``files_per_batch`` parquet files — the
    source-parallelism analog of the reference's 10 Kafka partitions
    (``README.md:63``); batch reads, validation, and map-side reduce
    parallelize across them.
    Returns the ordered list of batch directories (the delivery schedule).
    """
    lsn = F.col("lsn")

    dup = log.where(F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(7)), F.lit(100)) < dup_pct)
    base = log.withColumn("__is_dup", F.lit(0))
    dup = dup.withColumn("__is_dup", F.lit(1))
    allev = base.unionByName(dup)

    half = max(1, n_batches // 2)
    n0, n1 = half, n_batches - half
    if n1 == 0:
        # single-batch schedule: one delivery in the EVOLVED schema carries
        # everything (pre-evolution rows just have null extra_meta there) —
        # a phase-1 count of zero would otherwise drop evolved events
        n0, n1 = 0, n_batches
    grp_hash = F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(8), F.col("__is_dup")), F.lit(1000))
    # phase from the DATA, not from a second evolve_frac parameter: a log
    # generated with a different fraction would otherwise assign evolved
    # events (non-null extra_meta) to phase-0 files whose column list drops
    # the column — silent data loss on write
    if n0 == 0:
        phase = F.lit(1)
    elif "extra_meta" in log.columns:
        phase = F.when(F.col("extra_meta").isNull(), 0).otherwise(1)
    else:
        phase = F.lit(0)
    # duplicates always redeliver in the last third of their phase's groups
    grp0 = F.when(
        F.col("__is_dup") == 1, F.lit(max(0, n0 - max(1, n0 // 3))) + F.pmod(grp_hash, F.lit(max(1, n0 // 3)))
    ).otherwise(F.pmod(grp_hash, F.lit(max(1, n0))))
    grp1 = F.when(
        F.col("__is_dup") == 1, F.lit(max(0, n1 - max(1, n1 // 3))) + F.pmod(grp_hash, F.lit(max(1, n1 // 3)))
    ).otherwise(F.pmod(grp_hash, F.lit(max(1, n1))))
    allev = allev.withColumn("__phase", phase).withColumn(
        "__seq", F.when(phase == 0, grp0).otherwise(grp1).cast("int")
    )
    scramble = F.xxhash64(lsn, F.lit(seed), F.lit(9))
    allev = allev.withColumn("__ord", scramble)

    batch_dirs: list[str] = []
    for ph, nph in ((0, n0), (1, n1)):
        if nph <= 0:  # empty phase (single-batch schedule routes all to the other)
            continue
        sub = allev.where(F.col("__phase") == ph)
        cols = ["doc_id", "op", "lsn", "ts_ms", "tokens", "n_tok", "source"]
        if ph == 1 and "extra_meta" in log.columns:
            # a single-batch schedule (n0=0) routes a NOT-yet-evolved log
            # through phase 1; selecting the absent column would throw
            cols.append("extra_meta")
        subfile = F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(11)), F.lit(files_per_batch))
        (
            sub.repartition(nph * files_per_batch, F.col("__seq"), subfile)
            .sortWithinPartitions("__ord")
            .select(*cols, "__seq")
            .write.mode("overwrite")
            .partitionBy("__seq")
            .parquet(os.path.join(path, f"phase={ph}"))
        )
        for k in range(nph):
            d = os.path.join(path, f"phase={ph}", f"__seq={k}")
            if os.path.exists(d):
                batch_dirs.append(d)
    return batch_dirs
