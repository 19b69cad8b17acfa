"""Deduplication operators for training-data pipelines over `documents`.

Five families, each scale-shaped so no step is O(n²) over the corpus:

- exact            : hash-groupBy on a content fingerprint (one shuffle)
- minhash + LSH    : shingle → minhash signature → band buckets →
                     candidate pairs only within buckets
- simhash          : 64-bit weighted hash; near-dups = equal hash prefix
                     buckets + hamming check inside buckets
- n-gram Jaccard   : exact Jaccard, but only over LSH candidate pairs
- embedding cosine : near-dups over `embeddings` via bucketed cosine

Everything is JVM built-ins (xxhash64, higher-order array functions,
bitwise aggs); no Python UDFs.  The LSH band join is the classic
(Broder 1997; MMDS ch.3) construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ton_etl_spark.functions.text import fingerprint, words

# deterministic per-permutation seeds for minhash
_MERSENNE = (1 << 61) - 1


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint →
    representative = min id, plus group size.  One hash-agg shuffle."""
    fp = fingerprint(F.col(text_col))
    return (
        docs.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as strings (empty-safe)."""
    ws = words(text)
    n = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(ws, i, k), " "))
        ),
    ).otherwise(F.array(F.array_join(ws, " ")))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    k_shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — sig[i] = min over shingles of the i-th
    permutation hash.  Each shingle STRING is hashed exactly once; the
    n_hashes permutations re-hash the resulting 64-bit value (hashing a
    long is ~10× cheaper than re-hashing the string n_hashes times).
    All array ops; one narrow pass, no shuffle."""
    sh = shingles(F.col(text_col), k_shingle).alias("__sh")
    base = F.transform(F.col("__sh"), lambda s: F.xxhash64(s, F.lit(seed))).alias("__h")
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("__h"), lambda h: F.xxhash64(h, F.lit(seed + i)))
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    return docs.select(F.col(id_col), sh).select(F.col(id_col), base).select(
        F.col(id_col), sig.alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    seed: int = 42,
    min_jaccard_est: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) whose estimated Jaccard (signature
    agreement rate) >= threshold.

    Scale shape: explode to (band, band_hash) keys — rows = n_docs × bands —
    then self-join *within band buckets only*. Identical-band groups are the
    only quadratic zone and are bounded by true near-dup cluster size.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, k_shingle, seed)
    # The signatures are reused three times (both sides of the band
    # self-join via ReusedExchange, plus the pair verification below);
    # persist so shingling+hashing runs once per doc.
    sigs = sigs.persist()
    # band entries carry ONLY (id, band, bhash) — the 256-byte sig arrays
    # stay out of the self-join shuffle; candidate pairs join back to the
    # slim sigs table afterwards (near-dup candidates are sparse).
    band_entries = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at(F.col("sig"), b * rows_per_band + 1 + r)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    verified = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    est = (agree.cast("double") / F.lit(float(n_hashes))).alias("jaccard_est")
    return verified.select("id_a", "id_b", est).where(F.col("jaccard_est") >= min_jaccard_est)


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """64-bit simhash per document: sign-sum of word-hash bits (Charikar
    2002).  Implemented as 64 per-bit majority votes via array ops —
    JVM-side, one narrow pass."""
    ws = F.array_distinct(words(F.col(text_col)))
    hashes = F.transform(ws, lambda w: F.xxhash64(w, F.lit(seed)))
    # bit b of simhash = 1 if (# words with bit b set) > n_words/2
    bits = [
        (
            F.size(
                F.filter(hashes, lambda h: (F.shiftright(h, b).bitwiseAND(F.lit(1))) == 1)
            )
            * 2
            > F.size(hashes)
        ).cast("long")
        for b in range(64)
    ]
    sim = bits[0]
    for b in range(1, 64):
        sim = sim + F.shiftleft(bits[b], b)
    return docs.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by simhash: block on each of 4 16-bit chunks (pigeonhole:
    any pair within hamming distance 3 agrees on ≥1 chunk), verify hamming
    inside blocks.  No all-pairs comparison."""
    fps = simhash_fingerprints(docs, id_col, text_col, seed)
    chunks = fps.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ckey"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(F.col(id_col), "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.ckey").alias("ckey"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    min_jaccard: float = 0.5,
    n_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """EXACT n-gram Jaccard over LSH candidate pairs: LSH prunes the pair
    space, then true Jaccard is computed on the shingle sets of survivors
    only (the standard candidates-then-verify shape)."""
    cands = minhash_lsh_pairs(
        docs, id_col, text_col, n_hashes, bands, k_shingle, seed, min_jaccard_est=0.0
    ).select("id_a", "id_b")
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), k_shingle).alias("sh")
    )
    j = (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = (inter.cast("double") / union.cast("double")).alias("jaccard")
    return j.select("id_a", "id_b", jac).where(F.col("jaccard") >= min_jaccard)


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dups: random-hyperplane LSH buckets (sign sketch) →
    exact cosine only within buckets."""
    from ton_etl_spark.operators.similarity import _hyperplane_bucket, _cosine

    bucketed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _hyperplane_bucket(F.col(vec_col), n_planes, seed).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        _cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
    )
    return cand.where(F.col("cosine") >= min_cosine)
