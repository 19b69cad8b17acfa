"""Benchmark decontamination — n-gram overlap between a training corpus
and a (much smaller) evaluation/benchmark set: any corpus document sharing
at least ``min_shared`` distinct word k-grams with a probe document is a
contamination hit and gets dropped (or audited) before training.

No reference analog (ton-etl is an indexing pipeline); this is a
first-class training-data operator per the task brief, the same shape the
big open-corpus pipelines use for eval decontamination.

Scale shape: an inverted-index equi-join on the k-gram — the corpus side
explodes to (gram, doc) postings, the probe side is small by construction
(benchmarks are thousands of docs, the corpus is billions), so Spark
broadcasts the probe postings and the corpus never shuffles on the gram.
``max_postings`` drops grams that occur in more than that many PROBE docs
(boilerplate/stopword grams): they multiply the join fan-out while
carrying no signal — the same ubiquity-cap trick as the winnowing postings
index.  All JVM built-ins; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_etl_spark.functions.text import words
from ton_etl_spark.operators.dedup import shingles_of_words


def _gram_postings(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    # tokenizer staged once (round-8): the inline ``shingles(text)`` form
    # clones the regex into each of its four references inside the
    # generator expression (see shingles_of_words)
    return docs.select(F.col(id_col), words(F.col(text_col)).alias("__ws")).select(
        F.col(id_col), F.explode(shingles_of_words(F.col("__ws"), k)).alias("__g")
    )


def ngram_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    min_shared: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """(corpus_id, probe_id, n_shared) for every corpus/probe pair sharing
    >= ``min_shared`` distinct k-grams.  Feed the corpus_id column to an
    anti-join to drop hits, or keep the pairs for an audit trail."""
    c = _gram_postings(corpus, id_col, text_col, k_shingle).withColumnRenamed(
        id_col, "corpus_id"
    )
    p = _gram_postings(probes, id_col, text_col, k_shingle).withColumnRenamed(
        id_col, "probe_id"
    )
    if max_postings is not None:
        ubiquitous = (
            p.groupBy("__g").count().where(F.col("count") > max_postings).select("__g")
        )
        p = p.join(F.broadcast(ubiquitous), on="__g", how="left_anti")
    return (
        c.join(F.broadcast(p), on="__g")
        .groupBy("corpus_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(min_shared))
    )


def decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    min_shared: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """The corpus minus contamination hits (left_anti on the hit ids)."""
    hits = ngram_contamination(
        corpus, probes, id_col, text_col, k_shingle, min_shared, max_postings
    ).select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(hits, on=id_col, how="left_anti")
