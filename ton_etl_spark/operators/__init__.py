from ton_etl_spark.operators.asof import asof_join
from ton_etl_spark.operators.snapshot import lww_snapshot, first_state, lag_transitions
from ton_etl_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_fingerprints,
    simhash_near_dups,
    ngram_jaccard_pairs,
    embedding_near_dups,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from ton_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_ann_topk,
    ivf_centroids,
    lsh_ann_topk,
)

__all__ = [
    "asof_join",
    "lww_snapshot",
    "first_state",
    "lag_transitions",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "embedding_near_dups",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "cosine_topk_bruteforce",
    "ivf_ann_topk",
    "ivf_centroids",
    "lsh_ann_topk",
]
