"""Distributed BPE trainer vs a pure-Python reference twin (the Sennrich
algorithm with the same deterministic (count desc, pair asc) tie-break),
plus encode/fold consistency and the classic low/lower/newest/widest
example."""

import re

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.operators.bpe import (
    END,
    bpe_encode,
    pair_counts,
    train_bpe,
    word_counts,
)

WORD_RE = re.compile("[a-z0-9]+")


# ---------------------------------------------------------------- twin
def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in WORD_RE.findall(t.lower()):
            vocab[tuple(list(w) + [END])] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: Counter = Counter()
        for syms, n in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


def _ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    out = []
    for w in WORD_RE.findall(text.lower()):
        syms = list(w) + [END]
        for a, b in merges:  # apply merges in learned order
            j, res = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    res.append(a + b)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            syms = res
        out.extend(syms)
    return out


CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "the new nest is the widest nest",
]


def test_train_bpe_matches_python_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id long, text string")
    got = train_bpe(docs, n_merges=12)
    want = _ref_train(CORPUS, 12)
    assert got == want
    # the classic property: 'est</w>' emerges as a unit from newest/widest
    assert any(a + b == "est" + END or (a, b) == ("est", END) or a + b == f"est{END}"
               for a, b in got)


def test_pair_counts_weighted(spark):
    docs = spark.createDataFrame([(1, "ab ab ab"), (2, "ab")],
                                 "doc_id long, text string")
    vocab = word_counts(docs).select(
        F.concat(F.split("word", ""), F.array(F.lit(END))).alias("symbols"), "count"
    )
    got = {(r["a"], r["b"]): r["n"] for r in pair_counts(vocab).collect()}
    # 'ab' occurs 4 times but the vocab table holds ONE row with count=4
    assert got[("a", "b")] == 4 and got[("b", END)] == 4


def test_encode_matches_reference_and_roundtrips(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id long, text string")
    merges = train_bpe(docs, n_merges=10)
    enc = bpe_encode(docs, merges)
    got = {r["doc_id"]: list(r["bpe_tokens"]) for r in enc.collect()}
    for i, t in enumerate(CORPUS):
        assert got[i] == _ref_encode(t, merges), t
        # lossless: concatenating symbols recovers the normalized words
        joined = "".join(got[i]).replace(END, " ").strip()
        assert joined == " ".join(WORD_RE.findall(t.lower()))
    # NULL text row encodes to NULL, not a crash
    nd = spark.createDataFrame([(9, None)], "doc_id long, text string")
    assert bpe_encode(nd, merges).first()["bpe_tokens"] is None


@pytest.mark.parametrize("seed", [3, 17])
def test_train_bpe_randomized_equivalence(spark, seed):
    import random

    rng = random.Random(seed)
    alphabet = "abcd"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 10))
        )
        for _ in range(40)
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    assert train_bpe(docs, n_merges=15) == _ref_train(texts, 15)


def test_train_bpe_reliable_checkpoint(spark, tmp_path):
    """``checkpoint_dir=`` gives the trainer cluster-fault-tolerant lineage
    cuts; merges must be identical to the localCheckpoint default."""
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id long, text string")
    want = train_bpe(docs, n_merges=6, checkpoint_every=2)
    ckpt = tmp_path / "bpe_ckpt"
    got = train_bpe(docs, n_merges=6, checkpoint_every=2,
                    checkpoint_dir=str(ckpt))
    assert got == want
    assert any(ckpt.rglob("*")), "no reliable checkpoint files written"
