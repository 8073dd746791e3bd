"""Batched BPE training (_simulate_merge_batch: exact driver-side
cascade simulation over windowed pair+triple statistics) must be
bit-identical to the classical one-merge-per-job loop (batch_top_k=1),
while bounding driver round-trips to far fewer passes than merges."""

import random

import pytest

from rp_extract_spark.operators.curation import _S, _simulate_merge_batch, train_bpe


def _random_corpus(spark, seed, n_docs=60, alphabet="abcdefgh"):
    rng = random.Random(seed)
    docs = [
        (
            i,
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
                for _ in range(rng.randint(1, 12))
            ),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(docs, "doc_id int, text string")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_batched_equals_sequential(spark, seed):
    df = _random_corpus(spark, seed).cache()
    seq = train_bpe(df, n_merges=25, min_count=2, batch_top_k=1).collect()
    for k in (4, 64, 256):
        got = train_bpe(df, n_merges=25, min_count=2, batch_top_k=k).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in seq], f"k={k}"
    df.unpersist()


def test_batched_equals_sequential_skewed(spark):
    # heavy repeated words -> flat count ties, created-symbol reuse,
    # chain patterns (abab) exercising the mystery/ambiguity routing
    docs = [(i, "the theory then there than that this the") for i in range(40)]
    docs += [(100 + i, "ab abab ababab ab ab aa aaa aaaa") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id int, text string").cache()
    seq = train_bpe(df, n_merges=30, min_count=1, batch_top_k=1).collect()
    got = train_bpe(df, n_merges=30, min_count=1, batch_top_k=128).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in seq]
    df.unpersist()


def test_batched_equals_sequential_zipf(spark):
    rng = random.Random(11)
    words = [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randint(2, 9)))
        for _ in range(400)
    ]
    weights = [1.0 / (r + 1) for r in range(len(words))]
    docs = [
        (i, " ".join(rng.choices(words, weights=weights, k=25)))
        for i in range(150)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string").cache()
    seq = train_bpe(df, n_merges=40, min_count=2, batch_top_k=1).collect()
    stats: dict = {}
    got = train_bpe(df, n_merges=40, min_count=2, batch_top_k=256,
                    _stats=stats).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in seq]
    # the whole point: far fewer driver round-trips than merges
    assert stats["passes"] <= len(got) // 2, stats
    df.unpersist()


def test_pass_count_bounded_zipf(spark):
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12)))
        for _ in range(3000)
    ]
    weights = [1.0 / (r + 1) for r in range(len(words))]
    docs = [
        (i, " ".join(rng.choices(words, weights=weights, k=40)))
        for i in range(500)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string").cache()
    stats: dict = {}
    m = train_bpe(df, n_merges=200, min_count=2, _stats=stats)
    rows = m.collect()
    assert stats["merges"] == len(rows) == 200
    assert stats["passes"] <= 50, stats  # >= 4x fewer jobs than merges
    df.unpersist()


def _w(*chars):
    return "  ".join(_S + c + _S for c in chars)


def test_simulation_unit_rules():
    # disjoint pairs with clear margins: all merged in one pass
    window = [(_w("a", "b"), 100), (_w("c", "d"), 90), (_w("e", "f"), 80)]
    got = _simulate_merge_batch(window, {}, 0, 1, 10)
    assert [c for _, c in got] == [100, 90, 80]
    # shared symbol with triple statistics: cascade stays exact.
    # corpus fragment "a b c" x 10 plus "b c" x 80: merging (a,b) must
    # cut (b,c) from 90 to 80 before it is picked.
    window = [(_w("a", "b"), 100), (_w("b", "c"), 90), (_w("e", "f"), 85)]
    triples = {(_S + "a" + _S, _S + "b" + _S, _S + "c" + _S): 10}
    got = _simulate_merge_batch(window, triples, 0, 1, 10)
    assert got[0] == (_w("a", "b"), 100)
    assert (_w("e", "f"), 85) in got
    i_ef = got.index((_w("e", "f"), 85))
    # (b,c) decremented to 80 -> sorts after (e,f)
    assert (_w("b", "c"), 80) in got and got.index((_w("b", "c"), 80)) > i_ef
    # created pair (ab, c) carries the triple count 10 exactly
    assert (_S + "ab" + _S + "  " + _S + "c" + _S, 10) in got
    # self-pair merge ends the pass (overlap needs quad context)
    window = [(_w("a", "a"), 50), (_w("c", "d"), 40)]
    got = _simulate_merge_batch(window, {}, 0, 1, 10)
    assert got == [(_w("a", "a"), 50)]
    # min_count gate
    assert _simulate_merge_batch([(_w("a", "b"), 3)], {}, 0, 4, 10) == []
    # limit gate
    window = [(_w("a", "b"), 100), (_w("c", "d"), 90)]
    assert len(_simulate_merge_batch(window, {}, 0, 1, 1)) == 1
    # floor blocks non-first picks at or below it (uncollected ties)
    window = [(_w("a", "b"), 100), (_w("c", "d"), 60)]
    got = _simulate_merge_batch(window, {}, 60, 1, 10)
    assert got == [(_w("a", "b"), 100)]
