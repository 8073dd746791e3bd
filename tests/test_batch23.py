"""Twenty-third-batch operators: edit-distance fuzzy join, tf-idf
keyword extraction."""

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.dedup import fuzzy_join
from rp_extract_spark.operators.text import tfidf_keywords


# ----------------------------------------------------------- fuzzy_join


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def test_fuzzy_join_complete_vs_brute_force(spark):
    lrows = ["spark", "sprak", "table", "cable", "a", "windowing",
             "win", "batch"]
    rrows = ["spark", "tble", "cble", "ab", "window", "batchy",
             "xylophone"]
    left = spark.createDataFrame(
        [(w, w) for w in lrows], "lid string, lv string")
    right = spark.createDataFrame(
        [(w, w) for w in rrows], "rid string, rv string")
    got = {(r.lid, r.rid): r.dist
           for r in fuzzy_join(left, right, "lv", "rv", "lid", "rid",
                               max_dist=2).collect()}
    want = {
        (a, b): _lev(a, b)
        for a in lrows for b in rrows if _lev(a, b) <= 2
    }
    assert got == want  # completeness AND exact distances


def test_fuzzy_join_zero_dist_exact_matches(spark):
    left = spark.createDataFrame([("x", "query")], "lid string, lv string")
    right = spark.createDataFrame([("y", "query")], "rid string, rv string")
    out = fuzzy_join(left, right, "lv", "rv", "lid", "rid",
                     max_dist=0).collect()
    assert len(out) == 1 and out[0].dist == 0
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "lv", "rv", "lid", "rid", max_dist=-1)


def test_fuzzy_join_length_band_rejects_far_lengths(spark):
    # |len diff| > d pairs never even reach the verify
    left = spark.createDataFrame([("x", "ab")], "lid string, lv string")
    right = spark.createDataFrame(
        [("y", "abcdefgh")], "rid string, rv string")
    assert fuzzy_join(left, right, "lv", "rv", "lid", "rid",
                      max_dist=2).count() == 0


# ------------------------------------------------------- tfidf_keywords


def test_tfidf_keywords_brute_force(spark):
    docs = [
        ("d1", "apple apple banana cherry"),
        ("d2", "banana banana banana cherry"),
        ("d3", "cherry date"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = tfidf_keywords(df, top_k=2).collect()
    got = {(r.doc_id, r.rank): (r.token, r.tf, r.df, r.score_u)
           for r in out}
    g = 1_000_000
    # df: apple 1, banana 2, cherry 3, date 1; N=3
    # d1: apple tf2 -> 2*3*g/1=6g; banana 1 -> 3g/2; cherry 1 -> g
    assert got[("d1", 1)] == ("apple", 2, 1, 6 * g)
    assert got[("d1", 2)] == ("banana", 1, 2, (3 * g) // 2)
    # d2: banana tf3 -> 3*3*g/2=4.5g; cherry -> g
    assert got[("d2", 1)] == ("banana", 3, 2, (9 * g) // 2)
    assert got[("d2", 2)] == ("cherry", 1, 3, g)
    # d3: date 1*3g/1=3g; cherry g
    assert got[("d3", 1)] == ("date", 1, 1, 3 * g)
    assert got[("d3", 2)] == ("cherry", 1, 3, g)
    assert len(got) == 6


def test_tfidf_tie_breaks_token_asc(spark):
    df = spark.createDataFrame(
        [("d", "zz aa")], "doc_id string, text string")
    out = tfidf_keywords(df, top_k=2).orderBy("rank").collect()
    assert [r.token for r in out] == ["aa", "zz"]
    with pytest.raises(ValueError):
        tfidf_keywords(df, top_k=0)
