"""Twenty-sixth-batch operators: canonical-URL normalization/dedup,
CCNet-style bigram LM filter, token blocklist audit."""

import math

import pytest
from pyspark.sql import functions as F

from rp_extract_spark.operators.text import (
    OOV_TOKEN,
    blocklist_hits,
    score_bigram_lm,
    train_bigram_lm,
)
from rp_extract_spark.operators.web import normalize_urls


# ------------------------------------------------- canonical URLs


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def _canon(spark, raw):
    out = normalize_urls(_urls(spark, [(1, raw)]))
    return out.select("canonical_url", "host", "domain").first()


def test_url_case_port_fragment(spark):
    r = _canon(spark, "HTTP://WWW.Ex.COM:80/A/b?x=1#frag")
    assert r["canonical_url"] == "http://www.ex.com/A/b?x=1"  # path case kept
    assert r["host"] == "www.ex.com"
    assert r["domain"] == "ex.com"


def test_url_nondefault_port_kept(spark):
    r = _canon(spark, "https://ex.com:80/a")
    assert r["canonical_url"] == "https://ex.com:80/a"
    assert r["host"] == "ex.com"


def test_url_default_https_port_stripped(spark):
    r = _canon(spark, "https://Ex.Com:443/a")
    assert r["canonical_url"] == "https://ex.com/a"


def test_url_param_sort_and_utm_strip(spark):
    r = _canon(spark, "http://h.co/p?z=9&utm_source=x&a=1&utm_medium=y&b=2")
    assert r["canonical_url"] == "http://h.co/p?a=1&b=2&z=9"


def test_url_empty_path_and_index_html(spark):
    assert _canon(spark, "http://h.co")["canonical_url"] == "http://h.co/"
    assert (
        _canon(spark, "http://h.co/d/index.html")["canonical_url"]
        == "http://h.co/d/"
    )
    # index.html only strips as a path SUFFIX
    assert (
        _canon(spark, "http://h.co/index.html/x")["canonical_url"]
        == "http://h.co/index.html/x"
    )


def test_url_query_only_utm_drops_question_mark(spark):
    r = _canon(spark, "http://h.co/p?utm_source=x")
    assert r["canonical_url"] == "http://h.co/p"


def test_url_dotless_host_is_own_domain(spark):
    r = _canon(spark, "http://localhost:8080/a")
    assert r["host"] == "localhost"
    assert r["domain"] == "localhost"


def test_url_equivalent_variants_collapse(spark):
    rows = [
        (1, "HTTP://A.Ex.COM:80/p/index.html?b=2&utm_source=t&a=1#z"),
        (2, "http://a.ex.com/p/?a=1&b=2"),
    ]
    out = normalize_urls(_urls(spark, rows))
    canon = [r["canonical_url"] for r in out.collect()]
    assert canon[0] == canon[1] == "http://a.ex.com/p/?a=1&b=2"


# ------------------------------------------------- bigram LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_model_exact_math(spark):
    # corpus: "a b a b" + "b c" -> pairs: (a,b)x2, (b,a)x1, (b,c)x1
    # vocab V = 3 (a, b, c); alpha = 0.5
    d = _docs(spark, [(1, "a b a b"), (2, "b c")])
    m = {
        (r["w1"], r["w2"]): r["logp"]
        for r in train_bigram_lm(d, alpha=0.5).collect()
    }
    v = 3
    c1_a, c1_b = 2, 2  # context totals
    assert m[("a", "b")] == round(math.log((2 + 0.5) / (c1_a + 0.5 * v)), 6)
    assert m[("b", "c")] == round(math.log((1 + 0.5) / (c1_b + 0.5 * v)), 6)
    # per-context OOV rows + the global fallback row exist
    assert m[("a", OOV_TOKEN)] == round(math.log(0.5 / (c1_a + 0.5 * v)), 6)
    assert m[(OOV_TOKEN, OOV_TOKEN)] == round(math.log(1.0 / v), 6)


def test_bigram_score_backoff_levels(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "b c")])
    model = train_bigram_lm(train, alpha=0.5)
    rows = {
        r["doc_id"]: r
        for r in score_bigram_lm(
            _docs(
                spark,
                [
                    (10, "a b"),      # seen pair
                    (11, "a c"),      # seen context, unseen pair -> ctx OOV
                    (12, "z q"),      # unseen context -> global fallback
                    (13, "single"),   # < 2 tokens -> 0.0 / 0
                    (14, None),       # NULL text -> 0.0 / 0
                ],
            ),
            model,
        ).collect()
    }
    v = 3
    lp_ab = round(math.log(2.5 / 3.5), 6)
    lp_actx = round(math.log(0.5 / 3.5), 6)
    lp_glob = round(math.log(1.0 / v), 6)
    assert rows[10]["lm2_score"] == pytest.approx(lp_ab, abs=2e-6)
    assert rows[11]["lm2_score"] == pytest.approx(lp_actx, abs=2e-6)
    assert rows[12]["lm2_score"] == pytest.approx(lp_glob, abs=2e-6)
    assert rows[13]["lm2_score"] == 0.0 and rows[13]["n_bigrams"] == 0
    assert rows[14]["lm2_score"] == 0.0 and rows[14]["n_bigrams"] == 0
    assert rows[10]["n_bigrams"] == 1


def test_bigram_score_orders_quality(spark):
    # a corpus-typical doc outscores token salad over the same vocab
    train = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
    model = train_bigram_lm(train)
    s = {
        r["doc_id"]: r["lm2_score"]
        for r in score_bigram_lm(
            _docs(spark, [(1, "the cat sat"), (2, "mat the on cat")]), model
        ).collect()
    }
    assert s[1] > s[2]


def test_bigram_model_requires_global_row(spark):
    d = _docs(spark, [(1, "a b")])
    bad = train_bigram_lm(d).filter(F.col("w1") != OOV_TOKEN)
    with pytest.raises(ValueError, match="global OOV"):
        score_bigram_lm(d, bad)


# ------------------------------------------------- blocklist


def test_blocklist_hits_sorted_deduped(spark):
    d = _docs(spark, [(1, "bad worse bad ok"), (2, "all clean here"), (3, None)])
    got = {r["doc_id"]: r for r in blocklist_hits(d, ["worse", "bad"]).collect()}
    assert got[1]["hits"] == "bad,worse"  # sorted, deduped
    assert got[1]["n_hits"] == 2 and got[1]["blocked"] == 1
    assert got[2]["n_hits"] == 0 and got[2]["blocked"] == 0
    assert got[2]["hits"] == ""
    assert got[3]["n_hits"] == 0 and got[3]["blocked"] == 0


def test_blocklist_no_shuffle(spark):
    import io
    from contextlib import redirect_stdout

    d = _docs(spark, [(1, "a b")])
    buf = io.StringIO()
    with redirect_stdout(buf):
        blocklist_hits(d, ["a"]).explain("formatted")
    assert "Exchange" not in buf.getvalue()
