"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → signature → banded
bucket-join), SimHash, and n-gram Jaccard verification. The reference's
only dedup is an id-level duplicate check (rp_feature_io.py:274-284);
these generalize it to content-level dedup as required for web-scale
corpus curation.

Scale notes: signatures are computed in one Arrow-batched pandas UDF
pass (vectorized numpy per batch); candidate generation is a single
explode + shuffle on (band, bucket); representative election is the
classic min-id propagation (one groupBy + one self-join), avoiding any
driver-side pair materialization.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 64-bit Mersenne-ish prime field for universal hashing
_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64((1 << 64) - 1)


def exact_dedup(df: DataFrame, cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep one deterministic representative (min id) per duplicate
    group defined by exact equality on ``cols``."""
    w = F.min(id_col).alias("__rep")
    reps = df.groupBy(*cols).agg(w)
    return (
        df.join(reps, on=list(cols), how="inner")
        .filter(F.col(id_col) == F.col("__rep"))
        .drop("__rep")
    )


from functools import lru_cache


@lru_cache(maxsize=1 << 18)
def _token_hash(tok: str) -> int:
    """Memoized 64-bit token hash (corpora have Zipfian vocab — the
    cache hit rate makes shingling ~hash-free on hot tokens)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


def _shingle_hashes(text: str, k: int, mode: str = "word") -> np.ndarray:
    """Hashes of k-shingles of the lowercased text.

    ``mode='word'`` (default): word k-grams — the standard choice for
    corpus near-dedup (discriminates texts that share vocabulary but
    not phrasing). ``mode='char'``: character k-grams for short/ideo-
    graphic text."""
    if mode == "word":
        toks = text.lower().split()
        if not toks:
            toks = ["_"]
        h = np.fromiter(
            (_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        if h.size < k:
            h = np.pad(h, (0, k - h.size), constant_values=np.uint64(0))
        n = h.size - k + 1
        base = np.uint64(1099511628211)
        powers = base ** np.arange(k, dtype=np.uint64)
        idx = np.arange(n)[:, None] + np.arange(k)[None, :]
        return (h[idx] * powers[::-1][None, :]).sum(axis=1)  # wraps mod 2^64
    t = " ".join(text.lower().split())
    if len(t) < k:
        t = t.ljust(k, "_")
    b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    n = b.size - k + 1
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)
    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
    return (b[idx] * powers[::-1][None, :]).sum(axis=1)


_HASH_FAMILY_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _hash_family(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (n_hashes, seed)
    if key not in _HASH_FAMILY_CACHE:
        rng = np.random.default_rng(seed)
        a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
        b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
        _HASH_FAMILY_CACHE[key] = (a, b)
    return _HASH_FAMILY_CACHE[key]


def _min_universal_hash(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min over shingles of h_i(x) = (a_i*x + b_i) mod p, fully
    vectorized over the (n_hashes, n_shingles) grid. 61-bit operands
    would overflow uint64 under multiplication, so the modmul is done
    in two 32-bit halves (wrap-safe)."""
    lo = (sh & np.uint64(0xFFFFFFFF))[None, :]
    hi = (sh >> np.uint64(32))[None, :]
    a_ = a[:, None]
    t = (a_ * hi) % _MERSENNE
    t = ((t << np.uint64(32)) + a_ * lo) % _MERSENNE
    return ((t + b[:, None]) % _MERSENNE).min(axis=1)


def minhash_signature(text: str, n_hashes: int, k: int, seed: int,
                      mode: str = "word") -> np.ndarray:
    """n_hashes-wide MinHash signature from universal hash family
    h_i(x) = (a_i*x + b_i) mod p."""
    sh = np.unique(_shingle_hashes(text, k, mode)) % _MERSENNE
    a, b = _hash_family(n_hashes, seed)
    return _min_universal_hash(sh, a, b)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 7,
    mode: str = "word",
) -> DataFrame:
    """Arrow-batched signature computation: (id, signature array)."""
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            sigs = [
                minhash_signature(t or "", n_hashes, shingle_k, seed, mode).astype(np.int64)
                for t in b[text_col].values
            ]
            yield pd.DataFrame({id_col: b[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
    mode: str = "word",
) -> DataFrame:
    """Near-duplicate detection: returns (id, rep_id) where rep_id is
    the smallest id sharing at least one LSH band bucket (min-id
    election — a one-hop approximation of the duplicate component,
    iterate to converge fully)."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed, mode)
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice("signature", i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    reps = banded.groupBy("band", "bucket").agg(F.min(id_col).alias("__rep"))
    return (
        banded.join(reps, on=["band", "bucket"], how="inner")
        .groupBy(id_col)
        .agg(F.min("__rep").alias("rep_id"))
    )


def simhash64(text: str, seed: int = 11) -> int:
    """64-bit SimHash over word tokens (classic Charikar construction)."""
    tokens = text.lower().split()
    if not tokens:
        return 0
    import hashlib

    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8, salt=seed.to_bytes(8, "big")[:8]).digest(),
            "big",
        )
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    val = int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)
    return val - (1 << 64) if val >= (1 << 63) else val


def simhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", seed: int = 11
) -> DataFrame:
    """Group documents by identical 64-bit SimHash (Hamming-0 tier;
    near tiers would split the hash into 4 sub-bands like LSH)."""
    schema = T.StructType(
        [df.schema[id_col], T.StructField("simhash", T.LongType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "simhash": [simhash64(t or "", seed) for t in b[text_col].values],
                }
            )

    hashed = df.select(id_col, text_col).mapInPandas(run, schema)
    reps = hashed.groupBy("simhash").agg(F.min(id_col).alias("rep_id"))
    return hashed.join(reps, "simhash").select(id_col, "simhash", "rep_id")


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (id_a, id_b) —
    the verification stage after LSH candidate generation. JVM-side:
    ngrams via transform over token sequence, intersection/union via
    array functions."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    g = df.select(F.col(id_col), grams.alias("grams"))
    a = pairs.join(g.withColumnRenamed(id_col, "id_a"), "id_a").withColumnRenamed(
        "grams", "grams_a"
    )
    ab = a.join(g.withColumnRenamed(id_col, "id_b"), "id_b").withColumnRenamed(
        "grams", "grams_b"
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return ab.select(
        "id_a",
        "id_b",
        (inter / F.when(union == 0, 1).otherwise(union)).alias("jaccard"),
    )


def embedding_cosine_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 13,
) -> DataFrame:
    """Embedding near-duplicate detection: random-hyperplane LSH
    bucketing (same family as similarity.lsh_topk) narrows candidates
    to same-bucket pairs; exact cosine >= threshold within a bucket
    elects the min-id representative. Scale path: the pairwise step is
    per-bucket (bounded), never corpus x corpus."""
    from pyspark.sql import functions as F

    from .similarity import bucket_col, cosine_col, hyperplanes

    first = df.select(vec_col).first()
    dim = len(first[0])
    planes = hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    b = df.select(F.col(id_col), v.alias("__v")).withColumn(
        "__bucket", bucket_col(F.col("__v"), planes)
    )
    left = b.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), "__bucket"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), "__bucket"
    )
    pairs = (
        left.join(right, "__bucket")
        .filter(F.col("id_b") < F.col("id_a"))
        .withColumn("__cos", cosine_col(F.col("__va"), F.col("__vb")))
        .filter(F.col("__cos") >= threshold)
    )
    reps = pairs.groupBy("id_a").agg(F.min("id_b").alias("rep_id"))
    return (
        b.select(F.col(id_col))
        .join(reps, b[id_col] == reps["id_a"], "left")
        .select(
            F.col(id_col),
            F.coalesce("rep_id", F.col(id_col)).alias("rep_id"),
        )
    )
