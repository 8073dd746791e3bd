"""URL canonicalization and web-corpus curation helpers.

Web-scale training corpora (C4, RefinedWeb, the reference's file-list
discipline in audiofile_read.py's directory walkers generalized to web
provenance) dedup documents by *canonical* URL before any content pass:
the same page is crawled under `HTTP://Host:80/a?b=1&utm_source=x#frag`
and `http://host/a?b=1`, and treating those as two documents double-
counts the page and leaks near-identical text into train/test splits.

Everything here is pure JVM column expressions (regexp + array HOFs) —
no Python UDFs, no shuffles: canonicalization is a row-local map, so
it composes with any downstream groupBy/dedup without adding exchanges.
Every rule is deliberately replayable in ANSI-ish SQL (the DuckDB
oracle recomputes the canonical form from scratch).

Canonicalization rules (applied in order):
  1. strip the fragment (`#...`),
  2. lowercase the scheme and host[:port],
  3. drop default ports (`:80` for http, `:443` for https),
  4. rewrite a trailing `/index.html` to `/`, empty path to `/`,
  5. drop `utm_*` tracking parameters, sort the rest byte-wise.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url", "url_host", "registered_domain", "normalize_urls"]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _split_url(url: Column):
    """(scheme, host[:port], path?query) — all before fragment strip."""
    u = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    return scheme, hostport, pathq


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules. Pure row-local
    JVM expression — safe inside any scan projection."""
    scheme, hostport, pathq = _split_url(url)
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/index\.html$", "/")
    path = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    # split("", "&") yields [""] — the p != "" guard drops it, so a
    # missing query and an empty query normalize identically
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & (F.substring(p, 1, 4) != F.lit("utm_")),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qsorted == F.lit(""), F.lit("")).otherwise(
            F.concat(F.lit("?"), qsorted)
        ),
    )


def url_host(url: Column) -> Column:
    """Lowercased hostname of ``url`` (port stripped unconditionally —
    the host identity is port-free for grouping purposes)."""
    _, hostport, _ = _split_url(url)
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def registered_domain(url: Column) -> Column:
    """Last-two-label registrable domain (``a.b.example.com`` →
    ``example.com``); a dotless host is its own domain. The real
    public-suffix list is data this container does not ship — the
    two-label rule is the documented approximation."""
    host = url_host(url)
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(dom == F.lit(""), host).otherwise(dom)


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canonical_url`` / ``host`` / ``domain`` columns.

    Scale path: row-local projection only — zero exchanges; the typical
    follow-up (groupBy canonical_url for URL-level dedup, groupBy domain
    for per-domain caps) shuffles canonical keys, never document text.
    """
    u = F.col(url_col)
    return (
        df.withColumn("canonical_url", canonical_url(u))
        .withColumn("host", url_host(u))
        .withColumn("domain", registered_domain(u))
    )
