"""URL canonicalization for web-corpus pipelines.

Dedup and per-site statistics over crawled corpora key on a CANONICAL
URL, not the raw string: scheme/host case, default ports, duplicate and
trailing slashes, tracking parameters (utm_*/fbclid/gclid/ref), parameter
order, and fragments all vary freely across crawls of the same resource.
Normalizing them is the difference between "10 copies of every page" and
an exact-dedup key that works.

Everything here is pure Catalyst (regexp/array expressions — no Python,
no shuffle): URL normalization is embarrassingly parallel and must stay
inside whole-stage codegen next to the scan at 100 TB.

Honest boundary: ``reg_domain`` is the last two dot-labels — the real
rule needs the Public Suffix List (``co.uk`` etc.), which is a broadcast
lookup table in production; the column shape is what matters here.

Reference analogue: georef_ar_etl normalizes entity names/IDs before they
become join keys (clean_string/zero-pad, utils.py); URLs are the web
corpus's join keys and get the same treatment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="
_DEFAULT_PORTS = {"http": 80, "https": 443}


def normalized_url_struct(url: Column) -> Column:
    """Struct of canonical URL parts + the reassembled canonical URL.

    Fields: scheme, host (lowercased, leading ``www.`` stripped),
    reg_domain (last two labels), port (int, NULL when absent or the
    scheme default), path (duplicate slashes collapsed, trailing slash
    stripped, ``/`` when empty), query_norm (tracking params dropped,
    remainder sorted; NULL when none survive), url_norm.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[^:]+://([^/?#]*)", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(authority, r"^([^:]*)", 1)), r"^www\.", ""
    )
    port_s = F.regexp_extract(authority, r":(\d+)$", 1)
    port = F.when(port_s == "", F.lit(None).cast("int")).otherwise(
        port_s.cast("int")
    )
    port = F.when(
        ((scheme == "http") & (port == 80)) | ((scheme == "https") & (port == 443)),
        F.lit(None).cast("int"),
    ).otherwise(port)
    rawpath = F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(rawpath, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda x: (x != F.lit(""))
            & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    query_norm = F.when(
        F.size(params) > 0, F.array_join(params, "&")
    ).otherwise(F.lit(None).cast("string"))
    reg_domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.coalesce(F.concat(F.lit(":"), port.cast("string")), F.lit("")),
        path,
        F.coalesce(F.concat(F.lit("?"), query_norm), F.lit("")),
    )
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        reg_domain.alias("reg_domain"),
        port.alias("port"),
        path.alias("path"),
        query_norm.alias("query_norm"),
        url_norm.alias("url_norm"),
    )


def with_normalized_url(
    df: DataFrame, url_col: str = "url", prefix: str = ""
) -> DataFrame:
    """Append the canonical URL part columns (scheme, host, reg_domain,
    port, path, query_norm, url_norm) to ``df``."""
    s = normalized_url_struct(F.col(url_col))
    out = df.withColumn("_u", s)
    for f in ("scheme", "host", "reg_domain", "port", "path", "query_norm", "url_norm"):
        out = out.withColumn(f"{prefix}{f}", F.col(f"_u.{f}"))
    return out.drop("_u")
