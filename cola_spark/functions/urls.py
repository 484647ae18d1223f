"""URL canonicalization as pure Spark column expressions (JVM-side,
whole-stage-codegen; zero Python in the hot path).

The reference barely canonicalizes (relative→absolute resolution in
cola/core/extractor/utils.py ~L10-40 only); its dedup key is the raw
``str(unit)`` (cola/core/dedup.py ~L20-50). At 10^10-URL scale raw-string
identity leaks duplicates through trivial variants, so our dedup key is
the canonical form:

  * scheme + host lowercased
  * fragment (#...) stripped
  * default ports (:80 http, :443 https) removed
  * empty path → "/"
  * query parameters sorted bytewise (``?b=2&a=1`` ≡ ``?a=1&b=2``)

``url_hash = xxhash64(url_canon)`` per the north rule (BASELINE.json:14).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _nofrag(url: Column) -> Column:
    return F.regexp_replace(url, r"#.*$", "")


def canonicalize_url(url: Column) -> Column:
    u = _nofrag(url)
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    auth = F.lower(F.try_parse_url(u, F.lit("AUTHORITY")))
    auth = (
        F.when(proto == "http", F.regexp_replace(auth, ":80$", ""))
        .when(proto == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.try_parse_url(u, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.try_parse_url(u, F.lit("QUERY"))
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    qpart = F.when(query.isNotNull() & (query != ""), F.concat(F.lit("?"), sorted_q)).otherwise(F.lit(""))
    return F.when(
        proto.isNull() | auth.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(proto, F.lit("://"), auth, path, qpart))


def host_of(url: Column) -> Column:
    return F.lower(F.try_parse_url(_nofrag(url), F.lit("HOST")))


def path_of(url: Column) -> Column:
    p = F.try_parse_url(_nofrag(url), F.lit("PATH"))
    return F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)


def url_hash_col(url_canon: Column) -> Column:
    """Dedup key: xxhash64 of the canonical URL (north rule).

    Replaces the reference's md5/sha bloom hash family
    (cola/core/bloomfilter.py ~L1-120) — one 64-bit key feeds both the
    exact anti-join and the cuckoo-filter fingerprints.
    """
    return F.xxhash64(url_canon)
