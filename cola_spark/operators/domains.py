"""Registrable-domain (eTLD+1) extraction for politeness grouping.

cola's speed control and this repo's politeness/budget operators key
on the raw HOST (SURVEY.md §2 rows 21/22) — correct for its intranet
scale, subtly wrong on the open web: "a.blogspot.com" and
"b.blogspot.com" are different REGISTRANTS (blogspot.com is a private
public-suffix — per-host budgets are right), while "www.bbc.co.uk" and
"news.bbc.co.uk" are the SAME site ("co.uk" is a public suffix — a
per-host budget lets a crawler hammer one origin with k subdomain
queues). The web convention (every major crawler, the cookie spec) is
the Public Suffix List: the registrable domain is one label plus the
LONGEST matching public suffix, and politeness groups by that.

Algorithm, all relational:
  * the suffix table is config-scale (the real PSL is ~10k rows) —
    broadcast IS the rule, exactly like the robots and blocklist dims;
  * per DISTINCT host (≪ URL count): split into labels, generate the
    last-k-labels candidate for k = 1..max_k (whole-host match
    included), equi-join candidates against the suffix table, keep the
    longest match per host via one combinable max(struct);
  * unlisted TLDs follow the PSL default rule `*` (the last label is
    the suffix); a host that IS a bare suffix, or a single label, has
    no registrable domain (NULL, kept in the output so the caller
    decides — the PSL contract).

Scale: one distinct over hosts (the same exchange the per-host
politeness queue already pays), a candidate fan-out of max_k rows per
HOST joined against a broadcast dim, one host-keyed max. No URL-scale
shuffle beyond the host distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic stand-in for the PSL (the machinery is the operator,
# not the list — the real ~10k-row PSL drops in as the same broadcast
# dim). Mixed on purpose: 1- and 2-label public suffixes plus a
# private-registry suffix (github.io) that OVERRIDES its parent (io).
DEFAULT_SUFFIXES = [
    "com", "org", "net", "io", "uk", "co.uk", "ac.uk", "github.io",
]


def suffix_frame(spark, suffixes=None) -> DataFrame:
    sufs = list(DEFAULT_SUFFIXES if suffixes is None else suffixes)
    return spark.createDataFrame(
        [(s, s.count(".") + 1) for s in sufs], "suffix string, k int"
    )


def registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    suffixes: DataFrame | None = None,
    max_k: int = 3,
) -> DataFrame:
    """Per distinct host: (host, public_suffix, registrable).

    public_suffix = the longest listed suffix matching a tail of the
    host (the whole host included — a host that IS a public suffix has
    suffix = itself), else the last label (PSL `*` default rule);
    registrable = the label before the suffix + the suffix, NULL when
    no label precedes the suffix (bare suffix / single label)."""
    spark = df.sparkSession
    dim = suffixes if suffixes is not None else suffix_frame(spark)
    hosts = df.select(F.col(host_col).alias("host")).distinct()
    labels = F.split("host", r"\.")
    base = hosts.select(
        "host", labels.alias("_l"), F.size(labels).alias("_n")
    )
    cands = base.select(
        "host",
        "_l",
        "_n",
        F.posexplode(
            F.array(
                *[
                    F.when(
                        F.col("_n") >= k,
                        F.concat_ws(
                            ".", F.slice("_l", F.col("_n") - k + 1, k)
                        ),
                    )
                    for k in range(1, max_k + 1)
                ]
            )
        ).alias("_k0", "cand"),
    ).filter(F.col("cand").isNotNull())
    matched = (
        cands.join(
            F.broadcast(dim), cands["cand"] == dim["suffix"], "inner"
        )
        .groupBy("host")
        .agg(F.max(F.struct(F.col("k"), F.col("suffix"))).alias("_m"))
        .select(
            "host",
            F.col("_m.k").alias("_mk"),
            F.col("_m.suffix").alias("_msuf"),
        )
    )
    # matched side is host-scale like base: never auto-broadcast it
    out = base.join(matched.hint("shuffle_hash"), "host", "left")
    suf = F.coalesce(F.col("_msuf"), F.element_at("_l", F.col("_n")))
    klab = F.coalesce(F.col("_mk"), F.lit(1))
    reg = F.when(
        F.col("_n") > klab,
        F.concat(
            F.element_at("_l", F.col("_n") - klab), F.lit("."), suf
        ),
    )
    return out.select(
        "host",
        suf.alias("public_suffix"),
        reg.alias("registrable"),
    )
