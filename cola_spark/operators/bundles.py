"""Bundle mode — cola's `Bundle` unit re-expressed.

Reference (cola/core/unit.py ~L42-90 + contrib/weibo/bundle.py): a
Bundle groups related URLs crawled as one entity (one weibo user =
profile + pages); its identity is the label (str(bundle)), dedup is on
the label, and the executor crawls a bundle's URLs together.

Spark re-expression: frontier rows carry bundle_label; bundle-level
scheduling reduces each bundle to one logical row (priority = best
member priority, seq = first member seq — FIFO by discovery of the
bundle), cuts per host on bundles, then fans back out to the member
URLs. Custom per-bundle generation logic (cola's unit_cls override)
plugs in as a groupBy(label).applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.priority import schedule_cut


def bundle_reduce(frontier: DataFrame) -> DataFrame:
    """One row per bundle: (host, bundle_label, priority=min,
    seq=min, url_hash=xxhash64(label), n_urls)."""
    return frontier.groupBy("host", "bundle_label").agg(
        F.min("priority").alias("priority"),
        F.min("seq").alias("seq"),
        F.count("*").alias("n_urls"),
    ).withColumn("url_hash", F.xxhash64("bundle_label"))


EXPANDED_SCHEMA = (
    "bundle_label string, host string, url string, priority int, seq long,"
    " force boolean, generated boolean"
)


def paged_bundle_generator(max_pages: int = 3):
    """Worked unit_cls example — cola's WeiboUserBundle shape
    (contrib/weibo/bundle.py): a user bundle whose parser appends
    follow-up page URLs to the live bundle (`current_urls`).

    Given one bundle's member rows, re-emits them and appends pages
    1..min(n_members, max_pages) at the bundle's best priority with
    seq = gmax + min_seq * max_pages + page, where gmax is the global
    max seq of the whole frontier (threaded in by expand_bundles as the
    `_gmax` column). GLOBALLY injective: member seqs are globally
    unique, so bundle min_seqs are distinct and the per-bundle blocks
    [gmax + min*K + 1, gmax + min*K + K] never overlap — and every
    generated seq exceeds gmax ≥ every member seq, so FIFO by
    discovery holds and scheduler anti-joins on seq stay sound. Pure
    function of (member set, gmax): deterministic across
    partitionings.
    """

    def gen(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        label = pdf["bundle_label"].iloc[0]
        host = pdf["host"].iloc[0]
        out = pdf[["bundle_label", "host", "url", "priority", "seq", "force"]].copy()
        out["generated"] = False
        bs, bp = int(pdf["seq"].min()), int(pdf["priority"].min())
        gmax = int(pdf["_gmax"].iloc[0]) if "_gmax" in pdf.columns else 0
        pages = [
            (label, host, f"http://{host}/b/{label}/page/{p}", bp,
             gmax + bs * max_pages + p, False, True)
            for p in range(1, min(len(pdf), max_pages) + 1)
        ]
        gen_rows = pd.DataFrame(
            pages,
            columns=["bundle_label", "host", "url", "priority", "seq", "force", "generated"],
        )
        return pd.concat([out, gen_rows], ignore_index=True)

    return gen


def expand_bundles(frontier: DataFrame, generator=None, out_schema: str = EXPANDED_SCHEMA) -> DataFrame:
    """The unit_cls plug point (SURVEY §2.9): per-bundle URL generation
    with access to the whole live bundle, as
    groupBy(bundle_label).applyInPandas — one Arrow batch per bundle,
    the generator sees every member row and may append follow-ups.
    Downstream the expanded rows flow through the normal admission
    (dedup keeps the member set growing monotonically across rounds).

    The frontier's global max seq rides along as a `_gmax` column (one
    broadcast scalar row, no driver action) so generators can mint new
    seqs in a namespace disjoint from every existing member seq.
    """
    gen = generator or paged_bundle_generator()
    gmax = frontier.agg(F.coalesce(F.max("seq"), F.lit(0)).alias("_gmax"))
    return (
        frontier.crossJoin(F.broadcast(gmax))
        .groupBy("bundle_label")
        .applyInPandas(lambda pdf: gen(pdf), out_schema)
    )


def schedule_bundles(frontier: DataFrame, caps: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Budget cut at bundle granularity, fanned back to member URLs.

    cap counts *bundles* per host per round (cola grants per unit, and
    a bundle is the unit). Members keep their own (priority, seq) order
    inside the bundle via bundle_rank.
    """
    bundles = bundle_reduce(frontier)
    granted = schedule_cut(bundles, caps, salt_buckets).select(
        "host", "bundle_label", F.col("host_rank").alias("bundle_rank")
    )
    return frontier.join(granted, ["host", "bundle_label"], "inner")
