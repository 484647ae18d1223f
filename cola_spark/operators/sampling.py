"""Deterministic stratified (domain-mix) sampling.

Training corpora are mixed to target weights per stratum (language,
source domain, quality bucket): "keep 60% of en, 25% of everything
else". At 100 TB the sample must be (a) a pure map-side filter — no
shuffle, no global count pass — and (b) exactly reproducible across
reruns and engines, so downstream stages can be re-executed
independently and still see the same corpus.

No reference analogue — cola (SURVEY.md §2) schedules URLs; mixture
sampling is a training-data step layered on the crawled corpus.

Both properties come from hashing the stable document key into one of
1000 permille buckets and keeping buckets below the stratum's rate:
  * deterministic: same key → same bucket, forever, on any engine
    (the "md5" family is bit-identical in DuckDB, so the full sample
    is SQL-oracle-able; "xxhash64" is the JVM scale default);
  * map-side: rates are config-sized — a literal CASE map, or a
    broadcast join if they live in a table; zero corpus shuffles;
  * composable: a later rate increase from r1 to r2 keeps every doc of
    the r1 sample (buckets are nested), so incremental top-ups ship
    only the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family


def permille_bucket(key_col, hash_kind: str = "xxhash64", seed: str = "samp"):
    """Stable bucket in [0, 1000) from a document key column."""
    h = hash_family(hash_kind)(key_col.cast("string"), seed)
    return F.pmod(h, F.lit(1000)).cast("long")

def stratified_sample(
    docs: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    hash_kind: str = "xxhash64",
) -> DataFrame:
    """Keep each doc iff its permille bucket < its stratum's rate.

    Returns the kept rows as (doc_id, stratum, bucket) — the exact,
    rerun-stable sample membership table.
    """
    bucket = permille_bucket(F.col(key_col), hash_kind=hash_kind)
    rate = F.lit(default_permille)
    for k, v in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(int(v))).otherwise(rate)
    return (
        docs.select(
            F.col(key_col).alias("doc_id"),
            F.col(strata_col).alias("stratum"),
            bucket.alias("bucket"),
            rate.alias("_rate"),
        )
        .filter(F.col("bucket") < F.col("_rate"))
        .drop("_rate")
    )
