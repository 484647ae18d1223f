"""Generator determinism + shape (SURVEY.md §7 M0)."""

from pyspark.sql import functions as F

from cola_spark.codecs import decode_image
from cola_spark.codecs.pixels import gen_pixels, psnr
from cola_spark.sources import gen_budgets, gen_frontier_seeds, gen_images, gen_robots


def test_images_schema_and_invariants(spark):
    rows = gen_images(spark, 12).collect()
    assert len(rows) == 12
    for r in rows:
        px = decode_image(bytes(r.bytes), r.fmt)
        truth = gen_pixels(r.image_id, r.w, r.h)
        assert px.shape == (r.h, r.w, 3)
        if r.fmt == "png":
            assert (px == truth).all()
        else:
            assert psnr(truth, px) >= 40.0
        assert r.caption.startswith(f"caption of {r.image_id}:")


def test_images_partition_invariant(spark):
    a = {r.image_id: (r.phash, r.caption) for r in gen_images(spark, 20, parts=1).collect()}
    b = {r.image_id: (r.phash, r.caption) for r in gen_images(spark, 20, parts=7).collect()}
    assert a == b


def test_seeds_deterministic_and_skewed(spark):
    s1 = gen_frontier_seeds(spark, 2000, n_hosts=50, parts=2).orderBy("seq").collect()
    s2 = gen_frontier_seeds(spark, 2000, n_hosts=50, parts=8).orderBy("seq").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    hosts = {}
    for r in s1:
        hosts[r.host] = hosts.get(r.host, 0) + 1
    top = max(hosts.values())
    assert top > 3 * (2000 / 50), "expected Zipf skew: hottest host ≫ uniform share"
    assert any(r.force for r in s1) and any(not r.force for r in s1)
    assert {r.priority for r in s1} == {0, 1, 2}


def test_seeds_contain_canonical_duplicates(spark):
    from cola_spark.functions import canonicalize_url

    df = gen_frontier_seeds(spark, 3000, n_hosts=20)
    n = df.count()
    d = df.select(canonicalize_url(F.col("url")).alias("c")).distinct().count()
    assert d < n, "variants/dups must collapse under canonicalization"


def test_robots_and_budgets(spark):
    r = gen_robots(spark, 100).collect()
    assert all(x.disallow_prefix in ("/", "/p/1") for x in r)
    assert 0 < len(r) < 100
    b = gen_budgets(spark, 100).collect()
    assert len(b) == 100
    assert all(5 <= x.budget <= 50 and 2 <= x.rate_per_round <= 9 for x in b)
