"""Re-expression of cola's priority-MQ ordering tests (tests/test_mq.py)
— BASELINE.json:6: higher priorities served first, FIFO within a level,
and the salted two-phase cut equals the naive single-window cut."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from cola_spark.operators.priority import schedule_cut


def _pending(spark, rows):
    # (host, priority, seq) → minimal frontier-shaped df
    return spark.createDataFrame(
        [(h, p, s, hash((h, s)) % (2**40), f"http://{h}/p/{s}") for h, p, s in rows],
        "host string, priority int, seq long, url_hash long, url_canon string",
    )


def _caps(spark, caps):
    return spark.createDataFrame(list(caps.items()), "host string, cap long")


def test_priority_served_first_fifo_within(spark):
    rows = [("h1", 2, 1), ("h1", 0, 5), ("h1", 0, 9), ("h1", 1, 2), ("h1", 0, 7)]
    out = schedule_cut(_pending(spark, rows), _caps(spark, {"h1": 3}))
    got = [(r.priority, r.seq, r.host_rank) for r in out.orderBy("host_rank").collect()]
    assert got == [(0, 5, 1), (0, 7, 2), (0, 9, 3)]  # all prio-0 FIFO before prio 1/2


def test_cap_respected_per_host(spark):
    rows = [("h1", 0, i) for i in range(10)] + [("h2", 0, 100 + i) for i in range(4)]
    out = schedule_cut(_pending(spark, rows), _caps(spark, {"h1": 2, "h2": 99}))
    counts = {r.host: r.n for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"h1": 2, "h2": 4}


def test_host_without_cap_never_scheduled(spark):
    rows = [("h1", 0, 1), ("h3", 0, 2)]
    out = schedule_cut(_pending(spark, rows), _caps(spark, {"h1": 5}))
    assert {r.host for r in out.collect()} == {"h1"}


def test_salted_cut_equals_naive_cut(spark):
    # 500 rows on one hot host + 2 cold hosts; caps small
    rows = (
        [("hot", i % 3, i) for i in range(500)]
        + [("c1", 0, 1000 + i) for i in range(5)]
        + [("c2", 2, 2000 + i) for i in range(5)]
    )
    pending = _pending(spark, rows)
    caps = _caps(spark, {"hot": 7, "c1": 2, "c2": 9})
    for salt in (1, 4, 16):
        out = schedule_cut(pending, caps, salt_buckets=salt)
        got = sorted((r.host, r.priority, r.seq, r.host_rank) for r in out.collect())
        w = Window.partitionBy("host").orderBy("priority", "seq")
        naive = (
            pending.join(caps, "host")
            .withColumn("host_rank", F.row_number().over(w))
            .filter(F.col("host_rank") <= F.col("cap"))
        )
        want = sorted((r.host, r.priority, r.seq, r.host_rank) for r in naive.collect())
        assert got == want, f"salt={salt} diverged from naive cut"
