"""Learned quality classifier (operators/quality_lr.py): separation on
planted low/high-quality docs, determinism of the trained weights, and
the integer-grid invariants the cross-engine oracle depends on."""

import pyspark.sql.functions as F
import pytest

from cola_spark.operators.quality_lr import (
    hashed_features,
    score_logreg_quality,
    train_logreg_quality,
)

JUNK = " zqj0 zqj1 zqj2 zqj3"


@pytest.fixture(scope="module")
def planted(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(JUNK)))
        .otherwise(F.col("text")).alias("text"),
        F.when(F.col("doc_id") % 3 == 1, F.lit(0.0)).otherwise(F.lit(1.0)).alias("y"),
    ).persist()


def test_separation_on_planted_docs(planted):
    """VERDICT r3 #7 done-bar: the trained classifier must separate the
    planted classes — every junk-carrying doc rejected, every clean doc
    kept, with a strict logit gap between the classes."""
    w = train_logreg_quality(planted, epochs=8, lr=8.0)
    res = score_logreg_quality(planted, w).toPandas()
    junk = res[res.doc_id % 3 == 1]
    clean = res[res.doc_id % 3 != 1]
    assert len(junk) > 0 and len(clean) > 0
    assert not junk.keep.any(), "a junk doc survived the classifier"
    assert clean.keep.all(), "a clean doc was rejected"
    assert junk.logit.max() < 0 < clean.logit.min()


def test_training_is_deterministic(planted):
    """Two independent training runs must produce identical integer
    weights — the property the DuckDB oracle's unrolled replay rests
    on (no float summation-order dependence anywhere)."""
    w1 = {r.bucket: r.w for r in train_logreg_quality(planted, epochs=3, lr=8.0).collect()}
    w2 = {r.bucket: r.w for r in train_logreg_quality(planted, epochs=3, lr=8.0).collect()}
    assert w1 == w2
    assert any(v != 0 for v in w1.values())


def test_junk_buckets_learn_negative_weights(planted):
    """The four injected junk tokens' buckets must carry the most
    negative weights — the classifier learned the right FEATURES, not
    an accidental correlate."""
    from cola_spark.operators.quality_lr import _bucket_expr

    junk_buckets = {
        r.b for r in planted.sparkSession.createDataFrame(
            [(t,) for t in JUNK.split()], "tok string"
        ).select(_bucket_expr(F.col("tok"), 256).alias("b")).collect()
    }
    w = train_logreg_quality(planted, epochs=8, lr=8.0)
    rows = sorted(w.collect(), key=lambda r: r.w)
    worst = {r.bucket for r in rows[: len(junk_buckets)]}
    assert worst == junk_buckets
    assert all(r.w < 0 for r in rows if r.bucket in junk_buckets)


def test_scoring_covers_all_docs_and_featureless_doc(spark):
    """score_logreg_quality returns one row per input doc; a doc whose
    tokens hit no trained bucket scores logit 0, keep=false."""
    train = spark.createDataFrame(
        [(0, "good text here", 1.0), (1, "bad zz", 0.0)],
        "doc_id long, text string, y double",
    )
    w = train_logreg_quality(train, epochs=2, lr=8.0)
    score = score_logreg_quality(
        spark.createDataFrame(
            [(10, "good text"), (11, "unseen wordsonly")],
            "doc_id long, text string",
        ),
        w,
    ).collect()
    got = {r.doc_id: (r.logit, r.keep) for r in score}
    assert set(got) == {10, 11}
    # 'unseen wordsonly' tokens may or may not collide into trained
    # buckets at D=256; the contract is a defined integer logit either way
    assert isinstance(got[11][0], int)


def test_features_are_binary_and_bounded(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = hashed_features(docs, n_buckets=16).collect()
    assert len(rows) == len({(r.doc_id, r.bucket) for r in rows})
    assert all(0 <= r.bucket < 16 for r in rows)


def test_confusion_matrix_replays_from_decisions(spark):
    """The eval row recomputed in Python from the member query's
    per-doc decisions — cells, permille ratios, and conservation."""
    from cola_spark.queries import q_docs_quality_lr, q_quality_lr_confusion

    sf = "/root/testdata/sf0.001"
    dec = q_docs_quality_lr(spark, sf).collect()
    tp = sum(1 for r in dec if r.keep and r.doc_id % 3 != 1)
    fp = sum(1 for r in dec if r.keep and r.doc_id % 3 == 1)
    fn = sum(1 for r in dec if not r.keep and r.doc_id % 3 != 1)
    tn = sum(1 for r in dec if not r.keep and r.doc_id % 3 == 1)
    row = q_quality_lr_confusion(spark, sf).collect()[0]
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.n == tp + fp + fn + tn == len(dec)
    assert row.precision_permille == tp * 1000 // (tp + fp)
    assert row.recall_permille == tp * 1000 // (tp + fn)
