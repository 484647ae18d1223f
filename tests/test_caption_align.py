"""CLIP-style image<->caption alignment gate semantics.

test_oracle_pairs proves spark ≡ DuckDB for clip_align_filter; these
tests pin what the gate MEANS: the integer threshold test is exactly
cos >= 7/25, the planted-aligned docs pass and hash-noise docs near-
never do, and the integer dot/norms are the true sums (recomputed in
plain Python from the same parquet).
"""

import math

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.multimodal import (
    caption_align,
    caption_text_embed,
    embedding_grid,
)
from cola_spark.queries import q_clip_align_filter

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def decisions(spark):
    return {
        r["doc_id"]: r for r in q_clip_align_filter(spark, SF_DIR).collect()
    }


def test_planted_docs_align_noise_does_not(decisions):
    planted = [r for d, r in decisions.items() if d % 5 == 0]
    noise = [r for d, r in decisions.items() if d % 5 != 0]
    assert len(planted) == 100 and len(noise) == 400
    n_p = sum(r["aligned"] for r in planted)
    n_n = sum(r["aligned"] for r in noise)
    # planted captions lean 3x toward the image on 16/64 dims -> the
    # vast majority clear cos >= 0.28; hash-noise cosine is ~N(0, 1/8)
    # so the pass rate is the ~1% Gaussian tail.
    assert n_p >= 90, f"only {n_p}/100 planted docs aligned"
    assert n_n <= 12, f"{n_n}/400 noise docs aligned"


def test_threshold_is_exact_integer_cosine(decisions):
    checked_true = checked_false = 0
    for r in decisions.values():
        dot, na, nb = r["dot"], r["na"], r["nb"]
        want = dot > 0 and 625 * dot * dot >= 49 * na * nb
        assert r["aligned"] == want
        # and the integer form agrees with the float cosine it encodes
        if na and nb:
            cos = dot / math.sqrt(na * nb)
            if abs(cos - 0.28) > 1e-9:  # off the knife edge
                assert r["aligned"] == (cos >= 0.28)
                checked_true += r["aligned"]
                checked_false += not r["aligned"]
    assert checked_true and checked_false  # both branches exercised


def test_integer_sums_match_plain_python(spark, decisions):
    import duckdb

    con = duckdb.connect()
    emb = {
        v: e
        for v, e in con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_DIR}/embeddings.parquet') WHERE vec_id < 8"
        ).fetchall()
    }
    cap_rows = (
        caption_text_embed(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 8)
            .select("doc_id", "text"),
            hash_kind="md5",
        )
        .collect()
    )
    cap = {}
    for r in cap_rows:
        cap.setdefault(r["doc_id"], {})[r["j"]] = r["cv"]
    for d in range(8):
        ie = [math.floor(float(e) * 1000) for e in emb[d]]
        cv = [cap.get(d, {}).get(j, 0) for j in range(64)]
        if d % 5 == 0:
            cv = [c + 3 * ie[j] if j < 16 else c for j, c in enumerate(cv)]
        r = decisions[d]
        assert r["dot"] == sum(a * b for a, b in zip(ie, cv))
        assert r["na"] == sum(a * a for a in ie)
        assert r["nb"] == sum(b * b for b in cv)


def test_production_hash_family_runs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 32
    )
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 32
    )
    out = caption_align(
        embedding_grid(embs), caption_text_embed(docs, hash_kind="xxhash64")
    ).collect()
    assert len(out) == 32
    assert all(r["na"] > 0 for r in out)


def test_clip_mix_is_the_member_intersection(spark, decisions):
    """clip_mix_filter == image_mix_filter rows whose doc is aligned,
    carrying that doc's dot — pure composition, no extra logic."""
    from cola_spark.queries import q_clip_mix_filter, q_image_mix_filter

    base = {r["doc_id"]: r for r in q_image_mix_filter(spark, SF_DIR).collect()}
    out = q_clip_mix_filter(spark, SF_DIR).collect()
    want = {d for d in base if decisions[d]["aligned"]}
    assert {r["doc_id"] for r in out} == want
    assert want  # the composed gate admits something at this scale
    for r in out:
        assert r["dot"] == decisions[r["doc_id"]]["dot"]
        b = base[r["doc_id"]]
        assert (r["w"], r["h"], r["fmt"], r["n_cap"]) == (
            b["w"], b["h"], b["fmt"], b["n_cap"]
        )


def test_embedding_grid_shape(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 4
    )
    rows = embedding_grid(embs).collect()
    assert len(rows) == 4 * 64
    assert {r["j"] for r in rows} == set(range(64))
    # grid values bounded by grid * max|e| -- unit-norm-ish embeddings
    assert all(abs(r["ie"]) <= 1000 for r in rows)


def test_caption_to_image_topk_exact_ordering(spark):
    """Hand-sized exact check: 2-dim vectors where cosine order is
    computable by eye; dot values exact; rank tiling and the id
    tiebreak pinned."""
    from cola_spark.operators.multimodal import caption_to_image_topk

    # images: id 1 -> (10, 0), id 2 -> (7, 7), id 3 -> (0, 10),
    #         id 4 -> (10, 0) (duplicate direction of 1 -> tie by id)
    img = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 0), (2, 0, 7), (2, 1, 7),
         (3, 0, 10 * 0, ), (3, 1, 10), (4, 0, 10), (4, 1, 0)],
        "doc_id long, j int, ie long",
    )
    # query 9 = (1, 0): cos -> 1.0 for ids 1,4 (tie -> id order),
    # 0.707 for 2, 0.0 for 3
    cap = spark.createDataFrame([(9, 0, 1)], "doc_id long, j int, cv long")
    got = sorted(
        (r["rank"], r["image_id"], r["dot"])
        for r in caption_to_image_topk(cap, img, k=4).collect()
    )
    assert got == [(1, 1, 10), (2, 4, 10), (3, 2, 7), (4, 3, 0)]


def test_caption_image_retrieval_planted_signal(spark):
    """The planted 3x-boost makes retrieval discriminative: almost
    every planted query finds its own image in the top-5 (8/8 at
    sf0.01, 7/8 at sf0.001) and most at rank 1 (7/8 at sf0.01) —
    hash noise edges the odd one down, the non-degenerate case."""
    from cola_spark.queries import q_caption_image_retrieval

    rows = q_caption_image_retrieval(spark, SF_DIR).collect()
    assert len(rows) == 8 * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r["image_id"]
    assert set(by_q) == {0, 5, 10, 15, 20, 25, 30, 35}
    self_top5 = sum(1 for q, m in by_q.items() if q in m.values())
    self_at_1 = sum(1 for q, m in by_q.items() if m[1] == q)
    assert self_top5 >= 7
    assert self_at_1 >= 5


def test_caption_retrieval_ivf_recall_curve(spark):
    """IVF pruning trades recall for candidate volume along nprobe —
    pin the measured curve so a quantizer/assignment regression shows:
    recall@5 vs brute >= 0.5 at nprobe=2 (2/8 cells searched) and
    >= 0.65 at nprobe=3, monotone in nprobe; and searching ALL cells
    recovers the brute ranking exactly (the pruning is the ONLY
    approximation — the ranker itself is exact)."""
    from cola_spark.operators.multimodal import (
        caption_text_embed,
        caption_to_image_topk_ivf,
        embedding_grid,
    )
    from cola_spark.queries import _PQT_T, q_caption_image_retrieval

    sf = SF_DIR
    embs = spark.read.parquet(f"{sf}/embeddings.parquet")
    img = embedding_grid(embs)
    qdocs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 40))
        .select("doc_id", "text")
    )
    cap = caption_text_embed(qdocs, hash_kind="md5")
    boost = img.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 40) & (F.col("j") < 16)
    ).select("doc_id", "j", (F.lit(3) * F.col("ie")).alias("cv"))
    planted = (
        cap.unionByName(boost).groupBy("doc_id", "j").agg(F.sum("cv").alias("cv"))
    )
    brute = {}
    for r in q_caption_image_retrieval(spark, sf).collect():
        brute.setdefault(r["query_id"], set()).add(r["image_id"])
    total = sum(len(v) for v in brute.values())

    def recall(nprobe):
        ivf = {}
        rows = caption_to_image_topk_ivf(
            planted, embs, k=5, n_cells=8, nprobe=nprobe, train_iters=_PQT_T
        ).collect()
        for r in rows:
            ivf.setdefault(r["query_id"], set()).add(r["image_id"])
        return rows, sum(len(brute[q] & ivf.get(q, set())) for q in brute) / total

    _, r2 = recall(2)
    _, r3 = recall(3)
    rows8, r8 = recall(8)
    assert r2 >= 0.5    # measured 0.525 (sf0.001) / 0.55 (sf0.01)
    assert r3 >= 0.65   # measured 0.70 / 0.725
    assert r2 <= r3 <= r8
    assert r8 == 1.0    # all cells searched == brute, bit-exact ranker
    want = sorted(
        (r["query_id"], r["image_id"], r["dot"], r["rank"])
        for r in q_caption_image_retrieval(spark, sf).collect()
    )
    got = sorted(
        (r["query_id"], r["image_id"], r["dot"], r["rank"]) for r in rows8
    )
    assert got == want


def test_clip_percentile_filter_topp(spark):
    """Top-p cut: exactly ceil(0.3n) kept, rank is a permutation, and
    the planted every-5th-doc alignment signal dominates the kept set."""
    from cola_spark.queries import q_clip_percentile_filter

    rows = q_clip_percentile_filter(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    kept = [r for r in rows if r.kept]
    assert len(kept) == (300 * n + 999) // 1000
    assert sorted(r.rank for r in rows) == list(range(1, n + 1))
    planted_kept = sum(1 for r in kept if r.doc_id % 5 == 0)
    # planted docs are ~20% of the corpus but must dominate the top-30%
    assert planted_kept / len(kept) > 0.5
