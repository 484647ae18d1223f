"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k (the oracle, also in queries.q_ann_cosine_topk)
plus the scale path: random-hyperplane LSH bucketing so the candidate
join touches ~1/2^B of the corpus per query instead of all of it.

Hyperplanes are a deterministic seeded numpy matrix applied in one
Arrow-vectorized pandas UDF (a [batch × dim] @ [dim × B] matmul — the
kind of work that must NOT be per-row Python). Everything after the
bucket assignment is plain DataFrame joins/windows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from cola_spark.operators.textdedup import spread_small_scan

_LSH_SEED = 42

# Trained-quantizer memo: a trained codebook/centroid set is a pure
# function of (corpus plan, geometry, iterations) and broadcast-sized
# by construction, so train ONCE per session and rebuild from the
# collected rows on reuse — the production shape (an index is trained
# once, then served) and a real win in composed workloads (the refine
# query otherwise re-runs the identical Lloyd loop the plain trained
# query just ran). Keyed by a WEAK session reference (ADVICE r4 —
# id() of a GC'd session can be recycled and alias a new session onto
# stale entries) + semanticHash like textdedup._SPREAD_MEMO.
#
# CACHED PER PLAN, not per data: overwriting the files under an
# unchanged plan in-session returns the stale trained quantizer —
# call clear_trained_cache() after a data overwrite, or rebuild the
# frame from a new path.
import weakref

_TRAINED_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def clear_trained_cache(spark: SparkSession | None = None) -> None:
    """Explicit invalidation hook for data-overwrite workflows: drop
    the trained-quantizer memo for `spark` (or every session)."""
    if spark is None:
        _TRAINED_MEMO.clear()
    else:
        _TRAINED_MEMO.pop(spark, None)


def _trained_memo(corpus: DataFrame, tag: str, params: tuple, build):
    spark = corpus.sparkSession
    per = _TRAINED_MEMO.setdefault(spark, {})
    key = (corpus.semanticHash(), tag, params)
    hit = per.get(key)
    if hit is not None:
        rows, schema = hit
        return spark.createDataFrame(rows, schema)
    df = build()
    rows, schema = df.collect(), df.schema
    if len(per) > 64:
        per.clear()
    per[key] = (rows, schema)
    return spark.createDataFrame(rows, schema)


def _train_sample(corpus: DataFrame, id_col: str, train_permille: int) -> DataFrame:
    """Bounded training input: deterministic permille-bucket sample of
    the corpus (md5 family, seed "train" — bit-identical in DuckDB, so
    sampled training stays fully SQL-oracle-able; nested buckets, so
    raising the rate keeps every previously-trained-on vector).

    At 100 TB full-corpus Lloyd is a non-starter — standard practice
    (FAISS) trains quantizers on a 10^5–10^6-vector sample and encodes
    the full corpus with the result. train_permille=1000 (train on
    everything) is the sandbox/test default ONLY; production callers
    size the sample so `rows * permille / 1000` lands in that band."""
    if train_permille >= 1000:
        return corpus
    from cola_spark.operators.sampling import permille_bucket

    return corpus.filter(
        permille_bucket(F.col(id_col), hash_kind="md5", seed="train")
        < int(train_permille)
    )


def _cosine(a, b):
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank): exact cosine top-k, ties broken by
    neighbor id — the recall oracle for the LSH variant."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
    sims = (
        q.crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _bucket_udf(dim: int, n_planes: int):
    import numpy as np

    rng = np.random.default_rng(_LSH_SEED)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    @F.pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        import numpy as np

        m = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        signs = (m @ planes) > 0
        vals = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return bucket


def lsh_bucketed_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_planes: int = 4,
    dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, rank): approximate top-k — candidates are
    restricted to the query's random-hyperplane bucket (expected corpus
    fraction 1/2^B; cosine-similar vectors collide with probability
    (1-θ/π)^B). The corpus is bucket-partitioned once; each query probes
    its own bucket — an equi-join, not a cross join.

    multiprobe=True (default) additionally probes every Hamming-1
    neighbor bucket of the query (1 + B probes): a near neighbor that
    falls on the wrong side of ONE hyperplane is still found, which is
    the dominant miss mode at small B. Probe fan-out explodes only the
    (small) query side; the corpus is never duplicated.
    """
    bucket = _bucket_udf(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.select(
            "query_id", "qe", F.explode(probes).alias("bucket")
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    sims = (
        q.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a neighbor can be reached via several probes — dedup before ranking
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hash_plane_weights(dim: int = 64, n_planes: int = 4, scale: int = 1000) -> list[list[int]]:
    """Deterministic INTEGER hyperplane weights derived from md5 —
    reproducible in any engine, so the whole LSH pipeline can be
    SQL-oracled (the IVF-centroid trick applied to hyperplanes):
    w[j][d] = md5int("lsh:j:d") mod (2·scale+1) − scale ∈ [−scale, scale].
    An integer grid is as good a random rotation as a gaussian for sign
    tests, and both engines see bit-identical literals."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"lsh:{j}:{d}".encode()).hexdigest()[:15], 16)
            % (2 * scale + 1) - scale
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def _hashed_bucket_expr(vec_col, weights: list[list[int]]):
    """Pure-column bucket id: bit j = [vec · plane_j > 0]. The dot is a
    left-to-right fold over zip_with products (doubles) — the same
    fold DuckDB's list_dot_product evaluates, so the sign (and hence
    the bucket) is engine-stable."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    b = F.lit(0)
    for j, row in enumerate(weights):
        warr = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(v, warr, lambda a, c: a * c),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        b = b + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b


def lsh_bucketed_topk_hashed(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_planes: int = 4,
    dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """lsh_bucketed_topk with md5-derived integer hyperplanes instead of
    the seeded-numpy matrix: identical join/probe/rank structure (bucket
    equi-join, Hamming-1 multiprobe on the query side only), but every
    stage is reproducible in ANSI SQL — this is the variant the DuckDB
    oracle verifies end-to-end (queries.q_ann_lsh_topk). The numpy
    variant remains the vectorized-pandas-UDF exemplar; this one is
    pure column expressions (JVM, codegen)."""
    w = hash_plane_weights(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"),
        _hashed_bucket_expr(F.col(vec_col), w).alias("bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.select("query_id", "qe", F.explode(probes).alias("bucket"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"),
        _hashed_bucket_expr(F.col(vec_col), w).alias("bucket"),
    )
    sims = (
        q.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("sim"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    corpus: DataFrame, min_sim_x1000: int = 350,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, sim_x1000): EXACT embedding-cosine near-duplicate
    pairs — the all-pairs oracle (crossJoin; labeled as such, like
    ngram_jaccard_pairs). The scale path is lsh_near_dup_pairs. The
    integerized sim keeps floats out of hashed comparisons; the raw
    cosine is bit-identical across Spark's fold and DuckDB's
    list_cosine_similarity, so the threshold cut is engine-stable."""
    a = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.floor(_cosine(F.col("va"), F.col("vb")) * 1000).alias("sim_x1000"),
        )
        .filter(F.col("sim_x1000") >= min_sim_x1000)
    )


def lsh_near_dup_pairs(
    corpus: DataFrame, min_sim_x1000: int = 350, n_planes: int = 4, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", multiprobe: bool = True,
) -> DataFrame:
    """(vec_a, vec_b, sim_x1000): bucketed embedding near-dup pairs —
    the scale path: candidates share a hyperplane bucket (or, with
    multiprobe, sit within Hamming-1 of one), so the pair join touches
    ~1/2^B of the corpus² space; every emitted pair is exactly
    verified (precision 1.0, LSH bounds recall only — same contract as
    minhash_dedup_pairs)."""
    bucket = _bucket_udf(dim, n_planes)
    rows = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    probe = rows
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        probe = rows.select("_id", "_v", F.explode(probes).alias("bucket"))
    a, b = probe.alias("a"), rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("vec_a"), F.col("b._id").alias("vec_b"),
            F.col("a._v").alias("va"), F.col("b._v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .select(
            "vec_a", "vec_b",
            F.floor(_cosine(F.col("va"), F.col("vb")) * 1000).alias("sim_x1000"),
        )
        .filter(F.col("sim_x1000") >= min_sim_x1000)
    )


def ivf_cells(
    corpus: DataFrame, n_cells: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0, scale: int = 10000, train_permille: int = 1000,
) -> DataFrame:
    """(cent_id, ce): the IVF coarse quantizer.

    train_iters=0: n_cells deterministic centroids chosen as the corpus
    vectors with the smallest md5('ivf:'||id) key (hash-seeded
    selection ≡ one k-means init step; fully reproducible in ANSI SQL).

    train_iters>0: that init (integerized to floor(x*scale) — cosine
    assignment is scale-invariant, so the grid costs nothing) followed
    by Lloyd iterations as DataFrame ops, engine-stable the same way as
    pq_codebook's training: cosine argmax assignment (ties → lower
    cent_id, the exact _assign_cells/ROW_NUMBER order both engines
    already replay), per-position BIGINT floor-sums for the mean (no
    float summation-order divergence), empty cells keep their previous
    centroid. Assignment is map-side against the broadcast centroid
    row; the update is one (cell, pos)-keyed aggregation per round —
    dim·n_cells agg rows, trivially small.

    train_permille<1000 bounds BOTH the init selection and the Lloyd
    input to the deterministic md5-permille sample (see _train_sample)
    — the 100 TB shape; full-corpus training is sandbox-only.

    n_cells rows — broadcast-sized by construction at any corpus scale.
    """
    tsrc = _train_sample(corpus, id_col, train_permille)
    key = F.md5(F.concat(F.lit("ivf:"), F.col(id_col).cast("string")))
    base = (
        tsrc.select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("ce"), key.alias("_k")
        )
        .orderBy("_k")
        .limit(n_cells)
        .drop("_k")
    )
    if train_iters <= 0:
        return base

    def _build():
        return _ivf_train(tsrc, base, id_col, vec_col, train_iters, scale)

    return _trained_memo(
        corpus, "ivf",
        (n_cells, int(train_iters), int(scale), int(train_permille),
         id_col, vec_col),
        _build,
    )


def _ivf_train(corpus, base, id_col, vec_col, train_iters, scale):
    s_ = float(scale)
    cents = base.select(
        "cent_id",
        F.transform(F.col("ce"), lambda x: F.floor(x.cast("double") * s_).cast("double")).alias("ce"),
    ).localCheckpoint()
    # materialized once — each iteration reads it twice (assign +
    # positional update); see pq_codebook's training-input note
    vrows = spread_small_scan(corpus, id_col).select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")
    ).localCheckpoint()
    for _ in range(int(train_iters)):
        asg = _assign_cells(vrows, cents, nprobe=1)
        upd = (
            asg.select("cell", F.posexplode(F.col("_v")).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.floor(F.col("val").cast("double") * s_)).alias("s"),
                F.count("*").alias("n"),
            )
            .select(
                "cell", "pos",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("double").alias("mv"),
            )
            .groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))), lambda t: t["mv"]
            ).alias("ue"))
        )
        cents = (
            cents.join(upd, cents.cent_id == upd.cell, "left")
            .select("cent_id", F.coalesce(F.col("ue"), F.col("ce")).alias("ce"))
            .localCheckpoint()
        )
    return cents


def _assign_cells(rows: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """Tag each (…, _v) row with its `nprobe` nearest centroid ids
    (cosine, ties → lower cent_id). The centroid set rides along as ONE
    broadcast row holding an array<struct<cent_id,ce>> — the nearest-cell
    fold is pure array expressions per row: map-side, zero shuffle,
    no per-id window."""
    carr = cents.agg(F.collect_list(F.struct("cent_id", "ce")).alias("_cents"))
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _cosine(F.col("_v"), c["ce"]).alias("s"), c["cent_id"].alias("cent_id")
        ),
    )
    by_sim_desc = F.array_sort(
        scored,
        lambda a, b: F.when(a["s"] > b["s"], F.lit(-1))
        .when(a["s"] < b["s"], F.lit(1))
        .otherwise(F.signum(a["cent_id"] - b["cent_id"]).cast("int")),
    )
    return (
        rows.crossJoin(F.broadcast(carr))
        .withColumn("_near", F.slice(by_sim_desc, 1, nprobe))
        .drop("_cents")
        .withColumn("cell", F.explode(F.transform(F.col("_near"), lambda x: x["cent_id"])))
        .drop("_near")
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_cells: int = 8,
    nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0, train_permille: int = 1000,
) -> DataFrame:
    """(query_id, neighbor_id, rank): IVF approximate top-k — the
    data-adaptive counterpart of lsh_bucketed_topk. Corpus vectors are
    assigned to their single nearest coarse centroid (the inverted
    lists); each query probes its `nprobe` nearest cells, so the
    candidate join touches ~nprobe/n_cells of the corpus instead of all
    of it, as an equi-join on cell — never a cross join on the corpus.

    Everything is deterministic (hash-seeded centroids, id tie-breaks)
    so the whole pipeline is DuckDB-oracle-able (queries.q_ann_ivf_topk).
    At scale: centroid table is n_cells rows (broadcast); assignment is
    map-side; the probe join shuffles by cell — cells are data-adaptive,
    so hot cells are bounded by centroid spread, and n_cells grows with
    the corpus (sqrt(N) rule) keeping per-cell lists flat.
    """
    cents = ivf_cells(
        corpus, n_cells, id_col, vec_col,
        train_iters=train_iters, train_permille=train_permille,
    )
    inv = _assign_cells(
        spread_small_scan(corpus, id_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")),
        cents, nprobe=1,
    ).withColumnRenamed("_v", "ce")
    probes = _assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_v")),
        cents, nprobe=nprobe,
    ).withColumnRenamed("_v", "qe")
    sims = (
        probes.join(inv, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def centroids(corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """(label, centroid array<double>, n): per-label mean embedding via
    posexplode → positional avg → re-assemble; pure built-ins."""
    pos = corpus.select(
        label_col, F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    avg = pos.groupBy(label_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m"), F.count("*").alias("n")
    )
    return (
        avg.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm"),
            F.max("n").alias("n"),
        )
        .select(
            label_col,
            F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"),
            "n",
        )
    )


def pq_codebook(
    corpus: DataFrame, n_sub: int = 16, n_codes: int = 32, sub_dim: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0, scale: int = 10000, train_permille: int = 1000,
) -> DataFrame:
    """(m, code, cw array<double>): product-quantization codebook.

    train_iters=0: hash-seeded like ivf_cells (the n_codes corpus
    vectors with the smallest md5('pq:'||id) key, split into n_sub
    contiguous sub_dim-wide subvectors) — deterministic and SQL-
    oracle-able, but it is only a k-means INIT.

    train_iters>0: that init followed by `train_iters` Lloyd iterations
    of per-subspace k-means, entirely as DataFrame ops and entirely
    ENGINE-STABLE so the trained pipeline stays DuckDB-oracled:
      - codewords live on an integer grid (floor(x*scale) per element,
        stored as exact doubles), so the update step's mean is computed
        on BIGINT sums (associative — no float summation-order
        divergence between Spark's partial aggregation and DuckDB's
        sequential sum) and re-floored: cw[j] = floor(sum_int / n).
      - assignment is argmin of the EXPANDED squared L2 distance
        between the scale-multiplied subvector and the integer codeword
        (left-to-right scalar fold — identical IEEE sequence in both
        engines), ties → lower code. L2, not cosine: the floor-mean
        minimizes squared error, which is what makes ADC's dot-product
        reconstruction accurate (measured at sf0.001: recall@5 0.38
        hash-seeded → 0.80 with 3 iterations at n_sub=32, sub_dim=2,
        n_codes=64).
      - empty clusters keep their previous codeword (left join +
        coalesce), so the codebook never shrinks.
    Uniformly scaling every codeword by `scale` leaves both the L2
    argmin and the ADC ranking invariant, so no de-scaling step exists
    anywhere. Each iteration is one broadcast join (corpus subrows ×
    n_sub·n_codes codebook) plus one integer aggregation — the
    standard distributed-k-means cost; the codebook frame is
    localCheckpoint'ed per round (2k rows) to cut iterative lineage.
    train_permille<1000 bounds BOTH the init selection and the Lloyd
    input to the deterministic md5-permille sample (see _train_sample);
    full-corpus training is the sandbox/test default only.

    n_sub*n_codes rows — broadcast-sized at any corpus scale."""
    tsrc = _train_sample(corpus, id_col, train_permille)
    key = F.md5(F.concat(F.lit("pq:"), F.col(id_col).cast("string")))
    w = Window.orderBy("_k")
    src = (
        tsrc.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
            key.alias("_k"),
        )
        .orderBy("_k")
        .limit(n_codes)
        .withColumn("code", (F.row_number().over(w) - 1).cast("int"))
    )
    if train_iters <= 0:
        subs = F.array(*[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col("_v"), m * sub_dim + 1, sub_dim).alias("cw"),
            )
            for m in range(n_sub)
        ])
        return src.select(F.explode(subs).alias("s"), "code").select(
            F.col("s.m").alias("m"), "code", F.col("s.cw").alias("cw")
        )

    def _build():
        return _pq_train(
            tsrc, src, n_sub, n_codes, sub_dim, id_col, vec_col,
            train_iters, scale,
        )

    return _trained_memo(
        corpus, "pq",
        (n_sub, n_codes, sub_dim, int(train_iters), int(scale),
         int(train_permille), id_col, vec_col),
        _build,
    )


def _pq_train(corpus, src, n_sub, n_codes, sub_dim, id_col, vec_col,
              train_iters, scale):
    s_ = float(scale)
    cj = [f"c{j}" for j in range(sub_dim)]
    init_subs = F.array(*[
        F.struct(
            F.lit(m).alias("m"),
            *[
                F.floor(F.element_at(F.col("_v"), m * sub_dim + j + 1) * s_)
                .cast("double").alias(cj[j])
                for j in range(sub_dim)
            ],
        )
        for m in range(n_sub)
    ])
    cb = src.select(F.explode(init_subs).alias("s"), "code").select(
        F.col("s.m").alias("m"), "code", *[F.col(f"s.{c}") for c in cj]
    )
    sub_structs = F.array(*[
        F.struct(
            F.lit(m).alias("m"),
            *[
                F.element_at(F.col("_cv"), m * sub_dim + j + 1)
                .cast("double").alias(f"x{j}")
                for j in range(sub_dim)
            ],
        )
        for m in range(n_sub)
    ])
    # a sub-128MB embeddings file arrives in O(1) scan partitions, which
    # would serialize every iteration's d2 arithmetic on one core —
    # spread before the fan-out (pass-through at real corpus scale).
    # The training input is materialized ONCE (localCheckpoint): every
    # iteration reads it twice (assignment + update), and recomputing
    # scan→repartition→explode per read dominated the loop (measured
    # ~5 s/iter → ~1 s/iter at sf0.1). At true corpus scale the
    # training input is a bounded SAMPLE by standard practice (FAISS
    # trains codebooks on ~10^5-10^6 vectors) — pass the sampled frame
    # as `corpus` and this materialization stays executor-resident.
    sub = spread_small_scan(corpus, id_col).select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    ).select("_vid", F.explode(sub_structs).alias("s")).select("_vid", "s.*") \
        .localCheckpoint()

    def d2_expr():
        d2 = F.lit(0.0)
        for j in range(sub_dim):
            diff = F.col(f"x{j}") * s_ - F.col(cj[j])
            d2 = d2 + diff * diff
        return d2

    for _ in range(int(train_iters)):
        # one pass per iteration: the argmin struct carries the
        # subvector through, so the update aggregates the winner rows
        # directly — no assignment→subrows rejoin. The struct compare
        # never reaches the x payload: (nd, nc) is unique per group
        # (one row per code), so selection semantics are exactly
        # argmin(d2), ties → lower code.
        best = F.struct(
            (-d2_expr()).alias("nd"), (-F.col("code")).alias("nc"),
            *[F.col(f"x{j}").alias(f"x{j}") for j in range(sub_dim)],
        )
        assign = (
            sub.join(F.broadcast(cb), "m")
            .select("_vid", "m", best.alias("t"))
            .groupBy("_vid", "m")
            .agg(F.max(F.col("t")).alias("b"))
            .select(
                "m", (-F.col("b.nc")).cast("int").alias("code"),
                *[F.col(f"b.x{j}").alias(f"x{j}") for j in range(sub_dim)],
            )
        )
        upd = (
            assign
            .groupBy("m", "code")
            .agg(
                *[F.sum(F.floor(F.col(f"x{j}") * s_)).alias(f"s{j}") for j in range(sub_dim)],
                F.count("*").alias("n"),
            )
            .select(
                "m", "code",
                *[
                    F.floor(F.col(f"s{j}").cast("double") / F.col("n"))
                    .cast("double").alias(f"u{j}")
                    for j in range(sub_dim)
                ],
            )
        )
        cb = (
            cb.join(upd, ["m", "code"], "left")
            .select(
                "m", "code",
                *[F.coalesce(F.col(f"u{j}"), F.col(cj[j])).alias(cj[j])
                  for j in range(sub_dim)],
            )
            .localCheckpoint()
        )
    return cb.select(
        "m", "code", F.array(*[F.col(c) for c in cj]).alias("cw")
    )


def _expanded_dot_cos(a, b, d: int):
    """(dot, cosine) between two d-element array columns as EXPANDED
    scalar arithmetic — element_at products summed left-to-right, the
    exact fold order of _cosine / DuckDB's list functions, but as plain
    codegen-able expressions. Higher-order functions (transform /
    aggregate / filter) are evaluated interpreted, outside whole-stage
    codegen — per-row lambda dispatch dominated the PQ hot path (a
    measured ~15 s floor at 500 vectors); expansion removes it."""
    dot, na, nb = F.lit(0.0), F.lit(0.0), F.lit(0.0)
    for j in range(1, d + 1):
        x = F.element_at(a, j).cast("double")
        y = F.element_at(b, j).cast("double")
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return dot, dot / (F.sqrt(na) * F.sqrt(nb))


def _expanded_norm(a, d: int):
    """sqrt(Σ x_j²) of a d-element array column as the same expanded
    left-to-right fold _expanded_dot_cos uses for its norms — identical
    float order, so cos computed as dot/(norm_a·norm_b) with norms
    PRECOMPUTED per side is bit-identical to the inline form. The
    point of precomputing: inside a join, the inline 3-fold (dot + two
    norms, 3·d terms at d=64) blows the generated doConsume past the
    codegen method limit (janino compile failure → whole-stage
    interpreted fallback, measured on semdedup_prune), and it also
    recomputes each per-VECTOR norm once per candidate PAIR. Norms are
    a map-side projection before the exchange; the join keeps only the
    d-term dot."""
    s = F.lit(0.0)
    for j in range(1, d + 1):
        x = F.element_at(a, j).cast("double")
        s = s + x * x
    return F.sqrt(s)


def _sub_rows(
    df: DataFrame, out_id: str, n_sub: int, sub_dim: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(out_id, m, sub): one row per (vector, subspace) — a pure-codegen
    explode of the contiguous subvector views."""
    subs = F.array(*[
        F.struct(
            F.lit(m).alias("m"),
            F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim).alias("sub"),
        )
        for m in range(n_sub)
    ])
    return df.select(F.col(id_col).alias(out_id), F.explode(subs).alias("s")).select(
        out_id, "s.m", "s.sub"
    )


def _pq_codes_long(
    corpus: DataFrame, codebook: DataFrame, n_sub: int, sub_dim: int,
    id_col: str, vec_col: str, out_id: str = "vec_id",
    metric: str = "cos", scale: int = 10000,
) -> DataFrame:
    """(out_id, m, code): nearest codeword per (vector, subspace), ties
    → lower code. Relational shape: subspace rows × the BROADCAST
    codebook (n_sub·n_codes rows), distance as expanded scalar
    arithmetic, argopt as a max(struct(...)) aggregate with a map-side
    partial — no shuffle larger than n_sub rows per vector, everything
    inside whole-stage codegen.

    metric: "cos" (hash-seeded codebooks — the original pipeline) or
    "l2s" (trained codebooks — argmin squared L2 between the
    scale-multiplied subvector and the integer-grid codeword, the SAME
    expression the Lloyd assignment step used, so encode is consistent
    with training)."""
    sub = _sub_rows(
        spread_small_scan(corpus, id_col), out_id, n_sub, sub_dim, id_col, vec_col
    )
    if metric == "cos":
        _, cos = _expanded_dot_cos(F.col("sub"), F.col("cw"), sub_dim)
        better = F.struct(cos.alias("s"), (-F.col("code")).alias("nc"))
    elif metric == "l2s":
        s_ = float(scale)
        d2 = F.lit(0.0)
        for j in range(1, sub_dim + 1):
            diff = (
                F.element_at(F.col("sub"), j).cast("double") * s_
                - F.element_at(F.col("cw"), j).cast("double")
            )
            d2 = d2 + diff * diff
        better = F.struct((-d2).alias("s"), (-F.col("code")).alias("nc"))
    else:
        raise ValueError(f"metric must be cos|l2s, got {metric!r}")
    return (
        sub.join(F.broadcast(codebook), "m")
        .select(out_id, "m", better.alias("t"))
        .groupBy(out_id, "m")
        .agg(F.max(F.col("t")).alias("b"))
        .select(out_id, "m", (-F.col("b.nc")).cast("int").alias("code"))
    )


def pq_encode(
    corpus: DataFrame, codebook: DataFrame, n_sub: int = 16, sub_dim: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", metric: str = "cos",
) -> DataFrame:
    """(vec_id, codes array<int>): each vector compressed to n_sub
    codebook indices. At 100 TB this is the point of PQ: the corpus's
    n_sub bytes-per-vector code table fits an order of magnitude more
    vectors per executor than raw float arrays. metric must match how
    the codebook was built ("l2s" for trained codebooks)."""
    long = _pq_codes_long(
        corpus, codebook, n_sub, sub_dim, id_col, vec_col, metric=metric
    )
    return (
        long.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "code"))).alias("mc"))
        .select("vec_id", F.transform("mc", lambda s: s["code"]).alias("codes"))
    )


def _rank_or_refine(
    sims: DataFrame, queries: DataFrame, corpus: DataFrame, k: int,
    rerank: int, id_col: str, vec_col: str,
) -> DataFrame:
    """Shared ADC tail: rank the (query_id, neighbor_id, score) frame;
    with rerank>0, take a rerank-deep ADC shortlist per query and
    re-rank it by EXACT cosine against the raw vectors (FAISS
    IndexRefineFlat) — k*rerank raw-vector touches per query."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    if rerank <= 0:
        return (
            sims.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
        )
    shortlist = (
        sims.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= int(rerank))
        .select("query_id", "neighbor_id")
    )
    exact = (
        shortlist
        .join(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_ce")),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qe"))
            ),
            "query_id",
        )
        .select("query_id", "neighbor_id", _cosine(F.col("_qe"), F.col("_ce")).alias("sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
    )


def pq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_sub: int = 16,
    n_codes: int = 32, sub_dim: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0, rerank: int = 0, train_permille: int = 1000,
) -> DataFrame:
    """(query_id, neighbor_id, rank): approximate top-k by asymmetric
    distance computation (ADC) over PQ codes — the score is the inner
    product between the raw query and the corpus vector's codebook
    reconstruction. The query side precomputes its (m, code) → dot
    lookup table (n_queries·n_sub·n_codes rows — broadcast-sized);
    the corpus side scans CODES, not vectors, meeting the LUT in a
    map-side broadcast equi-join on (m, code); the per-pair score is a
    16-way pivot summed in fixed subspace order (engine-stable float
    fold, matching the SQL oracle's MAX(CASE) pivot). Pair with IVF
    cells for candidate pruning at extreme scale; here the full
    compressed scan IS the scale story (n_sub bytes/vector).

    train_iters>0 uses the Lloyd-trained codebook (see pq_codebook) and
    the matching L2 encode metric; the ADC LUT is unchanged — trained
    codewords live on a uniformly scaled integer grid, which scales
    every score by the same constant and leaves ranks invariant.

    rerank>0 adds the production refine stage (FAISS's IndexRefineFlat
    shape): ADC selects a `rerank`-deep shortlist per query, then the
    shortlist ONLY is re-scored with exact cosine against the raw
    corpus vectors and the top-k re-ranked. The exact pass touches
    k·rerank vectors per query — negligible beside the compressed scan
    — and lifts recall@5 from 0.80 (trained ADC alone) to 1.00 at
    sf0.001. Fully oracle-able: the exact cosine fold is the proven
    engine-stable one."""
    metric = "l2s" if train_iters > 0 else "cos"
    cb = pq_codebook(
        corpus, n_sub, n_codes, sub_dim, id_col, vec_col,
        train_iters=train_iters, train_permille=train_permille,
    )
    enc = _pq_codes_long(
        corpus, cb, n_sub, sub_dim, id_col, vec_col, out_id="neighbor_id",
        metric=metric,
    )
    qsub = _sub_rows(queries, "query_id", n_sub, sub_dim, id_col, vec_col)
    dot, _ = _expanded_dot_cos(F.col("sub"), F.col("cw"), sub_dim)
    qlut = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "code", dot.alias("t")
    )
    pivot = [
        F.max(F.when(F.col("m") == i, F.col("t"))).alias(f"_t{i}")
        for i in range(n_sub)
    ]
    score = F.col("_t0")
    for i in range(1, n_sub):
        score = score + F.col(f"_t{i}")
    sims = (
        enc.join(F.broadcast(qlut), ["m", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(*pivot)
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    return _rank_or_refine(sims, queries, corpus, k, rerank, id_col, vec_col)


def embedding_decontam(
    corpus: DataFrame, bench: DataFrame, min_sim_x1000: int = 350,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, best_sim_x1000, contaminated): the embedding leg of
    benchmark decontamination (text n-grams → decontam.py, images →
    multimodal.phash_decontam) — flag every corpus vector whose cosine
    to ANY benchmark vector clears the threshold (a paraphrased eval
    item survives n-gram checks but not an embedding check).

    The bench side is broadcast (eval sets are small by construction);
    the corpus meets it in a map-side broadcast nested-loop — linear in
    the corpus, never corpus², with only the final per-vector max
    groupBy as a corpus-scale exchange. Like its siblings
    benchmark_overlap and phash_decontam, this returns a COMPLETE
    decision table — one row per corpus vector — by left-joining the
    sims back onto the corpus ids: with an empty bench every vector
    comes back best_sim_x1000 = -1001 (below any real floor(cos*1000)
    >= -1000), contaminated = false, instead of an empty frame."""
    b = bench.select(F.col(id_col).alias("_bid"), F.col(vec_col).alias("_bv"))
    ids = corpus.select(F.col(id_col).alias("vec_id"))
    sims = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
        .crossJoin(F.broadcast(b))
        .select(
            "vec_id",
            F.floor(_cosine(F.col("_cv"), F.col("_bv")) * 1000).alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.max("s").cast("long").alias("_best"))
    )
    return ids.join(sims, "vec_id", "left").select(
        "vec_id",
        F.coalesce(F.col("_best"), F.lit(-1001).cast("long")).alias("best_sim_x1000"),
        F.coalesce(F.col("_best") >= min_sim_x1000, F.lit(False)).alias("contaminated"),
    )


def ivfpq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    n_cells: int = 8, nprobe: int = 2,
    n_sub: int = 16, n_codes: int = 32, sub_dim: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    train_iters: int = 0, rerank: int = 0, train_permille: int = 1000,
) -> DataFrame:
    """(query_id, neighbor_id, rank): the canonical web-scale ANN index
    — IVF coarse cells prune the candidate set (each query scores only
    its nprobe cells' inverted lists, ~nprobe/n_cells of the corpus),
    and PQ/ADC scores the survivors from n_sub-byte codes instead of
    raw vectors. Composition of the two independently-oracled parts
    (ivf_topk's hash-seeded cells, pq_topk's relational codes + LUT),
    so the combined pipeline is DuckDB-oracled too. Each corpus vector
    lives in exactly one cell, so a multi-cell probe never scores the
    same (query, neighbor) twice — no dedup stage.

    With nprobe = n_cells every list is probed and the result is
    EXACTLY pq_topk (test-pinned); recall decays gracefully as nprobe
    shrinks while scanned bytes drop as nprobe/n_cells * n_sub/dim.

    train_iters>0 trains BOTH quantizers (Lloyd-iterated IVF centroids
    and PQ codebook — see ivf_cells / pq_codebook) with the matching
    L2 encode metric; the nprobe=n_cells ≡ pq_topk invariant holds for
    any fixed codebook, trained or not."""
    metric = "l2s" if train_iters > 0 else "cos"
    cents = ivf_cells(
        corpus, n_cells, id_col, vec_col,
        train_iters=train_iters, train_permille=train_permille,
    )
    inv = _assign_cells(
        spread_small_scan(corpus, id_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")),
        cents, nprobe=1,
    ).select("neighbor_id", "cell")
    cb = pq_codebook(
        corpus, n_sub, n_codes, sub_dim, id_col, vec_col,
        train_iters=train_iters, train_permille=train_permille,
    )
    enc = _pq_codes_long(
        corpus, cb, n_sub, sub_dim, id_col, vec_col, out_id="neighbor_id",
        metric=metric,
    ).join(inv, "neighbor_id")
    probes = _assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_v")),
        cents, nprobe=nprobe,
    ).select("query_id", "cell")
    qsub = _sub_rows(queries, "query_id", n_sub, sub_dim, id_col, vec_col)
    dot, _ = _expanded_dot_cos(F.col("sub"), F.col("cw"), sub_dim)
    qlut = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "code", dot.alias("t")
    )
    pivot = [
        F.max(F.when(F.col("m") == i, F.col("t"))).alias(f"_t{i}")
        for i in range(n_sub)
    ]
    score = F.col("_t0")
    for i in range(1, n_sub):
        score = score + F.col(f"_t{i}")
    sims = (
        enc.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qlut), ["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(*pivot)
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    return _rank_or_refine(sims, queries, corpus, k, rerank, id_col, vec_col)


def semdedup_prune(
    corpus: DataFrame, n_cells: int = 8, min_sim_x1000: int = 350,
    train_iters: int = 0, train_permille: int = 1000,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64,
) -> DataFrame:
    """(vec_id, cell, n_dups, dup_of, keep): SemDeDup-style SEMANTIC
    deduplication (Abbas et al. 2023, the DataComp curation step) —
    cluster the embedding space with the (optionally Lloyd-trained) IVF
    coarse quantizer, then prune WITHIN each cell: a vector is dropped
    when a smaller-id vector in the same cell sits above the cosine
    threshold. Keep-first-occurrence is this repo's deterministic stand
    -in for the paper's keep-farthest-from-centroid rule (same pruning
    set shape, engine-stable tie-break, oracle-able without floats in
    the decision).

    Output is the complete decision table: `n_dups` = how many
    smaller-id in-cell near-dups exist, `dup_of` = the smallest such id
    (-1 when none), `keep` = n_dups == 0 — every admitted AND pruned
    row is auditable, embedding_decontam-style.

    Scale: cell assignment is the map-side broadcast fold of
    _assign_cells (centroids are n_cells rows); the candidate self-join
    is an equi-join ON CELL, never all-pairs — k-means cells are the
    data-adaptive analogue of lsh_near_dup_pairs' hyperplane buckets
    (n_cells grows sqrt(N), keeping per-cell lists flat), and the pair
    verify is the expanded codegen cosine, one row per candidate. The
    within-cell join is corpus-derived on both sides → shuffle_hash
    pinned (the bloom-gate rule: Catalyst's size estimate would
    broadcast a 10^10-row derivation)."""
    cents = ivf_cells(
        corpus, n_cells, id_col, vec_col,
        train_iters=train_iters, train_permille=train_permille,
    )
    assigned = _assign_cells(
        spread_small_scan(corpus, id_col)
        .select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")),
        cents, nprobe=1,
    )
    a = assigned.select(
        F.col("_vid").alias("vec_id"), F.col("_v").alias("_va"), "cell",
        _expanded_norm(F.col("_v"), dim).alias("_sa"),
    )
    b = assigned.select(
        F.col("_vid").alias("_nid"), F.col("_v").alias("_vb"),
        F.col("cell").alias("_cellb"),
        _expanded_norm(F.col("_v"), dim).alias("_sb"),
    )
    dot, _ = _expanded_dot_cos(F.col("_va"), F.col("_vb"), dim)
    cos = dot / (F.col("_sa") * F.col("_sb"))
    dup = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("cell") == F.col("_cellb")) & (F.col("_nid") < F.col("vec_id")),
        )
        .select(
            "vec_id", "_nid",
            F.floor(cos * 1000).cast("long").alias("sim_x1000"),
        )
        .filter(F.col("sim_x1000") >= int(min_sim_x1000))
        .groupBy("vec_id")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("_nid").cast("long").alias("dup_of"),
        )
    )
    return (
        a.select("vec_id", "cell")
        .join(dup.hint("shuffle_hash"), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("n_dups"), F.lit(0)).cast("long").alias("n_dups"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("keep"),
        )
    )


def embedding_pca1(
    corpus: DataFrame,
    iters: int = 3,
    grid: int = 1000,
    vscale: int = 1_000_000,
    gram_div: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(vec_id, pc1): each vector's projection onto the corpus's
    dominant principal direction, computed by POWER ITERATION on the
    integer grid — the spectral member of this repo's trained-as-
    relational-ops family (LR gradient descent, Lloyd k-means, damped
    PageRank, BPE merges): every iteration is exact integer DataFrame
    arithmetic the DuckDB oracle replays as CTEs, so a wrong matrix-
    vector product or a wrong normalization hash-fails.

    The pipeline use is dimensionality triage before the ANN index
    (project-then-bucket, whitening diagnostics, drift monitooring of
    the embedding distribution between crawl snapshots).

    Math on the grid: ie = floor(e·grid) (embedding_grid's exact
    snap); the Gram matrix G_ij = Σ_vec ie_i·ie_j is ONE corpus pass —
    a vec_id-keyed self-join fanning each vector to dim² product rows
    feeding a map-side-combinable (i, j) aggregation with dim² = 4096
    output cells at any corpus size (int64 headroom: 10^10 vectors ·
    10^6 per product ≈ 10^16 < 2^63). The ITERATION products G·v need
    dim·G_max·vscale < 2^63, which a 10^10-vector corpus exceeds —
    power iteration is scale-invariant in G, so set ``gram_div`` (an
    exact floor division of every Gram cell, replayed verbatim by the
    oracle) to about G_max·dim·vscale / 2^62; the sandbox default 1
    keeps the small-scale arithmetic untouched. Iterations then run at
    CONFIG scale (dim-row frames): w = G·v via a broadcast join, then
    the max-norm rescale in overflow- and sign-safe integer form:
    with m = max|w|, sg the sign making the argmax entry positive
    (fixing the eigenvector's sign ambiguity; ties → lower i), and
    q = max(m div vscale, 1),

        v' = ((sg·w + m) div q) − vscale

    — the numerator is ≥ 0 (|w| ≤ m), so floor and truncate agree and
    Spark's `div` equals DuckDB's `//` exactly; no product ever
    exceeds 2·m (the naive w·vscale/m form overflows int64 AND
    diverges between the engines' negative-division conventions). The
    final
    projection pc1 = Σ_j ie_j·v_j is one more broadcast join +
    combinable groupBy. No window, no collect, no floats anywhere."""
    from cola_spark.operators.multimodal import embedding_grid

    g = embedding_grid(
        spread_small_scan(corpus, id_col), id_col=id_col, vec_col=vec_col,
        grid=grid,
    )
    gi = g.select(F.col("doc_id").alias("vid"), F.col("j").alias("i"),
                  F.col("ie").alias("a"))
    gj = g.select(F.col("doc_id").alias("vid"), F.col("j").alias("jj"),
                  F.col("ie").alias("b"))
    gram = (
        gi.join(gj.hint("shuffle_hash"), "vid")
        .groupBy("i", "jj")
        .agg(
            F.expr(f"sum(a * b) div {int(gram_div)}").cast("long").alias("gij")
        )
        .localCheckpoint()  # dim^2 rows; cuts the corpus lineage
    )
    spark = corpus.sparkSession
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("jj"),
        F.lit(int(vscale)).cast("long").alias("v"),
    )
    for _ in range(int(iters)):
        w = (
            gram.join(F.broadcast(v), "jj")
            .groupBy("i")
            .agg(F.sum(F.col("gij") * F.col("v")).cast("long").alias("w"))
        )
        # 1-row (max |w|, sign of the argmax entry); ties -> lower i
        mx = (
            w.orderBy(F.abs(F.col("w")).desc(), F.asc("i"))
            .limit(1)
            .select(
                F.abs(F.col("w")).alias("m"),
                F.when(F.col("w") < 0, F.lit(-1)).otherwise(F.lit(1)).alias("sg"),
            )
        )
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                F.col("i").alias("jj"),
                (
                    F.expr(
                        f"(sg * w + m) div greatest(m div {int(vscale)}, 1)"
                    )
                    - F.lit(int(vscale))
                )
                .cast("long")
                .alias("v"),
            )
            .localCheckpoint()  # dim rows; read by next round twice
        )
    return (
        g.join(F.broadcast(v.withColumnRenamed("jj", "j")), "j")
        .groupBy("doc_id")
        .agg(F.sum(F.col("ie") * F.col("v")).cast("long").alias("pc1"))
        .select(F.col("doc_id").alias("vec_id"), "pc1")
    )


def pca_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bucket_width: int = 1 << 33,
    probe: int = 1,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, rank): top-k by exact cosine over a
    PROJECTION-PRUNED candidate set — the 1-D member of the ANN index
    family (LSH buckets by random hyperplanes, IVF by trained cells;
    this buckets by the corpus's own dominant principal direction from
    embedding_pca1): near vectors have near pc1 projections, so a
    query only scans corpus buckets within ``probe`` of its own.

    bucket = (pc1 + 2^40) div bucket_width — the shift keeps the
    numerator positive because Spark's `div` truncates toward zero
    while DuckDB's `//` floors; they agree only on nonnegative
    operands (the embedding_pca1 rescale lesson, applied again).

    Pruning power tracks the spectrum AND norm comparability: pc1 is
    the u-COMPONENT, so it localizes cosine neighbors only among
    norm-comparable vectors (unit-norm-ish embedding stores — the
    common case; same-direction vectors of wildly different magnitude
    are cosine-near but pc1-far). On the sandbox's near-isotropic
    synthetic vectors the prune is honest but mild: measured recall@5
    0.94 (sf0.01) / 0.80 (sf0.001) scanning ~half the corpus.
    probe=ALL buckets degrades exactly to brute force — test-pinned.

    Scale shape: the projection table is one Gram pass + dim-scale
    iterations (embedding_pca1); bucketing is map-side; the candidate
    join is bucket-keyed equi (query buckets explode ±probe, the
    corpus side never moves); verify is the expanded codegen cosine
    on candidates only."""
    pc = embedding_pca1(
        corpus, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    ).localCheckpoint()  # one projection table serves both sides
    shift = 1 << 40
    bw = int(bucket_width)
    cb = pc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.expr(f"(pc1 + {shift}) div {bw}").cast("long").alias("bucket"),
    )
    qids = queries.select(F.col(id_col).alias("query_id"))
    qb = (
        pc.join(qids.hint("shuffle_hash"), pc["vec_id"] == qids["query_id"])
        .select(
            "query_id",
            F.explode(
                F.sequence(
                    F.expr(f"(pc1 + {shift}) div {bw} - {int(probe)}"),
                    F.expr(f"(pc1 + {shift}) div {bw} + {int(probe)}"),
                )
            ).alias("bucket"),
        )
    )
    cand = cb.join(F.broadcast(qb), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv.hint("shuffle_hash"), "neighbor_id")
        .select(
            "query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_cv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "neighbor_id", "rank")
    )
