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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

_LSH_SEED = 42


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
) -> DataFrame:
    """(cent_id, ce): the IVF coarse quantizer — n_cells deterministic
    centroids chosen as the corpus vectors with the smallest
    md5('ivf:'||id) key (hash-seeded selection ≡ one k-means init step;
    fully reproducible in ANSI SQL, unlike an iterated k-means).
    n_cells rows — broadcast-sized by construction at any corpus scale.
    """
    key = F.md5(F.concat(F.lit("ivf:"), F.col(id_col).cast("string")))
    return (
        corpus.select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("ce"), key.alias("_k")
        )
        .orderBy("_k")
        .limit(n_cells)
        .drop("_k")
    )


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
    cents = ivf_cells(corpus, n_cells, id_col, vec_col)
    inv = _assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")),
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
) -> DataFrame:
    """(m, code, cw array<double>): product-quantization codebook —
    hash-seeded like ivf_cells (the n_codes corpus vectors with the
    smallest md5('pq:'||id) key, split into n_sub contiguous
    sub_dim-wide subvectors), so the whole PQ pipeline is deterministic
    and SQL-oracle-able. n_sub*n_codes rows — broadcast-sized at any
    corpus scale (a trained k-means codebook drops in via the same
    schema)."""
    key = F.md5(F.concat(F.lit("pq:"), F.col(id_col).cast("string")))
    w = Window.orderBy("_k")
    src = (
        corpus.select(
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
            key.alias("_k"),
        )
        .orderBy("_k")
        .limit(n_codes)
        .withColumn("code", (F.row_number().over(w) - 1).cast("int"))
    )
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
) -> DataFrame:
    """(out_id, m, code): nearest codeword per (vector, subspace) by
    cosine, ties → lower code. Relational shape: subspace rows × the
    BROADCAST codebook (n_sub·n_codes rows), cosine as expanded scalar
    arithmetic, argmax as a max(struct(s, -code)) aggregate with a
    map-side partial — no shuffle larger than n_sub rows per vector,
    everything inside whole-stage codegen."""
    sub = _sub_rows(corpus, out_id, n_sub, sub_dim, id_col, vec_col)
    _, cos = _expanded_dot_cos(F.col("sub"), F.col("cw"), sub_dim)
    return (
        sub.join(F.broadcast(codebook), "m")
        .select(out_id, "m", cos.alias("s"), F.col("code"))
        .groupBy(out_id, "m")
        .agg(F.max(F.struct(F.col("s"), (-F.col("code")).alias("nc"))).alias("b"))
        .select(out_id, "m", (-F.col("b.nc")).cast("int").alias("code"))
    )


def pq_encode(
    corpus: DataFrame, codebook: DataFrame, n_sub: int = 16, sub_dim: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): each vector compressed to n_sub
    codebook indices. At 100 TB this is the point of PQ: the corpus's
    n_sub bytes-per-vector code table fits an order of magnitude more
    vectors per executor than raw float arrays."""
    long = _pq_codes_long(corpus, codebook, n_sub, sub_dim, id_col, vec_col)
    return (
        long.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "code"))).alias("mc"))
        .select("vec_id", F.transform("mc", lambda s: s["code"]).alias("codes"))
    )


def pq_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_sub: int = 16,
    n_codes: int = 32, sub_dim: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
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
    compressed scan IS the scale story (n_sub bytes/vector)."""
    cb = pq_codebook(corpus, n_sub, n_codes, sub_dim, id_col, vec_col)
    enc = _pq_codes_long(
        corpus, cb, n_sub, sub_dim, id_col, vec_col, out_id="neighbor_id"
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
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


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
    shrinks while scanned bytes drop as nprobe/n_cells * n_sub/dim."""
    cents = ivf_cells(corpus, n_cells, id_col, vec_col)
    inv = _assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")),
        cents, nprobe=1,
    ).select("neighbor_id", "cell")
    cb = pq_codebook(corpus, n_sub, n_codes, sub_dim, id_col, vec_col)
    enc = _pq_codes_long(
        corpus, cb, n_sub, sub_dim, id_col, vec_col, out_id="neighbor_id"
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
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
