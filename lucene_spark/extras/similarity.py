"""Similarity search over embedding columns (ANN for training-data dedup).

* :func:`knn_brute` — exact cosine top-k: JVM-side ``zip_with``/``aggregate``
  dot products against a broadcast query vector, distributed
  ``ORDER BY cos DESC, id ASC LIMIT k`` (TakeOrderedAndProject = per-partition
  heap + driver merge).  The 100 TB shape: one scan, no shuffle beyond the
  final top-k collect.
* :func:`hyperplane_codes` / :func:`knn_lsh` — the sub-quadratic scale path:
  random-hyperplane LSH (sign of ``V·P`` per plane → n-bit bucket code,
  vectorized numpy matmul per Arrow batch).  A query probes the ``nprobe``
  buckets nearest in code Hamming distance and brute-forces only those —
  recall tuned by (nbits, nprobe), asserted ≥ 0.9 @ defaults in tests.
  With ``nprobe = 2**nbits`` the result is exactly :func:`knn_brute`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.extras.dedup import cosine_expr


def _query_vec_expr(query_vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")


def knn_brute(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cos rounded to 6dp, rank)."""
    from pyspark.sql import Window

    q = _query_vec_expr(query_vec)
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(
            cosine_expr(F.col(vec_col).cast("array<double>"), q), 6
        ).alias("cos"),
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))


# ------------------------------------------------------------ hyperplane LSH


def hyperplanes(dim: int, nbits: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, nbits))


def hyperplane_codes(
    emb: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, code int) — sign-bit bucket code per vector (numpy matmul)."""
    nbits = planes.shape[1]
    weights = np.int64(1) << np.arange(nbits, dtype=np.int64)

    @F.pandas_udf(T.LongType())
    def code(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes) > 0
        return pd.Series(bits @ weights)

    return emb.select(F.col(id_col).alias("vec_id"), code(F.col(vec_col)).alias("code"))


def _code_of(query_vec, planes: np.ndarray) -> int:
    bits = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    return int(bits @ (np.int64(1) << np.arange(planes.shape[1], dtype=np.int64)))


def lsh_candidate_pairs(
    emb: DataFrame,
    nbits: int = 16,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing a bucket in ANY of
    ``bands`` independent hyperplane tables (banding boosts recall exactly
    like MinHash bands)."""
    # one driver-side dim probe for ALL bands (one Spark job, not one per band)
    dim = len(emb.select(vec_col).first()[0])
    cand = None
    for b in range(bands):
        planes = hyperplanes(dim, nbits, seed + 1000 * b)
        coded = hyperplane_codes(emb, planes, id_col, vec_col).withColumn(
            "band", F.lit(b)
        )
        pairs = (
            coded.alias("x")
            .join(coded.alias("y"), ["band", "code"])
            .where(F.col("x.vec_id") < F.col("y.vec_id"))
            .select(
                F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
            )
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    return cand.distinct()


def lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    nbits: int = 16,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic cosine near-dup pairs: LSH candidates + exact cosine
    verification (precision 1; recall set by (nbits, bands) vs the
    threshold).  Work = O(n·bands) codes + O(candidate pairs) — never the
    n² of :func:`~lucene_spark.extras.dedup.embedding_near_dup_pairs`.

    REGIME NOTE (measured on the test embeddings): hyperplane LSH is a
    HIGH-threshold tool.  At threshold ~0.95 (p_bit ≈ 0.99) the defaults
    give recall 1 with candidates ≪ n²; at threshold 0.4 on near-orthogonal
    vectors (p_bit ≈ 0.63) no (nbits, bands) beats the all-pairs join — the
    candidate set degenerates toward n².  Low-threshold jobs belong on the
    exact verifier path.

    Filter semantics match ``embedding_near_dup_pairs`` exactly: the RAW
    double cosine is thresholded, then rounded to 6dp for output."""
    from lucene_spark.extras.dedup import cosine_expr

    cand = lsh_candidate_pairs(emb, nbits, bands, seed, id_col, vec_col)
    e = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return (
        cand.join(e.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), "id_a")
        .join(e.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def with_perturbed_copies(
    emb: DataFrame,
    n_copies: int = 50,
    id_offset: int = 100000,
    scale: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministically append perturbed copies of the first ``n_copies``
    vectors (near-dups at cosine ≈ 0.999) — the planted-duplicate fixture
    for the LSH scale-path gate.  The noise is pure integer math
    (``((id·31 + i·7) mod 13 − 6)/100``) so DuckDB reproduces it bit-exactly
    (no libm transcendental divergence)."""
    # two-step select: the noise must reference the ORIGINAL id — naming it
    # `_oid` first avoids the sibling-alias capture where `vec_id` inside
    # the lambda resolves to the shifted output column
    src = emb.filter(F.col(id_col) < n_copies).select(
        F.col(id_col).alias("_oid"), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    copies = src.select(
        (F.col("_oid") + id_offset).alias(id_col),
        F.transform(
            F.col(vec_col),
            lambda x, i: x
            + F.lit(scale)
            * (((F.col("_oid") * 31 + i * 7) % 13 - 6).cast("double") / F.lit(100.0)),
        ).alias(vec_col),
    )
    return emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).unionByName(copies)


def ivf_fit_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 10,
    sample: int = 4096,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """IVF coarse quantizer: k-means (Lloyd) on a bounded driver-side sample.

    The sample is tiny and fixed-size regardless of corpus scale (the
    centroid count × dim matrix is KBs); assignment of the full corpus is
    the distributed part (:func:`ivf_assign`).  Deterministic: seeded
    sample + seeded init + fixed iterations."""
    # ORDER BY a stable key before limit: an unordered limit over a
    # sampled frame varies with partition layout, so centroids (and every
    # IVF probe downstream) would only be deterministic per-layout
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T  # cosine on normalized vectors
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, list_id) — nearest-centroid assignment, one vectorized
    matmul per Arrow batch (the inverted-list build; at scale, write this
    partitioned by list_id so probes prune the file scan)."""

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ centroids.T).argmax(axis=1).astype(np.int32))

    return emb.select(F.col(id_col).alias("vec_id"), assign(F.col(vec_col)).alias("list_id"))


def knn_ivf(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest inverted lists,
    brute-force only their members (the FAISS IVF-flat shape).  With
    ``nprobe == n_centroids`` this is exactly :func:`knn_brute`.  Pass
    pre-computed ``centroids``/``assignments`` to amortize across queries."""
    if centroids is None:
        centroids = ivf_fit_centroids(
            emb, n_centroids, seed=seed, vec_col=vec_col, id_col=id_col
        )
    if assignments is None:
        assignments = ivf_assign(emb, centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))
    probes = [int(c) for c in order[:nprobe]]
    cand_ids = assignments.filter(F.col("list_id").isin(probes)).select("vec_id")
    cands = emb.join(
        cand_ids.withColumnRenamed("vec_id", "_cand_id"),
        emb[id_col] == F.col("_cand_id"),
        "left_semi",
    )
    return knn_brute(cands, query_vec, k, id_col, vec_col)


# ------------------------------------------------------------------- IVF-PQ


def pq_train(
    emb: DataFrame,
    m: int = 8,
    nbits: int = 8,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantizer codebooks ``(m, 2**nbits, dim/m)`` — per-subspace
    k-means on the same bounded, deterministic driver sample as the IVF
    coarse quantizer (the FAISS ``IVFPQ`` training shape; sample size is
    fixed regardless of corpus scale).

    Vectors are L2-normalized first, so asymmetric PQ distances to a
    normalized query estimate ``‖q − x‖² = 2 − 2·cos(q, x)`` — ranking by
    small PQ distance IS ranking by cosine, keeping PQ compatible with the
    cosine everything else here uses.
    """
    if nbits > 8:
        raise ValueError("nbits > 8 would not fit uint8 codes")
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = 2**nbits
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        n_eff = min(ksub, len(xs))
        cent = xs[rng.choice(len(xs), size=n_eff, replace=False)].copy()
        for _ in range(iters):
            d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(axis=1)
            for c in range(n_eff):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        # pad short codebooks by repetition: duplicate centroids are
        # harmless (encode argmin picks the first)
        books[j, :n_eff] = cent
        if n_eff < ksub:
            books[j, n_eff:] = cent[0]
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>[m]) — the compressed corpus: one byte per
    subspace instead of ``dsub`` floats (m=8, nbits=8 over 64-dim float32
    = 32× memory).  One vectorized matmul per (subspace, Arrow batch)."""
    m, _ksub, dsub = codebooks.shape
    books = codebooks
    # argmin ‖xs − c‖² = argmin (‖c‖² − 2·xs·c): one GEMM per subspace
    cnorm = (books**2).sum(-1)  # (m, ksub)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        mtx = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        mtx = mtx / np.maximum(np.linalg.norm(mtx, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(mtx), m), dtype=np.int32)
        for j in range(m):
            xs = mtx[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = (cnorm[j][None, :] - 2.0 * (xs @ books[j].T)).argmin(
                axis=1
            )
        return pd.Series(list(codes))

    return emb.select(
        F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("codes")
    )


def knn_ivfpq(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    nbits: int = 8,
    refine: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    assignments: DataFrame | None = None,
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the 10⁹-vector memory answer.

    The plan: probe the ``nprobe`` nearest inverted lists (partition-pruned
    when codes are stored ``PARTITIONED BY (list_id)``), score ONLY the
    probed lists' PQ codes by asymmetric-distance table lookups (the query's
    ``(m, 2**nbits)`` distance table is broadcast; per candidate the
    distance is m byte-indexed lookups — no float vectors are read), keep
    the best ``refine·k`` by PQ distance, then re-rank exactly those with
    true cosine (the standard IVFPQ+refine recipe, so the returned scores
    are exact and directly comparable to :func:`knn_brute`).  Pass
    precomputed ``centroids``/``assignments``/``codebooks``/``codes`` to
    amortize training and encoding across queries.  ``refine=0`` skips the
    exact pass and returns PQ distances (``adist`` ascending).
    """
    if centroids is None:
        centroids = ivf_fit_centroids(
            emb, n_centroids, seed=seed, vec_col=vec_col, id_col=id_col
        )
    if assignments is None:
        assignments = ivf_assign(emb, centroids, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_train(
            emb, m=m, nbits=nbits, seed=seed, vec_col=vec_col, id_col=id_col
        )
    if codes is None:
        codes = pq_encode(emb, codebooks, id_col, vec_col)
    mm, _ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))
    probes = [int(c) for c in order[:nprobe]]
    # asymmetric distance tables: ‖q_j − c‖² per subspace centroid
    tables = np.stack(
        [
            ((codebooks[j] - q[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(-1)
            for j in range(mm)
        ]
    )

    @F.pandas_udf(T.DoubleType())
    def adc(code_col: pd.Series) -> pd.Series:
        cm = np.stack([np.asarray(c, dtype=np.int64) for c in code_col])
        return pd.Series(
            np.take_along_axis(tables, cm.T, axis=1).sum(axis=0)
        )

    cand = codes.join(
        assignments.filter(F.col("list_id").isin(probes)).select("vec_id"),
        "vec_id",
        "left_semi",
    ).withColumn("adist", adc(F.col("codes")))
    if refine <= 0:
        from pyspark.sql import Window

        topk = cand.select("vec_id", F.round("adist", 6).alias("adist")).orderBy(
            F.asc("adist"), F.asc("vec_id")
        ).limit(k)
        w = F.row_number().over(Window.orderBy(F.asc("adist"), F.asc("vec_id"))) - 1
        return topk.withColumn("rank", w.cast("int"))
    short = cand.orderBy(F.asc("adist"), F.asc("vec_id")).limit(refine * k)
    finalists = emb.join(
        short.select("vec_id").withColumnRenamed("vec_id", "_f"),
        emb[id_col] == F.col("_f"),
        "left_semi",
    )
    return knn_brute(finalists, query_vec, k, id_col, vec_col)


def knn_lsh(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    nbits: int = 12,
    nprobe: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: probe the nprobe Hamming-nearest buckets.

    Candidate selection is a semi-join of vectors against the probed bucket
    codes (broadcast — nprobe ints), then exact scoring of candidates only.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, nbits, seed)
    qcode = _code_of(query_vec, planes)

    all_codes = np.arange(2**nbits, dtype=np.int64)
    ham = np.array([bin(int(qcode ^ c)).count("1") for c in all_codes])
    probes = all_codes[np.lexsort((all_codes, ham))][:nprobe].tolist()

    coded = hyperplane_codes(emb, planes, id_col, vec_col)
    probe_ids = coded.filter(F.col("code").isin(probes)).select(
        F.col("vec_id").alias("_probe_id")
    )
    cands = emb.join(probe_ids, emb[id_col] == F.col("_probe_id"), "left_semi")
    return knn_brute(cands, query_vec, k, id_col, vec_col)
