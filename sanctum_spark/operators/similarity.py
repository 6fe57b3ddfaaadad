"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk``   — brute-force exact top-k against one query vector.
  Scan-side dot products (JVM codegen via zip_with/aggregate), reduced
  with TakeOrdered: no shuffle of the corpus, no similarity matrix.
- ``RandomHyperplaneLSH`` — the scale path: sign-of-projection bucket
  keys; search touches only the query's bucket (multi-probe widens
  recall).  Planes are generated from a fixed seed so bucketing is
  deterministic and reproducible across runs/clusters.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL similarity (sorted last
    # by every top-k path) instead of an ANSI DIVIDE_BY_ZERO crash
    return F.try_divide(_dot(a, b), F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = _as_double(vec_col)
    sim = cosine_similarity(vec, q)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


class RandomHyperplaneLSH:
    """Sign-random-projection LSH for cosine similarity.

    ``n_planes`` hyperplanes → 2^n_planes buckets; expected collision
    probability for vectors at angle θ is (1 - θ/π)^n_planes.  Buckets are
    computed scan-side; a top-k search is a bucket lookup + local sort.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = random.Random(seed)
        self.dim = dim
        self.n_planes = n_planes
        # deterministic unit-free gaussian planes
        self.planes = [
            [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
        ]

    def _bucket_expr(self, vec: Column) -> Column:
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(self.planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(_dot(vec, p) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            bucket = bucket + F.shiftleft(bit, i)
        return bucket

    def bucketize(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Add a ``bucket`` column; at scale, write out partitioned/bucketed
        by this column so searches are partition-pruned scans."""
        return df.withColumn("bucket", self._bucket_expr(_as_double(vec_col)))

    def query_bucket(self, query_vec: list[float]) -> int:
        b = 0
        for i, plane in enumerate(self.planes):
            d = sum(float(x) * p for x, p in zip(query_vec, plane))
            if d >= 0:
                b += 1 << i
        return b

    def probe_buckets(self, query_vec: list[float], n_probes: int = 1) -> list[int]:
        """Multi-probe: the query's bucket plus single-bit flips of the
        planes with the smallest |projection| (most likely sign errors)."""
        base = self.query_bucket(query_vec)
        if n_probes <= 1:
            return [base]
        margins = []
        for i, plane in enumerate(self.planes):
            d = sum(float(x) * p for x, p in zip(query_vec, plane))
            margins.append((abs(d), i))
        margins.sort()
        out = [base]
        for _, i in margins[: n_probes - 1]:
            out.append(base ^ (1 << i))
        return out

    def topk(
        self,
        bucketized: DataFrame,
        query_vec: list[float],
        k: int = 10,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        n_probes: int = 4,
    ) -> DataFrame:
        """ANN top-k: restrict to probed buckets, exact cosine inside."""
        buckets = self.probe_buckets(query_vec, n_probes)
        cand = bucketized.filter(F.col("bucket").isin(buckets))
        return cosine_topk(cand, query_vec, k, vec_col, id_col)


def sized_lsh(
    n: int,
    dim: int,
    target_bucket: int = 1024,
    n_tables: int = 1,
    min_planes: int = 4,
    max_planes: int = 24,
    seed: int = 42,
) -> RandomHyperplaneLSH:
    """Size SRP-LSH to the corpus: n_planes ≈ log2(n / target_bucket), so
    the expected bucket population stays ≤ ~target_bucket as the corpus
    grows (a fixed plane count makes within-bucket pair joins quadratic
    again at 100×). Clamped to [min_planes, max_planes]; the total
    signature holds ``n_tables`` independent bands of that width.
    """
    need = math.ceil(math.log2(max(n, 1) / max(target_bucket, 1))) if n > target_bucket else 0
    per_band = min(max(min_planes, need), max_planes)
    return RandomHyperplaneLSH(dim=dim, n_planes=per_band * max(n_tables, 1), seed=seed)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lsh: RandomHyperplaneLSH | None = None,
    dim: int | None = None,
    n_tables: int = 1,
    target_bucket: int = 1024,
) -> DataFrame:
    """Vector-space near-duplicate pairs: (id_a, id_b, cos_sim) with
    cos_sim ≥ threshold and id_a < id_b.

    Scale shape: with no explicit ``lsh``, planes are DERIVED from the
    corpus count via ``sized_lsh`` (expected bucket ≤ ``target_bucket``),
    so the within-bucket pair join stays ~n·target_bucket/2 instead of
    n²/2^const. The pair-generation join carries only (band, id) — 16
    bytes/row — and vectors are joined back to the surviving candidate
    pairs only (linear), mirroring the MinHash-LSH candidate shape.

    ``n_tables`` > 1 bands the signature into independent tables (union of
    per-band candidates, distinct): the recall knob — a true near-dup pair
    survives if it agrees in ALL bits of ANY band, P = 1-(1-p^b)^L for
    per-bit collision p = 1-θ/π.

    The corpus ``df.count()`` here is a one-scalar parameter fetch; at
    production scale pass ``lsh`` pre-sized from table statistics instead.
    """
    if lsh is None:
        if dim is None:
            # infer dim from the first NON-NULL vector: first() on the raw
            # frame is row-order-nondeterministic, so a single NULL
            # embedding could intermittently land in head and crash
            # len(None) (r6 ADVICE item 3; q79 passes the raw table)
            head = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
            if head is None:
                # empty corpus: zero pairs by definition — and no vector
                # to infer the plane dimensionality from (an empty ingest
                # day must not crash the dedup pass).  Schema derives from
                # the caller's id column type, not a hardcoded bigint.
                from pyspark.sql import types as T

                id_type = df.schema[id_col].dataType
                return df.sparkSession.createDataFrame(
                    [],
                    T.StructType(
                        [
                            T.StructField("id_a", id_type),
                            T.StructField("id_b", id_type),
                            T.StructField("cos_sim", T.DoubleType()),
                        ]
                    ),
                )
            dim = len(head[0])
        lsh = sized_lsh(df.count(), dim, target_bucket, n_tables)
    bands = max(n_tables, 1)
    width = lsh.n_planes // bands
    if width < 1:
        raise ValueError(f"n_tables={n_tables} exceeds n_planes={lsh.n_planes}")

    # Slim candidate stage: explode the signature into per-band keys and
    # self-join on (band, key) with only ids as payload.
    mask = (1 << width) - 1
    sig = lsh.bucketize(df, vec_col).select(F.col(id_col).alias("id"), "bucket")
    band_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("t"),
                F.shiftright("bucket", i * width).bitwiseAND(F.lit(mask)).alias("k"),
            )
            for i in range(bands)
        ]
    )
    slim = sig.select("id", F.explode(band_keys).alias("band")).select(
        "id", F.col("band.t").alias("t"), F.col("band.k").alias("k")
    )
    a1, a2 = slim.alias("a"), slim.alias("b")
    cand = (
        a1.join(
            a2,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # Fixed-width candidate dedup (r14, guide §2.5 "input skew" /
        # §2.2): a plain .distinct() exchange is AQE-coalescible on its
        # INPUT bytes — candidate pairs are 16-byte rows, so at bench
        # scale the whole downstream dot-product verify collapsed onto
        # 1-8 tasks (the post-shuffle mirror of the single-row-group
        # scan problem).  repartition(defaultParallelism, keys) pins the
        # dedup exchange at session width — hash-compatible with the
        # dropDuplicates, so it is still ONE exchange — and at cluster
        # scale it equals the shuffle.partitions default the distinct
        # would have used anyway (candidate sets there are far past
        # coalescing size).  Paired A/B q79 (6 pairs, one JVM): median
        # ratio 0.57, output identical.
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .dropDuplicates()
    )

    # Exact-cosine verification on candidates only. The double vector +
    # its norm are precomputed once per ROW: cosine then costs one dot
    # product per pair, and the norm rides as a scalar column — dividing
    # inside a transform lambda would re-inline the norm subexpression per
    # element (Catalyst has no lambda CSE; see operators.dedup._let).
    dvec = _as_double(vec_col)
    vecs = df.select(
        F.col(id_col).alias("id"),
        dvec.alias("vec"),
        F.sqrt(_dot(dvec, dvec)).alias("nrm"),
    )
    va = vecs.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    vb = vecs.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    sim = F.try_divide(
        _dot(F.col("vec_a"), F.col("vec_b")), F.col("nrm_a") * F.col("nrm_b")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``list_id`` column: index of the nearest centroid by cosine.

    Centroids are a small driver-side parameter (k × dim floats) shipped
    in the UDF closure — assignment is an Arrow-vectorized projection
    (normalized matmul + argmax), no shuffle.  Ties break to the lowest
    list id (numpy argmax returns the first maximum).  A per-centroid
    Catalyst expression variant was measured: k zip_with/aggregate dots
    cost seconds of plan analysis/codegen per distinct plan at any data
    size (see ``_pq_assign_udf``), while the kernel's plan cost is O(1).
    Zero vectors assign to list 0 (cosine treated as 0 to every list).
    """
    from pyspark.sql.types import IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1), 1e-300)[:, None]

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0.0] = 1.0
        scores = (V / nrm[:, None]) @ Cn.T
        return pd.Series(scores.argmax(axis=1).astype("int32"))

    return df.withColumn("list_id", assign(F.col(vec_col)))


def ivf_train(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 2,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seed with the k lowest-id
    vectors, then ``n_iters`` Lloyd steps (Arrow-kernel assignment, new
    means from per-batch (list, pos) partial sums + one tiny merge
    aggregate). Only k × dim scalars ever reach the driver — a parameter
    fetch, not a data collect.

    At 100 TB: train on a sampled fraction, then ``ivf_assign`` + write
    partitioned by ``list_id`` so searches are partition-pruned scans
    (the IVF analog of the LSH bucket layout).
    """
    seeds = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in seeds]
    for _ in range(n_iters):
        C = np.asarray(centroids, dtype=np.float64)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1), 1e-300)[:, None]

        def partials(batches, _cn=Cn):
            # per-batch (list_id, pos, sum, count) partials — the same
            # bytes-per-batch merge shape as pq_train.
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, 0]]
                )
                nrm = np.linalg.norm(V, axis=1)
                nrm[nrm == 0.0] = 1.0
                a = ((V / nrm[:, None]) @ _cn.T).argmax(axis=1)
                out = {"c": [], "pos": [], "s": [], "n": []}
                for c in range(_cn.shape[0]):
                    mask = a == c
                    cnt = int(mask.sum())
                    if not cnt:
                        continue
                    sums = V[mask].sum(axis=0)
                    for p, sv in enumerate(sums):
                        out["c"].append(c)
                        out["pos"].append(p)
                        out["s"].append(float(sv))
                        out["n"].append(cnt)
                yield pd.DataFrame(out)

        rows = (
            df.select(F.col(vec_col))
            .mapInPandas(partials, "c int, pos int, s double, n long")
            .groupBy("c", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in rows:
            by_list.setdefault(r["c"], {})[r["pos"]] = r["s"] / r["n"]
        centroids = [
            [by_list[i][p] for p in sorted(by_list[i])] if i in by_list else c
            for i, c in enumerate(centroids)
        ]
    return centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN search: rank centroids against the query driver-side, scan
    only the ``n_probes`` nearest inverted lists, exact cosine inside."""
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0

    def cos_to(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(query_vec, c)) / (qn * cn)

    ranked = sorted(range(len(centroids)), key=lambda i: (-cos_to(centroids[i]), i))
    probes = ranked[:n_probes]
    cand = assigned.filter(F.col("list_id").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def _sq_l2(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def _codes_np(V, books):
    """numpy nearest-centroid codes: V (n, dim) float64, books (m, ksub,
    dsub) → (n, m) int32.  argmin over |c|^2 - 2·X@C.T (the row-constant
    |sv|^2 drops out of the argmin); ties resolve to the lowest code, the
    same tie-break as a (distance, code) struct-min."""
    m, ksub, dsub = books.shape
    codes = np.empty((V.shape[0], m), dtype=np.int32)
    for j in range(m):
        X = V[:, j * dsub : (j + 1) * dsub]
        scores = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (X @ books[j].T)
        codes[:, j] = scores.argmin(axis=1)
    return codes


def _pq_assign_udf(codebooks: list[list[list[float]]]):
    """Arrow-vectorized PQ assignment: array<vec> → array<int> codes.

    Why a Pandas UDF and not Catalyst expressions: the assignment is a
    dense (n × m×ksub×dsub) numeric kernel.  Both formulations tried as
    JVM expressions — per-centroid zip_with/aggregate lambdas, then a flat
    |c|²−2·sv·c multiply-add tree — spend 5-13 s per DISTINCT PLAN in
    analysis + Janino codegen (measured at sf0.01, where the data itself
    scans in milliseconds), because the tree has ~2k nodes replicated per
    subspace.  The Arrow kernel is two BLAS-shaped numpy ops per subspace,
    has O(1) plan cost, and is the FAISS-style production shape for PQ
    encode.  Scoring/ADC stays JVM-side (small LUT expressions).
    """
    from pyspark.sql.types import ArrayType, IntegerType

    books = np.asarray(codebooks, dtype=np.float64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = _codes_np(V, books)
        return pd.Series(list(codes))

    return assign


def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 2,
    fallback: DataFrame | None = None,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: split the vector into
    ``m`` subspaces and Lloyd-train ``ksub`` centroids per subspace.

    Returns ``codebooks[j][c]`` = centroid ``c`` of subspace ``j`` (m × ksub
    × dsub floats — a driver-side parameter, not a data collect). Seeding is
    deterministic farthest-point over a hash-ordered sample, so training is
    reproducible across runs/clusters. All ``m`` subspaces train in ONE job
    per Lloyd iteration: an Arrow ``mapInPandas`` pass emits per-batch
    (subspace, code, pos) partial sums/counts (m·ksub·dsub rows per batch —
    bytes, independent of batch size) and one tiny aggregate merges them;
    the numpy assignment kernel is shared with ``pq_encode`` (see
    ``_pq_assign_udf`` for why this beats Catalyst expressions here).

    At 100 TB: train on a sampled fraction (like ``ivf_train``), then
    ``pq_encode`` the full corpus — codes are m bytes/vector, a 32× memory
    compression for 64-dim float32, which is what makes a corpus-wide ANN
    index driver- and executor-resident at scale.
    """
    # NULL vectors carry no training signal and crash both dim inference
    # (len(None)) and the seeding sample below — drop them once up front
    # (r6 ADVICE item 3)
    df = df.filter(F.col(vec_col).isNotNull())

    # Deterministic farthest-point seeding per subspace on a hash-ordered
    # driver-side sample (a parameter-fit sample, not a data collect; at
    # 100 TB the sample size stays 32*ksub regardless of corpus size).
    # Lowest-id seeding collapsed recall when early ids were correlated —
    # neighboring codebook entries started near-identical and Lloyd could
    # not pull them apart.
    def _seed_sample(d: DataFrame) -> list[list[float]]:
        return [
            [float(x) for x in r[0]]
            for r in d.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(max(32 * ksub, 256))
            .collect()
        ]

    # The sample doubles as the emptiness and dim probe (r13 verdict task
    # #6): the former separate first() job told us nothing the sample's
    # own first row doesn't, and callers' train.isEmpty() pre-probe is
    # subsumed by ``fallback`` — an empty seed sample IS train.isEmpty(),
    # so the fallback corpus kicks in on exactly the same condition, two
    # driver jobs cheaper per call.
    sample = _seed_sample(df)
    if not sample and fallback is not None:
        df = fallback.filter(F.col(vec_col).isNotNull())
        sample = _seed_sample(df)
    if not sample:
        raise ValueError(
            "pq_train: empty training corpus — train on a non-empty sample"
        )
    dim = len(sample[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # Farthest-point selection is vectorized: keep each point's squared
    # distance to its nearest chosen seed and fold in one (S, dsub)
    # numpy pass per new seed — O(ksub·S·dsub) instead of the
    # O(ksub²·S·dsub) pure-Python scan, which was a multi-second
    # DRIVER-side fixed cost (r8 bench: q119 spent ~5 s here at every
    # scale factor).  np.argmax returns the FIRST maximizer, matching
    # the scalar max()'s tie-breaking, and the running minimum equals
    # min-over-seeds exactly.  Determinism caveat: numpy's .sum(axis=1)
    # uses pairwise summation while a Python sum() accumulates
    # sequentially, so for dsub > 8 the squared distances can differ in
    # the last ulp and flip argmax on a near-tie — the selection is
    # deterministic and matches the scalar scan up to float-summation-
    # order ties, not bit-for-bit against the old seed sequence.
    S_all = np.asarray(sample, dtype=np.float64)
    books = []
    for j in range(m):
        P = S_all[:, j * dsub : (j + 1) * dsub]
        idx = [0]
        d2 = ((P - P[0]) ** 2).sum(axis=1)
        while len(idx) < ksub:
            i = int(np.argmax(d2))
            idx.append(i)
            d2 = np.minimum(d2, ((P - P[i]) ** 2).sum(axis=1))
        books.append([[float(x) for x in P[i]] for i in idx])
    for _ in range(n_iters):
        books_np = np.asarray(books, dtype=np.float64)

        def partials(batches, _b=books_np):
            mm, kk, dd = _b.shape
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, 0]]
                )
                codes = _codes_np(V, _b)
                out = {"j": [], "c": [], "pos": [], "s": [], "n": []}
                for j in range(mm):
                    X = V[:, j * dd : (j + 1) * dd]
                    for c in range(kk):
                        mask = codes[:, j] == c
                        cnt = int(mask.sum())
                        if not cnt:
                            continue
                        sums = X[mask].sum(axis=0)
                        for p in range(dd):
                            out["j"].append(j)
                            out["c"].append(c)
                            out["pos"].append(p)
                            out["s"].append(float(sums[p]))
                            out["n"].append(cnt)
                yield pd.DataFrame(out)

        rows = (
            df.select(F.col(vec_col))
            .mapInPandas(partials, "j int, c int, pos int, s double, n long")
            .groupBy("j", "c", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            means.setdefault((r["j"], r["c"]), {})[r["pos"]] = r["s"] / r["n"]
        books = [
            [
                [means[(j, c)][p] for p in sorted(means[(j, c)])]
                if (j, c) in means
                else books[j][c]
                for c in range(ksub)
            ]
            for j in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Add an ``array<int>`` column of length m: per-subspace nearest
    centroid by squared L2.  Arrow-vectorized scan-side projection — no
    shuffle; at scale this runs right after the parquet scan and the codes
    are what gets stored (m bytes/vector).  See ``_pq_assign_udf`` for the
    measured JVM-expression-vs-Arrow tradeoff."""
    assign = _pq_assign_udf(codebooks)
    return df.withColumn(code_col, assign(F.col(vec_col)))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    rerank: int = 0,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays exact; each corpus
    vector is its m-byte PQ code. The driver precomputes the m × ksub
    lookup table of partial squared distances; scoring a code is then m
    array lookups + a sum — no vector arithmetic touches the corpus scan,
    and the result reduces via TakeOrdered (no shuffle of the corpus).

    Returns (id, adc_dist) ascending — approximate nearest neighbors.

    With ``rerank=N`` (the production IVFADC shape), the ADC pass produces
    an N-id shortlist (N ≥ k, typically 10k); exact squared L2 is then
    computed ONLY for those N rows and the final top-k is exact-ranked.
    The shortlist is k·mult driver-side ids (bytes, not data), the re-rank
    scan is pruned by an `isin` pushdown, and recall approaches exact
    brute force while the corpus-wide pass still never touches vector
    arithmetic. Column stays ``adc_dist`` (it now carries the exact
    distance for the survivors).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query_vec) != m * dsub:
        raise ValueError(f"query dim {len(query_vec)} != {m * dsub}")
    lut = [
        [
            sum(
                (float(query_vec[j * dsub + p]) - c[p]) ** 2
                for p in range(dsub)
            )
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    dist = sum(
        (
            F.element_at(
                F.array(*[F.lit(d) for d in lut[j]]),
                F.col(code_col)[j] + 1,
            )
            for j in range(m)
        ),
        start=F.lit(0.0),
    )
    adc = (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(max(k, rerank))
    )
    if rerank <= 0:
        return adc.limit(k)
    shortlist = [r[0] for r in adc.select(id_col).collect()]
    vec = _as_double(vec_col)
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    exact = _sq_l2(vec, qarr)
    return (
        encoded.filter(F.col(id_col).isin(shortlist))
        .select(F.col(id_col), exact.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def cosine_self_join_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lsh: RandomHyperplaneLSH | None = None,
    max_exact_rows: int = 10_000,
) -> DataFrame:
    """Per-vector k nearest neighbors within one table.

    With ``lsh`` given, pairs are generated per bucket (the 100 TB path);
    otherwise a full cross pair join — TEST SCALE ONLY, so the exact path
    is gated on ``max_exact_rows``: above that the call raises instead of
    silently planning an O(n^2) cross join (pass a sized LSH — see
    ``sized_lsh`` — or raise the gate explicitly if you really mean it).
    """
    from pyspark.sql.window import Window as W

    if lsh is None:
        n = df.count()
        if n > max_exact_rows:
            raise ValueError(
                f"cosine_self_join_topk without lsh is an O(n^2) cross "
                f"join; input has {n} rows > max_exact_rows="
                f"{max_exact_rows}. Pass lsh=sized_lsh(dim, n) for the "
                "bucketed path, or raise max_exact_rows deliberately."
            )
    if lsh is not None:
        b = lsh.bucketize(df, vec_col).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "bucket"
        )
        a1, a2 = b.alias("a"), b.alias("b")
        pairs = a1.join(
            a2,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id")),
        )
    else:
        b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        a1, a2 = b.alias("a"), b.alias("b")
        pairs = a1.crossJoin(a2).filter(F.col("a.id") != F.col("b.id"))
    sim = cosine_similarity(_as_double(F.col("a.vec")), _as_double(F.col("b.vec")))
    w = W.partitionBy("id").orderBy(F.col("cos_sim").desc(), F.col("neighbor"))
    return (
        pairs.select(
            F.col("a.id").alias("id"), F.col("b.id").alias("neighbor"), sim.alias("cos_sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
