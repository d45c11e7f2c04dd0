"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring how ANN is actually deployed on Spark:

- ``brute_force_knn``: exact cosine top-k. The query side is small and
  broadcast; the corpus side streams — one scan, no shuffle of the
  corpus, a single top-k window per query. This is the correctness
  baseline and is genuinely the right plan when |queries| is small.
- ``lsh_knn``: random-hyperplane (SRP) LSH — bucket corpus and queries
  by sign-bit sketches, compare only within buckets. Sub-linear
  candidate generation; recall tunable by tables×bits. This is the
  100 TB path: the corpus shuffle is keyed by uniformly-random sketch
  bits (skew-free) and each bucket join is tiny.

Dot products use ``F.zip_with`` + ``F.aggregate`` in double precision —
JVM expressions, no Python. For very wide vectors a Pandas-UDF BLAS
path would win; at 64-dim the expression path is faster than Arrow
round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (qid, nid, rank, cosine), rank 1..k, ties broken by
    neighbor id for determinism. The queries side is broadcast — the
    corpus is scanned once with no shuffle; the only shuffle is the
    per-query top-k (tiny: |queries|×|corpus| rows reduced by the
    window, and AQE handles the rest)."""
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn("cosine", cosine(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def _srp_sketch(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection sketch: one bit per hyperplane, packed to
    a long. Planes are literal arrays (broadcast with the plan)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for plane in planes
    ]
    packed = F.lit(0).cast("long")
    for i, bit in enumerate(bits):
        packed = packed.bitwiseOR(F.shiftleft(bit, i))
    return packed


def _random_planes(dim: int, bits: int, seed: int) -> list[list[float]]:
    # Deterministic pseudo-random hyperplanes without numpy RNG state:
    # xorshift-ish LCG, fixed seed → reproducible plans.
    planes = []
    state = seed or 1
    for _ in range(bits):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            plane.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(plane)
    return planes


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table SRP-LSH.

    Each table hashes vectors to a ``bits``-bit bucket; candidates are
    corpus vectors sharing a bucket with the query in ANY table
    (union via explode + distinct). Exact cosine re-ranks candidates.
    Returns (qid, nid, rank, cosine) — same contract as brute force so
    callers can swap tiers."""
    all_planes = [_random_planes(dim, bits, seed + t) for t in range(tables)]

    def bucketed(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        sketches = F.array(
            *[_srp_sketch(F.col(vec_col), planes) for planes in all_planes]
        )
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vec_col).alias(f"__vec_{out_id}"),
            F.posexplode(sketches).alias(f"table_{out_id}", f"bucket_{out_id}"),
        )

    c = bucketed(corpus, id_col, "nid")
    q = bucketed(queries, id_col, "qid")
    cands = (
        c.join(
            F.broadcast(q),
            (F.col("table_nid") == F.col("table_qid"))
            & (F.col("bucket_nid") == F.col("bucket_qid"))
            & (F.col("qid") != F.col("nid")),
        )
        .select("qid", "nid", "__vec_qid", "__vec_nid")
        .distinct()
        .withColumn("cosine", cosine(F.col("__vec_qid"), F.col("__vec_nid")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def cosine_all_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs cosine (id_a < id_b, cosine). Quadratic — intended for
    LSH-candidate verification or small blocked inputs; the near-dup
    entry point at scale is embedding_near_dup_pairs over LSH buckets."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
        .select("id_a", "id_b", "cosine")
    )
