"""Approximate-nearest-neighbor search over an embedding column — the
similarity-search component of a training-data pipeline (task brief:
"brute-force cosine top-k as the baseline; an IVF or LSH-bucketed variant
as the scale path").

Design (scale path):

  * ``build_index`` assigns every vector a sign-LSH bucket — bit i is the
    sign of one fixed coordinate (axis-aligned hyperplanes; deterministic
    and bit-exact across engines, so driver oracles can replicate it).
    The "index" is just a DataFrame (vec_id, bucket, embedding): at
    10^12 rows this is a bucketed/partitioned table, and a query touches
    only its probed buckets — partition pruning does the work of an
    in-memory index.
  * ``search`` serves a BATCH of query vectors at once: queries get the
    same bucket function, are exploded to their probe set (Hamming<=
    ``probes`` bucket neighbors — multi-probe reduces the recall loss of
    hard bucket boundaries), joined to the index on bucket (an equi-join
    shuffle, not a cross join), scored with an unrolled JVM dot product,
    and top-k'd per query with a window.
  * ``brute_force_topk`` is the exact baseline used by tests to measure
    recall@k.

No reference equivalent (the reference searches text only); this module
exists per the task brief's training-data-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_dims(n_bits: int, dim_stride: int, dim: int | None) -> None:
    """The highest probed coordinate must exist: out-of-range array
    indexing yields NULL in Spark, NULL > 0 is false, so the affected bits
    would silently read 0 for EVERY vector — buckets degenerate and the
    LSH path quietly loses selectivity instead of failing."""
    if dim is not None and (n_bits - 1) * dim_stride >= dim:
        raise ValueError(
            f"(n_bits-1)*dim_stride = {(n_bits - 1) * dim_stride} must be < "
            f"dim ({dim}): bucket bit {n_bits - 1} would index past the "
            "embedding and silently read as 0"
        )


def bucket_col(emb_col: str, n_bits: int, dim_stride: int) -> F.Column:
    """Sign-LSH bucket from ``n_bits`` fixed coordinates (0-based index
    i*dim_stride), MSB-first."""
    one, zero, two = (F.lit(v).cast("long") for v in (1, 0, 2))
    bucket = None
    for i in range(n_bits):
        # accumulate in LONG from the first bit: int32 accumulation
        # overflows (ANSI: throws) once n_bits crosses 31
        bit = F.when(F.expr(f"{emb_col}[{i * dim_stride}]") > 0, one).otherwise(zero)
        bucket = bit if bucket is None else bucket * two + bit
    return bucket.cast("long")


def cosine_col(a: str, b: str, dim: int) -> F.Column:
    """Unrolled cosine similarity (codegen-friendly constant indexing —
    higher-order aggregate() runs interpreted per row)."""
    dot = None
    na = None
    nb = None
    for i in range(dim):
        xa = F.expr(f"cast({a}[{i}] as double)")
        xb = F.expr(f"cast({b}[{i}] as double)")
        dot = xa * xb if dot is None else dot + xa * xb
        na = xa * xa if na is None else na + xa * xa
        nb = xb * xb if nb is None else nb + xb * xb
    return dot / (F.sqrt(na) * F.sqrt(nb))


def build_index(
    embeddings: DataFrame,
    n_bits: int = 8,
    dim_stride: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, embedding, ...) -> (vec_id, bucket, embedding).

    Pass ``dim`` to validate that every bucket bit indexes a real
    coordinate (strongly recommended — see ``_check_dims``).

    At scale, write this out partitioned/bucketed BY ``bucket`` so probe
    joins prune partitions; here it stays a DataFrame."""
    _check_dims(n_bits, dim_stride, dim)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        bucket_col(emb_col, n_bits, dim_stride).alias("bucket"),
        F.col(emb_col).alias("embedding"),
    )


_PROBE_LITERAL_MAX = 256  # masks inlined as plan columns below this
_PROBE_MASK_MAX = 1_000_000  # hard cap on the probe-mask set


def _probe_masks(n_bits: int, probes: int) -> list[int]:
    """All XOR masks of Hamming weight <= ``probes`` over ``n_bits`` bits
    (sum_{d<=probes} C(n_bits, d) masks, including the zero mask)."""
    from itertools import combinations

    masks = [0]
    for d in range(1, min(probes, n_bits) + 1):
        for flips in combinations(range(n_bits), d):
            mask = 0
            for j in flips:
                mask |= 1 << j
            masks.append(mask)
    return masks


def _explode_probes(q: DataFrame, n_bits: int, probes: int) -> DataFrame:
    """(query_id, qv, qbucket) -> one row per probed bucket.

    Two physical strategies for the same semantics (VERDICT r03: the
    literal-column form is a plan-size hazard — C(32,3) ≈ 5.5k expression
    nodes stall codegen/analysis):

      * <= _PROBE_LITERAL_MAX masks: inline XOR literals + explode — zero
        extra joins, whole-stage codegen;
      * larger: broadcast-join a one-column masks DataFrame and XOR as
        data — mask count is a DATA size, not a plan size, so n_bits=32 /
        probes=3 (5,489 masks) runs fine;
      * beyond _PROBE_MASK_MAX masks: raise — at that point the probe set
        stops being "approximate" and the caller wants brute force.
    """
    masks = _probe_masks(n_bits, probes)
    if len(masks) > _PROBE_MASK_MAX:
        raise ValueError(
            f"probe set has {len(masks)} buckets (n_bits={n_bits}, "
            f"probes={probes}) > {_PROBE_MASK_MAX}: this is no longer an "
            "approximate search — lower probes/n_bits or use brute_force_topk"
        )
    if len(masks) <= _PROBE_LITERAL_MAX:
        arr = F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks])
        return q.select("query_id", "qv", F.explode(arr).alias("bucket"))
    spark = q.sparkSession
    masks_df = spark.createDataFrame([(m,) for m in masks], "mask long")
    return q.crossJoin(F.broadcast(masks_df)).select(
        "query_id",
        "qv",
        F.col("qbucket").bitwiseXOR(F.col("mask")).alias("bucket"),
    )


def search(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    dim_stride: int = 8,
    probes: int = 1,
    dim: int = 64,
    id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Batch ANN: -> (query_id, vec_id, cos, rank) with rank 1..k per
    query.  cos is rounded to 4 decimals BEFORE ranking so near-equal
    scores tie deterministically (vec_id break) — robust to float
    summation-order ulps across engines (oracle comparability).

    Recall/cost tradeoff: each extra probe level multiplies the candidate
    set (probe buckets: 1, 1+n_bits, 1+n_bits+C(n_bits,2), ...) and
    monotonically raises recall vs ``brute_force_topk``.  Measured
    recall@10 on the sf0.1 embeddings (2000 vecs, n_bits=4, dim_stride=16):
    see BENCH/BASELINE.md §ANN and tests/test_ann.py
    ``test_multiprobe_recall_curve`` (probes 0 -> 1 -> 2 must be
    monotone; full-probe == brute force exactly)."""
    _check_dims(n_bits, dim_stride, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("qv"),
        bucket_col(emb_col, n_bits, dim_stride).alias("qbucket"),
    )
    probed = _explode_probes(q, n_bits, probes)
    scored = (
        probed.join(index, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col("embedding", "qv", dim), 4).alias("cos"),
        )
        # multi-probe can reach the same vec via two buckets? no — probe
        # buckets are distinct ids and each vector lives in exactly one
        # bucket, so (query_id, vec_id) appears at most once
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "query_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (cross join) — the correctness
    baseline the LSH path is measured against."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("qv"))
    e = embeddings.select("vec_id", F.col(emb_col).alias("embedding"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col("embedding", "qv", dim), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
