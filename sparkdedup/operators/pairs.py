"""Candidate-pair generation with explicit skew handling (SURVEY.md §2.4
L2-L4, §4 skew row; north_rule: "partitioning / shuffle / skew handled
explicitly").

Semantics: all (src < dst) document pairs sharing >= 1 LSH band — the
uncapped equivalent of the reference's LSH query loops
(cluster_in_mem.py:170-234, cluster_streaming.py:123-159); ``src < dst`` +
``distinct()`` replace its ``processed_pairs`` set and ordering guards.

Scale shape: a plain band self-join degrades quadratically on hot bands
(common boilerplate at web scale — the reference has no defense beyond its
recall-losing candidate caps).  We split by measured band size:

  * cold bands (size <= salt_threshold): direct self-equi-join; AQE skew
    join can still split stragglers.
  * hot bands: balanced triangle replication — each member lands in a salt
    cell c = xxhash64(doc_id) mod S with S = ceil(size / salt_threshold),
    is replicated to every cell-pair (min(c,d), max(c,d)), and a pair is
    emitted only in the unique bucket (min(c_x,c_y), max(c_x,c_y)).  Every
    join bucket holds <= ~2*salt_threshold rows regardless of band size;
    pair coverage is exact (no recall loss), cost is an S-fold replication
    of hot-band rows only.
  * optional drop_threshold: bands larger still are dropped outright and
    counted (the only recall-losing knob; OFF by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs_from_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    l = left.select(*on, F.col("doc_id").alias("src"))
    r = right.select(*on, F.col("doc_id").alias("dst"))
    # shuffle-hash beats sort-merge here: band rows are narrow (two longs),
    # group sizes are bounded (hot bands were split off), and the output
    # explodes quadratically per group so the sort would dominate
    return l.join(r.hint("shuffle_hash"), on).where(F.col("src") < F.col("dst"))


def dropped_band_stats(bands: DataFrame, drop_threshold: int) -> dict:
    """Audit row for the recall-losing drop knob: how many band buckets /
    band rows the cap removes (logged to lineage metrics — 'no silent
    caps')."""
    row = (
        bands.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("band_size"))
        .where(F.col("band_size") > drop_threshold)
        .agg(
            F.count(F.lit(1)).alias("dropped_buckets"),
            F.coalesce(F.sum("band_size"), F.lit(0)).alias("dropped_rows"),
            F.coalesce(F.max("band_size"), F.lit(0)).alias("max_bucket"),
        )
        .collect()[0]
    )
    return {
        "dropped_buckets": int(row["dropped_buckets"]),
        "dropped_rows": int(row["dropped_rows"]),
        "max_bucket": int(row["max_bucket"]),
        "drop_threshold": drop_threshold,
    }


def candidate_pairs(
    bands: DataFrame,
    salt_threshold: int | None = 2000,
    drop_threshold: int | None = None,
) -> DataFrame:
    """(band_key, doc_id) -> distinct (src long, dst long), src < dst.

    drop_threshold: buckets larger than this are removed entirely.  At
    r=3, a bucket of thousands of docs is driven by globally-common
    shingles dominating the minhash minima (boilerplate effect), not by
    pairwise similarity — genuinely similar pairs inside such a bucket
    share other, small bands with overwhelming probability, so the recall
    loss is negligible while the pair volume drops by orders of magnitude.
    (The reference's max_candidates=500/150 caps are its blunter version
    of the same defense — cluster_in_mem.py:165.)"""
    if salt_threshold is None and drop_threshold is None:
        return _pairs_from_join(bands, bands, ["band_key"]).select("src", "dst").distinct()

    sizes = bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("band_size"))
    limit = salt_threshold if salt_threshold is not None else drop_threshold
    # hot-band table is tiny (few keys exceed the threshold) -> broadcast
    hot_keys = sizes.where(F.col("band_size") > F.lit(limit))
    # adaptive: when no band is hot (the common case after an exact-dup
    # pre-pass), skip the salting plan entirely — saves a broadcast join,
    # a union and two shuffles.  The count is one cheap partial-agg job.
    if hot_keys.limit(1).count() == 0:
        return _pairs_from_join(bands, bands, ["band_key"]).select("src", "dst").distinct()
    b = bands.join(F.broadcast(hot_keys), "band_key", "left")

    cold = b.where(F.col("band_size").isNull())
    cold_pairs = _pairs_from_join(cold, cold, ["band_key"])

    hot = b.where(F.col("band_size").isNotNull())
    if drop_threshold is not None:
        hot = hot.where(F.col("band_size") <= F.lit(drop_threshold))
    if salt_threshold is None:
        # drop-only mode: remaining "hot" rows (none) contribute nothing
        return cold_pairs.select("src", "dst").distinct()

    s_cells = F.ceil(F.col("band_size") / F.lit(salt_threshold)).cast("int")
    hot = hot.withColumn("n_cells", s_cells).withColumn(
        "cell", F.pmod(F.xxhash64("doc_id"), F.col("n_cells")).cast("int")
    )
    # replicate each member to every cell-pair bucket it can meet a partner in
    repl = hot.select(
        "band_key",
        "doc_id",
        "cell",
        F.explode(F.sequence(F.lit(0), F.col("n_cells") - 1)).alias("other"),
    ).select(
        "band_key",
        "doc_id",
        "cell",
        F.least("cell", "other").alias("ci"),
        F.greatest("cell", "other").alias("cj"),
    ).distinct()
    j = (
        repl.select("band_key", "ci", "cj", F.col("doc_id").alias("src"), F.col("cell").alias("src_cell"))
        .join(
            repl.select("band_key", "ci", "cj", F.col("doc_id").alias("dst"), F.col("cell").alias("dst_cell")),
            ["band_key", "ci", "cj"],
        )
        .where(F.col("src") < F.col("dst"))
        # emit each pair only in its unique home bucket
        .where(
            (F.col("ci") == F.least("src_cell", "dst_cell"))
            & (F.col("cj") == F.greatest("src_cell", "dst_cell"))
        )
    )
    return cold_pairs.select("src", "dst").unionByName(
        j.select("src", "dst")
    ).distinct()
