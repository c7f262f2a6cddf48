"""Per-document certainty = mean recorded similarity to co-cluster members
(SURVEY.md §2.5 A2; reference semantics cluster_in_mem.py:375-393):

  * singleton cluster            -> 1.0
  * multi-member, no recorded sim -> 0.5  (unreachable with uncapped edges,
                                           kept for parity)
  * otherwise                    -> avg of incident verified-edge sims
    (every verified edge is intra-cluster by CC construction, so "same
    cluster" needs no extra filter)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_certainty(assignments: DataFrame, edges: DataFrame) -> DataFrame:
    """assignments(doc_id, cluster_id) + edges(src, dst, sim)
    -> (doc_id, cluster_id, certainty)"""
    incident = edges.select(F.col("src").alias("doc_id"), "sim").unionAll(
        edges.select(F.col("dst").alias("doc_id"), "sim")
    )
    avg_sim = incident.groupBy("doc_id").agg(F.avg("sim").alias("_avg_sim"))
    sizes = assignments.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_csize"))
    return (
        assignments.join(avg_sim, "doc_id", "left")
        .join(sizes, "cluster_id")
        .withColumn(
            "certainty",
            F.coalesce(
                "_avg_sim",
                F.when(F.col("_csize") > 1, F.lit(0.5)).otherwise(F.lit(1.0)),
            ),
        )
        .select("doc_id", "cluster_id", "certainty")
    )
