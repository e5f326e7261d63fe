"""Iterative graph operators on DataFrames — connected components for
near-duplicate clustering.

Pairwise dedup (minhash/simhash/Jaccard) yields EDGES; what a corpus
run needs is CLUSTERS (A~B and B~C must collapse to one survivor even
when A~C was never emitted as a pair). That closure is transitive
connectivity — not expressible in one SQL query, so this is the
repo's genuinely iterative operator, built the Spark way:

- label propagation to the minimum reachable id, one join + one
  groupBy per round — label state stays a DataFrame, nothing
  driver-sized;
- rounds ≤ graph diameter (near-dup graphs are shallow: big
  components are dense clusters, so typical diameter ≲ 5);
- every round ends in an eager ``localCheckpoint`` — MANDATORY for
  iterative DataFrames: each round references the previous labels
  twice, so without lineage truncation the logical plan doubles per
  round and the driver OOMs building it (persist caches data but NOT
  the plan). On a cluster, swap in reliable ``checkpoint()`` (HDFS/
  object-store) so state survives executor loss.

GraphX/GraphFrames ship the same algorithm; doing it with stock joins
keeps the dependency surface at zero and the plan visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "cluster_representatives"]


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, comp) for every node in ``edges``, where ``comp`` is the
    minimum id reachable from the node. Converges when no label
    changes; raises if ``max_iter`` rounds weren't enough (diameter
    larger than expected — raise the cap, don't trust partial labels).
    """
    sym = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        cur = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                F.col("comp").alias("old_comp"),
            )
        ).localCheckpoint(eager=True)  # truncate lineage — see module doc
        changed = cur.filter("comp != old_comp").count()
        labels = cur.drop("old_comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def cluster_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iter: int = 20
) -> DataFrame:
    """Collapse near-dup PAIRS into transitive clusters and keep one
    survivor (the min id) per cluster: rows of ``df`` that are either
    untouched by any pair or are their cluster's representative.

    This is the correct closure of pairwise dedup — a greedy pair
    filter can keep both A and C of an A~B~C chain; clustering can't.
    """
    comps = connected_components(pairs, max_iter=max_iter)
    losers = comps.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
