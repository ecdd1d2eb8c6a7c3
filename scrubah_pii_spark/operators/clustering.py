"""Document clustering: connected components over similarity pairs +
representative selection.

Reference semantics: semanticDedup.effect.ts:278-417 (Union-Find over pairs
>= 0.85) and :422-497 (representative score = 0.3*lenNorm + 0.2*recency +
0.3*quality + 0.2*min(medDensity/20, 1), argmax per cluster).

Spark-first how: Union-Find is sequential; the distributed equivalent is
alternating large-star/small-star iterations (Kiveris et al., "Connected
Components in MapReduce and Beyond") expressed as DataFrame joins — converges
in O(log n) rounds; each round is one shuffle on the node key. Representative
selection is a window argmax per cluster_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(node, cluster_id) with cluster_id = min node id in the component.
    Input: undirected edge list. Star-contraction via min-neighbor
    propagation until fixpoint."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for round_i in range(max_iter):
        # (1) propagate the min component label across edges
        nbr = (
            edges.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # (2) pointer jumping: comp(node) <- comp(comp(node)) — path
        # compression makes convergence O(log diameter) instead of O(diameter)
        parent = labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("grand")
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .join(parent, "comp", "left")
            .withColumn(
                "new_comp",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("nbr_comp"), F.col("comp")),
                    F.coalesce(F.col("grand"), F.col("comp")),
                ),
            )
            .select("node", F.col("new_comp").alias("comp"))
        )
        # truncate lineage every 2nd round (checkpoint itself costs a job;
        # 2 rounds of joins keep the plan small enough for Catalyst)
        if round_i % 2 == 1 or round_i == max_iter - 1:
            labels_new = new_labels.localCheckpoint(eager=True)
        else:
            labels_new = new_labels
        # convergence check every other round: the check itself costs a join
        # + action, and pointer-jumping rarely converges in round 1
        if round_i % 2 == 1 or round_i == max_iter - 1:
            changed = (
                labels_new.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels = labels_new
            if changed == 0:
                break
        else:
            labels = labels_new
    return labels.select(F.col("node"), F.col("comp").alias("cluster_id"))


def representative_score(
    length_col, ts_col, quality_col, med_density_col, max_len: float = 10000.0,
    current_year: int = 2026,
):
    """semanticDedup.ts:149-155 weights: 0.3 length + 0.2 recency +
    0.3 quality + 0.2 min(medDensity/20, 1)."""
    len_norm = F.least(F.lit(1.0), length_col.cast("double") / max_len)
    years_old = F.greatest(
        F.lit(0), F.lit(current_year) - F.year(ts_col.cast("timestamp"))
    )
    recency = F.greatest(F.lit(0.0), 1.0 - years_old.cast("double") / 10.0)
    med = F.least(F.lit(1.0), med_density_col.cast("double") / 20.0)
    return 0.3 * len_norm + 0.2 * recency + 0.3 * quality_col.cast("double") + 0.2 * med


def select_representatives(
    docs: DataFrame, clusters: DataFrame, id_col: str, score_col: str = "rep_score"
) -> DataFrame:
    """Join docs to cluster ids; argmax score per cluster via row_number."""
    joined = docs.join(
        clusters.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )  # singletons form their own cluster
    w = Window.partitionBy("cluster_id").orderBy(F.desc(score_col), F.asc(id_col))
    return joined.withColumn("is_representative", F.row_number().over(w) == 1)


def cluster_stats(clustered: DataFrame) -> DataFrame:
    """Dedup stats (semanticDedup.effect.ts:534-565): clusters, sizes,
    reduction ratio."""
    sizes = clustered.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("n_clusters"),
        F.sum("size").alias("n_docs"),
        F.sum((F.col("size") > 1).cast("int")).alias("multi_doc_clusters"),
        (1.0 - F.count("*") / F.sum("size")).alias("reduction_ratio"),
    )
