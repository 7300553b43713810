"""Clustering / embedding quality evaluation operators: simplified
silhouette, leave-one-out 1-NN label agreement, and DBSCAN density
clustering over a precomputed neighbor-pair graph.

These are the evaluation companions to the similarity/clustering family
(`operators/similarity.py`): a training-data pipeline that clusters or
labels embeddings needs a distributed way to ASSESS those labels —
silhouette for cluster cohesion, 1-NN agreement for label noise, DBSCAN
for density structure (noise-point triage). The reference
(darefamuy/cdc-stream-processor) has no analytics surface at all
(ABBankTopology.java wires fixed pipelines); these extend the engine's
§2.11 batch families.

Determinism contract (shared with the rest of the embedding family):
cosines are ROUND(fold, 6) with the sequential left-fold, centroids sit
on the exact 1e-6 integer grid (similarity.embedding_centroids), every
per-point statistic is floored to an integer scale BEFORE aggregation so
sums are order-free, and any final mean is ONE correctly-rounded double
division — bit-identical in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_stream_processor_spark.operators.similarity import (
    _cosine_pandas_udf,
    as_double,
    embedding_centroids,
)

SIL_SCALE = 1_000_000  # per-point silhouette floored to 1e-6 units


def silhouette_by_label(
    vecs: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified silhouette (centroid form) per label over cosine
    distance: for each point, a = 1 - cos(x, own-label centroid),
    b = 1 - max over OTHER labels of cos(x, centroid); per-point score
    s = (b - a) / max(a, b), floored to 1e-6 integer units before the
    per-label sum.

    The simplified variant (distance-to-centroid instead of mean pairwise
    distance) is the standard O(n·k) form — exact silhouette is O(n²) and
    belongs to the cosine_pairs/oracle surface. 100-TB shape: centroids
    are one (label, dim) partial-agg shuffle (exact integer grid), scoring
    is a MAP-ONLY broadcast pass, and the output aggregation shuffles
    n_labels rows.

    Returns (label, n_vecs, silhouette_sum_scaled, mean_silhouette) with
    mean = sum / (n · 1e6) as a single double division.
    """
    cents = embedding_centroids(vecs, group_col=label_col, vec_col=vec_col)
    v = vecs.select(
        F.col(id_col),
        F.col(label_col).alias("own_label"),
        as_double(F.col(vec_col)).alias("v"),
    )
    c = cents.select(
        F.col(label_col).alias("cent_label"),
        as_double(F.col("centroid")).alias("cv"),
    )
    cos = _cosine_pandas_udf()
    scored = v.join(F.broadcast(c)).select(
        id_col,
        "own_label",
        "cent_label",
        F.round(cos(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    per_point = scored.groupBy(id_col, "own_label").agg(
        F.max(
            F.when(F.col("cent_label") == F.col("own_label"), F.col("sim"))
        ).alias("s_own"),
        F.max(
            F.when(F.col("cent_label") != F.col("own_label"), F.col("sim"))
        ).alias("s_other"),
    )
    a = F.lit(1.0) - F.col("s_own")
    b = F.lit(1.0) - F.col("s_other")
    denom = F.greatest(a, b)
    sil = F.when(denom == 0.0, F.lit(0.0)).otherwise((b - a) / denom)
    pts = per_point.select(
        F.col("own_label").alias("label"),
        F.floor(sil * F.lit(float(SIL_SCALE))).cast("long").alias("s_scaled"),
    )
    return (
        pts.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("s_scaled").alias("silhouette_sum_scaled"),
        )
        .select(
            "label",
            "n_vecs",
            "silhouette_sum_scaled",
            (
                F.col("silhouette_sum_scaled").cast("double")
                / (F.col("n_vecs") * F.lit(SIL_SCALE)).cast("double")
            ).alias("mean_silhouette"),
        )
    )


def knn_label_agreement(
    vecs: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 4096,
    graph_k: int = 5,
) -> DataFrame:
    """Leave-one-out 1-NN label agreement per label — the classic label-
    noise / class-separability audit: for every vector, does its nearest
    OTHER vector (exact cosine, ties to smallest id) carry the same label?

    Rides the memoized exact kNN graph (similarity.knn_graph) at
    `graph_k` and keeps rank 1 — the top-1 of a top-k graph IS the 1-NN,
    so calling at the same k as the pagerank/triangles consumers shares
    ONE kernel run per session. The block-matrix kernel shuffles O(n·B·k)
    skinny rows, never the n² Gram. The two label joins are broadcast-able
    at any label-table size that fits a dim table (here they join the
    corpus itself, hash-partitioned by id — one shuffle each side at
    worst, co-partitioned after AQE).

    Returns (label, n_vecs, n_matched, agreement) where agreement is one
    double division n_matched / n_vecs.
    """
    from cdc_stream_processor_spark.operators.similarity import knn_graph

    nn = knn_graph(
        vecs, k=graph_k, id_col=id_col, vec_col=vec_col, block_size=block_size
    ).filter(F.col("rank") == 1)
    labels = vecs.select(F.col(id_col), F.col(label_col))
    own = labels.withColumnsRenamed({id_col: "vec_id", label_col: "own_label"})
    nb = labels.withColumnsRenamed(
        {id_col: "neighbor_id", label_col: "nb_label"}
    )
    joined = nn.join(own, "vec_id").join(nb, "neighbor_id")
    return (
        joined.groupBy(F.col("own_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                (F.col("own_label") == F.col("nb_label")).cast("long")
            ).alias("n_matched"),
        )
        .select(
            "label",
            "n_vecs",
            "n_matched",
            (
                F.col("n_matched").cast("double")
                / F.col("n_vecs").cast("double")
            ).alias("agreement"),
        )
    )


DBSCAN_MIN_PTS = 3  # core point: >= MIN_PTS neighbors at sim >= eps (self excluded)


def dbscan_from_pairs(
    vecs: DataFrame,
    pairs: DataFrame,
    min_pts: int = DBSCAN_MIN_PTS,
    id_col: str = "vec_id",
) -> DataFrame:
    """DBSCAN (Ester et al., KDD'96) over a precomputed ε-neighborhood
    pair graph — `pairs` is (vec_a < vec_b) with similarity already
    ≥ ε, e.g. similarity.lsh_near_dup_pairs (the sub-quadratic candidate
    path) or cosine_pairs (the exact oracle path). Splitting neighborhood
    generation from the clustering sweep is what makes DBSCAN distributed:
    the ε-graph is the only super-linear piece, and it reuses the blocked/
    banded machinery the dedup family already has.

    - core: degree ≥ min_pts in the symmetrized graph (self excluded);
    - clusters: connected components over CORE–CORE edges (min-id rep —
      operators.dedup.connected_components, pointer-jumping log-diameter);
      an isolated core is its own cluster (rep = own id);
    - border: non-core adjacent to ≥1 core — assigned the SMALLEST
      adjacent core cluster rep (deterministic; standard DBSCAN leaves
      border assignment order-dependent, we pin it);
    - noise: everything else (cluster NULL).

    Returns (vec_id, cluster, role) with role ∈ {core, border, noise}.
    """
    from cdc_stream_processor_spark.operators.dedup import (
        connected_components,
    )

    a = pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    adj = a.union(
        pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"))
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    cores = deg.filter(F.col("deg") >= min_pts).select(
        F.col("src").alias("core_id")
    )
    # no broadcast hint on `cores`: on a dense ε-graph the core set is
    # O(corpus), so forcing a broadcast here could exceed executor memory
    # at scale — AQE picks BHJ when cores is actually small (r8, per ADVICE)
    core_edges = (
        pairs.join(cores.withColumnRenamed("core_id", "vec_a"), "vec_a")
        .join(cores.withColumnRenamed("core_id", "vec_b"), "vec_b")
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    cc = connected_components(core_edges)  # (id, rep)
    core_cluster = cores.join(
        cc, cores["core_id"] == cc["id"], "left"
    ).select(
        F.col("core_id"),
        F.coalesce(F.col("rep"), F.col("core_id")).alias("cluster"),
    )
    # border: non-core adjacent to >= 1 core; min adjacent core cluster
    border = (
        adj.join(
            core_cluster.withColumnRenamed("core_id", "dst"),
            "dst",
        )
        .join(cores.withColumnRenamed("core_id", "src"), "src", "left_anti")
        .groupBy(F.col("src").alias(id_col))
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col(id_col), "cluster", F.lit("border").alias("role"))
    )
    core_rows = core_cluster.select(
        F.col("core_id").alias(id_col), "cluster", F.lit("core").alias("role")
    )
    assigned = core_rows.unionByName(border)
    noise = vecs.select(F.col(id_col)).join(
        assigned.select(id_col), id_col, "left_anti"
    ).select(
        F.col(id_col),
        F.lit(None).cast("long").alias("cluster"),
        F.lit("noise").alias("role"),
    )
    return assigned.unionByName(noise)
