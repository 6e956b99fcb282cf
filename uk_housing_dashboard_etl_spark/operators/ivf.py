"""IVF (inverted-file) ANN index: DataFrame-native k-means + probed search.

The second classic ANN family next to LSH: cluster the corpus once
(Lloyd's iterations — an *iterative* algorithm expressed as repeated
join/groupBy passes, the driver's non-SQL-expressible category), store
each vector under its nearest centroid, and search only the query's
``n_probes`` closest cells.

Implementation is pure DataFrame ops:
- centroids init: deterministic hash-sample of the corpus (no rand());
- assign step: the k centroids collapse into ONE broadcast array row;
  the nearest cell is a row-local ``array_min`` over per-centroid
  distances — ZERO shuffle, whole-stage codegen, deterministic
  (dist, cell) tie-break;
- update step: per-cell vector mean via ``pyspark.ml`` ``Summarizer``
  over VectorUDT — a single map-side-combinable aggregate whose shuffle
  carries at most k partial rows per partition (the posexplode
  alternative shuffles corpus_rows × dim rows per iteration);
- search: score only vectors in the probed cells, exact cosine rerank.

Scale notes: k-means cost is iterations × (corpus × k distance evals)
— with broadcast centroids it is embarrassingly parallel and never
shuffles the corpus; only k-row partial means move. The trained index
is just a column — persist the assigned corpus bucketed by cell and
probes prune to matching files.
"""

from __future__ import annotations

from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.stat import Summarizer
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uk_housing_dashboard_etl_spark.functions.rounding import round4
from uk_housing_dashboard_etl_spark.functions.topk import deterministic_topk
from uk_housing_dashboard_etl_spark.operators.similarity import (
    cosine_prenorm_expr,
    norm_expr,
)


def _sq_dist(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector, with zero shuffle.

    The k centroids collapse into one (cell, centroid) struct-array row
    that broadcasts; each vector computes its distance to every centroid
    inside one projection and takes ``array_min`` over (dist, cell)
    structs — struct comparison is field-ordered, so ties break to the
    smallest cell id deterministically. No explode, no groupBy: the
    corpus never leaves its partitions.
    """
    cent_arr = centroids.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("__cents")
    )
    nearest = F.array_min(
        F.expr(
            "transform(__cents, c -> struct("
            "aggregate(zip_with(vec, c.centroid, (x, y) -> (x - y) * (x - y)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dist,"
            " c.cell AS cell))"
        )
    )
    return vectors.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "vec", nearest.getField("cell").alias("cell")
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 16,
    iterations: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means; returns (cell, centroid array<double>).

    Init picks k deterministic corpus vectors via multiplicative id
    hashing — reproducible, no collect of data vectors to the driver.
    """
    vectors = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # Lloyd's re-reads the corpus every iteration; cache it once so the
    # unrolled plan hits memory, not parquet, iterations × times
    vectors = vectors.persist()
    init_order = [
        ((F.col("vec_id") * F.lit(2654435761)) % F.lit(1_000_000_007)).asc(),
        F.col("vec_id").asc(),
    ]
    centroids = deterministic_topk(vectors, init_order, k, rank_name="__r").select(
        (F.col("__r") - 1).alias("cell"), F.col("vec").alias("centroid")
    )
    for _ in range(iterations):
        assigned = _assign(vectors, centroids)
        # element-wise mean per cell in ONE aggregate: Summarizer keeps a
        # running vector sum per cell JVM-side (partial combine reduces
        # every partition to ≤ k rows before the exchange)
        centroids = (
            assigned.select("cell", array_to_vector("vec").alias("__v"))
            .groupBy("cell")
            .agg(Summarizer.mean(F.col("__v")).alias("__m"))
            .select("cell", vector_to_array("__m").alias("centroid"))
        )
    # materialize the k centroid rows (tiny) so the cached corpus can be
    # released and callers don't re-run the whole iteration lineage
    out = centroids.localCheckpoint(eager=True)
    vectors.unpersist()
    return out


def ivf_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its cell: (vec_id, vec, cell)."""
    vectors = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    return _assign(vectors, centroids)


def ivf_topk(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine over the query's ``n_probes``
    nearest cells only."""
    qs = queries.select(
        "query_id", F.col(vec_col).cast("array<double>").alias("qvec")
    ).withColumn("nq", norm_expr("qvec"))
    q_cells = (
        qs.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qvec",
            "nq",
            "cell",
            _sq_dist("qvec", "centroid").alias("dist"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cell")
            ),
        )
        .where(F.col("__r") <= n_probes)
        .select("query_id", "qvec", "nq", "cell")
    )
    scored = (
        index.withColumn("nv", norm_expr("vec"))
        .join(F.broadcast(q_cells), "cell")
        .select(
            "query_id",
            "vec_id",
            round4(cosine_prenorm_expr("qvec", "vec", "nq", "nv")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
