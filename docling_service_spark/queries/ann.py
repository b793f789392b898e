"""IVF (inverted-file) approximate nearest neighbor over the embedding
column: k-means coarse quantizer + cluster-restricted exact search.

This is the classic big-data ANN layout (FAISS IVF-Flat shape) expressed
Spark-first:

- **Train** (q44): Lloyd's k-means via DataFrame ops — assignment is a pure
  columnar argmin over k centroid distances (no UDF), the update is one
  groupBy with 64 per-dimension averages (single shuffle per iteration).
  Centroids live on the driver between iterations (k x 64 doubles — the
  standard MLlib-style pattern; they are broadcast INTO expressions as
  literals, so executors never see python loops).
- **Search** (q45): probes route to their ``nprobe`` nearest centroids
  (driver-side — centroids are tiny), candidates are the union of those
  clusters' vectors (a partition-pruned semi-join at scale: cluster is the
  natural partition key of the vector table), and the exact cosine top-k
  runs only within candidates.  At 100 TB this is the difference between
  scanning everything per probe (q40) and scanning ``nprobe/k`` of it.

k-means is iterative and FP-order sensitive, so these are rows-only queries
for the driver (the brief's 'iterative algorithms' carve-out); exactness is
covered by pytest instead: assignments are verified argmin-exact against a
NumPy recomputation, and q45's recall@k is measured against the q40
brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import load
from .similarity import DIM, TOP_K, _dot

IVF_K = 16        # coarse clusters
IVF_ITERS = 5     # Lloyd iterations (fixed: determinism over convergence)
N_PROBE = 4       # clusters searched per query
N_QUERIES = 5     # probe set (mirrors q40's)


def _sq_dist(emb_col, centroid: list) -> "F.Column":
    w = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(emb_col, w, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb, centroids: list[list[float]]):
    """vec_id, cluster, sq_dist — argmin via array_min over (dist, idx)
    structs (struct ordering compares dist first, idx breaks ties
    deterministically)."""
    pairs = F.array(*[
        F.struct(_sq_dist(F.col("embedding"), c).alias("d"), F.lit(j).alias("c"))
        for j, c in enumerate(centroids)
    ])
    best = F.array_min(pairs)
    return emb.select("vec_id", "embedding",
                      best["c"].alias("cluster"), best["d"].alias("sq_dist"))


_CENTROID_CACHE: dict[tuple, list] = {}


def train_ivf(spark, sf_dir, *, k: int = IVF_K, iters: int = IVF_ITERS) -> list[list[float]]:
    """Lloyd's k-means; returns the centroid list.  Deterministic: init =
    the k lowest vec_ids, fixed iteration count, per-dimension avg() — which
    also makes memoizing per (sf_dir, k, iters) safe: a q44+q45 sweep trains
    once instead of paying the iteration jobs twice."""
    key = (sf_dir, k, iters)
    if key in _CENTROID_CACHE:
        return _CENTROID_CACHE[key]
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    init = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init]
    dim_avgs = [F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"d{i}")
                for i in range(DIM)]
    for _ in range(iters):
        agg = _assign(emb, centroids).groupBy("cluster").agg(*dim_avgs).collect()
        by_cluster = {r["cluster"]: [r[f"d{i}"] for i in range(DIM)] for r in agg}
        centroids = [by_cluster.get(j, centroids[j]) for j in range(k)]  # empty cluster keeps its centroid
    _CENTROID_CACHE[key] = centroids
    return centroids


def q44_ivf_assignments(spark, sf_dir):
    """Every vector's coarse cluster + floor-scaled distance (rows-only)."""
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    centroids = train_ivf(spark, sf_dir)
    return _assign(emb, centroids).select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.floor(F.col("sq_dist") * 1_000_000).cast("bigint").alias("sq_dist_e6"),
    )


def q45_ivf_ann_topk(spark, sf_dir):
    """IVF search: probe → nprobe nearest clusters → exact cosine top-k
    within candidates only (rows-only; recall vs q40 tested in pytest)."""
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    centroids = train_ivf(spark, sf_dir)
    assigned = _assign(emb, centroids).select("vec_id", "embedding", "cluster")

    probes = assigned.filter(F.col("vec_id") < N_QUERIES).collect()

    def nearest_clusters(vec) -> list[int]:
        d = []
        for j, c in enumerate(centroids):
            d.append((sum((float(x) - c[i]) ** 2 for i, x in enumerate(vec)), j))
        return [j for _, j in sorted(d)[:N_PROBE]]

    probe_routes = [(int(r["vec_id"]), [float(x) for x in r["embedding"]],
                     nearest_clusters(r["embedding"])) for r in probes]
    routes = spark.createDataFrame(
        [(pid, pe, c) for pid, pe, cl in probe_routes for c in cl],
        "probe_id bigint, pe array<double>, cluster bigint",
    )
    cands = assigned.join(F.broadcast(routes), "cluster").select(
        "probe_id", "pe", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    sim = _dot(F.col("pe"), F.col("ce")) / (
        F.sqrt(_dot(F.col("pe"), F.col("pe"))) * F.sqrt(_dot(F.col("ce"), F.col("ce")))
    )
    scored = cands.withColumn("sim_e6", F.floor(sim * 1_000_000).cast("bigint")) \
                  .dropDuplicates(["probe_id", "neighbor_id"])
    w = Window.partitionBy("probe_id").orderBy(F.col("sim_e6").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "sim_e6")
    )


QUERIES = {
    "q44_ivf_assignments": q44_ivf_assignments,
    "q45_ivf_ann_topk": q45_ivf_ann_topk,
}

# Intentionally oracle-less: k-means is iterative + FP-order sensitive (the
# driver brief's carve-out); pytest covers argmin exactness and recall.
ORACLES: dict[str, str] = {}
