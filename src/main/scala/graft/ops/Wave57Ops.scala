package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** Round-10 wave 57: the MLlib estimator-API twins for similarity search
  * (north star: "Structured Streaming + MLlib") — the library paths a
  * Spark-first user reaches for before hand-rolling, next to this repo's
  * own formulations (vec_kmeans_step, vec_knn_probe, vec_semdedup).
  *
  *  - `vec_kmeans_mllib`: MLlib KMeans (seeded k-means||) over the
  *    embeddings, k=8, 5 iterations. Seeded ⇒ run-deterministic on one
  *    engine but not DuckDB-replayable (init samples from Spark's RNG) —
  *    declared no-oracle per the SURVEY §2.10 seeded-algorithm rule;
  *    Wave57Spec pins determinism across runs, assignment = nearest
  *    centroid, and inertia no worse than the deterministic ⌈√n⌉-seed
  *    baseline (vec_kmeans_step's sizing). Output: per-cluster size +
  *    rounded inertia contribution, orderable without exposing raw
  *    cluster ids (KMeans ids are arbitrary — sizes are sorted instead).
  *  - `vec_rp_lsh_mllib`: BucketedRandomProjectionLSH (the L2 LSH) as
  *    the candidate generator for the SAME 3-query 5-NN task
  *    vec_knn_probe answers exactly — candidates from
  *    approxNearestNeighbors, then EXACT cosine re-rank so the output is
  *    seed-independent wherever recall is complete. Spec pins recall vs
  *    the brute-force 5-NN. No oracle (seeded hyperplanes).
  */
object Wave57Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "vec_kmeans_mllib",
      (s, dir) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.linalg.Vectors
        import s.implicits._
        val vecs = T(s, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("e"))
          .as[(Long, Seq[Double])]
          .map { case (id, e) => (id, Vectors.dense(e.toArray)) }
          .toDF("vec_id", "features")
        val model = new KMeans()
          .setK(8).setMaxIter(5).setSeed(42L)
          .setFeaturesCol("features")
          .fit(vecs)
        val assigned = model.transform(vecs)
        val cents = model.clusterCenters
        // per-cluster size + within-cluster SSE, reported as a
        // size-sorted table (cluster ids are arbitrary across ports)
        val withD = assigned.as[(Long, org.apache.spark.ml.linalg.Vector,
            Int)]
          .map { case (_, v, c) => (c, Vectors.sqdist(v, cents(c))) }
          .toDF("cluster", "d2")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_vecs"),
            // dsum, not sum: a plain double sum is partial-agg-order
            // dependent and would flap the rounded SSE across runs
            dsum(col("d2"), 6).as("sse"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n_vecs").desc, col("sse"))
        withD
          .select(col("n_vecs"), dround(col("sse"), 3).as("sse"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .select("rank", "n_vecs", "sse")
          .orderBy("rank")
      },
      None
    ),
    Q(
      "vec_rp_lsh_mllib",
      (s, dir) => {
        import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
        import org.apache.spark.ml.linalg.Vectors
        import s.implicits._
        val raw = T(s, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("e"))
          .as[(Long, Seq[Double])]
          .map { case (id, e) => (id, Vectors.dense(e.toArray)) }
          .toDF("vec_id", "features")
        val lsh = new BucketedRandomProjectionLSH()
          .setInputCol("features").setOutputCol("hashes")
          .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
          .fit(raw)
        val hashed = lsh.transform(raw).cache()
        val qids = Seq(5L, 17L, 42L)
        val queries = raw.filter(col("vec_id").isin(qids: _*))
          .as[(Long, org.apache.spark.ml.linalg.Vector)].collect()
        // candidates via the index (k+1: the query matches itself), then
        // exact cosine re-rank — seed-independent wherever the LSH
        // recall is complete (spec pins recall vs brute force). The
        // per-query driver loop is the MLlib single-query ANN API shape;
        // each collect is <= 6 candidate rows (bounded, like the probe
        // collection in vec_knn_probe). This op is a library-API parity
        // twin only: batch/fan-out serving belongs on vec_knn_probe /
        // vec_knn_probe_2level, which score all queries in ONE
        // distributed plan instead of a driver loop
        val out = queries.flatMap { case (qid, qv) =>
            lsh.approxNearestNeighbors(hashed, qv, 6)
              .select(col("vec_id"), col("features"))
              .as[(Long, org.apache.spark.ml.linalg.Vector)]
              .collect()
              .filter(_._1 != qid)
              .map { case (vid, v) =>
                val dot = (0 until v.size).map(i => v(i) * qv(i)).sum
                (qid, vid, math.round(dot / (Vectors.norm(v, 2) *
                  Vectors.norm(qv, 2)) * 1e6) / 1e6)
              }
              .sortBy { case (_, vid, sim) => (-sim, vid) }
              .take(5).zipWithIndex
              .map { case ((q, vid, sim), i) => (q, vid, sim, i + 1L) }
          }.toSeq
        hashed.unpersist(blocking = false)
        out.toDF("q_id", "vec_id", "sim", "rnk")
          .orderBy("q_id", "rnk")
      },
      None
    )
  )
}
