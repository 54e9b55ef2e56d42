package graft.ops

import graft.{Q, QueryModule, T}
import graft.functions.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 22: product quantization — the memory side of
  * billion-scale ANN (IVF gives the candidate cells, PQ makes the
  * residuals fit in RAM: 64 floats → 8 five-bit codes here).
  *
  * `vec_pq_adc` runs the full pipeline as Spark jobs:
  *   1. TRAIN: per-subspace k-means (M=8 subspaces × 8 dims, K=32
  *      centroids, 3 Lloyd iterations; deterministic init = the
  *      subvectors of the 16 lowest vec_ids). Each iteration is one
  *      broadcast-codebook assignment pass + one keyed aggregate over
  *      (subspace, code, dim) — constant-size state, linear scans,
  *      exactly how IVF-PQ trains on a cluster.
  *   2. ENCODE: nearest-centroid per subspace via the codegen'd fvl2
  *      expression, ties to the lowest code.
  *   3. SEARCH: asymmetric distance (ADC) for 3 query vectors — per
  *      query an 8×32 distance table broadcasts and every vector's
  *      approx distance is an 8-lookup sum, top-10 by (dist, id).
  *   4. EVALUATE: recall@10 against the exact fvl2 top-10.
  *
  * No oracle: k-means is iterative (the same irreducibility class as
  * rc_* / sketches); Wave22Spec pins determinism, code ranges,
  * reconstruction-improves-over-iterations and a recall floor.
  */
object Wave22Ops extends QueryModule {

  private val M = 8 // subspaces
  private val SubDim = 8 // dims per subspace (64-dim embeddings)
  private val K = 32 // centroids per subspace
  private val Iters = 3

  /** Subvector slices: one row per (vec_id, m) with the m-th 8-dim
    * slice, float → double once.
    */
  private def subvectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      explode(sequence(lit(0), lit(M - 1))).as("m"),
      col("embedding"))
      .withColumn("sv", expr(
        s"transform(slice(embedding, m * $SubDim + 1, $SubDim), " +
          "x -> CAST(x AS DOUBLE))"))
      .drop("embedding")

  /** One Lloyd iteration: assign each subvector to its nearest code in
    * the broadcast codebook, recompute per-(m, code, dim) means. The
    * codebook is M×K×SubDim doubles — always driver/broadcast sized.
    */
  private def lloyd(s: SparkSession, sub: DataFrame,
      book: Map[(Int, Int), Array[Double]]): Map[(Int, Int), Array[Double]] = {
    val assigned = assign(s, sub, book)
    val updated = assigned
      .select(col("m"), col("code"),
        posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy("m", "code", "dim")
      .agg(avg("x").as("mu"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (mk, rows) =>
        val arr = new Array[Double](SubDim)
        rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3))
        mk -> arr
      }
    // empty clusters keep their previous centroid
    book.map { case (mk, old) => mk -> updated.getOrElse(mk, old) }
  }

  /** Nearest-code assignment under a broadcast codebook: MAP-SIDE — the
    * codebook rides a broadcast closure and each subvector row computes
    * its own argmin (sequential i-order fold, strict `<`, so distances
    * and the lowest-code tie-break are bit-identical to the former
    * join/min(struct) formulation but with ZERO shuffle per pass; at
    * scale the K×rows join blow-up this replaces is the difference
    * between one narrow scan and K copies of the table per iteration).
    */
  private def assign(s: SparkSession, sub: DataFrame,
      book: Map[(Int, Int), Array[Double]]): DataFrame = {
    val bb = s.sparkContext.broadcast(book)
    val nearest = udf { (m: Int, sv: Seq[Double]) =>
      val b = bb.value
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < K) {
        val ce = b((m, c))
        var d = 0.0
        var i = 0
        while (i < SubDim) {
          val t = sv(i) - ce(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      (bestC, bestD)
    }
    sub.withColumn("bd", nearest(col("m"), col("sv")))
      .select(col("vec_id"), col("m"), col("sv"),
        col("bd._1").as("code"), col("bd._2").as("d2"))
  }

  def queries: Seq[Q] = Seq(
    Q(
      "vec_pq_adc",
      (s, dir) => {
        VecExprs.register(s)
        val emb = T(s, dir, "embeddings").select("vec_id", "embedding")
        val sub = subvectors(emb).cache()
        // deterministic init: subvectors of the 32 lowest vec_ids
        var book: Map[(Int, Int), Array[Double]] =
          sub.filter(col("vec_id") < K).collect()
            .map(r => (r.getAs[Int]("m"),
              r.getAs[Long]("vec_id").toInt) ->
              r.getAs[Seq[Double]]("sv").toArray)
            .toMap
        (1 to Iters).foreach(_ => book = lloyd(s, sub, book))
        val codes = assign(s, sub, book)
          .select(col("vec_id"), col("m"), col("code"), col("d2"))
          .cache()
        // ADC for 3 queries: per-query distance table over the book,
        // approx distance = sum of 8 code lookups (a broadcast join)
        val queries = emb.filter(col("vec_id") < 3)
          .collect().map(r => r.getLong(0) ->
            r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
        import scala.jdk.CollectionConverters._
        val dtRows = queries.flatMap { case (q, v) =>
          book.toSeq.map { case ((m, c), ce) =>
            val d = (0 until SubDim).map { i =>
              val diff = v(m * SubDim + i) - ce(i); diff * diff
            }.sum
            org.apache.spark.sql.Row(q, m, c, d)
          }
        }
        val dtSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("qid",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("m",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("code",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("dq",
            org.apache.spark.sql.types.DoubleType)))
        val dt = broadcast(s.createDataFrame(
          dtRows.toSeq.asJava, dtSchema))
        val adc = codes.join(dt, Seq("m", "code"))
          .groupBy("qid", "vec_id")
          .agg(sum("dq").as("adist"))
        val wA = Window.partitionBy("qid")
          .orderBy(col("adist"), col("vec_id"))
        val approxTop = adc.withColumn("rk", row_number().over(wA))
          .filter(col("rk") <= 10).select("qid", "vec_id")
        // exact top-10 by fvl2 full scan (the ground truth)
        val qdf = broadcast(emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qe")))
        val wE = Window.partitionBy("qid")
          .orderBy(col("edist"), col("vec_id"))
        val exactTop = emb.crossJoin(qdf)
          .withColumn("edist", expr("fvl2(embedding, qe)"))
          .withColumn("rk", row_number().over(wE))
          .filter(col("rk") <= 10).select("qid", "vec_id")
        approxTop.as("a")
          .join(exactTop.as("e"),
            col("a.qid") === col("e.qid") &&
              col("a.vec_id") === col("e.vec_id"))
          .groupBy(col("a.qid").as("qid"))
          .agg(count(lit(1)).as("hits"))
          .select(col("qid"), col("hits"),
            (col("hits") / 10.0).as("recall10"))
          .orderBy("qid")
      },
      None // iterative k-means — spec-checked (Wave22Spec)
    )
  )
}
