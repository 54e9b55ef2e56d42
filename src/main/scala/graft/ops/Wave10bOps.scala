package graft.ops

import graft.{Q, QueryModule, T, StreamRun}
import graft.Det.dround
import org.apache.spark.sql.functions._

/** `stream_psi_monitor_live`: online drift monitoring as a real
  * Structured Streaming job — the production shape of wave-10's PSI.
  *
  * The stream maintains ONLY per-(day, bin) counts (10 fixed value bins;
  * incremental stateful aggregation, state is days×10 rows); the PSI
  * against the broadcast baseline distribution is a constant-size batch
  * epilogue over the materialized counts — the alerting stage reads 10
  * rows per day, never the event stream. Bin edges come from the static
  * baseline scan, as a deployed monitor's would (frozen at deploy time).
  * Laplace-smoothed shares, per-term 1e9 quantization, integer sums —
  * the same determinism contract as stats_psi_drift, so the whole
  * stream+epilogue pipeline shares one SQL oracle.
  */
object Wave10bOps extends QueryModule {

  /** one ranking pass of the MRL oracle: top-10 neighbors per query
    * (vec_id < 50) under embedding expression `eExpr`, as CTE
    * `rank_<tag>` with columns (q_id, nn) — mirrors VectorOps' oracle
    * conventions (double-widened dot, 6dp rounding, vec_id tiebreak)
    */
  private def vecRankSql(tag: String, eExpr: String): String =
    s"v0_$tag AS (SELECT vec_id, $eExpr AS e FROM base), " +
      s"vn_$tag AS (SELECT vec_id, e, " +
      "sqrt((SELECT sum(CAST(z.x AS DOUBLE) * z.x) " +
      "FROM (SELECT unnest(e) AS x) z)) AS nrm " +
      s"FROM v0_$tag), " +
      s"vf_$tag AS (SELECT * FROM vn_$tag WHERE nrm > 0), " +
      s"q_$tag AS (SELECT vec_id AS q_id, e AS eq, nrm AS nq " +
      s"FROM vf_$tag WHERE vec_id < 50), " +
      s"p_$tag AS (SELECT q.q_id, v.vec_id, " +
      "round((SELECT sum(CAST(z.x AS DOUBLE) * z.y) " +
      "FROM (SELECT unnest(v.e) AS x, unnest(q.eq) AS y) z) " +
      "/ (v.nrm * q.nq) * 1e6) / 1e6 AS sim " +
      s"FROM vf_$tag v, q_$tag q WHERE v.vec_id <> q.q_id), " +
      s"rank_$tag AS (SELECT q_id, vec_id AS nn FROM " +
      "(SELECT q_id, vec_id, row_number() OVER " +
      "(PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rk " +
      s"FROM p_$tag) r WHERE rk <= 10)"

  def queries: Seq[Q] = Seq(
    Q(
      "vec_mrl_recall",
      // Matryoshka-style truncation quality: rank the corpus by cosine
      // under the FULL 64-dim embedding and under the first-16-dims
      // truncation (renormalized), then measure per-query top-10 overlap.
      // The evaluation every embedding-dimension-reduction decision needs,
      // as one query: two ranking passes over the same broadcast query
      // batch + an overlap join. Sims are rounded to 6dp BEFORE ranking
      // with vec_id as tiebreak, so both engines rank identically.
      (s, dir) => {
        graft.functions.VecExprs.register(s)
        import org.apache.spark.sql.expressions.Window
        def ranked(dims: Option[Int], tag: String) = {
          val emb = dims match {
            case Some(d) => expr(s"slice(embedding, 1, $d)")
            case None => col("embedding")
          }
          val v = T(s, dir, "embeddings")
            .select(col("vec_id"), emb.as("e"))
            .withColumn("nrm", sqrt(expr("fvdot(e, e)")))
            .filter(col("nrm") > 0)
          val q = broadcast(v.filter(col("vec_id") < 50)
            .select(col("vec_id").as("q_id"), col("e").as("eq"),
              col("nrm").as("nq")))
          val w = Window.partitionBy("q_id")
            .orderBy(col("sim").desc, col("vec_id"))
          v.join(q, col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id"),
              dround(expr("fvdot(e, eq)") / (col("nrm") * col("nq")), 6)
                .as("sim"))
            .withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 10)
            .select(col("q_id"), col("vec_id").as(s"nn_$tag"))
        }
        // LEFT join so zero-overlap queries stay in the denominator
        ranked(None, "full")
          .join(ranked(Some(16), "trunc").withColumnRenamed("q_id", "q2"),
            col("q_id") === col("q2") &&
              col("nn_full") === col("nn_trunc"), "left")
          .agg(countDistinct("q_id").as("n_queries"),
            count(col("nn_trunc")).as("total_overlap"))
          .select(col("n_queries"), col("total_overlap"),
            (round(col("total_overlap") / (col("n_queries") * 10.0) * 1e6)
              / 1e6).as("recall_at_10"))
      },
      Some(
        "WITH base AS (SELECT vec_id, embedding AS e FROM embeddings), " +
          vecRankSql("full", "e") + ", " +
          vecRankSql("trunc", "e[1:16]") + " " +
          "SELECT CAST(count(DISTINCT f.q_id) AS BIGINT) AS n_queries, " +
          "CAST(count(t.nn) AS BIGINT) AS total_overlap, " +
          "round(count(t.nn) / (count(DISTINCT f.q_id) * 10.0) * 1e6) " +
          "/ 1e6 AS recall_at_10 FROM rank_full f " +
          "LEFT JOIN rank_trunc t ON f.q_id = t.q_id AND f.nn = t.nn")
    ),
    Q(
      "stream_psi_monitor_live",
      (s, dir) => {
        val base = T(s, dir, "events").select(col("value"))
        val mm = base.agg(min("value"), max("value")).collect()(0)
        val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
        val width = math.max((hi - lo) / 10.0, 1e-9)
        def binOf(c: org.apache.spark.sql.Column) =
          least(floor((c - lo) / width).cast("long"), lit(9L))
        val baseline = base.groupBy(binOf(col("value")).as("bin"))
          .agg(count(lit(1)).as("cb"))
        val nb = base.count()
        val name = s"live_psi_${System.nanoTime()}"
        StreamRun.withStateParts(s) {
          val q = EventOps.liveEvents(s, dir)
            .groupBy(window(col("ts"), "1 day").as("w"),
              binOf(col("value")).as("bin"))
            .agg(count(lit(1)).as("c"))
            .select(col("w.start").cast("timestamp_ntz").as("win_start"),
              col("bin"), col("c"))
            .writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        val daily = s.table(name)
        val perDay = org.apache.spark.sql.expressions.Window
          .partitionBy("win_start")
        val p = (col("c") + 1).cast("double") / (col("n_day") + 10)
        val q_ = (col("cb") + 1).cast("double") / (nb + 10).toDouble
        daily.join(broadcast(baseline), "bin")
          .withColumn("n_day", sum("c").over(perDay))
          .select(col("win_start"), col("n_day"),
            round((p - q_) * log(p / q_) * 1e9).cast("long").as("term"))
          .groupBy("win_start", "n_day")
          .agg((round(sum("term") / 1e9 * 1e6) / 1e6).as("psi"))
          .select(col("win_start"), col("n_day").as("n"), col("psi"))
          .orderBy("win_start")
      },
      Some(
        "WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS t, value " +
          "FROM events), " +
          "mm AS (SELECT min(value) AS lo, " +
          "greatest((max(value) - min(value)) / 10.0, 1e-9) AS w, " +
          "count(*) AS nb FROM ev), " +
          "binned AS (SELECT CAST(date_trunc('day', t) AS TIMESTAMP) " +
          "AS win_start, " +
          "least(CAST(floor((value - (SELECT lo FROM mm)) " +
          "/ (SELECT w FROM mm)) AS BIGINT), 9) AS bin FROM ev), " +
          "baseline AS (SELECT least(CAST(floor((value - " +
          "(SELECT lo FROM mm)) / (SELECT w FROM mm)) AS BIGINT), 9) " +
          "AS bin, count(*) AS cb FROM ev GROUP BY 1), " +
          "daily AS (SELECT win_start, bin, count(*) AS c FROM binned " +
          "GROUP BY 1, 2), " +
          "dn AS (SELECT win_start, sum(c) AS n_day FROM daily " +
          "GROUP BY 1), " +
          "terms AS (SELECT d.win_start, dn.n_day, CAST(round(" +
          "(CAST(d.c + 1 AS DOUBLE) / (dn.n_day + 10) - " +
          "CAST(b.cb + 1 AS DOUBLE) / ((SELECT nb FROM mm) + 10)) * " +
          "ln((CAST(d.c + 1 AS DOUBLE) / (dn.n_day + 10)) / " +
          "(CAST(b.cb + 1 AS DOUBLE) / ((SELECT nb FROM mm) + 10))) " +
          "* 1e9) AS BIGINT) AS term " +
          "FROM daily d JOIN baseline b ON d.bin = b.bin " +
          "JOIN dn ON d.win_start = dn.win_start) " +
          "SELECT win_start, CAST(n_day AS BIGINT) AS n, " +
          "round(sum(term) / 1e9 * 1e6) / 1e6 AS psi " +
          "FROM terms GROUP BY win_start, n_day ORDER BY win_start")
    )
  )
}
