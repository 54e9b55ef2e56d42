package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 48: clustering evaluation, nested-schema I/O, tree
  * splits.
  *
  *  - `vec_cluster_purity` is external clustering evaluation: assign
  *    every embedding to its nearest of ⌈√n⌉ seed centroids on the
  *    1e7 integer grid (the exact deterministic geometry vec_semdedup
  *    uses), then score the clustering against the class labels with
  *    PURITY (Σ majority-label counts / N) and the share of
  *    singleton clusters. The centroid set broadcasts; distances are
  *    exact int64 sums.
  *  - `sink_nested_prune` exercises nested-struct I/O: write orders
  *    as struct columns, read back ONLY one subfield, and assert
  *    IN-OP that the parquet ReadSchema pruned to that subfield (a
  *    scan that drags the whole struct for a 1-column projection is
  *    wrong at any scale — the assertion makes the plan shape a
  *    correctness property, like sql_cache_table does for caching).
  *  - `ml_best_split_gini` is the decision-tree split finder: bucket
  *    order value into integer candidate thresholds, one cumulative
  *    pass gives left/right class counts per threshold, score
  *    weighted Gini impurity and return the argmin split — the core
  *    primitive behind every tree/GBM feature-importance pipeline,
  *    here as pure SQL-shaped aggregation (counts exact, impurity
  *    doubles at the end).
  */
object Wave48Ops extends QueryModule {

  /** vec_cluster_purity body, cap-parameterized so CellSplitSpec can
    * force the two-level routing path (VERDICT-r10 #1); at the default
    * cap fixture sizes give `sub == 1` and the cluster key (cell,
    * scell=1) is exactly the proven single-level clustering. */
  private[graft] def purityBody(s: org.apache.spark.sql.SparkSession,
      dir: String,
      cap: Long = graft.vec.VecAlgs.BroadcastCellCap)
      : org.apache.spark.sql.DataFrame = {
    val gridded = T(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr(
        "transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT))").as("g"))
    // sized from parquet footers (T.rows): zero Spark jobs
    val (k, sub) =
      graft.vec.VecAlgs.cellSplit(T.rows(s, dir, "embeddings"), cap)
    val cents = gridded.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("g").as("cg"))
    val assigned = graft.vec.IvfRouting
      .assignFine(gridded, cents, sub, carry = Seq("label"))
      .select(col("cell"), col("scell"), col("label"))
    val byCell = assigned.groupBy("cell", "scell", "label")
      .agg(count(lit(1)).as("n"))
    val cellTop = byCell.groupBy("cell", "scell")
      .agg(max("n").as("top"), sum("n").as("cn"))
    cellTop.agg(
        count(lit(1)).as("n_clusters"),
        sum("cn").as("n_points"),
        sum("top").as("majority_sum"),
        sum((col("cn") === 1).cast("long")).as("n_singletons"))
      .select(col("n_clusters"), col("n_points"),
        dround(col("majority_sum").cast("double") / col("n_points"),
          6).as("purity"),
        dround(col("n_singletons").cast("double") /
          col("n_clusters"), 6).as("singleton_frac"))
  }

  def queries: Seq[Q] = Seq(
    Q(
      "vec_cluster_purity",
      (s, dir) => purityBody(s, dir),
      Some(
        "WITH gr AS (SELECT vec_id, label, " +
          "list_transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS g " +
          "FROM embeddings), " +
          "kk AS (SELECT CAST(least(65536, greatest(1, " +
          "CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) " +
          "AS BIGINT) AS k FROM gr), " +
          "cents AS (SELECT vec_id AS cid, g AS cg FROM gr, kk " +
          "WHERE vec_id < k), " +
          "asg AS (SELECT gr.vec_id, gr.label, " +
          "(SELECT c.cid FROM cents c ORDER BY (SELECT " +
          "sum((z.x - z.y) * (z.x - z.y)) FROM (SELECT unnest(gr.g) " +
          "AS x, unnest(c.cg) AS y) z) ASC, c.cid ASC LIMIT 1) AS cid " +
          "FROM gr), " +
          "bc AS (SELECT cid, label, CAST(count(*) AS BIGINT) AS n " +
          "FROM asg GROUP BY 1, 2), " +
          "ct AS (SELECT cid, CAST(max(n) AS BIGINT) AS top, " +
          "CAST(sum(n) AS BIGINT) AS cn FROM bc GROUP BY 1), " +
          "f AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters, " +
          "CAST(sum(cn) AS BIGINT) AS n_points, " +
          "CAST(sum(top) AS BIGINT) AS majority_sum, " +
          "CAST(sum(CASE WHEN cn = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_singletons FROM ct) " +
          "SELECT n_clusters, n_points, " +
          droundSql("CAST(majority_sum AS DOUBLE) / n_points", 6) +
          " AS purity, " +
          droundSql("CAST(n_singletons AS DOUBLE) / n_clusters", 6) +
          " AS singleton_frac FROM f")
    ),
    Q(
      "sink_nested_prune",
      (s, dir) => {
        val tmp = graft.Tmp.dir("graft_nested")
        T(s, dir, "orders")
          .select(struct(col("o_orderkey").as("key"),
              col("o_totalprice").as("price")).as("o"),
            struct(col("o_orderstatus").as("status"),
              col("o_orderpriority").as("prio")).as("meta"))
          .write.mode("overwrite").parquet(tmp)
        val back = s.read.parquet(tmp)
          .select(col("meta.status").as("status"),
            col("o.price").as("price"))
        // plan-shape assertion: the parquet ReadSchema must carry only
        // the two referenced subfields, not the full structs
        val agged = back.groupBy("status")
          .agg(count(lit(1)).as("n"), dsum(col("price"), 2).as("total"))
        val plan = agged.queryExecution.executedPlan.toString
        val readSchema = "ReadSchema: ([^\\n]*)".r
          .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
        require(readSchema.contains("price") &&
          readSchema.contains("status") &&
          !readSchema.contains("key") && !readSchema.contains("prio"),
          s"nested schema pruning failed: ReadSchema = $readSchema")
        agged.orderBy("status")
      },
      Some(
        "SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n, " +
          dsumSql("o_totalprice", 2) + " AS total " +
          "FROM orders GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "ml_best_split_gini",
      (s, dir) => {
        // candidate thresholds: integer kilo-dollar buckets of order
        // value; target: high-priority order (1-URGENT / 2-HIGH)
        val rows = T(s, dir, "orders")
          .select((round(col("o_totalprice")).cast("long") / 1000L)
            .cast("long").as("bucket"),
            (col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
              .cast("long").as("y"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("y").as("k"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = rows.agg(sum("n").as("nn"), sum("k").as("kk"))
        val scored = rows
          .withColumn("nl", sum("n").over(w))
          .withColumn("kl", sum("k").over(w))
          .crossJoin(broadcast(tot))
          .filter(col("nl") < col("nn"))
          .withColumn("nr", col("nn") - col("nl"))
          .withColumn("kr", col("kk") - col("kl"))
          .withColumn("pl", col("kl").cast("double") / col("nl"))
          .withColumn("pr", col("kr").cast("double") / col("nr"))
          .withColumn("gini",
            (col("nl").cast("double") / col("nn")) *
              (lit(2.0) * col("pl") * (lit(1.0) - col("pl"))) +
              (col("nr").cast("double") / col("nn")) *
                (lit(2.0) * col("pr") * (lit(1.0) - col("pr"))))
        scored
          .select(col("bucket").as("split_at_kusd"), col("nl"),
            col("nr"), dround(col("gini"), 6).as("weighted_gini"))
          .orderBy(col("weighted_gini"), col("split_at_kusd"))
          .limit(5)
      },
      Some(
        "WITH rows_ AS (SELECT " +
          "CAST(round(o_totalprice) AS BIGINT) // 1000 AS bucket, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', " +
          "'2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS k " +
          "FROM orders GROUP BY 1), " +
          "tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, " +
          "CAST(sum(k) AS BIGINT) AS kk FROM rows_), " +
          "cum AS (SELECT bucket, " +
          "CAST(sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW) AS BIGINT) AS nl, " +
          "CAST(sum(k) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW) AS BIGINT) AS kl FROM rows_), " +
          "sc AS (SELECT bucket, nl, kl, nn - nl AS nr, kk - kl AS kr, " +
          "CAST(kl AS DOUBLE) / nl AS pl, " +
          "CAST(kk - kl AS DOUBLE) / (nn - nl) AS pr, nn " +
          "FROM cum, tot WHERE nl < nn), " +
          "g AS (SELECT bucket, nl, nr, " +
          "(CAST(nl AS DOUBLE) / nn) * (2.0 * pl * (1.0 - pl)) + " +
          "(CAST(nr AS DOUBLE) / nn) * (2.0 * pr * (1.0 - pr)) " +
          "AS gini FROM sc) " +
          "SELECT bucket AS split_at_kusd, nl, nr, " +
          droundSql("gini", 6) + " AS weighted_gini FROM g " +
          "ORDER BY weighted_gini, split_at_kusd LIMIT 5")
    )
  )
}
