package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 49: offline model-evaluation metrics — the scoring loop
  * every ranking / filtering / quality model in a training-data pipeline
  * is judged by, as pure aggregation shapes.
  *
  * Shared fixture: a deterministic surrogate classifier over orders.
  * Label `y` = order is high-priority (1-URGENT / 2-HIGH); score =
  * (u + y) / 2 where u is the portable integer-LCG uniform seeded on
  * o_orderkey (same generator family as `data_dp_counts`) — a "model"
  * that is right more often than not by construction, so every metric
  * has signal while staying bit-identical in both engines.
  *
  *  - `ml_auc_roc`: ROC AUC via the tie-corrected Mann-Whitney rank
  *    identity. Scores are quantized to the 1e-6 grid FIRST, so the
  *    one ordered window runs over ≤ 1e6+1 score buckets no matter how
  *    many input rows — AUC-at-scale without a global per-row sort.
  *    The numerator accumulates np·(2·cum_below + nn), an INTEGER per
  *    bucket, so the cross-partition sum is associative and exact
  *    (switch the accumulator to DECIMAL beyond ~1e9 rows).
  *  - `ml_pr_curve`: precision / recall / F1 at every 0.01 score
  *    threshold — descending cumulative TP/FP over ≤ 101 operating
  *    points, totals broadcast, never a per-row pass.
  *  - `ml_calibration_bins`: reliability table over 10 equal-width
  *    score bins — per-bin confidence (integer-scaled deterministic
  *    mean), empirical accuracy, |acc − conf| gap, and bin weight; the
  *    spec folds the rows into ECE.
  *  - `ml_f1_multiclass`: per-class precision / recall / F1 for a
  *    5-class predictor (noisy copy of o_orderpriority: keeps the true
  *    class when u < 0.6, else a hash-rotated one) from one
  *    (true, pred) contingency aggregate — confusion matrix, row and
  *    column marginals, diagonal join, all on the 5-class key space.
  */
object Wave49Ops extends QueryModule {

  /** (o_orderkey, y, score) with the LCG uniform folded in. */
  private def scored(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          .cast("long").as("y"),
        ((col("o_orderkey") * lit(1103515245L) + lit(12345L))
          % lit(2147483647L)).cast("double")./(lit(2147483647.0)).as("u"))
      .withColumn("score",
        (col("u") + col("y").cast("double")) / lit(2.0))

  private val scoredSql: String =
    "sc AS (SELECT o_orderkey, " +
      "CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
      "THEN 1 ELSE 0 END AS BIGINT) AS y, " +
      "CAST((o_orderkey * 1103515245 + 12345) % 2147483647 AS DOUBLE) " +
      "/ 2147483647.0 AS u FROM orders), " +
      "s2 AS (SELECT o_orderkey, y, " +
      "(u + CAST(y AS DOUBLE)) / 2.0 AS score FROM sc)"

  def queries: Seq[Q] = Seq(
    Q(
      "ml_auc_roc",
      (s, dir) => {
        val b = scored(s, dir)
          .groupBy(round(col("score") * 1e6).cast("long").as("si"))
          .agg(sum("y").as("np"),
            (count(lit(1)) - sum("y")).as("nn"))
        val w = Window.orderBy("si")
          .rowsBetween(Window.unboundedPreceding, -1)
        b.withColumn("cb", coalesce(sum("nn").over(w), lit(0L)))
          .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
            sum(col("np") * (lit(2L) * col("cb") + col("nn")))
              .as("num2"))
          .select(col("n_pos"), col("n_neg"),
            dround(col("num2").cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"),
            dround(col("num2").cast("double") /
              (col("n_pos") * col("n_neg")) - lit(1.0), 6).as("gini"))
      },
      Some(
        "WITH " + scoredSql + ", " +
          "b AS (SELECT CAST(round(score * 1e6) AS BIGINT) AS si, " +
          "CAST(sum(y) AS BIGINT) AS np, " +
          "CAST(count(*) - sum(y) AS BIGINT) AS nn " +
          "FROM s2 GROUP BY 1), " +
          "c AS (SELECT si, np, nn, CAST(coalesce(sum(nn) OVER " +
          "(ORDER BY si ROWS BETWEEN UNBOUNDED PRECEDING AND " +
          "1 PRECEDING), 0) AS BIGINT) AS cb FROM b), " +
          "f AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos, " +
          "CAST(sum(nn) AS BIGINT) AS n_neg, " +
          "CAST(sum(np * (2 * cb + nn)) AS BIGINT) AS num2 FROM c) " +
          "SELECT n_pos, n_neg, " +
          droundSql("CAST(num2 AS DOUBLE) / (2.0 * n_pos * n_neg)", 6) +
          " AS auc, " +
          droundSql("CAST(num2 AS DOUBLE) / (n_pos * n_neg) - 1.0", 6) +
          " AS gini FROM f")
    ),
    Q(
      "ml_pr_curve",
      (s, dir) => {
        val b = scored(s, dir)
          .groupBy(round(col("score") * 100).cast("long").as("ti"))
          .agg(sum("y").as("np"),
            (count(lit(1)) - sum("y")).as("nn"))
        val tot = b.agg(sum("np").as("tot_pos"))
        val w = Window.orderBy(col("ti").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        b.withColumn("tp", sum("np").over(w))
          .withColumn("fp", sum("nn").over(w))
          .crossJoin(broadcast(tot))
          .withColumn("prec",
            col("tp").cast("double") / (col("tp") + col("fp")))
          .withColumn("rec", col("tp").cast("double") / col("tot_pos"))
          .select(
            dround(col("ti").cast("double") / 100, 2).as("threshold"),
            col("tp"), col("fp"),
            (col("tot_pos") - col("tp")).as("fn"),
            dround(col("prec"), 6).as("precision"),
            dround(col("rec"), 6).as("recall"),
            dround(when(col("tp") > 0,
              lit(2.0) * col("prec") * col("rec") /
                (col("prec") + col("rec"))).otherwise(0.0), 6).as("f1"))
          .orderBy("threshold")
      },
      Some(
        "WITH " + scoredSql + ", " +
          "b AS (SELECT CAST(round(score * 100) AS BIGINT) AS ti, " +
          "CAST(sum(y) AS BIGINT) AS np, " +
          "CAST(count(*) - sum(y) AS BIGINT) AS nn " +
          "FROM s2 GROUP BY 1), " +
          "t AS (SELECT CAST(sum(np) AS BIGINT) AS tot_pos FROM b), " +
          "c AS (SELECT ti, " +
          "CAST(sum(np) OVER w AS BIGINT) AS tp, " +
          "CAST(sum(nn) OVER w AS BIGINT) AS fp FROM b " +
          "WINDOW w AS (ORDER BY ti DESC ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW)), " +
          "p AS (SELECT ti, tp, fp, tot_pos - tp AS fn, " +
          "CAST(tp AS DOUBLE) / (tp + fp) AS prec, " +
          "CAST(tp AS DOUBLE) / tot_pos AS rec FROM c, t) " +
          "SELECT " + droundSql("CAST(ti AS DOUBLE) / 100", 2) +
          " AS threshold, tp, fp, fn, " +
          droundSql("prec", 6) + " AS precision, " +
          droundSql("rec", 6) + " AS recall, " +
          droundSql("CASE WHEN tp > 0 THEN 2.0 * prec * rec / " +
            "(prec + rec) ELSE 0.0 END", 6) + " AS f1 " +
          "FROM p ORDER BY threshold")
    ),
    Q(
      "ml_calibration_bins",
      (s, dir) => {
        val tot = scored(s, dir).agg(count(lit(1)).as("nn"))
        scored(s, dir)
          .groupBy(least(floor(col("score") * 10).cast("long"), lit(9L))
            .as("bin"))
          .agg(count(lit(1)).as("n"), sum("y").as("k"),
            sum(round(col("score") * 1e8).cast("long")).as("ssum"))
          .crossJoin(broadcast(tot))
          .withColumn("conf",
            col("ssum").cast("double") / col("n") / 1e8)
          .withColumn("acc", col("k").cast("double") / col("n"))
          .select(col("bin"), col("n"),
            dround(col("n").cast("double") / col("nn"), 6).as("weight"),
            dround(col("conf"), 6).as("conf"),
            dround(col("acc"), 6).as("acc"),
            dround(abs(col("acc") - col("conf")), 6).as("gap"))
          .orderBy("bin")
      },
      Some(
        "WITH " + scoredSql + ", " +
          "t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM s2), " +
          "b AS (SELECT CAST(least(CAST(floor(score * 10) AS BIGINT), " +
          "9) AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS k, " +
          "CAST(sum(CAST(round(score * 1e8) AS BIGINT)) AS BIGINT) " +
          "AS ssum FROM s2 GROUP BY 1), " +
          "c AS (SELECT bin, n, nn, " +
          "CAST(ssum AS DOUBLE) / n / 1e8 AS conf, " +
          "CAST(k AS DOUBLE) / n AS acc FROM b, t) " +
          "SELECT bin, n, " +
          droundSql("CAST(n AS DOUBLE) / nn", 6) + " AS weight, " +
          droundSql("conf", 6) + " AS conf, " +
          droundSql("acc", 6) + " AS acc, " +
          droundSql("abs(acc - conf)", 6) + " AS gap " +
          "FROM c ORDER BY bin")
    ),
    Q(
      "ml_f1_multiclass",
      (s, dir) => {
        val m = ((col("u") * 1000).cast("long") % 5).cast("int")
        val byM = when(m === 0, "1-URGENT").when(m === 1, "2-HIGH")
          .when(m === 2, "3-MEDIUM").when(m === 3, "4-NOT SPECIFIED")
          .otherwise("5-LOW")
        val tp0 = T(s, dir, "orders")
          .select(col("o_orderpriority").as("t"),
            ((col("o_orderkey") * lit(1103515245L) + lit(12345L))
              % lit(2147483647L)).cast("double")
              ./(lit(2147483647.0)).as("u"))
          .select(col("t"), when(col("u") < 0.6, col("t"))
            .otherwise(byM).as("p"))
        val conf = tp0.groupBy("t", "p").agg(count(lit(1)).as("c"))
        val byTrue = conf.groupBy(col("t").as("cls"))
          .agg(sum("c").as("n_true"))
        val byPred = conf.groupBy(col("p").as("cls"))
          .agg(sum("c").as("n_pred"))
        val diag = conf.filter(col("t") === col("p"))
          .select(col("t").as("cls"), col("c").as("tp"))
        byTrue.join(byPred, Seq("cls"), "full_outer")
          .join(diag, Seq("cls"), "left_outer")
          .select(col("cls"),
            coalesce(col("n_true"), lit(0L)).as("n_true"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"),
            coalesce(col("tp"), lit(0L)).as("tp"))
          .withColumn("prec", when(col("n_pred") > 0,
            col("tp").cast("double") / col("n_pred")).otherwise(0.0))
          .withColumn("rec", when(col("n_true") > 0,
            col("tp").cast("double") / col("n_true")).otherwise(0.0))
          .select(col("cls"), col("n_true"), col("n_pred"), col("tp"),
            dround(col("prec"), 6).as("precision"),
            dround(col("rec"), 6).as("recall"),
            dround(when(col("tp") > 0,
              lit(2.0) * col("prec") * col("rec") /
                (col("prec") + col("rec"))).otherwise(0.0), 6).as("f1"))
          .orderBy("cls")
      },
      Some(
        "WITH r AS (SELECT o_orderpriority AS t, " +
          "CAST((o_orderkey * 1103515245 + 12345) % 2147483647 " +
          "AS DOUBLE) / 2147483647.0 AS u FROM orders), " +
          "tp0 AS (SELECT t, CASE WHEN u < 0.6 THEN t ELSE " +
          "CASE CAST(floor(u * 1000) AS BIGINT) % 5 " +
          "WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH' " +
          "WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED' " +
          "ELSE '5-LOW' END END AS p FROM r), " +
          "conf AS (SELECT t, p, CAST(count(*) AS BIGINT) AS c " +
          "FROM tp0 GROUP BY 1, 2), " +
          "bt AS (SELECT t AS cls, CAST(sum(c) AS BIGINT) AS n_true " +
          "FROM conf GROUP BY 1), " +
          "bp AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS n_pred " +
          "FROM conf GROUP BY 1), " +
          "dg AS (SELECT t AS cls, c AS tp FROM conf WHERE t = p), " +
          "j AS (SELECT coalesce(bt.cls, bp.cls) AS cls, " +
          "coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) " +
          "AS n_pred, coalesce(tp, 0) AS tp " +
          "FROM bt FULL OUTER JOIN bp ON bt.cls = bp.cls " +
          "LEFT JOIN dg ON coalesce(bt.cls, bp.cls) = dg.cls), " +
          "f AS (SELECT cls, n_true, n_pred, tp, " +
          "CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred " +
          "ELSE 0.0 END AS prec, " +
          "CASE WHEN n_true > 0 THEN CAST(tp AS DOUBLE) / n_true " +
          "ELSE 0.0 END AS rec FROM j) " +
          "SELECT cls, n_true, n_pred, tp, " +
          droundSql("prec", 6) + " AS precision, " +
          droundSql("rec", 6) + " AS recall, " +
          droundSql("CASE WHEN tp > 0 THEN 2.0 * prec * rec / " +
            "(prec + rec) ELSE 0.0 END", 6) + " AS f1 " +
          "FROM f ORDER BY cls")
    )
  )
}
