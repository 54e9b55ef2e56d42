package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 51: distributed model TRAINING primitives — the
  * one-pass / sufficient-statistics shapes that train classical models
  * on a cluster without any per-row iteration.
  *
  *  - `ml_ols_normal_eq`: 2-feature + intercept ordinary least squares
  *    on orders (value ~ #lineitems + total quantity) via the normal
  *    equations: ONE aggregate collects the ten integer sufficient
  *    statistics (Σx, Σx², Σxy — exact, associative), then Cramer's
  *    rule solves the 3×3 system in closed-form double arithmetic and
  *    R² falls out of the same statistics (no second data pass). This
  *    is the canonical "train a linear model at 100 TB in one shuffle"
  *    recipe; the statistics stay int64 to ~1e9 rows (then DECIMAL).
  *  - `ml_naive_bayes`: multinomial Naive Bayes trained on an 80% LCG
  *    split of documents and scored on the 20% holdout: token-count
  *    model with Laplace smoothing, log-scores integer-scaled at 1e6
  *    per token term so the per-doc sums are associative; the per-doc
  *    argmax is a row_number window PARTITIONED by doc. Every stage is
  *    a keyed shuffle (tok or doc) — the textbook distributed-NB
  *    dataflow. The target is a text-derived two-class label (docs
  *    where query-engine tokens outnumber business tokens), because
  *    the synthetic corpus draws every lang/source from ONE shared
  *    token distribution — lang is provably unlearnable from unigrams
  *    here, and a fixture must have signal for accuracy to mean
  *    anything. Reports per-class holdout accuracy.
  *  - `ml_kfold_stratified`: deterministic stratified 5-fold
  *    assignment — md5-ranked row_number within each lang partition,
  *    fold = rank mod 5, so folds are exactly balanced per stratum
  *    (±1) and reproducible across engines/runs.
  *  - `ml_feature_hash_audit`: the hashing-trick collision audit —
  *    hash the corpus vocabulary into 256 md5-prefix buckets and
  *    report load factor / max load / token collision rate, the
  *    numbers that decide a hashed-feature dimensionality before
  *    training.
  */
object Wave51Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ml_ols_normal_eq",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("okey"))
          .agg(count(lit(1)).as("x1"),
            sum(col("l_quantity").cast("long")).as("x2"))
        val rows = T(s, dir, "orders")
          .select(col("o_orderkey").as("okey"),
            round(col("o_totalprice")).cast("long").as("y"))
          .join(li, Seq("okey"))
        val st = rows.agg(
          count(lit(1)).as("n"), sum("x1").as("sx1"),
          sum("x2").as("sx2"), sum(col("x1") * col("x1")).as("sx11"),
          sum(col("x1") * col("x2")).as("sx12"),
          sum(col("x2") * col("x2")).as("sx22"), sum("y").as("sy"),
          sum(col("x1") * col("y")).as("sx1y"),
          sum(col("x2") * col("y")).as("sx2y"),
          sum(col("y") * col("y")).as("syy"))
        val n = col("n").cast("double"); val sx1 = col("sx1").cast("double")
        val sx2 = col("sx2").cast("double")
        val sx11 = col("sx11").cast("double")
        val sx12 = col("sx12").cast("double")
        val sx22 = col("sx22").cast("double")
        val sy = col("sy").cast("double")
        val sx1y = col("sx1y").cast("double")
        val sx2y = col("sx2y").cast("double")
        val syy = col("syy").cast("double")
        val det = n * (sx11 * sx22 - sx12 * sx12) -
          sx1 * (sx1 * sx22 - sx12 * sx2) +
          sx2 * (sx1 * sx12 - sx11 * sx2)
        val d0 = sy * (sx11 * sx22 - sx12 * sx12) -
          sx1 * (sx1y * sx22 - sx12 * sx2y) +
          sx2 * (sx1y * sx12 - sx11 * sx2y)
        val d1 = n * (sx1y * sx22 - sx12 * sx2y) -
          sy * (sx1 * sx22 - sx12 * sx2) +
          sx2 * (sx1 * sx2y - sx1y * sx2)
        val d2 = n * (sx11 * sx2y - sx1y * sx12) -
          sx1 * (sx1 * sx2y - sx1y * sx2) +
          sy * (sx1 * sx12 - sx11 * sx2)
        val b0 = d0 / det; val b1 = d1 / det; val b2 = d2 / det
        val r2 = (b0 * sy + b1 * sx1y + b2 * sx2y - sy * sy / n) /
          (syy - sy * sy / n)
        st.select(col("n"), dround(b0, 4).as("beta0"),
          dround(b1, 4).as("beta1"), dround(b2, 4).as("beta2"),
          dround(r2, 6).as("r2"))
      },
      Some(
        "WITH li AS (SELECT l_orderkey AS okey, " +
          "CAST(count(*) AS BIGINT) AS x1, " +
          "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2 " +
          "FROM lineitem GROUP BY 1), " +
          "rows_ AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS y, " +
          "x1, x2 FROM orders JOIN li ON o_orderkey = okey), " +
          "st AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(x1) AS BIGINT) AS sx1, " +
          "CAST(sum(x2) AS BIGINT) AS sx2, " +
          "CAST(sum(x1 * x1) AS BIGINT) AS sx11, " +
          "CAST(sum(x1 * x2) AS BIGINT) AS sx12, " +
          "CAST(sum(x2 * x2) AS BIGINT) AS sx22, " +
          "CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(x1 * y) AS BIGINT) AS sx1y, " +
          "CAST(sum(x2 * y) AS BIGINT) AS sx2y, " +
          "CAST(sum(y * y) AS BIGINT) AS syy FROM rows_), " +
          "d AS (SELECT CAST(n AS DOUBLE) AS n, " +
          "CAST(sx1 AS DOUBLE) AS sx1, CAST(sx2 AS DOUBLE) AS sx2, " +
          "CAST(sx11 AS DOUBLE) AS sx11, CAST(sx12 AS DOUBLE) AS sx12, " +
          "CAST(sx22 AS DOUBLE) AS sx22, CAST(sy AS DOUBLE) AS sy, " +
          "CAST(sx1y AS DOUBLE) AS sx1y, CAST(sx2y AS DOUBLE) AS sx2y, " +
          "CAST(syy AS DOUBLE) AS syy, st.n AS n_rows FROM st), " +
          "k AS (SELECT n_rows, n, sy, sx1y, sx2y, syy, " +
          "(n * (sx11 * sx22 - sx12 * sx12) - " +
          "sx1 * (sx1 * sx22 - sx12 * sx2) + " +
          "sx2 * (sx1 * sx12 - sx11 * sx2)) AS det, " +
          "(sy * (sx11 * sx22 - sx12 * sx12) - " +
          "sx1 * (sx1y * sx22 - sx12 * sx2y) + " +
          "sx2 * (sx1y * sx12 - sx11 * sx2y)) AS d0, " +
          "(n * (sx1y * sx22 - sx12 * sx2y) - " +
          "sy * (sx1 * sx22 - sx12 * sx2) + " +
          "sx2 * (sx1 * sx2y - sx1y * sx2)) AS d1, " +
          "(n * (sx11 * sx2y - sx1y * sx12) - " +
          "sx1 * (sx1 * sx2y - sx1y * sx2) + " +
          "sy * (sx1 * sx12 - sx11 * sx2)) AS d2 FROM d) " +
          "SELECT n_rows AS n, " +
          droundSql("d0 / det", 4) + " AS beta0, " +
          droundSql("d1 / det", 4) + " AS beta1, " +
          droundSql("d2 / det", 4) + " AS beta2, " +
          droundSql("((d0 / det) * sy + (d1 / det) * sx1y + " +
            "(d2 / det) * sx2y - sy * sy / n) / (syy - sy * sy / n)",
            6) + " AS r2 FROM k")
    ),
    Q(
      "ml_naive_bayes",
      (s, dir) => {
        val docs = T(s, dir, "documents")
          .withColumn("u",
            ((col("doc_id") * lit(1103515245L) + lit(12345L))
              % lit(2147483647L)).cast("double") / lit(2147483647.0))
          .withColumn("is_train", col("u") < 0.8)
          .withColumn("label", expr(
            "CASE WHEN size(filter(split(text, ' '), x -> x IN " +
              "('spark', 'query', 'hash', 'scan', 'vector'))) > " +
              "size(filter(split(text, ' '), x -> x IN " +
              "('customer', 'order', 'merge', 'batch', 'data'))) " +
              "THEN 'alpha' ELSE 'beta' END"))
        val trainTok = docs.filter(col("is_train"))
          .select(col("label"), explode(split(col("text"), " ")).as("tok"))
        val cnt = trainTok.groupBy("label", "tok")
          .agg(count(lit(1)).as("c"))
        val clsTot = cnt.groupBy("label").agg(sum("c").as("tot"))
        val vocab = trainTok.agg(countDistinct("tok").as("v"))
        val priors = docs.filter(col("is_train"))
          .groupBy("label").agg(count(lit(1)).as("nd"))
        val prTot = priors.agg(sum("nd").as("ndtot"))
        val classes = clsTot.join(priors, Seq("label"))
          .crossJoin(broadcast(vocab)).crossJoin(broadcast(prTot))
          .select(col("label").as("hyp"), col("tot"), col("v"),
            round(log(col("nd").cast("double") / col("ndtot")) * 1e6)
              .cast("long").as("prior_s"))
        val testTf = docs.filter(!col("is_train"))
          .select(col("doc_id"), col("label").as("true_label"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "true_label", "tok")
          .agg(count(lit(1)).as("tf"))
        val scoredTerms = testTf.crossJoin(broadcast(classes))
          .join(cnt.withColumnRenamed("label", "hyp"), Seq("hyp", "tok"),
            "left_outer")
          .withColumn("term",
            round(col("tf") * log(
              (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
                (col("tot") + col("v"))) * 1e6).cast("long"))
        val perDocCls = scoredTerms
          .groupBy("doc_id", "true_label", "hyp")
          .agg((sum("term") + first("prior_s")).as("score"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("hyp"))
        val preds = perDocCls
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("true_label"),
            col("hyp").as("pred_label"))
        preds.groupBy(col("true_label").as("label"))
          .agg(count(lit(1)).as("n_test"),
            sum((col("true_label") === col("pred_label")).cast("long"))
              .as("n_correct"))
          .select(col("label"), col("n_test"), col("n_correct"),
            dround(col("n_correct").cast("double") / col("n_test"), 6)
              .as("accuracy"))
          .orderBy("label")
      },
      Some(
        "WITH docs AS (SELECT doc_id, text, " +
          "CAST((doc_id * 1103515245 + 12345) % 2147483647 AS DOUBLE) " +
          "/ 2147483647.0 < 0.8 AS is_train, " +
          "CASE WHEN len(list_filter(string_split(text, ' '), " +
          "x -> x IN ('spark', 'query', 'hash', 'scan', 'vector'))) > " +
          "len(list_filter(string_split(text, ' '), " +
          "x -> x IN ('customer', 'order', 'merge', 'batch', 'data'))) " +
          "THEN 'alpha' ELSE 'beta' END AS label FROM documents), " +
          "tt AS (SELECT label, unnest(string_split(text, ' ')) AS tok " +
          "FROM docs WHERE is_train), " +
          "cnt AS (SELECT label, tok, CAST(count(*) AS BIGINT) AS c " +
          "FROM tt GROUP BY 1, 2), " +
          "lt AS (SELECT label, CAST(sum(c) AS BIGINT) AS tot " +
          "FROM cnt GROUP BY 1), " +
          "vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v " +
          "FROM tt), " +
          "pr AS (SELECT label, CAST(count(*) AS BIGINT) AS nd " +
          "FROM docs WHERE is_train GROUP BY 1), " +
          "pt AS (SELECT CAST(sum(nd) AS BIGINT) AS ndtot FROM pr), " +
          "cls AS (SELECT lt.label AS hyp, tot, v, " +
          "CAST(round(ln(CAST(nd AS DOUBLE) / ndtot) * 1e6) AS BIGINT) " +
          "AS prior_s FROM lt JOIN pr ON lt.label = pr.label, vv, pt), " +
          "ttf AS (SELECT doc_id, label AS true_label, tok, " +
          "CAST(count(*) AS BIGINT) AS tf FROM (SELECT doc_id, label, " +
          "unnest(string_split(text, ' ')) AS tok FROM docs " +
          "WHERE NOT is_train) GROUP BY 1, 2, 3), " +
          "terms AS (SELECT ttf.doc_id, ttf.true_label, cls.hyp, " +
          "cls.prior_s, CAST(round(ttf.tf * " +
          "ln(CAST(coalesce(cnt.c, 0) + 1 AS DOUBLE) / " +
          "(cls.tot + cls.v)) * 1e6) AS BIGINT) AS term " +
          "FROM ttf CROSS JOIN cls LEFT JOIN cnt " +
          "ON cnt.label = cls.hyp AND cnt.tok = ttf.tok), " +
          "pdl AS (SELECT doc_id, true_label, hyp, " +
          "CAST(sum(term) + any_value(prior_s) AS BIGINT) AS score " +
          "FROM terms GROUP BY 1, 2, 3), " +
          "preds AS (SELECT doc_id, true_label, hyp AS pred_label " +
          "FROM (SELECT *, row_number() OVER (PARTITION BY doc_id " +
          "ORDER BY score DESC, hyp) AS rn FROM pdl) WHERE rn = 1) " +
          "SELECT true_label AS label, CAST(count(*) AS BIGINT) " +
          "AS n_test, CAST(sum(CASE WHEN true_label = pred_label " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_correct, " +
          droundSql("CAST(sum(CASE WHEN true_label = pred_label THEN 1 " +
            "ELSE 0 END) AS DOUBLE) / count(*)", 6) + " AS accuracy " +
          "FROM preds GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "ml_kfold_stratified",
      (s, dir) => {
        val w = Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        val folded = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
          .withColumn("fold", (row_number().over(w) - 1) % 5)
        val tot = folded.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        folded.groupBy("lang", "fold").agg(count(lit(1)).as("n"))
          .join(broadcast(tot), Seq("lang"))
          .select(col("lang"), col("fold").cast("long").as("fold"),
            col("n"),
            dround(col("n").cast("double") / col("n_lang"), 6)
              .as("share"))
          .orderBy("lang", "fold")
      },
      Some(
        "WITH f AS (SELECT lang, ((row_number() OVER (PARTITION BY " +
          "lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)) - 1) " +
          "% 5 AS fold FROM documents), " +
          "t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang " +
          "FROM f GROUP BY 1) " +
          "SELECT f.lang, CAST(fold AS BIGINT) AS fold, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          droundSql("CAST(count(*) AS DOUBLE) / any_value(n_lang)", 6) +
          " AS share FROM f JOIN t ON f.lang = t.lang " +
          "GROUP BY f.lang, fold ORDER BY f.lang, fold")
    ),
    Q(
      "ml_feature_hash_audit",
      (s, dir) => {
        val vocab = T(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .distinct()
          .withColumn("bucket", substring(md5(col("tok")), 1, 2))
        val perBucket = vocab.groupBy("bucket")
          .agg(count(lit(1)).as("load"))
        perBucket.agg(
            sum("load").as("n_tokens"),
            count(lit(1)).as("n_buckets"),
            max("load").as("max_load"),
            sum((col("load") === 1).cast("long")).as("n_solo"))
          .select(col("n_tokens"), col("n_buckets"), col("max_load"),
            dround(col("n_tokens").cast("double") / col("n_buckets"), 4)
              .as("avg_load"),
            dround((col("n_tokens") - col("n_solo")).cast("double") /
              col("n_tokens"), 6).as("collision_rate"))
      },
      Some(
        "WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) " +
          "AS tok FROM documents), " +
          "b AS (SELECT substring(md5(tok), 1, 2) AS bucket, " +
          "CAST(count(*) AS BIGINT) AS load FROM v GROUP BY 1) " +
          "SELECT CAST(sum(load) AS BIGINT) AS n_tokens, " +
          "CAST(count(*) AS BIGINT) AS n_buckets, " +
          "CAST(max(load) AS BIGINT) AS max_load, " +
          droundSql("CAST(sum(load) AS DOUBLE) / count(*)", 4) +
          " AS avg_load, " +
          droundSql("CAST(sum(load) - sum(CASE WHEN load = 1 THEN 1 " +
            "ELSE 0 END) AS DOUBLE) / sum(load)", 6) +
          " AS collision_rate FROM b")
    )
  )
}
