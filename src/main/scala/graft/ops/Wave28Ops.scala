package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 28: classical decomposition, quality-aware dedup
  * canonicalization, plan caching, and diversity reranking.
  *
  *  - `ts_stl_decompose` is the classical additive decomposition
  *    (trend = centered 25-hour moving average, seasonal = hour-of-day
  *    mean of the detrended series, residual = remainder) — `ts_seasonal`
  *    only profiles the seasonal component; this emits the full
  *    y = T + S + R per hour. All three components are exact-integer
  *    sums divided by counts (order-free), rounded once at the edge;
  *    the plan is two window passes + one broadcast-joined profile —
  *    one shuffle on the series key family at scale.
  *  - `data_dedup_canonical` upgrades `text_dedup_keep` from keep-lowest-id
  *    to keep-BEST: the keeper of each content-fingerprint group is the
  *    longest document (tie → lower id) — the CCNet/RefinedWeb rule that
  *    dedup should keep the most complete copy. Same single fingerprint
  *    pass + one window rank; the quality signal rides the rank order,
  *    no extra join.
  *  - `sql_cache_table` pins the CACHE TABLE surface: the cached relation
  *    plans as InMemoryRelation (asserted in-op) and serves repeated
  *    queries without re-scanning — the interactive-notebook idiom. The
  *    cache is dropped before returning (UNCACHE) so the op leaves no
  *    session residue.
  *  - `vec_rerank_mmr` is Maximal-Marginal-Relevance reranking — the
  *    diversity pass every retrieval pipeline runs AFTER top-k: greedily
  *    pick arg max λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s). Greedy
  *    selection is sequential in k but independent per QUERY, so it runs
  *    inside `mapGroups` keyed by query — the same
  *    parallel-across-series shape as the RC recurrences (spec-checked:
  *    pure-Scala replay; not SQL-expressible without k nested joins).
  */
object Wave28Ops extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "ts_stl_decompose",
      // The centered moving average is RANGE semantics over hour index
      // (±12 HOURS, not ±12 rows — identical only on a gap-free spine).
      // Spark computes it WITHOUT a global single-partition window: each
      // hourly row expands to its 25 target hours (map-side ×25), a hash
      // aggregate sums contributions per target, and an inner join back
      // to the spine keeps real hours — at 100 TB that's two partial-agg
      // shuffles instead of one unpartitionable total order. The oracle
      // states the same value as a RANGE window (tiny in DuckDB).
      (s, dir) => {
        val hourly = T(s, dir, "events")
          .groupBy(
            (unix_timestamp(date_trunc("hour", col("ts")).cast("timestamp"))
              / 3600L).cast("long").as("hb"))
          .agg(sum(round(col("value") * 100).cast("long")).as("yc"))
          .persist()
        val contrib = hourly
          .select(col("yc"),
            explode(sequence(col("hb") - 12, col("hb") + 12)).as("hb"))
          .groupBy("hb")
          .agg(sum("yc").as("tsum"), count(lit(1)).as("tcnt"))
        val detr = hourly.join(contrib, "hb")
          .withColumn("trend_c", col("tsum").cast("double") / col("tcnt"))
          .withColumn("hod", pmod(col("hb"), lit(24L)))
        val seasonal = detr
          .groupBy("hod")
          .agg((sum(round(col("yc") - col("trend_c")).cast("long"))
            .cast("double") / count(lit(1))).as("seas_c"))
        val out = detr.join(broadcast(seasonal), "hod")
          .select(
            timestamp_seconds(col("hb") * 3600L).cast("timestamp_ntz")
              .as("h"),
            (col("yc").cast("double") / 100).as("y"),
            dround(col("trend_c") / 100, 4).as("trend"),
            dround(col("seas_c") / 100, 4).as("seasonal"),
            dround((col("yc") - col("trend_c") - col("seas_c")) / 100, 4)
              .as("resid"))
        // snapshot the |hours|-row result eagerly so the spine cache is
        // released before returning (no leaked InMemoryRelation)
        val snap = out.localCheckpoint(true)
        hourly.unpersist()
        snap.orderBy("h")
      },
      Some(
        "WITH hourly AS (SELECT " +
          "CAST(floor(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) " +
          "AS BIGINT) // 3600 AS hb, " +
          "sum(CAST(round(value * 100) AS BIGINT)) AS yc " +
          "FROM events GROUP BY 1), " +
          "detr AS (SELECT hb, yc, " +
          "CAST(sum(yc) OVER w AS DOUBLE) / count(*) OVER w AS trend_c, " +
          "hb % 24 AS hod FROM hourly " +
          "WINDOW w AS (ORDER BY hb RANGE BETWEEN 12 PRECEDING " +
          "AND 12 FOLLOWING)), " +
          "seas AS (SELECT hod, " +
          "CAST(sum(CAST(round(yc - trend_c) AS BIGINT)) AS DOUBLE) " +
          "/ count(*) AS seas_c FROM detr GROUP BY hod) " +
          // tz-free reconstruction: naive epoch + interval, never through
          // DuckDB's TIMESTAMPTZ (session-zone dependent)
          "SELECT TIMESTAMP '1970-01-01' + (d.hb * 3600) * INTERVAL 1 SECOND AS h, " +
          "CAST(d.yc AS DOUBLE) / 100 AS y, " +
          droundSql("d.trend_c / 100", 4) + " AS trend, " +
          droundSql("s.seas_c / 100", 4) + " AS seasonal, " +
          droundSql("(d.yc - d.trend_c - s.seas_c) / 100", 4) + " AS resid " +
          "FROM detr d JOIN seas s ON d.hod = s.hod ORDER BY h")
    ),
    Q(
      "data_dedup_canonical",
      (s, dir) => {
        val w = Window.partitionBy("fp")
          .orderBy(col("len").desc, col("doc_id"))
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("len"),
            md5(concat_ws(" ",
              array_sort(array_distinct(split(col("text"), " ")))))
              .as("fp"))
          .withColumn("keep", row_number().over(w) === 1)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("keep"), col("len")).otherwise(0L))
              .as("kept_chars"),
            sum(when(col("keep"), 0L).otherwise(col("len")))
              .as("dropped_chars"))
          .orderBy("lang")
      },
      Some(
        "WITH f AS (SELECT doc_id, lang, " +
          "CAST(length(text) AS BIGINT) AS len, " +
          "md5(array_to_string(list_sort(list_distinct(" +
          "string_split(text, ' '))), ' ')) AS fp FROM documents), " +
          "r AS (SELECT lang, len, row_number() OVER (" +
          "PARTITION BY fp ORDER BY len DESC, doc_id) = 1 AS keep FROM f) " +
          "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
          "CAST(sum(CASE WHEN keep THEN len ELSE 0 END) AS BIGINT) " +
          "AS kept_chars, " +
          "CAST(sum(CASE WHEN keep THEN 0 ELSE len END) AS BIGINT) " +
          "AS dropped_chars " +
          "FROM r GROUP BY lang ORDER BY lang")
    ),
    Q(
      "sql_cache_table",
      (s, dir) => {
        val v = s"ord_cch_${System.nanoTime()}"
        T(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(s"CACHE TABLE $v")
        try {
          val df = s.sql(
            s"SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
              "sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100 " +
              s"AS total FROM $v GROUP BY o_orderstatus " +
              "ORDER BY o_orderstatus")
          val plan = df.queryExecution.executedPlan.toString
          require(plan.contains("InMemory"),
            s"sql_cache_table: cached view must plan as InMemoryRelation:\n$plan")
          df.count() // materialize THROUGH the cache before it drops
          df
        } finally s.sql(s"UNCACHE TABLE $v")
      },
      Some(
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100 AS total " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")
    ),
    Q(
      "vec_rerank_mmr",
      // λ = 0.7, top-20 candidates by cosine per query, greedy-select 5.
      // Queries = the 8 lowest vec_ids, broadcast; candidate scoring is
      // one map-side pass over the embedding table, the greedy loop runs
      // per query inside mapGroups.
      (s, dir) => {
        import s.implicits._
        val all = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Seq[Float])]
        val queries = all.filter(_._1 < 8).collect().toMap
          .map { case (k, v) => k -> v.map(_.toDouble).toArray }
        val qb = s.sparkContext.broadcast(queries)
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
        }
        // partition-local top-20 per query BEFORE the shuffle: top-k is
        // mergeable, so only |partitions|×20 candidate rows (not the
        // whole table's embeddings) reach each query's group
        all.mapPartitions { rows =>
            val acc = scala.collection.mutable.Map.empty[Long,
              scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Double], Double)]]
            rows.foreach { case (id, emb) =>
              val e = emb.map(_.toDouble).toArray
              qb.value.foreach { case (qid, q) =>
                if (qid != id) {
                  val buf = acc.getOrElseUpdate(qid,
                    scala.collection.mutable.ArrayBuffer.empty)
                  buf += ((qid, id, e, cos(q, e)))
                  if (buf.length > 40) {
                    val keep = buf.sortBy(c => (-c._4, c._2)).take(20)
                    buf.clear(); buf ++= keep
                  }
                }
              }
            }
            acc.valuesIterator.flatMap(
              _.sortBy(c => (-c._4, c._2)).take(20))
          }
          .groupByKey(_._1)
          .flatMapGroups { (qid, it) =>
            val cand = it.toSeq.sortBy(c => (-c._4, c._2)).take(20)
            val sel = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Array[Double], Double)]
            while (sel.length < 5 && sel.length < cand.length) {
              val pick = cand.filterNot(c => sel.exists(_._2 == c._2))
                .maxBy { c =>
                  val div =
                    if (sel.isEmpty) 0.0
                    else sel.map(sc => cos(c._3, sc._3)).max
                  // deterministic argmax: score first, then LOWER id wins
                  (0.7 * c._4 - 0.3 * div, -c._2.toDouble)
                }
              sel += pick
            }
            sel.zipWithIndex.map { case ((_, id, _, rel), rank) =>
              (qid, rank.toLong, id,
                BigDecimal(rel).setScale(6,
                  BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
          .toDF("query_id", "rank", "vec_id", "cosine")
          .orderBy("query_id", "rank")
      },
      None
    )
  )
}
