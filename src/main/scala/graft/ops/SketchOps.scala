package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators, wave 2: count-min frequency estimation and
  * bloom-filter membership pruning (joining agg_hll_sketch in Extras).
  *
  * Why these matter at 100 TB: all three summaries are constant-size,
  * associative partials — each executor folds its partition into a few KB,
  * the exchange moves sketches instead of rows, and the merge is
  * order-insensitive (counter adds / bit ORs), so results are identical
  * under any partition layout. Bloom pruning is the manual form of what
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects automatically
  * for selective joins.
  *
  * No oracles (sketch internals aren't SQL); SketchSpec pins estimates
  * against exact answers: CMS never undercounts and overcounts within
  * eps*N; bloom has zero false negatives and bounded false positives.
  */
object SketchOps extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "agg_countmin",
      // Count-min frequency sketch of event_type built distributed
      // (fixed seed — deterministic), probed per distinct key next to the
      // exact counts. est >= exact always; overflow bounded by eps*N.
      (s, dir) => {
        val ev = T(s, dir, "events")
        val sk = ev.agg(
          expr("count_min_sketch(event_type, 0.0001d, 0.99d, 42)")
            .as("cms"))
        // groupBy keeps null keys; estimateCount(null) would throw AND the
        // sketch build skips nulls, so a null group can't satisfy the
        // est >= exact invariant — exclude it from the probe entirely
        val est = udf((cms: Array[Byte], key: String) =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(cms))
            .estimateCount(key))
        ev.filter(col("event_type").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("exact_cnt"))
          .join(broadcast(sk))
          .select(col("event_type"), col("exact_cnt"),
            est(col("cms"), col("event_type")).as("est_cnt"))
          .orderBy("event_type")
      },
      None
    ),
    Q(
      "agg_bloom_prune",
      // Bloom-filter semi-join pruning: build a bloom over BUILDING
      // customers' keys, pre-filter orders with might_contain, and report
      // the funnel: total orders, bloom-passed, exactly-matched. At scale
      // the bloom broadcast replaces a full shuffle of the fact side.
      (s, dir) => {
        val building = T(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        // public builder API (bloom_filter_agg is not SQL-registered);
        // the build is a distributed treeAggregate, the merge bit-ORs —
        // order-insensitive, so the filter bytes are deterministic
        val bf = building.stat.bloomFilter("c_custkey", 50000L, 0.02)
        val mightContain = udf((k: Long) => bf.mightContainLong(k))
        val orders = T(s, dir, "orders")
        val passed = orders.filter(mightContain(col("o_custkey")))
        val exact = orders.join(building,
          col("o_custkey") === col("c_custkey"), "left_semi")
        passed.agg(count(lit(1)).cast("long").as("bloom_passed"))
          .join(broadcast(
            orders.agg(count(lit(1)).cast("long").as("total_orders"))))
          .join(broadcast(
            exact.agg(count(lit(1)).cast("long").as("exact_matched"))))
          .select("total_orders", "bloom_passed", "exact_matched")
      },
      None
    ),
    Q(
      "agg_approx_quantile",
      // approx_percentile (positional-index sketch) next to the exact
      // percentile, per order status. The accuracy parameter (10000)
      // makes the sketch exact below 10k rows per group and bounded-error
      // above — SketchSpec asserts the deltas.
      (s, dir) =>
        T(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            expr("approx_percentile(o_totalprice, array(0.5D, 0.95D), 10000)")
              .as("apx"),
            expr("percentile(o_totalprice, array(0.5D, 0.95D))").as("ext"))
          .select(col("o_orderstatus"),
            round(element_at(col("apx"), 1), 4).as("apx_p50"),
            round(element_at(col("apx"), 2), 4).as("apx_p95"),
            round(element_at(col("ext"), 1), 4).as("ext_p50"),
            round(element_at(col("ext"), 2), 4).as("ext_p95"))
          .orderBy("o_orderstatus"),
      None
    )
  )
}
