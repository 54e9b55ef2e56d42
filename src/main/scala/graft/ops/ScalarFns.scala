package graft.ops

import graft.{Q, QueryModule, T}
import graft.Det._
import org.apache.spark.sql.functions._

/** SURVEY §2.7 — scalar function families (string/date/math/array/json/
  * case-cast). All built-in `org.apache.spark.sql.functions` — fully
  * codegen'd, no UDFs, so every query stays inside one WholeStageCodegen
  * span over the scan.
  *
  * Dialect parity notes (binding — mirrored in the oracle SQL):
  *  - Spark `weekday` is Monday=0; DuckDB `isodow` is Monday=1 → emit
  *    `weekday+1`.
  *  - Spark `floor/ceil(double)` return LONG; DuckDB returns DOUBLE → oracle
  *    casts to BIGINT.
  *  - Spark `CAST(double AS BIGINT)` truncates toward zero; DuckDB CAST
  *    rounds → oracle uses `CAST(trunc(x) AS BIGINT)`.
  *  - Spark `log` is natural log = DuckDB `ln`.
  */
object ScalarFns extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "fn_string",
      (s, dir) =>
        T(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_type")).as("up_type"),
            substring(col("p_name"), 1, 5).as("name5"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            length(col("p_name")).cast("long").as("name_len"),
            trim(col("p_name")).as("trimmed"),
            when(col("p_name").like("%blue%"), lit(1L)).otherwise(lit(0L))
              .as("is_blue"),
            regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
            size(split(col("p_name"), " ")).cast("long").as("n_words"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, upper(p_type) AS up_type, substr(p_name,1,5) AS name5, " +
          "concat_ws('-', p_brand, p_type) AS brand_type, " +
          "CAST(length(p_name) AS BIGINT) AS name_len, trim(p_name) AS trimmed, " +
          "CAST(CASE WHEN p_name LIKE '%blue%' THEN 1 ELSE 0 END AS BIGINT) AS is_blue, " +
          "regexp_extract(p_name, '([a-z]+)', 1) AS first_word, " +
          "CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words " +
          "FROM part ORDER BY p_partkey")
    ),
    Q(
      "fn_date",
      (s, dir) =>
        T(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            quarter(col("o_orderdate")).cast("long").as("qtr"),
            (expr("weekday(o_orderdate)") + 1).cast("long").as("isodow"),
            date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
            datediff(lit("2000-01-01").cast("date"),
              col("o_orderdate").cast("date")).cast("long").as("days_to_y2k"),
            // DuckDB date_trunc('month') yields DATE — match it
            date_trunc("month", col("o_orderdate")).cast("date")
              .as("month_start"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr, " +
          "CAST(month(o_orderdate) AS BIGINT) AS mo, " +
          "CAST(day(o_orderdate) AS BIGINT) AS dom, " +
          "CAST(quarter(o_orderdate) AS BIGINT) AS qtr, " +
          "CAST(date_part('isodow', o_orderdate) AS BIGINT) AS isodow, " +
          "CAST(o_orderdate AS DATE) + 30 AS plus30, " +
          "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') " +
          "AS BIGINT) AS days_to_y2k, " +
          "date_trunc('month', o_orderdate) AS month_start " +
          "FROM orders ORDER BY o_orderkey")
    ),
    Q(
      "fn_math",
      (s, dir) =>
        T(s, dir, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            floor(col("l_extendedprice")).as("price_floor"),
            ceil(col("l_extendedprice")).as("price_ceil"),
            dround(abs(col("l_discount") - lit(0.05)), 6).as("disc_dev"),
            dround(pow(col("l_quantity"), 2), 4).as("qty_sq"),
            dround(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
            dround(log(col("l_extendedprice")), 6).as("price_ln"),
            dround(exp(col("l_discount")), 6).as("disc_exp"))
          .orderBy("l_orderkey", "l_linenumber", "price_floor", "qty_sq",
            "disc_dev"),
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, " +
          "CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, " +
          droundSql("abs(l_discount - 0.05)", 6) + " AS disc_dev, " +
          droundSql("pow(l_quantity, 2)", 4) + " AS qty_sq, " +
          droundSql("sqrt(l_extendedprice)", 6) + " AS price_sqrt, " +
          droundSql("ln(l_extendedprice)", 6) + " AS price_ln, " +
          droundSql("exp(l_discount)", 6) + " AS disc_exp " +
          "FROM lineitem ORDER BY l_orderkey, l_linenumber, price_floor, " +
          "qty_sq, disc_dev")
    ),
    Q(
      "fn_array",
      (s, dir) =>
        T(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            round(expr(
              "aggregate(embedding, CAST(0.0 AS DOUBLE), " +
                "(s, x) -> s + CAST(x AS DOUBLE))"), 4).as("vec_sum"),
            round(element_at(col("embedding"), 1).cast("double"), 6)
              .as("first_elem"),
            round(expr("array_max(embedding)").cast("double"), 6)
              .as("max_elem"),
            round(expr("array_min(embedding)").cast("double"), 6)
              .as("min_elem"),
            // joined scaled-int string, not array<double>: the driver's
            // pandas comparator cannot sort list cells, and double→string
            // formatting differs across engines — scale-to-int first.
            expr("concat_ws(',', transform(slice(embedding, 1, 3), " +
              "x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)))")
              .as("head3"))
          .orderBy("vec_id"),
      Some(
        "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
          "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))),4) AS vec_sum, " +
          "round(CAST(embedding[1] AS DOUBLE),6) AS first_elem, " +
          "round(CAST(list_max(embedding) AS DOUBLE),6) AS max_elem, " +
          "round(CAST(list_min(embedding) AS DOUBLE),6) AS min_elem, " +
          "array_to_string(list_transform(embedding[1:3], " +
          "x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)), ',') AS head3 " +
          "FROM embeddings ORDER BY vec_id")
    ),
    Q(
      "fn_json",
      (s, dir) =>
        T(s, dir, "events")
          .select(
            get_json_object(col("props"), "$.k").cast("long").as("k"),
            col("value"))
          .groupBy((col("k") % 2).as("parity"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("value"), 2).as("sum_val"))
          .orderBy("parity"),
      Some(
        "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 AS parity, " +
          "CAST(count(*) AS BIGINT) AS n, " + dsumSql("value", 2) +
          " AS sum_val FROM events GROUP BY 1 ORDER BY parity")
    ),
    Q(
      "fn_map",
      // map-typed column round trip: build, access, introspect. The oracle
      // states the semantic result (DuckDB's map-access dialect differs);
      // this validates Spark's map ops produce the right VALUES.
      (s, dir) =>
        T(s, dir, "documents")
          .withColumn("m", map(
            lit("chars"), col("n_chars"),
            lit("id"), col("doc_id")))
          .select(
            col("doc_id"),
            element_at(col("m"), "chars").as("chars"),
            size(col("m")).cast("long").as("n_keys"),
            // joined string, not array: driver comparator can't sort lists
            array_join(array_sort(map_keys(col("m"))), "|").as("keys"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, n_chars AS chars, CAST(2 AS BIGINT) AS n_keys, " +
          "'chars|id' AS keys FROM documents ORDER BY doc_id")
    ),
    Q(
      "fn_struct",
      // struct-typed column: build, nest, extract fields
      (s, dir) =>
        T(s, dir, "orders")
          .withColumn("o", struct(
            col("o_orderkey").as("okey"),
            col("o_totalprice").as("price"),
            struct(col("o_orderstatus").as("st")).as("meta")))
          .select(
            col("o.okey").as("okey"),
            col("o.price").as("price"),
            col("o.meta.st").as("status"))
          .orderBy("okey"),
      Some(
        "SELECT o_orderkey AS okey, o_totalprice AS price, " +
          "o_orderstatus AS status FROM orders ORDER BY okey")
    ),
    Q(
      "fn_case_cast",
      (s, dir) =>
        T(s, dir, "customer")
          .select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "negative")
              .when(col("c_acctbal") < 5000, "mid")
              .otherwise("high").as("tier"),
            col("c_acctbal").cast("long").as("bal_int"),
            concat(lit("cust-"), col("c_custkey").cast("string"))
              .as("cust_tag"),
            col("c_nationkey").cast("double").as("nk_d"))
          .orderBy("c_custkey"),
      Some(
        "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'negative' " +
          "WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier, " +
          "CAST(trunc(c_acctbal) AS BIGINT) AS bal_int, " +
          "'cust-' || CAST(c_custkey AS VARCHAR) AS cust_tag, " +
          "CAST(c_nationkey AS DOUBLE) AS nk_d " +
          "FROM customer ORDER BY c_custkey")
    )
  )
}
