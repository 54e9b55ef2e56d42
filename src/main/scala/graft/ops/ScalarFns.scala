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
    ),
    Q(
      "fn_regex",
      // regex family (POSIX-simple patterns shared by both dialects):
      // extract, extract-all count, replace, match-filter
      (s, dir) =>
        T(s, dir, "part")
          .filter(col("p_name").rlike("^[a-z]+ "))
          .select(
            col("p_partkey"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
            size(expr("regexp_extract_all(p_name, '[aeiou]+', 0)"))
              .cast("long").as("n_vowel_runs"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, regexp_extract(p_name, '^([a-z]+)', 1) " +
          "AS first_word, " +
          "CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) " +
          "AS n_vowel_runs, " +
          "regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled " +
          "FROM part WHERE regexp_matches(p_name, '^[a-z]+ ') " +
          "ORDER BY p_partkey")
    ),
    Q(
      "fn_bitwise",
      // bitwise family on integer keys — exact in both engines
      (s, dir) =>
        T(s, dir, "part")
          .select(
            col("p_partkey"),
            (col("p_partkey").bitwiseAND(lit(255L))).as("low8"),
            (col("p_partkey").bitwiseOR(lit(4096L))).as("with_flag"),
            (col("p_partkey").bitwiseXOR(col("p_size").cast("long")))
              .as("mixed"),
            shiftleft(col("p_partkey"), 3).as("shl3"),
            shiftright(col("p_partkey"), 2).as("shr2"),
            bit_count(col("p_partkey")).cast("long").as("popcnt"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, p_partkey & 255 AS low8, " +
          "p_partkey | 4096 AS with_flag, " +
          "xor(p_partkey, CAST(p_size AS BIGINT)) AS mixed, " +
          "p_partkey << 3 AS shl3, p_partkey >> 2 AS shr2, " +
          "CAST(bit_count(p_partkey) AS BIGINT) AS popcnt " +
          "FROM part ORDER BY p_partkey")
    ),
    Q(
      "fn_string2",
      // second string family: padding, translate, repeat, reverse, and
      // an edit-distance (levenshtein) against a fixed probe
      (s, dir) =>
        T(s, dir, "part")
          .select(
            col("p_partkey"),
            lpad(col("p_type"), 10, ".").as("padded"),
            translate(col("p_name"), "aeiou", "AEIOU").as("shouted"),
            reverse(col("p_name")).as("backwards"),
            expr("repeat(substr(p_type, 1, 2), 2)").as("twice"),
            levenshtein(col("p_name"), lit("large widget")).cast("long")
              .as("dist_to_probe"))
          .orderBy("p_partkey"),
      Some(
        "SELECT p_partkey, lpad(p_type, 10, '.') AS padded, " +
          "translate(p_name, 'aeiou', 'AEIOU') AS shouted, " +
          "reverse(p_name) AS backwards, " +
          "repeat(substr(p_type, 1, 2), 2) AS twice, " +
          "CAST(levenshtein(p_name, 'large widget') AS BIGINT) " +
          "AS dist_to_probe FROM part ORDER BY p_partkey")
    ),
    Q(
      "fn_date2",
      // second date family: month arithmetic with end-of-month clamping,
      // last_day, day-of-year, ISO week, constructed dates
      (s, dir) =>
        T(s, dir, "orders")
          .select(
            col("o_orderkey"),
            add_months(col("o_orderdate"), 3).cast("date").as("plus3mo"),
            last_day(col("o_orderdate")).cast("date").as("eom"),
            dayofyear(col("o_orderdate")).cast("long").as("doy"),
            weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
            make_date(year(col("o_orderdate")), lit(12), lit(31))
              .as("year_end"))
          .orderBy("o_orderkey"),
      Some(
        "SELECT o_orderkey, " +
          "CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo, " +
          "last_day(CAST(o_orderdate AS DATE)) AS eom, " +
          "CAST(dayofyear(o_orderdate) AS BIGINT) AS doy, " +
          "CAST(week(o_orderdate) AS BIGINT) AS iso_week, " +
          "make_date(CAST(year(o_orderdate) AS INT), 12, 31) AS year_end " +
          "FROM orders ORDER BY o_orderkey")
    )
  )
}
