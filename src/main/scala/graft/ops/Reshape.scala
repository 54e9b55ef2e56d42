package graft.ops

import graft.{Q, QueryModule, T}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping operators: unpivot (melt) and outer explode —
  * the inverse of agg_pivot and the null-preserving generator variant.
  * Both are narrow, shuffle-free row transforms (the output sort is the
  * only exchange); at scale they pipeline inside whole-stage codegen.
  */
object Reshape extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "fn_unpivot",
      // melt four lineitem measures into (metric, val) long format —
      // Dataset.unpivot (Spark 3.4+ native Unpivot plan node), oracle as
      // the equivalent UNION ALL (dialect-portable, unlike SQL UNPIVOT).
      (s, dir) =>
        T(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "metric", "val")
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some(
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(m => s"SELECT l_orderkey, l_linenumber, '$m' AS metric, " +
            s"$m AS val FROM lineitem WHERE l_orderkey < 100")
          .mkString("", " UNION ALL ", " ORDER BY l_orderkey, l_linenumber, metric"))
    ),
    Q(
      "fn_explode_outer",
      // null-preserving explode: docs keep a row (tok = NULL) even when
      // no token matches — the LEFT-JOIN-shaped generator every
      // enrichment pipeline needs so unmatched parents aren't dropped.
      (s, dir) =>
        T(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"),
            expr("filter(split(text, ' '), t -> t = 'vector' OR t = 'agg')")
              .as("hits"))
          .select(col("doc_id"), explode_outer(col("hits")).as("tok"))
          .orderBy(col("doc_id"), col("tok")),
      Some(
        "WITH b AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
          "t -> t = 'vector' OR t = 'agg') AS hits " +
          "FROM documents WHERE doc_id < 100) " +
          "SELECT doc_id, unnest(hits) AS tok FROM b WHERE len(hits) > 0 " +
          "UNION ALL SELECT doc_id, NULL AS tok FROM b WHERE len(hits) = 0 " +
          "ORDER BY doc_id, tok")
    )
  )
}
