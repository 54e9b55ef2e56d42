package graft

import org.scalatest.funsuite.AnyFunSuite

/** Side-effecting operators (temp dirs, saveAsTable, temp views, memory
  * sinks) must be re-runnable within one session and produce identical
  * results — verify/bench/users all invoke them repeatedly.
  */
class IdempotencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sideEffecting = Seq(
    "sink_parquet", "sink_partitioned_prune", "sink_bucketed_join",
    "sink_compaction", "source_csv_timeseries", "source_json",
    "source_orc", "source_schema_evolution", "sub_lateral",
    "stream_foreachbatch_sink", "win_range_interval",
    // table-format + wave ops: every call builds a fresh Tmp.dir table,
    // so repeated invocation must be invisible in the results
    "table_snapshot_append", "table_merge_cow", "table_restore",
    "stream_available_now", "graph_pagerank", "source_log_lines")

  sideEffecting.foreach { name =>
    test(s"$name runs twice in one session with identical results") {
      def run(): Seq[String] =
        SparkEntry.queries(name)(spark, TestSpark.Sf)
          .collect().map(_.toString).toSeq
      assert(run() == run())
    }
  }
}
