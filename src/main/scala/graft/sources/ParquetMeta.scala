package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Footer-only parquet statistics.
  *
  * `rowCount` answers "how many rows does this table hold" from the
  * parquet footers alone — ZERO Spark jobs, no task scheduling, no data
  * pages read (each footer read is a few KB of metadata I/O). The ANN /
  * semantic-dedup operators use it to size their IVF cell split
  * (`VecAlgs.cellSplit`): sizing is one scalar the storage layer already
  * knows, and paying a full `count()` scan for it would put an extra
  * pass over the corpus in front of every index build — at 100 TB, a
  * full cluster job per query for one number. ParquetMetaSpec pins both
  * properties: the count equals `df.count()` and the call schedules no
  * Spark job.
  *
  * Scope: exact for plain parquet files/directories (the fixture layout
  * and any parquet table without deletion vectors). Snapshot tables
  * route through their own manifest statistics instead (SnapTable
  * manifests carry exact per-file row counts).
  */
object ParquetMeta {

  /** Exact row count of a parquet file or directory (recursive over
    * partitioned layouts), summed from footer block metadata. */
  def rowCount(s: SparkSession, path: String): Long = {
    val conf = s.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    if (fs.getFileStatus(root).isDirectory) {
      val rootUri = root.toUri.getPath
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        // hidden/metadata filtering by path COMPONENT below the root
        // (Spark's InMemoryFileIndex rule), not just the leaf: a stale
        // _temporary/... /part-0.parquet from an interrupted write must
        // not inflate the count
        val rel = f.getPath.toUri.getPath.stripPrefix(rootUri)
          .stripPrefix("/")
        val parts = rel.split('/')
        val hidden =
          parts.exists(p => p.startsWith(".") || p.startsWith("_"))
        if (f.isFile && !hidden) {
          // a visible non-.parquet data file would silently undercount
          // (skewing IVF sizing with no error) — refuse instead; the
          // supported layouts (fixture tables, Spark partitionBy output)
          // contain only *.parquet besides hidden/metadata entries
          require(parts.last.endsWith(".parquet"),
            s"ParquetMeta.rowCount($path): non-parquet data file " +
              s"'${f.getPath}' — footer stats would undercount; use a " +
              "scan-based count for mixed-format directories")
          files += f.getPath
        }
      }
    } else files += root
    var total = 0L
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try total += r.getRecordCount
      finally r.close()
    }
    total
  }
}
