package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Footer-only parquet statistics.
  *
  * `rowCount` answers "how many rows does this table hold" from the
  * parquet footers alone — ZERO Spark jobs, no task scheduling, no data
  * pages read (each footer read is a few KB of metadata I/O). The ANN /
  * semantic-dedup operators use it to size their IVF cell split
  * (`VecAlgs.cellSplit`): sizing is one scalar the storage layer already
  * knows, and paying a full `count()` scan for it would put an extra
  * pass over the corpus in front of every index build — at 100 TB, a
  * full cluster job per query for one number. `longStats` reads a long
  * column's null-free (min, max) the same way; combined with rowCount
  * it CHECKS an id column's declared dense-unique contract (n non-null
  * rows spanning [0, n−1] — uniqueness itself is the table's key
  * contract, not provable from min/max/count), which lets the
  * incremental ops derive residue-class batch sizes exactly without a
  * scan (VERDICT-r11 #7). ParquetMetaSpec pins all properties: counts
  * and stats equal their scan-based twins and schedule no Spark job.
  *
  * Scope: exact for plain parquet files/directories (the fixture layout
  * and any parquet table without deletion vectors). Snapshot tables
  * route through their own manifest statistics instead (SnapTable
  * manifests carry exact per-file row counts).
  */
object ParquetMeta {

  /** Visible data files under `path` (recursive over partitioned
    * layouts); a file or an empty seq for a bare file path. Hidden /
    * metadata entries are filtered by path COMPONENT below the root
    * (Spark's InMemoryFileIndex rule), not just the leaf: a stale
    * _temporary/.../part-0.parquet from an interrupted write must not
    * count. A visible non-.parquet data file fails fast — silently
    * skipping it would under-report with no error (ADVICE-r11). */
  private def dataFiles(s: SparkSession, path: String)
      : (org.apache.hadoop.conf.Configuration, Seq[Path]) = {
    val conf = s.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    if (fs.getFileStatus(root).isDirectory) {
      val rootUri = root.toUri.getPath
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        val rel = f.getPath.toUri.getPath.stripPrefix(rootUri)
          .stripPrefix("/")
        val parts = rel.split('/')
        val hidden =
          parts.exists(p => p.startsWith(".") || p.startsWith("_"))
        if (f.isFile && !hidden) {
          require(parts.last.endsWith(".parquet"),
            s"ParquetMeta($path): non-parquet data file " +
              s"'${f.getPath}' — footer stats would under-report; use a " +
              "scan for mixed-format directories")
          files += f.getPath
        }
      }
    } else files += root
    (conf, files.toSeq)
  }

  /** Exact row count of a parquet file or directory (recursive over
    * partitioned layouts), summed from footer block metadata. */
  def rowCount(s: SparkSession, path: String): Long = {
    val (conf, files) = dataFiles(s, path)
    var total = 0L
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try total += r.getRecordCount
      finally r.close()
    }
    total
  }

  /** Exact (min, max) of a required INT64 column across every data
    * file, from footer column statistics only — zero Spark jobs. Fails
    * fast when any block lacks usable stats (truncated/absent) rather
    * than returning a silently-wrong range. */
  def longStats(s: SparkSession, path: String, column: String)
      : (Long, Long) = {
    val (conf, files) = dataFiles(s, path)
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var blocks = 0
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.foreach { b =>
        if (b.getRowCount > 0) {
          blocks += 1
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(throw new IllegalArgumentException(
              s"ParquetMeta.longStats($path): no column '$column'"))
          val st = c.getStatistics
          require(st != null && !st.isEmpty && st.hasNonNullValue,
            s"ParquetMeta.longStats($path): block without usable " +
              s"stats for '$column' — fall back to a scan")
          // REQUIRED column contract: nulls would be invisible to
          // min/max and silently skew any derivation built on them
          require(st.isNumNullsSet && st.getNumNulls == 0,
            s"ParquetMeta.longStats($path): '$column' has " +
              s"${st.getNumNulls} nulls (or an unset null count) — " +
              "min/max cover only non-null values; use a scan")
          st.genericGetMin match {
            case lo: java.lang.Long =>
              mn = math.min(mn, lo.longValue)
              mx = math.max(mx,
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            case _ => throw new IllegalArgumentException(
              s"ParquetMeta.longStats($path): '$column' is not INT64 " +
                s"(stats ${st.getClass.getSimpleName})")
          }
        }
      } finally r.close()
    }
    require(blocks > 0,
      s"ParquetMeta.longStats($path): no non-empty blocks")
    (mn, mx)
  }
}
