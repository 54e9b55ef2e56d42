package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** SQL surface for the table format's MAINTENANCE verbs — the statements
  * Spark's grammar has no hook for (DSv2 covers DML/DDL; OPTIMIZE /
  * VACUUM / DESCRIBE HISTORY are format-specific, exactly why Delta
  * ships its own parser extension). Injected via
  * `spark.sql.extensions=graft.GraftExtensions`; everything that isn't
  * one of the three verbs delegates untouched to Spark's parser.
  *
  * {{{
  *   OPTIMIZE cat.ns.t [INTO n FILES]
  *     [WHERE c BETWEEN a AND b] [ZORDER BY (c1, c2, ...)]
  *   VACUUM cat.ns.t [RETAIN n VERSIONS] [DRY RUN]
  *   RESTORE TABLE cat.ns.t TO VERSION AS OF v | TO TIMESTAMP AS OF 'ts'
  *   DESCRIBE HISTORY cat.ns.t
  *   DESCRIBE DETAIL cat.ns.t
  *   CREATE BLOOM INDEX ON cat.ns.t (col)
  *   CONVERT TO SNAP 'path' | cat.ns.t STATS COLUMN c
  *   CREATE TABLE cat.ns.t2 SHALLOW CLONE cat.ns.t [VERSION AS OF v]
  *   ALTER TABLE cat.ns.t CREATE|DROP|PUBLISH BRANCH|TAG name
  *     [AS OF VERSION v]
  * }}}
  */
class SnapSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    SnapSqlParser.route(sqlText).getOrElse(delegate.parsePlan(sqlText))

  // the trait's DEFAULT implementation ignores the parameters (compat
  // shim) — a delegating parser must forward explicitly or every
  // spark.sql(text, args) call loses its bindings
  override def parsePlanWithParameters(sqlText: String,
      params: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    SnapSqlParser.route(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, params))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object SnapSqlParser {
  private val Ident = """((?:`[^`]+`|\w+)(?:\.(?:`[^`]+`|\w+))*)"""
  private val Optimize =
    ("""(?is)^\s*OPTIMIZE\s+""" + Ident +
      """(?:\s+INTO\s+(\d+)\s+FILES)?""" +
      """(?:\s+WHERE\s+(\w+)\s+BETWEEN\s+(-?\d+)\s+AND\s+(-?\d+))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val Vacuum =
    ("""(?is)^\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?""" +
      """(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val Restore =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|""" +
      """TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*;?\s*$""").r
  private val History =
    ("""(?is)^\s*DESCRIBE\s+HISTORY\s+""" + Ident + """\s*;?\s*$""").r
  private val Detail =
    ("""(?is)^\s*DESCRIBE\s+DETAIL\s+""" + Ident + """\s*;?\s*$""").r
  private val BloomIdx =
    ("""(?is)^\s*CREATE\s+BLOOM\s+INDEX\s+ON\s+""" + Ident +
      """\s*\(\s*(\w+)\s*\)\s*;?\s*$""").r
  private val Convert =
    ("""(?is)^\s*CONVERT\s+TO\s+SNAP\s+(?:'([^']+)'|""" + Ident +
      """)\s+STATS\s+COLUMN\s+(\w+)\s*;?\s*$""").r
  private val Clone =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + Ident +
      """\s+SHALLOW\s+CLONE\s+""" + Ident +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""").r
  private val Ref =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+(CREATE|DROP|PUBLISH)\s+(BRANCH|TAG)\s+(\w+)""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r

  // --- persistent views in snap catalogs (OSS Spark's analyzer has no
  // V2-view DDL wiring, so the verbs route here; reads substitute via
  // SnapViewSubstitution). Only statements whose target names a
  // registered SnapCatalog are intercepted — session-catalog views
  // delegate untouched.
  private val CreateView =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+""" + Ident +
      """\s+AS\s+(.+?)\s*;?\s*$""").r
  private val DropView =
    ("""(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?""" + Ident +
      """\s*;?\s*$""").r
  private val ShowViews =
    ("""(?is)^\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+""" + Ident +
      """\s*;?\s*$""").r

  private def snapCat(cat: String): Boolean =
    SparkSession.getActiveSession.exists(s =>
      s.conf.getOption(s"spark.sql.catalog.$cat")
        .contains(classOf[SnapCatalog].getName))

  private def parts(ident: String): Seq[String] =
    ident.split('.').toSeq.map(p =>
      if (p.startsWith("`")) p.substring(1, p.length - 1) else p)

  private[sources] def route(sql: String): Option[LogicalPlan] = sql match {
    case Optimize(id, n, wc, wlo, whi, z) =>
      Some(OptimizeTableCommand(parts(id),
        Option(n).map(_.toInt),
        Option(z).map(_.split(',').toSeq.map(_.trim)).getOrElse(Seq.empty),
        Option(wc).map(c => (c, wlo.toLong, whi.toLong))))
    case Vacuum(id, n, unit, dry) =>
      // no RETAIN clause → the table's declared retention property
      // (snap.vacuum.retainVersions), else the live snapshot only;
      // RETAIN n HOURS keeps every version committed inside the window
      Some(VacuumTableCommand(parts(id),
        Option(n).map(_.toInt),
        hours = Option(unit).exists(_.equalsIgnoreCase("HOURS")),
        dryRun = dry != null))
    case Restore(id, v, ts) => Some(RestoreTableCommand(parts(id),
      Option(v).map(_.toInt), Option(ts)))
    case History(id) => Some(DescribeHistoryCommand(parts(id)))
    case Detail(id) => Some(DescribeDetailCommand(parts(id)))
    case BloomIdx(id, c) => Some(CreateBloomIndexCommand(parts(id), c))
    case Convert(path, id, c) => Some(ConvertToSnapCommand(
      Option(path), Option(id).map(parts), c))
    case Clone(dst, src, v) => Some(ShallowCloneCommand(
      parts(dst), parts(src), Option(v).map(_.toInt)))
    case Ref(id, verb, kind, name, v) => Some(RefCommand(parts(id),
      verb.toUpperCase, kind.toUpperCase, name,
      Option(v).map(_.toInt)))
    case CreateView(orRep, id, query)
        if parts(id).length >= 3 && snapCat(parts(id).head) =>
      Some(CreateSnapViewCommand(parts(id), query.trim, orRep != null))
    case DropView(ifEx, id)
        if parts(id).length >= 3 && snapCat(parts(id).head) =>
      Some(DropSnapViewCommand(parts(id), ifEx != null))
    case ShowViews(id)
        if parts(id).length >= 2 && snapCat(parts(id).head) =>
      Some(ShowSnapViewsCommand(parts(id)))
    case _ => None
  }

  /** Run one maintenance statement through the SAME command classes the
    * injected parser builds — for sessions created without the
    * extension (the parser is fixed at session build time).
    */
  def runStatement(s: SparkSession, sql: String)
      : org.apache.spark.sql.DataFrame =
    route(sql) match {
      case Some(cmd: LeafRunnableCommand) =>
        s.createDataFrame(
          s.sparkContext.parallelize(cmd.run(s), 1),
          org.apache.spark.sql.catalyst.types.DataTypeUtils
            .fromAttributes(cmd.output))
      case _ => s.sql(sql)
    }

  /** Resolve `cat.ns….table` to the table's root dir; only catalogs
    * registered as [[SnapCatalog]] qualify.
    */
  private[graft] def tableDir(s: SparkSession,
      parts: Seq[String]): String = {
    require(parts.length >= 2,
      s"expected cat.[ns.]table, got ${parts.mkString(".")}")
    val cat = parts.head
    require(s.conf.getOption(s"spark.sql.catalog.$cat")
        .contains(classOf[SnapCatalog].getName),
      s"'$cat' is not a snap catalog")
    (s.conf.get(s"spark.sql.catalog.$cat.root") +: parts.tail)
      .mkString("/")
  }
}

/** `OPTIMIZE t [INTO n FILES] [ZORDER BY (...)]` → [[SnapTable.compact]].
  * Default target is a quarter of the current file count (small-file
  * repair); ZORDER builds a balanced Morton interleave over the named
  * LONG columns, 8 bits each, widths derived from the actual column
  * ranges — so each clustered dimension prunes independently afterwards.
  */
case class OptimizeTableCommand(parts: Seq[String], into: Option[Int],
    zorder: Seq[String],
    where: Option[(String, Long, Long)] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    val before = SnapTable.load(dir, SnapTable.latestVersion(dir))
    val target = into.getOrElse(math.max(1, before.files.size / 4))
    // explicit ZORDER BY wins; else the table's declared CLUSTER BY
    // (one column sorts directly, several interleave) — a bare
    // OPTIMIZE on a clustered table re-materializes its own layout
    val effective =
      if (zorder.nonEmpty) zorder else SnapTable.clusterColumns(dir)
    val cluster = effective match {
      case Seq() => None
      case Seq(c) => Some(col(c))
      case cols => Some(OptimizeTableCommand.mortonColumn(s, dir, cols))
    }
    val v = where match {
      case Some((c, lo, hi)) =>
        SnapTable.compactWhere(s, dir, c, lo, hi, target, cluster)
      case None => SnapTable.compact(s, dir, target, cluster)
    }
    val after = SnapTable.load(dir, v)
    Seq(Row(v.toLong, before.files.size.toLong, after.files.size.toLong))
  }
}

object OptimizeTableCommand {
  /** Balanced 8-bit-per-dimension Morton interleave of `cols` (LONG
    * columns), widths derived from the table's actual min/max so no
    * dimension dominates the file splits.
    */
  private[sources] def mortonColumn(s: SparkSession, dir: String,
      cols: Seq[String]): org.apache.spark.sql.Column =
    SnapTable.mortonOf(SnapTable.read(s, dir), cols)
}

/** `CREATE BLOOM INDEX ON t (col)` → [[SnapTable.addBloomIndex]] —
  * point-lookup file skipping for columns uncorrelated with the layout,
  * from pure SQL.
  */
case class CreateBloomIndexCommand(parts: Seq[String], column: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("indexed_files", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    val v = SnapTable.addBloomIndex(s, dir, column)
    Seq(Row(v.toLong, SnapTable.load(dir, v).files.size.toLong))
  }
}

/** `CONVERT TO SNAP 'path' STATS COLUMN c` (or a `cat.ns.t` identifier
  * whose directory holds bare parquet) → [[SnapTable.convertInPlace]]:
  * the zero-copy lake on-ramp from pure SQL. With the identifier form
  * the converted directory is immediately queryable as that table.
  */
case class ConvertToSnapCommand(path: Option[String],
    ident: Option[Seq[String]], statsCol: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = path.getOrElse(SnapSqlParser.tableDir(s, ident.get))
    val v = SnapTable.convertInPlace(s, dir, statsCol)
    val snap = SnapTable.load(dir, v)
    Seq(Row(v.toLong, snap.files.size.toLong, snap.files.map(_.rows).sum))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF v]` →
  * [[SnapTable.clone]]: a zero-copy fork — dst's v1 references src's
  * data files in place, divergence is copy-on-write both ways.
  */
case class ShallowCloneCommand(dst: Seq[String], src: Seq[String],
    version: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val srcDir = SnapSqlParser.tableDir(s, src)
    val dstDir = SnapSqlParser.tableDir(s, dst)
    val v = SnapTable.clone(s, srcDir, dstDir, version.getOrElse(-1))
    Seq(Row(v.toLong,
      SnapTable.load(dstDir, v).files.size.toLong))
  }
}

/** `ALTER TABLE t CREATE|DROP|PUBLISH BRANCH|TAG name [AS OF VERSION v]`
  * — the write-audit-publish refs from SQL (Iceberg's branch/tag DDL
  * shape): a branch is a zero-copy fork writable via its own root (and
  * readable as `VERSION AS OF '<branch>'`), a tag an immutable pinned
  * version, PUBLISH the fast-forward/rebase merge back to main.
  */
case class RefCommand(parts: Seq[String], verb: String, kind: String,
    refName: String, asOf: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    val v: Long = (verb, kind) match {
      case ("CREATE", "BRANCH") =>
        require(asOf.isEmpty,
          "CREATE BRANCH forks the current head (AS OF is for tags)")
        SnapTable.createBranch(s, dir, refName).toLong
      case ("CREATE", "TAG") =>
        SnapTable.createTag(dir, refName, asOf.getOrElse(-1)).toLong
      case ("DROP", "BRANCH") =>
        SnapTable.dropBranch(dir, refName); 0L
      case ("DROP", "TAG") =>
        SnapTable.dropTag(dir, refName); 0L
      case ("PUBLISH", "BRANCH") =>
        SnapTable.publishBranch(s, dir, refName).toLong
      case other => throw new UnsupportedOperationException(
        s"$other: PUBLISH applies to branches only")
    }
    Seq(Row(v))
  }
}

/** `VACUUM t [RETAIN n VERSIONS] [DRY RUN]` → [[SnapTable.vacuum]] /
  * [[SnapTable.vacuumPlan]]. DRY RUN lists the would-be-deleted files
  * and reclaims nothing — the audit before an irreversible verb.
  */
case class VacuumTableCommand(parts: Seq[String], retain: Option[Int],
    dryRun: Boolean = false, hours: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(
      AttributeReference("would_remove", StringType, nullable = false)())
    else Seq(
      AttributeReference("removed_files", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    // time-based retention maps onto version retention: keep every
    // version whose commit ts falls inside the window (at least the
    // live head) — same liveness scope, so DRY RUN stays exact
    val r =
      if (hours) {
        val cutoff = System.currentTimeMillis() -
          retain.get.toLong * 3600000L
        math.max(1, SnapTable.versions(dir)
          .count(v => SnapTable.tsOf(dir, v) >= cutoff))
      } else retain.getOrElse(SnapTable.retainDefault(dir))
    if (dryRun) SnapTable.vacuumPlan(dir, r).map(Row(_))
    else Seq(Row(SnapTable.vacuum(dir, r).toLong))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF v | TO TIMESTAMP AS OF 'ts'` →
  * [[SnapTable.restore]]: rollback as one manifest write.
  */
case class RestoreTableCommand(parts: Seq[String], version: Option[Int],
    timestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    val v = version.getOrElse {
      val ms = java.sql.Timestamp.valueOf(timestamp.get).getTime
      SnapTable.versionAsOf(dir, ms)
    }
    Seq(Row(v.toLong, SnapTable.restore(s, dir, v).toLong))
  }
}

/** `DESCRIBE DETAIL t` — one row of head-snapshot metadata: the
  * at-a-glance audit before trusting a table (version, verb, file/row
  * counts, on-disk bytes, layout, outstanding DVs/indexes/constraints).
  */
case class DescribeDetailCommand(parts: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_spec", StringType, nullable = false)(),
    AttributeReference("bucket", StringType, nullable = false)(),
    AttributeReference("n_dvs", LongType, nullable = false)(),
    AttributeReference("n_bloom_indexes", LongType, nullable = false)(),
    AttributeReference("n_checks", LongType, nullable = false)(),
    AttributeReference("ts", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    val v = SnapTable.latestVersion(dir)
    val snap = SnapTable.load(dir, v)
    val bytes = snap.files.map { f =>
      val p = java.nio.file.Paths.get(dir).resolve(f.path).normalize
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else 0L
    }.sum
    Seq(Row(dir, v.toLong, snap.op, snap.files.size.toLong,
      snap.files.map(_.rows).sum, bytes,
      snap.spec.mkString(","),
      snap.bucket.map { case (c, n) => s"$c:$n" }.getOrElse(""),
      snap.dvs.size.toLong, snap.blooms.size.toLong,
      snap.checks.size.toLong, snap.ts))
  }
}

/** `DESCRIBE HISTORY t` → [[SnapTable.history]] rows, newest first. */
case class DescribeHistoryCommand(parts: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("ts", LongType, nullable = false)())

  override def run(s: SparkSession): Seq[Row] = {
    val dir = SnapSqlParser.tableDir(s, parts)
    SnapTable.history(s, dir).orderBy(col("version").desc).collect().toSeq
  }
}
