package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Stored procedures for the snap catalog (the DSv2 `ProcedureCatalog`
  * surface, wired in Spark 4's `CALL` statement) — the Iceberg-style
  * maintenance entry points:
  *
  * {{{
  *   CALL snap.system.compact('db.t', 4)
  *   CALL snap.system.vacuum('db.t', 3)
  *   CALL snap.system.rollback('db.t', 2)
  *   CALL snap.system.create_tag('db.t', 'audit', 2)
  *   CALL snap.system.create_branch('db.t', 'wap')
  *   CALL snap.system.publish_branch('db.t', 'wap')
  * }}}
  *
  * Each is a thin binding over the same [[SnapTable]] verbs the parser
  * extension's OPTIMIZE/VACUUM/RESTORE statements call — two SQL
  * surfaces, one engine path. The table argument is `ns.table`
  * relative to the catalog root. Every call returns a one-row result
  * (the new version + a human summary) through a driver-local scan —
  * procedures are metadata operations; their data work happens inside
  * the SnapTable verb on the cluster.
  */
private[sources] object SnapProcedures {

  private val Names = Seq("compact", "vacuum", "rollback",
    "create_tag", "create_branch", "publish_branch")

  private[sources] def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  private[sources] def load(base: String, ident: Identifier)
      : UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")) &&
      Names.contains(ident.name()),
      s"unknown procedure $ident — see snap.system: " +
        Names.mkString(", "))
    new SnapProcedure(base, ident.name())
  }

  private def dirOf(base: String, table: String): String =
    (base +: table.split('.').toSeq).mkString("/")
}

private[sources] class SnapProcedure(base: String, proc: String)
  extends UnboundProcedure {

  override def name(): String = proc
  override def description(): String =
    s"snap maintenance procedure $proc(table, ...)"

  override def bind(input: StructType): BoundProcedure =
    new BoundProcedure {
      override def name(): String = proc
      override def description(): String = SnapProcedure.this.description()
      override def isDeterministic: Boolean = false

      override def parameters(): Array[ProcedureParameter] = proc match {
        // trailing params carry DEFAULTs (Spark fills omitted args at
        // bind time): compact defaults to quarter-the-file-count
        // (sentinel 0, resolved in call), vacuum to live-snapshot-only
        case "compact" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("target_files", LongType)
            .defaultValue("0").build())
        // sentinel 0 = "table's declared retention" (the
        // snap.vacuum.retainVersions property, else 1), resolved in
        // call() — a literal default of 1 here could delete history
        // the table's own policy says to keep
        case "vacuum" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("retain_versions", LongType)
            .defaultValue("0").build())
        case "rollback" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", LongType).build())
        case "create_tag" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("tag", StringType).build(),
          ProcedureParameter.in("version", LongType).build())
        case "create_branch" | "publish_branch" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build())
      }

      override def call(input: InternalRow)
          : java.util.Iterator[Scan] = {
        val s = org.apache.spark.sql.SparkSession.active
        val table = input.getUTF8String(0).toString
        val dir = (base +: table.split('.').toSeq).mkString("/")
        val (v, msg) = proc match {
          case "compact" =>
            val requested = input.getLong(1).toInt
            val t =
              if (requested > 0) requested
              else math.max(1, SnapTable
                .load(dir, SnapTable.latestVersion(dir)).files.size / 4)
            val nv = SnapTable.compact(s, dir, t)
            (nv.toLong, s"compacted to <= $t files")
          case "vacuum" =>
            val requested = input.getLong(1).toInt
            val keep = if (requested >= 1) requested
              else SnapTable.retainDefault(dir)
            val removed = SnapTable.vacuum(dir, keep)
            (SnapTable.latestVersion(dir).toLong,
              s"removed $removed files")
          case "rollback" =>
            val nv = SnapTable.restore(s, dir, input.getLong(1).toInt)
            (nv.toLong, s"restored contents of v${input.getLong(1)}")
          case "create_tag" =>
            SnapTable.createTag(dir, input.getUTF8String(1).toString,
              input.getLong(2).toInt)
            (input.getLong(2), s"tag ${input.getUTF8String(1)}")
          case "create_branch" =>
            val b = input.getUTF8String(1).toString
            SnapTable.createBranch(s, dir, b)
            (SnapTable.latestVersion(dir).toLong, s"branch $b forked")
          case "publish_branch" =>
            val b = input.getUTF8String(1).toString
            val nv = SnapTable.publishBranch(s, dir, b)
            (nv.toLong, s"branch $b published")
        }
        val out = StructType(Seq(
          org.apache.spark.sql.types.StructField("version", LongType,
            nullable = false),
          org.apache.spark.sql.types.StructField("summary", StringType,
            nullable = false)))
        val row = new GenericInternalRow(
          Array[Any](v, UTF8String.fromString(msg)))
        java.util.Collections.singletonList(new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = out
        }: Scan).iterator()
      }
    }
}
