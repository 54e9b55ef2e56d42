package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.graftx.ParquetBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `MERGE INTO` / `UPDATE` / (non-pushable) `DELETE` for the snapshot
  * table format, via the DSv2 row-level-operation API — the GROUP-BASED
  * (copy-on-write) shape: Spark reads the candidate files through
  * [[SnapRowLevelScan]], computes the complete post-operation contents of
  * exactly those files, writes them through [[SnapReplaceBatchWrite]],
  * and the commit atomically swaps the scanned files for the written
  * ones (untouched files are carried forward by reference — the same
  * file-granular CoW contract as the API `SnapTable.merge`).
  *
  * Scale shape: Spark's runtime GROUP FILTER narrows the scan to files
  * that actually contain a matched row before the rewrite runs — the
  * planner builds a join of target and source on the merge condition,
  * collects the distinct `_file` values, and pushes `IN (files…)` into
  * [[SnapRowLevelScan.filter]]. An unmatched-key merge over a 10k-file
  * table therefore rewrites only the files holding matches, not the
  * table; the write cost is O(matched files) + O(inserts).
  */
private[sources] class SnapRowLevelBuilder(root: String,
    snap: SnapTable.Snapshot, info: RowLevelOperationInfo)
  extends RowLevelOperationBuilder {
  // Identity columns survive row-level writes: matched/copied rows
  // carry their existing (non-null) values; a MERGE insert action that
  // leaves an ALWAYS column NULL gets a fresh value assigned at commit
  // (SnapTable.relayoutRowLevel — the same NULL-means-assign contract
  // as short SQL INSERTs). DELETE only carries existing values forward.
  override def build(): RowLevelOperation =
    new SnapRowLevelOperation(root, snap, info.command)
}

private[sources] class SnapRowLevelOperation(root: String,
    snap: SnapTable.Snapshot,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Files the operation's scan ended up covering — the rewrite set the
    * commit swaps out. Defaults to every candidate file (a full rewrite
    * is always correct); the runtime group filter narrows it.
    */
  @volatile private[sources] var scanned: Seq[SnapTable.FileEntry] =
    snap.files

  private[sources] def snapJson: String = snap.schemaJson

  /** Outstanding merge-on-read deletes — the operation's scan reads
    * THROUGH them (the native reader drops DV'd positions per file), so
    * a MERGE/UPDATE on a MoR-deleted table rewrites only the rows that
    * are actually visible: nothing DV'd can match, survive, or
    * resurrect. The commit then decides which DV dirs stay live.
    */
  private[sources] def snapDvs: Seq[String] = snap.dvs

  private[sources] def snapColmap: Map[String, String] = snap.colmap

  private[sources] def snapDefaults: Map[String, (String, Int)] =
    snap.defaults

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new SnapRowLevelScanBuilder(this, root, snap)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new SnapReplaceBatchWrite(SnapRowLevelOperation.this, root,
            snap, info.schema())
      }
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapBatchScan.FileCol))
}

/** The operation's scan: the native batch reader over ALL candidate
  * files, exposing the `_file` metadata column, accepting the runtime
  * group filter. Row-level filters are forwarded to parquet (row-group
  * pruning) but deliberately NOT used for manifest file pruning: the
  * REWRITE set must be chosen by match semantics (the group filter), not
  * by which files happen to have surviving rows.
  */
private[sources] class SnapRowLevelScanBuilder(
    op: SnapRowLevelOperation, root: String, snap: SnapTable.Snapshot)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private val full: StructType = SnapTable.schemaOf(snap.schemaJson)
  private var required: StructType = full
  private var raw: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    raw = filters.filterNot(_.references
      .contains(SnapBatchScan.FileCol))
    filters // all residual
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    new SnapRowLevelScan(op, SparkSession.active, root, required, raw)
}

private[sources] class SnapRowLevelScan(op: SnapRowLevelOperation,
    spark: SparkSession, root: String, required: StructType,
    pushed: Seq[Filter])
  extends SnapBatchScan(spark, root, op.scanned, op.snapJson, required,
    pushed, None, op.snapDvs, op.snapColmap,
    defaults = op.snapDefaults)
  with SupportsRuntimeV2Filtering {

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapBatchScan.FileCol))

  /** The runtime group filter: `IN (file, …)` over `_file`. Anything
    * unparseable keeps the full candidate set — a larger rewrite, never
    * a wrong one.
    */
  override def filter(predicates: Array[Predicate]): Unit = {
    val keep = predicates.iterator.flatMap(SnapRowLevelScan.inValues)
      .reduceOption(_ intersect _)
    keep.foreach { k =>
      files = files.filter(f => k.contains(f.path))
      op.scanned = files
    }
  }
}

private[sources] object SnapRowLevelScan {
  /** Extract the string values of an `IN(_file, …)` / `=(_file, v)` V2
    * predicate; `None` for any other shape.
    */
  def inValues(p: Predicate): Option[Set[String]] = {
    import org.apache.spark.sql.connector.expressions.{Expression, Literal}
    def strings(es: Seq[Expression]): Option[Set[String]] = {
      val vs = es.collect {
        case l: Literal[_] => String.valueOf(l.value)
      }
      if (vs.length == es.length) Some(vs.toSet) else None
    }
    val children = p.children().toSeq
    val onFile = children.headOption.exists {
      case r: NamedReference =>
        r.fieldNames.sameElements(Array(SnapBatchScan.FileCol))
      case _ => false
    }
    if (!onFile) None
    else p.name() match {
      case "IN" | "=" => strings(children.drop(1))
      case _ => None
    }
  }
}

private[sources] class SnapReplaceBatchWrite(op: SnapRowLevelOperation,
    root: String, parent: SnapTable.Snapshot, schema: StructType)
  extends BatchWrite {

  // era-stamped like every data dir (see SnapTable.writeData): rows a
  // row-level rewrite lands hold EXPLICIT values for every column of
  // the write schema, so initial defaults must not re-fill them
  private val dirName = s"c${SnapTable.eraHiOf(parent) + 1}-" +
    java.util.UUID.randomUUID().toString.take(8)
  private val dir = Paths.get(root, "data", dirName)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    Files.createDirectories(dir)
    val spark = SparkSession.active
    // rows arrive positionally; the parquet writer must name columns at
    // their PHYSICAL names so the rewritten files read back under the
    // table's column mapping like every other file
    val physSchema = StructType(schema.fields.map(f =>
      f.copy(name = SnapTable.physName(parent.colmap, f.name))))
    val (owf, prepared) = ParquetBridge.writerFactory(spark, physSchema,
      spark.sessionState.newHadoopConf())
    new SnapReplaceWriterFactory(owf, dir.toString, physSchema,
      new SerializableConfiguration(prepared))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val raw = messages.toSeq.collect {
      case SnapWriteMessage(path) =>
        SnapTable.footerEntry(spark, root, Paths.get(path))
    }.flatten.sortBy(_.path)
    // bucketed tables re-layout the rewrite into the table's bucket
    // scheme; GENERATED ALWAYS identity NULLs (MERGE inserts) get
    // values assigned — both one bounded pass over just the rewrite
    val fresh = SnapTable.relayoutRowLevel(spark, root, parent, raw)
    // the written rows are the touched files' complete replacement —
    // validate declared CHECK constraints over them before any link
    // (bounded by the rewrite size, same contract as the API merge)
    if (parent.checks.nonEmpty && fresh.nonEmpty)
      SnapTable.validateWrittenChecks(spark, root, fresh,
        parent.schemaJson, parent.checks,
        s"incoming ${op.command().name().toLowerCase}", parent.colmap)
    val scanned = op.scanned.map(_.path).toSet
    val carried = parent.files.filterNot(f => scanned.contains(f.path))
    // DV entries for rewritten files become inert (their paths leave the
    // file list, so the read-side subtraction can never match them);
    // entries for carried files MUST stay live. When nothing is carried
    // the dirs are provably dead — reclaim them now instead of waxing a
    // wasted per-read anti-join until vacuum
    SnapTable.commitExclusive(root, parent, carried ++ fresh,
      op.command().name().toLowerCase + "-sql", parent.schemaJson,
      dvs = if (carried.isEmpty) Seq.empty else parent.dvs)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case SnapWriteMessage(path) => Files.deleteIfExists(Paths.get(path))
      case _ => ()
    }
    ()
  }
}

private[sources] final case class SnapWriteMessage(path: String)
  extends WriterCommitMessage

private[sources] class SnapReplaceWriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    dir: String, schema: StructType, conf: SerializableConfiguration)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = {
    val tac = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf.value,
      new org.apache.hadoop.mapreduce.TaskAttemptID("graft", 0,
        org.apache.hadoop.mapreduce.TaskType.MAP, partitionId,
        taskId.toInt))
    val path = s"$dir/part-$partitionId-$taskId${owf.getFileExtension(tac)}"
    val w = owf.newInstance(path, schema, tac)
    new DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = w.write(r)
      override def commit(): WriterCommitMessage = {
        w.close(); SnapWriteMessage(path)
      }
      override def abort(): Unit = {
        w.close(); Files.deleteIfExists(Paths.get(path)); ()
      }
      override def close(): Unit = ()
    }
  }
}
