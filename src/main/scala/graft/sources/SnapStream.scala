package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StructType}

/** Structured-Streaming SOURCE over a [[SnapTable]] — tail the commit log
  * as micro-batches, the Delta-streaming-source idea re-derived:
  *
  * {{{
  *   spark.readStream.format("snapstream").load(root)
  *     .writeStream...trigger(Trigger.AvailableNow())...
  * }}}
  *
  * Offsets ARE table versions (one `LongOffset` per manifest), so the
  * checkpoint pins exactly which commits a run has consumed:
  *
  *  - **First batch** = the full snapshot as of the version the stream
  *    discovers at start (or, with `startingVersion`, only the files added
  *    from that version on — the "changes only" mode).
  *  - **Every later batch** = the files ADDED between two versions, read
  *    directly off the manifest diff. An append's batch costs IO
  *    proportional to the append; nothing is re-read, nothing re-emitted —
  *    restarting from the checkpoint resumes exactly after the last
  *    consumed version (exactly-once with an idempotent sink).
  *  - **Non-append commits** (merge / delete / compact / restore remove
  *    files) break pure tailing; the source fails the query unless
  *    `ignoreChanges=true`, which re-emits rewritten files (at-least-once
  *    for their surviving rows — the same contract as Delta's
  *    `ignoreChanges`). Metadata-only commits (evolve-spec) add/remove
  *    nothing and stream through silently.
  *
  * Batches return streaming-flagged frames over the native parquet reader
  * (Bridge.streamingParquet), so scan pushdown and codegen apply — the
  * source adds manifest arithmetic, not a row path. At 100 TB this is the
  * incremental-ETL primitive: a downstream job consumes each ingest commit
  * once, instead of re-scanning the table.
  */
class SnapStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "snapstream"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "snapstream requires .load(<table root>)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val r = root(parameters)
    val snap = SnapTable.load(r, SnapTable.latestVersion(r))
    val table = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val cdf = parameters.get("readchangefeed").orElse(
      parameters.get("readChangeFeed")).exists(_.toBoolean)
    (shortName(),
      if (cdf) table.add("_sign",
        org.apache.spark.sql.types.IntegerType, nullable = false)
      else table)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // LEGACY path-based entry point. The native DSv2 surfaces cover
    // everything this source does, plus multi-window AvailableNow
    // draining and scan pushdown (inherent V1 limits — the V1 Source
    // API drains ONE window per AvailableNow run): use
    // `readStream.table("snap.db.t")` for the tail and
    // `readStream.table("snap.db.t.changes")` for the change feed.
    org.slf4j.LoggerFactory.getLogger(classOf[SnapStreamProvider]).warn(
      "format(\"snapstream\") is the LEGACY V1 entry point (one capped " +
        "window per AvailableNow run, no scan pushdown); prefer " +
        "readStream.table(\"snap.db.t\") / (\"snap.db.t.changes\") on a " +
        "registered catalog table")
    new SnapStreamSource(ctx, root(parameters),
      parameters.get("ignorechanges").orElse(parameters.get("ignoreChanges"))
        .exists(_.toBoolean),
      parameters.get("startingversion").orElse(
        parameters.get("startingVersion")).map(_.toInt)
        .orElse(parameters.get("startingtimestamp").orElse(
          parameters.get("startingTimestamp"))
          .map(SnapTail.startingVersionAt(root(parameters), _))),
      parameters.get("readchangefeed").orElse(
        parameters.get("readChangeFeed")).exists(_.toBoolean),
      parameters.get("maxversionspertrigger").orElse(
        parameters.get("maxVersionsPerTrigger")).map(_.toInt))
  }
}

class SnapStreamSource(ctx: SQLContext, root: String,
    ignoreChanges: Boolean, startingVersion: Option[Int],
    readChangeFeed: Boolean = false,
    maxVersionsPerTrigger: Option[Int] = None) extends Source {

  /** Rate limiting (`maxVersionsPerTrigger=n`): each micro-batch
    * consumes at most n COMMITS of the tail — the admission-control
    * knob that keeps a catch-up (a stream restarted after a weekend of
    * ingest) from planning one giant batch. Offsets are versions, so
    * capping the offset IS capping the batch; correctness is untouched
    * (the next trigger resumes exactly where the cap stopped). The
    * INITIAL snapshot batch is not split — with `startingVersion` the
    * cap applies from the start, which is the bounded-backfill mode.
    * Caveat: `Trigger.AvailableNow` falls back to ONE batch for a V1
    * source, so under a throttle it drains one capped window and
    * stops — re-run to continue, or use a ProcessingTime trigger for
    * continuous catch-up.
    */
  @volatile private var deliveredUpTo: Option[Int] = None

  private def throttleFloor: Option[Int] =
    deliveredUpTo.orElse(startingVersion.map(sv =>
      baseBelow(sv).getOrElse(0)))

  // schema AND column mapping are captured at source creation: files are
  // read by their stable PHYSICAL names and aliased to the captured
  // logical names, so an already-column-mapped table (past RENAME/DROP
  // COLUMN history) streams fine. A mapping that CHANGES while the
  // stream runs is a schema change mid-stream and fails the batch —
  // the same restart-from-fresh-checkpoint contract as Delta's.
  private val (tableSchema: StructType,
      colmapAtStart: Map[String, String],
      defaultsAtStart: Map[String, (String, Int)]) = {
    val snap = SnapTable.load(root, SnapTable.latestVersion(root))
    (DataType.fromJson(snap.schemaJson).asInstanceOf[StructType],
      snap.colmap, snap.defaults)
  }

  /** Streaming parquet read of `files` under the captured mapping:
    * physical-schema scan, initial-default fill (the same
    * era-vs-addedAt expression batch reads use), then a logical-name
    * aliasing projection (projections over a streaming leaf are still
    * a streaming plan).
    */
  private def readLogical(files: Seq[SnapTable.FileEntry]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val phys = SnapTable.physSchemaOf(tableSchema.json, colmapAtStart)
    val scan = Bridge.streamingParquet(ctx.sparkSession,
      files.map(f => s"$root/${f.path}"), phys)
    // an empty batch is a LocalRelation — no _metadata to fill over
    (if (files.isEmpty) scan
     else SnapTable.applyDefaults(scan, colmapAtStart, defaultsAtStart))
      .select(tableSchema.fieldNames.map(n =>
        col(colmapAtStart.getOrElse(n, n)).as(n)).toIndexedSeq: _*)
  }

  // the stream's schema is fixed at start (streaming contract); later
  // additive evolution null-fills through the parquet read like any
  // old-file read under a new snapshot schema. The change feed rides the
  // table schema plus the signed-delta column.
  override val schema: StructType =
    if (readChangeFeed) tableSchema.add("_sign",
      org.apache.spark.sql.types.IntegerType, nullable = false)
    else tableSchema

  override def getOffset: Option[Offset] = {
    val latest = SnapTable.latestVersion(root)
    val capped = (maxVersionsPerTrigger, throttleFloor) match {
      case (Some(m), Some(f)) =>
        // cap to an EXISTING slot ≤ floor+m (the log may have gaps:
        // orphaned txn slots, vacuumed versions); an empty window
        // advances to the FIRST retained version above the floor so
        // catch-up after a vacuum gap stays bounded instead of
        // admitting the whole backlog in one batch
        val retained = SnapTable.versions(root).filter(_ > f)
        retained.filter(_ <= f + m).lastOption
          .orElse(retained.sorted.headOption)
          .getOrElse(latest)
      case _ => latest
    }
    Some(LongOffset(capped.toLong))
  }

  private def version(o: Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case so: SerializedOffset => LongOffset(so).offset.toInt
    case other => other.json().trim.toInt
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = version(end)
    deliveredUpTo = Some(endV) // throttle anchor (restart replays seed it)
    // a column mapping PRESENT at start streams fine (physical-name
    // reads, aliased); one that CHANGED since is a mid-stream RENAME /
    // DROP / re-ADD — a schema change under a running stream, which
    // violates the fixed-schema contract
    val endSnap = SnapTable.load(root, endV)
    require(endSnap.colmap == colmapAtStart,
      "snapstream: the table's column mapping changed while the stream " +
        "ran (RENAME/DROP/re-ADD COLUMN) — restart from a fresh " +
        "checkpoint to adopt the new schema")
    require(endSnap.defaults == defaultsAtStart,
      "snapstream: the table's initial column defaults changed while " +
        "the stream ran (ADD COLUMN ... DEFAULT) — restart from a " +
        "fresh checkpoint to adopt the new schema")
    if (readChangeFeed) return changeBatch(start.map(version), endV)
    val files = start match {
      case None =>
        startingVersion match {
          case Some(sv) => addedBetween(baseBelow(sv), endV)
          case None => // full snapshot
            val snap = SnapTable.load(root, endV)
            if (snap.dvs.nonEmpty && !ignoreChanges)
              throw new IllegalStateException(
                "snapstream: the snapshot carries merge-on-read " +
                  "deletion vectors, which file-level tailing cannot " +
                  "see — compact() first, or ignoreChanges=true")
            snap.files
        }
      case Some(s) => addedBetween(Some(version(s)), endV)
    }
    readLogical(files)
  }

  /** CHANGE-FEED batch (`readChangeFeed=true`): the SIGNED file-diff
    * between the consumed version and `endV` — every row of every added
    * file with `_sign = +1`, every row of every removed file with
    * `_sign = -1` (the batch form is SnapTable.changesDelta; this is its
    * streaming twin, the Delta CDF idea). Rows a rewrite merely copied
    * cancel under any linear aggregate, so a downstream sum/count view
    * is maintained incrementally through merges, deletes and compactions
    * — no rewrite guard needed, removals are first-class here. The first
    * batch is the discovered snapshot, all +1 (initial load of the view).
    */
  private def changeBatch(start: Option[Int], endV: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fromFiles = start match {
      case Some(sv) => SnapTable.load(root, sv).files
      case None => startingVersion match {
        case Some(sv) =>
          SnapTable.versions(root).filter(_ < sv).lastOption
            .map(v => SnapTable.load(root, v).files).getOrElse(Seq.empty)
        case None => Seq.empty // initial load: whole snapshot is +1
      }
    }
    val toSnap = SnapTable.load(root, endV)
    require(toSnap.dvs.isEmpty,
      "snapstream readChangeFeed: merge-on-read deletion vectors are " +
        "not expressible as a file diff — compact() to materialize " +
        "them before tailing the change feed")
    val toFiles = toSnap.files
    val fromPaths = fromFiles.map(_.path).toSet
    val toPaths = toFiles.map(_.path).toSet
    def side(fs: Seq[SnapTable.FileEntry], sign: Int) =
      readLogical(fs).withColumn("_sign", lit(sign))
    // both legs are streaming-flagged leaves, so the union stays a legal
    // streaming batch plan
    side(toFiles.filterNot(f => fromPaths.contains(f.path)), 1)
      .unionByName(
        side(fromFiles.filterNot(f => toPaths.contains(f.path)), -1))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  private def addedBetween(from: Option[Int],
      to: Int): Seq[SnapTable.FileEntry] =
    SnapTail.addedBetween(root, from, to, ignoreChanges)

  private def baseBelow(v: Int): Option[Int] =
    SnapTail.baseBelow(root, v)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The tail-diff arithmetic both streaming read paths share (the V1
  * `snapstream` source above and the native DSv2
  * [[SnapMicroBatchStream]]): which files a consumed-version window
  * delivers, and which histories refuse to tail.
  */
private[sources] object SnapTail {

  /** Files added between snapshot `from` and snapshot `to`, as a
    * HEAD-TO-HEAD manifest diff (files(to) minus files(from)) — not a
    * per-intermediate-version walk. That makes the batch a pure function
    * of the two consumed offsets: intermediate slots a SnapTxn prepare
    * orphaned (or a vacuum dropped) can't distort it, and an
    * added-then-rewritten file WITHIN the range coalesces to its final
    * form instead of emitting stale rows. The rewrite guard compares the
    * same two endpoints: a file of `from` missing in `to` means history
    * was rewritten, which needs `ignoreChanges` to stream through.
    * `from = None` is the initial load: the whole snapshot at `to`.
    */
  def addedBetween(root: String, from: Option[Int], to: Int,
      ignoreChanges: Boolean): Seq[SnapTable.FileEntry] = {
    val fromFiles = from match {
      case None => Seq.empty[SnapTable.FileEntry]
      case Some(v) =>
        if (!SnapTable.versions(root).contains(v))
          throw new IllegalStateException(
            s"snapstream: consumed version $v was vacuumed from the " +
              "log — the stream can no longer prove what it has read; " +
              "restart from a fresh checkpoint (and retain at least the " +
              "consumed version when vacuuming a tailed table)")
        SnapTable.load(root, v).files
    }
    val toSnap = SnapTable.load(root, to)
    if (toSnap.dvs.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        "snapstream: the snapshot carries merge-on-read deletion " +
          "vectors, which file-level tailing cannot see — compact() to " +
          "materialize them, or set ignoreChanges=true to stream the " +
          "file contents (deleted rows included, at-least-once)")
    val fromPaths = fromFiles.map(_.path).toSet
    val removed = fromPaths.diff(toSnap.files.map(_.path).toSet)
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"snapstream: between versions ${from.get} and $to (head op " +
          s"'${toSnap.op}') ${removed.size} file(s) were removed — the " +
          "table was rewritten, not appended to. Restart from a fresh " +
          "checkpoint for a new snapshot, set ignoreChanges=true to " +
          "re-emit rewritten files (at-least-once for their rows), or " +
          "tail the signed feed with readChangeFeed=true")
    toSnap.files.filterNot(f => fromPaths.contains(f.path))
  }

  /** The latest retained version STRICTLY below `v` (None when none is —
    * then the base is the empty table): the changes-only anchor for
    * `startingVersion`, tolerant of vacuumed/skipped slots below it.
    */
  def baseBelow(root: String, v: Int): Option[Int] =
    SnapTable.versions(root).filter(_ < v).lastOption

  /** `startingTimestamp` → the earliest version committed AT OR AFTER
    * it (Delta's startingTimestamp contract) — all older → one past
    * the head, i.e. only future commits stream. Accepts epoch millis
    * or `yyyy-MM-dd HH:mm:ss[.f]`.
    */
  def startingVersionAt(root: String, ts: String): Int = {
    val ms =
      if (ts.forall(_.isDigit)) ts.toLong
      else java.sql.Timestamp.valueOf(ts).getTime
    SnapTable.versions(root)
      .find(v => SnapTable.load(root, v).ts >= ms)
      .getOrElse(SnapTable.latestVersion(root) + 1)
  }
}
