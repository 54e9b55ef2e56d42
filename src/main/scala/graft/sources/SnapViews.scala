package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Persistent SQL views for the snap catalog (the DSv2 `ViewCatalog`
  * surface): a view is its defining SQL text plus the analysis context
  * Spark needs to re-resolve it (current catalog/namespace, declared
  * schema, column aliases/comments) — stored as one JSON file under
  * `<namespace>/_views/<name>.json`, so views version with the
  * warehouse directory and need no engine state.
  *
  * Scale/ops notes: view resolution is a driver-side file read at
  * analysis time (metadata-sized); the underscore dir keeps view files
  * out of [[SnapCatalog.listTables]]' way (a table is a dir with
  * `_log`), and CREATE is an atomic create-new — two racing CREATE
  * VIEWs serialize on the filesystem, the loser gets the
  * already-exists error.
  */
private[sources] object SnapViews {

  import scala.jdk.CollectionConverters._

  private def dir(base: String, namespace: Array[String]): Path =
    namespace.foldLeft(Paths.get(base))(_.resolve(_)).resolve("_views")

  private[sources] def path(base: String, ident: Identifier): Path =
    dir(base, ident.namespace()).resolve(ident.name() + ".json")

  private[sources] def exists(base: String, ident: Identifier): Boolean =
    Files.isRegularFile(path(base, ident))

  private[sources] def list(base: String,
      namespace: Array[String]): Array[Identifier] = {
    val d = dir(base, namespace)
    if (!Files.isDirectory(d)) Array.empty
    else {
      val st = Files.list(d)
      try st.iterator().asScala.toArray
        .filter(_.getFileName.toString.endsWith(".json"))
        .map(p => Identifier.of(namespace,
          p.getFileName.toString.stripSuffix(".json")))
        .sortBy(_.name())
      finally st.close()
    }
  }

  private[sources] def write(base: String, info: ViewInfo,
      replace: Boolean): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("sql", info.sql())
    node.put("currentCatalog", info.currentCatalog())
    val ns = node.putArray("currentNamespace")
    info.currentNamespace().foreach(ns.add)
    node.put("schemaJson", info.schema().json)
    val qcn = node.putArray("queryColumnNames")
    info.queryColumnNames().foreach(qcn.add)
    val ca = node.putArray("columnAliases")
    info.columnAliases().foreach(ca.add)
    val cc = node.putArray("columnComments")
    info.columnComments().foreach(c =>
      if (c == null) cc.addNull() else cc.add(c))
    val props = node.putObject("properties")
    info.properties().asScala.foreach { case (k, v) => props.put(k, v) }
    val p = path(base, info.ident())
    Files.createDirectories(p.getParent)
    val bytes = m.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(node)
    if (replace) {
      val tmp = p.getParent.resolve(p.getFileName.toString + ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } else
      // CREATE_NEW: two racing CREATE VIEWs serialize here — the loser
      // throws FileAlreadyExists, surfaced as already-exists upstream
      Files.write(p, bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW)
    ()
  }

  private[sources] def load(base: String, ident: Identifier): View = {
    val p = path(base, ident)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(Files.readAllBytes(p))
    def arr(field: String): Array[String] = {
      val a = node.get(field)
      (0 until a.size()).map(i =>
        if (a.get(i).isNull) null else a.get(i).asText()).toArray
    }
    new View {
      override def name(): String = ident.toString
      override def query(): String = node.get("sql").asText()
      override def currentCatalog(): String =
        node.get("currentCatalog").asText()
      override def currentNamespace(): Array[String] =
        arr("currentNamespace")
      override def schema(): org.apache.spark.sql.types.StructType =
        org.apache.spark.sql.types.DataType
          .fromJson(node.get("schemaJson").asText())
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      override def queryColumnNames(): Array[String] =
        arr("queryColumnNames")
      override def columnAliases(): Array[String] = arr("columnAliases")
      override def columnComments(): Array[String] =
        arr("columnComments")
      override def properties(): java.util.Map[String, String] = {
        val props = node.get("properties")
        val out = new java.util.HashMap[String, String]()
        props.properties().asScala.foreach(e =>
          out.put(e.getKey, e.getValue.asText()))
        out
      }
    }
  }
}

/** Read-side wiring for snap-catalog views: OSS Spark's analyzer does
  * not resolve relations against a DSv2 `ViewCatalog`, so this injected
  * resolution rule substitutes any `cat.ns….name` reference that names
  * a stored view with its parsed definition (fully expanded — nested
  * views inline here too, with a cycle check), wrapped in a
  * `SubqueryAlias` carrying the view's qualified name. Everything else
  * — including the stored query's own table references — resolves
  * through Spark's ordinary rules afterwards.
  *
  * Contract: view definitions should use qualified names (the stored
  * text re-parses in the CURRENT session context, the classic
  * text-substitution view semantics).
  */
private[graft] class SnapViewSubstitution(spark: SparkSession)
  extends Rule[LogicalPlan] {

  private def rootOf(cat: String): Option[String] =
    if (spark.conf.getOption(s"spark.sql.catalog.$cat")
        .contains(classOf[SnapCatalog].getName))
      spark.conf.getOption(s"spark.sql.catalog.$cat.root")
    else None

  private def viewAt(parts: Seq[String]): Option[View] =
    if (parts.length < 3) None
    else rootOf(parts.head).flatMap { base =>
      val ident = Identifier.of(
        parts.tail.dropRight(1).toArray, parts.last)
      if (SnapViews.exists(base, ident))
        Some(SnapViews.load(base, ident))
      else None
    }

  private def expand(parts: Seq[String], v: View,
      seen: Set[String]): LogicalPlan = {
    val key = parts.mkString(".").toLowerCase
    require(!seen.contains(key), s"cyclic view reference through $key")
    val child = spark.sessionState.sqlParser.parsePlan(v.query())
    val inlined = child.transformDown {
      case u: UnresolvedRelation =>
        viewAt(u.multipartIdentifier) match {
          case Some(nested) =>
            expand(u.multipartIdentifier, nested, seen + key)
          case None => u
        }
    }
    SubqueryAlias(parts, inlined)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        viewAt(u.multipartIdentifier) match {
          case Some(v) => expand(u.multipartIdentifier, v, Set.empty)
          case None => u
        }
    }
}

/** `CREATE [OR REPLACE] VIEW cat.ns.v AS <query>` for snap catalogs:
  * analyzes the query once (schema capture — no execution) and stores
  * the ORIGINAL text through the catalog's `ViewCatalog` surface.
  */
case class CreateSnapViewCommand(parts: Seq[String], query: String,
    replace: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(s: SparkSession): Seq[Row] = {
    val cat = s.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    val ns = parts.tail.dropRight(1).toArray
    val ident = Identifier.of(ns, parts.last)
    // parseQuery rejects commands/DML up front (CREATE VIEW ... AS
    // INSERT/CALL/...) — `s.sql` on such a body would EXECUTE it
    // eagerly at CREATE VIEW time instead of capturing a schema
    val parsed = s.sessionState.sqlParser.parseQuery(query)
    val schema = s.sessionState.executePlan(parsed).analyzed.schema
    val info = new ViewInfo(ident, query, parts.head, ns, schema,
      schema.fieldNames, Array.empty, Array.empty,
      new java.util.HashMap[String, String]())
    if (replace) cat.replaceView(info, true) else cat.createView(info)
    Seq.empty
  }
}

case class DropSnapViewCommand(parts: Seq[String], ifExists: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(s: SparkSession): Seq[Row] = {
    val cat = s.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(parts.tail.dropRight(1).toArray,
      parts.last)
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

case class ShowSnapViewsCommand(parts: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("viewName",
      org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("isTemporary",
      org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val cat = s.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[ViewCatalog]
    cat.listViews(parts.tail: _*).toSeq.map(id =>
      Row(id.namespace().mkString("."), id.name(), false))
  }
}
