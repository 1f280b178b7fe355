package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import scala.jdk.CollectionConverters._

/** PERSISTENT SQL views over [[IceLiteCatalog]] warehouses — the glue that
  * makes Spark's V2 [[ViewCatalog]] API reachable from plain SQL. Vanilla
  * Spark 4 ships the API but wires neither the DDL (`ResolveSessionCatalog`
  * refuses `CREATE VIEW` on any non-session catalog) nor read resolution
  * (an `UnresolvedRelation` never consults a ViewCatalog), so — exactly
  * like Iceberg's own Spark integration — the support rides
  * `SparkSessionExtensions`:
  *
  *  - [[IceViewParser]] (injectParser) intercepts `CREATE [OR REPLACE]
  *    VIEW cat.ns.v AS ...` / `DROP VIEW cat.ns.v` whose catalog is an
  *    IceLiteCatalog BEFORE analysis (the session-catalog resolver would
  *    throw first otherwise) and rewrites them to runnable commands over
  *    the ViewCatalog API;
  *  - [[ResolveIceViews]] (injectResolutionRule) resolves reads: an
  *    unresolved `cat.ns.v` whose catalog holds a persisted view expands
  *    to the view's parsed SQL under a SubqueryAlias — Iceberg-view
  *    semantics (the TEXT is stored; each read re-plans against current
  *    table state).
  *
  * Reference surface: named views registered over the lakehouse tables
  * (`query_iceberg_minio.ipynb:274-277` — `CREATE OR REPLACE VIEW ... AS
  * SELECT * FROM iceberg_scan(...)`), made durable warehouse metadata
  * here instead of session state. Views store fully-qualified or
  * creation-context-resolvable SQL; resolution is metadata-only, so
  * nothing here scales with data size. */
object IceViewSupport {
  private[sources] def iceViewCatalog(
      spark: SparkSession, name: String): Option[IceLiteCatalog] =
    try spark.sessionState.catalogManager.catalog(name) match {
      case c: IceLiteCatalog => Some(c)
      case _                 => None
    } catch { case _: Exception => None }
}

/** Analyzer rule: expand reads of persisted IceLite views. Cycle-guarded —
  * a view whose text (transitively) references itself fails loudly. */
final class ResolveIceViews(spark: SparkSession) extends Rule[LogicalPlan] {
  private val resolving = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 3 =>
      val Seq(catName, ns, viewName) = u.multipartIdentifier
      IceViewSupport.iceViewCatalog(spark, catName) match {
        case Some(cat) =>
          val ident = Identifier.of(Array(ns), viewName)
          if (!cat.viewExists(ident)) u
          else {
            val key = s"$catName.$ns.$viewName"
            require(!resolving.get().contains(key),
              s"cyclic view reference: ${(key :: resolving.get()).reverse.mkString(" -> ")}")
            val view = cat.loadView(ident)
            resolving.set(key :: resolving.get())
            try {
              val parsed = spark.sessionState.sqlParser.parsePlan(view.query)
              // eagerly resolve nested views so the cycle guard sees the
              // full chain on this thread
              SubqueryAlias(viewName, apply(parsed))
            } finally resolving.set(resolving.get().tail)
          }
        case None => u
      }
  }
}

/** Parser wrapper: reroute view DDL aimed at an IceLiteCatalog to the
  * ViewCatalog-backed commands; everything else delegates untouched. */
final class IceViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case cv: CreateView =>
        cv.child match {
          case ui: UnresolvedIdentifier if ui.nameParts.length == 3 &&
              IceViewSupport.iceViewCatalog(spark, ui.nameParts.head).isDefined =>
            require(cv.userSpecifiedColumns.isEmpty,
              "icelite views store the query text; column lists are not supported")
            val viewSql = cv.originalText.getOrElse(
              throw new IllegalArgumentException("CREATE VIEW without query text"))
            CreateIceViewCommand(ui.nameParts.head, ui.nameParts(1), ui.nameParts(2),
              viewSql, cv.properties, replace = cv.replace, allowExisting = cv.allowExisting)
          case _ => cv
        }
      case dv: DropView =>
        dv.child match {
          case ui: UnresolvedIdentifier if ui.nameParts.length == 3 &&
              IceViewSupport.iceViewCatalog(spark, ui.nameParts.head).isDefined =>
            DropIceViewCommand(ui.nameParts.head, ui.nameParts(1), ui.nameParts(2),
              ifExists = dv.ifExists)
          case _ => dv
        }
      case other => other
    }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW cat.ns.v AS <sql>` against an IceLiteCatalog:
  * analyze the query for its schema (no execution), persist the view TEXT
  * through the ViewCatalog API. */
final case class CreateIceViewCommand(
    catName: String, ns: String, viewName: String,
    viewSql: String,
    properties: Map[String, String],
    replace: Boolean,
    allowExisting: Boolean)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cm  = spark.sessionState.catalogManager
    val cat = cm.catalog(catName).asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array(ns), viewName)
    if (cat.viewExists(ident) && allowExisting && !replace) return Nil
    if (cat.viewExists(ident) && !allowExisting && !replace)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    val schema = spark.sql(viewSql).schema // analysis only — nothing runs
    val info = new ViewInfo(ident, viewSql,
      cm.currentCatalog.name(), cm.currentNamespace,
      schema, schema.fieldNames, schema.fieldNames,
      schema.fieldNames.map(_ => null: String), properties.asJava)
    // replace is ATOMIC (rename-over in the catalog) — never drop+create,
    // which would expose a missing-view window and lose the old definition
    // on a crash between the two calls
    if (replace) cat.replaceView(info, /* orCreate = */ true)
    else cat.createView(info)
    Nil
  }
}

final case class DropIceViewCommand(
    catName: String, ns: String, viewName: String, ifExists: Boolean)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat   = spark.sessionState.catalogManager.catalog(catName).asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array(ns), viewName)
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}
