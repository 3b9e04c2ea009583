package graft.cdc

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface for the point-in-time operators: the reference's consumer
  * layer queries CDC state in SQL (reference `README.md:57` — "current
  * state" and "as of" are query-time concepts), so the [[Versioned]]
  * operators must be reachable without writing Scala. Registration binds
  * a changelog frame to a session temp view plus the pk/version/action
  * metadata the operators need; the table-valued functions injected by
  * [[graft.core.GraftExtensions]] then make
  *
  * {{{
  *   SELECT * FROM snapshot('orders_v')
  *   SELECT * FROM as_of('orders_v', TIMESTAMP '1998-01-01 00:00:00')
  *   SELECT * FROM changes_between('orders_v', TIMESTAMP '…', TIMESTAMP '…')
  *   SELECT * FROM scd2('orders_v')
  * }}}
  *
  * first-class queries. Each TVF expands at ANALYSIS time into the same
  * logical plan the Scala API builds (one pk-window pass — see
  * [[Versioned]]'s scale notes), so Catalyst optimizes the expanded plan
  * together with the enclosing query: outer filters push into the
  * changelog scan exactly as they would through a hand-written subquery.
  */
object VersionedSql {

  /** pk/version/action metadata for one registered versioned table.
    * `dtCol`: the event-time date partition column, when the table was
    * written with Ingest's partitionByDate — as_of then routes through
    * asOfPruned, so whole date directories prune before any read. */
  final case class VersionedMeta(pk: Seq[String], versionCol: String,
                                 actionCol: String, dtCol: Option[String] = None)

  // Keyed per SESSION (weakly, so dropped sessions don't leak), then by
  // lower-cased view name (SQL identifiers are case-insensitive by
  // default). The temp views the TVFs resolve against are session-scoped,
  // so the metadata must be too: a JVM-global name→meta map let two
  // sessions registering different changelogs under one name cross-talk —
  // the LAST register's pk/version/dt metadata silently applied to the
  // OTHER session's view, producing wrong snapshots rather than an error.
  private val registry =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, VersionedMeta]]()

  /** Make `changelog` queryable as versioned table `name`: creates (or
    * replaces) the temp view in the changelog's own session and records
    * the metadata the point-in-time TVFs resolve against there. */
  def register(name: String, changelog: DataFrame, pk: Seq[String],
               versionCol: String = "update_date",
               actionCol: String = "action",
               dtCol: Option[String] = None): Unit = {
    changelog.createOrReplaceTempView(name)
    registry.synchronized {
      registry.computeIfAbsent(changelog.sparkSession,
        _ => new ConcurrentHashMap[String, VersionedMeta]())
    }.put(name.toLowerCase, VersionedMeta(pk, versionCol, actionCol, dtCol))
  }

  private def lookup(name: String): VersionedMeta = {
    val active = SparkSession.active
    val own = registry.synchronized(Option(registry.get(active)))
      .flatMap(m => Option(m.get(name)))
    own.getOrElse {
      // explicit single-registrant fallback: a session that never called
      // register itself (e.g. a spec helper's derived session) may still
      // resolve a name that exactly ONE session registered; two sessions
      // disagreeing on the name is the cross-talk case and must error.
      val others = registry.synchronized {
        import scala.jdk.CollectionConverters._
        registry.values.asScala.flatMap(m => Option(m.get(name))).toSeq
      }
      require(others.nonEmpty, s"'$name' is not a registered versioned table — " +
        "call graft.cdc.VersionedSql.register(name, changelog, pk, ...) first")
      require(others.distinct.size == 1,
        s"'$name' is registered with conflicting metadata by ${others.size} " +
          "sessions — register it in the querying session to disambiguate")
      others.head
    }
  }

  private def tableArg(e: Expression): (DataFrame, VersionedMeta) = {
    require(e.foldable, "versioned-table name must be a literal string")
    val name = e.eval().toString
    val m = lookup(name.toLowerCase) // metadata first: pointed error beats
    (SparkSession.active.table(name), m) // TABLE_OR_VIEW_NOT_FOUND
  }

  // The builders return the ANALYZED plan of the equivalent Scala-API
  // frame: self-consistent attribute ids, safe to splice as a TVF
  // relation into the enclosing (still-unresolved) query tree.
  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  private[graft] def snapshotPlan(es: Seq[Expression]): LogicalPlan = {
    val (df, m) = tableArg(es.head)
    plan(Versioned.latestSnapshot(df, m.pk, m.versionCol, m.actionCol))
  }

  private[graft] def asOfPlan(es: Seq[Expression]): LogicalPlan = {
    val (df, m) = tableArg(es.head)
    val t = Bridge.column(es(1))
    plan(m.dtCol match {
      case Some(dt) => Versioned.asOfPruned(df, t, m.pk, m.versionCol, m.actionCol, dt)
      case None     => Versioned.asOf(df, t, m.pk, m.versionCol, m.actionCol)
    })
  }

  private[graft] def changesBetweenPlan(es: Seq[Expression]): LogicalPlan = {
    val (df, m) = tableArg(es.head)
    plan(Versioned.changesBetween(df, Bridge.column(es(1)), Bridge.column(es(2)),
      m.versionCol))
  }

  private[graft] def scd2Plan(es: Seq[Expression]): LogicalPlan = {
    val (df, m) = tableArg(es.head)
    plan(Versioned.scd2(df, m.pk, m.versionCol, m.actionCol))
  }

  private[graft] def expireHistoryPlan(es: Seq[Expression]): LogicalPlan = {
    val (df, m) = tableArg(es.head)
    plan(Retention.expireHistory(df, Bridge.column(es(1)), m.pk,
      m.versionCol, m.actionCol))
  }
}
