package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time query layer over append-only versioned CDC tables.
  *
  * The reference stores every insert/update/delete as an appended row and
  * delegates "current state" / "as-of" to query time (reference
  * `README.md:57,65`: a delete appends a tombstone row; a record's
  * presence depends on the moment queried). These are the first-class
  * operators that realize those semantics (SURVEY.md §2.3).
  *
  * Scale posture: every op is one window pass partitioned by the primary
  * key — a single hash shuffle on pk, no self-joins, no driver
  * collection. On a cluster, versioned tables should additionally be
  * date-partitioned on `versionCol` so `asOf`/`changesBetween` prune
  * partitions before the shuffle.
  */
object Versioned {

  val DeleteAction = "delete"

  private def keyWindow(pk: Seq[String], versionCol: String, actionCol: String) =
    Window.partitionBy(pk.map(col): _*)
      // action desc-tiebreak makes the result deterministic if one key has
      // two events on the same version timestamp ("update" > "insert").
      .orderBy(col(versionCol).desc, col(actionCol).desc)

  /** Newest version per key INCLUDING tombstone rows — the state kept by
    * incremental snapshot maintenance (a delete must stay materialized so
    * replayed older versions can't resurrect the key). */
  def latestSnapshotWithTombstones(changelog: DataFrame, pk: Seq[String],
                                   versionCol: String = "update_date",
                                   actionCol: String = "action"): DataFrame =
    changelog
      .withColumn("__rn", row_number().over(keyWindow(pk, versionCol, actionCol)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Newest non-delete version per key; keys whose latest event is a
    * delete are absent (tombstone semantics, reference README.md:57). */
  def latestSnapshot(changelog: DataFrame, pk: Seq[String],
                     versionCol: String = "update_date",
                     actionCol: String = "action"): DataFrame =
    latestSnapshotWithTombstones(changelog, pk, versionCol, actionCol)
      .filter(col(actionCol) =!= DeleteAction)

  /** Table state as of timestamp `t` (events after `t` invisible). */
  def asOf(changelog: DataFrame, t: Column, pk: Seq[String],
           versionCol: String = "update_date",
           actionCol: String = "action"): DataFrame =
    latestSnapshot(changelog.filter(col(versionCol) <= t), pk, versionCol, actionCol)

  /** `asOf` over a date-partitioned versioned table (Ingest with
    * partitionByDate): the extra `dtCol <= date(t)` predicate is a
    * PARTITION filter — whole directories prune before any read or
    * shuffle, which is what makes point-in-time queries tractable when
    * the changelog is years long. */
  def asOfPruned(changelog: DataFrame, t: Column, pk: Seq[String],
                 versionCol: String = "update_date",
                 actionCol: String = "action",
                 dtCol: String = "_dt"): DataFrame =
    latestSnapshot(
      changelog.filter(col(dtCol) <= to_date(t) && col(versionCol) <= t),
      pk, versionCol, actionCol).drop(dtCol)

  /** Full ordered version chain of one key. */
  def history(changelog: DataFrame, keyPredicate: Column,
              versionCol: String = "update_date"): DataFrame =
    changelog.filter(keyPredicate).orderBy(col(versionCol))

  /** Audit slice: all events with t1 < version <= t2. */
  def changesBetween(changelog: DataFrame, t1: Column, t2: Column,
                     versionCol: String = "update_date"): DataFrame =
    changelog.filter(col(versionCol) > t1 && col(versionCol) <= t2)

  /** As-of join: enrich each fact row with the dimension VERSION that was
    * current at the fact's own timestamp — the point-in-time companion of
    * `asOf` for whole fact tables (e.g. lineitems against the orders
    * changelog at ship time).
    *
    * Spark-first shape: no inequality join (which would degenerate to a
    * per-key nested loop). Both sides union into one stream tagged
    * fact/version, one hash shuffle + sort per key on (time, tag), and a
    * running `last(dimCol, ignoreNulls)` window carries the newest
    * version's columns forward onto each fact row. O(n log n) per key,
    * single shuffle, AQE-skew-splittable — survives 100 TB.
    *
    * Ties: a version with time == fact time IS visible (sorted before the
    * fact by the tag). Facts before the first version drop (inner
    * semantics) — matches SQL `ASOF JOIN`.
    *
    * `tombstones = true` (default): a version row with action 'delete'
    * is a tombstone — facts after it get NO match (true point-in-time
    * existence). `tombstones = false`: delete rows are ignored and facts
    * match the newest surviving version — the semantics SQL engines give
    * when a `WHERE action <> 'delete'` predicate is pushed into the ASOF
    * join's version side.
    */
  /** As-of join for a SMALL version table (dimension-style CDC): per-key
    * version chains collapse into one time-sorted array, the chain table
    * broadcasts, and every fact row resolves its version map-side —
    * **zero shuffle of the fact table**, the shape that matters when
    * facts are 100 TB and the slowly-changing dimension is megabytes.
    * [[asOfJoin]] (union + pk-window) is the peer-scale variant for when
    * BOTH sides are large.
    *
    * Ties on the version timestamp resolve by struct order (action, then
    * dim values) — the corpus changelog has unique (pk, ts), so the two
    * variants agree everywhere they're compared (VersionedSpec pins it).
    */
  def asOfJoinBroadcast(facts: DataFrame, changelog: DataFrame,
                        pk: Seq[String], factTimeCol: String,
                        versionCol: String = "update_date",
                        actionCol: String = "action",
                        tombstones: Boolean = true): DataFrame = {
    val versions =
      if (tombstones) changelog
      else changelog.filter(col(actionCol) =!= DeleteAction)
    val dimCols = changelog.columns.filterNot(c =>
      pk.contains(c) || c == versionCol || c == actionCol).toSeq
    val factCols = facts.columns.filterNot(c => pk.contains(c) || c == factTimeCol).toSeq

    val verStruct = struct(
      (col(versionCol).as("__t") +: col(actionCol).as("__action") +:
        dimCols.map(col)): _*)
    val chains = versions.groupBy(pk.map(col): _*)
      .agg(sort_array(collect_list(verStruct)).as("__chain"))

    val probed = facts
      .join(broadcast(chains), pk, "inner")
      .withColumn("__hits",
        filter(col("__chain"), v => v.getField("__t") <= col(factTimeCol)))
      // guarded element_at: ANSI mode throws on out-of-bounds, and a fact
      // older than every version has an empty hit list
      .withColumn("__cv",
        when(size(col("__hits")) > 0, element_at(col("__hits"), size(col("__hits")))))
      .filter(col("__cv").isNotNull && col("__cv.__action") =!= DeleteAction)

    probed.select((pk.map(col) :+ col(factTimeCol)) ++
      factCols.map(col) ++ dimCols.map(c => col(s"__cv.$c").as(c)): _*)
  }

  def asOfJoin(facts: DataFrame, changelog: DataFrame,
               pk: Seq[String], factTimeCol: String,
               versionCol: String = "update_date",
               actionCol: String = "action",
               tombstones: Boolean = true): DataFrame = {
    val versions =
      if (tombstones) changelog
      else changelog.filter(col(actionCol) =!= DeleteAction)
    val dimCols = changelog.columns.filterNot(c =>
      pk.contains(c) || c == versionCol || c == actionCol).toSeq
    val factCols = facts.columns.filterNot(c => pk.contains(c) || c == factTimeCol).toSeq

    // the whole version rides as ONE non-null struct per version row, so
    // `last(ignoreNulls)` carries the newest version atomically — carrying
    // dim columns individually would resurrect older values whenever a
    // newer version legitimately holds NULL in some column
    val verStruct = struct((dimCols.map(col) :+ col(actionCol).as("__action")): _*)
    val vSide = versions.select(
      (pk.map(col) :+ col(versionCol).as("__t") :+ lit(0).as("__tag") :+
        verStruct.as("__v")) ++ factCols.map(c => lit(null).as(c)): _*)
    val fSide = facts.select(
      (pk.map(col) :+ col(factTimeCol).as("__t") :+ lit(1).as("__tag") :+
        lit(null).cast(vSide.schema("__v").dataType).as("__v")) ++
        factCols.map(col): _*)

    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    vSide.unionAll(fSide)
      .withColumn("__cv", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 &&
        col("__cv").isNotNull && col("__cv.__action") =!= DeleteAction)
      .select((pk.map(col) :+ col("__t").as(factTimeCol)) ++
        factCols.map(col) ++ dimCols.map(c => col(s"__cv.$c").as(c)): _*)
  }

  /** [[asOfJoin]] with a MAX-STALENESS bound (pandas merge_asof's
    * `tolerance`): a fact matches the newest version at-or-before its
    * timestamp ONLY if that version is within `tolerance` of the fact —
    * staler matches drop (inner-join semantics). Implemented
    * compositionally: the version timestamp rides the version struct as
    * an extra dimension column (`versionTsOut`, kept in the output) and
    * the bound is a post-filter — same single pk shuffle as [[asOfJoin]],
    * because the as-of match is unchanged and only its result is gated. */
  def asOfJoinWithin(facts: DataFrame, changelog: DataFrame,
                     pk: Seq[String], factTimeCol: String,
                     tolerance: Column,
                     versionCol: String = "update_date",
                     actionCol: String = "action",
                     tombstones: Boolean = true,
                     versionTsOut: String = "version_ts"): DataFrame =
    asOfJoin(facts, changelog.withColumn(versionTsOut, col(versionCol)),
        pk, factTimeCol, versionCol, actionCol, tombstones)
      .filter(col(versionTsOut) >= col(factTimeCol) - tolerance)

  /** Per-column change frequency across consecutive versions — the CDC
    * churn audit: of all non-delete → non-delete version transitions,
    * how often did each payload column actually change? The read that
    * sizes downstream incremental work (a column that never changes
    * needs no SCD2 tracking; one that changes every update dominates
    * delta volume) and catches upstream capture bugs (a column
    * "changing" on 100% of updates usually means a formatting
    * instability, not data).
    *
    * One pk-partitioned lag window (the [[history]] shuffle) + ONE fused
    * aggregation over all columns (N columns never multiply corpus
    * passes — the DataAudit discipline), melted to one row per column.
    * Null-safe comparison; all-integer output (col_name, n_transitions,
    * n_changed). */
  def columnChurn(changelog: DataFrame, pk: Seq[String],
                  payloadCols: Seq[String],
                  versionCol: String = "update_date",
                  actionCol: String = "action"): DataFrame = {
    require(payloadCols.nonEmpty)
    // user-supplied identifiers are backtick-quoted (embedded backticks
    // doubled) so names with spaces/dots/hyphens/quotes resolve as the
    // literal column, never as a nested-field path or broken SQL; all
    // GENERATED intermediates are indexed (__cur_0, __chg_0 …) so the
    // payload name never appears inside an identifier at all — it only
    // survives as a string literal in the melt struct
    def qcol(n: String) = col("`" + n.replace("`", "``") + "`")
    val idx = payloadCols.zipWithIndex
    val w = Window.partitionBy(pk.map(qcol): _*)
      .orderBy(qcol(versionCol), qcol(actionCol))
    val prev = changelog.select(
      (Seq(qcol(actionCol).as("__a"), lag(qcol(actionCol), 1).over(w).as("__pa")) ++
        idx.flatMap { case (c, i) =>
          Seq(qcol(c).as(s"__cur_$i"), lag(qcol(c), 1).over(w).as(s"__prev_$i"))
        }).toIndexedSeq: _*)
    val tr = prev.filter(col("__pa").isNotNull &&
      col("__a") =!= DeleteAction && col("__pa") =!= DeleteAction)
    val aggs = count(lit(1)).as("__n") +: idx.map { case (_, i) =>
      coalesce(sum(when(!(col(s"__cur_$i") <=> col(s"__prev_$i")), 1L)
        .otherwise(0L)), lit(0L)).as(s"__chg_$i")
    }
    val one = tr.agg(aggs.head, aggs.tail: _*)
    // typed melt (explode over an array of structs) replaces the former
    // stack() SQL string — nothing user-controlled is ever parsed
    val melt = explode(array(idx.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__chg_$i").as("n_changed"))
    }: _*))
    one.select(melt.as("m"), col("__n").as("n_transitions"))
      .select(col("m.col_name").as("col_name"), col("n_transitions"),
        col("m.n_changed").as("n_changed"))
      .orderBy("col_name")
  }

  /** SCD2 view: each version gains a validity interval
    * [valid_from, valid_to); the current version has valid_to = null. */
  def scd2(changelog: DataFrame, pk: Seq[String],
           versionCol: String = "update_date",
           actionCol: String = "action"): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(versionCol), col(actionCol))
    changelog
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && col(actionCol) =!= DeleteAction)
  }
}
