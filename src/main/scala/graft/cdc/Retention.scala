package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention maintenance for append-only versioned tables — the
  * operational complement of [[Versioned]]: an unbounded changelog is
  * the reference's storage model (every change appends forever,
  * reference `README.md:57`), but real deployments bound history for
  * cost and for data-subject erasure. Both ops preserve the versioned
  * table's QUERY contract wherever they claim to.
  *
  * Scale shape: [[expireHistory]] is one pk-window pass over only the
  * expired slice plus a shuffle-free union (the same single-shuffle
  * discipline as [[Versioned.latestSnapshot]]); [[eraseKeys]] is one
  * anti join. Both produce a frame to REWRITE the table with — pair
  * them with [[Ingest.compactBatches]]-style directory swaps between
  * stream restarts.
  */
object Retention {

  /** Collapse history at or before `horizon` to its as-of(horizon)
    * state: per key, the newest version ≤ horizon survives — INCLUDING
    * tombstones (a key deleted before the horizon must keep its delete
    * row, or a replayed older batch could resurrect it — the
    * [[SnapshotMaintainer]] invariant); everything after the horizon is
    * untouched.
    *
    * Contract (spec-proven, incl. a scalacheck sweep): for every t ≥
    * horizon, `asOf(expired, t) == asOf(original, t)`, and
    * `changesBetween(a, b)` is unchanged for a > horizon. Queries
    * BEFORE the horizon are forfeited — that is the point of expiry. */
  def expireHistory(changelog: DataFrame, horizon: Column, pk: Seq[String],
                    versionCol: String = "update_date",
                    actionCol: String = "action"): DataFrame = {
    val old = changelog.filter(col(versionCol) <= horizon)
    val collapsed = Versioned.latestSnapshotWithTombstones(old, pk, versionCol, actionCol)
    collapsed.unionByName(changelog.filter(col(versionCol) > horizon))
  }

  /** Data-subject erasure: remove EVERY version of the given keys —
    * history, current state, and tombstones (erasure must not leave the
    * "a row existed" marker behind; replay protection for erased keys
    * is the caller's dead-letter filter, not a tombstone). All other
    * keys' history is byte-identical. `keys` must project exactly the
    * pk columns. */
  def eraseKeys(changelog: DataFrame, keys: DataFrame, pk: Seq[String]): DataFrame =
    changelog.join(keys.select(pk.map(col): _*).distinct(), pk, "left_anti")
}
