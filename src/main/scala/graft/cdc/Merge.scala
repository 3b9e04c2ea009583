package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) between a target table and a change source —
  * the set-oriented equivalent of the reference's row-at-a-time
  * WRITE_APPEND + query-time versioning (reference
  * `src/dataflow-cdc-stream.py:86-92`): where [[Versioned.latestSnapshot]]
  * RESOLVES a changelog lazily at read time, `Merge.upsert` APPLIES one
  * batch of changes to a materialized table eagerly, producing the new
  * table image. This is the operator a warehouse job runs to maintain a
  * compacted mirror alongside the append-only history.
  *
  * Semantics (last-writer-wins row images, matching the CDC envelope
  * model — a change row carries the FULL new image, not a column delta):
  *   - target row matched by a source key  → replaced by the source row
  *     (or dropped, if the source row is flagged deleted);
  *   - target row unmatched               → kept as-is;
  *   - source row with an unmatched key   → inserted (unless deleted —
  *     a delete for an absent key is a no-op, same as tombstone replay).
  * Partial-column updates are expressed by pre-projecting the source
  * (join the old image in, override the columns to change) — keeping
  * this operator single-purpose keeps its plan single-shuffle.
  *
  * Scale shape: ONE left-anti equi-join of target against the source's
  * key projection (hash shuffle on pk — or a broadcast when the change
  * batch is small, which AQE decides from the batch's actual size at
  * runtime), then a shuffle-free union with the surviving source rows.
  * No full-outer wide rows, no per-column coalesce, nothing driver-side.
  * The source must hold at most one row per key (CDC batches folded by
  * [[Versioned.latestSnapshotWithTombstones]] satisfy this); duplicate
  * source keys would make the result nondeterministic, so we require the
  * caller to fold first rather than silently pick a winner here.
  */
object Merge {

  /** Apply one folded change batch to `target`. `deleteFlag`, if given,
    * names a boolean column on `source` marking tombstones; it is
    * consumed here and absent from the result. */
  def upsert(target: DataFrame, source: DataFrame, pk: Seq[String],
             deleteFlag: Option[String] = None): DataFrame = {
    require(pk.nonEmpty, "merge needs at least one key column")
    val live = deleteFlag match {
      case Some(f) => source.filter(!col(f)).drop(f)
      case None    => source
    }
    // anti-join against ALL source keys (deletes included): a matched
    // target row is superseded whether the source updates or deletes it.
    val sourceKeys = source.select(pk.map(col): _*)
    target.join(sourceKeys, pk, "left_anti").unionByName(live)
  }
}
