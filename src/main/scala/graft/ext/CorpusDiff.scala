package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning audit between two
  * corpus states (yesterday's crawl vs today's, pre- vs post-curation):
  * per document id, whether it was `added`, `removed`, `changed`, or
  * `unchanged`. The training-data complement of the CDC changelog view:
  * CDC diffs arrive as a log; corpus snapshots arrive as two directories,
  * and the diff must be COMPUTED.
  *
  * Scale shape: each side is projected to (id, md5(content)) BEFORE the
  * join, so the full-outer equi-join shuffles 16-byte digests, never
  * document bodies — at 100 TB the shuffle is O(ids), not O(corpus).
  * md5 of the UTF-8 bytes is engine-portable (identical hex in Spark and
  * any SQL engine), so the classification is exactly reproducible; a
  * same-content edit (touch with no byte change) is `unchanged` by
  * construction. One shuffle per side, nothing else.
  */
object CorpusDiff {

  /** Per-id diff status between two snapshots: (idCol, status) with
    * status ∈ added | removed | changed | unchanged. Ids must be unique
    * within each snapshot (corpus contract — enforce upstream with
    * [[Dedup.dedupByKey]] if needed). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    def digests(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol), md5(col(contentCol).cast("binary")).as(as))
    digests(oldSnap, "__h_old")
      .join(digests(newSnap, "__h_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
