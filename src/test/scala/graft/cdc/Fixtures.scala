package graft.cdc

/** Envelope + registry fixtures mirroring the observed reference contracts
  * (FIXTURES.md §1–§2): two tables whose registries deliberately disagree
  * on the type of `update_date` (STRING vs TIMESTAMP), delete tombstones
  * carrying only key fields, null AND missing payload fields, an
  * unregistered table.
  */
object Fixtures {

  val registryJson: String =
    """{
      |  "products": {
      |    "table_name": "warehouse.products_cdc",
      |    "schema": { "fields": [
      |      {"name": "product_id", "type": "STRING"},
      |      {"name": "category", "type": "STRING"},
      |      {"name": "weight_g", "type": "FLOAT"},
      |      {"name": "photos_qty", "type": "INT64"},
      |      {"name": "action", "type": "STRING"},
      |      {"name": "update_date", "type": "STRING"}
      |    ]}
      |  },
      |  "users": {
      |    "table_name": "warehouse.users_cdc",
      |    "schema": { "fields": [
      |      {"name": "user_id", "type": "INT64"},
      |      {"name": "email", "type": "STRING"},
      |      {"name": "balance", "type": "FLOAT"},
      |      {"name": "action", "type": "STRING"},
      |      {"name": "update_date", "type": "TIMESTAMP"}
      |    ]}
      |  }
      |}""".stripMargin

  lazy val registry: Map[String, TableSpec] = Registry.fromJson(registryJson)

  def envelope(obj: String, ts: String, changeType: String, payloadJson: String): String =
    s"""{"object":"$obj","source_timestamp":"$ts","source_metadata":{"change_type":"$changeType"},"payload":$payloadJson}"""

  /** A small deterministic changelog across both tables + one unknown. */
  val lines: Seq[String] = Seq(
    envelope("products", "2026-01-01T10:00:00.000Z", "insert",
      """{"product_id":"p1","category":"beauty","weight_g":225.0,"photos_qty":1}"""),
    envelope("products", "2026-01-01T11:00:00.000Z", "update",
      """{"product_id":"p1","category":"health","weight_g":225.0,"photos_qty":2}"""),
    // null-valued and missing fields must both land as SQL NULL
    envelope("products", "2026-01-01T12:00:00.000Z", "insert",
      """{"product_id":"p2","category":null,"weight_g":100.5}"""),
    // delete tombstone: key only
    envelope("products", "2026-01-01T13:00:00.000Z", "delete",
      """{"product_id":"p1"}"""),
    envelope("users", "2026-01-01T10:30:00.000Z", "insert",
      """{"user_id":7,"email":"a@x.io","balance":10.0}"""),
    envelope("users", "2026-01-02T09:00:00.000Z", "update",
      """{"user_id":7,"email":"b@x.io","balance":-3.25}"""),
    // unknown table -> dead letter, not failure
    envelope("mystery", "2026-01-01T10:00:00.000Z", "insert", """{"x":1}"""))

  /** Per-directory strictly increasing mtime counter. FileStreamSource
    * orders files by MODIFICATION TIME, so fixture files written within
    * the same millisecond (or with load-skewed timestamps) can land in a
    * different batch order run-to-run — which moves every batch-derived
    * quantity (compaction upTo, data-derived expiry horizons) and made
    * the expiry specs flake under full-suite load. Distinct, monotonic
    * mtimes pin file→batch composition deterministically. */
  private val mtimeSeq =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def writeLines(dir: String, name: String, ls: Seq[String], gzip: Boolean): Unit = {
    val path = java.nio.file.Paths.get(dir, name)
    if (gzip) {
      val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(path))
      try out.write((ls.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    } else {
      java.nio.file.Files.write(path, (ls.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    val seq = mtimeSeq.computeIfAbsent(dir,
      _ => new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis()))
    java.nio.file.Files.setLastModifiedTime(path,
      java.nio.file.attribute.FileTime.fromMillis(seq.addAndGet(1000L)))
  }
}
