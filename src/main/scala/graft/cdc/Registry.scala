package graft.cdc

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One logical CDC table: registry key, physical destination, schema. */
final case class TableSpec(logicalName: String, physicalName: String, schema: StructType) {
  /** Columns that come from the change-event payload (everything except
    * the two synthetic columns the pipeline appends). */
  def payloadSchema: StructType =
    StructType(schema.filterNot(f => Registry.SyntheticCols.contains(f.name)))

  def updateDateType: DataType =
    schema.find(_.name == "update_date").map(_.dataType).getOrElse(StringType)
}

/** Loader for the external JSON schema registry.
  *
  * File shape is compatible with the reference's `src/data-stream.json:1-36`:
  * `{ "<logical>": { "table_name": "...", "schema": { "fields": [
  * {"name": ..., "type": <BigQuery legacy type>} ] } } }`. Types are mapped
  * per SURVEY.md §1.2. The registry is loaded ONCE per pipeline and shipped
  * to executors as a broadcast/closure constant — never fetched per record
  * (the reference's per-record GCS fetch at `dataflow-cdc-stream.py:71-74`
  * is its throughput ceiling; see SURVEY.md §4.2).
  */
object Registry {

  /** Synthetic columns appended to every payload
    * (reference `dataflow-cdc-stream.py:66-67`). */
  val SyntheticCols: Set[String] = Set("action", "update_date")

  /** BigQuery legacy SQL type names → Spark types (SURVEY.md §1.2). */
  def sparkType(bqType: String): DataType = bqType.toUpperCase match {
    case "STRING"             => StringType
    case "FLOAT" | "FLOAT64"  => DoubleType
    case "INT64" | "INTEGER"  => LongType
    case "TIMESTAMP"          => TimestampType
    case "DATE"               => DateType
    case "BOOL" | "BOOLEAN"   => BooleanType
    case "NUMERIC"            => DecimalType(38, 9)
    case "BYTES"              => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported registry type: $other")
  }

  def fromJson(text: String): Map[String, TableSpec] =
    JsonMethods.parse(text) match {
      case JObject(tables) =>
        tables.map { case (logical, spec) =>
          val physical = spec \ "table_name" match {
            case JString(s) => s
            case _          => logical
          }
          val fields = spec \ "schema" \ "fields" match {
            case JArray(fs) => fs.map { f =>
              val name = f \ "name" match {
                case JString(s) => s
                case _ => throw new IllegalArgumentException(s"registry field without name in $logical")
              }
              val tpe = f \ "type" match {
                case JString(s) => s
                case _ => throw new IllegalArgumentException(s"registry field $name without type in $logical")
              }
              StructField(name, sparkType(tpe), nullable = true)
            }
            case _ => throw new IllegalArgumentException(s"registry entry $logical has no schema.fields")
          }
          logical -> TableSpec(logical, physical, StructType(fields))
        }.toMap
      case _ => throw new IllegalArgumentException("registry root must be a JSON object")
    }

  def load(path: String): Map[String, TableSpec] =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Hot-refresh guard: a TYPE change on an existing column would make
    * the next `batch=<id>` dir unreadable together with the previous
    * ones (mergeSchema cannot reconcile e.g. DOUBLE vs STRING — the
    * reference's own registry carries exactly this hazard, its
    * `update_date` being STRING for one table and TIMESTAMP for another,
    * `data-stream.json:17,31`), silently poisoning the physical table.
    * Table specs with a type flip are REJECTED — the previous spec stays
    * in force — and reported for loud logging. Added tables, added
    * columns, and removed columns pass through: mergeSchema reads union
    * those safely. Returns (effective registry, rejection diagnostics). */
  def refreshCompatible(current: Map[String, TableSpec],
                        fresh: Map[String, TableSpec]): (Map[String, TableSpec], Seq[String]) = {
    val rejected = Seq.newBuilder[String]
    val merged = fresh.map { case (name, spec) =>
      current.get(name) match {
        case Some(old) =>
          val oldTypes = old.schema.map(f => f.name -> f.dataType).toMap
          val flips = spec.schema.flatMap(f => oldTypes.get(f.name)
            .filter(_ != f.dataType)
            .map(was => s"${f.name}: $was -> ${f.dataType}"))
          // a physical-name change silently reroutes a RUNNING stream's
          // appends/folds to a fresh directory, splitting the table's
          // history — the same hazard class as a type flip; reject it
          // (renames are a restart-time storage migration, not a
          // hot-refresh edit)
          val renamed = spec.physicalName != old.physicalName
          if (flips.nonEmpty || renamed) {
            val why = flips ++
              (if (renamed) Seq(s"physical ${old.physicalName} -> ${spec.physicalName}") else Nil)
            rejected += s"$name [${why.mkString(", ")}]"; name -> old
          } else name -> spec
        case None => name -> spec
      }
    }
    (merged, rejected.result())
  }
}
