package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A queue-SHAPED streaming source with Kafka's offset semantics, backed
  * by an append-only directory of immutable segment files — the in-repo
  * stand-in that proves the reference's S1 queue seam (`dataflow-cdc-
  * stream.py:138` consumes Pub/Sub; deployments front CDC logs with
  * Kafka) in an environment where no broker and no connector jar can
  * exist.
  *
  * What makes it queue-shaped rather than file-shaped:
  *  - records are addressed by a GLOBAL MONOTONIC OFFSET (position in the
  *    filename-sorted concatenation of segments), not by file identity;
  *  - progress is tracked as an offset RANGE per micro-batch, resumed
  *    from the checkpoint exactly like Kafka's (start, end] ranges —
  *    restart picks up at the committed offset, never re-reads, never
  *    skips;
  *  - admission is bounded by `maxRecordsPerTrigger` through Spark's
  *    [[SupportsAdmissionControl]] — the same engine path Kafka's
  *    `maxOffsetsPerTrigger` rides, so bounded-batch replay behavior is
  *    exercised for real.
  *
  * The segment contract mirrors a partition's log: files are appended
  * whole, never modified (producers write `NNNN.seg` atomically), and
  * sort lexicographically in production order. One directory models one
  * partition; real deployments swap this class for the Kafka connector —
  * everything downstream of `.load()` (the whole CdcStream pipeline) is
  * IDENTICAL, schema included (`value STRING`, the post-[[graft.streaming
  * .CdcStream.kafkaLines]] shape).
  */
object QueueSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Filename-sorted immutable segments + their record counts.
    * Counting is one pass per NEW segment per planning cycle at most —
    * counts are cached by (name, length) since segments never mutate. */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()

  private[sources] def segments(dir: String): Seq[(String, Long)] = {
    val d = new java.io.File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".seg")).sortBy(_.getName)
    fs.toIndexedSeq.map { f =>
      val key = (f.getAbsolutePath, f.length())
      val n = countCache.computeIfAbsent(key, _ => {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().size.toLong finally src.close()
      })
      (f.getAbsolutePath, n)
    }
  }

  /** Producer-side helper for tests/tools: append one immutable segment
    * (write tmp + atomic rename — a half-written segment is never
    * visible). */
  def appendSegment(dir: String, name: String, lines: Seq[String]): Unit = {
    val d = new java.io.File(dir); d.mkdirs()
    require(name.endsWith(".seg"), s"segment name must end in .seg: $name")
    val tmp = new java.io.File(d, s".$name.tmp")
    val out = new java.io.PrintWriter(tmp, "UTF-8")
    try lines.foreach(out.println) finally out.close()
    require(tmp.renameTo(new java.io.File(d, name)), s"segment publish failed: $name")
  }
}

class QueueSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new QueueTable(properties.get("path"),
      Option(properties.get("maxrecordspertrigger"))
        .orElse(Option(properties.get("maxRecordsPerTrigger"))).map(_.toLong))
}

private[sources] class QueueTable(path: String, maxPerTrigger: Option[Long])
    extends Table with SupportsRead {
  require(path != null, "graft-queue: 'path' option is required")
  override def name(): String = s"graft-queue($path)"
  override def schema(): StructType = QueueSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = QueueSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new QueueMicroBatchStream(path, maxPerTrigger)
      }
    }
}

/** Global-offset micro-batch stream over the segment directory. */
private[sources] class QueueMicroBatchStream(dir: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def total: Long = QueueSource.segments(dir).map(_._2).sum

  /** Trigger.AvailableNow contract: the run drains up to the offset
    * captured HERE (segments appended mid-run wait for the next run),
    * still in admission-bounded micro-batches — without this the engine
    * falls back to one giant batch, hiding the bounded-replay behavior
    * the queue seam exists to exercise. */
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(total)

  override def initialOffset(): Offset = QueueOffset(0L)
  override def deserializeOffset(json: String): Offset = QueueOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[QueueOffset].n
    val avail = availableNowCap.getOrElse(total)
    limit match {
      case m: ReadMaxRows => QueueOffset(math.min(avail, from + m.maxRows()))
      case _ => QueueOffset(avail)
    }
  }

  override def reportLatestOffset(): Offset = QueueOffset(total)

  /** One partition per segment slice intersecting (start, end]. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[QueueOffset].n
    val to = end.asInstanceOf[QueueOffset].n
    val parts = Seq.newBuilder[InputPartition]
    var base = 0L
    QueueSource.segments(dir).foreach { case (path, n) =>
      val lo = math.max(from, base)
      val hi = math.min(to, base + n)
      if (hi > lo) parts += QueueSlice(path, lo - base, hi - base)
      base += n
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val s = partition.asInstanceOf[QueueSlice]
        new PartitionReader[InternalRow] {
          private val src = scala.io.Source.fromFile(s.path, "UTF-8")
          private val it = src.getLines().slice(s.fromLine.toInt, s.toLine.toInt)
          private var current: String = _
          override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(current))
          override def close(): Unit = src.close()
        }
      }
    }
}

private[sources] case class QueueOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] case class QueueSlice(path: String, fromLine: Long, toLine: Long)
    extends InputPartition
