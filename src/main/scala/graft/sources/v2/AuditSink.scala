package graft.sources.v2

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE-side connector (`graft-audit`): a data-quality
  * audit sink — the write twin of [[EventGenSource]], completing the
  * connector surface (SURVEY §8.1).
  *
  * Every task counts rows and per-column nulls for the partition it
  * writes; those travel to the driver as `WriterCommitMessage`s and
  * `commit()` merges them into a metrics registry — exactly the
  * two-phase commit shape a real sink (JDBC, object store, Kafka
  * transactional producer) uses for exactly-once writes: side effects
  * stay provisional until the driver sees every task's message, and a
  * failed/speculated task's message is simply dropped (`abort`).
  * Metrics are additive per partition, so the aggregation is
  * associative and arrival order never matters — the same algebra that
  * makes the pattern work at 1000-executor scale, where commit
  * messages are the ONLY cross-node channel and the driver does O(1)
  * work per task.
  *
  * Capabilities: BATCH_WRITE + TRUNCATE (idempotent full-refresh
  * rerun: a truncate write resets the audit slot rather than
  * accumulating), schema accepted from the incoming DataFrame
  * (`supportsExternalMetadata`).
  */
class AuditSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-audit"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema, new CaseInsensitiveStringMap(properties))
}

/** Aggregated audit result for one named write. */
case class AuditReport(rows: Long, nullCounts: Map[String, Long],
    commits: Long)

/** Driver-side registry of committed audit metrics, keyed by the
  * `name` write option. */
object AuditSink {
  private val registry = new ConcurrentHashMap[String, AuditReport]()

  def report(name: String): Option[AuditReport] = Option(registry.get(name))

  private[v2] def merge(name: String, rows: Long,
      nulls: Map[String, Long], reset: Boolean): Unit =
    registry.compute(name, (_, prev) =>
      if (prev == null || reset) AuditReport(rows, nulls, 1L)
      else AuditReport(prev.rows + rows,
        (prev.nullCounts.keySet ++ nulls.keySet).map(k =>
          k -> (prev.nullCounts.getOrElse(k, 0L) + nulls.getOrElse(k, 0L)))
          .toMap,
        prev.commits + 1L))

  private[v2] def clear(name: String): Unit = registry.remove(name)
}

private class AuditTable(schema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsWrite {
  override def name(): String =
    s"graft-audit(${options.getOrDefault("name", "default")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AuditWriteBuilder(info.schema(),
      info.options.getOrDefault("name", "default"))
}

private class AuditWriteBuilder(schema: StructType, name: String,
    truncate: Boolean = false) extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new AuditWriteBuilder(schema, name, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AuditBatchWrite(schema, name, truncate)
    override def toStreaming: StreamingWrite =
      new AuditStreamingWrite(schema, name)
  }
}

/** Streaming flavor: one metrics merge per committed epoch — the same
  * two-phase shape, with the epoch id playing the transaction id. A
  * replayed epoch (failure recovery) re-commits the same messages, so
  * an exactly-once downstream would key dedup on (name, epochId);
  * metrics here accumulate per committed epoch like any append sink. */
private class AuditStreamingWrite(schema: StructType, name: String)
    extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = new AuditStreamingWriterFactory(schema.size)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    val nulls = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    messages.foreach { case AuditTaskMetrics(r, counts) =>
      rows += r
      schema.fieldNames.zip(counts).foreach { case (f, c) => nulls(f) += c }
    }
    AuditSink.merge(name, rows, nulls.toMap, reset = false)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

private class AuditBatchWrite(schema: StructType, name: String,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new AuditWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    val nulls = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    messages.foreach { case AuditTaskMetrics(r, counts) =>
      rows += r
      schema.fieldNames.zip(counts).foreach { case (f, c) => nulls(f) += c }
    }
    AuditSink.merge(name, rows, nulls.toMap, reset = truncate)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Per-task metrics — the commit message shape. */
private case class AuditTaskMetrics(rows: Long, nullCounts: Array[Long])
    extends WriterCommitMessage

private class AuditStreamingWriterFactory(nFields: Int)
    extends StreamingDataWriterFactory with Serializable {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = new AuditWriter(nFields)
}

private class AuditWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new AuditWriter(schema.size)
}

private class AuditWriter(nFields: Int) extends DataWriter[InternalRow] {
  private var rows = 0L
  private val nulls = new Array[Long](nFields)

  override def write(row: InternalRow): Unit = {
    rows += 1
    var i = 0
    while (i < nFields) {
      if (row.isNullAt(i)) nulls(i) += 1
      i += 1
    }
  }

  override def commit(): WriterCommitMessage = AuditTaskMetrics(rows, nulls)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
