package graft.streaming.kafkadouble

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-SCOPE Kafka connector double (S7/S8, r4 verdict #8).
  *
  * The container ships neither the `spark-sql-kafka-0-10` connector nor
  * any broker (zero egress — resolution re-attempted and documented in
  * NOTES.md), so `format("kafka")` cannot bind to the real source here.
  * This double registers the SAME short name from the TEST classpath
  * only (the production artifact never carries it, so a real cluster
  * resolves the genuine connector with no ambiguity) and reproduces the
  * connector surface the pipeline relies on:
  *
  *   - the fixed read schema (key/value binary, topic, partition,
  *     offset, timestamp, timestampType);
  *   - `subscribe` (comma-separated), `startingOffsets`
  *     earliest/latest, `maxOffsetsPerTrigger` admission control;
  *   - Kafka's offset-JSON checkpoint format {"topic":{"0":42}};
  *   - micro-batch streaming reads, batch reads, streaming and batch
  *     writes (`topic` option or per-row `topic` column, key-hash or
  *     round-robin partitioning).
  *
  * Backed by [[InMemoryBroker]], a JVM-singleton topic store — valid in
  * local mode where executors share the driver JVM (asserted by the
  * wiring spec before use).
  */
object InMemoryBroker {
  final case class Rec(key: Array[Byte], value: Array[Byte], ts: Long)

  private val topics =
    new ConcurrentHashMap[String, Array[ArrayBuffer[Rec]]]()
  private val rr = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def createTopic(name: String, partitions: Int = 1): Unit =
    topics.putIfAbsent(name, Array.fill(partitions)(ArrayBuffer.empty[Rec]))

  def deleteTopic(name: String): Unit = { topics.remove(name); rr.remove(name) }

  def partitionsOf(name: String): Int =
    Option(topics.get(name)).map(_.length).getOrElse {
      createTopic(name); 1
    }

  /** Append; partition by key hash when keyed, round-robin otherwise —
    * the producer's default partitioner contract. Record timestamp is
    * the partition-local offset in ms (deterministic: tests must not
    * depend on wall clock).
    */
  def produce(topic: String, key: Array[Byte], value: Array[Byte]): Unit = {
    createTopic(topic)
    val parts = topics.get(topic)
    val p =
      if (key != null && key.nonEmpty)
        math.floorMod(util.Arrays.hashCode(key), parts.length)
      else
        math.floorMod(
          rr.computeIfAbsent(topic, _ => new java.util.concurrent.atomic.AtomicLong())
            .getAndIncrement(), parts.length.toLong).toInt
    parts(p).synchronized {
      parts(p) += Rec(key, value, parts(p).length.toLong)
    }
  }

  def endOffsets(topic: String): Map[Int, Long] = {
    createTopic(topic)
    topics.get(topic).zipWithIndex
      .map { case (buf, i) => i -> buf.synchronized(buf.length.toLong) }.toMap
  }

  def slice(topic: String, partition: Int, from: Long, until: Long): Seq[Rec] = {
    val buf = topics.get(topic)(partition)
    buf.synchronized(buf.slice(from.toInt, until.toInt).toVector)
  }
}

/** {"topic":{"0":42,"1":7}} — the connector's checkpoint offset shape. */
final class KOffset(val offsets: Map[String, Map[Int, Long]]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1).map { case (t, ps) =>
      val inner = ps.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p":$o""" }.mkString(",")
      s""""$t":{$inner}"""
    }.mkString("{", ",", "}")
}

object KOffset {
  private val TopicRx = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
  private val PartRx = """"(\d+)"\s*:\s*(\d+)""".r

  def parse(json: String): KOffset =
    new KOffset(TopicRx.findAllMatchIn(json).map { m =>
      m.group(1) -> PartRx.findAllMatchIn(m.group(2))
        .map(pm => pm.group(1).toInt -> pm.group(2).toLong).toMap
    }.toMap)

  def earliest(topics: Seq[String]): KOffset =
    new KOffset(topics.map(t =>
      t -> (0 until InMemoryBroker.partitionsOf(t)).map(_ -> 0L).toMap).toMap)

  def latest(topics: Seq[String]): KOffset =
    new KOffset(topics.map(t => t -> InMemoryBroker.endOffsets(t)).toMap)
}

class GraftKafkaTestProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKafkaTestProvider.ReadSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaDoubleTable(new CaseInsensitiveStringMap(properties))
}

object GraftKafkaTestProvider {
  /** The connector's fixed read schema, field-for-field. */
  val ReadSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def subscribed(options: CaseInsensitiveStringMap): Seq[String] = {
    val sub = options.get("subscribe")
    require(sub != null && sub.nonEmpty,
      "the kafka double requires a `subscribe` topic list")
    sub.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }
}

class KafkaDoubleTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-kafka-double"
  override def schema(): StructType = GraftKafkaTestProvider.ReadSchema
  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
    TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaDoubleScan(opts)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KafkaDoubleWriteBuilder(info)
}

final case class RangePartition(topic: String, partition: Int,
                                from: Long, until: Long) extends InputPartition

class KafkaDoubleScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = GraftKafkaTestProvider.ReadSchema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val topics = GraftKafkaTestProvider.subscribed(options)
      topics.flatMap { t =>
        InMemoryBroker.endOffsets(t).toSeq.sortBy(_._1).map { case (p, end) =>
          RangePartition(t, p, 0L, end)
        }
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new RangeReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaDoubleMicroBatch(options)
}

class KafkaDoubleMicroBatch(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private val topics = GraftKafkaTestProvider.subscribed(options)

  // Trigger.AvailableNow contract: pin the end offsets at query start;
  // records produced after the pin drain in the NEXT run
  @volatile private var availableNowEnd: Option[Map[String, Map[Int, Long]]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(KOffset.latest(topics).offsets)

  private def cappedEnd: Map[String, Map[Int, Long]] = {
    val live = KOffset.latest(topics).offsets
    availableNowEnd match {
      case None => live
      case Some(cap) => live.map { case (t, ps) =>
        t -> ps.map { case (p, o) =>
          p -> math.min(o, cap.getOrElse(t, Map.empty).getOrElse(p, 0L)) }
      }
    }
  }

  override def initialOffset(): Offset =
    options.getOrDefault("startingOffsets", "latest") match {
      case "earliest" => KOffset.earliest(topics)
      case "latest" => KOffset.latest(topics)
      case json => KOffset.parse(json)
    }

  override def getDefaultReadLimit: ReadLimit = {
    val max = options.getLong("maxOffsetsPerTrigger", 0L)
    if (max > 0) ReadLimit.maxRows(max) else ReadLimit.allAvailable()
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KOffset].offsets
    val end = cappedEnd
    limit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        // clamp total new rows to maxRows, spread topic-partition by
        // topic-partition in sorted order (deterministic admission)
        var budget = rl.maxRows()
        val clamped = end.toSeq.sortBy(_._1).map { case (t, ps) =>
          t -> ps.toSeq.sortBy(_._1).map { case (p, e) =>
            val from = s.getOrElse(t, Map.empty).getOrElse(p, 0L)
            val take = math.min(e - from, budget).max(0L)
            budget -= take
            p -> (from + take)
          }.toMap
        }.toMap
        new KOffset(clamped)
      case _ => new KOffset(end)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KOffset].offsets
    val e = end.asInstanceOf[KOffset].offsets
    e.toSeq.sortBy(_._1).flatMap { case (t, ps) =>
      ps.toSeq.sortBy(_._1).flatMap { case (p, until) =>
        val from = s.getOrElse(t, Map.empty).getOrElse(p, 0L)
        if (until > from) Some(RangePartition(t, p, from, until)) else None
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new RangeReaderFactory
  override def deserializeOffset(json: String): Offset = KOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class RangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rp = partition.asInstanceOf[RangePartition]
    val recs = InMemoryBroker.slice(rp.topic, rp.partition, rp.from, rp.until).iterator
    var i = rp.from - 1
    new PartitionReader[InternalRow] {
      private var cur: InMemoryBroker.Rec = _
      override def next(): Boolean = {
        if (!recs.hasNext) return false
        cur = recs.next(); i += 1; true
      }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur.key, cur.value, UTF8String.fromString(rp.topic), rp.partition,
        i, cur.ts * 1000L, 0))
      override def close(): Unit = ()
    }
  }
}

/** Serializable factory shipped to tasks — must not capture the
  * builder (LogicalWriteInfo is not serializable).
  */
final case class KafkaDoubleWriterFactory(schema: StructType, topicOpt: Option[String])
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KafkaDoubleWriter(schema, topicOpt)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new KafkaDoubleWriter(schema, topicOpt)
}

class KafkaDoubleWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder {
  private val factory =
    KafkaDoubleWriterFactory(info.schema(), Option(info.options.get("topic")))

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
        factory
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
    override def toStreaming: StreamingWrite = new StreamingWrite {
      override def createStreamingWriterFactory(i: PhysicalWriteInfo): StreamingDataWriterFactory =
        factory
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

/** Producer side: `value` required (string or binary), `key` and
  * per-row `topic` optional — the connector's sink contract.
  */
class KafkaDoubleWriter(schema: StructType, topicOpt: Option[String])
    extends DataWriter[InternalRow] {
  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val vi = idx("value")
  require(vi >= 0, "kafka sink requires a `value` column")
  private val vBinary = schema(vi).dataType == BinaryType
  private val ki = idx("key")
  private val kBinary = ki >= 0 && schema(ki).dataType == BinaryType
  private val ti = idx("topic")
  require(topicOpt.isDefined || ti >= 0,
    "kafka sink requires a `topic` option or column")

  override def write(row: InternalRow): Unit = {
    val value =
      if (row.isNullAt(vi)) null
      else if (vBinary) row.getBinary(vi)
      else row.getUTF8String(vi).getBytes
    val key =
      if (ki < 0 || row.isNullAt(ki)) null
      else if (kBinary) row.getBinary(ki)
      else row.getUTF8String(ki).getBytes
    val topic = topicOpt.getOrElse(row.getUTF8String(ti).toString)
    InMemoryBroker.produce(topic, key, value)
  }
  override def commit(): WriterCommitMessage = new WriterCommitMessage {}
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
