package graft.sources.v2

import java.time.Instant

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptions}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.connectors.ConnectorDefs
import graft.core.Json
import graft.sources.JdkHttpClient

/** Continuous incremental sync as Structured Streaming: each micro-batch is
  * one cursor window `[start.To, end.To)` of the connector's incremental
  * stream — the reference's "run the sync again with the persisted state"
  * loop (`shopify.go:67-72` window + state re-issue) becomes `readStream`
  * with the cursor as a CHECKPOINTED stream offset. Exactly-once batch
  * boundaries come from Spark's offset log: on restart the query resumes
  * from the last committed window end, precisely the semantics the
  * reference gets from persisting `state.To` after a successful sync.
  *
  * Mechanics:
  *  - offset = `{"to": <rfc3339>}`; the initial offset is the `state`
  *    option's `To` (or epoch for a first sync);
  *  - `latestOffset` = the current wall clock (overridable via the
  *    `nowOverride` option for deterministic tests);
  *  - each batch plans ONE partition (cursor chains are sequential); the
  *    reader issues the runner's request with state `{"To": start}` — the
  *    incremental window pushdown — and additionally filters records to
  *    `start <= cursor < end` so batch boundaries are exact even when the
  *    upstream API returns the full tail. Records with a missing/unparseable
  *    cursor are kept (at-least-once; the engine-side dedup operators are
  *    the downstream guard, same stance as the reference's at-least-once
  *    delivery).
  */
final class HttpMicroBatchStream(readSchema: StructType, props: Map[String, String])
    extends MicroBatchStream {

  private val options = new CaseInsensitiveStringMap(props.asJava)

  private def cursorField: Option[String] =
    Option(options.get("connector")).flatMap(ConnectorDefs.all.get).flatMap { src =>
      Option(options.get("stream"))
        .flatMap(n => src.httpStreams.find(_._1.name == n))
        .orElse(src.httpStreams.headOption)
        .flatMap(_._1.iterateBy.map(_.dotted))
    }

  override def initialOffset(): Offset =
    CursorOffset(props.get("state").map(Json.parse)
      .flatMap(n => Option(n.get("To")).map(_.asText))
      .getOrElse("1970-01-01T00:00:00Z"))

  override def latestOffset(): Offset =
    CursorOffset(props.getOrElse("nowOverride", Instant.now().toString))

  override def deserializeOffset(json: String): Offset =
    CursorOffset(Json.parse(json).get("to").asText)

  override def commit(end: Offset): Unit = () // Spark's offset log is the state store

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[CursorOffset].to, end.asInstanceOf[CursorOffset].to)
    if (s == e) Array.empty
    else Array(HttpStreamPartition(s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpStreamReaderFactory(readSchema, props, cursorField)

  override def stop(): Unit = ()
}

/** JSON offset: the window's exclusive upper bound after the batch. */
final case class CursorOffset(to: String) extends Offset {
  override def json(): String = s"""{"to":${Json.write(Json.mapper.valueToTree(to))}}"""
}

final case class HttpStreamPartition(startTo: String, endTo: String) extends InputPartition

final class HttpStreamReaderFactory(readSchema: StructType, props: Map[String, String],
    cursorField: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HttpStreamPartition]
    new HttpStreamPartitionReader(readSchema, props, p, cursorField)
  }
}

/** One micro-batch window: the standard transport stack (per-JVM budget,
  * retry outside pacing — same as the batch partition reader), the runner's
  * request issued with state `{"To": start}`, and an exact record-level
  * window filter on the cursor field.
  */
final class HttpStreamPartitionReader(readSchema: StructType, props: Map[String, String],
    part: HttpStreamPartition, cursorField: Option[String])
    extends PartitionReader[InternalRow] {

  private val client = {
    val options = new CaseInsensitiveStringMap(props.asJava)
    val src = ConnectorDefs.all(options.get("connector"))
    graft.core.Connector.transport(src, new JdkHttpClient())
  }

  private def parseInstant(s: String): Option[Instant] =
    scala.util.Try(Instant.parse(s)).toOption

  private val startI = parseInstant(part.startTo)
  private val endI = parseInstant(part.endTo)

  private def inWindow(recordJson: String): Boolean = cursorField match {
    case None => true
    case Some(f) =>
      val c = f.split('.').foldLeft(Json.parse(recordJson): com.fasterxml.jackson.databind.JsonNode) {
        (n, k) => if (n == null) null else n.get(k)
      }
      Option(c).filterNot(_.isNull).map(_.asText).flatMap(parseInstant) match {
        case Some(t) =>
          startI.forall(s => !t.isBefore(s)) && endI.forall(e => t.isBefore(e))
        case None => true // unparseable cursor: keep (at-least-once)
      }
  }

  private val records: Iterator[String] = {
    val stateProps = props + ("state" -> s"""{"To":"${part.startTo}"}""")
    HttpScan.buildStream(stateProps).fetch(client).filter(inWindow)
  }

  private val parser = new JacksonParser(readSchema,
    new JSONOptions(Map.empty[String, String], "UTC"), allowArrayAsStructs = false)
  private val createParser = CreateJacksonParser.utf8String _

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!records.hasNext) false
    else {
      val rows = parser.parse(UTF8String.fromString(records.next()), createParser,
        (s: UTF8String) => s)
      if (rows.isEmpty) next()
      else { current = rows.head.copy(); true }
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
