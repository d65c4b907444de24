package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.streaming.Streaming

/** The real-Kafka ingest twin (Streaming.readEventsKafka), proven as far
  * as an offline sandbox allows:
  *  - the S2+P1 value projection is source-agnostic, so a batch frame
  *    with a binary `value` column drives the EXACT expressions the
  *    Kafka stream would see — schema parity and value roundtrip are
  *    asserted against the file stand-in's normalized contract;
  *  - the `kafka` builder itself type-checks and fails ONLY at source
  *    resolution (no connector jar here), which is asserted so a future
  *    classpath change that breaks the builder earlier is caught.
  */
class KafkaTwinSpec extends SparkTestBase {

  test("parseKafkaValue lands binary JSON payloads on the normalized events contract") {
    import spark.implicits._
    val events = Tables.events(spark, sf).limit(50)
    // simulate the broker payload: each row serialized to a JSON value blob
    val wire = events
      .select(to_json(struct($"event_id", $"ts", $"user_id",
        $"event_type", $"value", $"props"),
        Map("timestampFormat" -> Streaming.KafkaTsFormat))
        .cast("binary").as("value"))
    val parsed = Streaming.parseKafkaValue(wire)
    assert(parsed.schema == Streaming.eventsNormSchema,
      s"Kafka projection must produce the file stand-in's contract, got ${parsed.schema}")
    val back = parsed.orderBy($"event_id")
    val want = events.orderBy($"event_id")
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
      "the wire roundtrip must preserve every field bit-exactly")
  }

  test("projectIngest composes identically over the Kafka projection and the file source") {
    import spark.implicits._
    val events = Tables.events(spark, sf).limit(20)
    val wire = events
      .select(to_json(struct($"event_id", $"ts", $"user_id",
        $"event_type", $"value", $"props"),
        Map("timestampFormat" -> Streaming.KafkaTsFormat))
        .cast("binary").as("value"))
    val viaKafkaShape = Streaming.projectIngest(Streaming.parseKafkaValue(wire))
    val viaFileShape = Streaming.projectIngest(events)
    assert(viaKafkaShape.schema == viaFileShape.schema,
      "downstream ingest plan must be source-independent")
    assert(viaKafkaShape.exceptAll(viaFileShape).isEmpty &&
      viaFileShape.exceptAll(viaKafkaShape).isEmpty)
  }

  test("readEventsKafka fails only at source resolution in this sandbox") {
    val e = intercept[Exception] {
      Streaming.readEventsKafka(spark)
    }
    val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
    assert(msg.toLowerCase.contains("kafka"),
      s"expected the kafka source-not-found error, got: $e")
  }

  test("the ingest source flag dispatches file (default) vs kafka") {
    val viaDefault = Streaming.readEventsStreamConfigured(spark, sf)
    assert(viaDefault.isStreaming &&
      viaDefault.schema("ts").dataType.typeName == "timestamp")
    spark.conf.set(Streaming.IngestSourceConf, "kafka")
    try {
      val e = intercept[Exception] {
        Streaming.readEventsStreamConfigured(spark, sf)
      }
      assert((Option(e.getMessage).getOrElse("") + e.getClass.getName)
        .toLowerCase.contains("kafka"))
    } finally spark.conf.unset(Streaming.IngestSourceConf)
  }
}
