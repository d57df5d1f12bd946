package graft

import org.apache.spark.sql.functions._

/** EXECUTED Kafka round-trip — env-gated, because this environment has
  * no route to the kafka jars (spark-sql-kafka-0-10 resolution was
  * attempted and fails offline; /opt/spark/jars ships without it). The
  * transport-free twin of this pipeline is already oracle-proven
  * (StreamingSpec "kafka-shaped pipeline minus the jar": subject
  * envelopes → debezium apply over the identical `from_json on value`
  * recipe) — this spec closes the remaining gap, the real wire format
  * and the real source/sink providers, the day jars exist:
  *
  *  1. `SPARK_GRAFT_KAFKA_JARS` = directory with spark-sql-kafka-0-10,
  *     spark-token-provider-kafka, kafka-clients, commons-pool2 (the
  *     standard four) — build.sbt's `Test / unmanagedJars` puts every
  *     jar there on the forked test classpath, so no code changes;
  *  2. `SPARK_GRAFT_KAFKA_BOOTSTRAP` = host:port of a reachable broker
  *     (a one-process KRaft broker is the intended fixture; an embedded
  *     in-JVM broker was deliberately NOT blind-coded here — broker
  *     bootstrap API churn across Kafka versions would likely ship a
  *     skeleton that fails on first contact, while "point at a running
  *     broker" runs unmodified against any of them).
  *
  * Unset, the single test self-cancels (scalatest `assume`) and the
  * suite stays green — the env-flag discipline of the Derby/HTTP specs.
  */
class KafkaIntegrationSpec extends SparkSpec {
  import spark.implicits._

  /** Some(bootstrap) only when the jars are genuinely on the classpath
    * AND a broker address is configured. */
  private def kafkaReady: Option[String] = for {
    _ <- sys.env.get("SPARK_GRAFT_KAFKA_JARS")
    bootstrap <- sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess
  } yield bootstrap

  test("kafka round-trip: batch write → batch read-back → streaming read " +
      "through io.stream (env-gated)") {
    assume(kafkaReady.nonEmpty,
      "set SPARK_GRAFT_KAFKA_JARS (jar dir, wired into the test classpath " +
        "by build.sbt) and SPARK_GRAFT_KAFKA_BOOTSTRAP (host:port of a " +
        "reachable broker) to execute the kafka round-trip")
    val bootstrap = kafkaReady.get
    val topic = s"graft-it-${java.util.UUID.randomUUID()}"
    val rows = (1 to 100).map(i => (s"k$i", s"""{"id":$i,"v":"x$i"}"""))

    // produce through the DataFrame kafka sink (the io.write("kafka")
    // path — reference KafkaWriter, src/connectors/data_storage.rs:1250)
    rows.toDF("key", "value").write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic).save()

    // batch read-back: every produced record, key and value intact
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest").load()
      .select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)]
    assert(back.collect().toSet == rows.toSet)

    // streaming read through the graft wrapper (io.stream("kafka") — the
    // exact recipe StreamingSpec proves transport-free), memory sink
    val q = graft.sources.io.stream(spark, "kafka", options = Map(
        "kafka.bootstrap.servers" -> bootstrap,
        "subscribe" -> topic, "startingOffsets" -> "earliest")).load()
      .select(col("value").cast("string").as("value"))
      .writeStream.format("memory").queryName("graft_kafka_it")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_kafka_it").count() == rows.size.toLong)
    } finally q.stop()
  }
}
