package graft

import org.apache.spark.sql.functions._
import graft.sources.{ConnectorSubject, SubjectLog}

/** The durable subject commit log + its DSv2 replayable source:
  * record/read round-trips (typed values), append-across-record-calls
  * numbering, schema pinning, and the kill+restart contract the
  * MemoryStream bridge cannot give (offsets survive the checkpoint). */
class SubjectLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sublog_$tag").toString

  private def feedOf[T](batches: Seq[T]*): ConnectorSubject[T] =
    new ConnectorSubject[T] {
      def run(): Unit = batches.foreach { b => b.foreach(next); commit() }
    }

  test("record → batch read round-trips typed rows exactly (incl. null, " +
      "array, binary, timestamp)") {
    val dir = tmp("types")
    val rows: Seq[(Long, String, Double, Boolean, Seq[Int], Array[Byte], java.sql.Timestamp)] = Seq(
      (1L, "plain", 1.5, true, Seq(1, 2, 3), Array[Byte](1, 2), ts("2024-01-02 03:04:05.123456")),
      (2L, "esc \"quote\"\nnewline", -0.0, false, Seq(), Array[Byte](), ts("1970-01-01 00:00:00")),
      (3L, null, Double.NaN, true, null, null, null))
    SubjectLog.record(spark, feedOf(rows.take(2), rows.drop(2)), dir)
    val back = SubjectLog.read(spark, dir)
      .as[(Long, String, Double, Boolean, Seq[Int], Array[Byte], java.sql.Timestamp)]
      .collect().sortBy(_._1)
    assert(back.length == 3)
    assert(back(0)._1 == 1L && back(0)._2 == "plain" && back(0)._5 == Seq(1, 2, 3))
    assert(back(0)._6.toSeq == Seq[Byte](1, 2))
    assert(back(0)._7 == ts("2024-01-02 03:04:05.123456"))
    assert(back(1)._2 == "esc \"quote\"\nnewline")
    assert(back(2)._2 == null && back(2)._3.isNaN && back(2)._5 == null && back(2)._7 == null)
  }

  test("record appends across calls (numbering resumes) and pins the schema") {
    val dir = tmp("append")
    SubjectLog.record(spark, feedOf(Seq((1L, "a")), Seq((2L, "b"))), dir)
    SubjectLog.record(spark, feedOf(Seq((3L, "c"))), dir)
    assert(new java.io.File(dir).list().count(_.startsWith("block-")) == 3)
    assert(SubjectLog.read(spark, dir).count() == 3)
    val bad = intercept[IllegalArgumentException] {
      SubjectLog.record(spark, feedOf(Seq((4L, 4.0))), dir)
    }
    assert(bad.getMessage.contains("schema mismatch"))
  }

  test("empty commits write no block; unsupported column types are " +
      "rejected loudly at record time") {
    val dir = tmp("empty")
    val s = new ConnectorSubject[(Long, String)] {
      def run(): Unit = { commit(); next((1L, "x")); commit(); commit() }
    }
    SubjectLog.record(spark, s, dir)
    assert(new java.io.File(dir).list().count(_.startsWith("block-")) == 1)
    val bad = intercept[IllegalArgumentException] {
      // day-time interval: a real Spark type with an encoder the codec
      // deliberately does not cover
      SubjectLog.record(spark, feedOf(Seq(java.time.Duration.ofSeconds(1))),
        tmp("unsupported"))
    }
    assert(bad.getMessage.contains("unsupported column type"))
  }

  test("maps round-trip through the codec, including non-string keys") {
    val dir = tmp("maps")
    // [keys…][values…] positional encoding: int keys stay ints (a
    // JSON-object encoding would have stringified them)
    val rows: Seq[(Long, Map[String, Long], Map[Int, String])] = Seq(
      (1L, Map("a" -> 10L, "b" -> 20L), Map(7 -> "x")),
      (2L, Map(), Map(8 -> "y", 9 -> "z")),
      (3L, null, null))
    SubjectLog.record(spark, feedOf(rows.take(2), rows.drop(2)), dir)
    val back = SubjectLog.read(spark, dir)
      .as[(Long, Map[String, Long], Map[Int, String])]
      .collect().sortBy(_._1)
    assert(back.length == 3)
    assert(back(0)._2 == Map("a" -> 10L, "b" -> 20L) && back(0)._3 == Map(7 -> "x"))
    assert(back(1)._2 == Map() && back(1)._3 == Map(8 -> "y", 9 -> "z"))
    assert(back(2)._2 == null && back(2)._3 == null)
  }

  test("kill+restart: a NEW query on the same checkpoint resumes at the " +
      "committed block — no loss, no duplicates") {
    val dir = tmp("replay")
    val root = tmp("replay_out")
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    SubjectLog.record(spark, feedOf(Seq((1L, "a"), (2L, "b")), Seq((3L, "c"))), dir)
    val q1 = SubjectLog.readStream(spark, dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    q1.processAllAvailable(); q1.stop() // the "crash"
    // feed continues while no query is running
    SubjectLog.record(spark, feedOf(Seq((4L, "d")), Seq((5L, "e"))), dir)
    val q2 = SubjectLog.readStream(spark, dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.schema(SubjectLog.read(spark, dir).schema).parquet(out)
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("nested structs and decimals round-trip through the codec") {
    val dir = tmp("nested")
    // the typed CDC-envelope shape: (op, ts, after-row struct with a
    // decimal field) + an array of structs — none of which needed
    // flattening before r11
    val rows: Seq[(String, Long, (Long, String, BigDecimal), Seq[(Int, String)])] = Seq(
      ("u", 10L, (1L, "open", BigDecimal("12345.6789")), Seq((1, "a"), (2, "b"))),
      ("d", 20L, (2L, null, BigDecimal("-0.000000000000000001")), Seq()),
      ("r", 30L, null, null))
    SubjectLog.record(spark, feedOf(rows.take(2), rows.drop(2)), dir)
    val back = SubjectLog.read(spark, dir)
      .as[(String, Long, (Long, String, BigDecimal), Seq[(Int, String)])]
      .collect().sortBy(_._2)
    assert(back.length == 3)
    assert(back(0)._3 == ((1L, "open", BigDecimal("12345.6789"))))
    assert(back(0)._4 == Seq((1, "a"), (2, "b")))
    assert(back(1)._3._2 == null &&
      back(1)._3._3 == BigDecimal("-0.000000000000000001"))
    assert(back(1)._4 == Seq())
    assert(back(2)._3 == null && back(2)._4 == null)
  }

  test("vacuumBlocks prunes a prefix: reads start at the horizon, " +
      "numbering resumes, a pre-horizon checkpoint fails loudly") {
    val dir = tmp("vacuum")
    val root = tmp("vacuum_out")
    def drain(tag: String): Unit = {
      val q = SubjectLog.readStream(spark, dir)
        .writeStream.format("parquet").option("path", s"$root/out_$tag")
        .option("checkpointLocation", s"$root/ckpt_$tag").start()
      q.processAllAvailable(); q.stop()
    }
    SubjectLog.record(spark, feedOf(Seq((1L, "a")), Seq((2L, "b"))), dir)
    drain("early") // this checkpoint commits offset 2
    SubjectLog.record(spark, feedOf(Seq((3L, "c")), Seq((4L, "d"))), dir)
    drain("late")  // this one commits offset 4
    SubjectLog.vacuumBlocks(dir, 3)
    assert(!new java.io.File(dir).list().exists(_ == "block-00000000.jsonl"))
    // bounded reads serve the retained range only
    assert(SubjectLog.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq((4L, "d")))
    // a fresh stream starts at the horizon, not offset 0
    drain("fresh")
    assert(spark.read.schema(SubjectLog.read(spark, dir).schema)
      .parquet(s"$root/out_fresh").as[(Long, String)].collect().toSeq ==
      Seq((4L, "d")))
    // numbering resumes past the horizon; the post-horizon checkpoint
    // restarts cleanly and picks up the new block
    SubjectLog.record(spark, feedOf(Seq((5L, "e"))), dir)
    drain("late")
    assert(spark.read.schema(SubjectLog.read(spark, dir).schema)
      .parquet(s"$root/out_late").as[(Long, String)].collect().toSeq.sorted ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    // the checkpoint parked BELOW the horizon fails loudly — its blocks
    // are gone; silent skipping would break the replay guarantee
    val ex = intercept[Throwable] {
      val q = SubjectLog.readStream(spark, dir)
        .writeStream.format("parquet").option("path", s"$root/out_early")
        .option("checkpointLocation", s"$root/ckpt_early").start()
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("predates the vacuum horizon"), msgs)
    // vacuuming past the durable frontier is refused
    val over = intercept[IllegalArgumentException] {
      SubjectLog.vacuumBlocks(dir, 99)
    }
    assert(over.getMessage.contains("exceeds the durable frontier"))
  }

  test("short-name registration: format(\"graft-subject-log\") resolves " +
      "through DataSourceRegister") {
    val dir = tmp("shortname")
    SubjectLog.record(spark, feedOf(Seq((7L, "g"))), dir)
    val got = spark.read.format("graft-subject-log").load(dir)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((7L, "g")))
  }
}
