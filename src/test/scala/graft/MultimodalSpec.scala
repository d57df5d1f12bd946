package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal asset plumbing (reference: stdlib/utils/pandas_transformer
  * analog; decode is the documented deterministic stub). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "abcdef"), (2L, ""), (3L, "zzzz")).toDF("id", "text")

  test("toAssets derives typed metadata; extractFeatures = byte stats") {
    val assets = Multimodal.toAssets(docs, col("id"), col("text").cast("binary"), "text/plain")
    val feats = Multimodal.extractFeatures(assets).collect().map(f => f.id -> f).toMap
    assert(feats(1L).n_bytes == 6)
    assert(feats(1L).byte_sum == "abcdef".getBytes.map(_ & 0xff).sum)
    assert(feats(2L).n_bytes == 0 && feats(2L).mean_byte == 0.0)
    // deterministic: same bytes, same features
    val again = Multimodal.extractFeatures(assets).collect().map(f => f.id -> f).toMap
    assert(again(3L) == feats(3L))
  }

  test("toAssets drops NULL id/content rows instead of crashing the job") {
    val withNulls = Seq(
      (Some(1L), Some("ok")), (Option.empty[Long], Some("x")),
      (Some(3L), Option.empty[String])).toDF("id", "text")
    val assets = Multimodal.toAssets(withNulls,
      col("id"), col("text").cast("binary"), "text/plain")
    assert(assets.collect().map(_.id).toSeq == Seq(1L))
  }

  test("frameSample emits strided fixed-size blocks; rejects bad params") {
    val assets = Multimodal.toAssets(
      Seq((1L, "0123456789")).toDF("id", "text"),
      col("id"), col("text").cast("binary"), "video/fake")
    // 10 bytes / frameBytes 2 = 5 frames; stride 2 keeps frames 0, 2, 4
    val frames = Multimodal.frameSample(assets, frameBytes = 2, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(frames(0).frame_sum == ('0' + '1').toLong)
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(assets, frameBytes = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(assets, frameBytes = 2, stride = 0)
    }
  }
}
