package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Assets are opaque `binary` payloads plus typed metadata — the schema a
  * 100 TB multimodal corpus actually uses (content stays a byte blob all
  * the way to the trainer; Spark only routes, filters and fingerprints
  * it). Decode / feature-extraction runs imperatively per partition via
  * `mapPartitions` on a typed Dataset — the Scala analog of the
  * reference's `pandas_transformer` (reference:
  * stdlib/utils/pandas_transformer.py) and of Python `mapInPandas`
  * pipelines.
  *
  * STUB NOTE: no image/audio codecs ship in this environment, so
  * [[decodeStub]] is a deterministic fake — byte statistics standing in
  * for pixel decoding. The surrounding plumbing (schema, encoders,
  * partition-wise batching, frame sampling) is the real thing; swap
  * `decodeStub` for an actual codec call to productionize.
  */
object Multimodal {

  /** Canonical asset row: opaque content + typed metadata. */
  case class Asset(id: Long, content: Array[Byte], mime: String,
      width: Int, height: Int)

  /** Stubbed "decoded" features: byte stats in place of pixel stats. */
  case class AssetFeatures(id: Long, n_bytes: Long, byte_sum: Long,
      mean_byte: Double, h0: Long, h1: Long, h2: Long, h3: Long)

  /** One sampled frame of a (fake) video asset. */
  case class Frame(id: Long, frame_idx: Long, frame_sum: Long)

  /** Wrap an id + binary column into the canonical asset schema, deriving
    * fake-but-typed metadata. Rows with a NULL id or NULL content are
    * DROPPED (Asset's primitive fields can't carry them, and one
    * malformed row must not kill a corpus-scale job) — route them aside
    * first with `Table.splitErrors` if the pipeline wants a dead-letter
    * side. */
  def toAssets(df: DataFrame, id: Column, content: Column, mime: String): Dataset[Asset] =
    df.filter(id.isNotNull && content.isNotNull)
      .select(id.cast("long").as("id"), content.cast("binary").as("content"),
        lit(mime).as("mime"),
        (length(content) % 640 + 16).cast("int").as("width"),
        (id % 480 + 16).cast("int").as("height"))
      .as(Encoders.product[Asset])

  /** The deterministic fake decode: byte histogram + stats. Pure function
    * of the payload — the contract a real codec must also satisfy. */
  private[operators] def decodeStub(a: Asset): AssetFeatures = {
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    val bs = a.content
    while (i < bs.length) {
      val v = bs(i) & 0xff
      sum += v
      hist(if (v < 64) 0 else if (v < 96) 1 else if (v < 112) 2 else 3) += 1
      i += 1
    }
    AssetFeatures(a.id, bs.length.toLong, sum,
      if (bs.isEmpty) 0.0 else sum.toDouble / bs.length,
      hist(0), hist(1), hist(2), hist(3))
  }

  /** Partition-wise feature extraction. The iterator shape is the point:
    * a real decoder amortizes model/codec init per PARTITION (not per
    * row) exactly here. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] =
    assets.mapPartitions { it =>
      // per-partition init would go here (codec handles, model session)
      it.map(decodeStub)
    }(Encoders.product[AssetFeatures])

  /** Sample fixed-size "frames" (byte blocks) with a stride — the video
    * frame-sampling access pattern: emit block j for j % stride == 0. */
  def frameSample(assets: Dataset[Asset], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    // fail driver-side, not as an ArithmeticException inside a task
    require(frameBytes > 0 && stride > 0,
      s"frameSample: frameBytes ($frameBytes) and stride ($stride) must be > 0")
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val n = a.content.length / frameBytes
        (0 until n).iterator.filter(_ % stride == 0).map { j =>
          var s = 0L
          var i = j * frameBytes
          val end = i + frameBytes
          while (i < end) { s += (a.content(i) & 0xff); i += 1 }
          Frame(a.id, j.toLong, s)
        }
      }
    }(Encoders.product[Frame])
  }
}
