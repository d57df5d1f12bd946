package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}

/** Multi-dimensional data layout for scan pruning — the Delta
  * `OPTIMIZE ZORDER BY` / Iceberg sort-order analog as a plain parquet
  * rewrite, no table format required.
  *
  * Why this exists at 100 TB: parquet readers prune ROW GROUPS (and
  * whole files) from footer min/max statistics before reading a byte,
  * and Spark pushes comparison predicates down to that layer
  * automatically (`PushedFilters` in `.explain`). But pruning is only
  * as good as the layout — after an arbitrary ingest order every file
  * spans nearly the full value range of every column, so min/max
  * excludes nothing. Sorting fixes exactly ONE column. Interleaving
  * the BITS of several columns' normalized positions (a Morton /
  * Z-order curve) gives every listed column partial locality: a file
  * covers a small hyper-rectangle of the key space, so selective
  * predicates on ANY prefix-free combination of the z-columns skip
  * most files. The rewrite is one range shuffle + a per-partition
  * sort — the standard one-off (or per-compaction) layout job.
  *
  * Implementation: per-column position = (x − min) / (max − min)
  * scaled to `bits` bits (one tiny global agg for the min/max pair
  * per column, broadcast as literals into a codegen'd projection);
  * z-value = bit-interleave of the positions (MSB-first round-robin,
  * so every column contributes its high bits early);
  * `repartitionByRange(files, z)` + `sortWithinPartitions(z)` land
  * tight z-ranges per file, and parquet footers do the rest. Skewed
  * distributions degrade POSITIONS (min/max scaling), not
  * correctness; pruning quality for heavy-tailed columns can be
  * restored by pre-transforming (e.g. log) the column into rough
  * uniformity — positions only need monotonicity, which any
  * strictly-increasing transform preserves.
  *
  * Numeric/date/timestamp columns only (their order IS their
  * locality); strings would need rank-based positions — a global
  * sort per column — and are rejected loudly rather than silently
  * hash-scattered. */
object Layout {

  /** The Morton z-value of `cols` with `bits` bits per column, given
    * per-column (min, max) literal bounds. Pure codegen'd integer ops —
    * bits·k shift/mask/or nodes, no UDF, no shuffle. */
  private def zColumn(cols: Seq[Column], bounds: Seq[(Double, Double)],
      bits: Int): Column = {
    val k = cols.length
    val maxPos = (1L << bits) - 1
    val positions = cols.zip(bounds).map { case (c, (lo, hi)) =>
      val range = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        ((c.cast("double") - lit(lo)) / lit(range) * lit(maxPos.toDouble))
          .cast("long"), lit(0L)), lit(maxPos))
    }
    // interleave MSB-first: output bit (bits-1-i)*k + (k-1-j) takes
    // column j's bit (bits-1-i) — every column's high bits lead
    val pieces = for {
      i <- 0 until bits
      (p, j) <- positions.zipWithIndex
    } yield shiftleft(shiftright(p, bits - 1 - i).bitwiseAND(lit(1L)),
      (bits - 1 - i) * k + (k - 1 - j))
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` along the z-order curve of `zCols`: one min/max agg,
    * one range shuffle into `files` partitions, one in-partition sort.
    * Row CONTENT is untouched — this is pure physical layout. */
  def zOrder(df: DataFrame, zCols: Seq[String], files: Int,
      bits: Int = 16): DataFrame = {
    require(zCols.nonEmpty, "zOrder: need at least one column")
    require(bits >= 1 && bits * zCols.length <= 62,
      s"zOrder: bits*cols must fit a long, got $bits*${zCols.length}")
    require(files >= 1, s"zOrder: files must be >= 1, got $files")
    zCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType] || dt == DateType ||
        dt == TimestampType,
        s"zOrder: column '$c' is $dt — z-ordering needs an ordered " +
          "numeric/date/timestamp column (rank-transform strings upstream)")
    }
    val cols = zCols.map(c => df.schema(c).dataType match {
      case TimestampType => col(c).cast("long").cast("double")
      case DateType => col(c).cast("int").cast("double")
      case _ => col(c).cast("double")
    })
    val bounds = {
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(c).as(s"lo$i"), max(c).as(s"hi$i")) }
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      cols.indices.map(i => (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
    }
    df.withColumn("_z", zColumn(cols, bounds, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** [[zOrder]] + parquet write. Each output file covers a tight
    * z-range, so footer min/max stats prune selective scans on any of
    * the z columns. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16, mode: String = "overwrite"): Unit =
    zOrder(df, zCols, files, bits).write.mode(mode).parquet(path)

  /** Per-file (min, max) of a column from parquet FOOTERS only — the
    * statistics the reader's pruning sees; diagnostic for layout
    * quality (Σ per-file widths ≪ files × global width ⇒ skipping
    * works). Driver-side metadata I/O, no Spark job. */
  def fileRanges(spark: org.apache.spark.sql.SparkSession, dir: String,
      column: String): Seq[(String, Double, Double)] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try {
          import scala.jdk.CollectionConverters._
          val ranges = for {
            block <- in.getFooter.getBlocks.asScala.toSeq
            cc <- block.getColumns.asScala
            if cc.getPath.toDotString == column
            s = cc.getStatistics if s != null && !s.isEmpty
          } yield (num(s.genericGetMin), num(s.genericGetMax))
          (st.getPath.getName, ranges.map(_._1).min, ranges.map(_._2).max)
        } finally in.close()
      }
  }

  private def num(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"fileRanges: non-numeric statistic $other")
  }
}
