package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering keys,
  * the technique behind Delta Lake's `OPTIMIZE ZORDER BY` and
  * ClickHouse/Redshift interleaved sort keys. Sorting a table by a
  * single column makes parquet row-group min/max stats razor-sharp for
  * THAT column and useless for every other; sorting by the bit-
  * interleaved Z-value of k columns makes each file cover a small
  * hyper-rectangle of the k-dim space, so predicates on ANY of the
  * k columns prune files. At 100 TB this is the difference between a
  * filter reading the whole table and reading ~range/2^bits of it —
  * the layout is decided once at write time and every later scan
  * benefits via ordinary stats pruning (no index structure to ship).
  *
  * Everything here is a pure Column expression over built-ins
  * (floor/least/greatest + shift/and/or — whole-stage codegen'd, no
  * UDF): [[rankBucket]] affinely maps a numeric column onto
  * [0, 2^bits) against its corpus min/max (the [[graft.llm.Sq]]
  * forward map with 2^bits levels), and [[zorderKey]] interleaves the
  * bucket bits round-robin so all dimensions share significance.
  * Both are fixed IEEE-double / integer op sequences — q_zorder
  * hash-matches a DuckDB replay bit-for-bit.
  */
object Layout {

  /** Affine bucket of `x` onto [0, 2^bits) against [mn, mx]:
    * `least(2^bits−1, greatest(0, floor(((x − mn) · (2^bits−1)) /
    * (mx − mn))))` as a LONG; 0 when the range is degenerate. The
    * clamp covers out-of-range values (laying out a new partition
    * against last week's ranges). */
  def rankBucket(x: Column, mn: Double, mx: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits in [1,20]: $bits")
    val top = (1L << bits) - 1
    if (mx == mn) lit(0L)
    else least(lit(top), greatest(lit(0L),
      floor(((x.cast("double") - lit(mn)) * lit(top.toDouble)) /
        lit(mx - mn))))
  }

  /** Exact corpus [min, max] of each column in one aggregate —
    * 2·k doubles to the driver, embedded as plan literals by the
    * caller. */
  def ranges(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      // min/max of an all-NULL column (or an empty frame) is NULL —
      // name the column in the refusal instead of a bare NPE from
      // getDouble mid-compaction
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"Layout.ranges: column '${cols(i)}' has no non-NULL values " +
          "(empty input or all-NULL column) — cannot derive a z-order " +
          "range")
      (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }

  /** Morton interleave of bucket columns (each already in
    * [0, 2^bits)): bit b of bucket c lands at position b·k + c, so
    * dimensions alternate significance bit-by-bit. k·bits must fit a
    * long (≤ 63). */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    require(k >= 1, "need at least one bucket column")
    require(k * bits <= 63, s"k*bits must be <= 63: $k*$bits")
    val terms = for {
      b <- 0 until bits
      c <- 0 until k
    } yield shiftleft(
      shiftrightunsigned(buckets(c).cast("long"), b).bitwiseAND(lit(1L)),
      b * k + c)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The Z-order key of `cols` against their corpus ranges — one
    * [[ranges]] aggregate, then a map-only expression. */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val rs = ranges(df, cols)
    interleave(cols.zip(rs).map { case (c, (mn, mx)) =>
      rankBucket(col(c), mn, mx, bits)
    }, bits)
  }

  /** Write-time layout: range-partition then locally sort by the
    * Z-key, so each output file covers a compact hyper-rectangle and
    * file-level min/max stats prune on every interleaved column. The
    * result is what you hand to a partitioned sink. */
  def layoutBy(zkey: Column, numPartitions: Int)
      : DataFrame => DataFrame = { df =>
    df.withColumn("__z", zkey)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Bucketed table write — the CO-LOCATED join layout: two tables
    * bucketed by the same key into the same bucket count join with ZERO
    * shuffle exchange (LayoutSpec pins the plan), because Spark's file
    * source trusts the persisted hashing (the residual Sort before a
    * merge join is LOCAL per bucket — Spark ≥3.0 ignores write-time
    * sortBy ordering unless the legacy outputOrdering conf is on). At
    * 100 TB this turns the nightly fact⋈fact join from the cluster's
    * biggest shuffle into a per-bucket local merge — the layout is paid
    * ONCE at write and amortized over every downstream join/aggregate
    * on that key.
    *
    * Managed-table form on purpose (`saveAsTable`): bucket metadata
    * lives in the catalog — a plain `.parquet(path)` write cannot
    * record it, which is why the YAML parquet sinks don't offer this
    * (they stay hive-partitioned/Z-ordered; see `shapeForParquet`).
    * Spark's bucketing differs from Hive's (no per-bucket file
    * contract), so readers must be Spark — the training-pipeline case. */
  def bucketedWrite(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Seq.empty,
                    mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "bucketedWrite: no bucket keys")
    require(buckets >= 1, s"bucketedWrite: buckets must be >= 1: $buckets")
    // repartition on the bucket keys into exactly `buckets` tasks:
    // repartition and bucketBy share the hash (Murmur3 pmod buckets), so
    // task i holds exactly bucket i and each bucket lands in ONE file —
    // the small-files control, and the condition under which the reader
    // trusts write-time sortBy (multi-file buckets are each sorted but
    // not merged, so Spark would re-Sort before a merge join)
    val shaped = df.repartition(buckets, keys.map(col): _*)
    val w0 = shaped.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val w = if (sortCols.isEmpty) w0
      else w0.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * `ceil(inputBytes / targetFileBytes)` files — the nightly answer to
    * micro-batch sinks spraying kilobyte files (a day of triggers makes
    * millions; the NEXT job's planning chokes on the listing before a
    * single row is read). Sizing reads the actual on-disk byte total
    * from the file listing, so the target tracks compression. With
    * `zorderCols` the rewrite also lays rows out by Morton key
    * ([[layoutBy]]), folding clustering into the same single shuffle —
    * compaction is the one moment the data is all in flight anyway.
    * Returns the planned file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileBytes: Long = 128L << 20,
              zorderCols: Seq[String] = Nil, zorderBits: Int = 8): Long = {
    require(targetFileBytes >= (1L << 20),
      s"targetFileBytes under 1 MiB recreates the problem: $targetFileBytes")
    val path = new org.apache.hadoop.fs.Path(inPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        bytes += f.getLen
    }
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes)
    val df = spark.read.parquet(inPath)
    val shaped =
      if (zorderCols.nonEmpty)
        layoutBy(zorderKey(df, zorderCols, zorderBits), nFiles.toInt)(df)
      else df.repartition(nFiles.toInt)
    shaped.write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
