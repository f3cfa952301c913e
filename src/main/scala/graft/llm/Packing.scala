package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Training-sequence packing (SURVEY.md §2.6 pipeline extension): assign
  * each document to the fixed-token-budget training sequence it starts
  * in — the concat-then-chunk packing used to build pre-training batches
  * (documents are concatenated in a deterministic order and the token
  * stream is cut every `budget` tokens; a document may straddle a cut).
  *
  * Scale shape: a single global concatenation order is a sequential
  * prefix sum — inherently serial — so packing is SHARDED: documents are
  * Lehmer-hashed into `shards` independent streams
  * ([[Ops.idBucket]] — deterministic across engines/runs/layouts), and
  * the running token total is a per-shard window sum. Shards are the
  * parallelism unit: at cluster scale use shards ≈ O(executors·cores);
  * each WindowExec partition is one shard, never the whole corpus.
  * Output: (id, cost, shard, seq_id, seq_offset) where seq_id counts
  * sequences within the shard and seq_offset is the document's start
  * position inside its sequence.
  */
object Packing {

  def pack(df: DataFrame, idCol: String, costCol: String,
           budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shards > 0, s"shards must be positive: $shards")
    // NULL cost would ride free past the sequence budget (window sums
    // skip NULLs) and poison seq_id/seq_offset — an input error, same
    // contract as sampleToBudget's guards (Ops.refuseNull)
    val guardedCost = Ops.refuseNull(col(costCol),
      concat(lit("pack: NULL cost for id="), col(idCol).cast("string")))
      .cast("long")
    val sharded = df.select(col(idCol), guardedCost.as("cost"))
      .withColumn("shard", Ops.idBucket(col(idCol), shards))
    val w = Window.partitionBy("shard").orderBy(idCol)
    // running total INCLUDING this doc; the doc starts at cum - cost
    val start = sum(col("cost")).over(w) - col("cost")
    // integral DIV, not floor(/): Spark's `/` is IEEE double division,
    // which silently rounds past 2^53 cumulative tokens — seq_id could
    // then disagree with the exact pmod seq_offset on the SAME row
    // (the Dedup.scala packed-id rule, generalized to any divisor)
    sharded
      .withColumn("__start", start)
      .withColumn("seq_id", expr(s"__start DIV $budget"))
      .withColumn("seq_offset", pmod(col("__start"), lit(budget)))
      .drop("__start")
  }

  /** Export token rows as raw little-endian int32 `.bin` shards — the
    * memory-mappable flat-token format pre-training loaders consume
    * (one file per shard at `path/shard-NNNNN.bin`). All rows of a
    * shard land in one task (hash repartition on the shard id) and
    * concatenate in ascending `orderCol` order, so shard content is
    * deterministic across runs/layouts; executors stream through the
    * Hadoop FileSystem API (any DFS the cluster mounts). Returns the
    * manifest — (shard, n_rows, n_tokens, crc32) — the loader's index
    * and the integrity check in one frame; writing happens when the
    * manifest is acted on (document: act exactly once).
    *
    * This is the sanctioned `mapPartitions` case from the build brief:
    * genuinely imperative per-partition I/O, after the declarative
    * plan (repartition + sort) has put every byte where it belongs. */
  def writeBinShards(df: DataFrame, tokensCol: String, shardCol: String,
                     orderCol: String, path: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(shardCol).cast("int").as("shard"),
        col(orderCol).cast("long").as("ord"),
        col(tokensCol).cast("array<int>").as("toks"))
      .as[(Int, Long, Seq[Int])]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
    // Task-commit protocol: each attempt writes shard-NNNNN.bin to a
    // temp path suffixed with its (cluster-unique) task attempt id and
    // RENAMES into place only after a clean close. Two racing attempts
    // (speculation, retry-over-straggler) thus never interleave bytes
    // in one file — and because the partition content is deterministic
    // (repartition + sortWithinPartitions above), both attempts produce
    // byte-identical shards, so whichever rename wins leaves a file
    // consistent with EITHER attempt's CRC manifest row.
    val manifest = typed.mapPartitions { rows =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Long)]
      var cur = -1
      var stream: org.apache.hadoop.fs.FSDataOutputStream = null
      var crc: java.util.zip.CRC32 = null
      var nRows = 0L; var nToks = 0L
      def close(): Unit = if (stream != null) {
        stream.close()
        val tmp = new org.apache.hadoop.fs.Path(
          f"$path/_tmp-shard-$cur%05d.bin.$attempt")
        val fin = new org.apache.hadoop.fs.Path(
          f"$path/shard-$cur%05d.bin")
        val fs = tmp.getFileSystem(conf)
        // rename is atomic per-FS — and the final file is NEVER
        // pre-deleted: a delete-then-rename pair is not atomic, so a
        // killed speculative attempt could remove the winning attempt's
        // committed shard without replacing it (manifest row for a
        // missing file). Rename-first instead: on failure, an existing
        // final whose CRC matches this attempt's is a concurrent
        // byte-identical commit (partition content is deterministic) —
        // drop the temp; a different CRC is a stale artifact of an
        // earlier run over other data — replace it; no final at all is
        // a real failure — fail the task so Spark retries instead of
        // manifesting a missing file. The read-back CRC costs one shard
        // scan, paid only on the rename-collision path.
        if (!fs.rename(tmp, fin)) {
          val finCrc: Long =
            try {
              val in = fs.open(fin)
              try {
                val c2 = new java.util.zip.CRC32()
                val buf = new Array[Byte](1 << 16)
                var n = in.read(buf)
                while (n >= 0) {
                  if (n > 0) c2.update(buf, 0, n)
                  n = in.read(buf)
                }
                c2.getValue
              } finally in.close()
            } catch { case _: java.io.FileNotFoundException => -1L }
          if (finCrc == crc.getValue) fs.delete(tmp, false)
          else if (finCrc >= 0L) {
            fs.delete(fin, false)
            if (!fs.rename(tmp, fin)) {
              if (fs.exists(fin)) fs.delete(tmp, false) // concurrent win
              else throw new java.io.IOException(
                s"writeBinShards: rename $tmp -> $fin failed after " +
                "replacing a stale shard; failing the task so Spark " +
                "retries instead of manifesting a missing file")
            }
          } else throw new java.io.IOException(
            s"writeBinShards: rename $tmp -> $fin failed and no " +
            "concurrent attempt committed the shard; failing the task " +
            "so Spark retries instead of manifesting a missing file")
        }
        out += ((cur, nRows, nToks, crc.getValue))
        stream = null
      }
      rows.foreach { case (shard, _, toks) =>
        if (shard != cur) {
          close()
          cur = shard; nRows = 0L; nToks = 0L
          crc = new java.util.zip.CRC32()
          val p = new org.apache.hadoop.fs.Path(
            f"$path/_tmp-shard-$shard%05d.bin.$attempt")
          stream = p.getFileSystem(conf).create(p, true)
        }
        val buf = java.nio.ByteBuffer.allocate(4 * toks.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        toks.foreach(buf.putInt)
        val bytes = buf.array()
        stream.write(bytes); crc.update(bytes)
        nRows += 1L; nToks += toks.length
      }
      close()
      out.iterator
    }.toDF("shard", "n_rows", "n_tokens", "crc32")
    // Eagerly materialize the (n_shards-bounded) manifest so the write
    // job runs exactly ONCE — a lazily re-evaluated manifest frame
    // would silently rewrite every shard on each downstream action.
    val rows = manifest.collect().toIndexedSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq)), 1),
      manifest.schema)
  }

  /** Load `.bin` shards back as `(shard, seq_id, tokens[seqLen])` rows
    * — the loader-side twin of [[writeBinShards]] for in-engine eval /
    * debugging of exported data. The trailing partial sequence is
    * dropped (the trainer convention: every batch row is exactly
    * seqLen). One file = one shard; the binaryFile source loads whole
    * files, so keep shards at trainer-conventional sizes (hundreds of
    * MB), not multi-GB. */
  def readBinShards(spark: org.apache.spark.sql.SparkSession,
                    path: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    import spark.implicits._
    val ShardRe = raw".*shard-(\d+)\.bin".r
    graft.sources.Sources.binaryFiles(spark, path, "*.bin")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = p match {
          case ShardRe(n) => n.toInt
          case _ => sys.error(s"unrecognized shard file name: $p")
        }
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nSeqs = (bytes.length / 4) / seqLen
        (0 until nSeqs).iterator.map { s =>
          val arr = new Array[Int](seqLen)
          var i = 0
          while (i < seqLen) {
            arr(i) = bb.getInt((s * seqLen + i) * 4); i += 1
          }
          (shard, s.toLong, arr)
        }
      }.toDF("shard", "seq_id", "tokens")
  }
}
