package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll

/** Pins the relational HyperLogLog: bucket/rho decomposition agrees with
  * a Scala-side recomputation from the same xxhash64 values, the
  * estimate is layout-independent (register max is distributive),
  * duplicate-insensitive, within the AofA'07 error bound on the raw
  * branch, and the linear-counting branch engages for tiny
  * cardinalities. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estMillis(ids: Seq[Long], p: Int, parts: Int = 4): Long =
    Hll.distinctCount(ids.toDF("id").repartition(parts), col("id"), p)
      .select("est_millis").as[Long].head()

  test("bucket/rho matches a driver-side recomputation of the same hash") {
    val p = 9
    val df = (0L until 200L).toDF("id")
    val (b, r) = Hll.bucketAndRho(col("id"), p)
    val got = df.select(xxhash64(col("id")).as("h"), b.as("b"), r.as("r"))
      .as[(Long, Int, Int)].collect()
    assert(got.length == 200)
    got.foreach { case (h, bucket, rho) =>
      val u = h // treat bits as unsigned
      val expB = (u >>> (64 - p)).toInt
      val rem = u & ((1L << (64 - p)) - 1)
      val expR =
        if (rem == 0) 64 - p + 1
        else 64 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      assert(bucket == expB && rho == expR, s"h=$h")
    }
  }

  test("estimate is layout-independent and duplicate-insensitive") {
    val ids = (0L until 5000L) ++ (0L until 5000L) // every id twice
    val base = estMillis(ids, p = 9, parts = 1)
    assert(estMillis(ids, p = 9, parts = 16) == base)
    assert(estMillis(0L until 5000L, p = 9, parts = 7) == base)
  }

  test("raw-branch estimate is within 3 sigma of the true cardinality") {
    val n = 20000L
    val est = estMillis(0L until n, p = 9) / 1000.0
    val sigma = 1.04 / math.sqrt(1 << 9) * n // ~920
    assert(math.abs(est - n) < 3 * sigma, s"est=$est")
  }

  test("mergeRegisters(a, b) estimates the distinct UNION: merging a " +
    "corpus with itself is a no-op; overlapping corpora don't double") {
    val p = 9
    val a = Hll.registers((0L until 3000L).toDF("id"), col("id"), p)
    val b = Hll.registers((1500L until 4500L).toDF("id"), col("id"), p)
    def est(regs: org.apache.spark.sql.DataFrame): Long =
      Hll.estimate(regs, p).select("est_millis").as[Long].head()
    val selfMerge = est(Hll.mergeRegisters(a, a, p))
    assert(selfMerge == est(a))
    val unionEst = est(Hll.mergeRegisters(a, b, p)) / 1000.0
    val direct = est(Hll.registers((0L until 4500L).toDF("id"),
      col("id"), p)) / 1000.0
    assert(unionEst == direct) // identical registers, identical estimate
  }

  test("linear-counting branch: tiny cardinalities are near-exact") {
    for (n <- Seq(5L, 50L)) {
      val est = estMillis(0L until n, p = 9) / 1000.0
      assert(math.abs(est - n) <= math.max(1.0, 0.05 * n), s"n=$n est=$est")
    }
  }

  test("estimateAudit columns DETERMINE the corrected estimate: " +
    "reconstructing est_millis from (raw, small_range, nonempty) " +
    "matches Hll.estimate bit-for-bit on both branches") {
    val p = 9
    val m = 1 << p
    // small n → small_range/ln branch; large n → raw branch
    for (n <- Seq(30L, 20000L)) {
      val regs = Hll.registers((0L until n).toDF("id"), col("id"), p)
      val est = Hll.estimate(regs, p)
        .select("est_millis").as[Long].head()
      val (raw, small, nonempty) = Hll.estimateAudit(regs, p)
        .select("raw_est_millis", "small_range", "nonempty_buckets")
        .as[(Long, Boolean, Long)].head()
      // the in-engine corrected estimate, rebuilt from audit columns
      // only (the ln here is the JVM's — same libm as Hll.estimate's
      // codegen, so equality is exact IN-ENGINE; the oracle never
      // replays this branch, by the Hll determinism contract)
      val v = m - nonempty
      val rebuilt =
        if (small)
          math.floor(m.toDouble * math.log(m.toDouble / v) * 1000.0).toLong
        else raw
      assert(rebuilt == est, s"n=$n rebuilt=$rebuilt est=$est")
      assert(small == (n < 2.5 * m), s"n=$n small=$small")
    }
  }

  test("empty input estimates 0, not NULL (global no-group aggregate)") {
    val p = 9
    val empty = Hll.registers(
      (0L until 10L).toDF("id").filter(col("id") < 0), col("id"), p)
    val row = Hll.estimate(empty, p)
      .select("est_millis", "nonempty_buckets", "register_sum")
      .as[(Long, Long, Long)].head()
    assert(row == ((0L, 0L, 0L)), s"got $row")
  }

  test("mergeRegisters ERRORS on a precision-mismatched register table " +
    "instead of silently wrapping the estimate shift") {
    val a = Hll.registers((0L until 100L).toDF("id"), col("id"), 9)
    // a p=16 table has buckets >= 2^9; a rho above 64-9+1 is the
    // register-side symptom of a smaller-p table — both must raise
    val bigBucket = Seq((40000, 3)).toDF("bucket", "register")
    val bigRho = Seq((7, 60)).toDF("bucket", "register")
    for (bad <- Seq(bigBucket, bigRho)) {
      val ex = intercept[Exception] {
        Hll.estimate(Hll.mergeRegisters(a, bad, 9), 9).collect()
      }
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
      assert(all(ex).exists(_.contains("mergeRegisters")),
        s"unexpected: ${ex.getMessage}")
    }
  }

  test("NULL items do not count: xxhash64 skips null children and " +
    "returns the seed, so a null row would otherwise set one phantom " +
    "register — count(DISTINCT) and approx_count_distinct both ignore " +
    "NULLs") {
    val p = 12
    val clean = (0L until 500L).map(Option(_))
    val withNulls = clean ++ Seq.fill(7)(Option.empty[Long])
    val a = Hll.estimate(
      Hll.registers(withNulls.toDF("id"), col("id"), p), p)
      .select("est_millis").as[Long].head()
    val b = Hll.estimate(
      Hll.registers(clean.toDF("id"), col("id"), p), p)
      .select("est_millis").as[Long].head()
    assert(a == b, s"nulls changed the estimate: $a != $b")
    // an all-NULL column yields an EMPTY register table (nothing seen)
    assert(Hll.registers(Seq(Option.empty[Long]).toDF("id"),
      col("id"), p).isEmpty)
  }
}
