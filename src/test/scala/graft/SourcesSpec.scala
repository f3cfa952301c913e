package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables.table(
    spark, "/root/testdata/sf0.001", "documents")

  test("orc round trip preserves rows, schema and values") {
    val dir = Files.createTempDirectory("graft_orc_spec_").toString
    Sources.writeOrc(docs, dir)
    val back = Sources.orc(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("orc scan gets pushdown + pruning like parquet") {
    val dir = Files.createTempDirectory("graft_orc_plan_").toString
    Sources.writeOrc(docs, dir)
    val plan = Sources.orc(spark, dir)
      .filter(col("doc_id") > 100).select("doc_id", "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), " +
      "GreaterThan(doc_id,100)]"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      plan)
  }

  test("text source: one value row per line") {
    val dir = Files.createTempDirectory("graft_text_spec_")
    Files.writeString(dir.resolve("a.txt"), "line1\nline2\nline3\n")
    val got = Sources.text(spark, dir.toString)
      .select("value").as[String].collect().sorted.toSeq
    assert(got == Seq("line1", "line2", "line3"))
  }

  test("binaryFiles: whole-file payloads with glob filtering") {
    val dir = Files.createTempDirectory("graft_bin_spec_")
    Files.write(dir.resolve("x.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("y.bin"), Array[Byte](9, 8))
    Files.writeString(dir.resolve("skip.txt"), "nope")
    val got = Sources.binaryFiles(spark, dir.toString, "*.bin")
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .as[(String, Long, Array[Byte])].collect()
      .sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("x.bin", "y.bin"))
    assert(got.map(_._2) == Seq(4L, 2L))
    assert(got.head._3.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("jsonl and csv export round-trip rows exactly") {
    val dir = Files.createTempDirectory("graft_export_")
    val jl = dir.resolve("jl").toString
    Sources.writeJsonLines(docs, jl, partitions = 2)
    val backJ = Sources.jsonLines(spark, jl, docs.schema)
    assert(backJ.count() == docs.count())
    assert(backJ.exceptAll(docs).isEmpty && docs.exceptAll(backJ).isEmpty)
    // file-count control held
    assert(new java.io.File(jl).listFiles()
      .count(_.getName.endsWith(".json")) == 2)
    val cs = dir.resolve("cs").toString
    // csv needs quoting-safe content: text carries commas/quotes in the
    // corpus — the writer must escape and the reader must round-trip
    Sources.writeCsv(docs, cs)
    val backC = Sources.csv(spark, cs, docs.schema)
    assert(backC.count() == docs.count())
    assert(backC.exceptAll(docs).isEmpty && docs.exceptAll(backC).isEmpty)
  }

  test("jsonl and csv exports preserve MICROSECOND timestamps exactly " +
    "(Spark's default timestampFormat truncates to millis; the writers " +
    "carry the micros format, readers parse leniently)") {
    val dir = Files.createTempDirectory("graft_ts_export_")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:07.179575")
    val ts2 = java.sql.Timestamp.valueOf("2024-06-15 23:59:59.000001")
    val ts3 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val rows = Seq((1L, ts1), (2L, ts2), (3L, ts3)).toDF("id", "ts")
    val jl = dir.resolve("jl").toString
    Sources.writeJsonLines(rows, jl)
    val backJ = Sources.jsonLines(spark, jl, rows.schema)
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._1).toSeq
    assert(backJ == Seq((1L, ts1), (2L, ts2), (3L, ts3)))
    val cs = dir.resolve("cs").toString
    Sources.writeCsv(rows, cs)
    val backC = Sources.csv(spark, cs, rows.schema)
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._1).toSeq
    assert(backC == Seq((1L, ts1), (2L, ts2), (3L, ts3)))
  }

  test("property: JSONL round-trips ARBITRARY strings (quotes, commas, " +
    "backslashes, newlines, tabs, unicode) — the writer escapes inside " +
    "the line frame; CSV round-trips the same surface minus line breaks") {
    val rnd = new scala.util.Random(11)
    val alphabet: IndexedSeq[Char] =
      "abc \"\\,\t\u00e9\u4e16\u00df'`|;{}[]" + "\n\r"
    def randStr(allowNl: Boolean): String =
      (0 until rnd.nextInt(40)).map { _ =>
        val c = alphabet(rnd.nextInt(alphabet.length))
        if (!allowNl && (c == '\n' || c == '\r')) ' ' else c
      }.mkString
    val dir = Files.createTempDirectory("graft_esc_prop_")
    // JSONL: newlines included — they must be escaped INSIDE the frame
    val jRows = (1L to 60L).map(i => (i, randStr(allowNl = true)))
    val jDf = jRows.toDF("id", "s")
    val jl = dir.resolve("jl").toString
    Sources.writeJsonLines(jDf, jl)
    val backJ = Sources.jsonLines(spark, jl, jDf.schema)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(backJ == jRows)
    // CSV: line-framed records — same surface minus literal line
    // breaks; empty-vs-null is CSV's inherent ambiguity (both land as
    // an empty field), so the expected value normalizes "" -> null —
    // the documented Sources.csv contract. Everything ELSE (leading/
    // trailing whitespace included) must survive byte-exact
    val cRows = (1L to 60L).map(i => (i, randStr(allowNl = false)))
    val cDf = cRows.toDF("id", "s")
    val cs = dir.resolve("cs").toString
    Sources.writeCsv(cDf, cs)
    val backC = Sources.csv(spark, cs, cDf.schema)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val expC = cRows.map { case (i, s) => (i, if (s.isEmpty) null else s) }
    assert(backC == expC)
  }

  test("recallAtK: identical lists → 1.0, disjoint lists → 0.0") {
    val exact = Seq((0L, 1L), (0L, 2L), (1L, 3L))
      .toDF("query_id", "nbr_id")
    val same = graft.llm.SimSearch.recallAtK(exact, exact)
      .orderBy("query_id")
      .select("n_hits", "k_eff", "recall")
      .as[(Long, Long, Double)].collect().toSeq
    assert(same == Seq((2L, 2L, 1.0), (1L, 1L, 1.0)))
    val disjoint = Seq((0L, 9L), (1L, 9L)).toDF("query_id", "nbr_id")
    val zero = graft.llm.SimSearch.recallAtK(exact, disjoint)
      .select("recall").as[Double].collect().toSeq
    assert(zero == Seq(0.0, 0.0))
  }
}
