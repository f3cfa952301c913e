package graft

import org.apache.spark.sql.functions._

import graft.functions.{NfcNormalize, StripAccents}

/** Pins the Unicode normalization expressions: NFC recomposition,
  * accent stripping (NFD + drop Mn), null/empty behavior, mixed
  * scripts. Inputs use explicit \\u escapes so the source encoding can
  * never change what is being tested. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val eAcuteNfc = "\u00e9"          // precomposed e-acute
  private val eAcuteNfd = "e\u0301"         // e + combining acute

  test("NFC recomposes decomposed sequences; already-NFC text is " +
    "unchanged byte-for-byte") {
    val rows = Seq(
      s"caf$eAcuteNfd",  // decomposed -> recomposes, 1 char shorter
      s"caf$eAcuteNfc",  // already NFC -> identity
      "v\u0308",    // v + diaeresis: NO precomposed form exists
      "plain ascii").toDF("s")
    val got = rows
      .select(NfcNormalize(col("s")).as("n"),
        length(col("s")).as("l0"))
      .select(col("n"), col("l0"), length(col("n")).as("l1"))
      .as[(String, Int, Int)].collect().toSeq
    assert(got(0) == ((s"caf$eAcuteNfc", 5, 4)), got(0))
    assert(got(1) == ((s"caf$eAcuteNfc", 4, 4)), got(1))
    assert(got(2) == (("v\u0308", 2, 2)), got(2)) // stays decomposed
    assert(got(3) == (("plain ascii", 11, 11)))
  }

  test("stripAccents drops combining marks after NFD: Latin accents " +
    "vanish, base letters and non-Latin text survive") {
    val rows = Seq(
      "\u00e1\u00e9\u00fc\u00f1\u00e7", // a-acute e-acute u-uml n-tilde c-cedilla
      s"na\u00efve r${eAcuteNfc}sum$eAcuteNfd", // naive resume accented (mixed forms)
      "\u4e2d\u6587 text",             // chinese + ascii
      "").toDF("s")
    val got = rows.select(StripAccents(col("s"))).as[String]
      .collect().toSeq
    assert(got == Seq("aeunc", "naive resume", "\u4e2d\u6587 text", ""),
      got)
  }

  test("NULL propagates; non-string input is refused at analysis") {
    val withNull = Seq(Some(eAcuteNfd), None).toDF("s")
    assert(withNull.select(NfcNormalize(col("s"))).as[Option[String]]
      .collect().toSet == Set(Some(eAcuteNfc), None))
    assert(withNull.select(StripAccents(col("s"))).as[Option[String]]
      .collect().toSet == Set(Some("e"), None))
    intercept[Exception] {
      Seq(1L).toDF("s").select(StripAccents(col("s"))).collect()
    }
  }
}
