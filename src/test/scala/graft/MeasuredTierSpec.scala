package graft

import org.scalatest.funsuite.AnyFunSuite

/** Artifact gates for the OTHER measured tiers (the ScaleOutSpec
  * pattern extended): the committed streaming, skew, and near-dup
  * profile artifacts are CLAIMS (docs/BENCH.md quotes their numbers),
  * so their shape and the relations the docs assert must hold on
  * every `sbt test` — a regenerated artifact that contradicts the
  * written claim fails here instead of silently shipping a stale doc.
  * The measurements themselves live in the mains (minutes each — run
  * per round, commit the artifacts); each test cancels when its
  * artifact is absent (a fresh checkout mid-iteration). */
class MeasuredTierSpec extends AnyFunSuite {

  private def read(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Some(java.nio.file.Files.readString(f.toPath)) else None
  }

  private def sec(text: String, row: String, field: String = "sec")
      : Double =
    (s""""$row":\\{[^}]*"$field":(-?[0-9.]+)""").r
      .findFirstMatchIn(text)
      .map(_.group(1).toDouble)
      .getOrElse(fail(s"row '$row' with '$field' missing"))

  test("stream_out.json: all four topologies present, positive, and " +
    "the tuned near-dup row beats the default (the docs/BENCH.md claim)") {
    val text = read("stream_out.json")
      .getOrElse(cancel("stream_out.json absent — run graft.StreamSweep"))
    val rows = Seq("map_stateless", "windowed_sketch",
      "stateful_neardup", "stateful_neardup_tuned")
    rows.foreach { r =>
      assert(sec(text, r) > 0, s"$r: non-positive time")
      assert(sec(text, r, "rows_per_sec") > 0, s"$r: non-positive rate")
    }
    val default = sec(text, "stateful_neardup")
    val tuned = sec(text, "stateful_neardup_tuned")
    assert(tuned <= default,
      f"tuned near-dup ($tuned%.1fs) no faster than default " +
        f"($default%.1fs) — the shuffle_partitions+trigger claim is " +
        "stale; re-measure and update docs/BENCH.md")
    info(f"neardup default $default%.1fs -> tuned $tuned%.1fs " +
      f"(${default / tuned}%.1fx)")
  }

  test("neardup_profile.json: every matrix cell positive; the kernel " +
    "floor is the fastest number in the artifact (it measures strictly " +
    "less work than any streaming cell)") {
    val text = read("neardup_profile.json")
      .getOrElse(cancel("neardup_profile.json absent — run " +
        "graft.NearDupProfile"))
    val cells = Seq("hdfs_mpt2_verify", "hdfs_mpt16_verify",
      "rocksdb_mpt2_verify", "rocksdb_mpt16_verify", "hdfs_mpt2_claims",
      "hdfs_mpt2_verify_sp8", "hdfs_mpt16_verify_sp8")
    val rates = cells.map(c => c -> sec(text, c, "docs_per_sec")).toMap
    rates.foreach { case (c, r) => assert(r > 0, s"$c: non-positive") }
    val floor = sec(text, "kernel_floor", "docs_per_sec")
    assert(rates.values.forall(_ < floor),
      "a streaming cell outran the no-streaming kernel floor — the " +
        "attribution in docs/BENCH.md no longer holds")
  }

  test("skew_out.json: all five strategy timings positive and the " +
    "cross-strategy agg group count sane") {
    val text = read("skew_out.json")
      .getOrElse(cancel("skew_out.json absent — run graft.SkewSweep"))
    Seq("aqe_skew_split", "no_mitigation", "salted",
      "exp_aqe_skew_split", "exp_no_mitigation").foreach { k =>
      val v = (s""""$k":(-?[0-9.]+)""").r.findFirstMatchIn(text)
        .map(_.group(1).toDouble)
        .getOrElse(fail(s"strategy '$k' missing"))
      assert(v > 0, s"$k: non-positive time")
    }
    val groups = """"agg_groups":(\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt).getOrElse(fail("agg_groups missing"))
    assert(groups >= 1 && groups <= 100, s"agg_groups implausible: $groups")
  }
}
