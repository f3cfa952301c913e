package graft

import org.scalatest.funsuite.AnyFunSuite

/** Artifact gate for the measured scale tier (graft.ScaleSweep): the
  * committed scale_out.json must show every swept query within the
  * shuffle-linear-with-headroom bar (time at 10x data <= ~15x time at
  * 1x on constant cores). The MEASUREMENT lives in the ScaleSweep
  * main (minutes — run per round, commit the artifact); this spec is
  * the cheap always-on assertion that the committed claim holds and
  * the sweep set hasn't silently shrunk. */
class ScaleOutSpec extends AnyFunSuite {

  private def checkArtifact(path: String): Unit = {
    val f = new java.io.File(path)
    if (!f.isFile)
      cancel(s"$path absent — run `runMain graft.ScaleSweep`")
    val text = java.nio.file.Files.readString(f.toPath)
    val bar = """"ratio_bar":([0-9.]+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toDouble).getOrElse(ScaleSweep.RatioBar)
    // -? so a FAILED row's -1.000 sentinels still PARSE and reach the
    // dedicated failed-row assert below, instead of vanishing from the
    // match set and firing the misleading "sweep set shrank" message
    // (advice r13)
    val row =
      """"(q_[^"]+)":\{"sf01_sec":(-?[0-9.]+),"sf1_sec":(-?[0-9.]+),"ratio":(-?[0-9.]+)""".r
    val rows = row.findAllMatchIn(text)
      .map(m => (m.group(1), m.group(2).toDouble, m.group(3).toDouble,
        m.group(4).toDouble)).toVector
    assert(rows.size == ScaleSweep.SweepQueries.size,
      s"sweep set shrank: ${rows.map(_._1)}")
    val over = rows.filter(_._4 > bar)
    assert(over.isEmpty, "SUPER-LINEAR rows (plan read required): " +
      over.map(r => f"${r._1} ${r._4}%.1fx").mkString(", "))
    // a FAILED row writes ratio -1 (ScaleSweep's error contract) —
    // it must fail this gate, not slide under the bar
    val failed = rows.filter(r => r._2 <= 0 || r._3 <= 0 || r._4 <= 0)
    assert(failed.isEmpty,
      s"FAILED sweep rows in the committed artifact: " +
        failed.map(_._1).mkString(", "))
    assert(!text.contains("\"verdict\":\"FAILED\""),
      "artifact carries a FAILED verdict")
    rows.foreach { case (n, s, b, r) =>
      info(f"$n%-20s ${s}%6.2fs -> ${b}%6.2fs  ${r}%5.1fx (bar $bar)") }
  }

  test("committed scale_out.json (10x): every query within the ratio bar") {
    checkArtifact("scale_out.json")
  }

  test("committed scale_out_100.json (100x): every query within the bar") {
    checkArtifact("scale_out_100.json")
  }
}
