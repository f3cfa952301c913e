package graft

/** The bench floor gate, factored once so graft.Bench (in-run stamp)
  * and BenchFloorSpec (committed-artifact assertion) cannot diverge:
  * same JSON field parsing, same median normalization, same
  * thresholds. See docs/BENCH.md "The floor ledger".
  *
  * Floors span boxes of different uniform speed (the round-11 VM
  * change doubled every row), so the raw 2x-floor test over-fires on a
  * slower box: the gate normalizes by the suite's MEDIAN
  * ratio-to-floor (a uniformly-slower box moves the median, not the
  * flag) and additionally requires the absolute 2x-floor + slack bar
  * so millisecond rows don't flap. */
object BenchFloor {

  /** Over-floor trigger: ratio > RatioVsMedian x the suite median AND
    * min > AbsFactor x floor + AbsSlackSec. */
  val RatioVsMedian = 2.0
  val AbsFactor = 2.0
  val AbsSlackSec = 0.15

  /** Flat `"q_name": <number>` pairs inside the top-level `key` object
    * of an artifact (both bench_out.json's "queries" and
    * bench_floor.json's "floors" are flat query→number maps; the
    * object ends at its first '}' because no nested braces occur
    * before it). */
  def numSection(text: String, key: String): Map[String, Double] = {
    val start = text.indexOf("\"" + key + "\":")
    if (start < 0) Map.empty
    else {
      val end = text.indexOf('}', start)
      if (end < 0) Map.empty
      else {
        val body = text.substring(start, end)
        val pair = """"(q_[^"]+)":\s*([-0-9.eE]+)""".r
        pair.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
  }

  /** Floors from a bench_floor.json text, empty unless its `sf` stamp
    * matches `sfDir` (tools/bench_floor.py writes json.dump(indent=1),
    * i.e. `"sf": "<dir>"` with one space — both spellings accepted so
    * a formatter change cannot silently disable the gate). */
  def floorsFor(text: String, sfDir: String): Map[String, Double] =
    if (!text.contains("\"sf\": \"" + sfDir + "\"") &&
        !text.contains("\"sf\":\"" + sfDir + "\"")) Map.empty
    else numSection(text, "floors")

  final case class Flag(name: String, min: Double, floor: Double,
                        ratio: Double)
  final case class Gate(medianRatio: Double, overFloor: Seq[Flag])

  def gate(cur: Map[String, Double], floors: Map[String, Double]): Gate = {
    val ratios = cur.flatMap { case (n, v) =>
      floors.get(n).filter(f => f > 0 && v > 0).map(f => n -> v / f) }
    val med =
      if (ratios.isEmpty) 1.0
      else { val s = ratios.values.toVector.sorted; s(s.size / 2) }
    val over = ratios.collect {
      case (n, r) if r > RatioVsMedian * med &&
        cur(n) > AbsFactor * floors(n) + AbsSlackSec =>
        Flag(n, cur(n), floors(n), r)
    }.toSeq.sortBy(-_.ratio)
    Gate(med, over)
  }
}
