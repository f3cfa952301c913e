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

  /** Flat `"name": <number>` pairs inside the top-level `key` object
    * of an artifact (both bench_out.json's "queries" and
    * bench_floor.json's "floors" are flat query→number maps). A real
    * JSON parse (jackson-databind, already on Spark's classpath) —
    * the previous first-'}' substring scan was one field reorder away
    * from silently emptying the gate once bench_out.json grew the
    * nested `queries_minmax` object (r13 verdict task 3). Non-numeric
    * members are skipped; a missing/non-object key or unparseable
    * text yields an EMPTY map, which callers must treat as
    * gate-disabled, not gate-green. */
  def numSection(text: String, key: String): Map[String, Double] =
    jsonRoot(text).map(numSectionOf(_, key)).getOrElse(Map.empty)

  private def numSectionOf(
      root: com.fasterxml.jackson.databind.JsonNode, key: String)
      : Map[String, Double] = {
    val node = root.get(key)
    if (node == null || !node.isObject) Map.empty[String, Double]
    else {
      val b = Map.newBuilder[String, Double]
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
      }
      b.result()
    }
  }

  private def jsonRoot(text: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] =
    try Option(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text))
    catch { case _: Exception => None }

  /** Floors from a bench_floor.json text, empty unless its `sf` stamp
    * matches `sfDir` (so a dev-scale ledger can never gate an sf0.1
    * run or vice versa). */
  def floorsFor(text: String, sfDir: String): Map[String, Double] =
    jsonRoot(text) match {
      case Some(root) if root.path("sf").asText("") == sfDir =>
        numSectionOf(root, "floors")
      case _ => Map.empty
    }

  /** The flat `queries` map of a committed bench_out.json, empty
    * unless its `sf` stamp matches `sfDir` (graft.Bench's history
    * retry trigger — a dev-scale artifact must never arm retries
    * against sf0.1 history or vice versa). */
  def queriesFor(text: String, sfDir: String): Map[String, Double] =
    jsonRoot(text) match {
      case Some(root) if root.path("sf").asText("") == sfDir =>
        numSectionOf(root, "queries")
      case _ => Map.empty
    }

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
