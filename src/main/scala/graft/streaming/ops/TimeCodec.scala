package graft.streaming.ops

/** The ONE micros <-> java.sql.Timestamp conversion pair the stateful
  * ops share. State carries epoch MICROS, never Timestamp.getTime
  * millis: Spark timestamps are microsecond-precision and a millis
  * round-trip truncates sort keys (q_scd_dag went red on exactly this —
  * .325073 became .325000). The Timestamp constructor takes millis and
  * setNanos replaces the FULL fractional second, so the reassembly is
  * exact. Lives here once (next to the shared parseMs rule,
  * [[NearDupOp.parseMs]]) so a precision fix can never land in one
  * stateful op and silently miss a sibling's private copy. */
private[ops] object TimeCodec {
  def usOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
