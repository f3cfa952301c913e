package graft

/** One-command round artifact: reproduce BOTH driver gates locally —
  * the correctness dump + DuckDB compare (CORRECTNESS_local.json) and
  * the benchmark (BENCH_local.json) — so builder claims and driver
  * artifacts cannot diverge (round 7: a "216/216" claim from the
  * tuple-sorting local checker hid a driver-side canonicalization
  * crash on an array column).
  *
  * Usage: `sbt "runMain graft.Report [outDir]"` (default `report/`).
  * Verify runs at sf0.01 (the driver's gate SF), Bench at sf0.1 —
  * override with SPARK_GRAFT_VERIFY_SF / SPARK_GRAFT_SF_DIR. The
  * DuckDB compare shells out to `tools/check_oracle.py` (dev-only —
  * the shipped library has no Python dependency; the driver runs its
  * own copy of the same gate). Exit code 1 if any query failed.
  *
  * Caveat on the bench numbers: running Bench in the same JVM after a
  * full Verify inflates per-query times ~15% uniformly (code-cache/GC
  * state; measured 86.6s standalone vs 103.2s post-Verify at sf0.1).
  * The driver benches standalone — compare trends, not absolutes. */
object Report {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("report")
    val sfVerify = sys.env.getOrElse("SPARK_GRAFT_VERIFY_SF",
      "/root/testdata/sf0.01")
    val sfBench = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()

    println(s"[report] Verify @ $sfVerify -> $outDir/verify")
    Verify.main(Array(sfVerify, s"$outDir/verify"))

    println(s"[report] DuckDB compare -> $outDir/CORRECTNESS_local.json")
    val rc = try {
      new ProcessBuilder("python3", "tools/check_oracle.py",
        sfVerify, s"$outDir/verify",
        "--json", s"$outDir/CORRECTNESS_local.json")
        .inheritIO().start().waitFor()
    } catch { case e: Throwable =>
      System.err.println(s"[report] check_oracle unavailable: $e"); -1
    }

    println(s"[report] Bench @ $sfBench -> $outDir/BENCH_local.json")
    Bench.main(Array(sfBench, s"$outDir/BENCH_local.json"))

    println(s"[report] done (correctness rc=$rc)")
    if (rc != 0) sys.exit(1)
  }
}
