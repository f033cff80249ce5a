package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** Standing sweep for the round-half hash-tie class (three real
  * failures r5–r6: q_min_cost_supplier, q_est_error,
  * q_bigram_entropy): every registered oracle SQL is run through
  * tools/tiecheck.py, which perturbs each round(E, d) site by ±1e-9
  * and fails if any output moves without a written TIE_SAFE
  * justification (integer-term / sorted-fold / lattice — see the
  * tool). The TIE_SAFE ledger itself is audited on EVERY build via
  * the tool's --ledger-only mode (no DuckDB needed): each entry
  * records the mechanism marker regex and the round-site count its
  * safety argument covers, so rewriting a listed query (e.g.
  * dropping an integer quantize, adding a round site) fails the
  * test suite instead of silently inheriting a stale argument.
  *
  * The full sweep runs DuckDB via python3, so it cancels (not
  * fails) on hosts without the dev toolchain; the library itself
  * never depends on either.
  */
class TieHunterSpec extends AnyFunSuite {

  /** tools/tiecheck.py resolved against the build root (user.dir is
    * the forked test JVM's working directory, which sbt sets to the
    * project base); an absent tool cancels, never fails. */
  private val tool: Path =
    Paths.get(sys.props("user.dir")).resolve("tools/tiecheck.py")

  private def havePython: Boolean =
    try {
      new ProcessBuilder("python3", "--version")
        .redirectErrorStream(true).start().waitFor() == 0
    } catch { case _: Throwable => false }

  private def haveDuckdb: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start().waitFor() == 0
    } catch { case _: Throwable => false }

  private def run(args: String*): (Int, String) = {
    val pb = new ProcessBuilder(("python3" +: tool.toString +: args): _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    (proc.waitFor(), out)
  }

  test("TIE_SAFE ledger matches the oracle registry (no-DB audit)") {
    assume(Files.isRegularFile(tool), s"$tool missing")
    assume(havePython, "python3 not available on this host")
    val oraclePath = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(oraclePath, Verify.oracleJson)
    val (code, out) = run("--ledger-only", oraclePath.toString)
    Files.deleteIfExists(oraclePath)
    assert(code == 0, s"stale TIE_SAFE ledger entries:\n$out")
  }

  test("-0.0 emission detector: flags a real signed-zero double, " +
      "ignores a VARCHAR '-0.0' cell") {
    assume(Files.isRegularFile(tool), s"$tool missing")
    assume(haveDuckdb, "python3+duckdb not available on this host")
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir missing")
    // Probe registry: a genuinely-negative double zero (the L60
    // emission class — the decimal-literal form -(0.0)/3 would
    // normalize before ever becoming a double, hence the ::DOUBLE),
    // and a text cell spelling "-0.0" that must NOT collide with the
    // float sentinel after canon.
    val probes =
      """{"q_probe_negzero":
        |   "SELECT round(-((0.0*r_regionkey)::DOUBLE)/3, 6) AS x FROM region",
        | "q_probe_varchar": "SELECT '-0.0' AS x FROM region"}""".stripMargin
    val oraclePath = Files.createTempFile("probe_sql", ".json")
    Files.writeString(oraclePath, probes)
    // Ledger-stale lines are expected (TIE_SAFE names are absent from
    // the probe registry), so assert on the per-query lines, not the
    // exit code.
    val (_, out) =
      run(sfDir, oraclePath.toString, "q_probe_negzero", "q_probe_varchar")
    Files.deleteIfExists(oraclePath)
    assert(out.contains("FLAG q_probe_negzero") &&
      out.contains("emits IEEE -0.0"),
      s"detector missed a real -0.0 emission:\n$out")
    assert(!out.contains("FLAG q_probe_varchar"),
      s"detector false-flagged a VARCHAR '-0.0' cell:\n$out")
  }

  test("float-sentinel canon is byte-identical between check.py and tiecheck.py") {
    // The _FloatSentinel class + NAN/NEGZERO singletons exist in BOTH
    // gate scripts (the t2 mirror and the tie sweep) — duplicated on
    // purpose so the correctness-gate mirror has zero import coupling.
    // This pins the FUNCTIONAL block (docstrings excluded) so an edit
    // to one canon cannot silently diverge the two gates' equality
    // semantics (the r9 ADVICE class: the sweep's canon was fixed
    // while the mirror kept the old string sentinels).
    def canonBlock(p: Path): String = {
      val s = Files.readString(p)
      val start = s.indexOf("__slots__")
      val end = s.indexOf("NEGZERO = _FloatSentinel(\"-0.0\")")
      assert(start >= 0 && end > start, s"sentinel block not found in $p")
      s.substring(start, end + "NEGZERO = _FloatSentinel(\"-0.0\")".length)
        .replaceAll("""(?s)\"\"\".*?\"\"\"""", "") // per-method docstrings, if any
        .replaceAll("""\s+""", " ").trim
    }
    val check = Paths.get(sys.props("user.dir")).resolve("tools/check.py")
    assume(Files.isRegularFile(check) && Files.isRegularFile(tool))
    assert(canonBlock(check) == canonBlock(tool),
      "tools/check.py and tools/tiecheck.py float-sentinel blocks diverged")
  }

  test("no unexplained rounding-tie hazards across the registry (sf0.001)") {
    assume(Files.isRegularFile(tool), s"$tool missing")
    assume(haveDuckdb, "python3+duckdb not available on this host")
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir missing")
    val oraclePath = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(oraclePath, Verify.oracleJson)
    val (code, out) = run(sfDir, oraclePath.toString)
    Files.deleteIfExists(oraclePath)
    assert(code == 0, s"tiecheck flagged rounding-tie hazards:\n$out")
  }
}
