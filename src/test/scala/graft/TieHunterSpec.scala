package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Standing sweep for the round-half hash-tie class (three real
  * failures r5–r6: q_min_cost_supplier, q_est_error,
  * q_bigram_entropy): every registered oracle SQL is run through
  * tools/tiecheck.py, which perturbs each round(E, d) site by ±1e-9
  * and fails if any output moves without a written TIE_SAFE
  * justification (sorted-fold / lattice / foldless — see the tool).
  *
  * Runs DuckDB via python3, so it cancels (not fails) on hosts
  * without the dev toolchain; the library itself never depends on
  * either.
  */
class TieHunterSpec extends AnyFunSuite {

  private def haveTool: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start().waitFor() == 0
    } catch { case _: Throwable => false }

  test("no unexplained rounding-tie hazards across the registry (sf0.001)") {
    assume(haveTool, "python3+duckdb not available on this host")
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir missing")
    val oraclePath = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(oraclePath, Verify.oracleJson)
    val pb = new ProcessBuilder(
      "python3", "tools/tiecheck.py", sfDir, oraclePath.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    Files.deleteIfExists(oraclePath)
    assert(code == 0, s"tiecheck flagged rounding-tie hazards:\n$out")
  }
}
