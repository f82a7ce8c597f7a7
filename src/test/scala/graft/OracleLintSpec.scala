package graft

import java.nio.file.Files
import scala.sys.process._

/** Oracle-side harness-compat lint (the round-10 verdict's mirror rule):
  * the PlanSpec lint bans ARRAY/MAP/DECIMAL on SPARK output schemas; the
  * same discipline must hold on the DuckDB side, where aggregates widen
  * silently — SUM(BIGINT) surfaces HUGEINT, which the driver fetches as
  * float64 and hash-compares against Spark's int64 representation
  * (round-10 agg_gini / classify_gini_impurity shipped red exactly this
  * way, with every value integer-equal). tools/lint_oracle_dtypes.py
  * DESCRIBEs each oracle SQL and fails on HUGEINT/DECIMAL/unsigned
  * surfacing; this spec proves the lint fires on a planted widening and
  * stays green on the full declared query set. */
class OracleLintSpec extends SparkSuite {

  private val lintPy =
    new java.io.File("tools/lint_oracle_dtypes.py").getAbsolutePath
  private val sf = new java.io.File(sfDir).getAbsolutePath

  private def lint(args: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("python3", lintPy) ++ args)
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    (code, out.toString)
  }

  test("planted HUGEINT-surfacing query FAILS the oracle dtype lint") {
    val (code, out) =
      lint(Seq("--sql", "SELECT SUM(c_custkey) AS s FROM customer", sf))
    assert(code == 1, s"uncast SUM(BIGINT) must fail (HUGEINT):\n$out")
    assert(out.contains("HUGEINT"), out)
  }

  test("planted DECIMAL-surfacing query FAILS the oracle dtype lint") {
    // o_totalprice is DOUBLE in the parquet — route through DECIMAL the
    // way exact-money SQL does, then "forget" the cast-back
    val (code, out) = lint(Seq("--sql",
      "SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s FROM orders",
      sf))
    assert(code == 1, s"uncast SUM(DECIMAL) must fail:\n$out")
  }

  test("cast-back twin of the planted query passes") {
    val (code, out) = lint(Seq("--sql",
      "SELECT CAST(SUM(c_custkey) AS BIGINT) AS s FROM customer", sf))
    assert(code == 0, s"cast-back BIGINT must pass:\n$out")
  }

  test("every declared oracle SQL surfaces only driver-hashable dtypes") {
    val tmp = Files.createTempDirectory("oracle-lint")
    val json = tmp.resolve("oracle_sql.json")
    try {
      Files.writeString(json, Verify.oracleJson(None))
      val (code, out) = lint(Seq(json.toString, sf))
      assert(code == 0, s"oracle dtype lint failed:\n${out.linesIterator
        .filter(_.startsWith("FAIL")).mkString("\n")}")
    } finally {
      Files.deleteIfExists(json)
      Files.deleteIfExists(tmp)
      ()
    }
  }
}
