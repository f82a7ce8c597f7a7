package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Exercises tools/check_bench_local.py — the closing-ritual guard that
  * refuses a subset-sweep BENCH_LOCAL.json (a scoped SPARK_GRAFT_ONLY
  * bench run overwrites the file with a handful of queries; committing
  * that as the round record happened in r10 and again at the r12
  * snapshot). Planted fixtures: a registry of 4 declared queries vs a
  * bench map covering 1 (must fail) and 4 (must pass). */
class BenchLocalGuardSpec extends AnyFunSuite {

  private def write(dir: Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, body.getBytes("UTF-8"))
    p
  }

  private def run(oracle: Path, bench: Path): Int = {
    val pb = new ProcessBuilder(
      "python3", "tools/check_bench_local.py",
      oracle.toString, bench.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    info(out.trim)
    rc
  }

  private val oracleJson =
    """{"q1":"SELECT 1","q2":"SELECT 2","q3":"SELECT 3","q4":"SELECT 4"}"""

  test("subset-sweep BENCH_LOCAL.json (1 of 4 queries) is refused") {
    val dir = Files.createTempDirectory("benchguard")
    val oracle = write(dir, "oracle_sql.json", oracleJson)
    val bench = write(dir, "BENCH_LOCAL.json",
      """{"queries":{"q1":0.5},"total":0.5}""")
    assert(run(oracle, bench) !== 0)
  }

  test("full-map BENCH_LOCAL.json passes (extra rows-only queries ok)") {
    val dir = Files.createTempDirectory("benchguard")
    val oracle = write(dir, "oracle_sql.json", oracleJson)
    val bench = write(dir, "BENCH_LOCAL.json",
      """{"queries":{"q1":0.5,"q2":0.4,"q3":0.3,"q4":0.2,"extra":0.1}}""")
    assert(run(oracle, bench) === 0)
  }

  test("missing BENCH_LOCAL.json is refused") {
    val dir = Files.createTempDirectory("benchguard")
    val oracle = write(dir, "oracle_sql.json", oracleJson)
    assert(run(oracle, dir.resolve("nope.json")) !== 0)
  }

  test("provenance: a full-coverage map from a driver/ad-hoc run " +
      "(provenance != builder-clean) is refused; builder-clean passes; " +
      "pre-marker maps pass with a warning") {
    val dir = Files.createTempDirectory("benchguard")
    val oracle = write(dir, "oracle_sql.json", oracleJson)
    val full = """"q1":0.5,"q2":0.4,"q3":0.3,"q4":0.2"""
    // the r14 shape: the driver's own full sweep overwrote the
    // committed builder map — full coverage, wrong provenance
    val driver = write(dir, "driver.json",
      s"""{"provenance":"unmarked","queries":{$full}}""")
    assert(run(oracle, driver) !== 0)
    val builder = write(dir, "builder.json",
      s"""{"provenance":"builder-clean","queries":{$full}}""")
    assert(run(oracle, builder) === 0)
    val legacy = write(dir, "legacy.json", s"""{"queries":{$full}}""")
    assert(run(oracle, legacy) === 0)
  }

  test("durable-map routing: a scoped run writes BENCH_SCOPED.json, " +
      "never the canonical BENCH_LOCAL.json (the r10/r12/r15 overwrite " +
      "trap killed at the source)") {
    assert(Bench.benchMapFile(scoped = true) === "BENCH_SCOPED.json")
    assert(Bench.benchMapFile(scoped = false) === "BENCH_LOCAL.json")
  }
}
