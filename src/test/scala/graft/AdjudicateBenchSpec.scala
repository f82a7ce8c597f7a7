package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Exercises tools/adjudicate_bench.py — the uniform-load bench
  * adjudication the r13 builder ran BY HAND (a 335.9 s run with
  * internally-consistent floors read "clean" to every floor-based
  * judgment; only comparing common-query walls against the committed
  * 289.3 s map exposed the median 1.19 ratio). The planted fixtures
  * replay exactly that shape: a baseline map, a uniformly-1.19×
  * candidate (must refuse), a parity candidate (must accept), a
  * contaminated-flag candidate (must refuse outright), a plan-change
  * candidate whose slow queries have DIFFERENT shuffle bytes (must
  * accept — wall deltas on changed plans are code, not load), and a
  * wobble-class candidate whose slow queries are all non-steady (must
  * accept — decode/iterative walls are environment-bistable and
  * exempt). */
class AdjudicateBenchSpec extends AnyFunSuite {

  private def write(dir: Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, body.getBytes("UTF-8"))
    p
  }

  private def run(candidate: Path, baseline: Path, minN: Int = 3): Int = {
    val pb = new ProcessBuilder(
      "python3", "tools/adjudicate_bench.py", candidate.toString,
      "--baseline", baseline.toString, "--min-n", minN.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    info(out.trim)
    rc
  }

  private def mapJson(walls: Map[String, Double],
      shuffle: Map[String, Double], contaminated: Boolean,
      wallClass: Map[String, String] = Map.empty): String = {
    def obj[T](m: Map[String, T], fmt: T => String): String =
      m.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")
    val wc =
      if (wallClass.isEmpty) ""
      else s""""wall_class":${obj[String](wallClass, v => s""""$v"""")},"""
    s"""{"queries":${obj[Double](walls, _.toString)},
       |"shuffle_write_mb":${obj[Double](shuffle, _.toString)},$wc
       |"contaminated":$contaminated,
       |"total":${walls.values.sum}}""".stripMargin.replace("\n", "")
  }

  private val baseWalls =
    Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.8, "d" -> 1.5, "e" -> 3.0)
  private val baseShuffle =
    Map("a" -> 10.0, "b" -> 5.0, "c" -> 0.5, "d" -> 20.0, "e" -> 8.0)

  private def fixture(dir: Path): Path =
    write(dir, "baseline.json", mapJson(baseWalls, baseShuffle, false))

  test("uniformly-1.19x candidate is refused (the r13 hand-caught shape)") {
    val dir = Files.createTempDirectory("adjbench")
    val base = fixture(dir)
    val cand = write(dir, "cand.json",
      mapJson(baseWalls.view.mapValues(_ * 1.19).toMap, baseShuffle, false))
    assert(run(cand, base) !== 0)
  }

  test("parity candidate is accepted") {
    val dir = Files.createTempDirectory("adjbench")
    val base = fixture(dir)
    val cand = write(dir, "cand.json",
      mapJson(baseWalls.view.mapValues(_ * 1.02).toMap, baseShuffle, false))
    assert(run(cand, base) === 0)
  }

  test("candidate self-reporting contaminated=true is refused outright") {
    val dir = Files.createTempDirectory("adjbench")
    val base = fixture(dir)
    val cand = write(dir, "cand.json",
      mapJson(baseWalls, baseShuffle, contaminated = true))
    assert(run(cand, base) !== 0)
  }

  test("slow-but-plan-changed queries (different shuffle bytes) are " +
      "exempt: wall deltas on changed plans are code, not load") {
    val dir = Files.createTempDirectory("adjbench")
    val base = fixture(dir)
    // a,b,e got slower AND their shuffle changed (new plan); c,d steady
    val cand = write(dir, "cand.json", mapJson(
      Map("a" -> 2.0, "b" -> 4.0, "c" -> 0.82, "d" -> 1.51, "e" -> 6.0),
      Map("a" -> 25.0, "b" -> 12.0, "c" -> 0.5, "d" -> 20.0, "e" -> 30.0),
      contaminated = false))
    assert(run(cand, base, minN = 2) === 0)
  }

  test("non-steady wall classes are exempt from the load median") {
    val dir = Files.createTempDirectory("adjbench")
    val base = fixture(dir)
    // a,b,e bistable-class and slow; steady c,d at parity
    val cand = write(dir, "cand.json", mapJson(
      Map("a" -> 2.0, "b" -> 4.0, "c" -> 0.82, "d" -> 1.51, "e" -> 6.0),
      baseShuffle, contaminated = false,
      wallClass = Map("a" -> "decode", "b" -> "iterative", "c" -> "steady",
        "d" -> "steady", "e" -> "serving")))
    assert(run(cand, base, minN = 2) === 0)
  }

  test("too-small comparison set accepts with a warning rather than " +
      "judging load from noise") {
    val dir = Files.createTempDirectory("adjbench")
    val base = fixture(dir)
    val cand = write(dir, "cand.json",
      mapJson(baseWalls.view.mapValues(_ * 1.19).toMap, baseShuffle, false))
    assert(run(cand, base, minN = 50) === 0)
  }
}
