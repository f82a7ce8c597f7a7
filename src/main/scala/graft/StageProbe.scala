package graft

/** Shared per-stage print listener for the adjudication probes
  * (ScopedProbe's and KnnBuildProbe's "stages" mode): one line per
  * completed stage — wall, task-time sum, shuffle read/write, spill —
  * the §6.2c stage-probe discipline that root-caused the
  * dedup_clusters 30× transition and the kNN-build scoring-join
  * overhang. Task-time sum vs wall exposes serialization: a stage
  * whose taskSum ≈ wall on a 32-core session ran single-threaded. */
final class StageProbe extends org.apache.spark.scheduler.SparkListener {
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val i = sc.stageInfo
    val m = i.taskMetrics
    if (m != null) {
      val wall = (for {
        s <- i.submissionTime; c <- i.completionTime
      } yield (c - s) / 1e3).getOrElse(-1.0)
      println(f"stage ${i.stageId}%3d tasks=${i.numTasks}%3d " +
        f"wall=$wall%7.2f s taskSum=${m.executorRunTime / 1e3}%8.2f s " +
        f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB " +
        f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
        f"spill=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6}%6.1f MB" +
        f"  ${i.name.takeWhile(_ != '\n').take(60)}")
    }
  }
}
