package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one named query from the inventory, twice (cold + warm), and
  * optionally print its formatted plan.
  *
  * {{{ sbt "runMain graft.tools.QueryTimer <name> [sfDir] [explain]" }}}
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // diagnostic A/B: how much of a query's wall time is AQE's
    // per-stage replanning cascade vs real work (GRAFT_NO_AQE=1)
    if (sys.env.get("GRAFT_NO_AQE").contains("1"))
      builder.config("spark.sql.adaptive.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    // aggregate shuffle volume per run via a task-metrics listener —
    // the per-query cost-class evidence PLANS.md cites (bytes written
    // covers every exchange the run triggered, AQE reuses included)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // GRAFT_STAGE_TIMING=1: per-stage wall time + task count + callsite
    // for the LAST run — the empirical "where does the time go" readout
    // guide §1.1 asks for when no UI is available.
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val logStages = sys.env.get("GRAFT_STAGE_TIMING").contains("1")
    if (logStages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val s = e.stageInfo
          val ms = (for {a <- s.completionTime; b <- s.submissionTime}
            yield a - b).getOrElse(-1L)
          stageLog.add(f"stage ${s.stageId}%4d sub=${s.submissionTime
            .getOrElse(0L) % 1000000}%6d ${ms / 1000.0}%6.2f s " +
            f"${s.numTasks}%4d tasks  ${s.name.linesIterator.next()}")
        }
      })
    // ...and per-micro-batch progress for streaming rows: durationMs
    // breakdown (addBatch/getBatch/commitOffsets/walCommit/...) per
    // batch, the streaming counterpart of the stage log.
    if (logStages) spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          stageLog.add(s"batch ${p.batchId}: rows=${p.numInputRows} " +
            s"durations=$d")
        }
      })
    (1 to 3).foreach { i =>
      shufWrite.set(0); shufRead.set(0)
      if (i == 3) stageLog.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      // (listenerBus is private[spark]; a short sleep suffices for a
      // diagnostic tool)
      Thread.sleep(1500)
      println(f"run $i: $sec%.2f s, $n rows, " +
        f"shuffle write ${shufWrite.get() / 1048576.0}%.1f MiB / " +
        f"read ${shufRead.get() / 1048576.0}%.1f MiB")
      if (logStages && i == 1) {
        // streaming rows do all their work in run 1 (later runs replay
        // a completed checkpoint): dump batch progress now
        println("=== run 1 batches ===")
        stageLog.forEach(println(_))
      }
    }
    if (logStages) {
      println("=== stages of run 3 ===")
      stageLog.forEach(println(_))
    }
    spark.stop()
  }
}
