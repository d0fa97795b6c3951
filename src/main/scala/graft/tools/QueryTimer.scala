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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
    (1 to 3).foreach { i =>
      shufWrite.set(0); shufRead.set(0)
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
    }
    spark.stop()
  }
}
