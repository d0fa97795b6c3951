package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-stage wall-time profile of one SparkEntry query — the tool that
  * separates "the plan is slow" from "one stage is skewed/serial" from
  * "the JVM was cold". Prints every completed stage with its duration
  * and task count, then the build/execute phase split.
  *
  * Usage: runMain graft.tools.StageProfile <query> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.get - si.submissionTime.get
        println(f"STAGE ${si.stageId}%3d ${dur}%6d ms tasks=${si.numTasks}%3d ${si.name.take(60)}")
      }
    })
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t1 = System.nanoTime()
    df.collect()
    val t2 = System.nanoTime()
    println(f"PHASE build=${(t1 - t0) / 1e9}%.2f exec=${(t2 - t1) / 1e9}%.2f")
    Thread.sleep(500) // let the last stage-completed event drain
    spark.stop()
  }
}
