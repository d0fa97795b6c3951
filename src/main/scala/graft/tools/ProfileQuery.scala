package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev microbenchmark: run one SparkEntry query N times in a session —
  * a large first-vs-rest gap means driver-side cost (analysis +
  * whole-stage codegen compilation), not execution.
  * `sbt "runMain graft.tools.ProfileQuery d_cross_source_overlap 3"`.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d_cross_source_overlap")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"[prof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
