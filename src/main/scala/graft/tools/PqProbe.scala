package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Micro-benchmark that reproduced the r18 PQ-assignment finding: the
  * composed `array_min(array(16 x struct(IntVectorSqL2(slice, lit),
  * cid)))` shape ran ~60 us/row under whole-stage codegen at 1M rows
  * (63 s for this scan) where the compact
  * [[graft.functions.IntVectorArgminSqL2]] kernel runs it in ~2 s.
  * Kept as the regression probe for that plan-shape lesson:
  * {{{ sbt "runMain graft.tools.PqProbe" }}}  (WS=false disables
  * whole-stage codegen for comparison).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WS","true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same shape as pqTrainStats: 8 subspaces x array_min over 16
    // (IntVectorSqL2(slice, lit), cid) structs, explode, rollup
    val cents: Seq[Seq[Int]] = (0 until 16).map(c => (0 until 8).map(d => (c * 13 + d * 7) % 256))
    val qv = spark.range(0, 1050000L, 1, 32)
      .selectExpr("id AS vec_id",
        "transform(sequence(0, 63), d -> CAST(pmod(xxhash64(id, d), 256) AS INT)) AS qv")
      .select(col("vec_id") +: (0 until 8).map(m => slice(col("qv"), m * 8 + 1, 8).as(s"sv$m")): _*)
    def distArr(m: Int) = array(cents.zipWithIndex.map { case (cv, cid) =>
      struct(graft.functions.VectorFunctions.vec_sql2_int(col(s"sv$m"), typedLit(cv)).as("dist"),
        lit(cid.toLong).as("cid")) }: _*)
    val t0 = System.nanoTime()
    val n = qv.select(explode(array((0 until 8).map(m =>
        struct(lit(m.toLong).as("m"), array_min(distArr(m)).as("best"))): _*)).as("e"))
      .select(col("e.m").as("m"), col("e.best.cid").as("cid"))
      .groupBy("m", "cid").count().count()
    println(f"probe: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    // second timing: warm
    val t1 = System.nanoTime()
    qv.select(explode(array((0 until 8).map(m =>
        struct(lit(m.toLong).as("m"), array_min(distArr(m)).as("best"))): _*)).as("e"))
      .select(col("e.m").as("m"), col("e.best.cid").as("cid"))
      .groupBy("m", "cid").count().count()
    println(f"probe warm: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
