package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Tables._

/** Scratch profiler for the MinHash+LSH pair pipeline stages. */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val K = 16
    val R = 4
    val tokensExpr = "regexp_extract_all(lower(text), '[a-z]+', 0)"
    val shingled = t(spark, sfDir, "documents")
      .select(col("doc_id"), expr(tokensExpr).as("toks"))
      .select(col("doc_id"), array_distinct(
        graft.functions.TextFunctions.word_shingles(col("toks"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    time("shingled")(shingled.count())
    val sigs = {
      val rows = shingled.select(col("doc_id"), explode(col("sh")).as("g"))
      val minCols = (0 until K).map(i => min(h60(col("g"), i)).as(s"m$i"))
      rows.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }.persist()
    time("sigs")(sigs.count())
    val bandCols = (0 until K / R).map { b =>
      val slots = (b * R until (b + 1) * R).map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band"),
        h60s(concat_ws("#", slots :+ lit(b).cast("string"): _*)).as("bhash"))
    }
    val allBands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
      .persist()
    time("allBands")(allBands.count())
    val bigBuckets = allBands.groupBy("band", "bhash")
      .agg(count(lit(1)).as("bn")).filter(col("bn") > 1000)
      .select(col("band"), col("bhash"))
    val bands = allBands.join(broadcast(bigBuckets),
      Seq("band", "bhash"), "left_anti")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bhash") === col("y.bhash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct().persist()
    val nc = time("cand")(cand.count())
    println(s"n_cand: $nc")
    val verified = cand
      .join(shingled.as("ta"), col("a") === col("ta.doc_id"))
      .join(shingled.as("tb"), col("b") === col("tb.doc_id"))
      .withColumn("inter",
        expr("size(filter(ta.sh, g -> array_contains(tb.sh, g)))"))
      .withColumn("uni",
        size(col("ta.sh")) + size(col("tb.sh")) - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= 0.5)
      .select(col("a"), col("b")).persist()
    val nv = time("verify")(verified.count())
    println(s"n_pairs: $nv")
    spark.stop()
  }
}
