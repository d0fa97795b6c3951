package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the minhash pipeline. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tokensExpr = "regexp_extract_all(lower(text), '[a-z]+', 0)"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("read+count")(docs.count())
    val shingled = docs
      .select(col("doc_id"), expr(tokensExpr).as("toks"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(1, greatest(size(toks)-2, 0)),
           i -> concat_ws(' ', slice(toks, i, 3))))""").as("sh"))
      .filter(size(col("sh")) > 0).persist()
    time("shingle+persist")(shingled.count())
    val rows = shingled.select(col("doc_id"), explode(col("sh")).as("g"))
    time("explode count")(rows.count())
    val minCols = (0 until 16).map(i => min(xxhash64(col("g"), lit(i))).as(s"m$i"))
    val sigs = rows.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    time("sigs agg")(sigs.count())
    val bandCols = (0 until 4).map { b =>
      val slots = (b * 4 until (b + 1) * 4).map(i => col(s"m$i"))
      struct(lit(b).as("band"), xxhash64(slots :+ lit(b): _*).as("bhash"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
    time("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    time("candidates")(cand.count())
    val joined = cand.join(shingled.as("ta"), col("a") === col("ta.doc_id"))
      .join(shingled.as("tb"), col("b") === col("tb.doc_id"))
      .withColumn("inter", expr("size(filter(ta.sh, g -> array_contains(tb.sh, g)))"))
      .withColumn("uni", size(col("ta.sh")) + size(col("tb.sh")) - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= 0.5)
      .agg(count(lit(1)).as("n"))
    time("verify+agg")(joined.count())
    spark.stop()
  }
}
