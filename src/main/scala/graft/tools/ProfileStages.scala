package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbenchmark: where does a dedup-family row's time go —
  * parquet scan, tokenization, shingle construction, or hashing?
  * Run: `sbt "runMain graft.tools.ProfileStages /root/testdata/sf0.1"`.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    time("scan only")(docs.select(col("doc_id")).count())
    time("scan+text len")(docs.select(length(col("text")).as("len"))
      .agg(sum("len")).count())
    time("tokenize")(docs.select(size(ascii_words(col("text"))).as("n"))
      .agg(sum("n")).count())
    time("tokenize+shingle5")(docs.select(
      size(word_shingles(ascii_words(col("text")), 5)).as("n"))
      .agg(sum("n")).count())
    time("tokenize+shingle5+explode")(docs.select(
      explode(word_shingles(ascii_words(col("text")), 5)).as("g")).count())
    time("tokenize+shingle5+explode+md5h60")(docs.select(
      explode(word_shingles(ascii_words(col("text")), 5)).as("g"))
      .select(graft.queries.Tables.h60s(col("g")).as("h"))
      .agg(sum("h")).count())
    time("...+groupBy h count")(docs.select(
      explode(word_shingles(ascii_words(col("text")), 5)).as("g"))
      .select(graft.queries.Tables.h60s(col("g")).as("h"))
      .groupBy("h").count().count())
    time("distinct-shingle explode (array_distinct)")(docs.select(
      explode(array_distinct(word_shingles(ascii_words(col("text")), 5)))
        .as("g")).count())
    val bySh = docs.select(col("source"),
      explode(array_distinct(word_shingles(ascii_words(col("text")), 5)))
        .as("gstr"))
      .select(col("source"), graft.queries.Tables.h60s(col("gstr")).as("g"))
      .groupBy("g")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
    time("bySh agg (collect_set)")(bySh.count())
    val p = bySh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("bySh persist materialize")(p.count())
    time("nOf collect")(p.select(explode(col("srcs")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n")).count())
    time("pair expansion")(p.filter(size(col("srcs")) >= 2)
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
             transform(slice(srcs, i + 2, size(srcs)),
               y -> named_struct('sa', x, 'sb', y))))""")).as("pp"))
      .groupBy(col("pp.sa"), col("pp.sb"))
      .agg(count(lit(1)).as("n")).count())
    p.unpersist(true)
    spark.stop()
  }
}
