package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import graft.api._
import graft.core.RowKind

/** Runnable walkthrough of the facade API (the reference-shaped builder
  * surface): catalog → table → two-phase write → predicate/projection/
  * limit reads → RowKind delete → temp-view SQL sink.
  *
  * {{{ sbt "runMain graft.tools.ApiDemo" }}}
  */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("graft-api-demo")
    val catalog = Catalog.create(spark, Map("warehouse" -> wh.toString))
    catalog.createDatabase("demo")
    catalog.createTable("demo.kv", Schema(
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      primaryKeys = Seq("k"), options = Map("bucket" -> "2")))

    val table = catalog.getTable("demo.kv")

    println("== two-phase write: commit 1")
    val wb = table.newBatchWriteBuilder()
    val w = wb.newWrite()
    w.write(Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v"))
    val msgs = w.prepareCommit()
    println(s"  prepareCommit -> ${msgs.length} file(s): " +
      msgs.map(m => s"${m.fileName} rows=${m.rowCount} seq=[${m.minSeq},${m.maxSeq}]").mkString("; "))
    wb.newCommit().commit(msgs)

    println("== upsert + RowKind delete: commit 2")
    val wb2 = table.newBatchWriteBuilder()
    val w2 = wb2.newWrite()
    w2.write(Seq((2L, "TWO")).toDF("k", "v"))
    w2.write(Seq((3L, "x")).toDF("k", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte")))
    wb2.newCommit().commit(w2.prepareCommit())

    println("== read with predicate builder (k >= 1), projection [v], after merge")
    val rb = table.newReadBuilder()
    val pb = rb.newPredicateBuilder()
    rb.withFilter(pb.greaterOrEqual("k", 1L)).withProjection(Seq("v", "k"))
    rb.newRead().toDF().orderBy("k").show()

    println("== split metadata (scan.plan().splits)")
    table.newReadBuilder().newScan().plan().splits.foreach(s =>
      println(s"  rows=${s.rowCount} bytes=${s.fileSize} files=${s.filePaths.map(_.split('/').last).mkString(",")}"))

    println("== temp view sink + SQL")
    table.newReadBuilder().newRead().createTempView("kv_view")
    spark.sql("SELECT count(*) AS n FROM kv_view").show()

    println("== probe: unknown predicate field")
    try pb.equal("nope", 1)
    catch { case e: Exception => println("  rejected: " + e.getMessage) }

    println("== SQL-callable catalog functions (FunctionCatalog, sys namespace)")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    spark.sql(
      """SELECT a.vec_id, b.vec_id AS other,
           graft.sys.vec_cosine(a.embedding, b.embedding) AS cos
         FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id IN (1, 2)
         ORDER BY other""").show()
    spark.sql("SELECT graft.sys.word_shingles(array('new','york','city','hall'), 2) AS bigrams").show(truncate = false)
    println("== probe: unknown function")
    try spark.sql("SELECT graft.sys.nope(1)").collect()
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }

    println("== probe: schema type mismatch (int vs bigint)")
    try table.newBatchWriteBuilder().newWrite()
      .write(Seq((1, "a")).toDF("k", "v"))
    catch { case e: Exception =>
      println("  rejected: " + e.getMessage.linesIterator.next()) }

    spark.stop()
  }
}
