package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Live walkthrough of the incremental streaming source: a checkpointed
  * query consumes commits as micro-batches, resumes from its offset,
  * and skips OVERWRITE snapshots.
  *
  * {{{ sbt "runMain graft.tools.StreamingDemo" }}}
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-demo")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sql("CREATE NAMESPACE graft.demo")
    spark.sql("CREATE TABLE graft.demo.clicks (id BIGINT, page STRING)")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (1,'home'), (2,'cart')")

    val sinkDir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    var lastCount = 0L
    def runOnce(tag: String): Unit = {
      val q = spark.readStream.table("graft.demo.clicks")
        .writeStream.format("parquet")
        .option("path", sinkDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val sunk = spark.read.parquet(sinkDir.toString)
      val newRows = sunk.count() - lastCount
      lastCount = sunk.count()
      println(s"== $tag: +$newRows new row(s); sink now:")
      sunk.orderBy("id").show()
    }

    runOnce("batch1") // expect ids 1,2

    println("== two more commits while the query is stopped")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (3,'search')")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (4,'checkout')")
    runOnce("batch2") // checkpoint resume: only ids 3,4 (incremental)

    println("== probe: INSERT OVERWRITE is skipped by the stream")
    spark.sql("INSERT OVERWRITE graft.demo.clicks VALUES (9,'reset')")
    runOnce("batch3") // expect EMPTY (overwrite snapshot skipped)

    println("== probe: append after overwrite resumes streaming")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (10,'post-reset')")
    runOnce("batch4") // expect id 10 only

    println("== batch view after everything (merged table state)")
    spark.sql("SELECT * FROM graft.demo.clicks ORDER BY id").show()

    println("== $changelog system table: full input changelog incl. a RowKind delete")
    spark.sql("CREATE TABLE graft.demo.pk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.demo.pk VALUES (1,'a'), (2,'b')")
    spark.sql("INSERT INTO graft.demo.pk VALUES (2,'B')")
    // delete k=1 via the facade RowKind path
    val cat = graft.api.Catalog.create(spark, Map("warehouse" -> wh.toString,
      "catalog-name" -> "graft"))
    val th = cat.getTable("demo.pk")
    val wb = th.newBatchWriteBuilder(); val w = wb.newWrite()
    import spark.implicits._
    w.write(Seq((1L, "a")).toDF("k", "v")
      .withColumn(graft.core.RowKind.ColumnName,
        org.apache.spark.sql.functions.lit(graft.core.RowKind.Delete).cast("byte")))
    wb.newCommit().commit(w.prepareCommit())

    println("  changelog (batch read):")
    spark.sql("SELECT k, v, _row_kind, _sequence_number FROM graft.demo.`pk$changelog` " +
      "ORDER BY _sequence_number").show()
    println("  merged view (k=1 deleted, k=2 upserted):")
    spark.sql("SELECT * FROM graft.demo.pk ORDER BY k").show()
    println("  probe: write to the view")
    try spark.sql("INSERT INTO graft.demo.`pk$changelog` VALUES (9,'z',0,0)")
    catch { case e: Exception => println("   rejected: " + e.getMessage.linesIterator.next()) }

    println("== fromSnapshot=-1: stream from latest, skipping history")
    val lSink = java.nio.file.Files.createTempDirectory("graft-latest-sink")
    val lCkpt = java.nio.file.Files.createTempDirectory("graft-latest-ckpt")
    def latestRun(): Long = {
      val q = spark.readStream.option("fromSnapshot", "-1")
        .table("graft.demo.clicks")
        .writeStream.format("parquet").option("path", lSink.toString)
        .option("checkpointLocation", lCkpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      try spark.read.parquet(lSink.toString).count() catch { case _: Exception => 0L }
    }
    println(s"  first run over a table with history: ${latestRun()} rows (expect 0)")
    spark.sql("INSERT INTO graft.demo.clicks VALUES (99,'fresh')")
    println(s"  after one new commit: ${latestRun()} rows (expect 1)")

    println("== retraction changelog: balances table with upserts")
    spark.sql("CREATE TABLE graft.demo.bal (k BIGINT, amount DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.demo.bal VALUES (1, 10.0), (2, 20.0)")
    spark.sql("INSERT INTO graft.demo.bal VALUES (1, 15.0), (3, 5.0)")
    spark.sql("INSERT INTO graft.demo.bal VALUES (2, 0.5)")
    val rq = spark.readStream.option("retractions", "true")
      .table("graft.demo.`bal$changelog`")
      .writeStream.format("memory").queryName("ret_sink")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    rq.awaitTermination(60000)
    println("  synthesized changelog (+I=0 -U=1 +U=2 -D=3):")
    spark.sql("SELECT k, amount, _row_kind FROM ret_sink ORDER BY _sequence_number, _row_kind").show()
    println("  incremental batch read of snapshot 2 only (fromSnapshot=1, toSnapshot=2):")
    spark.read.option("fromSnapshot", "1").option("toSnapshot", "2")
      .table("graft.demo.`bal$changelog`")
      .orderBy("_sequence_number").show()
    println("  probe: incremental read on the base table")
    try spark.read.option("fromSnapshot", "1").table("graft.demo.bal").collect()
    catch { case e: Exception => println("   rejected: " + e.getMessage.linesIterator.next()) }
    println("  signed fold of the changelog vs merged table total:")
    spark.sql("""SELECT
        (SELECT SUM(CASE WHEN _row_kind IN (0,2) THEN amount ELSE -amount END) FROM ret_sink) AS changelog_total,
        (SELECT SUM(amount) FROM graft.demo.bal) AS merged_total""").show()

    println("== streaming WRITE: events stream into a PK aggregation sink")
    // the full loop over the format: graft source -> transform -> graft
    // sink; the sink's aggregation engine does the summing at merge
    // time, so there is no stateful streaming aggregate and no
    // update-mode sink — state is the table itself
    spark.sql("CREATE TABLE graft.demo.impressions (user_id BIGINT, n BIGINT)")
    spark.sql("CREATE TABLE graft.demo.click_totals " +
      "(user_id BIGINT, total BIGINT) " +
      "TBLPROPERTIES ('primary-key'='user_id','bucket'='2'," +
      "'merge-engine'='aggregation'," +
      "'fields.total.aggregate-function'='sum')")
    spark.sql("INSERT INTO graft.demo.impressions VALUES (1, 2), (2, 3)")
    spark.sql("INSERT INTO graft.demo.impressions VALUES (1, 5), (3, 1)")
    val ck = java.nio.file.Files.createTempDirectory("demo-swck").toString
    def pump(): Unit = {
      val q = spark.readStream.table("graft.demo.impressions")
        .selectExpr("user_id", "n AS total")
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .toTable("graft.demo.click_totals")
      q.awaitTermination(60000)
    }
    pump()
    println("  folded totals after 2 epochs:")
    spark.sql("SELECT * FROM graft.demo.click_totals ORDER BY user_id").show()
    spark.sql("INSERT INTO graft.demo.impressions VALUES (2, 10)")
    pump() // resumes from the checkpoint: only the new commit flows
    println("  after one more source commit (epoch identities on snapshots):")
    spark.sql("SELECT * FROM graft.demo.click_totals ORDER BY user_id").show()
    spark.sql("SELECT snapshot_id, commit_kind FROM " +
      "graft.demo.`click_totals$snapshots` ORDER BY snapshot_id").show()

    spark.stop()
  }
}
