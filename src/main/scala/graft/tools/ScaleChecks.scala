package graft.tools

import org.apache.spark.sql.SparkSession

/** Metadata-scale canaries: manifest folding after many commits, and
  * clustered-write file bounds.
  * {{{ sbt "runMain graft.tools.ScaleChecks" }}}
  */
object ScaleChecks {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-scale")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE NAMESPACE graft.d")

    println("== 55 commits: manifest list must fold, reads stay exact")
    spark.sql("CREATE TABLE graft.d.many (k BIGINT)")
    (1 to 55).foreach(i => spark.sql(s"INSERT INTO graft.d.many VALUES ($i)"))
    val sm = new graft.format.SnapshotManager(wh.resolve("d.db/many"))
    val snap = sm.latestSnapshot.get
    println(s"  snapshot ${snap.id}: manifest list size = ${snap.manifests.size} (55 commits)")
    val total = spark.sql("SELECT count(*) AS n, sum(k) AS s FROM graft.d.many").collect()(0)
    println(s"  rows=${total.getLong(0)} sum=${total.getLong(1)} (expect 55, 1540)")

    println("== streaming delta invariant survives folding")
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scale-ckpt")
    val sink = java.nio.file.Files.createTempDirectory("graft-scale-sink")
    def runStream(): Long = {
      val q = spark.readStream.table("graft.d.many")
        .writeStream.format("parquet").option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(sink.toString).count()
    }
    println(s"  first stream run: ${runStream()} rows (expect 55)")
    spark.sql("INSERT INTO graft.d.many VALUES (100)")
    println(s"  after one more commit: ${runStream()} rows (expect 56)")

    println("== clustered INSERT: file count bounded by shuffle partitions")
    spark.sql("CREATE TABLE graft.d.pk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='4')")
    spark.range(0, 1000, 1, 64).createOrReplaceTempView("src")
    println("  INSERT plan:")
    spark.sql("INSERT INTO graft.d.pk SELECT id, CAST(id AS STRING) FROM src")
    val files = new graft.format.SnapshotManager(wh.resolve("d.db/pk")).liveFilesLatest
    println(s"  64 input partitions -> ${files.size} data files " +
      s"(<= 16 = 4 shuffle partitions x 4 buckets); rows=${spark.table("graft.d.pk").count()}")
    spark.stop()
  }
}
