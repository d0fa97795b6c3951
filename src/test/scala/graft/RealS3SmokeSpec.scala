package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Paths}

/** Opt-in smoke test against a REAL S3-compatible endpoint (MinIO,
  * AWS, GCS-XML, …). The `s3:` data plane is otherwise proven only
  * against the in-process stub server (S3FileIOSpec) — this spec makes
  * sure the first real deployment is not the first real test.
  *
  * Gated on environment; without it every test cancels cleanly:
  *
  * {{{
  * export GRAFT_S3_SMOKE_SPEC="s3:http://127.0.0.1:9000:us-east-1:graft-smoke"
  * export GRAFT_S3_ACCESS_KEY=...   # same vars FileIO.resolve reads
  * export GRAFT_S3_SECRET_KEY=...
  * sbt "testOnly graft.RealS3SmokeSpec"
  * }}}
  *
  * The bucket must exist and the credentials must allow read/write/
  * delete/list in it. Keys are written under a per-run prefix and
  * dropped (DROP TABLE purges remote keys) on success.
  */
class RealS3SmokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val ioSpec = sys.env.get("GRAFT_S3_SMOKE_SPEC")
  private def configured: Boolean =
    ioSpec.exists(_.startsWith("s3:")) &&
      sys.env.contains("GRAFT_S3_ACCESS_KEY") &&
      sys.env.contains("GRAFT_S3_SECRET_KEY")

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-s3smoke-wh")
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse.toString)
      .getOrCreate()
  }

  // per-run table names: a shared real bucket may hold leftovers from
  // an earlier aborted run
  private val runId = java.lang.Long.toHexString(System.nanoTime())

  override def afterAll(): Unit = if (configured) spark.stop()

  test("byte ops round-trip against the real endpoint") {
    assume(configured, "GRAFT_S3_SMOKE_SPEC / credentials not set — skipping")
    val io = graft.format.FileIO.resolve(ioSpec.get)
    val p = Paths.get(s"/graft-smoke/$runId/probe")
    io.writeAtomic(p, "hello".getBytes("UTF-8"))
    assert(io.readString(p) == "hello")
    assert(io.size(p) == 5L)
    assert(new String(io.readRange(p, 1, 3), "UTF-8") == "ell")
    assert(io.putIfAbsent(Paths.get(s"/graft-smoke/$runId/commit"), "{}"))
    assert(!io.putIfAbsent(Paths.get(s"/graft-smoke/$runId/commit"), "{}"),
      "conditional PUT must lose on an existing key — if this fails, the " +
        "endpoint does not honor If-None-Match and CANNOT host graft commits")
    assert(io.list(Paths.get(s"/graft-smoke/$runId")).sorted ==
      Seq("commit", "probe"))
    assert(io.delete(p))
    assert(io.delete(Paths.get(s"/graft-smoke/$runId/commit")))
  }

  test("PK table end-to-end on the real endpoint (IoWiringSpec scenario)") {
    assume(configured, "GRAFT_S3_SMOKE_SPEC / credentials not set — skipping")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.default")
    val t = s"graft.default.s3smoke_$runId"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES " +
      s"('primary-key'='k', 'bucket'='2', 'io'='${ioSpec.get}')")
    try {
      spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b'), (3,'c')")
      spark.sql(s"INSERT INTO $t VALUES (2,'B'), (4,'d')")
      // merge-on-read across two remote commits (columnar scan via the
      // graftio:// adapter → ranged GETs against the real endpoint)
      val got = spark.sql(s"SELECT * FROM $t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
      // time travel + system table against the remote snapshot chain
      assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").count() == 3)
      assert(spark.sql(s"SELECT count(*) FROM graft.default." +
        s"`s3smoke_$runId$$snapshots`").collect()(0).getLong(0) == 2L)
      // row-level DML through the remote store
      spark.sql(s"DELETE FROM $t WHERE k = 3")
      assert(spark.table(t).count() == 3)
      // only catalog metadata may live locally
      val local = Files.list(
        warehouse.resolve("default.db").resolve(s"s3smoke_$runId")).iterator()
      val names = scala.jdk.CollectionConverters.IteratorHasAsScala(local)
        .asScala.map(_.getFileName.toString).toSet
      assert(names == Set("schema"), s"only schema/ may be local: $names")
    } finally
      spark.sql(s"DROP TABLE IF EXISTS $t") // purges the remote keys
  }
}
