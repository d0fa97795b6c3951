package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Session-state lifecycle of the cross-query memos: a long-lived
  * session sweeping many corpus dirs must be able to RELEASE what a
  * dir's queries pinned — the persisted near-dup pair RDDs
  * (Dedup.pairsMemo) and the connector setup's temp-warehouse tables
  * (ConnectorQ.memo) — instead of accumulating one corpus's worth of
  * executor storage / disk per dir until shutdown.
  */
class MemoLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    // getOrCreate shares the SparkContext with any suite that ran
    // earlier in this JVM — start from a clean slate so the
    // empty-storage assertions below are order-independent
    graft.queries.Dedup.releaseAllNearDupPairs()
    graft.queries.Pipeline.releaseAllDupClusterLabels()
    graft.queries.Similarity.releaseAllIvfModels()
  }
  override def afterAll(): Unit = spark.stop()

  test("connector setup releases its per-dir namespace and tables") {
    val dir = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("c_append_scan")(spark, dir).count() > 0)
    val ns = graft.queries.ConnectorQ.activeNamespace(spark, dir)
      .getOrElse(fail("setup must have memoized its namespace"))
    assert(spark.sql(s"SHOW TABLES IN graft_c.$ns").count() > 0,
      "setup must have created tables in the per-dir namespace")
    graft.queries.ConnectorQ.release(spark, dir)
    val nss = spark.sql("SHOW NAMESPACES IN graft_c")
      .collect().map(_.getString(0)).toSet
    assert(!nss.contains(ns), s"namespace $ns must be dropped, got $nss")
    // the same dir sets up again from scratch on next use
    assert(SparkEntry.queries("c_append_scan")(spark, dir).count() > 0)
    graft.queries.ConnectorQ.release(spark, dir)
  }

  test("a second session in the same JVM gets its own connector setup") {
    // the memo keys by (session identity, dir): serving session A's
    // Setup to session B would hand B a namespace in a catalog B's
    // session conf never configured ("Catalog graft_c not found")
    val dir = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("c_append_scan")(spark, dir).count() > 0)
    val s2 = spark.newSession()
    assert(SparkEntry.queries("c_append_scan")(s2, dir).count() > 0)
    assert(graft.queries.ConnectorQ.activeNamespace(s2, dir).isDefined)
    assert(graft.queries.ConnectorQ.activeNamespace(s2, dir) !=
      graft.queries.ConnectorQ.activeNamespace(spark, dir),
      "sessions must not share a namespace")
    graft.queries.ConnectorQ.release(s2, dir)
    graft.queries.ConnectorQ.release(spark, dir)
  }

  test("near-dup pair memo releases executor storage per dir") {
    val d1 = "/root/testdata/sf0.001"
    val d2 = "/root/testdata/sf0.01"
    assert(graft.queries.Dedup.nearDupPairs(spark, d1).count() >= 0)
    assert(graft.queries.Dedup.nearDupPairs(spark, d2).count() >= 0)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the memoized pair frames are persisted")
    graft.queries.Dedup.releaseNearDupPairs(spark, d1)
    graft.queries.Dedup.releaseNearDupPairs(spark, d2)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked persisted RDDs: ${spark.sparkContext.getPersistentRDDs.keySet}")
    // double-release is a no-op; next use recomputes
    graft.queries.Dedup.releaseNearDupPairs(spark, d1)
    assert(graft.queries.Dedup.nearDupPairs(spark, d1).count() >= 0)
    graft.queries.Dedup.releaseAllNearDupPairs()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("ivf model memo trains once, is shared, and releases its codes") {
    val d1 = "/root/testdata/sf0.001"
    val train = SparkEntry.queries("s_ivf_train")(spark, d1)
    assert(train.count() >= 1)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the memoized quantized-code frame is persisted")
    val pinned = spark.sparkContext.getPersistentRDDs.keySet
    // search must REUSE the trained model, not train a second one
    assert(SparkEntry.queries("s_ivf_search")(spark, d1).count() >= 1)
    assert(spark.sparkContext.getPersistentRDDs.keySet == pinned,
      "s_ivf_search must not pin a second codes cache")
    graft.queries.Similarity.releaseAllIvfModels()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keySet}")
    // double-release is a no-op; next use retrains from scratch
    graft.queries.Similarity.releaseAllIvfModels()
    assert(SparkEntry.queries("s_ivf_train")(spark, d1).count() >= 1)
    graft.queries.Similarity.releaseAllIvfModels()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("stream sink state does not survive a connector release") {
    // the file-sink stream keys its checkpoint + output by ns; a
    // release must delete both, or a re-setup of the same dir would
    // resume from the dropped incarnation's offsets (and re-serve its
    // old sink files) against freshly rebuilt tables
    val dir = "/root/testdata/sf0.001"
    val first = SparkEntry.queries("c_stream_dedup_wm")(spark, dir)
      .collect().toSeq
    assert(first.nonEmpty)
    val wh = spark.conf.get("spark.sql.catalog.graft_c.warehouse")
    val streams = java.nio.file.Paths.get(wh, "_streams")
    assert(java.nio.file.Files.list(streams).count() > 0,
      "the stream row must have created its sink dir")
    graft.queries.ConnectorQ.release(spark, dir)
    assert(!java.nio.file.Files.exists(streams) ||
      java.nio.file.Files.list(streams).count() == 0,
      "release must delete the per-ns stream state")
    // the same dir re-runs from a fresh checkpoint and agrees
    val second = SparkEntry.queries("c_stream_dedup_wm")(spark, dir)
      .collect().toSeq
    assert(second == first, s"re-run diverged: $second vs $first")
    graft.queries.ConnectorQ.release(spark, dir)
  }

  test("session tokens are stable per session and never shared") {
    import graft.queries.SessionKey
    // memo keys use SessionKey, not System.identityHashCode: identity
    // hashes can be REUSED after a session is GC'd, handing a
    // recreated session a dead session's entries (a DataFrame bound to
    // a stopped session, or a skipped brute-force cap validation)
    val s2 = spark.newSession()
    val s3 = spark.newSession()
    assert(SessionKey.id(spark) == SessionKey.id(spark), "stable")
    assert(Set(SessionKey.id(spark), SessionKey.id(s2), SessionKey.id(s3))
      .size == 3, "three sessions, three tokens")
    assert(SessionKey.shortId(s2).matches("[0-9a-f]{12}"),
      "shortId must be identifier-safe hex")
    assert(SessionKey.shortId(s2) != SessionKey.shortId(s3))
  }

  test("a recreated session computes its own ivf model, never inherits") {
    val d1 = "/root/testdata/sf0.001"
    graft.queries.Similarity.releaseAllIvfModels()
    try {
      val s2 = spark.newSession()
      assert(SparkEntry.queries("s_ivf_train")(s2, d1).count() >= 1)
      assert(graft.queries.Similarity.ivfMemoSize == 1)
      // a session created LATER (after s2 is out of use — in
      // production, GC'd and its identity hash reusable) must get its
      // OWN memo entry rather than being served s2's (shared-context
      // block reuse via the CacheManager is fine; key collision is not)
      val s3 = spark.newSession()
      assert(graft.queries.SessionKey.id(s3) !=
        graft.queries.SessionKey.id(s2))
      assert(SparkEntry.queries("s_ivf_train")(s3, d1).count() >= 1)
      assert(graft.queries.Similarity.ivfMemoSize == 2,
        "s3 must have built its own memo entry, not inherited s2's")
    } finally {
      graft.queries.Similarity.releaseAllIvfModels()
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("dup-cluster label memo releases its checkpoint storage") {
    val d1 = "/root/testdata/sf0.001"
    assert(SparkEntry.queries("d_dup_clusters")(spark, d1).count() == 1)
    assert(SparkEntry.queries("d_dedup_apply")(spark, d1).count() >= 1)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "pairs + label checkpoint are persisted")
    graft.queries.Dedup.releaseAllNearDupPairs()
    graft.queries.Pipeline.releaseAllDupClusterLabels()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keySet}")
  }
}
