package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal
import graft.functions.Multimodal._

/** The multimodal pipeline's Spark plumbing: typed schema, partition-
  * local decode, flatMap frame expansion, deterministic stub values.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extractFeatures: schema, determinism, null-free output") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, "image", "hello world".getBytes),
      MediaBlob(2L, "audio", Array[Byte]()),
      MediaBlob(3L, "video", (0 until 1000).map(_.toByte).toArray)).toDS()
    val feats = Multimodal.extractFeatures(blobs).collect().sortBy(_.docId)
    assert(feats.map(_.docId).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).nBytes == 11)
    // stub decode is deterministic: same bytes → same dims
    val again = Multimodal.extractFeatures(blobs).collect().sortBy(_.docId)
    assert(feats.map(f => (f.width, f.height, f.meanLuma)).toSeq ==
      again.map(f => (f.width, f.height, f.meanLuma)).toSeq)
    // empty blob handled
    assert(feats(1).nBytes == 0 && feats(1).byteEntropy == 0.0)
    // 1000 distinct bytes → high entropy
    assert(feats(2).byteEntropy > 7.5)
  }

  test("sampleFrames: exact expansion factor and stable hashes") {
    import spark.implicits._
    val blobs = Seq(MediaBlob(7L, "video", (0 until 100).map(_.toByte).toArray)).toDS()
    val frames = Multimodal.sampleFrames(blobs, 4).collect().sortBy(_.frameIdx)
    assert(frames.length == 4)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.frameHash).distinct.length == 4)
  }

  test("resize keeps length, tags header deterministically") {
    import spark.implicits._
    val blobs = Seq(MediaBlob(1L, "image", "abcdef".getBytes)).toDS()
    val out = Multimodal.resize(blobs, 128, 96).collect()(0)
    assert(out.bytes.length == 6)
    assert(out.bytes(0) == (128 % 251).toByte && out.bytes(1) == (96 % 251).toByte)
  }

  test("pipeline over documents table end-to-end") {
    val profile = SparkEntry.queries("mm_feature_profile")(
      spark, "/root/testdata/sf0.001")
    val rows = profile.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum == 500)
  }
}
