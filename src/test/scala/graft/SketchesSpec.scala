package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Statistical contracts of the sketch rows (the DuckDB oracle pins
  * bit-equality; these pin the MATH): CMS estimates never undercount,
  * and the HLL estimate lands within the published error band for
  * m = 64 registers.
  */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.01"

  test("CMS estimates are one-sided: never below the exact count") {
    val rows = graft.SparkEntry.queries("q_cms_heavy_hitters")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted user ${r.getLong(0)}: " +
          s"est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("HLL estimate within 5 standard errors (1.04/sqrt(64)) of exact") {
    val rows = graft.SparkEntry.queries("q_hll_distinct_users")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val band = 5 * 1.04 / math.sqrt(64.0) // ~65% relative, generous
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(2))
      assert(math.abs(est - exact) <= band * exact,
        s"HLL for ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("quantile sketch: estimate brackets the ceil-rank order statistic " +
      "within the 2^-7 relative bound") {
    val rows = graft.SparkEntry.queries("q_quantile_sketch")(spark, sf)
      .collect()
    assert(rows.length == 3)
    // recompute the exact order statistic the sketch targets
    // (ceil-rank; the query's exact_cents column interpolates, so the
    // contract is checked against the true kth value)
    val vs = graft.queries.Tables.t(spark, sf, "lineitem")
      .select(graft.queries.Tables.cents(
        org.apache.spark.sql.functions.col("l_extendedprice")).as("v"))
      .orderBy("v").collect().map(_.getLong(0))
    rows.foreach { r =>
      val p = r.getLong(0)
      val n = r.getLong(1)
      assert(n == vs.length)
      val est = r.getLong(4)
      val kth = vs(((n * p + 99) / 100).toInt - 1)
      // the query's exact readout IS the ceil-rank order statistic
      assert(r.getLong(3) == kth,
        s"p$p: exact_cents ${r.getLong(3)} != independent kth $kth")
      // est is the lower bound of the bucket holding the kth value:
      // est <= kth < est * (1 + 2^-7) + 1
      assert(est <= kth, s"p$p: est $est above kth $kth")
      assert(kth < est + (est >> 7) + 1,
        s"p$p: bucket width bound violated — est $est, kth $kth")
      // sketch stays KB-scale
      assert(r.getLong(2) < 8192, s"bucket blowup: ${r.getLong(2)}")
    }
  }

  test("log-bucket function: monotone, bounded width, bounded count " +
      "across the full positive 64-bit domain") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7L)
    // cover every octave: mixed magnitudes from 1 to Long.MaxValue
    val vs = (Seq(1L, 2L, 255L, 256L, 257L, Long.MaxValue) ++
      (1 to 2000).map { _ =>
        val bits = 1 + rnd.nextInt(63)
        (rnd.nextLong().abs % (1L << (bits - 1)).max(1)) + (1L << (bits - 1))
      }).distinct.sorted
    import spark.implicits._
    // the SHIPPED definitions, not a private copy of the formula —
    // tuning QK/QM in Sketches must flow into this pin
    val rows = vs.toDF("v")
      .selectExpr("v", graft.queries.Sketches.qBucketSpark("v") + " AS b")
      .selectExpr("v", "b",
        graft.queries.Sketches.qLowerSpark("b") + " AS lo",
        s"CAST(b div ${graft.queries.Sketches.QM} AS INT) AS shift")
      .orderBy("v").collect()
    var prevB = Long.MinValue
    rows.foreach { r =>
      val (v, b, lo, shift) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      assert(b >= prevB, s"bucket id not monotone at v=$v")
      prevB = b
      // v lies in [lo, lo + 2^shift) and the width is <= 2^-7 of lo
      // (checked as v-lo to avoid Long overflow at the domain top)
      assert(lo <= v && (v - lo) < (1L << shift).max(1L),
        s"v=$v outside bucket [lo=$lo, +2^$shift)")
      assert(shift == 0 || (1L << shift) <= (lo >> graft.queries.Sketches.QK).max(1),
        s"width bound violated at v=$v: shift=$shift lo=$lo")
    }
    // total distinct buckets for the whole 63-octave domain stays KB-scale
    assert(rows.map(_.getLong(1)).distinct.length < 8192)
  }

  test("column profiler: per-column HLL estimates within the m=64 band") {
    val rows = graft.SparkEntry.queries("q_profile_columns")(spark, sf)
      .collect()
    assert(rows.length == 6)
    val band = 5 * 1.04 / math.sqrt(64.0)
    rows.foreach { r =>
      val (name, nRows, nNulls, exact, est) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nRows > 0 && nNulls >= 0 && exact >= 1 && est > 0)
      // the raw estimator (no linear-counting branch BY DESIGN — see
      // the HLL geometry doc) is only in-band once the register table
      // is reasonably occupied; tiny-cardinality columns overestimate
      // (that's what the exact column in the same row is for)
      if (exact >= 64)
        assert(math.abs(est - exact) <= band * exact,
          s"$name: est $est vs exact $exact")
    }
    // sanity: flag columns are tiny-cardinality, keys are large
    val byName = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byName("l_returnflag") <= 5 && byName("l_orderkey") > 1000)
  }

  test("Bloom filter: zero false negatives; union merge is lossless") {
    val rows = graft.SparkEntry.queries("q_bloom_membership")(spark, sf)
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    val members = rows.find(_._1).get
    val non = rows.find(!_._1).get
    // one-sided guarantee: every true member answers yes
    assert(members._2 == members._3,
      s"false negatives: ${members._2 - members._3} of ${members._2}")
    // false positives exist but stay a minority at this density
    assert(non._3 < non._2,
      s"non-member probes all answered yes (${non._3}/${non._2}) — filter saturated")
    val u = graft.SparkEntry.queries("q_bloom_union")(spark, sf).collect()(0)
    assert(u.getLong(1) == u.getLong(2),
      s"merged ${u.getLong(1)} != direct ${u.getLong(2)}")
    assert(u.getLong(0) == 2)
  }

  test("quantile sketch merge is lossless: merged == direct estimates") {
    val rows = graft.SparkEntry.queries("q_quantile_union")(spark, sf)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"p${r.getLong(0)}: merged ${r.getLong(2)} != direct ${r.getLong(3)}")
      assert(r.getLong(1) >= 2, "merge demo needs >= 2 sketches")
    }
  }

  test("column profiler: an all-null column still appears (NULL estimate)") {
    // an all-null column produces NO HLL register rows; only a LEFT
    // join keeps it in the profile (the DuckDB oracle mirrors this)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("profile-null-")
    try {
      (1 to 50).map(i => (s"R$i", Option.empty[String],
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          i.toLong, i.toLong % 7, i))
        .toDF("l_returnflag", "l_linestatus", "l_shipdate",
          "l_orderkey", "l_suppkey", "l_linenumber")
        .write.parquet(s"$dir/lineitem.parquet")
      val rows = graft.SparkEntry.queries("q_profile_columns")(
        spark, dir.toString).collect()
      assert(rows.length == 6, s"expected all 6 profiled columns, got " +
        rows.map(_.getString(0)).mkString(", "))
      val ls = rows.find(_.getString(0) == "l_linestatus").get
      assert(ls.getLong(2) == 50 && ls.getLong(3) == 0, // n_nulls, n_distinct
        s"all-null column counts wrong: $ls")
      assert(ls.isNullAt(4), s"all-null column estimate should be NULL: $ls")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
