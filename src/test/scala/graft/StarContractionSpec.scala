package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property test for the large-star/small-star connected-components
  * core ([[graft.queries.Pipeline.starContractionCC]]): labels must
  * equal a sequential union-find's component minima on random graphs,
  * and the round count must stay logarithmic — the whole point of star
  * contraction over min-label propagation, whose round count is the
  * component DIAMETER (unbounded on an adversarial duplicate chain).
  */
class StarContractionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  /** Sequential union-find oracle: id -> component minimum. */
  private def modelLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    val (labels, rounds) = graft.queries.Pipeline.starContractionCC(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (got, rounds)
  }

  test("≡ union-find component minima on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 12) {
      // mixed shapes: sparse random, clustered, with shuffled ids so
      // the minimum is not positionally special
      val n = 20 + rnd.nextInt(60)
      val ids = rnd.shuffle((0L until 1000L).toList).take(n).toArray
      val nEdges = 1 + rnd.nextInt(2 * n)
      val edges = (0 until nEdges).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val (got, rounds) = run(edges)
        assert(got == modelLabels(edges), s"trial $trial, edges $edges")
        assert(rounds <= 12, s"trial $trial took $rounds rounds")
      }
    }
  }

  test("1000-node path converges in O(log n) rounds, not O(n)") {
    val edges = (0L until 999L).map(i => (i, i + 1))
    val (got, rounds) = run(edges)
    assert(got.size == 1000)
    assert(got.values.forall(_ == 0L),
      s"all labels must be the component min, got ${got.values.toSet}")
    assert(rounds <= 12,
      s"path of 1000 must converge logarithmically, took $rounds rounds")
  }

  test("pair-shaped clusters (the common near-dup case) converge fast") {
    // many disjoint pairs + one triangle: the shallow shape real
    // near-dup corpora produce
    val edges = (0L until 50L).map(i => (2 * i, 2 * i + 1)) ++
      Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val (got, rounds) = run(edges)
    assert(got == modelLabels(edges))
    assert(rounds <= 3, s"shallow clusters took $rounds rounds")
  }

  test("driverUnionFind ≡ starContractionCC ≡ model on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val n = 10 + rnd.nextInt(40)
      val ids = rnd.shuffle((0L until 500L).toList).take(n).toArray
      val edges = (0 until 1 + rnd.nextInt(2 * n)).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val pairs = edges
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct.toDF("a", "b")
        val got = graft.queries.Pipeline.driverUnionFind(spark, pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == modelLabels(edges), s"trial $trial, edges $edges")
      }
    }
  }

  test("empty pair set yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val (labels, _) = graft.queries.Pipeline.starContractionCC(empty)
    assert(labels.count() == 0L)
    assert(labels.columns.toSeq == Seq("id", "lbl"))
  }
}
