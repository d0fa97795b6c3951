package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The `sort-engine` option (reference: `reader_converter.py:60-63`
  * maps both `SortMergeReaderWithMinHeap` and
  * `SortMergeReaderWithLoserTree`): both engines must merge
  * identically — same last-write-wins winners, same drop-delete, same
  * key order — differing only in comparison count.
  */
class SortEngineSpec extends AnyFunSuite {

  // row layout: [seq: Long, kind: Int-as-Long slot, key: Long]
  private def row(seq: Long, kind: Int, key: Long): InternalRow = {
    val r = new GenericInternalRow(3)
    r.update(0, seq); r.update(1, kind); r.update(2, key)
    r
  }

  private def merge(engine: String,
      files: Seq[Seq[InternalRow]]): Seq[(Long, Long)] =
    new graft.format.SortMergeReader(
      files.zipWithIndex.map { case (rs, i) =>
        rs.iterator.map(r => (s"f$i", r))
      },
      keyIdx = Seq(2), keyTypes = Seq(LongType), seqIdx = 0, kindIdx = 1,
      sortEngine = engine)
      .map { case (_, r) => (r.getLong(2), r.getLong(0)) }.toList

  test("loser tree merges exactly like the min-heap (planted case)") {
    // 3 sorted runs; key 2 updated twice, key 3 deleted by highest seq,
    // key 5 delete-then-reinsert
    val f0 = Seq(row(1, 0, 1), row(2, 0, 2), row(3, 0, 3), row(4, 0, 5))
    val f1 = Seq(row(10, 0, 2), row(11, 3, 3), row(12, 3, 5))
    val f2 = Seq(row(20, 0, 2), row(21, 0, 5), row(22, 0, 9))
    val expected = Seq((1L, 1L), (2L, 20L), (5L, 21L), (9L, 22L))
    assert(merge("min-heap", Seq(f0, f1, f2)) == expected)
    assert(merge("loser-tree", Seq(f0, f1, f2)) == expected)
  }

  test("engines agree on randomized runs (including empty/1-file/k-file)") {
    val rnd = new scala.util.Random(20260812L)
    var seq = 0L
    (1 to 60).foreach { trial =>
      val k = rnd.nextInt(8) // 0..7 files
      val files = (0 until k).map { _ =>
        val n = rnd.nextInt(30)
        (0 until n).map { _ =>
          seq += 1
          (rnd.nextInt(12).toLong, seq, if (rnd.nextInt(5) == 0) 3 else 0)
        }.sortBy(t => (t._1, t._2)) // writer invariant: sorted by (key, seq)
          .map { case (key, s, kind) => row(s, kind, key) }
      }
      val a = merge("min-heap", files)
      val b = merge("loser-tree", files)
      assert(a == b, s"trial $trial (k=$k): $a vs $b")
    }
  }

  test("unknown engine rejected") {
    val e = intercept[IllegalArgumentException](merge("bogo-sort", Seq.empty))
    assert(e.getMessage.contains("sort-engine"))
  }
}
