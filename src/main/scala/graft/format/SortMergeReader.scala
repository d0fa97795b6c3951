package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, StructType}
import graft.connector.Values
import graft.core.RowKind
import scala.collection.mutable

/** K-way sort-merge of per-file KV iterators — the faithful
  * counterpart of the reference's `SortMergeReader` with
  * `DeduplicateMergeFunction` (`pypaimon/pynative/reader/
  * sort_merge_reader.py:141-271`): a min-heap ordered by (user key,
  * sequence number) groups equal-key runs; the highest-sequence entry
  * of each run wins; non-add kinds drop (`drop_delete_reader.py`).
  *
  * Data files within a bucket are written sorted by (trimmed pk,
  * seq) — see GraftDataWriter/Compactor — so memory here is O(open
  * files), not O(bucket rows), which is what makes a 100 TB bucket
  * mergeable. NULL keys sort first, matching both the writer's sort
  * and the reference comparator (`sort_merge_reader.py:30-43`).
  */
final class SortMergeReader(
    files: Seq[Iterator[(String, InternalRow)]],
    keyIdx: Seq[Int],
    keyTypes: Seq[DataType],
    seqIdx: Int,
    kindIdx: Int) extends Iterator[(String, InternalRow)] {

  private def keyOf(r: InternalRow): Array[Any] = {
    val out = new Array[Any](keyIdx.length)
    var i = 0
    while (i < keyIdx.length) {
      out(i) = if (r.isNullAt(keyIdx(i))) null else r.get(keyIdx(i), keyTypes(i))
      i += 1
    }
    out
  }

  private def compareKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val c = Values.compare(keyTypes(i), a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  private final case class Entry(key: Array[Any], seq: Long,
      row: InternalRow, file: String, source: Iterator[(String, InternalRow)])

  private implicit val ord: Ordering[Entry] = new Ordering[Entry] {
    // min-heap on (key asc, seq asc): PriorityQueue is a max-heap, so reverse
    override def compare(x: Entry, y: Entry): Int = {
      val c = compareKeys(x.key, y.key)
      val r = if (c != 0) c else java.lang.Long.compare(x.seq, y.seq)
      -r
    }
  }

  private val heap = mutable.PriorityQueue.empty[Entry]
  files.foreach(push)

  private def push(it: Iterator[(String, InternalRow)]): Unit =
    if (it.hasNext) {
      val (f, r) = it.next()
      heap.enqueue(Entry(keyOf(r), r.getLong(seqIdx), r, f, it))
    }

  private var nextOut: (String, InternalRow) = _
  advance()

  private def advance(): Unit = {
    nextOut = null
    while (nextOut == null && heap.nonEmpty) {
      // pop the full equal-key run; the LAST popped (highest seq) wins
      val first = heap.dequeue()
      push(first.source)
      var winner = first
      while (heap.nonEmpty && compareKeys(heap.head.key, first.key) == 0) {
        val e = heap.dequeue()
        push(e.source)
        winner = e // heap yields ascending seq within the key run
      }
      if (RowKind.isAdd(winner.row.getInt(kindIdx).toByte))
        nextOut = (winner.file, winner.row)
    }
  }

  override def hasNext: Boolean = nextOut != null

  override def next(): (String, InternalRow) = {
    val r = nextOut
    advance()
    r
  }
}
