package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType
import graft.connector.Values
import graft.core.RowKind
import scala.collection.mutable

/** K-way sort-merge of per-file KV iterators — the faithful
  * counterpart of the reference's `SortMergeReader` with
  * `DeduplicateMergeFunction` (`pypaimon/pynative/reader/
  * sort_merge_reader.py:141-271`): entries ordered by (user key,
  * sequence number) group into equal-key runs; the highest-sequence
  * entry of each run wins; non-add kinds drop (`drop_delete_reader.py`).
  *
  * Two merge engines, matching the reference's `sort-engine` table
  * option (`reader_converter.py:60-63` maps BOTH
  * `SortMergeReaderWithMinHeap` and `SortMergeReaderWithLoserTree`):
  *
  *  - `min-heap` (default): binary heap; ~2 comparisons per level on
  *    sift (two children).
  *  - `loser-tree`: tournament tree; exactly one comparison per level
  *    on replay — the classic k-way-merge win for larger k (many
  *    sorted runs per bucket before compaction catches up).
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
    kindIdx: Int,
    sortEngine: String = "min-heap",
    // non-null routes each equal-key run through a pluggable
    // MergeFunction (first-row / partial-update / aggregation /
    // ignore-delete); null keeps the allocation-free LWW loop below —
    // the default deduplicate engine pays nothing for the seam
    mergeFn: MergeFunction = null) extends Iterator[(String, InternalRow)] {

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

  /** (key asc, seq asc) — strict "a merges before b". */
  private def before(a: Entry, b: Entry): Boolean = {
    val c = compareKeys(a.key, b.key)
    if (c != 0) c < 0 else a.seq < b.seq
  }

  private def entryOf(it: Iterator[(String, InternalRow)]): Entry =
    if (!it.hasNext) null
    else {
      val (f, r) = it.next()
      Entry(keyOf(r), r.getLong(seqIdx), r, f, it)
    }

  /** Both engines expose the same two moves: peek the winner, pop it
    * and refill from its source.
    */
  private sealed trait MergeQueue {
    def peek: Entry // null when drained
    def pop(): Entry
  }

  private final class MinHeap extends MergeQueue {
    private implicit val ord: Ordering[Entry] = new Ordering[Entry] {
      // PriorityQueue is a max-heap, so reverse
      override def compare(x: Entry, y: Entry): Int =
        if (before(x, y)) 1 else if (before(y, x)) -1 else 0
    }
    private val heap = mutable.PriorityQueue.empty[Entry]
    files.foreach { it =>
      val e = entryOf(it)
      if (e != null) heap.enqueue(e)
    }
    override def peek: Entry = if (heap.isEmpty) null else heap.head
    override def pop(): Entry = {
      val e = heap.dequeue()
      val next = entryOf(e.source)
      if (next != null) heap.enqueue(next)
      e
    }
  }

  /** Tournament loser tree over k leaves: `tree(0)` holds the overall
    * winner's leaf index, internal nodes hold the loser of the match
    * played there. A pop replays ONE root-to-leaf path (one comparison
    * per level). Exhausted leaves (`heads(i) == null`) lose every
    * match, so they sink once and never replay.
    */
  private final class LoserTree extends MergeQueue {
    private val k = math.max(files.length, 1)
    private val heads = new Array[Entry](k)
    private val tree = new Array[Int](k) // tree(0)=winner; 1..k-1 losers
    files.indices.foreach(i => heads(i) = entryOf(files(i)))

    /** true iff leaf a beats leaf b (drained leaves always lose). */
    private def wins(a: Int, b: Int): Boolean =
      if (a == -1 || heads(a) == null) false
      else if (b == -1 || heads(b) == null) true
      else before(heads(a), heads(b))

    // build: park candidates at empty (-1) nodes, play filled ones
    java.util.Arrays.fill(tree, -1)
    files.indices.foreach { leaf =>
      var cand = leaf
      var node = (leaf + k) >> 1
      while (node >= 1 && cand != -1) {
        if (tree(node) == -1) { tree(node) = cand; cand = -1 }
        else if (wins(tree(node), cand)) {
          val t = cand; cand = tree(node); tree(node) = t
        }
        node >>= 1
      }
      if (cand != -1) tree(0) = cand
    }

    private def replay(leaf: Int): Unit = {
      var cand = leaf
      var node = (leaf + k) >> 1
      while (node >= 1) {
        if (wins(tree(node), cand)) {
          val t = cand; cand = tree(node); tree(node) = t
        }
        node >>= 1
      }
      tree(0) = cand
    }

    override def peek: Entry =
      if (files.isEmpty) null else heads(tree(0))
    override def pop(): Entry = {
      val leaf = tree(0)
      val e = heads(leaf)
      heads(leaf) = entryOf(e.source)
      replay(leaf)
      e
    }
  }

  private val queue: MergeQueue = sortEngine match {
    case "min-heap" => new MinHeap
    case "loser-tree" => new LoserTree
    case other => throw new IllegalArgumentException(
      s"Unsupported sort-engine: $other (expected min-heap or loser-tree)")
  }

  private var nextOut: (String, InternalRow) = _
  advance()

  private def advance(): Unit = {
    nextOut = null
    while (nextOut == null && queue.peek != null) {
      if (mergeFn == null) {
        // pop the full equal-key run; the LAST popped (highest seq) wins
        var winner = queue.pop()
        val runKey = winner.key
        while (queue.peek != null && compareKeys(queue.peek.key, runKey) == 0)
          winner = queue.pop() // queue yields ascending seq within the run
        if (RowKind.isAdd(winner.row.getInt(kindIdx).toByte))
          nextOut = (winner.file, winner.row)
      } else {
        mergeFn.reset()
        var e = queue.pop()
        val runKey = e.key
        mergeFn.add(e.file, e.row, e.seq, e.row.getInt(kindIdx).toByte)
        while (queue.peek != null && compareKeys(queue.peek.key, runKey) == 0) {
          e = queue.pop() // ascending seq within the run
          mergeFn.add(e.file, e.row, e.seq, e.row.getInt(kindIdx).toByte)
        }
        nextOut = mergeFn.result()
      }
    }
  }

  override def hasNext: Boolean = nextOut != null

  override def next(): (String, InternalRow) = {
    val r = nextOut
    advance()
    r
  }
}
