package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.core.RowKind
import graft.connector.Values
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the hard parts of SURVEY §7.4: merge-on-read ≡
  * arg-max-by-sequence + is_add filter, bucket routing determinism,
  * and the NULLS FIRST key comparator.
  */
class PropertySpec extends AnyFunSuite {

  /** Drive a ScalaCheck generator through N sampled cases (the
    * scalatest-scalacheck bridge isn't on the offline classpath).
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  // --- reference model of DeduplicateMergeFunction + DropDeleteReader ---
  private def modelMerge(rows: Seq[(Long, Long, Byte, String)]): Map[Long, String] =
    rows.groupBy(_._1).flatMap { case (k, vs) =>
      val winner = vs.maxBy(_._2) // last write (highest seq) wins
      if (RowKind.isAdd(winner._3)) Some(k -> winner._4) else None
    }

  // --- the engine's formulation: fold in arbitrary order, keep max ---
  private def engineMerge(rows: Seq[(Long, Long, Byte, String)]): Map[Long, String] = {
    val best = scala.collection.mutable.HashMap.empty[Long, (Long, Byte, String)]
    rows.foreach { case (k, seq, kind, v) =>
      best.get(k) match {
        case Some((s, _, _)) if s >= seq => ()
        case _ => best.update(k, (seq, kind, v))
      }
    }
    best.collect { case (k, (_, kind, v)) if RowKind.isAdd(kind) => k -> v }.toMap
  }

  private val rowGen = for {
    k <- Gen.choose(0L, 20L)
    kind <- Gen.oneOf(RowKind.Insert, RowKind.UpdateBefore,
      RowKind.UpdateAfter, RowKind.Delete)
    v <- Gen.alphaStr.map(_.take(8))
  } yield (k, kind, v)

  test("merge-on-read ≡ max-by-sequence + drop-delete, any arrival order") {
    forAllSampled(Gen.listOf(rowGen)) { raw =>
      // assign unique increasing sequence numbers (commit order)
      val rows = raw.zipWithIndex.map { case ((k, kind, v), i) =>
        (k, i.toLong, kind, v)
      }
      val shuffled = scala.util.Random.shuffle(rows)
      assert(engineMerge(shuffled) == modelMerge(rows))
    }
  }

  test("SortMergeReader over random sorted runs ≡ model merge") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    forAllSampled(Gen.zip(Gen.listOf(rowGen), Gen.choose(1, 5)), n = 100) {
      case (raw, nFiles) =>
        val rows = raw.zipWithIndex.map { case ((k, kind, v), i) =>
          (k, i.toLong, kind, v)
        }
        // deal rows round-robin into files, each sorted by (key, seq)
        val files = rows.zipWithIndex.groupMap(_._2 % nFiles)(_._1)
          .values.toSeq
          .map(_.sortBy(r => (r._1, r._2)))
        // readSchema layout: [_SEQUENCE_NUMBER, _VALUE_KIND, k, v]
        val sources = files.map(_.iterator.map { case (k, seq, kind, v) =>
          val r = new GenericInternalRow(4)
          r.update(0, seq); r.update(1, kind.toInt)
          r.update(2, k); r.update(3, UTF8String.fromString(v))
          ("f", r: org.apache.spark.sql.catalyst.InternalRow)
        })
        val merged = new graft.format.SortMergeReader(
          sources, Seq(2), Seq(LongType), 0, 1).toSeq
          .map { case (_, r) => r.getLong(2) -> r.getUTF8String(3).toString }
          .toMap
        assert(merged == modelMerge(rows))
    }
  }

  test("merge engines over random sorted runs ≡ per-engine fold models") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    import graft.core.RowKind
    // rows: (key, kind, a: Option[Long], b: Option[Long]); schema
    // [_SEQUENCE_NUMBER, _VALUE_KIND, k, a, b]
    val rowGen2 = for {
      k <- Gen.choose(0L, 6L)
      kind <- Gen.frequency(5 -> Gen.const(RowKind.Insert),
        1 -> Gen.const(RowKind.Delete), 1 -> Gen.const(RowKind.UpdateAfter),
        1 -> Gen.const(RowKind.UpdateBefore))
      a <- Gen.option(Gen.choose(-50L, 50L))
      b <- Gen.option(Gen.choose(-50L, 50L))
    } yield (k, kind, a, b)

    val schema = StructType(Seq(
      StructField("_SEQUENCE_NUMBER", LongType), StructField("_VALUE_KIND", IntegerType),
      StructField("k", LongType), StructField("a", LongType), StructField("b", LongType)))

    def runEngine(opts: Map[String, String],
        rows: Seq[(Long, Long, Byte, Option[Long], Option[Long])],
        nFiles: Int): Map[Long, (Option[Long], Option[Long])] = {
      val files = rows.zipWithIndex.groupMap(_._2 % nFiles)(_._1)
        .values.toSeq.map(_.sortBy(r => (r._1, r._2)))
      val sources = files.map(_.iterator.map { case (k, seq, kind, a, b) =>
        val r = new GenericInternalRow(5)
        r.update(0, seq); r.update(1, kind.toInt); r.update(2, k)
        r.update(3, a.map(Long.box).orNull); r.update(4, b.map(Long.box).orNull)
        ("f", r: org.apache.spark.sql.catalyst.InternalRow)
      })
      val fn = graft.format.MergeFunction.create(
        graft.format.MergeFunction.specOf(opts), schema, Seq(2), 0, 1)
      new graft.format.SortMergeReader(sources, Seq(2), Seq(LongType), 0, 1,
        mergeFn = fn).toSeq.map { case (_, r) =>
        r.getLong(2) -> ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      }.toMap
    }

    forAllSampled(Gen.zip(Gen.listOf(rowGen2), Gen.choose(1, 5)), n = 60) {
      case (raw, nFiles) =>
        val rows = raw.zipWithIndex.map { case ((k, kind, a, b), i) =>
          (k, i.toLong, kind, a, b)
        }
        val byKey = rows.groupBy(_._1)

        // first-row: first add per key
        val firstModel = byKey.flatMap { case (k, rs) =>
          rs.find(r => RowKind.isAdd(r._3)).map(r => k -> ((r._4, r._5)))
        }
        assert(runEngine(Map("merge-engine" -> "first-row"), rows, nFiles)
          == firstModel)

        // partial-update: fold adds in seq order, last non-null per
        // field; -U ignored; -D clears
        val puModel = byKey.flatMap { case (k, rs) =>
          val st = rs.foldLeft(
              Option.empty[(Option[Long], Option[Long])]) { (acc, r) =>
            r._3 match {
              case RowKind.UpdateBefore => acc
              case RowKind.Delete => None
              case _ =>
                val (a0, b0) = acc.getOrElse((None, None))
                Some((r._4.orElse(a0), r._5.orElse(b0)))
            }
          }
          st.map(k -> _)
        }
        assert(runEngine(Map("merge-engine" -> "partial-update"),
          rows, nFiles) == puModel)

        // aggregation: a=sum, b=max (defaults elsewhere); -D clears
        val agModel = byKey.flatMap { case (k, rs) =>
          val st = rs.foldLeft(
              Option.empty[(Option[Long], Option[Long])]) { (acc, r) =>
            r._3 match {
              case RowKind.UpdateBefore => acc
              case RowKind.Delete => None
              case _ =>
                val (a0, b0) = acc.getOrElse((None, None))
                Some((
                  (a0, r._4) match {
                    case (Some(x), Some(y)) => Some(x + y)
                    case (x, y) => y.orElse(x)
                  },
                  (b0, r._5) match {
                    case (Some(x), Some(y)) => Some(math.max(x, y))
                    case (x, y) => y.orElse(x)
                  }))
            }
          }
          st.map(k -> _)
        }
        assert(runEngine(Map("merge-engine" -> "aggregation",
          "fields.a.aggregate-function" -> "sum",
          "fields.b.aggregate-function" -> "max"), rows, nFiles) == agModel)

        // aggregation: a=product (same null-skip/-D-clear frame as sum)
        val prModel = byKey.flatMap { case (k, rs) =>
          val st = rs.foldLeft(
              Option.empty[(Option[Long], Option[Long])]) { (acc, r) =>
            r._3 match {
              case RowKind.UpdateBefore => acc
              case RowKind.Delete => None
              case _ =>
                val (a0, b0) = acc.getOrElse((None, None))
                Some((
                  (a0, r._4) match {
                    case (Some(x), Some(y)) => Some(x * y)
                    case (x, y) => y.orElse(x)
                  },
                  r._5.orElse(b0)))
            }
          }
          st.map(k -> _)
        }
        assert(runEngine(Map("merge-engine" -> "aggregation",
          "fields.a.aggregate-function" -> "product"), rows, nFiles)
          == prModel)

        // sequence.field on a: argmax by (a NULLS FIRST, then seq);
        // winner dropped if delete
        val sfModel = byKey.flatMap { case (k, rs) =>
          val winner = rs.maxBy(r => (r._4.isDefined, r._4.getOrElse(0L), r._2))
          if (RowKind.isAdd(winner._3)) Some(k -> ((winner._4, winner._5)))
          else None
        }
        assert(runEngine(Map("sequence.field" -> "a"), rows, nFiles)
          == sfModel)
    }
  }

  test("bucket routing: deterministic, in range, spread across buckets") {
    forAllSampled(Gen.zip(
      Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.choose(1, 64))) { case (keys, buckets) =>
      val assigned = keys.map(k => Values.bucketOf(Seq(k.toString), buckets))
      assert(assigned.forall(b => b >= 0 && b < buckets))
      // stability: same key → same bucket, every time
      assert(keys.map(k => Values.bucketOf(Seq(k.toString), buckets)) == assigned)
    }
  }

  test("key comparator: NULLS FIRST total order per type") {
    forAllSampled(Gen.listOf(Gen.option(Gen.choose(-1000L, 1000L)))) { xs =>
      val vals: Seq[Any] = xs.map(_.map(Long.box).orNull)
      val sorted = vals.sortWith((a, b) => Values.compare(LongType, a, b) < 0)
      // nulls lead
      val (nulls, rest) = sorted.span(_ == null)
      assert(nulls.forall(_ == null) && rest.forall(_ != null))
      assert(rest.map(_.asInstanceOf[Long]) == rest.map(_.asInstanceOf[Long]).sorted)
    }
  }

  test("string comparator agrees with UTF8String ordering") {
    forAllSampled(Gen.listOf(Gen.alphaNumStr.map(_.take(12)))) { xs =>
      val utf: Seq[Any] = xs.map(UTF8String.fromString)
      val viaValues = utf.sortWith((a, b) => Values.compare(StringType, a, b) < 0)
        .map(_.toString)
      assert(viaValues == xs.sorted)
    }
  }

  test("binary comparator: unsigned lexicographic, hex encode round-trips") {
    forAllSampled(Gen.listOf(Gen.listOf(
        Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))) { xs =>
      // order agrees with the canonical unsigned-lexicographic model
      val viaValues = xs.sortWith((a, b) => Values.compare(BinaryType, a, b) < 0)
      val model = xs.sortBy(_.map(b => (b & 0xff).toChar).mkString)
      assert(viaValues.map(_.toSeq) == model.map(_.toSeq))
      xs.foreach { a =>
        val enc = Values.encode(BinaryType, a)
        // hex encode/parse round-trip, and encoded order == value order
        assert(Values.parse(BinaryType, enc)
          .asInstanceOf[Array[Byte]].toSeq == a.toSeq)
      }
      // lexicographic order of the hex strings matches compare()
      val encSorted = xs.map(a => Values.encode(BinaryType, a)).sorted
      assert(encSorted == viaValues.map(a => Values.encode(BinaryType, a)))
    }
  }

  test("range pruning is sound: never excludes a file containing a match") {
    import org.apache.spark.sql.sources._
    val dt: String => Option[org.apache.spark.sql.types.DataType] =
      c => if (c == "k") Some(LongType) else None
    val filterGen = for {
      v <- Gen.choose(-100L, 100L)
      f <- Gen.oneOf[Filter](
        EqualTo("k", v), LessThan("k", v), LessThanOrEqual("k", v),
        GreaterThan("k", v), GreaterThanOrEqual("k", v),
        In("k", Array[Any](v, v + 3, v - 7)))
    } yield f
    val caseGen = for {
      rows <- Gen.nonEmptyListOf(Gen.choose(-100L, 100L))
      f <- filterGen
    } yield (rows, f)
    forAllSampled(caseGen, n = 400) { case (rows, f) =>
      val lo = rows.min
      val hi = rows.max
      val bounds: String => Option[(String, String)] =
        c => if (c == "k") Some((lo.toString, hi.toString)) else None
      // model: does any row in the file actually satisfy the filter?
      def sat(v: Long): Boolean = f match {
        case EqualTo(_, x) => v == x.asInstanceOf[Long]
        case LessThan(_, x) => v < x.asInstanceOf[Long]
        case LessThanOrEqual(_, x) => v <= x.asInstanceOf[Long]
        case GreaterThan(_, x) => v > x.asInstanceOf[Long]
        case GreaterThanOrEqual(_, x) => v >= x.asInstanceOf[Long]
        case In(_, xs) => xs.exists(_.asInstanceOf[Long] == v)
        case _ => true
      }
      val anyMatch = rows.exists(sat)
      val verdict = graft.connector.Values.evalRange(f, dt, bounds)
      // pruning (Some(false)) is only allowed when NO row matches
      if (anyMatch) assert(verdict != Some(false),
        s"unsound prune: rows=$rows filter=$f bounds=($lo,$hi)")
    }
  }

  test("FileIOInputStream equals a byte-array reference under random ops") {
    // the ranged-read stream has subtle paths (read-ahead boundaries,
    // adaptive growth, positioned reads, short reads at EOF): drive it
    // with random op sequences against the in-memory model
    val fio = graft.format.FileIO.resolve("memory:propspec-stream")
    val opGen = for {
      kind <- Gen.choose(0, 3)
      a <- Gen.choose(0, 6000)
      b <- Gen.choose(1, 4096)
    } yield (kind, a, b)
    val caseGen = Gen.zip(Gen.choose(0, 5000), Gen.listOfN(40, opGen))
    forAllSampled(caseGen, n = 60) { case (size, ops) =>
      val body = Array.tabulate[Byte](size)(i => ((i * 31 + 7) % 251).toByte)
      val p = java.nio.file.Paths.get(s"/prop/stream-$size")
      fio.writeAtomic(p, body)
      val in = new graft.format.FileIOInputStream(fio, p, size.toLong)
      ops.foreach {
        case (0, at, _) => // seek (clamped into range)
          in.seek(math.min(at.toLong, size.toLong))
        case (1, _, n) => // sequential read
          val want = n
          val buf = new Array[Byte](want)
          val pos = in.getPos
          val got = in.read(buf, 0, want)
          if (pos >= size) assert(got == -1)
          else {
            val expect = math.min(want.toLong, size - pos).toInt
            assert(got > 0 && got <= expect)
            assert(buf.take(got).toSeq ==
              body.slice(pos.toInt, pos.toInt + got).toSeq)
          }
        case (2, at, n) => // positioned read must not move pos
          val pos = in.getPos
          val buf = new Array[Byte](n)
          val got = in.read(at.toLong, buf, 0, n)
          if (at >= size) assert(got == -1)
          else {
            assert(got > 0)
            assert(buf.take(got).toSeq == body.slice(at, at + got).toSeq)
          }
          assert(in.getPos == pos)
        case (_, _, _) => // single byte
          val pos = in.getPos
          val got = in.read()
          if (pos >= size) assert(got == -1)
          else assert(got == (body(pos.toInt) & 0xff))
      }
    }
  }

  test("canonical encode/parse round-trips for every supported type") {
    forAllSampled(Gen.choose(Int.MinValue, Int.MaxValue)) { i =>
      assert(Values.parse(IntegerType, Values.encode(IntegerType, i)) == i)
    }
    forAllSampled(Gen.choose(Long.MinValue, Long.MaxValue)) { l =>
      assert(Values.parse(LongType, Values.encode(LongType, l)) == l)
      assert(Values.parse(TimestampType, Values.encode(TimestampType, l)) == l)
    }
    forAllSampled(Gen.double) { d =>
      if (!d.isNaN)
        assert(Values.parse(DoubleType, Values.encode(DoubleType, d)) == d)
    }
    Seq(true, false).foreach { b =>
      assert(Values.parse(BooleanType, Values.encode(BooleanType, b)) == b)
    }
  }

  test("toInternal: pre-epoch fractional timestamps floor-divide") {
    // getTime truncates toward zero while getNanos is non-negative: a
    // plain / shifted 1969-12-31T23:59:59.5Z (-500ms) to +500000us
    val t = java.sql.Timestamp.from(
      java.time.Instant.parse("1969-12-31T23:59:59.500Z"))
    assert(Values.toInternal(TimestampType, t) == -500000L)
    // post-epoch unchanged; Instant path agrees
    val p = java.sql.Timestamp.from(
      java.time.Instant.parse("1970-01-01T00:00:00.500Z"))
    assert(Values.toInternal(TimestampType, p) == 500000L)
    assert(Values.toInternal(TimestampType,
      java.time.Instant.parse("1969-12-31T23:59:59.500Z")) == -500000L)
  }

  test("evalExact: In with a NULL in the value list is 3VL-correct") {
    import org.apache.spark.sql.sources._
    val dt: String => Option[DataType] = _ => Some(LongType)
    def value(v: Any): String => Option[Any] = _ => Some(v)
    // match present → TRUE even with a null in the list
    assert(Values.evalExact(In("p", Array(1L, null)), dt, value(1L))
      .contains(true))
    // no match + null in list → UNKNOWN (so Not stays UNKNOWN: a
    // Some(false) here would flip to TRUE and let
    // `p NOT IN (1, NULL)` prune — or metadata-DELETE — partitions
    // SQL says must not qualify)
    assert(Values.evalExact(In("p", Array(1L, null)), dt, value(2L)).isEmpty)
    assert(Values.evalExact(Not(In("p", Array(1L, null))), dt, value(2L))
      .isEmpty)
    // no null in list keeps the decisive answer
    assert(Values.evalExact(In("p", Array(1L, 3L)), dt, value(2L))
      .contains(false))
  }

  test("loadById: corrupt schema throws its own type, vanished reads None") {
    import graft.core.TableSchema
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-corrupt")
    java.nio.file.Files.createDirectories(dir.resolve("schema"))
    // a permanently truncated file (crashed no-hard-link fallback
    // write) must surface as CorruptSchemaException — NOT
    // IllegalStateException, which fence/maintenance catch sites
    // absorb as "merge rules changed / commit conflict"
    java.nio.file.Files.writeString(
      dir.resolve("schema").resolve("schema-0"), "{\"id\": 0, \"fiel")
    val e = intercept[TableSchema.CorruptSchemaException] {
      TableSchema.loadById(dir, 0L)
    }
    assert(e.getMessage.contains("corrupt"))
    // a missing id stays a plain None, as ever
    assert(TableSchema.loadById(dir, 1L).isEmpty)
  }

  test("changedBetween: semantic comparison, not raw option strings") {
    import graft.core.MergeRuleProps.changedBetween
    val agg = "fields.v.aggregate-function"
    val grp = "fields.g.sequence-group"
    // absent ≡ the engine default: a config push that re-states
    // last_non_null_value on an unconfigured column is a no-op and
    // must NOT fence in-flight writers (the catalog persists the
    // option spelling even when its guard deems the SET a noop)
    assert(changedBetween(Map.empty,
      Map(agg -> "last_non_null_value")).isEmpty)
    assert(changedBetween(Map(agg -> "last_non_null_value"),
      Map.empty).isEmpty)
    // values compare trimmed (specOf trims at parse)
    assert(changedBetween(Map(agg -> "sum"), Map(agg -> " sum ")).isEmpty)
    // real fold changes still trip
    assert(changedBetween(Map(agg -> "sum"), Map(agg -> "max")) ==
      Set(agg))
    assert(changedBetween(Map.empty, Map(agg -> "sum")) == Set(agg))
    assert(changedBetween(Map(agg -> "sum"), Map.empty) == Set(agg))
    // sequence-group member lists are SETS: order/spacing respellings
    // are no-ops, membership changes are not, and dissolving the
    // group (absent) differs from any present value
    assert(changedBetween(Map(grp -> "a,b"), Map(grp -> "b, a")).isEmpty)
    assert(changedBetween(Map(grp -> "a,b"), Map(grp -> "a,b,c")) ==
      Set(grp))
    assert(changedBetween(Map(grp -> "a,b"), Map.empty) == Set(grp))
    // non-merge-rule options never count
    assert(changedBetween(Map("bucket" -> "1"), Map("bucket" -> "4"))
      .isEmpty)
  }

  test("loadById: decodable-shape failures fail fast, no 500ms retry") {
    import graft.core.TableSchema
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-shape")
    java.nio.file.Files.createDirectories(dir.resolve("schema"))
    // valid JSON with an incompatible shape: deterministic, so it must
    // NOT burn the 20x25ms torn-read window before failing
    java.nio.file.Files.writeString(
      dir.resolve("schema").resolve("schema-0"), "{\"id\": \"zero\"}")
    val t0 = System.nanoTime()
    val e = intercept[TableSchema.CorruptSchemaException] {
      TableSchema.loadById(dir, 0L)
    }
    val ms = (System.nanoTime() - t0) / 1000000
    assert(e.getMessage.contains("version-incompatible") ||
      e.getMessage.contains("schema decoding"), e.getMessage)
    assert(ms < 400, s"deterministic failure took ${ms}ms — retried?")
  }

  test("loadById: interrupt during torn-read retry preserves the flag") {
    import graft.core.TableSchema
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-intr")
    java.nio.file.Files.createDirectories(dir.resolve("schema"))
    java.nio.file.Files.writeString(
      dir.resolve("schema").resolve("schema-0"), "{\"id\": 0, \"fiel")
    Thread.currentThread().interrupt()
    try {
      val e = intercept[TableSchema.CorruptSchemaException] {
        TableSchema.loadById(dir, 0L)
      }
      assert(e.getMessage.contains("interrupted"), e.getMessage)
      // cancellation must survive the read path, not be swallowed
      assert(Thread.currentThread().isInterrupted)
    } finally {
      // clear so later tests on this thread aren't poisoned
      Thread.interrupted()
    }
  }

  test("sequence slot: exactly 2^32 rows fit, the next row fails") {
    import graft.connector.GraftDataWriter
    import org.apache.spark.sql.catalyst.InternalRow
    val dir = java.nio.file.Files.createTempDirectory("graft-seqslot")
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val w = new GraftDataWriter(dir, schema, Nil, Nil, isPk = false,
      numBuckets = 1, seqStart = 0L, writeSchema = schema,
      hasRowKindCol = false)
    // forge the counter to the slot's last value — the 2^32-th row
    // uses seqStart + 2^32 - 1 (still inside the slot) and must pass;
    // only the 2^32+1-th row may fail
    val f = classOf[GraftDataWriter].getDeclaredFields
      .find(_.getName.endsWith("seq")).get
    f.setAccessible(true)
    f.setLong(w, (1L << 32) - 1)
    w.write(InternalRow(1L))
    val e = intercept[IllegalStateException] { w.write(InternalRow(2L)) }
    assert(e.getMessage.contains("slot exhausted"))
    w.abort()
  }
}
