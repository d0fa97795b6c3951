package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.api._
import graft.core.RowKind
import java.nio.file.Files

/** Facade API parity with the reference's builder surface
  * (`pypaimon/py4j/tests/`): catalog/table lifecycle, predicate builder
  * incl. unknown-field error, projection reorder, two-phase write with
  * RowKind delete flow (insert-then-delete reads back empty), static
  * overwrite, split metadata, schema-mismatch error shape.
  */
class ApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _
  private var catalog: Catalog = _

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    warehouse = Files.createTempDirectory("graft-api-wh")
    catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "gapi"))
    catalog.createDatabase("default")
  }

  override def afterAll(): Unit = spark.stop()

  private val simpleSchema = Schema(StructType(Seq(
    StructField("f0", IntegerType), StructField("f1", StringType))))

  test("create table / exists / getTable") {
    catalog.createTable("default.simple", simpleSchema)
    assert(catalog.tableExists("default.simple"))
    catalog.createTable("default.simple", simpleSchema, ignoreIfExists = true)
    val t = catalog.getTable("default.simple")
    assert(t.tableSchema.fields.fieldNames.toSeq == Seq("f0", "f1"))
  }

  test("two-phase write then read round-trip") {
    import spark.implicits._
    val t = catalog.getTable("default.simple")
    val wb = t.newBatchWriteBuilder()
    val w = wb.newWrite()
    w.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("f0", "f1"))
    val msgs = w.prepareCommit()
    assert(msgs.nonEmpty)
    wb.newCommit().commit(msgs)
    val rows = t.newReadBuilder().newRead().toDF().orderBy("f0").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("predicate builder pushdown + unknown field error") {
    val t = catalog.getTable("default.simple")
    val rb = t.newReadBuilder()
    val pb = rb.newPredicateBuilder()
    val p = pb.and(Seq(pb.greaterOrEqual("f0", 2), pb.startswith("f1", "b")))
    val got = rb.withFilter(p).newRead().toDF().collect()
    assert(got.length == 1 && got(0).getInt(0) == 2)
    val e = intercept[IllegalArgumentException] {
      pb.equal("nope", 1)
    }
    assert(e.getMessage.contains("The field nope is not in field list"))
  }

  test("projection subset and reorder via withProjection") {
    val t = catalog.getTable("default.simple")
    val rb = t.newReadBuilder().withProjection(Seq("f1", "f0"))
    assert(rb.readType().fieldNames.toSeq == Seq("f1", "f0"))
    val rows = rb.newRead().toDF().orderBy("f0").collect()
    assert(rows.head.schema.fieldNames.toSeq == Seq("f1", "f0"))
    assert(rows.head.getString(0) == "a")
  }

  test("empty projection yields a zero-column frame (reference case 1)") {
    val t = catalog.getTable("default.simple")
    val df = t.newReadBuilder().withProjection(Seq.empty).newRead().toDF()
    assert(df.columns.isEmpty) // ≙ result1.empty in test_write_and_read.py:490-496
  }

  test("withLimit returns at most n rows") {
    val t = catalog.getTable("default.simple")
    assert(t.newReadBuilder().withLimit(2).newRead().toDF().count() == 2)
  }

  test("split metadata exposes row counts / sizes / paths") {
    val t = catalog.getTable("default.simple")
    val splits = t.newReadBuilder().newScan().plan().splits
    assert(splits.nonEmpty)
    assert(splits.map(_.rowCount).sum == 3)
    assert(splits.forall(_.fileSize > 0))
    assert(splits.forall(_.filePaths.forall(_.endsWith(".parquet"))))
  }

  test("PK table: insert then RowKind delete reads back empty") {
    import spark.implicits._
    catalog.createTable("default.pk_del", Schema(
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      primaryKeys = Seq("k"), options = Map("bucket" -> "1")))
    val t = catalog.getTable("default.pk_del")

    val wb1 = t.newBatchWriteBuilder()
    val w1 = wb1.newWrite()
    w1.write(Seq((1L, "x")).toDF("k", "v"))
    wb1.newCommit().commit(w1.prepareCommit())
    assert(t.newReadBuilder().newRead().toDF().count() == 1)

    val wb2 = t.newBatchWriteBuilder()
    val w2 = wb2.newWrite()
    val delDf = Seq((1L, "x")).toDF("k", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte"))
    w2.write(delDf)
    wb2.newCommit().commit(w2.prepareCommit())
    assert(t.newReadBuilder().newRead().toDF().count() == 0)
  }

  test("schema mismatch error matches reference shape, nullability ignored") {
    import spark.implicits._
    val t = catalog.getTable("default.simple")
    val w = t.newBatchWriteBuilder().newWrite()
    val e = intercept[RuntimeException] {
      w.write(Seq((1L, "a")).toDF("f0", "f1")) // int64 vs int32 column
    }
    assert(e.getMessage.startsWith("Input schema isn't consistent with table schema."))
    // nullability-only difference is accepted
    val nonNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(7, "g"))),
      StructType(Seq(StructField("f0", IntegerType, nullable = false),
        StructField("f1", StringType, nullable = false))))
    val wb = t.newBatchWriteBuilder()
    val w2 = wb.newWrite()
    w2.write(nonNull)
    wb.newCommit().commit(w2.prepareCommit())
    assert(t.newReadBuilder().newRead().toDF().where(col("f0") === 7).count() == 1)
  }

  test("static partition overwrite via facade") {
    import spark.implicits._
    catalog.createTable("default.part_ow", Schema(
      StructType(Seq(StructField("pt", IntegerType), StructField("v", StringType))),
      partitionKeys = Seq("pt")))
    val t = catalog.getTable("default.part_ow")
    val wb = t.newBatchWriteBuilder()
    val w = wb.newWrite()
    w.write(Seq((1, "a"), (2, "b")).toDF("pt", "v"))
    wb.newCommit().commit(w.prepareCommit())

    val wb2 = t.newBatchWriteBuilder().overwrite(Map("pt" -> "1"))
    val w2 = wb2.newWrite()
    w2.write(Seq((1, "A")).toDF("pt", "v"))
    wb2.newCommit().commit(w2.prepareCommit())

    val got = t.newReadBuilder().newRead().toDF().orderBy("pt")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "A"), (2, "b")))
  }

  test("temp view sink ≙ to_duckdb: full SQL over the snapshot") {
    val t = catalog.getTable("default.simple")
    t.newReadBuilder().newRead().createTempView("simple_view")
    val n = spark.sql("SELECT count(*) FROM simple_view WHERE f0 < 4")
      .collect()(0).getLong(0)
    assert(n >= 3)
  }

  test("NullType column coerces to STRING (reference test_data_types null)") {
    // ≙ `test_data_types.py:70-73`: a pyarrow `null` column becomes
    // STRING with a warning, not a rejection
    catalog.createTable("default.nulltyped", Schema(StructType(Seq(
      StructField("id", IntegerType), StructField("_null", NullType)))))
    val t = catalog.getTable("default.nulltyped")
    assert(t.tableSchema.fields("_null").dataType == StringType,
      t.tableSchema.fields.treeString)
    // and the coerced column is writable/readable as a string
    import spark.implicits._
    val wb = t.newBatchWriteBuilder()
    val w = wb.newWrite()
    w.write(Seq((1, null: String), (2, "x")).toDF("id", "_null"))
    wb.newCommit().commit(w.prepareCommit())
    val got = t.newReadBuilder().newRead().toDF().orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, null), (2, "x")))
  }

  test("max-workers is accepted, validated, and a no-op (reference knob)") {
    // ≙ `java_implementation.py:315-320`: ported reference configs must
    // round-trip; Spark's task-per-split scheduling supersedes the knob
    catalog.createTable("default.mw",
      Schema(StructType(Seq(StructField("f0", IntegerType))),
        options = Map("max-workers" -> "8")))
    val t = catalog.getTable("default.mw")
    assert(t.tableSchema.options("max-workers") == "8")
    assert(t.newReadBuilder().newRead().toDF().count() == 0L)
    // same validation as the reference: must be a positive int
    val zero = intercept[Exception](catalog.createTable("default.mw0",
      Schema(StructType(Seq(StructField("f0", IntegerType))),
        options = Map("max-workers" -> "0"))))
    assert(zero.getMessage.contains("max_workers must be greater than 0"),
      zero.getMessage)
    val bad = intercept[Exception](catalog.createTable("default.mwx",
      Schema(StructType(Seq(StructField("f0", IntegerType))),
        options = Map("max-workers" -> "abc"))))
    assert(bad.getMessage.contains("max-workers"), bad.getMessage)
  }
}
