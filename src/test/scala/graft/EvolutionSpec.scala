package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Schema evolution (ADD COLUMN null-fills older files) and
  * partition-level SQL DELETE.
  */
class EvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-evo-wh")
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse.toString)
      .getOrCreate()
  }

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.default")
  }

  override def afterAll(): Unit = spark.stop()

  test("ADD COLUMN: old files read back with nulls, new writes fill it") {
    spark.sql("CREATE TABLE graft.default.evo (f0 INT, f1 STRING)")
    spark.sql("INSERT INTO graft.default.evo VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.default.evo ADD COLUMN f2 DOUBLE")
    spark.sql("INSERT INTO graft.default.evo VALUES (3,'c', 3.5)")
    val got = spark.sql(
      "SELECT f0, f1, f2 FROM graft.default.evo ORDER BY f0").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSeq ==
      Seq((1, "a", null), (2, "b", null), (3, "c", 3.5)))
    // filter on the evolved column
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.evo WHERE f2 IS NULL")
      .collect()(0).getLong(0) == 2)
  }

  test("ADD COLUMN on PK table: merge still works across schema versions") {
    spark.sql("CREATE TABLE graft.default.evo_pk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.evo_pk VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.default.evo_pk ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO graft.default.evo_pk VALUES (2,'B', 9.5)")
    val got = spark.sql(
      "SELECT k, v, score FROM graft.default.evo_pk ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSeq ==
      Seq((1L, "a", null), (2L, "B", 9.5)))
  }

  test("ADD COLUMN then row-level DML: delta rows carry the new schema") {
    spark.sql("CREATE TABLE graft.default.ev_dml (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.ev_dml VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.default.ev_dml ADD COLUMN x INT")
    // merge-on-read UPDATE across schema eras: the -U/+U delta rows
    // are written with the evolved schema while the base files stay
    // old-era; the merge maps both by field id
    spark.sql("UPDATE graft.default.ev_dml SET x = 7 WHERE k = 1")
    spark.sql("DELETE FROM graft.default.ev_dml WHERE k = 2")
    val got = spark.sql("SELECT k, v, x FROM graft.default.ev_dml ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    assert(got.toSeq == Seq((1L, "a", Some(7))), got.toSeq)
  }

  test("compaction through a STALE handle after ADD COLUMN keeps the new column") {
    // regression (found by LifecycleFuzzSpec seed 7): Compactor used
    // the caller's cached TableSchema, so a facade handle created
    // before an ALTER TABLE ADD COLUMN — or a long-running streaming
    // sink's per-query write — compacted whole buckets THROUGH the
    // pre-ADD schema and silently dropped every committed value of
    // the new column. compactGroups must reload the latest persisted
    // schema before rewriting.
    spark.sql("CREATE TABLE graft.default.evo_cmp (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.evo_cmp VALUES (1,'a'), (2,'b')")
    val stale = graft.api.Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
      .getTable("default.evo_cmp") // caches the pre-ADD schema
    spark.sql("ALTER TABLE graft.default.evo_cmp ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO graft.default.evo_cmp VALUES (2,'B', 42)")
    assert(stale.compact() == 1)
    val got = spark.sql(
      "SELECT k, v, w FROM graft.default.evo_cmp ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq((1L, "a", None), (2L, "B", Some(42L))),
      got.toSeq)
    // the compacted file is stamped with the evolved schema id, so
    // later readers null-fill exactly the columns the rewrite lacked
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/evo_cmp"))
    assert(sm.latestSnapshot.get.commitKind == "COMPACT")
  }

  test("RENAME COLUMN: old files keep serving data under the new name") {
    spark.sql("CREATE TABLE graft.default.evo_rn (f0 INT, f1 STRING)")
    spark.sql("INSERT INTO graft.default.evo_rn VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.default.evo_rn RENAME COLUMN f1 TO label")
    spark.sql("INSERT INTO graft.default.evo_rn VALUES (3,'c')")
    val got = spark.sql(
      "SELECT f0, label FROM graft.default.evo_rn ORDER BY f0").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("RENAME COLUMN on PK table value column: merge across versions") {
    spark.sql("CREATE TABLE graft.default.evo_rnpk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.evo_rnpk VALUES (1,'a'), (2,'b')")
    spark.sql("ALTER TABLE graft.default.evo_rnpk RENAME COLUMN v TO name")
    spark.sql("INSERT INTO graft.default.evo_rnpk VALUES (2,'B')")
    val got = spark.sql(
      "SELECT k, name FROM graft.default.evo_rnpk ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B")))
  }

  test("DROP then re-ADD same name: old values stay dead (fresh field id)") {
    spark.sql("CREATE TABLE graft.default.evo_drop (f0 INT, tag STRING)")
    spark.sql("INSERT INTO graft.default.evo_drop VALUES (1,'old1'), (2,'old2')")
    spark.sql("ALTER TABLE graft.default.evo_drop DROP COLUMN tag")
    assert(spark.table("graft.default.evo_drop").columns.toSeq == Seq("f0"))
    assert(spark.sql("SELECT f0 FROM graft.default.evo_drop ORDER BY f0")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    spark.sql("ALTER TABLE graft.default.evo_drop ADD COLUMN tag STRING")
    spark.sql("INSERT INTO graft.default.evo_drop VALUES (3,'new3')")
    val got = spark.sql(
      "SELECT f0, tag FROM graft.default.evo_drop ORDER BY f0").collect()
    assert(got.map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.getString(1))).toSeq ==
      Seq((1, null), (2, null), (3, "new3")),
      "re-added column must NOT resurrect pre-drop values")
  }

  test("structural columns immutable; type changes rejected") {
    spark.sql("CREATE TABLE graft.default.evo_guard (pt INT, k BIGINT, v STRING) " +
      "PARTITIONED BY (pt) TBLPROPERTIES ('primary-key'='pt,k','bucket'='1')")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.evo_guard RENAME COLUMN k TO kk"))
      .getMessage.contains("primary-key"))
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.evo_guard DROP COLUMN pt"))
      .getMessage.nonEmpty)
    // cross-family change: Spark's analyzer rejects (not an up-cast)
    val typeChange = intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.evo_guard ALTER COLUMN v TYPE INT"))
      .getMessage.toLowerCase
    assert(typeChange.contains("not supported"))
    // int->float is LOSSY (24-bit mantissa): the catalog's own gate
    // must reject it even though Spark's analyzer lets it through
    spark.sql("ALTER TABLE graft.default.evo_guard ADD COLUMN m INT")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.evo_guard ALTER COLUMN m TYPE FLOAT"))
      .getMessage.contains("widening"))
    // bigint->double is lossy past 2^53: rejected too
    spark.sql("ALTER TABLE graft.default.evo_guard ADD COLUMN mb BIGINT")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.evo_guard ALTER COLUMN mb TYPE DOUBLE"))
      .getMessage.contains("widening"))
    // primary-key / partition column types are immutable even widening
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.evo_guard ALTER COLUMN pt TYPE BIGINT"))
      .getMessage.contains("partition or primary-key"))
  }

  test("ALTER COLUMN TYPE widening on append table: old files upcast at read") {
    spark.sql("CREATE TABLE graft.default.evo_w (k INT, x INT, f FLOAT)")
    spark.sql("INSERT INTO graft.default.evo_w VALUES (1, 10, 1.5), (2, 20, 2.5)")
    spark.sql("ALTER TABLE graft.default.evo_w ALTER COLUMN x TYPE BIGINT")
    spark.sql("ALTER TABLE graft.default.evo_w ALTER COLUMN f TYPE DOUBLE")
    spark.sql("INSERT INTO graft.default.evo_w VALUES (3, 3000000000, 3.25)")
    val df = spark.sql(
      "SELECT k, x, f FROM graft.default.evo_w ORDER BY k")
    assert(df.schema("x").dataType.simpleString == "bigint")
    assert(df.schema("f").dataType.simpleString == "double")
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq == Seq((1, 10L, 1.5), (2, 20L, 2.5), (3, 3000000000L, 3.25)))
    // aggregate over mixed-era files (columnar path + widened vector)
    assert(spark.sql("SELECT sum(x) FROM graft.default.evo_w")
      .collect()(0).getLong(0) == 3000000030L)
    // filter with a value only representable at the widened type
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.evo_w WHERE x > 2147483647")
      .collect()(0).getLong(0) == 1)
  }

  test("float->double widening refuses exact MIN/MAX pushdown (era stats)") {
    // pre-widening files recorded Float.toString stat strings; "0.1"
    // parses to a double no row contains (0.1f widens to
    // 0.10000000149011612). The metadata-only aggregate must refuse
    // the column and fall back to a real scan whose answer matches the
    // rows actually stored.
    spark.sql("CREATE TABLE graft.default.evo_fd (k INT, f FLOAT)")
    spark.sql("INSERT INTO graft.default.evo_fd VALUES (1, CAST(0.1 AS FLOAT))")
    spark.sql("ALTER TABLE graft.default.evo_fd ALTER COLUMN f TYPE DOUBLE")
    spark.sql("INSERT INTO graft.default.evo_fd VALUES (2, 0.5)")
    val q = spark.sql("SELECT MIN(f) AS mn FROM graft.default.evo_fd")
    assert(!q.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "widened float column must not serve metadata-only MIN/MAX")
    assert(q.collect()(0).getDouble(0) == 0.1f.toDouble)
    // a never-float double column still pushes down
    spark.sql("CREATE TABLE graft.default.evo_dd (k INT, d DOUBLE)")
    spark.sql("INSERT INTO graft.default.evo_dd VALUES (1, 0.25)")
    val q2 = spark.sql("SELECT MIN(d) AS mn FROM graft.default.evo_dd")
    assert(q2.queryExecution.executedPlan.toString.contains("GraftAggScan"))
    assert(q2.collect()(0).getDouble(0) == 0.25)
  }

  test("cross-family widening int->double: old files upcast at read, all formats") {
    for (fmt <- Seq("parquet", "orc", "avro")) {
      spark.sql(s"CREATE TABLE graft.default.evo_xf_$fmt (k INT, m INT, s SMALLINT) " +
        s"TBLPROPERTIES ('file.format'='$fmt')")
      spark.sql(s"INSERT INTO graft.default.evo_xf_$fmt VALUES (1, 7, 2), (2, -3, 4)")
      spark.sql(s"ALTER TABLE graft.default.evo_xf_$fmt ALTER COLUMN m TYPE DOUBLE")
      spark.sql(s"ALTER TABLE graft.default.evo_xf_$fmt ALTER COLUMN s TYPE FLOAT")
      spark.sql(s"INSERT INTO graft.default.evo_xf_$fmt VALUES (3, 0.5, 1.25)")
      val got = spark.sql(
        s"SELECT k, m, s FROM graft.default.evo_xf_$fmt ORDER BY k")
      assert(got.schema("m").dataType.simpleString == "double", fmt)
      assert(got.schema("s").dataType.simpleString == "float", fmt)
      assert(got.collect().map(r => (r.getInt(0), r.getDouble(1), r.getFloat(2)))
        .toSeq == Seq((1, 7.0, 2.0f), (2, -3.0, 4.0f), (3, 0.5, 1.25f)), fmt)
      // filter across eras: int-era rows must satisfy double predicates
      assert(spark.sql(s"SELECT count(*) FROM graft.default.evo_xf_$fmt " +
        "WHERE m > -3.5").collect()(0).getLong(0) == 3, fmt)
    }
  }

  test("float->double widening never wrongly prunes on float-era stats") {
    // 0.1f's shortest-decimal "0.1" parses to a double BELOW
    // 0.1f.toDouble — a naive stat parse would prune the old file for
    // predicates between the two readings
    spark.sql("CREATE TABLE graft.default.evo_fstat (k INT, f FLOAT)")
    spark.sql("INSERT INTO graft.default.evo_fstat VALUES (1, CAST(0.1 AS FLOAT))")
    spark.sql("ALTER TABLE graft.default.evo_fstat ALTER COLUMN f TYPE DOUBLE")
    spark.sql("INSERT INTO graft.default.evo_fstat VALUES (2, 5.0)")
    val hit = spark.sql("SELECT k FROM graft.default.evo_fstat " +
      s"WHERE f = CAST(CAST(0.1 AS FLOAT) AS DOUBLE)").collect()
    assert(hit.map(_.getInt(0)).toSeq == Seq(1),
      "float-era row must survive stat pruning under the widened type")
  }

  test("ALTER COLUMN TYPE widening on PK table: merge across type eras") {
    spark.sql("CREATE TABLE graft.default.evo_wpk (k BIGINT, n INT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.evo_wpk VALUES (1, 5), (2, 6)")
    spark.sql("ALTER TABLE graft.default.evo_wpk ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO graft.default.evo_wpk VALUES (2, 4000000000)")
    val got = spark.sql(
      "SELECT k, n FROM graft.default.evo_wpk ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (2L, 4000000000L)))
  }

  for (fmt <- Seq("orc", "avro")) {
    test(s"$fmt: RENAME + widen round-trip through field ids") {
      spark.sql(s"CREATE TABLE graft.default.evo_$fmt (k INT, cnt INT, s STRING) " +
        s"TBLPROPERTIES ('file.format'='$fmt')")
      spark.sql(s"INSERT INTO graft.default.evo_$fmt VALUES (1, 7, 'a')")
      spark.sql(s"ALTER TABLE graft.default.evo_$fmt RENAME COLUMN cnt TO total")
      spark.sql(s"ALTER TABLE graft.default.evo_$fmt ALTER COLUMN total TYPE BIGINT")
      spark.sql(s"ALTER TABLE graft.default.evo_$fmt DROP COLUMN s")
      spark.sql(s"ALTER TABLE graft.default.evo_$fmt ADD COLUMN s STRING")
      spark.sql(s"INSERT INTO graft.default.evo_$fmt VALUES (2, 9000000000, 'z')")
      val got = spark.sql(
        s"SELECT k, total, s FROM graft.default.evo_$fmt ORDER BY k").collect()
      // old file serves `total` under its original id despite the
      // rename; the dropped-then-readded `s` must NOT resurrect 'a'
      assert(got.map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq ==
        Seq((1, 7L, null), (2, 9000000000L, "z")))
    }

    test(s"$fmt: PK merge across widened eras") {
      spark.sql(s"CREATE TABLE graft.default.evo_pk_$fmt (k BIGINT, n INT) " +
        s"TBLPROPERTIES ('primary-key'='k','bucket'='1','file.format'='$fmt')")
      spark.sql(s"INSERT INTO graft.default.evo_pk_$fmt VALUES (1, 5), (2, 6)")
      spark.sql(s"ALTER TABLE graft.default.evo_pk_$fmt ALTER COLUMN n TYPE BIGINT")
      spark.sql(s"INSERT INTO graft.default.evo_pk_$fmt VALUES (2, 4000000000)")
      assert(spark.sql(s"SELECT k, n FROM graft.default.evo_pk_$fmt ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((1L, 5L), (2L, 4000000000L)))
    }
  }

  test("widening composes with RENAME: id-mapped old file, new name+type") {
    spark.sql("CREATE TABLE graft.default.evo_wr (k INT, cnt INT)")
    spark.sql("INSERT INTO graft.default.evo_wr VALUES (1, 7)")
    spark.sql("ALTER TABLE graft.default.evo_wr RENAME COLUMN cnt TO total")
    spark.sql("ALTER TABLE graft.default.evo_wr ALTER COLUMN total TYPE BIGINT")
    spark.sql("INSERT INTO graft.default.evo_wr VALUES (2, 9000000000)")
    assert(spark.sql("SELECT k, total FROM graft.default.evo_wr ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 7L), (2, 9000000000L)))
  }

  test("partition-level DELETE drops whole partitions, metadata-only") {
    spark.sql("CREATE TABLE graft.default.del (pt INT, v STRING) PARTITIONED BY (pt)")
    spark.sql("INSERT INTO graft.default.del VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("DELETE FROM graft.default.del WHERE pt = 2")
    val got = spark.sql("SELECT pt, v FROM graft.default.del ORDER BY pt")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "a"), (3, "c")))
    // non-partition predicates route to the copy-on-write path
    // (RowLevelSpec covers it in depth)
    spark.sql("DELETE FROM graft.default.del WHERE v = 'a'")
    assert(spark.table("graft.default.del").collect()
      .map(_.getString(1)).toSeq == Seq("c"))
    // unconditional DELETE arrives as [AlwaysTrue] and must actually
    // empty the table (it once reported success while deleting nothing)
    spark.sql("DELETE FROM graft.default.del")
    assert(spark.table("graft.default.del").count() == 0)
  }

  test("structural table properties cannot be altered") {
    spark.sql("CREATE TABLE graft.default.struct_props (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='4')")
    spark.sql("INSERT INTO graft.default.struct_props VALUES (1, 'a')")
    // changing bucket would split existing keys across merge groups
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.default.struct_props SET TBLPROPERTIES ('bucket'='8')")
    }
    assert(e.getMessage.contains("structural"), e.getMessage)
    // setting the SAME value is a harmless no-op
    spark.sql(
      "ALTER TABLE graft.default.struct_props SET TBLPROPERTIES ('bucket'='4')")
    // non-structural options remain mutable
    spark.sql("ALTER TABLE graft.default.struct_props " +
      "SET TBLPROPERTIES ('compaction.trigger-file-count'='3')")
    assert(spark.table("graft.default.struct_props").count() == 1)
  }

  test("ADD COLUMN rejects duplicate names") {
    spark.sql("CREATE TABLE graft.default.dup_col (k BIGINT, v STRING)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.dup_col ADD COLUMN v STRING")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }
}
