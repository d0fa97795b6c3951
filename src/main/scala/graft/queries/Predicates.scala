package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** The reference's 16-method predicate surface
  * (`pypaimon/api/predicate.py:29-95`: equal, notEqual, lessThan,
  * lessOrEqual, greaterThan, greaterOrEqual, isNull, isNotNull,
  * startsWith, endsWith, contains, in, notIn, between + and/or) exercised
  * one query per leaf over the test tables, each with a DuckDB oracle.
  * All of these compile to Catalyst comparisons that push into the
  * parquet scan (`PushedFilters` in `.explain`), which is the Spark
  * equivalent of the reference's format-level pushdown
  * (`pypaimon/pynative/util/predicate_converter.py:29-77`).
  */
object Predicates {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("p_equal",
      (s, dir) => t(s, dir, "part").filter(col("p_size") === 10)
        .select("p_partkey", "p_size").orderBy("p_partkey"),
      Some("SELECT p_partkey, p_size FROM part WHERE p_size = 10 ORDER BY p_partkey")),

    // NULL semantics note (`test_pynative_reader.py:140-153`): notEqual
    // drops NULLs — identical three-valued logic in Spark =!= and SQL <>.
    QueryDef("p_not_equal",
      (s, dir) => t(s, dir, "part").filter(col("p_brand") =!= "Brand#1")
        .select("p_partkey", "p_brand").orderBy("p_partkey"),
      Some("SELECT p_partkey, p_brand FROM part WHERE p_brand <> 'Brand#1' ORDER BY p_partkey")),

    QueryDef("p_less_than",
      (s, dir) => t(s, dir, "lineitem").filter(col("l_quantity") < 3.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity < 3.0 ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("p_less_or_equal",
      (s, dir) => t(s, dir, "lineitem").filter(col("l_quantity") <= 2.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity <= 2.0 ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("p_greater_than",
      (s, dir) => t(s, dir, "lineitem").filter(col("l_quantity") > 49.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity > 49.0 ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("p_greater_or_equal",
      (s, dir) => t(s, dir, "lineitem").filter(col("l_quantity") >= 50.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity >= 50.0 ORDER BY l_orderkey, l_linenumber""")),

    // The test tables are NULL-free, so NULLs are derived with NULLIF —
    // same expression both sides; the filter semantics are what's tested.
    QueryDef("p_is_null",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag"))
        .filter(col("flag").isNull)
        .agg(count(lit(1)).as("n_null")),
      Some("""SELECT COUNT(*) AS n_null FROM (
        SELECT NULLIF(l_returnflag,'N') AS flag FROM lineitem) q
        WHERE flag IS NULL""")),

    QueryDef("p_is_not_null",
      (s, dir) => t(s, dir, "lineitem")
        .select(nullif(col("l_returnflag"), lit("N")).as("flag"))
        .filter(col("flag").isNotNull)
        .groupBy("flag").agg(count(lit(1)).as("n")).orderBy("flag"),
      Some("""SELECT flag, COUNT(*) AS n FROM (
        SELECT NULLIF(l_returnflag,'N') AS flag FROM lineitem) q
        WHERE flag IS NOT NULL GROUP BY flag ORDER BY flag""")),

    QueryDef("p_startswith",
      (s, dir) => t(s, dir, "part").filter(col("p_name").startsWith("a"))
        .select("p_partkey", "p_name").orderBy("p_partkey"),
      Some("SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'a%' ORDER BY p_partkey")),

    QueryDef("p_endswith",
      (s, dir) => t(s, dir, "part").filter(col("p_name").endsWith("e"))
        .select("p_partkey", "p_name").orderBy("p_partkey"),
      Some("SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%e' ORDER BY p_partkey")),

    QueryDef("p_contains",
      (s, dir) => t(s, dir, "part").filter(col("p_name").contains("el"))
        .select("p_partkey", "p_name").orderBy("p_partkey"),
      Some("SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%el%' ORDER BY p_partkey")),

    QueryDef("p_in",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#3"))
        .select("p_partkey", "p_brand").orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_brand FROM part
        WHERE p_brand IN ('Brand#1','Brand#3') ORDER BY p_partkey""")),

    QueryDef("p_not_in",
      (s, dir) => t(s, dir, "part")
        .filter(!col("p_brand").isin("Brand#1", "Brand#3"))
        .select("p_partkey", "p_brand").orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_brand FROM part
        WHERE p_brand NOT IN ('Brand#1','Brand#3') ORDER BY p_partkey""")),

    QueryDef("p_between",
      (s, dir) => t(s, dir, "part").filter(col("p_size").between(5, 10))
        .select("p_partkey", "p_size").orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_size FROM part
        WHERE p_size BETWEEN 5 AND 10 ORDER BY p_partkey""")),

    // and/or composition (`PredicateBuilder.and_/or_`).
    QueryDef("p_and_or",
      (s, dir) => t(s, dir, "part")
        .filter((col("p_size") < 10 && col("p_brand") === "Brand#2") ||
          (col("p_size") > 45 && col("p_name").startsWith("b")))
        .select("p_partkey", "p_size", "p_brand").orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_size, p_brand FROM part
        WHERE (p_size < 10 AND p_brand = 'Brand#2')
           OR (p_size > 45 AND p_name LIKE 'b%')
        ORDER BY p_partkey""")),

    // Projection pushdown + reorder (`test_write_and_read.py:507-518`):
    // read schema must shrink to the 2 selected columns.
    QueryDef("p_projection_reorder",
      (s, dir) => t(s, dir, "supplier").select("s_name", "s_suppkey")
        .orderBy("s_suppkey"),
      Some("SELECT s_name, s_suppkey FROM supplier ORDER BY s_suppkey")),

    // Limit pushdown (`SupportsPushDownLimit`); deterministic via sort.
    QueryDef("p_limit",
      (s, dir) => t(s, dir, "customer").select("c_custkey", "c_name")
        .orderBy("c_custkey").limit(7),
      Some("SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 7"))
  )
}
