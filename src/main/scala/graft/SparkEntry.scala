package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory is assembled from the per-family registries under
  * `graft.queries`; each entry is a Spark plan plus (when
  * SQL-expressible) a bit-deterministic DuckDB oracle.
  */
object SparkEntry {

  private val allDefs: Seq[QueryDef] = {
    val defs =
      Relational.defs ++ Relational2.defs ++ Relational3.defs ++
        Relational4.defs ++ Predicates.defs ++
        MergeOnRead.defs ++ Text.defs ++ Curation.defs ++
        Dedup.defs ++ Similarity.defs ++ Sketches.defs ++
        MultimodalQ.defs ++ Pipeline.defs ++ ConnectorQ.defs
    // a name collision across registries would silently shadow one
    // query out of BOTH the bench and the correctness gate via toMap
    val dup = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
