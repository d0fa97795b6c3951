package graft.queries

import org.apache.spark.sql.SparkSession

/** Stable, never-reused identity token per SparkSession, for memo keys.
  *
  * `System.identityHashCode` is NOT unique for a JVM's lifetime: after
  * a session is GC'd a new session can receive the same hash and
  * silently inherit the dead session's memo entries — a DataFrame bound
  * to a stopped context, or (worse) a skipped validation. Spark's own
  * `sessionUUID` is `private[sql]`, so the token is minted here: one
  * random UUID per session instance, held WEAKLY so the map itself
  * never pins a session (memo values that reference the session keep
  * both alive for exactly as long as the entry exists — consistent).
  */
private[graft] object SessionKey {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** The session's unique token (UUID string). */
  def id(s: SparkSession): String =
    ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  /** Short identifier-safe form (12 hex chars) for generated SQL names. */
  def shortId(s: SparkSession): String = id(s).replace("-", "").take(12)
}
