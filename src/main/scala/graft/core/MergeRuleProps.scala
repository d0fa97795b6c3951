package graft.core

/** Shape predicates for the two MUTABLE merge-rule-bearing table
  * properties — `fields.<col>.aggregate-function` and
  * `fields.<col>.sequence-group`. Every other merge-semantics option
  * (merge-engine, sequence.field, ignore-delete) is structural and
  * immutable after CREATE, so these two are the only properties whose
  * change can reinterpret committed history and therefore the only ones
  * the commit-time fence ([[graft.format.MergeRuleFence]]) must watch.
  */
object MergeRuleProps {

  /** The column a `fields.<col>.aggregate-function` property names. */
  def aggColumn(name: String): Option[String] =
    shaped(name, ".aggregate-function")

  /** The version column a `fields.<col>.sequence-group` property names. */
  def seqGroupColumn(name: String): Option[String] =
    shaped(name, ".sequence-group")

  def isMergeRuleProp(name: String): Boolean =
    aggColumn(name).isDefined || seqGroupColumn(name).isDefined

  /** Merge-rule property keys whose value differs between two persisted
    * option maps — a SET, an UNSET, or a value change all count. Used to
    * decide whether a schema-lineage advance re-interprets merge rules.
    */
  def changedBetween(a: Map[String, String],
      b: Map[String, String]): Set[String] =
    (a.keySet ++ b.keySet)
      .filter(k => isMergeRuleProp(k) && a.get(k) != b.get(k))

  private def shaped(name: String, suf: String): Option[String] = {
    val pre = "fields."
    if (name.startsWith(pre) && name.endsWith(suf) &&
        name.length > pre.length + suf.length)
      Some(name.stripPrefix(pre).stripSuffix(suf))
    else None
  }
}
