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

  /** The ONE parser of a `fields.<g>.sequence-group` member list —
    * the merge engine (`MergeFunction.specOf`), the ALTER mutability
    * guards, and the commit-time fence all share it so the option
    * grammar cannot drift between the engine and its guards.
    */
  def parseGroupMembers(v: String): Seq[String] =
    v.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Merge-rule property keys whose SEMANTIC value differs between two
    * persisted option maps. Used to decide whether a schema-lineage
    * advance re-interprets merge rules (the commit-time fence).
    *
    * Compared normalized, mirroring the catalog's ALTER noop logic and
    * the engine's `specOf` parse — NOT as raw strings: alterTable
    * persists the literal option spelling even for changes its guard
    * deemed semantic no-ops (re-stating the engine-default fold on an
    * unconfigured column, re-stating a group's members in a different
    * order or spacing), and a raw comparison would let such a
    * config-management push spuriously fence every in-flight writer.
    *   - `aggregate-function`: absent ≡ the engine default
    *     `last_non_null_value`; values compare trimmed.
    *   - `sequence-group`: member lists are SETS; absent ≢ present
    *     (dissolving a group is a real rule change even if empty).
    */
  def changedBetween(a: Map[String, String],
      b: Map[String, String]): Set[String] =
    (a.keySet ++ b.keySet).filter { k =>
      if (aggColumn(k).isDefined) normAgg(a.get(k)) != normAgg(b.get(k))
      else if (seqGroupColumn(k).isDefined)
        normGroup(a.get(k)) != normGroup(b.get(k))
      else false
    }

  /** The engine-default fold — the value an absent
    * `fields.<col>.aggregate-function` means (MergeFunction's
    * getOrElse default). One spelling, shared by the fence AND the
    * catalog's ALTER noop checks so they can never drift.
    */
  val DefaultAgg = "last_non_null_value"

  /** Semantic value of an aggregate-function option: absent ≡ the
    * engine default, values compare trimmed (specOf trims at parse).
    */
  def normAgg(v: Option[String]): String =
    v.map(_.trim).getOrElse(DefaultAgg)

  /** Semantic value of a sequence-group option: member lists are SETS
    * (order/spacing-free); absent stays distinct from present.
    */
  def normGroup(v: Option[String]): Option[Set[String]] =
    v.map(parseGroupMembers(_).toSet)

  private def shaped(name: String, suf: String): Option[String] = {
    val pre = "fields."
    if (name.startsWith(pre) && name.endsWith(suf) &&
        name.length > pre.length + suf.length)
      Some(name.stripPrefix(pre).stripSuffix(suf))
    else None
  }
}
