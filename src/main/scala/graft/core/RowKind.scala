package graft.core

/** 4-valued changelog row kind, byte-encoded exactly as the reference
  * (`pypaimon/pynative/common/row/row_kind.py:22-55`): +I=0, -U=1,
  * +U=2, -D=3; `isAdd` = {INSERT, UPDATE_AFTER}.
  */
object RowKind {
  final val Insert: Byte = 0
  final val UpdateBefore: Byte = 1
  final val UpdateAfter: Byte = 2
  final val Delete: Byte = 3

  def isAdd(kind: Byte): Boolean =
    kind == Insert || kind == UpdateAfter

  def fromShortString(s: String): Byte = s match {
    case "+I" => Insert
    case "-U" => UpdateBefore
    case "+U" => UpdateAfter
    case "-D" => Delete
    case other => throw new IllegalArgumentException(s"Unknown RowKind: $other")
  }

  def shortString(kind: Byte): String = kind match {
    case Insert => "+I"
    case UpdateBefore => "-U"
    case UpdateAfter => "+U"
    case Delete => "-D"
    case other => throw new IllegalArgumentException(s"Unknown RowKind byte: $other")
  }

  /** Name of the hidden column accepted on write / used in KV files. */
  final val ColumnName = "_row_kind"
}
