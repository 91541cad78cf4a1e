package graft.operators

import graft.GraftInvalidOperation

/** Join-type normalization, string-compatible with the reference's
  * `parse_join_type` (ref: slide/utils.py:33-61): strips spaces/underscores,
  * accepts the same aliases, and maps onto Spark's join-type names.
  */
object JoinType {
  final val Inner = "inner"
  final val Left = "left_outer"
  final val Right = "right_outer"
  final val Full = "full_outer"
  final val Cross = "cross"
  final val Semi = "left_semi"
  final val Anti = "left_anti"

  def parse(s: String): String = {
    val t = s.toLowerCase.replace(" ", "").replace("_", "")
    t match {
      case "inner" | "join" | "innerjoin" => Inner
      case "cross" | "crossjoin" => Cross
      case "inner_broadcast" | "innerbroadcast" => Inner
      case "leftsemi" | "semi" | "semijoin" | "leftsemijoin" => Semi
      case "leftanti" | "anti" | "antijoin" | "leftantijoin" => Anti
      case "left" | "leftouter" | "leftjoin" | "leftouterjoin" => Left
      case "right" | "rightouter" | "rightjoin" | "rightouterjoin" => Right
      case "full" | "outer" | "fullouter" | "fullouterjoin" | "fulljoin" => Full
      case _ => throw new GraftInvalidOperation(s"invalid join type: $s")
    }
  }
}
