package graft.expr

/** AST for the reference filter-expression language
  * (reference: internal/parser/planparserv2/Plan.g4 — re-expressed as a
  * hand-written Pratt parser; this is a new implementation, not a port).
  */
sealed trait Node

case class IntLit(v: Long) extends Node
case class FloatLit(v: Double) extends Node
case class BoolLit(v: Boolean) extends Node
case class StringLit(v: String) extends Node
case class TemplateVar(name: String) extends Node

/** Bare column reference. */
case class Ident(name: String) extends Node

/** `field["a"][0]` / `$meta["k"]` — JSON or array path access. */
case class JsonPath(field: String, path: Seq[Either[String, Int]]) extends Node

/** `$[sub]` — per-element sub-field reference, valid only inside an
  * `element_filter` element expression (grammar StructSubFieldIdentifier,
  * Plan.g4:154).
  */
case class StructSubField(name: String) extends Node

case class ArrayLit(items: Seq[Node]) extends Node

sealed trait UnaryOp
object UnaryOp {
  case object Neg extends UnaryOp
  case object Pos extends UnaryOp
  case object Not extends UnaryOp
  case object BNot extends UnaryOp
}
case class Unary(op: UnaryOp, child: Node) extends Node

sealed trait BinOp
object BinOp {
  case object Add extends BinOp; case object Sub extends BinOp
  case object Mul extends BinOp; case object Div extends BinOp
  case object Mod extends BinOp; case object Pow extends BinOp
  case object Shl extends BinOp; case object Shr extends BinOp
  case object BAnd extends BinOp; case object BOr extends BinOp
  case object BXor extends BinOp
  case object Lt extends BinOp; case object Le extends BinOp
  case object Gt extends BinOp; case object Ge extends BinOp
  case object Eq extends BinOp; case object Ne extends BinOp
  case object And extends BinOp; case object Or extends BinOp
}
case class Binary(op: BinOp, left: Node, right: Node) extends Node

/** `a < field <= b` two-sided range (grammar Range/ReverseRange). */
case class RangeCmp(lo: Node, loInclusive: Boolean, target: Node,
    hiInclusive: Boolean, hi: Node) extends Node

case class In(target: Node, values: Node, negated: Boolean) extends Node
case class Like(target: Node, pattern: String) extends Node
case class RegexMatch(target: Node, pattern: Node, negated: Boolean) extends Node
case class IsNull(target: Node, negated: Boolean) extends Node
case class ExistsPath(target: Node) extends Node

/** Named function constructs: text_match, phrase_match, match_*,
  * json_contains*, array_*, random_sample, st_*, user calls.
  * Named options (`threshold = 3`, `minimum_should_match = 2`) land in
  * `options`.
  */
case class Call(name: String, args: Seq[Node], options: Map[String, Node] = Map.empty)
    extends Node

/** `iso'...'` timestamp literal in plain operand position. */
case class IsoLit(v: String) extends Node

/** `ts_col ± INTERVAL '...' OP iso'...'` (grammar TimestamptzCompare*). */
case class TsCompare(field: String, intervalSign: Int, interval: Option[String],
    op: BinOp, iso: String, reversed: Boolean) extends Node
