package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Dense-vector distance metrics.
  *
  * Mirrors the metric set of the reference engine's brute-force search
  * (reference: internal/core/src/query/SearchBruteForce.cpp,
  * pkg/util/metric/metric_type.go:15-55): L2 (squared euclidean — the
  * reference reports squared L2), IP (inner product, higher-is-better),
  * COSINE (cosine similarity, higher-is-better).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so the
  * distance loop stays inside whole-stage codegen — no UDF/boxing on the
  * scan→score→topk hot path, which is what keeps a 100 TB brute-force
  * scan CPU-bound instead of allocation-bound.
  */
object Metric extends Enumeration {
  val L2, IP, COSINE = Value

  def higherIsBetter(m: Metric.Value): Boolean = m != L2

  def parse(s: String): Metric.Value = s.toUpperCase match {
    case "L2"     => L2
    case "IP"     => IP
    case "COSINE" => COSINE
    case other    => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** score = distance(left, right) under `metric`, computed in double
  * precision regardless of the array element type (float or double).
  */
case class VectorDistance(
    left: Expression,
    right: Expression,
    metric: Metric.Value)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = s"vec_${metric.toString.toLowerCase}"

  private def elementType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall { e =>
      elementType(e) == FloatType || elementType(e) == DoubleType
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // the reference rejects dim mismatch at request validation
    // (proxy-side checks); truncating silently would return a wrong
    // distance, so fail loudly instead.
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    val leftIsFloat = elementType(left) == FloatType
    val rightIsFloat = elementType(right) == FloatType
    @inline def ax(i: Int): Double =
      if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
    @inline def bx(i: Int): Double =
      if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
    metric match {
      case Metric.L2 =>
        var acc = 0.0; var i = 0
        while (i < n) { val d = ax(i) - bx(i); acc += d * d; i += 1 }
        acc
      case Metric.IP =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += ax(i) * bx(i); i += 1 }
        acc
      case Metric.COSINE =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = ax(i); val y = bx(i)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val denom = math.sqrt(na * nb)
        if (denom == 0.0) 0.0 else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL =
      if (elementType(left) == FloatType) (a: String, i: String) => s"(double)$a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val getR =
      if (elementType(right) == FloatType) (a: String, i: String) => s"(double)$a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      metric match {
        case Metric.L2 =>
          val acc = ctx.freshName("acc")
          val d = ctx.freshName("d")
          s"""
             |if ($a.numElements() != $b.numElements()) {
             |  throw new IllegalArgumentException(
             |    "$prettyName: vector dimensions differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
             |}
             |int $n = $a.numElements();
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = ${getL(a, i)} - ${getR(b, i)};
             |  $acc += $d * $d;
             |}
             |${ev.value} = $acc;
           """.stripMargin
        case Metric.IP =>
          val acc = ctx.freshName("acc")
          s"""
             |if ($a.numElements() != $b.numElements()) {
             |  throw new IllegalArgumentException(
             |    "$prettyName: vector dimensions differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
             |}
             |int $n = $a.numElements();
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += ${getL(a, i)} * ${getR(b, i)};
             |}
             |${ev.value} = $acc;
           """.stripMargin
        case Metric.COSINE =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val denom = ctx.freshName("denom")
          s"""
             |if ($a.numElements() != $b.numElements()) {
             |  throw new IllegalArgumentException(
             |    "$prettyName: vector dimensions differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
             |}
             |int $n = $a.numElements();
             |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = ${getL(a, i)};
             |  double $y = ${getR(b, i)};
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |double $denom = java.lang.Math.sqrt($na * $nb);
             |${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
           """.stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the distance expressions. */
object VectorFunctions {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Squared L2 distance (lower is better; reference reports squared L2). */
  def l2(a: Column, b: Column): Column =
    col(VectorDistance(expr(a), expr(b), Metric.L2))

  /** Inner product (higher is better). */
  def ip(a: Column, b: Column): Column =
    col(VectorDistance(expr(a), expr(b), Metric.IP))

  /** Cosine similarity (higher is better). */
  def cosine(a: Column, b: Column): Column =
    col(VectorDistance(expr(a), expr(b), Metric.COSINE))

  def distance(a: Column, b: Column, metric: Metric.Value): Column =
    col(VectorDistance(expr(a), expr(b), metric))

  /** Register `vec_l2`, `vec_ip`, `vec_cosine` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def create(name: String, m: Metric.Value): Unit =
      reg.createOrReplaceTempFunction(
        name, es => VectorDistance(es(0), es(1), m), "built-in")
    create("vec_l2", Metric.L2)
    create("vec_ip", Metric.IP)
    create("vec_cosine", Metric.COSINE)
  }
}
