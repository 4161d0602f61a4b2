package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF_SQ8-style scalar quantization: per-dimension linear 8-bit codes
  * (reference: knowhere IVF_SQ8 in the index-type list,
  * tests/integration/util_index.go:32-46 — trains per-dim min/max, stores
  * code_i = round(255·(x_i−min_i)/(max_i−min_i)) as one byte, 4× smaller
  * than float32).
  *
  * Spark-first: training is ONE posexplode + hash agg (partial agg
  * collapses to ≤dim rows per task before the shuffle — trivially
  * 100 TB-safe); the trained bounds ride inside codegen'd encode/decode
  * expressions (task-binary broadcast), so encoding is map-only and the
  * packed bytes never shuffle. Search = approximate scan over decoded
  * codes + exact refine of a shortlist (same shape as [[PqIndex]]);
  * shortlist ≥ corpus ⇒ exact.
  */
object Sq8Index {

  /** Per-dimension quantization bounds; diffs(i) = max_i − min_i. */
  case class Model(mins: Array[Float], diffs: Array[Float]) {
    def dim: Int = mins.length
  }

  /** Train per-dim min/max. The groupBy key space is exactly `dim`, so
    * map-side partial aggregation reduces each task's output to ≤dim
    * rows regardless of corpus size.
    */
  def train(corpus: DataFrame, vecCol: String): Model = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("_pos", "_x")))
      .groupBy(col("_pos"))
      .agg(min(col("_x")).as("_min"), max(col("_x")).as("_max"))
      .collect()
    val dim = rows.length
    val mins = new Array[Float](dim)
    val diffs = new Array[Float](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      mins(p) = r.getFloat(1)
      diffs(p) = r.getFloat(2) - r.getFloat(1)
    }
    Model(mins, diffs)
  }

  def encode(model: Model, vec: Column): Column =
    ColumnBridge.column(Sq8Codec(ColumnBridge.expression(vec), model, encode = true))

  def decode(model: Model, bytes: Column): Column =
    ColumnBridge.column(Sq8Codec(ColumnBridge.expression(bytes), model, encode = false))

  /** SQ8 search: approximate L2 over decoded codes selects a shortlist,
    * exact distances on the original vectors re-rank it. Queries are
    * request parameters (nq·dim floats) — broadcast, never shuffled.
    */
  def searchRefined(encoded: DataFrame, idCol: String, codesCol: String,
      vecCol: String, model: Model, queries: Seq[(Long, Array[Float])],
      k: Int, shortlist: Int, roundTo: Option[Int] = None): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qDf = broadcast(queries.map { case (qid, v) => (qid, v.toSeq) }.toDF("qid", "_qvec"))
    val approx = encoded
      .withColumn("_dec", decode(model, col(codesCol)))
      .crossJoin(qDf)
      .withColumn("_score", graft.functions.VectorFunctions.l2(col("_dec"), col("_qvec")))
    val candidates0 = VectorSearch
      .reduceTopK(approx, idCol, "qid", graft.functions.Metric.L2, shortlist, Seq(idCol))
      .select(col("qid"), col(idCol))
    // see PqIndex.searchRefined: don't force a broadcast when the
    // shortlist is corpus-sized (the exhaustive/oracle configuration)
    val candidates =
      if (queries.size.toLong * shortlist <= 1000000L) broadcast(candidates0)
      else candidates0
    val raw = graft.functions.VectorFunctions.l2(col(vecCol), col("_qvec"))
    val exact = candidates
      .join(encoded.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(qDf, "qid")
      .withColumn("_score", roundTo.map(d => round(raw, d)).getOrElse(raw))
    VectorSearch.reduceTopK(exact, idCol, "qid", graft.functions.Metric.L2, k, Seq(idCol))
  }
}

/** Codegen'd SQ8 encode (array<float> → binary) / decode (binary →
  * array<float>); bounds are plan-time constants referenced from the
  * generated code.
  */
case class Sq8Codec(child: Expression, model: Sq8Index.Model, encode: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    if (encode) BinaryType else ArrayType(FloatType, containsNull = false)

  override def prettyName: String = if (encode) "sq8_encode" else "sq8_decode"

  override def checkInputDataTypes(): TypeCheckResult = (encode, child.dataType) match {
    case (true, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (false, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (_, other) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot accept ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    if (encode) Sq8Codec.encodeBytes(input.asInstanceOf[ArrayData], model.mins, model.diffs)
    else Sq8Codec.decodeBytes(input.asInstanceOf[Array[Byte]], model.mins, model.diffs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", model.mins, "float[]")
    val diffsRef = ctx.addReferenceObj("diffs", model.diffs, "float[]")
    val fn = if (encode) "encodeBytes" else "decodeBytes"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.operators.Sq8Codec$$.MODULE$$.$fn($in, $minsRef, $diffsRef);")
  }

  // content equality — Model holds Array fields, which compare by
  // reference under case-class equality (see SrpBands)
  override def equals(o: Any): Boolean = o match {
    case t: Sq8Codec => t.encode == encode && t.child == child &&
      java.util.Arrays.equals(t.model.mins, model.mins) &&
      java.util.Arrays.equals(t.model.diffs, model.diffs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Boolean.valueOf(encode),
      Integer.valueOf(java.util.Arrays.hashCode(model.mins)),
      Integer.valueOf(java.util.Arrays.hashCode(model.diffs)))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Sq8Codec {

  def encodeBytes(arr: ArrayData, mins: Array[Float], diffs: Array[Float]): Array[Byte] = {
    val n = arr.numElements()
    require(n == mins.length, s"sq8_encode: dim $n != trained dim ${mins.length}")
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val d = diffs(i)
      val code = if (d <= 0f) 0
        else math.max(0, math.min(255,
          math.round(255.0 * (arr.getFloat(i) - mins(i)) / d).toInt))
      out(i) = code.toByte
      i += 1
    }
    out
  }

  def decodeBytes(bytes: Array[Byte], mins: Array[Float], diffs: Array[Float]): ArrayData = {
    require(bytes.length == mins.length,
      s"sq8_decode: dim ${bytes.length} != trained dim ${mins.length}")
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = mins(i) + ((bytes(i) & 0xff) / 255.0f) * diffs(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}
