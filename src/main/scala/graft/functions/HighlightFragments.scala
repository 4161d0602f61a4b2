package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fragment extraction for the lexical highlighter (reference:
  * LexicalHighlighter's pre_tags / post_tags / fragment_offset /
  * fragment_size / num_of_fragments options, highlighter.go:27-39;
  * semantics pinned by test_milvus_client_highlighter.py:236-420):
  *
  *   - a fragment starts `fragmentOffset` chars before a match (clamped
  *     to the document start) and spans `fragmentSize` chars from the
  *     match start — never less than the whole matched token;
  *   - a later match that starts inside the current span joins the SAME
  *     fragment and extends it by its own size window (the reference's
  *     size=100 case merges every match of the document into one
  *     fragment);
  *   - an already-consumed match inside a later fragment's leading
  *     context appears UNTAGGED (fragment_offset=100 case);
  *   - matched spans wrap in (pre, post) tag PAIRS cycling by the
  *     GLOBAL match ordinal (the multiple-tags case);
  *   - at most `numFragments` fragments return; 0 means none.
  *
  * Post-search shape: this runs over k result rows, not the corpus scan
  * — interpreted eval (CodegenFallback) is the right cost point, same
  * as the geo refinement kernels.
  */
case class HighlightFragments(
    child: Expression,
    pattern: String,
    preTags: Seq[String],
    postTags: Seq[String],
    fragmentOffset: Int,
    fragmentSize: Int,
    numFragments: Int)
    extends UnaryExpression with CodegenFallback {

  require(preTags.nonEmpty && postTags.nonEmpty, "tags cannot be empty lists")
  require(fragmentOffset >= 0, s"invalid fragment_offset: $fragmentOffset")
  require(fragmentSize > 0, s"invalid fragment_size: $fragmentSize")
  require(numFragments >= 0, s"invalid num_of_fragments: $numFragments")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "highlight_fragments"

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    if (numFragments > 0) {
      val m = compiled.matcher(text)
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (m.find()) spans += ((m.start, m.end))
      var i = 0
      while (i < spans.length && out.length < numFragments) {
        val (s0, e0) = spans(i)
        val fragStart = math.max(0, s0 - fragmentOffset)
        var fragEnd = math.max(e0, s0 + fragmentSize)
        var j = i + 1
        while (j < spans.length && spans(j)._1 < fragEnd) {
          val (s1, e1) = spans(j)
          fragEnd = math.max(fragEnd, math.max(e1, s1 + fragmentSize))
          j += 1
        }
        fragEnd = math.min(fragEnd, text.length)
        val sb = new java.lang.StringBuilder
        var pos = fragStart
        var k = i
        while (k < j) {
          val (ms, me) = spans(k)
          sb.append(text, pos, ms)
          sb.append(preTags(k % preTags.length))
          sb.append(text, ms, me)
          sb.append(postTags(k % postTags.length))
          pos = me
          k += 1
        }
        sb.append(text, pos, fragEnd)
        out += UTF8String.fromString(sb.toString)
        i = j
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): HighlightFragments =
    copy(child = newChild)
}
