package graft.expr

import org.apache.spark.sql.functions.expr

import graft.{GraftSession, SparkSpec}

/** Differential fuzz: random predicates in the milvus expression grammar
  * are compiled by ExprCompiler AND mechanically translated to Spark SQL
  * (the grammars overlap on ranges/IN/LIKE/logic/arith up to `==` → `=`)
  * — both filters must select the identical row set. Seeded, so failures
  * reproduce.
  */
class ExprFuzzSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = GraftSession.table(spark, sfDir, "lineitem")
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_discount", "l_returnflag", "l_linestatus")
    .cache()

  private val rnd = new scala.util.Random(20260812L)

  private def numLeaf(): String = {
    val (c, lo, hi) = rnd.nextInt(4) match {
      case 0 => ("l_quantity", 1, 50)
      case 1 => ("l_partkey", 1, 2000)
      case 2 => ("l_suppkey", 1, 100)
      case 3 => ("l_linenumber", 1, 7)
    }
    val v = lo + rnd.nextInt(hi - lo + 1)
    rnd.nextInt(6) match {
      case 0 => s"$c < $v"
      case 1 => s"$c <= $v"
      case 2 => s"$c > $v"
      case 3 => s"$c >= $v"
      case 4 => s"$c == $v"
      case 5 => s"($c % ${2 + rnd.nextInt(9)}) == ${rnd.nextInt(2)}"
    }
  }

  private def strLeaf(): String = rnd.nextInt(4) match {
    case 0 => s"""l_returnflag == "${Seq("A", "N", "R")(rnd.nextInt(3))}""""
    case 1 => s"""l_linestatus in ["O", "F"]"""
    case 2 => s"""l_returnflag like "${Seq("A", "N", "R")(rnd.nextInt(3))}%""""
    case 3 => s"""l_returnflag != "N""""
  }

  private def node(depth: Int): String = {
    if (depth == 0) { if (rnd.nextBoolean()) numLeaf() else strLeaf() }
    else rnd.nextInt(5) match {
      case 0 => s"(${node(depth - 1)}) and (${node(depth - 1)})"
      case 1 => s"(${node(depth - 1)}) or (${node(depth - 1)})"
      case 2 => s"not (${node(depth - 1)})"
      case 3 => s"${10 + rnd.nextInt(20)} < l_quantity <= ${30 + rnd.nextInt(20)}"
      case _ => node(depth - 1)
    }
  }

  /** Mechanical milvus-grammar → Spark-SQL translation. */
  private def toSql(e: String): String = {
    var s = e.replace("==", "=")
    // two-sided range `a < col <= b` → conjunction
    s = """(\d+) < (l_\w+) <= (\d+)""".r.replaceAllIn(s,
      m => s"(${m.group(2)} > ${m.group(1)} AND ${m.group(2)} <= ${m.group(3)})")
    s = s.replace("in [", "in (").replace("\"]", "\")").replace("\", \"", "\", \"")
    s = s.replace("]", ")")
    s.replace("\"", "'")
  }

  test("200 random grammar predicates match their Spark SQL translation") {
    var nonTrivial = 0
    for (i <- 0 until 200) {
      val eStr = node(2 + rnd.nextInt(2))
      val sql = toSql(eStr)
      val viaCompiler = li.filter(ExprCompiler.compile(eStr, li))
        .select($"l_orderkey", $"l_linenumber").as[(Long, Long)].collect().toSet
      val viaSql = li.filter(expr(sql))
        .select($"l_orderkey", $"l_linenumber").as[(Long, Long)].collect().toSet
      assert(viaCompiler == viaSql,
        s"#$i mismatch (${viaCompiler.size} vs ${viaSql.size}):\n  expr: $eStr\n  sql:  $sql")
      if (viaCompiler.nonEmpty && viaCompiler.size != li.count()) nonTrivial += 1
    }
    // sanity: the generator must produce mostly selective predicates
    assert(nonTrivial > 100, s"only $nonTrivial non-trivial predicates generated")
  }

  // ---- JSON + array leaf fuzz (the kernels the scalar fuzz can't reach) ----

  private lazy val jdf = (0L until 400L).map { i =>
    (i,
      s"""{"a": ${i % 50}, "b": "v${i % 7}", "arr": [${i % 5}, ${i % 11}], """ +
        s""""nested": {"x": ${i % 13}}${if (i % 9 == 0) "" else s""", "opt": ${i % 3}"""}}""",
      Seq(i % 5, i % 11, i % 17))
  }.toDF("id", "js", "arr").cache()

  private def jsonLeaf(): (String, String) = rnd.nextInt(6) match {
    case 0 =>
      val v = rnd.nextInt(50)
      (s"""js["a"] > $v""", s"CAST(get_json_object(js, '$$.a') AS LONG) > $v")
    case 1 =>
      val v = rnd.nextInt(7)
      (s"""js["b"] == "v$v"""", s"get_json_object(js, '$$.b') = 'v$v'")
    case 2 =>
      val v = rnd.nextInt(13)
      (s"""js["nested"]["x"] <= $v""",
        s"CAST(get_json_object(js, '$$.nested.x') AS LONG) <= $v")
    case 3 =>
      ("""exists js["opt"]""", "get_json_object(js, '$.opt') IS NOT NULL")
    case 4 =>
      val v = rnd.nextInt(11)
      (s"""js["arr"][1] == $v""", s"CAST(get_json_object(js, '$$.arr[1]') AS LONG) = $v")
    case 5 =>
      val v = rnd.nextInt(17)
      (s"array_contains(arr, $v)", s"array_contains(arr, ${v}L)")
  }

  test("150 random JSON/array predicates match their Spark SQL translation") {
    for (i <- 0 until 150) {
      val leaves = Seq.fill(1 + rnd.nextInt(3))(jsonLeaf())
      val ops = Seq.fill(leaves.size - 1)(if (rnd.nextBoolean()) "and" else "or")
      def joinUp(parts: Seq[String], o: Seq[String]): String =
        parts.tail.zip(o).foldLeft(parts.head) { case (acc, (p, op)) => s"($acc) $op ($p)" }
      val eStr = joinUp(leaves.map(_._1), ops)
      val sql = joinUp(leaves.map(_._2), ops.map(_.toUpperCase))
      val viaCompiler = jdf.filter(ExprCompiler.compile(eStr, jdf, jsonColumns = Set("js")))
        .select($"id").as[Long].collect().toSet
      val viaSql = jdf.filter(expr(sql)).select($"id").as[Long].collect().toSet
      assert(viaCompiler == viaSql,
        s"#$i mismatch (${viaCompiler.size} vs ${viaSql.size}):\n  expr: $eStr\n  sql:  $sql")
    }
  }

  // ---- deep 3VL composition fuzz over NULLABLE fields (#46972's
  // false-or-false class: UNKNOWN must compose correctly through
  // arbitrarily nested AND/OR/NOT, never collapsing to TRUE) ----

  private lazy val ndf = (0L until 300L).map { i =>
    def opt[T](v: T, mod: Int): Option[T] = if (i % mod == 0) None else Some(v)
    (i, opt(i % 50, 3), opt((i % 40).toDouble / 2.0, 4),
      opt(if (i % 2 == 0) "even" else "odd", 5), opt(i % 2 == 0, 6))
  }.toDF("id", "nv", "nf", "ns", "nb").cache()

  private def nullLeaf(): (String, String) = rnd.nextInt(7) match {
    case 0 => val v = rnd.nextInt(50); (s"nv > $v", s"nv > $v")
    case 1 => val v = rnd.nextInt(50); (s"nv <= $v", s"nv <= $v")
    case 2 => val v = rnd.nextInt(20); (s"nf >= $v.0", s"nf >= $v.0")
    case 3 => (s"""ns == "even"""", "ns = 'even'")
    case 4 => ("nb == true", "nb = true")
    case 5 => ("nv is null", "nv IS NULL")
    case 6 => ("ns is not null", "ns IS NOT NULL")
  }

  private def nullTree(depth: Int): (String, String) =
    if (depth == 0) nullLeaf()
    else rnd.nextInt(4) match {
      case 0 =>
        val (le, ls) = nullTree(depth - 1); val (re, rs) = nullTree(depth - 1)
        (s"($le) and ($re)", s"($ls) AND ($rs)")
      case 1 =>
        val (le, ls) = nullTree(depth - 1); val (re, rs) = nullTree(depth - 1)
        (s"($le) or ($re)", s"($ls) OR ($rs)")
      case 2 =>
        val (ce, cs) = nullTree(depth - 1)
        (s"not ($ce)", s"NOT ($cs)")
      case _ => nullTree(depth - 1)
    }

  test("200 deep nullable predicate trees compose UNKNOWN correctly") {
    for (i <- 0 until 200) {
      val (eStr, sql) = nullTree(3 + rnd.nextInt(2))
      val viaCompiler = ndf.filter(ExprCompiler.compile(eStr, ndf))
        .select($"id").as[Long].collect().toSet
      val viaSql = ndf.filter(expr(sql)).select($"id").as[Long].collect().toSet
      assert(viaCompiler == viaSql,
        s"#$i 3VL mismatch (${viaCompiler.size} vs ${viaSql.size}):\n" +
          s"  expr: $eStr\n  sql:  $sql")
    }
  }

  // ---- LIKE pattern fuzz vs an INDEPENDENT token-model matcher ----
  // (the pattern_match.go escape model re-derived as a direct recursive
  // interpreter here — it shares NO code with the compile's
  // classification or with Catalyst's Like kernel)

  test("200 random LIKE patterns match an independent token-model matcher") {
    val lrnd = new scala.util.Random(20260815L)
    val alphabet = "ab%_\\"
    def randStr(maxLen: Int): String =
      (0 until lrnd.nextInt(maxLen + 1))
        .map(_ => alphabet(lrnd.nextInt(alphabet.length))).mkString
    val values = (0 until 60).map(i => (i.toLong, randStr(6))) :+
      ((60L, null: String))
    val df = values.toDF("id", "s").cache()
    def tokens(p: String): Option[List[(Char, Boolean)]] = {
      var esc = false; val out = List.newBuilder[(Char, Boolean)]
      p.foreach { c =>
        if (esc) { out += ((c, false)); esc = false }
        else if (c == '\\') esc = true
        else out += ((c, c == '%' || c == '_'))
      }
      if (esc) None else Some(out.result())
    }
    def matches(ts: List[(Char, Boolean)], s: String): Boolean = ts match {
      case Nil                  => s.isEmpty
      case ('%', true) :: rest  =>
        (0 to s.length).exists(k => matches(rest, s.substring(k)))
      case ('_', true) :: rest  => s.nonEmpty && matches(rest, s.tail)
      case (c, _) :: rest       => s.nonEmpty && s.head == c && matches(rest, s.tail)
    }
    var errors = 0
    for (i <- 0 until 200) {
      val pat = randStr(5)
      // deliver through the full string-literal + LIKE pipeline: double
      // every backslash for the lexer, so the LIKE layer sees `pat`
      val eStr = s"""s like "${pat.replace("\\", "\\\\")}""""
      tokens(pat) match {
        case None =>
          intercept[ExprCompiler.CompileError](
            df.filter(ExprCompiler.compile(eStr, df)).count())
          errors += 1
        case Some(ts) =>
          val got = df.filter(ExprCompiler.compile(eStr, df))
            .select($"id").as[Long].collect().toSet
          val want = values.collect {
            case (id, s) if s != null && matches(ts, s) => id
          }.toSet
          assert(got == want,
            s"#$i pattern [$pat]: engine=$got oracle=$want")
      }
    }
    assert(errors > 0, "generator never produced a dangling escape")
  }

  test("150 LIKE patterns delivered through randomized escape encodings") {
    // same token-model oracle as above, but every pattern char reaches
    // the lexer through a randomly chosen string-literal escape
    // spelling (\xHH, 3-digit octal, \uHHHH, or plain). Pins that the
    // Unquote layer runs BEFORE wildcard classification: an
    // escape-encoded '%' (\x25) is still a WILDCARD, because the LIKE
    // layer only ever sees the cooked string (reference order:
    // convertEscapeSingle, then scanLikePattern).
    val lrnd = new scala.util.Random(20260816L)
    val alphabet = "ab%_\\"
    def randStr(maxLen: Int): String =
      (0 until lrnd.nextInt(maxLen + 1))
        .map(_ => alphabet(lrnd.nextInt(alphabet.length))).mkString
    val values = (0 until 60).map(i => (i.toLong, randStr(6)))
    val df = values.toDF("id", "s").cache()
    def tokens(p: String): Option[List[(Char, Boolean)]] = {
      var esc = false; val out = List.newBuilder[(Char, Boolean)]
      p.foreach { c =>
        if (esc) { out += ((c, false)); esc = false }
        else if (c == '\\') esc = true
        else out += ((c, c == '%' || c == '_'))
      }
      if (esc) None else Some(out.result())
    }
    def matches(ts: List[(Char, Boolean)], s: String): Boolean = ts match {
      case Nil                 => s.isEmpty
      case ('%', true) :: rest =>
        (0 to s.length).exists(k => matches(rest, s.substring(k)))
      case ('_', true) :: rest => s.nonEmpty && matches(rest, s.tail)
      case (c, _) :: rest      => s.nonEmpty && s.head == c && matches(rest, s.tail)
    }
    // spell one target char as raw lexer text (spliced "\\"+"u..." so
    // scalac's own \u pass can't pre-cook the test input)
    def spell(c: Char): String = c match {
      case 'a'  => Seq("a", "\\x61", "\\141", "\\" + "u0061")(lrnd.nextInt(4))
      case 'b'  => Seq("b", "\\x62", "\\142")(lrnd.nextInt(3))
      case '%'  => Seq("%", "\\x25", "\\045")(lrnd.nextInt(3))
      case '_'  => Seq("_", "\\x5F", "\\137")(lrnd.nextInt(3))
      case '\\' => Seq("\\\\", "\\x5C", "\\134")(lrnd.nextInt(3))
      case o    => o.toString
    }
    var errors = 0
    for (i <- 0 until 150) {
      val pat = randStr(5)
      val eStr = "s like \"" + pat.flatMap(spell) + "\""
      tokens(pat) match {
        case None =>
          intercept[ExprCompiler.CompileError](
            df.filter(ExprCompiler.compile(eStr, df)).count())
          errors += 1
        case Some(ts) =>
          val got = df.filter(ExprCompiler.compile(eStr, df))
            .select($"id").as[Long].collect().toSet
          val want = values.collect {
            case (id, s) if matches(ts, s) => id
          }.toSet
          assert(got == want,
            s"#$i pattern [$pat] as [$eStr]: engine=$got oracle=$want")
      }
    }
    assert(errors > 0, "generator never produced a dangling escape")
  }
}
