package graft

import java.lang.reflect.Modifier

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the CacheManager equality lesson: a custom
  * Catalyst expression holding `Array` fields (directly or inside a
  * model param) compares by REFERENCE under synthetic case-class
  * equality, which breaks `sameResult` plan canonicalization — two
  * submissions of the identical query then register fresh cache
  * entries per run instead of reusing one (a real leak+recompute class
  * caught at sf1). Every such expression must override equals/hashCode
  * with content equality.
  *
  * This spec SCANS the compiled classes for concrete [[Expression]]
  * subclasses in graft whose constructor params carry arrays (one
  * level deep, so model case classes count), then re-constructs each
  * twice with content-equal but reference-distinct arguments and
  * asserts the pair is equal with equal hash codes. A NEW
  * array-holding expression is picked up automatically; if its
  * constructor can't be satisfied generically, add a curated builder
  * below — the spec fails loudly rather than skipping it.
  */
class ExpressionEqualitySpec extends AnyFunSuite {

  private val classesRoot = new java.io.File("target/scala-2.13/classes")

  private def classNames(dir: java.io.File, pkg: String): Seq[String] = {
    val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    fs.flatMap { f =>
      if (f.isDirectory) classNames(f, s"$pkg${f.getName}.")
      else if (f.getName.endsWith(".class"))
        Seq(pkg + f.getName.stripSuffix(".class"))
      else Nil
    }
  }

  /** One level deep: the param is an array, or a (non-JDK) type whose
    * declared fields include one.
    */
  private def holdsArray(t: Class[_]): Boolean =
    t.isArray || (t.getName.startsWith("graft.") &&
      t.getDeclaredFields.exists(_.getType.isArray))

  /** Fresh, deterministic argument per call — content-equal across
    * calls, never reference-equal for arrays/objects.
    */
  private def dummyFor(t: Class[_]): AnyRef = t match {
    case c if classOf[Expression].isAssignableFrom(c) => Literal(1)
    case c if c == classOf[Int] || c == classOf[java.lang.Integer] =>
      Integer.valueOf(2)
    case c if c == classOf[Long] || c == classOf[java.lang.Long] =>
      java.lang.Long.valueOf(2L)
    case c if c == classOf[Double] || c == classOf[java.lang.Double] =>
      java.lang.Double.valueOf(0.5)
    case c if c == classOf[Float] || c == classOf[java.lang.Float] =>
      java.lang.Float.valueOf(0.5f)
    case c if c == classOf[Boolean] || c == classOf[java.lang.Boolean] =>
      java.lang.Boolean.TRUE
    case c if c == classOf[String] => "x"
    case c if c.isArray =>
      val n = 2
      val arr = java.lang.reflect.Array.newInstance(c.getComponentType, n)
      (0 until n).foreach(i =>
        java.lang.reflect.Array.set(arr, i, dummyFor(c.getComponentType)))
      arr
    case c if classOf[Seq[_]].isAssignableFrom(c) => Seq(Literal(1))
    case c => // e.g. a model case class: recurse through its constructor
      val ctor = c.getConstructors.maxBy(_.getParameterCount)
      ctor.newInstance(ctor.getParameterTypes.map(dummyFor): _*)
        .asInstanceOf[AnyRef]
  }

  test("array-holding graft expressions keep content equality under re-construction") {
    val names = classNames(new java.io.File(classesRoot, "graft"), "graft.")
    assert(names.nonEmpty, s"no compiled classes under $classesRoot — run from sbt")
    val exprClasses = names.flatMap { n =>
      try {
        val c = Class.forName(n)
        if (classOf[Expression].isAssignableFrom(c) && !c.isInterface &&
          !Modifier.isAbstract(c.getModifiers)) Some(c)
        else None
      } catch { case _: Throwable => None }
    }
    assert(exprClasses.size >= 10, s"scan degraded: only ${exprClasses.size} " +
      "graft Expression classes found")
    val arrayHolding = exprClasses.filter(
      _.getConstructors.exists(_.getParameterTypes.exists(holdsArray)))
    // the known offenders must be in the scan — guards the scan itself
    val known = Set("SrpBands", "NearestCentroids", "NearestBinaryCentroids",
      "Sq8Codec", "AnisotropicAssign")
    val found = arrayHolding.map(_.getSimpleName).toSet
    assert(known.subsetOf(found),
      s"scan lost known array-holding expressions: ${known -- found}")
    // curated builders for constructors generic dummies can't satisfy;
    // each returns a FRESH instance per call
    val curated: Map[String, () => AnyRef] = Map.empty
    arrayHolding.foreach { c =>
      def mk(): AnyRef = curated.get(c.getSimpleName) match {
        case Some(b) => b()
        case None =>
          val ctor = c.getConstructors.maxBy(_.getParameterCount)
          try ctor.newInstance(ctor.getParameterTypes.map(dummyFor): _*)
            .asInstanceOf[AnyRef]
          catch {
            case e: Throwable => fail(
              s"${c.getName} could not be constructed generically — add a " +
                s"curated builder to ExpressionEqualitySpec: $e")
          }
      }
      val a = mk()
      val b = mk()
      assert(a == b, s"${c.getName}: two content-equal constructions are not " +
        "equal — override equals with content (Arrays.deepEquals) equality " +
        "or sameResult/CacheManager reuse breaks (the r7 sf1 leak)")
      assert(a.hashCode == b.hashCode,
        s"${c.getName}: equal instances hash differently — override hashCode " +
          "with Arrays.deepHashCode over array fields")
    }
    info(s"verified ${arrayHolding.size} array-holding expressions: " +
      arrayHolding.map(_.getSimpleName).sorted.mkString(", "))
  }
}
