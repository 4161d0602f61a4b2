package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Query-time aggregation retrieve (the reference's aggregation RPC
  * surface: proxy/task_query.go:560-604 parse/validate pipeline +
  * internal/agg/{aggregate.go,type_check.go,aggregate_util.go} +
  * internal/util/reduce/orderby/types.go).
  *
  * Output fields are aggregation expressions (`count(*)`, `sum(f)`,
  * `avg(f)`, `min(f)`, `max(f)` — case-insensitive, matched by the
  * reference's regex agg/aggregate.go:25) and/or group-by columns;
  * anything else is rejected with the reference's named error
  * (NewAggregationFieldMap, aggregate_util.go:544-560).
  *
  * Spark-first: the whole surface lowers to `groupBy().agg()` — Catalyst
  * plans a partial (map-side) HashAggregate before the shuffle and a
  * final one after, so at 100 TB the shuffle carries one partial row per
  * (partition × group), never the corpus. The reference hand-rolls the
  * same shape (segcore partial agg → proxy agg_reducer merge); here it
  * is the built-in operator. Result sizes are bounded by construction —
  * global aggregation is exactly one row, GROUP BY at most one row per
  * distinct key — which is why the reference exempts aggregation from
  * the empty-filter limit requirement (task_query.go:795-801).
  *
  * Return types follow the reference reducer (pinned by
  * test_query_aggregation.py test_different_sum_return_types /
  * test_avg_return_type) and are what Spark's own aggregates produce:
  * integer SUM → int64, float/double SUM → double, AVG → double always,
  * COUNT → int64, MIN/MAX → the field's own type.
  */
object QueryAgg {

  /** MatchAggregationExpression (agg/aggregate.go:25-37): anchored,
    * case-insensitive operator, `[\w*]*` parameter (ASCII word chars or
    * `*`), arbitrary inner whitespace. Returns (lowercased op, trimmed
    * parameter).
    */
  private val AggPattern =
    """(?i)^(sum|count|avg|min|max)\s*\(\s*([\w*]*)\s*\)$""".r

  def matchAgg(expression: String): Option[(String, String)] =
    AggPattern.findFirstMatchIn(expression).map(m =>
      (m.group(1).toLowerCase, m.group(2).trim))

  /** Reference schemapb type names for error messages. */
  private def typeName(dt: DataType, isJson: Boolean): String =
    if (isJson) "JSON"
    else dt match {
      case ByteType      => "Int8"
      case ShortType     => "Int16"
      case IntegerType   => "Int32"
      case LongType      => "Int64"
      case FloatType     => "Float"
      case DoubleType    => "Double"
      case StringType    => "VarChar"
      case BooleanType   => "Bool"
      case TimestampType => "Timestamptz"
      case _: ArrayType  => "Array"
      case other         => other.simpleString
    }

  /** ValidateAggFieldType (agg/type_check.go:8-56): count takes any
    * type; sum/avg numerics only; min/max numerics + varchar +
    * timestamptz. JSON-declared string fields are JSON, not VarChar.
    */
  def validateAggFieldType(op: String, dt: DataType, isJson: Boolean): Unit = {
    val ok = op match {
      case "count" => true
      case "sum" | "avg" => !isJson && (dt match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType => true
        case _ => false
      })
      case "min" | "max" => !isJson && (dt match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | StringType | TimestampType => true
        case _ => false
      })
      case _ => false
    }
    require(ok,
      s"aggregation operator $op does not support data type ${typeName(dt, isJson)}")
  }

  /** isSupportedGroupByFieldType (task_query.go:112-124): int8/16/32/64,
    * varchar, timestamptz — NOT bool, float, double, JSON, array, vector.
    */
  def isSupportedGroupByFieldType(dt: DataType, isJson: Boolean): Boolean =
    !isJson && (dt match {
      case ByteType | ShortType | IntegerType | LongType |
           StringType | TimestampType => true
      case _ => false
    })

  /** IsSortableType (orderby/types.go:213+). */
  private def isSortableType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | TimestampType => true
    case _ => false
  }

  /** ParseOrderByFields (orderby/types.go:106-180):
    * "field[:asc|desc[:nulls_first|nulls_last]]", default ASC, default
    * nulls placement PostgreSQL-style (ASC→NULLS LAST, DESC→NULLS
    * FIRST). Preceded by validateOrderByFieldsWithGroupBy
    * (task_query.go:167-225): with GROUP BY or aggregates, ORDER BY may
    * target only group-by columns, and an aggregate expression is
    * rejected by name — the reference defers that to a future release.
    */
  private[graft] def parseOrderBy(specs: Seq[String], schema: StructType,
      groups: Seq[String], hasAgg: Boolean): Seq[Column] = {
    val groupSet = groups.map(_.toLowerCase).toSet
    specs.map(_.trim).filter(_.nonEmpty).map { spec =>
      val parts = spec.split(":", -1)
      val fieldName = parts(0).trim
      if (hasAgg) {
        val lower = fieldName.toLowerCase
        if (matchAgg(lower).isDefined) throw new IllegalArgumentException(
          s"ORDER BY on aggregate expression '$lower' is not yet supported")
        require(groupSet(lower),
          s"ORDER BY field '$lower' is not valid: when using GROUP BY or " +
            "aggregates, ORDER BY can only reference GROUP BY columns. " +
            s"Valid targets are: ${groups.mkString("[", " ", "]")}")
      }
      val ascending = if (parts.length > 1) {
        parts(1).trim.toLowerCase match {
          case "desc" | "descending"     => false
          case "asc" | "ascending" | ""  => true
          case dir => throw new IllegalArgumentException(
            s"invalid order direction '$dir' for field '$fieldName', " +
              "must be 'asc' or 'desc'")
        }
      } else true
      val nullsFirst = if (parts.length > 2) {
        parts(2).trim.toLowerCase match {
          case "nulls_first" => true
          case "nulls_last"  => false
          case opt => throw new IllegalArgumentException(
            s"invalid null ordering '$opt', must be 'nulls_first' or 'nulls_last'")
        }
      } else !ascending
      val field = schema.fields.find(_.name == fieldName).getOrElse(
        throw new IllegalArgumentException(
          s"order_by field '$fieldName' does not exist in collection schema"))
      require(isSortableType(field.dataType),
        s"order_by field '$fieldName' has type " +
          s"${typeName(field.dataType, isJson = false)} which is not sortable")
      (ascending, nullsFirst) match {
        case (true, false)  => col(fieldName).asc_nulls_last
        case (true, true)   => col(fieldName).asc_nulls_first
        case (false, true)  => col(fieldName).desc_nulls_first
        case (false, false) => col(fieldName).desc_nulls_last
      }
    }
  }

  /** Backtick-quote an output name so `col` doesn't parse "sum(c2)". */
  private def named(n: String): Column = col("`" + n + "`")

  /** Run the aggregation retrieve over the (already filtered, already
    * MVCC-scoped) base rows. `jsonFields` marks declared-JSON string
    * columns; `excluded` hides system fields (the MVCC timestamp) from
    * the addressable schema.
    */
  def run(base: DataFrame, outputFields: Seq[String],
      groupByFields: Seq[String], orderByFields: Seq[String], limit: Int,
      jsonFields: Set[String] = Set.empty,
      excluded: Set[String] = Set.empty): DataFrame = {
    val schema = StructType(base.schema.fields.filterNot(f => excluded(f.name)))
    def fieldOf(n: String): Option[StructField] = schema.fields.find(_.name == n)

    // translateGroupByFieldIds (task_query.go:138-161)
    val groups = groupByFields.map(_.trim)
    groups.foreach { g =>
      val f = fieldOf(g).getOrElse(
        throw new IllegalArgumentException(s"field $g not exist"))
      require(isSupportedGroupByFieldType(f.dataType, jsonFields(g)),
        s"group by field $g has unsupported data type " +
          typeName(f.dataType, jsonFields(g)))
    }
    val groupSet = groups.toSet

    // translateOutputFields agg branch (proxy/util.go:1686-1712) +
    // NewAggregationFieldMap membership rule (aggregate_util.go:544-560)
    val outs: Seq[(String, Option[Column])] = outputFields.map(_.trim).map { o =>
      matchAgg(o) match {
        case Some((op, "*")) =>
          require(op == "count",
            s"$op(*) is not supported, only count(*) is allowed")
          // count(*) counts entities regardless of nulls
          o -> Some(count(lit(1)).as(o))
        case Some((op, fname)) =>
          val f = fieldOf(fname).getOrElse(throw new IllegalArgumentException(
            s"target field $fname for aggregation:$op does not exist"))
          validateAggFieldType(op, f.dataType, jsonFields(fname))
          val c = op match {
            case "count" => count(col(fname)) // excludes nulls
            case "sum"   => sum(col(fname))   // int→int64, float→double
            case "avg"   => avg(col(fname)).cast(DoubleType) // always double
            case "min"   => min(col(fname))
            case "max"   => max(col(fname))
          }
          o -> Some(c.as(o))
        case None =>
          // a bare column is legal ONLY as a group-by key
          if (!groupSet(o)) {
            if (groups.nonEmpty) throw new IllegalArgumentException(
              s"output field '$o' is not allowed: when using GROUP BY, " +
                "output_fields can only contain group_by fields " +
                s"(${groups.mkString("[", " ", "]")}) or aggregation expressions")
            else throw new IllegalArgumentException(
              s"output field '$o' is not allowed: when using aggregation " +
                "functions (e.g., count(*)), output_fields can only contain " +
                "aggregation expressions, not regular columns")
          }
          o -> None
      }
    }
    require(outs.nonEmpty, "output_fields must not be empty")
    val aggExprs = outs.flatMap(_._2)

    // validate ORDER BY BEFORE executing, matching the reference's
    // validate-then-translate order (task_query.go:575-589)
    val hasAgg = groups.nonEmpty || aggExprs.nonEmpty
    val orderCols = parseOrderBy(orderByFields, schema, groups, hasAgg)

    val aggregated =
      if (groups.isEmpty) base.agg(aggExprs.head, aggExprs.tail: _*)
      else if (aggExprs.isEmpty)
        // group keys only: a distinct over the keys (one row per group)
        base.select(groups.map(col): _*).distinct()
      else base.groupBy(groups.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)

    // sort BEFORE projecting: a group-by key is a valid ORDER BY target
    // even when it is not an output field
    // (test_group_by_field_not_required_in_output_fields)
    val sorted =
      if (orderCols.nonEmpty) aggregated.orderBy(orderCols: _*) else aggregated
    // project to the user's output order under the ORIGINAL names
    val projected = sorted.select(outs.map(o => named(o._1)): _*)
    if (limit > 0) projected.limit(limit) else projected
  }
}
