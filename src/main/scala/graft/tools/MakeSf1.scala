package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Derive an sf1-shaped dataset from the driver's sf0.1 tables by 10×
  * replication with per-copy key shifts (VERDICT r6 Next #6: the
  * non-dedup/vector 130+ queries have never run above sf0.1). The fixed
  * dimension tables (region, nation) are copied as-is — TPC-H scaling
  * keeps them constant — and every fact-table key shifts consistently
  * per copy (orderkey/custkey/partkey/suppkey together), so join
  * selectivity and per-key row counts are preserved while the corpus
  * grows 10×. `documents` text is Caesar-shifted per copy and
  * `embeddings` perturbed per copy, the BenchScale device that keeps
  * the near-dup pair structure per-copy instead of exploding it
  * quadratically. Output under /tmp (testdata is read-only).
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val spark = graft.GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-make-sf1")
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // one shift unit per key domain: max+1 of the base table
    def keyShift(df: DataFrame, keyCol: String): Long =
      df.agg(max(col(keyCol))).head().getLong(0) + 1L

    val custShift = keyShift(t("customer"), "c_custkey")
    val orderShift = keyShift(t("orders"), "o_orderkey")
    val partShift = keyShift(t("part"), "p_partkey")
    val suppShift = keyShift(t("supplier"), "s_suppkey")
    val eventShift = keyShift(t("events"), "event_id")
    val userShift = keyShift(t("events"), "user_id")
    val docShift = keyShift(t("documents"), "doc_id")
    val vecShift = keyShift(t("embeddings"), "vec_id")

    def replicated(base: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(c => per(base, c)).reduce(_ unionByName _)

    def shifted(c: Int, colName: String, unit: Long) =
      (col(colName) + lit(c * unit)).as(colName)

    val abc = "abcdefghijklmnopqrstuvwxyz"

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> t("region"),
      "nation" -> t("nation"),
      "customer" -> replicated(t("customer")) { (d, c) =>
        d.select(shifted(c, "c_custkey", custShift), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      },
      "orders" -> replicated(t("orders")) { (d, c) =>
        d.select(shifted(c, "o_orderkey", orderShift),
          shifted(c, "o_custkey", custShift), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      },
      "lineitem" -> replicated(t("lineitem")) { (d, c) =>
        d.select(shifted(c, "l_orderkey", orderShift),
          shifted(c, "l_partkey", partShift),
          shifted(c, "l_suppkey", suppShift),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
      },
      "part" -> replicated(t("part")) { (d, c) =>
        d.select(shifted(c, "p_partkey", partShift), col("p_name"),
          col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
      },
      "supplier" -> replicated(t("supplier")) { (d, c) =>
        d.select(shifted(c, "s_suppkey", suppShift), col("s_name"),
          col("s_nationkey"), col("s_acctbal"))
      },
      "events" -> replicated(t("events")) { (d, c) =>
        d.select(shifted(c, "event_id", eventShift), col("ts"),
          shifted(c, "user_id", userShift), col("event_type"),
          col("value"), col("props"))
      },
      "documents" -> replicated(t("documents")) { (d, c) =>
        val s = abc.drop(c % 26) + abc.take(c % 26)
        d.select(shifted(c, "doc_id", docShift),
          translate(col("text"), abc, s).as("text"),
          col("lang"), col("source"), col("n_chars"))
      },
      "embeddings" -> replicated(t("embeddings")) { (d, c) =>
        // rotate dimensions per copy: a SCALED copy keeps its direction
        // (all copies would be exact cosine duplicates, multiplying the
        // true near-dup pair count by copies² — a workload change, not a
        // scale change); a dimension rotation decorrelates directions
        // while preserving norms, so the cosine pair structure stays
        // per-copy like the Caesar-shifted documents
        val dim = 64
        val rotated =
          if (c == 0) col("embedding")
          else concat(slice(col("embedding"), (c % dim) + 1, dim - (c % dim)),
            slice(col("embedding"), 1, c % dim))
        d.select(shifted(c, "vec_id", vecShift), rotated.as("embedding"),
          col("label"))
      })

    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $out/$name.parquet")
    }
    spark.stop()
  }
}
