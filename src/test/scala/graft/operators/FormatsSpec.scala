package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Multi-format source/sink coverage (SURVEY §2B scans row): the engine's
  * tables round-trip through JSON lines and CSV with schemas intact and
  * values equal to the parquet source of truth. */
class FormatsSpec extends SparkSpec {

  private def withTempDir[A](f: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    try f(dir) finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("lineitem round-trips through ORC (the second columnar format)") {
    withTempDir { dir =>
      val src = Tables.load(spark, sfDir, "lineitem")
      src.write.orc(s"$dir/li_orc")
      val back = spark.read.orc(s"$dir/li_orc")
      assert(back.schema == src.schema)
      assert(back.count() == src.count())
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
      // pushdown parity with parquet: ORC scans also take predicates
      val f = back.filter(col("l_quantity") > 45)
      val plan = f.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("GreaterThan(l_quantity"), plan.take(600))
    }
  }

  test("documents round-trip through JSON lines") {
    withTempDir { dir =>
      val src = Tables.load(spark, sfDir, "documents")
      src.write.json(s"$dir/docs_json")
      val back = spark.read.schema(src.schema).json(s"$dir/docs_json")
      assert(back.schema == src.schema)
      assert(back.count() == src.count())
      // value-exact: anti-join in both directions is empty
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    }
  }

  test("customer round-trips through CSV with explicit schema") {
    withTempDir { dir =>
      val src = Tables.load(spark, sfDir, "customer")
      src.write.option("header", "true").csv(s"$dir/cust_csv")
      val back = spark.read
        .option("header", "true")
        .schema(src.schema)
        .csv(s"$dir/cust_csv")
      assert(back.schema == src.schema)
      assert(back.count() == src.count())
      val joined = back.agg(
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")).head().getDouble(0)
      val expected = src.agg(
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")).head().getDouble(0)
      assert(joined == expected)
    }
  }
}
