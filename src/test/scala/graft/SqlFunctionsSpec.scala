package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.plans.{GraftExtensions, GraftSqlFunctions}

/** The SQL-facing function surface: runtime registry registration, SQL
  * ⇔ Column-API parity (one implementation, two surfaces), idempotent
  * re-registration, arity validation, and the `spark.sql.extensions`
  * entry point.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("parse_market_cap via spark.sql matches the Column API exactly") {
    GraftSqlFunctions.register(spark)
    val inputs =
      Seq("32.42B", "760.88M", "297.82K", "3,371.44B", "1.5T", "", "n/a", "42")
    val viaSql = spark.sql(
      "SELECT parse_market_cap(mc) AS v FROM VALUES " +
        inputs.map(s => s"('$s')").mkString(",") + " AS t(mc)")
      .collect().map(r => Option(r.get(0)))
    val viaCol = inputs.toDF("mc")
      .select(Functions.parseMarketCap(col("mc")).as("v"))
      .collect().map(r => Option(r.get(0)))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(4).contains(1.5e12)) // 1.5T
    assert(viaSql(5).isEmpty)          // '' -> null
  }

  test("registration is idempotent") {
    GraftSqlFunctions.register(spark)
    GraftSqlFunctions.register(spark)
    assert(spark.sql("SELECT parse_market_cap('2K') AS v")
      .head().getDouble(0) == 2000.0)
  }

  test("wrong arity fails loudly at analysis") {
    GraftSqlFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT parse_market_cap('1K', '2K')").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument") ||
      e.getMessage.toLowerCase.contains("parse_market_cap"))
  }

  test("GraftExtensions injects every entry without error") {
    // the spark.sql.extensions path runs at session build; here we
    // exercise the injection callback itself against a fresh
    // SparkSessionExtensions (hosts pass the class name in config)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
