package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ColumnLineage

/** [[ColumnLineage]]'s walk semantics on the shapes the registered query
  * does not reach: window expressions, attribute passthrough under
  * filters/sorts, multi-hop aliases, and sourceless outputs.
  */
class LineageSpec extends AnyFunSuite {
  import SparkTestBase._

  private def factsDir(): String = {
    import spark.implicits._
    val tmp = graft.util.TempDirs.create("graft_lineage_")
    Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
      .toDF("k", "seq", "v")
      .write.mode("overwrite").parquet(s"$tmp/facts.parquet")
    s"$tmp/facts.parquet"
  }

  test("window expressions, passthrough, multi-hop aliases, and COUNT(*)") {
    val df = spark.read.parquet(factsDir())
      .where(col("seq") > 0) // filter: row-steering, not value flow
      .withColumn("doubled", col("v") * 2) // hop 1
      .select(col("k"), col("doubled"),
        sum(col("doubled")).over(Window.partitionBy(col("k"))).as("running"))
      .groupBy(col("k"))
      .agg(max(col("running")).as("peak"), // hop 2 through the window
        count(lit(1)).as("n"))
    val edges = ColumnLineage.of(df)
    assert(edges == Seq(
      ("k", "facts", "k"),
      ("peak", "facts", "v")), edges.toString)
    // n (COUNT(*)) carries no source column — correctly absent
    assert(!edges.exists(_._1 == "n"))
  }
}
