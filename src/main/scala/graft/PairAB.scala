package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev measurement main (optimization guide §1): interleaved in-JVM A/B of
  * the basket pair-generator shapes — V1 (distinct + orderkey self-join)
  * vs V2 (per-order collect_set + array pair explosion).
  *
  * Discipline (OPTIMIZATION_r17.md "Measurement lesson"): cross-run A/B is
  * unusable on this hypervisor-drifting box, so every (query, variant) cell
  * is visited once per rep cycle INSIDE one SparkSession, the variant order
  * ALTERNATES per cycle (the fixed-order position bias that faked the SHJ
  * "win" cannot accumulate), the reported statistic is the MIN over reps,
  * and an untouched control query runs once per cycle as the drift gauge.
  * Result equality of the variant pairs is asserted before any timing.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PairAB [reps]"
  */
object PairAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.TempDirs.create("graft_local_"))
      .config("spark.sql.warehouse.dir", graft.util.TempDirs.create("graft_wh_"))
      // match the Bench session exactly so the A/B measures what the bench will
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Logs.suppressExpectedUnpersistWarnings()

    val qs = SparkEntry.queries
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "cop_v1" -> (() => qs("basket_copurchase")(spark, sfDir)),
      "cop_v2" -> (() => graft.ops.ProductAnalyticsOps.basketCopurchaseV2(spark, sfDir)),
      "lift_v1" -> (() => qs("basket_lift")(spark, sfDir)),
      "lift_v2" -> (() => graft.ops.ProductAnalyticsOps.basketLiftStagedV2(spark, sfDir).hygienic())
    )
    val control = "path_transitions"

    def run(fn: () => DataFrame): (Double, DataFrame) = {
      val t0 = System.nanoTime()
      val df = fn()
      df.count()
      ((System.nanoTime() - t0) / 1e9, df)
    }
    def release(df: DataFrame): Unit = {
      org.apache.spark.sql.graft.GraftSqlBridge.releaseLocalCheckpoint(df)
      spark.catalog.clearCache()
    }

    // equality gate before any timing: the variants must be the same query
    Seq(("cop", variants(0)._2, variants(1)._2), ("lift", variants(2)._2, variants(3)._2))
      .foreach { case (name, f1, f2) =>
        val r1 = f1().collect().map(_.toString).sorted.toSeq
        spark.catalog.clearCache()
        val r2 = f2().collect().map(_.toString).sorted.toSeq
        spark.catalog.clearCache()
        require(r1 == r2, s"[pairab] $name variants DIVERGE:\n  v1=${r1.take(3)}\n  v2=${r2.take(3)}")
        println(s"[pairab] $name variants agree (${r1.size} rows)")
      }

    // JVM/codegen warmup outside any timed cell
    { val (_, df) = run(() => qs(control)(spark, sfDir)); release(df) }

    val cells = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val controls = scala.collection.mutable.ListBuffer[Double]()
    (1 to reps).foreach { rep =>
      { val (dt, df) = run(() => qs(control)(spark, sfDir)); release(df); controls += dt }
      val order = if (rep % 2 == 1) variants else variants.reverse
      order.foreach { case (name, fn) =>
        System.gc()
        val (dt, df) = run(fn)
        release(df)
        cells(name) = dt :: cells(name)
        println(f"[pairab] rep=$rep $name%-8s $dt%6.3f s")
      }
    }
    println(f"[pairab] control $control mins=${controls.min}%.3f " +
      f"max=${controls.max}%.3f (spread=${controls.max / controls.min}%.2f)")
    variants.foreach { case (name, _) =>
      val xs = cells(name)
      println(f"[pairab] MIN $name%-8s ${xs.min}%.3f  (all: ${xs.reverse.map(x => f"$x%.3f").mkString(" ")})")
    }
    spark.stop()
  }
}
