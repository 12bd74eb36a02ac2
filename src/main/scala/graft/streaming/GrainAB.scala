package graft.streaming

import org.apache.spark.sql.SparkSession

/** Dev measurement main (optimization guide §1): interleaved in-JVM A/B of
  * the stateful-drain shuffle grain for the big-state streaming queries.
  *
  * Cross-run A/B is useless on this hypervisor-drifting box (a load episode
  * inflates one whole run and reads as a fake regression), so this follows
  * StateScaleBench's discipline: every (query, grain) cell is visited once
  * per rep cycle, reps interleaved, and the reported statistic is the MIN
  * over reps — an episode shorter than the run cannot bias a whole column.
  * A control query (untouched grain) runs once per cycle; its spread across
  * cycles is the drift gauge for the run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.streaming.GrainAB [reps [grains,csv]]"
  */
object GrainAB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val grains = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 4, 8, 16, 32))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val targets = Seq(
      "stream_left_outer_join", "stream_full_outer_join",
      "stream_interval_join", "stream_dedup_exact")
    val control = "stream_sessionize"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.TempDirs.create("graft_local_"))
      // catalog-table data (bucketed scratch tables, saga namespaces) is
      // ephemeral in these mains — same RAM-fs scratch policy as local.dir;
      // a real deployment points the warehouse at durable storage
      .config("spark.sql.warehouse.dir", graft.util.TempDirs.create("graft_wh_"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Logs.suppressExpectedUnpersistWarnings()
    val qs = graft.SparkEntry.queries

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      val df = qs(name)(spark, sfDir)
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftSqlBridge.releaseLocalCheckpoint(df)
      spark.catalog.clearCache()
      dt
    }

    // JVM/codegen warmup outside any timed cell
    time(control)

    val cells = scala.collection.mutable.Map[(String, Int), List[Double]]()
      .withDefaultValue(Nil)
    val controls = scala.collection.mutable.ListBuffer[Double]()
    (1 to reps).foreach { rep =>
      sys.props.remove("graft.stateGrainOverride")
      controls += time(control)
      grains.foreach { g =>
        sys.props("graft.stateGrainOverride") = g.toString
        targets.foreach { q =>
          System.gc()
          val dt = time(q)
          cells((q, g)) = dt :: cells((q, g))
          println(f"[grainab] rep=$rep grain=$g%2d $q%-28s $dt%6.3f s")
        }
      }
      sys.props.remove("graft.stateGrainOverride")
    }
    println(f"[grainab] control $control mins=${controls.min}%.3f " +
      f"max=${controls.max}%.3f (spread=${controls.max / controls.min}%.2f)")
    targets.foreach { q =>
      val row = grains.map(g => f"g$g=${cells((q, g)).min}%.3f").mkString("  ")
      println(f"[grainab] MIN $q%-28s $row")
    }
    spark.stop()
  }
}
