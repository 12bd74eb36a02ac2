package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingIngest

/** Streaming queries, oracle-checked against the same DuckDB SQL as their
  * batch twins (the streaming engine must converge to the batch answer at
  * AvailableNow drain).
  */
object StreamingOps {

  private val TsFmt = "%Y-%m-%d %H:%M:%S.%f"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_daily" -> ((s, dir) => StreamingIngest.tumblingDaily(s, dir)),
    "stream_user_watermark" -> ((s, dir) => StreamingIngest.statefulUserWatermark(s, dir)),
    "stream_dedup_exact" -> ((s, dir) => StreamingIngest.streamDedupExact(s, dir)),
    "stream_etl_dest" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      StreamingIngest.streamEtlToParquet(s, dir)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_iso"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling_daily" ->
      s"""SELECT strftime(date_trunc('day', ts), '$TsFmt') AS window_start,
         |  count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_user_watermark" ->
      s"""SELECT user_id, strftime(max(ts), '$TsFmt') AS watermark
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the doubled at-least-once input must collapse back to the batch table
    "stream_dedup_exact" ->
      s"""SELECT event_id, strftime(ts, '$TsFmt') AS ts_iso, user_id
         |FROM events ORDER BY event_id""".stripMargin,
    "stream_etl_dest" ->
      s"""SELECT event_id, strftime(ts, '$TsFmt') AS ts_iso, user_id, event_type, value, props
         |FROM events ORDER BY event_id""".stripMargin
  )
}
