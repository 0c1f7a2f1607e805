package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-row smoothing over long series — the library form of the
  * History API's `includeMovingAverages` (every row gets its running
  * EMA/SMA, not just the final value).
  *
  * The EMA recurrence is inherently sequential per series, so it runs
  * as a typed sort-within-partitions + mapPartitions scan: one shuffle
  * on the series key, then a single ordered pass per partition — the
  * distributed shape that holds for billions of rows per key group.
  */
object Smoothing {

  case class SeriesPoint(context: String, path: String, ts_ms: Long,
      order_id: Long, value: Double)
  case class SmoothedPoint(context: String, path: String, ts_ms: Long,
      order_id: Long, value: Double, ema: Double, sma: Double)

  /** Running EMA (alpha) and trailing SMA (window n) per
    * (context, path) series, exact recurrence per row. */
  def emaSeries(df: DataFrame, alpha: Double, smaWindow: Int): Dataset[SmoothedPoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("context", "path", "ts_ms", "order_id", "value")
      .as[SeriesPoint]
      .repartition(col("context"), col("path"))
      .sortWithinPartitions("context", "path", "ts_ms", "order_id")
      .mapPartitions { it =>
        var key: (String, String) = null
        var ema = 0.0
        val window = new scala.collection.mutable.Queue[Double]()
        var sum = 0.0
        it.map { p =>
          if (key != (p.context, p.path)) {
            key = (p.context, p.path)
            ema = p.value
            window.clear(); sum = 0.0
          } else {
            ema = alpha * p.value + (1 - alpha) * ema
          }
          window.enqueue(p.value); sum += p.value
          if (window.size > smaWindow) sum -= window.dequeue()
          SmoothedPoint(p.context, p.path, p.ts_ms, p.order_id, p.value,
            ema, sum / window.size)
        }
      }
  }
}
