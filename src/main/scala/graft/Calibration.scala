package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The ONE fixed-size calibration job shared by every measurement artifact
  * (`Bench`, `ScaleProbe`). Its whole value is being IDENTICAL across
  * artifacts and across scale passes: a probe or bench ratio divided by
  * the calibration ratio separates real scaling from host-load
  * contamination, which only works if nobody's copy drifts — hence one
  * definition. SF-independent by construction (spark.range, no input). */
object Calibration {
  def job(spark: SparkSession): Unit =
    spark.range(50000000L)
      .select(xxhash64(col("id")).as("h"))
      .groupBy(pmod(col("h"), lit(1000)).as("b"))
      .agg(count(lit(1)))
      .count(): Unit

  /** Run the job, return wall seconds. */
  def timed(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    job(spark)
    (System.nanoTime() - t0) / 1e9
  }

  def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
}
