package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as TIMESTAMP(NANOS) (Spark rejects by
      // default) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark
      // reads TIMESTAMP_NTZ). Normalize every variant to a plain session
      // TIMESTAMP so downstream operators can rely on one type:
      //  - nanos: read as long (legacy conf) and truncate ns→µs with
      //    integer DIV (double division loses precision above 2^53 ns);
      //    DuckDB's ns→µs cast truncates identically.
      //  - NTZ micros: cast NTZ→TIMESTAMP. All entrypoints pin
      //    spark.sql.session.timeZone=UTC, so the cast is value-preserving
      //    and agrees with the DuckDB oracle.
      // The nanosAsLong conf is DELIBERATELY session-wide and not
      // restored: it is consulted at execution time by the reader, so
      // restoring it after building this lazy DataFrame would break the
      // read. Its only effect elsewhere is turning reads that would FAIL
      // into long-typed columns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
