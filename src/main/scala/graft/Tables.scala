package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Column pruning + predicate pushdown happen at the parquet scan as
  * long as callers select/filter declaratively, so these return the
  * raw DataFrame, nothing materialized.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read the nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong) and convert to Spark's native
    * µs timestamp with INTEGER division — a double division would lose
    * precision above 2^53 ns (~any epoch-2024 value).
    *
    * NOTE: setting the legacy flag is a SESSION-wide side effect — any
    * later TIMESTAMP(NANOS) parquet read in the same session also comes
    * back as BIGINT. Acceptable here (the events table is the only
    * nanos source in this corpus); a multi-tenant deployment would set
    * the flag in the session builder instead. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
