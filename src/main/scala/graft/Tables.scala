package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access + temp-view registration for SQL-shaped queries.
  *
  * The driver's tables (TESTDATA.md) are one parquet file per table under
  * a scale-factor dir. At 100 TB these would be partitioned directories;
  * nothing here assumes a single file (`spark.read.parquet` takes dirs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    init(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** One-time session setup: TIMESTAMP(NANOS) parquet columns surface as
    * int64 nanoseconds — exactly the reference's time model (SURVEY §1
    * "Time"; the reference stores ns int64 and converts via epoch_ns at
    * query time) — plus the graft function surface. Idempotent. */
  def init(spark: SparkSession): SparkSession = {
    if (!spark.conf.getOption("graft.initialized").contains("true")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.functions.GraftFunctions.registerAll(spark)
      spark.conf.set("graft.initialized", "true")
    }
    spark
  }

  /** Register graft functions + all tables as temp views; returns session.
    * Memoized per (session, dir): re-registering re-infers every table's
    * schema from parquet footers, which costs seconds per call. */
  def views(spark: SparkSession, dir: String): SparkSession = {
    val key = s"graft.views.$dir"
    if (!spark.conf.getOption(key).contains("true")) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(key, "true")
    }
    spark
  }
}
