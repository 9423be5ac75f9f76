package graft

import org.apache.spark.sql.SparkSession

/** One session factory for the harness mains (Bench, Profile) so their
  * timings are measured under identical configuration — a config added for
  * benchmarking that didn't reach Profile would make profile numbers
  * non-comparable.
  */
object LocalSession {
  def build(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
