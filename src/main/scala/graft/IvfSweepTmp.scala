package graft
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
object IvfSweepTmp extends App {
  val spark = LocalSession.build()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = sys.env.getOrElse("SWEEP_DIR", "/root/testdata/sf0.01")
  val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  val n = emb.count()
  // brute truth
  val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
  val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
  val brute = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
    .crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id"))
    .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    .select(col("query_id"), col("neighbor_id")).localCheckpoint()
  for ((k, nprobe, iters) <- Seq((64,8,2),(64,8,4),(32,4,2),(32,4,4),(96,12,2),(48,6,3),(64,8,6))) {
    val cents = graft.operators.KMeans.fit(emb, col("vec_id"), col("embedding"), k = k, iters = iters)
    val assigned = graft.operators.Dedup.assignCells(emb, col("vec_id"), col("embedding"), cents)
      .select(col("__id").as("vec_id"), col("cell"))
    // probe cells per query
    val centArr = broadcast(cents.agg(array_sort(collect_list(struct(col("cent_id"), col("cent")))).as("__cs")))
    val probed = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(centArr)
      .select(col("query_id"), explode(transform(slice(array_sort(transform(col("__cs"), c =>
        struct(l2sq(col("q_emb"), c.getField("cent")).as("dist"), c.getField("cent_id").as("cent_id")))), 1, nprobe),
        x => x.getField("cent_id"))).as("cell"))
    // scanned fraction = avg over queries of probed-cell population / n
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("sz"))
    val frac = probed.join(cellSizes, "cell").groupBy("query_id").agg(sum("sz").as("scanned"))
      .agg(avg(col("scanned") / n)).head().getDouble(0)
    // routing recall: true neighbors whose cell is probed
    val hits = brute.join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(probed, Seq("query_id", "cell"), "left_semi").count()
    println(f"SWEEP k=$k nprobe=$nprobe iters=$iters routing_recall=${hits/50.0}%.2f scanned_frac=$frac%.3f")
  }
  spark.stop()
}
