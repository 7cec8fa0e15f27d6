package graft

import graft.functions.GraftFunctions
import graft.operators.VectorSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicates the embeddings table N× (re-keyed) into a temp
  * parquet corpus and times exact k-NN warm (second run) — the per-core
  * scan throughput is what transfers to a large cluster, since the single
  * k-NN plan has no shuffle and the batch-aggregated plan shuffles only
  * k·partitions rows per query. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE: heap comes from the forked JVM's -Xmx (build.sbt honors
      // SPARK_DRIVER_MEM); spark.driver.memory set here would be ignored
      // in an already-running local JVM.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val nBase = base.count()
    val path = s"/tmp/graft-scale-${factor}x"
    if (!graft.sources.CorpusStore.exists(spark, path)) {
      import spark.implicits._
      val reps = (0 until factor).toDF("rep")
      base.crossJoin(reps)
        .select((col("vec_id") + col("rep") * nBase).as("doc_id"),
          col("embedding"), col("label"))
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)
    val n = corpus.count()
    println(s"[scale] corpus rows = $n (${factor}x of $nBase)")

    val qVec = base.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val queries = base.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))

    def timeWarm(name: String, perRow: Long)(f: => Unit): Unit = {
      f; f // two warmups: page cache + C2 JIT of the vectorized reader
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name: $sec%.2f s warm (${perRow / sec / 1e6}%.1f M rows/s)")
    }
    timeWarm("knnSingle", n)(
      VectorSearch.knnSingle(corpus, qVec, 10, idCol = "doc_id").collect())
    timeWarm("knnBatch 16q (window)", 16 * n)(
      VectorSearch.knnBatch(queries, corpus, 10, idCol = "doc_id")
        .write.format("noop").mode("overwrite").save())
    timeWarm("knnBatch 16q (aggregated)", 16 * n)(
      VectorSearch.knnBatchAggregated(queries, corpus, 10, idCol = "doc_id")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
