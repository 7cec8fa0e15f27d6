package graft.sources

import graft.functions.GraftFunctions
import graft.operators.Chunker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion (SURVEY §2.1 S1/S3/S4/S5 + §2.2 P1–P4 + §2.9 E1):
  * text files → non-empty guard → chunk → embed → one Parquet corpus table
  * where the embedding is a column (replacing the reference's
  * FAISS-file + pickle-sidecar pair, `components/core/index_service.py:48-125`).
  */
object TextIngest {

  /** S1: whole-file text scan over a directory of .txt/.md/.text files
    * (`components/index_manager.py:95-130`), with the empty/unreadable
    * guard (P10). */
  def readTextDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.{txt,md,text}")
      .load(dir)
      .withColumn("file_path", input_file_name())
      .withColumn("filename", regexp_extract(col("file_path"), "[^/\\\\]+$", 0))
      .withColumnRenamed("value", "content")
      .filter(length(trim(col("content"))) > 0)

  /** Chunk + embed documents into the canonical corpus schema
    * (FIXTURES.md §1). `flatMap` keeps the chunker a typed generator;
    * embedding and doc_id assignment stay columnar.
    *
    * `referenceParity = true` chunks with [[Chunker.chunkParity]] — chunk
    * boundaries byte-identical to the reference implementation's (the
    * migration mode; default stays graft's order-robust fold, see the
    * deviation rationale in `Chunker.scala`). */
  def buildCorpus(docs: DataFrame, textCol: String = "content",
                  filenameCol: String = "filename", dim: Int = 64,
                  referenceParity: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val chunker: String => Seq[Chunker.Chunk] =
      if (referenceParity) Chunker.chunkParity else Chunker.chunk
    val chunked = docs
      .select(col(filenameCol).as("filename"), col(textCol).as("content"))
      .as[(String, String)]
      .flatMap { case (filename, content) =>
        chunker(content).zipWithIndex.map { case (c, i) =>
          (filename, i, c.text, c.startLine, c.endLine)
        }
      }
      .toDF("filename", "chunk_index", "content", "start_line", "end_line")
    // Deterministic distributed id: no global window/shuffle at scale.
    // md5-derived (first 60 bits) rather than xxhash64 so a SQL oracle can
    // recompute it — md5 hex agrees across engines, xxhash64 is Spark-only.
    chunked
      .withColumn("doc_id", expr(
        "cast(conv(substr(md5(cast(concat(filename, ':', chunk_index) as binary)), 1, 15), 16, 10) as bigint)"))
      .withColumn("size", length(col("content")))
      .withColumn("embedding", GraftFunctions.hashEmbed(col("content"), lit(dim)))
  }
}
