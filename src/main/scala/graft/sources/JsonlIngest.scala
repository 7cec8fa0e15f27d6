package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus interchange — the de-facto wire format of LLM training
  * corpora (one JSON object per line, usually gzip/zstd-compressed
  * shards). The reference ingests text files and DOCX; a migrating
  * training pipeline's corpora arrive as JSONL, so the engine owns the
  * round trip:
  *
  *  - WRITE: `spark.write.json` with compression — each output split is
  *    an independent shard, the layout every data loader expects.
  *  - READ: schema is REQUIRED, never inferred — inference is a second
  *    full scan at 100 TB, and a drifting field type silently remaps
  *    the whole corpus. Malformed lines land in a `_corrupt` column
  *    (PERMISSIVE) for the audit count instead of killing the job;
  *    [[readJsonlStrict]] is the fail-fast variant for gated ingest.
  *
  * JSON string escaping (newlines, quotes, unicode) is the writer's
  * problem and the reader's contract — the q96 oracle pins the full
  * round trip against the parquet source of truth, text bytes included.
  */
object JsonlIngest {

  def writeJsonl(df: DataFrame, path: String,
                 compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** PERMISSIVE read: rows with unparseable lines carry the raw line in
    * `_corrupt` (and null data fields) — count them, don't die. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** FAILFAST read for gated ingest: any malformed line fails the job. */
  def readJsonlStrict(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Corrupt-line audit over a PERMISSIVE read. Spark refuses queries
    * that reference ONLY the corrupt-record column on a raw JSON scan
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parsed batch
    * once, then count. Audit semantics: the caller wanted the full
    * parse anyway. */
  def corruptCount(df: DataFrame): Long = {
    val snap = df.localCheckpoint(true)
    try snap.filter(col("_corrupt").isNotNull).count()
    finally snap.unpersist(blocking = false)
  }
}
