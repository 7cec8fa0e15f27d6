package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for training-data pipelines: lay
  * documents into fixed-budget token bins in a deterministic order
  * within each shard (source, dump date, …). A document belongs to the
  * bin where it STARTS — streaming-pack semantics: the packer never
  * reorders or splits documents, so bin assignment is reproducible,
  * join-free, and identical whether computed in one pass or
  * incrementally per shard.
  *
  * Scale shape: ONE window cumsum per shard — per-shard state, no global
  * sort. A "globally optimal" packing order would serialize the corpus
  * through a single task; sharded streaming-pack is what a 1000-executor
  * pipeline can actually run, and shard boundaries (source, date) are
  * where training pipelines want pack locality anyway.
  */
object Packing {

  /** Whitespace token count — deliberately the same
    * `lower(trim(text))` + `\s+` split as the shingle/oracle tokenizer,
    * so packing and dedup agree on what a token is. */
  def tokenCount(text: Column): Column =
    size(split(lower(trim(text)), "\\s+")).cast("long")

  /** Per-document bin assignment: (input columns…, n_tokens, bin).
    * `bin = (cumsum_before_doc) div budget` — integer arithmetic only,
    * exact at any corpus size. */
  def assignBins(docs: DataFrame, budget: Long, textCol: String = "text",
                 idCol: String = "doc_id", shardCol: String = "source"): DataFrame =
    assignBinsByCost(docs.withColumn("n_tokens", tokenCount(col(textCol))),
      budget, "n_tokens", idCol, shardCol)

  /** Bin assignment from a PRECOMPUTED integer cost column — the same
    * streaming-pack semantics with the cost definition left to the
    * caller; the production pairing is
    * [[TextAnalysis.bpeTokenCountPerDoc]]'s `n_bpe_tokens`, so bins
    * reflect what the TRAINED tokenizer will actually emit rather than
    * the whitespace estimate. */
  def assignBinsByCost(docs: DataFrame, budget: Long, costCol: String,
                       idCol: String = "doc_id",
                       shardCol: String = "source"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(shardCol).orderBy(col(idCol))
    docs.withColumn("__cum", sum(col(costCol)).over(w))
      .withColumn("bin", expr(s"(__cum - $costCol) div $budget"))
      .drop("__cum")
  }

  /** Bin summary: (shardCol, bin, n_docs, n_tokens). A bin's token sum
    * may exceed `budget` by at most one document's tail — the standard
    * cost of never splitting documents. */
  def packBins(docs: DataFrame, budget: Long, textCol: String = "text",
               idCol: String = "doc_id", shardCol: String = "source"): DataFrame =
    assignBins(docs, budget, textCol, idCol, shardCol)
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))

  /** The byte-level EMIT of the packing tier: each (shard, bin)'s
    * member documents concatenated in id order with an EOS separator —
    * the `seq` column IS what a trainer's data loader reads. One
    * groupBy per bin with an ORDERED in-group concat (`array_sort`
    * over (id, text) structs — deterministic under any partitioning,
    * the q22 collect idiom; ids are unique so the struct order is
    * total). Group size is budget-bounded by construction, so the
    * collected array is O(budget) — never a corpus-scale collect. */
  def packSequences(docs: DataFrame, budget: Long,
                    sep: String = "\n<|endoftext|>\n",
                    textCol: String = "text", idCol: String = "doc_id",
                    shardCol: String = "source"): DataFrame =
    assignBins(docs, budget, textCol, idCol, shardCol)
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            x => x.getField(textCol))).as("seq"))
}
