package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the FineWeb-Edu /
  * fastText-classifier pattern (a learned filter over weak labels)
  * re-expressed on the engine's deterministic feature stack: documents
  * featurize through the SAME hashed unigram+bigram histogram kernel
  * DSIR uses (`dsir_buckets` — one md5 per feature, 256 buckets, no
  * explode), MLlib logistic regression fits distributed (treeAggregated
  * gradients; nothing corpus-sized on the driver), and scoring is a
  * narrow per-row fold against the coefficient literal.
  *
  * The artifact (coefficients + intercept) persists as text, so the
  * DuckDB oracle replays the ENTIRE scoring path — hashing, histogram,
  * dot, intercept — from the trained state (the q77–q92 generated-oracle
  * lifecycle). Scores are exposed as the LOGIT `z = w·h + b` rather than
  * `sigmoid(z)`: the sigmoid needs `exp`, whose last-ulp behavior
  * differs between libm and the JVM, while `z` is pure
  * multiply-accumulate — bitwise-replayable; `pred = z > 0` is the same
  * decision boundary.
  *
  * Weak labels are the caller's: any boolean column (a language match,
  * a screen verdict, an LLM-graded sample joined in). The classifier
  * generalizes whatever signal labels it — the engine owns the
  * train/score mechanics, not the labeling policy. */
object QualityClassifier {

  val DefaultBuckets = 256

  final case class Model(weights: Array[Double], intercept: Double) {
    def buckets: Int = weights.length
  }

  /** Hashed-histogram features as an ml vector column. */
  private def featureCol(textCol: Column, buckets: Int): Column =
    array_to_vector(
      transform(GraftFunctions.dsirBuckets(textCol, lit(buckets)),
        c => c.cast("double")))

  /** Fit logistic regression on weak labels. L2-regularized, no elastic
    * net, fixed iteration budget — deterministic given the input. */
  def train(docs: DataFrame, label: Column, textCol: String = "text",
            buckets: Int = DefaultBuckets, maxIter: Int = 50,
            regParam: Double = 1e-3): Model = {
    GraftFunctions.register(docs.sparkSession)
    val prepared = docs.select(label.cast("double").as("label"),
      featureCol(col(textCol), buckets).as("features"))
    val fit = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setTol(1e-8)
      .fit(prepared)
    Model(fit.coefficients.toArray, fit.intercept)
  }

  /** Score every document: `(idCol, score, pred)` where `score` is the
    * logit `w·h + b` (a strict left fold over buckets in index order —
    * the oracle's `list_reduce` order) and `pred = score > 0`. One
    * narrow projection over the corpus scan; the model rides as a
    * literal baked into the `dsir_dot` kernel — one Java pass per row
    * (histogram + bucket-order fold) instead of the interpreted
    * `aggregate(zip_with(…))` lambdas over 256 buckets, with an IEEE op
    * sequence identical to the composed form (oracle unchanged). */
  def score(docs: DataFrame, model: Model, textCol: String = "text",
            idCol: String = "doc_id",
            keepCols: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val z = GraftFunctions.dsirDot(col(textCol),
      typedLit(model.weights.toSeq)) + lit(model.intercept)
    // two-step select: `pred` derives from the materialized score column,
    // so the kernel runs once per row, not once per output column
    docs.select(col(idCol) +: keepCols.map(col) :+ z.as("score"): _*)
      .withColumn("pred", col("score") > 0.0)
  }

  def save(spark: SparkSession, model: Model, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try {
      val sb = new StringBuilder
      sb.append(s"${model.buckets}\n")
      sb.append(model.weights.mkString(" ")).append('\n')
      sb.append(model.intercept.toString).append('\n')
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
  }

  def load(spark: SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    try {
      in.readLine() // bucket count, implied by the weights line
      val weights = in.readLine().split(" ").map(_.toDouble)
      Model(weights, in.readLine().toDouble)
    } finally in.close()
  }

  def buildOrLoad(spark: SparkSession, docs: DataFrame, label: Column,
                  path: String, textCol: String = "text"): Model =
    if (IvfIndex.exists(spark, path)) load(spark, path)
    else {
      val m = train(docs, label, textCol)
      save(spark, m, path)
      m
    }
}
