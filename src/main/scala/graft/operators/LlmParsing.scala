package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robust parsing of LLM-produced text (SURVEY §2.8 F4/F5) — pure
  * built-ins (`regexp_extract` + `from_json`), fully codegen'd.
  */
object LlmParsing {

  /** F4: evaluator score extraction
    * (`components/optimization/response_evaluator.py:176-189`): primary
    * pattern `Pisteet: <0?.dd | 1.0+ | 0 | 1>` (case-insensitive), else the
    * first bare score-shaped number anywhere in the text, else 0.5; always
    * clamped to [0,1] — exact reference semantics including both fallbacks. */
  val ScoreShape = "0?\\.[0-9]+|1\\.0+|[01]"
  val ScorePattern = s"(?i)Pisteet:\\s*($ScoreShape)"

  def parseScore(response: Column): Column = {
    val primary = regexp_extract(response, ScorePattern, 1)
    val fallback = regexp_extract(response, s"($ScoreShape)", 1)
    val raw = when(primary =!= "", primary).otherwise(fallback)
    when(raw === "", lit(0.5))
      .otherwise(least(greatest(raw.cast("double"), lit(0.0)), lit(1.0)))
  }

  /** F4: the `Perustelut:` reasoning text preceding the score (DOTALL +
    * case-insensitive, `response_evaluator.py:177`; empty-match fallback
    * is the caller's concern as in the reference's "Ei perustelua"). */
  def parseReasoning(response: Column): Column =
    regexp_extract(response, "(?is)Perustelut:\\s*(.+?)(?=Pisteet:|$)", 1)

  /** F5: tasklist-JSON schema
    * (`components2/workflow_executor.py:405-452`). */
  val TasklistSchema: StructType = StructType(Seq(
    StructField("goal", StringType),
    StructField("tasks", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("expected_output", StringType)))))))

  /** F5: strip ```` ```json ```` fences / surrounding prose down to the
    * outermost `{...}` body (dotall so it spans lines). */
  def extractJsonBody(raw: Column): Column =
    regexp_extract(raw, "(?s)\\{.*\\}", 0)

  /** F5: fence-strip + parse + validate required fields; null when the
    * payload is unusable (caller filters → the reference's halted-error
    * path). */
  def parseTasklist(raw: Column): Column = {
    val parsed = from_json(extractJsonBody(raw), TasklistSchema)
    when(parsed.getField("goal").isNotNull && parsed.getField("tasks").isNotNull,
      parsed)
  }

  /** Validation-verdict schema + parse
    * (`components2/task_executor.py:493-547`): missing fields default to
    * invalid/0 exactly like the reference. */
  val VerdictSchema: StructType = StructType(Seq(
    StructField("is_valid", BooleanType),
    StructField("score", IntegerType),
    StructField("reason", StringType)))

  def parseVerdict(raw: Column): Column = {
    val parsed = from_json(extractJsonBody(raw), VerdictSchema)
    struct(
      coalesce(parsed.getField("is_valid"), lit(false)).as("is_valid"),
      least(greatest(coalesce(parsed.getField("score"), lit(0)), lit(0)), lit(100)).as("score"),
      coalesce(parsed.getField("reason"), lit("")).as("reason"))
  }
}
