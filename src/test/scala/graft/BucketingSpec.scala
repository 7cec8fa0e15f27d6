package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join evidence (SURVEY §7 / 100 TB layout): a corpus bucketed
  * on the join key joins WITHOUT a shuffle exchange — the layout choice
  * that makes repeated fact-to-fact joins viable at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bucketed tables join with no shuffle exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads co-located buckets: no exchange below the join
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a SortMergeJoin in:\n$plan")
      val joinPart = plan.substring(joinIdx)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"unexpected shuffle under the bucketed join:\n$plan")
      assert(joined.count() > 0)

      // control: the same join over unbucketed parquet shuffles both sides
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val uPlan = unbucketed.queryExecution.executedPlan.toString
      assert(uPlan.contains("Exchange hashpartitioning"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
