package graft

import graft.operators.BloomFilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def items(n: Int, prefix: String) =
    (1 to n).map(i => s"$prefix-$i").toDF("item")

  test("no false negatives: every inserted item passes membership") {
    val ins = items(2000, "in")
    val words = BloomFilter.build(ins, "item")
    val misses = ins.filter(!BloomFilter.mightContain(col("item"), words)).count()
    assert(misses == 0)
  }

  test("false-positive rate is in the expected band for the m/k sizing") {
    // n=2000, m=65536, k=3 -> p ≈ (1 - e^{-kn/m})^k ≈ 0.05% ... loosely
    // bound well above: < 2% of 10k foreign items
    val words = BloomFilter.build(items(2000, "in"), "item")
    val fp = items(10000, "out")
      .filter(BloomFilter.mightContain(col("item"), words)).count()
    assert(fp < 200, s"fp=$fp")
  }

  test("build is partitioning-invariant (bit_or is associative)") {
    val a = BloomFilter.build(items(500, "x"), "item")
    val b = BloomFilter.build(items(500, "x").repartition(13), "item")
    assert(java.util.Arrays.equals(a, b))
  }

  test("every word slot stays within 32 bits (the DuckDB-portable packing)") {
    val words = BloomFilter.build(items(5000, "w"), "item")
    assert(words.length == BloomFilter.WordCount)
    assert(words.forall(w => (w >>> 32) == 0L))
    assert(words.exists(_ != 0L))
  }
}
