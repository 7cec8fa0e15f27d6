package graft

import org.scalatest.funsuite.AnyFunSuite

/** The managed artifact-store root (round-13: query-artifact caches moved
  * off `java.io.tmpdir` — the wrong durability class for index artifacts).
  * Pins the resolution order and, end-to-end through a real build-or-load
  * site (pqCorpus), that the fingerprint keying still works under the new
  * root: hit = no rewrite, dataset change = MISS (new leaf, old untouched).
  */
class StoreRootSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("storeRoot resolution: default under spark-warehouse, sysprop overrides") {
    // the suite JVM sets neither the env var nor the sysprop by default
    assume(sys.env.get("SPARK_GRAFT_STORE_ROOT").isEmpty)
    val had = sys.props.remove("graft.store.root")
    try {
      assert(GraftConfig.storeRoot.endsWith("spark-warehouse/graft-stores"),
        s"default root: ${GraftConfig.storeRoot}")
      sys.props("graft.store.root") = "/somewhere/else"
      assert(GraftConfig.storeRoot == "/somewhere/else")
    } finally {
      sys.props.remove("graft.store.root")
      had.foreach(v => sys.props("graft.store.root") = v)
    }
  }

  test("fingerprint keying under the managed root: hit reuses, dataset change misses") {
    val root = java.nio.file.Files.createTempDirectory("graft-rootspec").toString
    val data = java.nio.file.Files.createTempDirectory("graft-rootdata").toString
    // a private dataset copy so the fingerprint can be changed freely
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .coalesce(1).write.parquet(s"$data/embeddings.parquet")
    val had = sys.props.get("graft.store.root")
    sys.props("graft.store.root") = root
    try {
      def pqDirs: Seq[java.io.File] = {
        val fs = new java.io.File(root).listFiles()
        if (fs == null) Seq.empty
        else fs.filter(_.getName.startsWith("graft-pq-")).sortBy(_.getName).toSeq
      }
      SparkEntry.pqCorpus(spark, data)
      val first = pqDirs
      assert(first.size == 1, s"expected one pq store, got $first")
      val marker = new java.io.File(first.head, "corpus/_SUCCESS")
      assert(marker.exists())
      val mtime = marker.lastModified()

      // HIT: identical dataset + parameters -> same leaf, nothing rewritten
      SparkEntry.pqCorpus(spark, data)
      assert(pqDirs == first && marker.lastModified() == mtime,
        "cache hit must not rewrite the store")

      // a SECOND dataset's cache shares the root and must never be
      // touched by the first dataset's lifecycle
      val data2 = java.nio.file.Files.createTempDirectory("graft-rootdata2").toString
      spark.read.parquet(s"$data/embeddings.parquet").limit(100)
        .coalesce(1).write.parquet(s"$data2/embeddings.parquet")
      SparkEntry.pqCorpus(spark, data2)
      val withSecond = pqDirs
      assert(withSecond.size == 2, s"expected two pq stores, got $withSecond")
      val secondDir = withSecond.filterNot(_ == first.head).head

      // MISS + GC (r16): same dir string, same content, new file
      // identity -> the fingerprint folds into the leaf, a NEW store is
      // built, and the SUPERSEDED sibling (same `_source` dataset dir,
      // old key) is swept — a regenerated dataset leaves zero stale
      // siblings; the other dataset's cache is untouched
      val tmp = s"$data/emb2"
      spark.read.parquet(s"$data/embeddings.parquet")
        .coalesce(1).write.parquet(tmp)
      SparkEntry.rmTree(s"$data/embeddings.parquet")
      assert(new java.io.File(tmp)
        .renameTo(new java.io.File(s"$data/embeddings.parquet")))
      SparkEntry.pqCorpus(spark, data)
      val after = pqDirs
      assert(after.size == 2, s"regeneration must GC the stale sibling: $after")
      assert(!after.contains(first.head), "stale sibling must be deleted")
      assert(after.contains(secondDir), "other dataset's cache must survive")
      val fresh = after.filterNot(_ == secondDir).head
      assert(new java.io.File(fresh, "_source").exists(),
        "fresh cache must carry its _source sidecar")
    } finally {
      sys.props.remove("graft.store.root")
      had.foreach(v => sys.props("graft.store.root") = v)
    }
  }
}
