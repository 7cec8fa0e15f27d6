package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  test("full config parses; missing fields keep defaults") {
    val c = GraftConfig.fromJson(
      """{"retrieval": {"top_k": 20, "hit_target": 5, "step": 0.01,
        |  "dynamic_enabled": false, "similarity_threshold": 0.7,
        |  "index_type": "ivf"},
        | "embedding": {"dimension": 768}}""".stripMargin)
    assert(c.retrieval == RetrievalConfig(20, 5, 0.01, dynamicEnabled = false, 0.7, "ivf"))
    assert(c.embedding.dimension == 768)
    assert(c.embedding.batchSize == 256) // default retained
  }

  test("partial / malformed / empty JSON fall back to defaults") {
    assert(GraftConfig.fromJson("""{"retrieval": {"top_k": 7}}""")
      .retrieval.copy(topK = 10) == RetrievalConfig())
    assert(GraftConfig.fromJson("not json at all") == GraftConfig())
    assert(GraftConfig.fromJson("{}") == GraftConfig())
  }

  test("reload re-reads the file per call (hot-reload semantics)") {
    val f = java.nio.file.Files.createTempFile("graft-config", ".json")
    java.nio.file.Files.writeString(f, """{"retrieval": {"top_k": 3}}""")
    assert(GraftConfig.reload(f.toString).retrieval.topK == 3)
    java.nio.file.Files.writeString(f, """{"retrieval": {"top_k": 9}}""")
    assert(GraftConfig.reload(f.toString).retrieval.topK == 9)
    assert(GraftConfig.reload("/nonexistent/path.json") == GraftConfig())
  }
}
