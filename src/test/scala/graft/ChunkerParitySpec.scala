package graft

import graft.operators.Chunker
import org.scalatest.funsuite.AnyFunSuite

/** Byte-parity of `Chunker.chunkParity` against the REFERENCE chunker
  * implementation: `scripts/gen_chunk_parity_fixture.py` imports
  * `/root/reference/preprocessing/chunk_text_files.py` (the actual
  * module, not a replica), runs `create_chunks` over 1000 deterministic
  * case constructions from the sf0.01 documents table — 580 structured
  * plus 420 md5-seeded property cases whose shapes and truncations
  * straddle the 500/2000 chunk boundaries — and records md5 + line span
  * per chunk. This spec rebuilds the SAME cases in Scala and compares
  * chunk-for-chunk. The default `Chunker.chunk` keeps its documented
  * deviations — parity mode is the migration path.
  */
class ChunkerParitySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"
  private val fixturePath = "/chunk_parity_fixture.tsv"

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkParity matches the reference implementation on 1000 corpus cases") {
    val res = getClass.getResourceAsStream(fixturePath)
    assume(res != null, "fixture missing — run scripts/gen_chunk_parity_fixture.py")
    assume(new java.io.File(s"$sfDir/documents.parquet").exists,
      "sf0.01 testdata not present")
    val expected = scala.io.Source.fromInputStream(res, "UTF-8")
      .getLines().toSeq
      .map(_.split("\t", -1))
      .groupBy(_.apply(0))
      .map { case (k, rows) =>
        k -> rows.filter(_.apply(1) != "-1").sortBy(_.apply(1).toInt)
          .map(r => (r(2), r(3).toInt, r(4).toInt))
      }

    // Same case construction as the generator, Spark-read from the same
    // parquet (doc_id order pinned on both sides).
    val spark = SparkTestBase.spark
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val byId = rows.map(r => r._1 -> r._3).toMap
    val ids = byId.keys.toSeq.sorted

    val cases = scala.collection.mutable.LinkedHashMap.empty[String, String]
    ids.foreach(i => cases(s"doc_$i") = byId(i))
    (0 until 40).foreach { k =>
      val group = ids.filter(i => i >= 12L * k && i < 12L * (k + 1)).map(byId)
      if (group.nonEmpty) cases(s"long_$k") = group.mkString("\n\n")
    }
    (0 until 20).foreach { k =>
      val group = ids.filter(i => i >= 25L * k && i < 25L * (k + 1)).map(byId)
      if (group.nonEmpty) cases(s"sent_$k") = group.mkString(". ") + "."
    }
    rows.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (src, rs) =>
      val turns = rs.sortBy(_._1).take(30).zipWithIndex.map { case (r, j) =>
        (if (j % 2 == 0) "K: " else "V: ") + r._3
      }
      cases(s"conv_$src") = turns.mkString("\n")
    }
    // md5-seeded property cases: shapes + truncations straddling the
    // 500/2000 chunk boundaries — MUST stay bit-identical to the
    // generator's section 5 (same digests, same digit arithmetic).
    val sizes = Seq(0, 450, 480, 499, 500, 501, 520, 550,
      1900, 1990, 1999, 2000, 2001, 2010, 2100, 2500)
    (0 until 420).foreach { k =>
      val h = md5(s"parity:$k")
      val shape = Integer.parseInt(h.substring(0, 1), 16) % 3
      val nParts = 2 + Integer.parseInt(h.substring(1, 2), 16) % 6
      val parts = (0 until nParts).map { j =>
        val idx = Integer.parseInt(h.substring(2 + 2 * j, 4 + 2 * j), 16) % ids.length
        byId(ids(idx))
      }
      val txt = shape match {
        case 0 => parts.mkString("\n\n")
        case 1 => parts.mkString(". ") + "."
        case _ => parts.zipWithIndex.map { case (p, j) =>
          (if (j % 2 == 0) "K: " else "V: ") + p
        }.mkString("\n")
      }
      val size = sizes(Integer.parseInt(h.substring(16, 17), 16) % sizes.length)
      cases(s"rand_$k") = if (size > 0) txt.take(size) else txt
    }

    assert(cases.keySet == expected.keySet,
      s"case-set drift: ${(cases.keySet diff expected.keySet).take(3)} / " +
        s"${(expected.keySet diff cases.keySet).take(3)}")
    var checkedChunks = 0
    cases.foreach { case (key, text) =>
      val got = Chunker.chunkParity(text)
        .map(c => (md5(c.text), c.startLine, c.endLine))
      assert(got == expected(key),
        s"$key: got ${got.take(3)}… expected ${expected(key).take(3)}…")
      checkedChunks += got.size
    }
    assert(checkedChunks == 1216, s"chunk count drift: $checkedChunks")
  }
}
