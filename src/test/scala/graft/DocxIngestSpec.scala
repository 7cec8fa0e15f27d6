package graft

import graft.sources.DocxIngest
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

class DocxIngestSpec extends AnyFunSuite {

  private val W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  private def docx(documentXml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("[Content_Types].xml"))
    zos.write("""<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(documentXml.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  private def p(inner: String) = s"<w:p>$inner</w:p>"
  private def run(text: String, props: String = "") =
    s"<w:r>${if (props.nonEmpty) s"<w:rPr>$props</w:rPr>" else ""}<w:t>$text</w:t></w:r>"

  test("headings, bold, italic, lists and tables become markdown") {
    val xml =
      s"""<?xml version="1.0"?>
         |<w:document xmlns:w="$W"><w:body>
         |${p(s"""<w:pPr><w:pStyle w:val="Heading1"/></w:pPr>${run("Title")}""")}
         |${p(run("Plain ") + run("bold", "<w:b/>") + run(" and ") + run("italic", "<w:i/>"))}
         |${p(s"""<w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr>${run("item one")}""")}
         |<w:tbl>
         |<w:tr><w:tc>${p(run("H1"))}</w:tc><w:tc>${p(run("H2"))}</w:tc></w:tr>
         |<w:tr><w:tc>${p(run("a"))}</w:tc><w:tc>${p(run("b"))}</w:tc></w:tr>
         |</w:tbl>
         |</w:body></w:document>""".stripMargin
    val md = DocxIngest.convert(docx(xml)).get
    assert(md.contains("# Title"))
    assert(md.contains("Plain **bold** and *italic*"))
    assert(md.contains("- item one"))
    assert(md.contains("| H1 | H2 |"))
    assert(md.contains("| --- | --- |"))
    assert(md.contains("| a | b |"))
  }

  test("garbage bytes and zip without document.xml yield None") {
    assert(DocxIngest.convert("not a zip".getBytes).isEmpty)
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("other.txt")); zos.write(1); zos.closeEntry(); zos.close()
    assert(DocxIngest.convert(bos.toByteArray).isEmpty)
  }

  test("readDocxDir converts files through the binaryFile scan") {
    val spark = SparkTestBase.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-docx").toString
    val xml =
      s"""<?xml version="1.0"?><w:document xmlns:w="$W"><w:body>${p(run("hello docx"))}</w:body></w:document>"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.docx"), docx(xml))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.docx"), "junk".getBytes)
    val got = DocxIngest.readDocxDir(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("content") == "hello docx")
    assert(got(0).getAs[String]("filename") == "a.docx")
  }
}
