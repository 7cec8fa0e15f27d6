package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node, NodeList}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DOCX → Markdown preprocessing (SURVEY §2.1 S2 + §2.8 F10,
  * `preprocessing/process_docx_files.py:43-224`): headings, bold/italic
  * runs, list items and tables converted to Markdown — JDK-only (a .docx
  * is a zip containing `word/document.xml`). One-time ELT step feeding the
  * text chunker, not a query operator.
  */
object DocxIngest {

  /** Extract `word/document.xml` from the docx zip. */
  private def documentXml(docx: Array[Byte]): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(docx))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .collectFirst {
          case e if e.getName == "word/document.xml" =>
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            Iterator.continually(zin.read(buf)).takeWhile(_ > 0)
              .foreach(n => out.write(buf, 0, n))
            out.toByteArray
        }
    } finally zin.close()
  }

  private def children(e: Element, local: String): Seq[Element] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Element]
    val nl = e.getChildNodes
    var i = 0
    while (i < nl.getLength) {
      nl.item(i) match {
        case c: Element if c.getLocalName == local => out += c
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  private def descendant(e: Element, local: String): Option[Element] = {
    val nl = e.getElementsByTagNameNS("*", local)
    if (nl.getLength > 0) Some(nl.item(0).asInstanceOf[Element]) else None
  }

  /** Markdown for one paragraph: heading level from pStyle, list marker
    * from numPr, bold/italic per run. */
  private def paragraphMd(p: Element): String = {
    val pPr = children(p, "pPr").headOption
    val style = pPr.flatMap(descendant(_, "pStyle"))
      .map(_.getAttributeNS(p.getNamespaceURI, "val"))
      .orElse(pPr.flatMap(descendant(_, "pStyle")).map(_.getAttribute("w:val")))
      .getOrElse("")
    val headingLevel = "(?i)heading([1-9])".r.findFirstMatchIn(style).map(_.group(1).toInt)
    val isList = pPr.exists(descendant(_, "numPr").isDefined)
    val runs = children(p, "r").map { r =>
      val rPr = children(r, "rPr").headOption
      val bold = rPr.exists(descendant(_, "b").isDefined)
      val italic = rPr.exists(descendant(_, "i").isDefined)
      val text = children(r, "t").map(_.getTextContent).mkString
      if (text.isEmpty) ""
      else if (bold && italic) s"***$text***"
      else if (bold) s"**$text**"
      else if (italic) s"*$text*"
      else text
    }
    val body = runs.mkString
    if (body.trim.isEmpty) ""
    else headingLevel match {
      case Some(n) => "#" * n + " " + body
      case None if isList => "- " + body
      case None => body
    }
  }

  /** Markdown table: first row becomes the header. */
  private def tableMd(tbl: Element): String = {
    val rows = children(tbl, "tr").map { tr =>
      children(tr, "tc").map { tc =>
        children(tc, "p").map(paragraphMd).filter(_.nonEmpty).mkString(" ")
      }
    }
    if (rows.isEmpty) return ""
    val header = rows.head
    val sep = header.map(_ => "---")
    (Seq(header, sep) ++ rows.tail)
      .map(_.mkString("| ", " | ", " |")).mkString("\n")
  }

  /** Convert docx bytes to Markdown text; None when the payload isn't a
    * readable docx (bad-record path, P10). */
  def convert(docx: Array[Byte]): Option[String] =
    try documentXml(docx).map { xml =>
      val dbf = DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      val doc = dbf.newDocumentBuilder().parse(new ByteArrayInputStream(xml))
      val body = doc.getDocumentElement.getElementsByTagNameNS("*", "body")
        .item(0).asInstanceOf[Element]
      val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
      val nl = body.getChildNodes
      var i = 0
      while (i < nl.getLength) {
        nl.item(i) match {
          case e: Element if e.getLocalName == "p" =>
            val md = paragraphMd(e); if (md.nonEmpty) blocks += md
          case e: Element if e.getLocalName == "tbl" =>
            val md = tableMd(e); if (md.nonEmpty) blocks += md
          case _ =>
        }
        i += 1
      }
      blocks.mkString("\n\n")
    } catch { case _: Exception => None }

  /** S2 as a Spark job: binaryFile scan → convert → text rows ready for
    * the chunker (`TextIngest.buildCorpus`). */
  def readDocxDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.docx")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        convert(bytes).filter(_.trim.nonEmpty).map(md => (path, md))
      }
      .toDF("file_path", "content")
      .withColumn("filename", regexp_extract(col("file_path"), "[^/\\\\]+$", 0))
  }
}
