package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal self-contained XLSX reader/writer (no external deps — an
  * .xlsx is a zip of XML parts), closing the reference's
  * pandas `read_excel`/`to_excel` storage formats
  * (`dataflow/utils/storage.py:545,656`).
  *
  * Like the reference (which round-trips through a pandas DataFrame), a
  * single workbook is inherently one-machine-sized: the reader streams
  * the sheet XML on the driver and `createDataFrame`s the rows; the
  * writer collects to the driver. At 100 TB scale xlsx is an ingest /
  * export edge format, never the processing format — read it once,
  * write parquet, process that. Paths go through the Hadoop FileSystem
  * API, so any configured scheme (file, hdfs, s3a…) works.
  *
  * Sheet model: first row = header (column names), remaining rows =
  * data. Column types are inferred: all-numeric → double, all-boolean
  * → boolean, otherwise string; empty cells are null.
  */
object Xlsx {

  // ---- read ---------------------------------------------------------------

  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path))
    try readStream(spark, new BufferedInputStream(in)) finally in.close()
  }

  /** Parse the workbook from a raw stream (zip container). */
  private[sources] def readStream(spark: SparkSession, raw: InputStream): DataFrame = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheet: Option[Array[Array[Cell]]] = None
    var sheetBytes: Option[Array[Byte]] = None
    val zin = new ZipInputStream(raw)
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      e.getName match {
        case "xl/sharedStrings.xml" => shared = parseSharedStrings(readAll(zin))
        // first worksheet wins (reference reads the default sheet)
        case n if n.startsWith("xl/worksheets/sheet") && sheetBytes.isEmpty =>
          sheetBytes = Some(readAll(zin))
        case _ =>
      }
      zin.closeEntry()
      e = zin.getNextEntry
    }
    sheet = sheetBytes.map(b => parseSheet(b))
    val rows = sheet.getOrElse(Array.empty)
    require(rows.nonEmpty, "xlsx: workbook has no worksheet rows")
    toDataFrame(spark, rows, shared)
  }

  private sealed trait Cell
  private case object Blank extends Cell
  private final case class Num(v: Double) extends Cell
  private final case class Bool(v: Boolean) extends Cell
  private final case class Str(v: String) extends Cell
  private final case class SharedRef(i: Int) extends Cell

  private def readAll(in: InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Hardened StAX factory — no DTDs / external entities. */
  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** `<si>` entries, concatenating all `<t>` runs inside each. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xmlFactory.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** "BC7" → 0-based column 54 (ignores the row digits). */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte]): Array[Array[Cell]] = {
    val r = xmlFactory.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val rows = ArrayBuffer.empty[Array[Cell]]
    var row: ArrayBuffer[Cell] = null
    var cellType: String = null
    var cellCol: Int = -1
    var inV = false
    var inIs = false
    var inT = false
    val text = new StringBuilder
    def put(c: Cell): Unit = {
      val at = if (cellCol >= 0) cellCol else row.length
      while (row.length < at) row += Blank
      if (row.length == at) row += c else row(at) = c
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = ArrayBuffer.empty[Cell]
          case "c" if row != null =>
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(-1)
            text.clear()
          case "v" => inV = true
          case "is" => inIs = true
          case "t" if inIs => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV || inT => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" => inT = false
          case "is" => inIs = false
          case "c" if row != null =>
            val s = text.toString
            put(cellType match {
              case _ if s.isEmpty => Blank
              case "s"            => SharedRef(s.trim.toInt)
              case "b"            => Bool(s.trim == "1")
              case "n"            => Num(s.toDouble)
              case _              => Str(s) // "str" (formula result), "inlineStr"
            })
            cellType = null; cellCol = -1
          case "row" if row != null => rows += row.toArray; row = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.toArray
  }

  private def toDataFrame(spark: SparkSession, raw: Array[Array[Cell]],
      shared: IndexedSeq[String]): DataFrame = {
    def str(c: Cell): String = c match {
      case Str(v) => v
      case SharedRef(i) => shared(i)
      case Num(v) => if (v == v.floor && v.abs < 1e15) v.toLong.toString else v.toString
      case Bool(v) => v.toString
      case Blank => null
    }
    val header = raw.head.map(str)
    val width = header.length
    val body = raw.tail.map(r => Array.tabulate(width)(i => if (i < r.length) r(i) else Blank))
    def colCells(i: Int) = body.iterator.map(_(i)).filter(_ != Blank)
    val types: Array[DataType] = Array.tabulate(width) { i =>
      val cs = colCells(i).toSeq
      if (cs.isEmpty) StringType
      else if (cs.forall(_.isInstanceOf[Num])) DoubleType
      else if (cs.forall(_.isInstanceOf[Bool])) BooleanType
      else StringType
    }
    val schema = StructType(header.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
    val rows = body.map { r =>
      Row.fromSeq(Seq.tabulate(width) { i =>
        (r(i), types(i)) match {
          case (Blank, _) => null
          case (Num(v), DoubleType) => v
          case (Bool(v), BooleanType) => v
          case (c, _) => str(c)
        }
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }

  // ---- write --------------------------------------------------------------

  private def xmlEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c => b.append(c)
    }
    b.toString
  }

  private def colLetter(i0: Int): String = {
    var i = i0 + 1
    val b = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; b.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    b.toString
  }

  /** Collects to the driver (the reference's `to_excel` does the same via
    * pandas); bound exports with a limit upstream. Inline strings — no
    * shared-string table needed. */
  def write(df: DataFrame, path: String, maxRows: Int = 1048575): Unit = {
    val rows = df.limit(maxRows).collect()
    val names = df.columns
    val spark = df.sparkSession
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val out = new ZipOutputStream(new BufferedOutputStream(fs.create(new Path(path), true)))
    def part(name: String, body: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(body.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      out.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def cellXml(ref: String, v: Any): String = v match {
        case null => ""
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
        case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
        case s => s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s.toString)}</t></is></c>"""
      }
      w.write((names.indices.map(i => cellXml(s"${colLetter(i)}1", names(i)))
        .mkString("""<row r="1">""", "", "</row>")))
      rows.zipWithIndex.foreach { case (r, ri) =>
        val rn = ri + 2
        w.write(names.indices.map(i => cellXml(s"${colLetter(i)}$rn", r.get(i)))
          .mkString(s"""<row r="$rn">""", "", "</row>"))
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      out.closeEntry()
    } finally out.close()
  }
}
