package graft.ops.text2sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC catalog walk → schema dim table: connect to a live database,
  * enumerate tables / columns / primary keys / foreign keys through
  * `DatabaseMetaData`, and render one `CREATE TABLE` DDL per table — the
  * analogue of the reference's DatabaseManager schema discovery
  * (`utils/text2sql/database_manager.py:86-140`), which walks each
  * registered database to build the schema strings its prompt generators
  * consume.
  *
  * The walk runs on the driver over ONE connection: a catalog is metadata
  * — thousands of rows even for the widest warehouse — and the result is
  * a broadcast-sized dim table feeding [[Text2SQLPromptGenerator]] /
  * [[SQLByColumnGenerator]]. The 100 TB of data never moves; only its
  * schema does.
  */
object SchemaWalk {
  final case class TableSchema(table_name: String, schema_ddl: String)

  /** Walk `url`'s catalog and return a DataFrame of
    * (table_name, schema_ddl), one row per user TABLE. */
  def walk(spark: SparkSession, url: String, driverClass: String = "",
      props: Map[String, String] = Map.empty,
      schemaPattern: String = null): DataFrame = {
    if (driverClass.nonEmpty) Class.forName(driverClass)
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, p)
    try {
      val md = conn.getMetaData
      val names = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val rs = md.getTables(null, schemaPattern, "%", Array("TABLE"))
      while (rs.next()) names += ((rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")))
      rs.close()
      import spark.implicits._
      names.toSeq.map { case (sch, tbl) => TableSchema(tbl, ddlFor(md, sch, tbl)) }.toDF()
    } finally conn.close()
  }

  /** Render one table's discovered schema as ANSI-ish DDL:
    * `CREATE TABLE t (c TYPE [NOT NULL], ..., PRIMARY KEY (..),
    * FOREIGN KEY (..) REFERENCES t2 (..))`. */
  private def ddlFor(md: java.sql.DatabaseMetaData, schema: String,
      table: String): String = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    val crs = md.getColumns(null, schema, table, "%")
    while (crs.next()) {
      val name = crs.getString("COLUMN_NAME")
      val tpe = renderType(crs.getString("TYPE_NAME"),
        crs.getInt("COLUMN_SIZE"), crs.getInt("DECIMAL_DIGITS"))
      val notNull = crs.getInt("NULLABLE") == java.sql.DatabaseMetaData.columnNoNulls
      cols += (name + " " + tpe + (if (notNull) " NOT NULL" else ""))
    }
    crs.close()

    val pkCols = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
    val prs = md.getPrimaryKeys(null, schema, table)
    while (prs.next()) pkCols += ((prs.getShort("KEY_SEQ"), prs.getString("COLUMN_NAME")))
    prs.close()
    val pkClause =
      if (pkCols.isEmpty) Nil
      else Seq("PRIMARY KEY (" + pkCols.sortBy(_._1).map(_._2).mkString(", ") + ")")

    // imported keys grouped by constraint name → one FOREIGN KEY clause each
    val fkRows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Short, String, String, String)]
    val frs = md.getImportedKeys(null, schema, table)
    while (frs.next()) fkRows += ((frs.getString("FK_NAME"), frs.getShort("KEY_SEQ"),
      frs.getString("FKCOLUMN_NAME"), frs.getString("PKTABLE_NAME"),
      frs.getString("PKCOLUMN_NAME")))
    frs.close()
    val fkClauses = fkRows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      "FOREIGN KEY (" + ordered.map(_._3).mkString(", ") + ") REFERENCES " +
        ordered.head._4 + " (" + ordered.map(_._5).mkString(", ") + ")"
    }

    s"CREATE TABLE $table (" + (cols ++ pkClause ++ fkClauses).mkString(", ") + ")"
  }

  private def renderType(typeName: String, size: Int, scale: Int): String =
    typeName.toUpperCase match {
      case t @ ("VARCHAR" | "CHAR" | "CHARACTER") => s"$t($size)"
      case t @ ("DECIMAL" | "NUMERIC")            => s"$t($size, $scale)"
      case t                                      => t
    }
}
