package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-browsing parity (SURVEY.md §3.2): the reference walks the tree
  * with SHOW CATALOGS → USE CATALOG → SHOW DATABASES → USE → SHOW TABLES →
  * DESCRIBE (catalogService.ts:126-221). Spark SQL runs all of these
  * natively with column spellings inside the reference's tolerated set
  * (catalogService.ts:131,154,179,203-205); this wrapper only adds the
  * tree-walk convenience and the USE CATALOG verb (handled by
  * DialectShim/EngineSession).
  */
object CatalogOps {

  final case class TableEntry(catalog: String, database: String, table: String)

  def showCatalogs(spark: SparkSession): DataFrame = spark.sql("SHOW CATALOGS")
  def showDatabases(spark: SparkSession): DataFrame = spark.sql("SHOW DATABASES")
  def showTables(spark: SparkSession): DataFrame = spark.sql("SHOW TABLES")
  def describe(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $table")

  /** Full tree as the reference builds it (catalogService.ts:226-285).
    * Walks via catalog-qualified SHOW statements — the session's current
    * catalog is never touched, so a statement running concurrently in the
    * same session can't observe a half-walked catalog switch. */
  def catalogTree(spark: SparkSession): Seq[TableEntry] = {
    val current = spark.catalog.currentCatalog()
    val cats = showCatalogs(spark).collect().map(_.getString(0)).toSeq
    val out = for {
      cat <- cats
      db <- spark.sql(s"SHOW NAMESPACES IN `$cat`").collect()
        .map(_.getString(0)).toSeq
      t <- spark.sql(s"SHOW TABLES IN `$cat`.`$db`").collect().toSeq
      if !t.getBoolean(2) // temp views are collected once, below
    } yield TableEntry(cat, db, t.getString(1))
    // temp views live outside databases; include them under the session db
    val temps = spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(t => TableEntry(current, "", t.name)).toSeq
    (out ++ temps).distinct
  }
}
