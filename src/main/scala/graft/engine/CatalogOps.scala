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

  private def quotePart(p: String): String = s"`${p.replace("`", "``")}`"

  /** A namespace string from SHOW NAMESPACES is DOTTED for nested
    * namespaces ('a.b'): each part must quote separately — backticking the
    * whole string would produce the malformed identifier `cat`.`a.b`. */
  private def qualify(cat: String, ns: String): String =
    (cat +: ns.split('.').toSeq).map(quotePart).mkString(".")

  /** All namespaces under a catalog, nested included: SHOW NAMESPACES only
    * lists one level, so recurse into each child. Catalogs that don't
    * support nested namespaces (the session catalog) throw on the child
    * listing — treated as a leaf. */
  private def namespaces(spark: SparkSession, cat: String): Seq[String] = {
    def walk(ns: String): Seq[String] = {
      val children = scala.util.Try(
        spark.sql(s"SHOW NAMESPACES IN ${qualify(cat, ns)}").collect()
          .map(_.getString(0)).toSeq).getOrElse(Nil)
        // child listings return the FULL dotted path; anything not strictly
        // deeper than the parent would loop the recursion
        .filter(_.count(_ == '.') > ns.count(_ == '.'))
      ns +: children.flatMap(walk)
    }
    scala.util.Try(
      spark.sql(s"SHOW NAMESPACES IN ${quotePart(cat)}").collect()
        .map(_.getString(0)).toSeq).getOrElse(Nil)
      .flatMap(walk)
  }

  /** Full tree as the reference builds it (catalogService.ts:226-285).
    * Walks via catalog-qualified SHOW statements — the session's current
    * catalog is never touched, so a statement running concurrently in the
    * same session can't observe a half-walked catalog switch. */
  def catalogTree(spark: SparkSession): Seq[TableEntry] = {
    val current = spark.catalog.currentCatalog()
    val cats = showCatalogs(spark).collect().map(_.getString(0)).toSeq
    val out = for {
      cat <- cats
      db <- namespaces(spark, cat)
      t <- spark.sql(s"SHOW TABLES IN ${qualify(cat, db)}").collect().toSeq
      if !t.getBoolean(2) // temp views are collected once, below
    } yield TableEntry(cat, db, t.getString(1))
    // temp views live outside databases; include them under the session db
    val temps = spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(t => TableEntry(current, "", t.name)).toSeq
    (out ++ temps).distinct
  }
}
