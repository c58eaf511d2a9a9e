package graft.engine

import java.util
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal V2 catalog with NESTED namespaces (`a`, `a.b`) for the
  * catalogTree walk test — Spark ships no in-main in-memory V2 catalog.
  * Metadata-only: listNamespaces/listTables are all the tree walk touches.
  */
class NestedTestCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val nss: Seq[Seq[String]] = Seq(Seq("a"), Seq("a", "b"))
  private val tbls: Map[Seq[String], Seq[String]] =
    Map(Seq("a") -> Seq("t1"), Seq("a", "b") -> Seq("t2"))

  private def requireNs(ns: Array[String]): Unit =
    if (!nss.contains(ns.toSeq)) throw new NoSuchNamespaceException(ns)

  override def listNamespaces(): Array[Array[String]] =
    nss.filter(_.length == 1).map(_.toArray).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireNs(namespace)
    nss.filter(n => n.length == namespace.length + 1 && n.startsWith(namespace.toSeq))
      .map(_.toArray).toArray
  }
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    requireNs(namespace); java.util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNs(namespace)
    tbls.getOrElse(namespace.toSeq, Nil).map(t => Identifier.of(namespace, t)).toArray
  }
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException
}
