package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog PLUGIN over a directory of landing zones — the third V2
  * surface beside the connector's read/stream/write paths: with
  *
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /data/landing
  *
  * plain SQL can name zones as tables (`SELECT … FROM graft.events_zone`)
  * with no `format(...).option(...).load()` plumbing — the surface BI
  * tools and SQL-only users actually reach tables through. Each table is
  * a [[TsvTable]], so scan-time file pruning, column pruning, streaming,
  * and the staged write path all ride along unchanged; `CREATE TABLE` /
  * `DROP TABLE` map to zone-directory lifecycle (schema is fixed by the
  * layout — a mismatched CREATE fails loudly). Namespaces map to
  * subdirectories; rename/alter are refused rather than half-supported.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name: set spark.sql.catalog.$name.root to the zones directory")
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$root/", "/", "")

  private def fs = new Path(root).getFileSystem(new Configuration())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = new Path((namespace.toSeq).mkString(s"$root/", "/", ""))
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).filter(_.isDirectory)
      .map(d => Identifier.of(namespace, d.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(new Path(dirOf(ident)))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!fs.exists(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new TsvTable(dir)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(schema.isEmpty || schema.fieldNames.sameElements(TsvLanding.Schema.fieldNames),
      s"graft catalog tables carry the fixed landing schema " +
        s"(${TsvLanding.Schema.fieldNames.mkString(", ")}); got ${schema.fieldNames.mkString(", ")}")
    val dir = dirOf(ident)
    if (fs.exists(new Path(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    fs.mkdirs(new Path(dir))
    new TsvTable(dir)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: the landing schema is fixed by the layout — ALTER is refused")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident))
    fs.exists(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: zones are externally named delivery targets — RENAME is refused")
}
