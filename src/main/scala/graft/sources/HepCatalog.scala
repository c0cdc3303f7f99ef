package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The hep store as a first-class Spark SQL catalog (DataSourceV2).
  *
  * The reference exposes its store through a programmatic reader object
  * only (`read/hdf.py` `HdfReader[proc][evt]`); the Spark-native
  * equivalent of "a hierarchical store you can open and descend" is a
  * `TableCatalog`: register once,
  *
  * {{{
  * spark.sql.catalog.hep      = graft.sources.HepCatalog
  * spark.sql.catalog.hep.path = /data/hepstores        // or a single store
  * }}}
  *
  * and every store under the path is a namespace, every member table a
  * SQL-addressable identifier:
  *
  * {{{
  * SELECT * FROM hep.mystore.particles WHERE process = 'ttbar' AND fin
  * SHOW NAMESPACES IN hep; SHOW TABLES IN hep.mystore
  * }}}
  *
  * Reads delegate to Spark's own parquet DSv2 `FileTable`, so filter
  * pushdown, column pruning, partition pruning over the store's
  * process/chunk layout, and vectorized decode are all inherited — the
  * catalog adds addressing, not a bespoke reader. Writes stay with
  * [[graft.hep.HepWriter]] (the store's chunked-finalize invariants are
  * writer-side), so DDL through the catalog is rejected.
  */
class HepCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: org.apache.hadoop.fs.Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    require(options.containsKey("path"),
      s"catalog $name needs spark.sql.catalog.$name.path")
    catalogName = name
    root = new org.apache.hadoop.fs.Path(options.get("path"))
  }

  override def name(): String = catalogName

  // Discovery goes through the path's Hadoop FileSystem (resolved per call
  // against the active session's conf), so stores on HDFS/S3 list exactly
  // like local ones — java.io.File would silently see an empty catalog.
  private def fs: org.apache.hadoop.fs.FileSystem = graft.hep.HadoopIo.fsAny(root)

  // A relative catalog path must resolve ONCE, against the filesystem's
  // working directory, and identically for listing and loadTable — an
  // unqualified Path handed to the parquet reader could re-anchor against
  // a different default FS (listing from one location, reading another).
  private def qualifiedRoot: org.apache.hadoop.fs.Path = fs.makeQualified(root)

  private def isStore(dir: org.apache.hadoop.fs.Path): Boolean = {
    val f = fs
    val meta = new org.apache.hadoop.fs.Path(dir, "_meta.json")
    f.exists(meta) && f.getFileStatus(meta).isFile
  }

  /** Root may be one store (namespace "default") or a directory of them. */
  private def namespaces: Seq[String] = {
    val r = qualifiedRoot
    if (isStore(r)) Seq("default")
    else {
      val f = fs
      if (!f.exists(r)) Seq.empty
      else f.listStatus(r)
        .filter(s => s.isDirectory && isStore(s.getPath))
        .map(_.getPath.getName).sorted.toSeq
    }
  }

  private def storeDir(ns: Array[String]): org.apache.hadoop.fs.Path = {
    if (ns.length != 1) throw new NoSuchNamespaceException(ns)
    // same traversal guard as table names: a namespace is a plain child
    // directory name, never a path
    if (ns.head.isEmpty || ns.head.startsWith(".") ||
        ns.head.contains('/') || ns.head.contains('\\'))
      throw new NoSuchNamespaceException(ns)
    val r = qualifiedRoot
    val dir = if (isStore(r) && ns.head == "default") r
      else new org.apache.hadoop.fs.Path(r, ns.head)
    if (!isStore(dir)) throw new NoSuchNamespaceException(ns)
    dir
  }

  // ---- SupportsNamespaces --------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    namespaces.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { storeDir(namespace); Array.empty } // a store has no children

  override def namespaceExists(namespace: Array[String]): Boolean =
    try { storeDir(namespace); true } catch { case _: NoSuchNamespaceException => false }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    storeDir(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "hep catalog is read-only; create stores with graft.hep.HepWriter")

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("hep catalog is read-only")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("hep catalog is read-only")

  // ---- TableCatalog --------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = storeDir(namespace)
    fs.listStatus(dir)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name()).toArray
  }

  /** Table names the catalog will resolve: plain member-directory names.
    * Anything with a path separator or a leading dot/underscore (internal
    * files, `..` traversal out of the store root) is NOT a table.
    */
  private def validTableName(name: String): Boolean =
    name.nonEmpty && !name.startsWith("_") && !name.startsWith(".") &&
      !name.contains('/') && !name.contains('\\')

  override def loadTable(ident: Identifier): Table = {
    if (!validTableName(ident.name())) throw new NoSuchTableException(ident)
    val dir = new org.apache.hadoop.fs.Path(storeDir(ident.namespace()), ident.name())
    val f = fs
    if (!f.exists(dir) || !f.getFileStatus(dir).isDirectory)
      throw new NoSuchTableException(ident)
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(dir.toString),
      None,
      classOf[ParquetFileFormat])
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "hep catalog is read-only; write events with graft.hep.HepWriter")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("hep catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("hep catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("hep catalog is read-only")
}
