package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Name -> path registry: the analogue of the reference's
  * table_name_id/namespace catalog tables (meta_init.sql:5-56; C12 surface:
  * forName, SHOW TABLES, namespaces). Names are `namespace.table` (default
  * namespace "default"). Backed by an append-only log under the warehouse
  * dir (`spark.graft.warehouse`, default /tmp/graft-warehouse); last line
  * per name wins, empty path = dropped. */
object GraftCatalog {

  def warehouseDir(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.warehouse").getOrElse("/tmp/graft-warehouse")

  private def catalogFile(spark: SparkSession) = {
    val dir = Paths.get(warehouseDir(spark))
    Files.createDirectories(dir)
    dir.resolve("catalog.tsv")
  }

  private def qualify(name: String): String =
    if (name.contains('.')) name else s"default.$name"

  def register(spark: SparkSession, name: String, tablePath: String): Unit =
    synchronized {
      Files.write(catalogFile(spark),
        s"${qualify(name)}\t$tablePath\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  def drop(spark: SparkSession, name: String): Unit = synchronized {
    Files.write(catalogFile(spark),
      s"${qualify(name)}\t\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def resolve(spark: SparkSession, name: String): Option[String] =
    listAll(spark).get(qualify(name))

  /** All live tables: fully-qualified name -> path. */
  def listAll(spark: SparkSession): Map[String, String] = {
    val f = catalogFile(spark)
    if (!Files.exists(f)) return Map.empty
    val m = scala.collection.mutable.LinkedHashMap[String, String]()
    Files.readAllLines(f).asScala.foreach { line =>
      val parts = line.split("\t", -1)
      if (parts.length >= 2) {
        if (parts(1).isEmpty) m.remove(parts(0)) else m(parts(0)) = parts(1)
      }
    }
    m.toMap
  }

  def listTables(spark: SparkSession, namespace: String = "default"): Seq[String] =
    listAll(spark).keys.filter(_.startsWith(namespace + ".")).toSeq.sorted

  // Explicitly created namespaces live in the same log under a reserved key
  // (tables may also imply namespaces — the V2 catalog unions both views).
  private val NsPrefix = "__namespace__."

  def registerNamespace(spark: SparkSession, ns: String): Unit =
    register(spark, NsPrefix + ns, ns)

  def dropNamespace(spark: SparkSession, ns: String): Unit =
    drop(spark, NsPrefix + ns)

  def listNamespaces(spark: SparkSession): Seq[String] =
    listAll(spark).keys.collect {
      case k if k.startsWith(NsPrefix) => k.stripPrefix(NsPrefix)
    }.toSeq.sorted
}
