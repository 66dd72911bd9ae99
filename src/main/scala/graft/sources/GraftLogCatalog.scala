package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog half of the batch table surface: changelog tables addressed
  * by NAME through Spark's own SQL resolution, including the time-travel
  * clauses —
  *
  * {{{
  * GraftLogCatalog.register(spark, "glog", "orders_ops",
  *   path, keys = Seq("o_orderkey"))
  * spark.sql("SELECT * FROM glog.orders_ops VERSION AS OF 2")
  * spark.sql("SELECT * FROM glog.orders_ops TIMESTAMP AS OF '1970-01-01 00:00:02.5'")
  * }}}
  *
  * `VERSION AS OF` / `TIMESTAMP AS OF` arrive through the DSv2
  * time-travel contract (`TableCatalog.loadTable(ident, version)` /
  * `loadTable(ident, timestampMicros)` — Spark evaluates the clause to
  * epoch MICROS; [[Changelog]] stamps are millis, converted here), and
  * the loaded table resolves through the same pre-CBO rule as the
  * format reader — so a pure SQL string reaches exactly the library's
  * snapshot plan, guards included.
  *
  * Table definitions live in SESSION CONF (the q156 catalog-DDL
  * discipline — configuration, not a metastore):
  * `spark.sql.catalog.<cat> = graft.sources.GraftLogCatalog` activates
  * the catalog, and each table is three keys under it:
  * `spark.sql.catalog.<cat>.log.<name>.path` (+ `.keys`, and optional
  * `.trackCols` / `.mergeSchema`). [[register]] writes them. The
  * catalog is read-only by design: tables are created by COMMITTING to
  * the log, not by DDL — every mutating verb refuses loudly.
  */
class GraftLogCatalog extends TableCatalog {

  private var catName: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  private def confKey(ident: Identifier, leaf: String): String = {
    val tbl = (ident.namespace() :+ ident.name()).mkString(".")
    s"spark.sql.catalog.$catName.log.$tbl.$leaf"
  }

  private def opt(ident: Identifier, leaf: String): Option[String] =
    Option(SQLConf.get.getConfString(confKey(ident, leaf), null))

  private def baseOpts(ident: Identifier): GraftLog.Opts = {
    val path = opt(ident, "path").getOrElse(
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq))
    val keys = opt(ident, "keys").map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    require(keys.nonEmpty,
      s"${confKey(ident, "keys")} must name the log's key columns")
    GraftLog.Opts(path, keys, None, None, readChangeFeed = false,
      None, None, Seq.empty, None,
      mergeSchema = opt(ident, "mergeSchema").exists(_.toBoolean))
  }

  override def loadTable(ident: Identifier): Table =
    new GraftLog.LogTable(baseOpts(ident))

  /** `VERSION AS OF v` — the SQL clause's landing point. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF '$version' on $catName.$ident — changelog " +
          "versions are the numeric commit ids")
    }
    new GraftLog.LogTable(baseOpts(ident).copy(versionAsOf = Some(v)))
  }

  /** `TIMESTAMP AS OF t` — Spark hands epoch micros; stamps are millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    new GraftLog.LogTable(baseOpts(ident).copy(
      timestampAsOfMillis = Some(Math.floorDiv(timestampMicros, 1000L))))

  override def tableExists(ident: Identifier): Boolean =
    opt(ident, "path").isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = s"spark.sql.catalog.$catName.log."
    SQLConf.get.getAllConfs.keys.toSeq
      .filter(k => k.startsWith(prefix) && k.endsWith(".path"))
      .map(_.stripPrefix(prefix).stripSuffix(".path"))
      .sorted
      .map { full =>
        val parts = full.split("\\.")
        Identifier.of(parts.dropRight(1), parts.last)
      }
      .filter(_.namespace().sameElements(namespace))
      .toArray
  }

  private def readOnly(verb: String): Nothing =
    throw new UnsupportedOperationException(
      s"GraftLogCatalog is read-only: $verb is not supported — tables " +
        "are created and mutated by COMMITTING to the log " +
        "(Changelog.commit*/LogSink), never by catalog DDL")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

object GraftLogCatalog {

  /** Session-conf registration of catalog `cat` and table `name` over
    * the log at `path` — after this, `SELECT … FROM cat.name [VERSION
    * AS OF v | TIMESTAMP AS OF t]` resolves through the engine.
    * Idempotent; re-registration re-points the name.
    */
  def register(spark: SparkSession, cat: String, name: String,
               path: String, keys: Seq[String],
               mergeSchema: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftLogCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.log.$name.path", path)
    spark.conf.set(s"spark.sql.catalog.$cat.log.$name.keys",
      keys.mkString(","))
    if (mergeSchema)
      spark.conf.set(s"spark.sql.catalog.$cat.log.$name.mergeSchema", "true")
  }
}
