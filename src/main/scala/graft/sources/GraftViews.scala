package graft.sources

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{Identifier, View}
import org.apache.spark.sql.types.{DataType, StructType}

/** Catalog VIEW storage for [[GraftCatalog]]'s `ViewCatalog` surface —
  * `CREATE/DROP/ALTER/SHOW VIEW` and `SELECT` against named view
  * definitions, resolved by Spark's analyzer against the view's RECORDED
  * context (capturing catalog + namespace at create time, so a view body
  * written as `FROM t` keeps meaning the t it meant — Spark's
  * view-resolution contract).
  *
  * Storage: one `_graft_views/<name>.view` file per view under the
  * NAMESPACE directory — URL-encoded `key=value` lines (the SQL text and
  * schema JSON survive newlines/equals), written via temp-file + rename
  * like every other metadata file here. Views are metadata-only: no data
  * files, no manifest interaction; DROP TABLE never sees them and DROP
  * VIEW never touches tables (the namespaces are disjoint by file layout).
  */
object GraftViews {

  val ViewsDir = "_graft_views"
  private val Suffix = ".view"

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  private def viewPath(nsDir: Path, name: String): Path =
    new Path(new Path(nsDir, ViewsDir), s"${name}$Suffix")

  def exists(fs: FileSystem, nsDir: Path, name: String): Boolean =
    fs.exists(viewPath(nsDir, name))

  def list(fs: FileSystem, nsDir: Path): Seq[String] = {
    val d = new Path(nsDir, ViewsDir)
    if (!fs.exists(d)) return Nil
    fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(Suffix)).map(_.stripSuffix(Suffix)).sorted
  }

  case class StoredView(ident: Identifier, sql: String,
                        cat: String, ns: Seq[String],
                        viewSchema: StructType, qCols: Seq[String],
                        aliases: Seq[String], comments: Seq[String],
                        props: Map[String, String]) extends View {
    override def name(): String = ident.toString
    override def query(): String = sql
    override def currentCatalog(): String = cat
    override def currentNamespace(): Array[String] = ns.toArray
    override def schema(): StructType = viewSchema
    override def queryColumnNames(): Array[String] = qCols.toArray
    override def columnAliases(): Array[String] = aliases.toArray
    override def columnComments(): Array[String] = comments.toArray
    override def properties(): java.util.Map[String, String] = {
      val m = new java.util.HashMap[String, String]()
      props.foreach { case (k, v) => m.put(k, v) }
      m
    }
  }

  def write(fs: FileSystem, nsDir: Path, v: StoredView,
            replace: Boolean): Unit = {
    val target = viewPath(nsDir, v.ident.name())
    fs.mkdirs(target.getParent)
    val kv = Seq(
      "sql" -> v.sql,
      "currentCatalog" -> v.cat,
      "currentNamespace" -> v.ns.map(enc).mkString(","),
      "schema" -> v.viewSchema.json,
      "queryColumnNames" -> v.qCols.map(enc).mkString(","),
      "columnAliases" -> v.aliases.map(enc).mkString(","),
      "columnComments" -> v.comments.map(enc).mkString(",")
    ) ++ v.props.toSeq.sorted.map { case (k, pv) => s"p.$k" -> pv }
    val bytes = kv.map { case (k, value) => s"$k=${enc(value)}" }
      .mkString("\n").getBytes(UTF_8)
    val tmp = new Path(target.getParent,
      s".tmp-view-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!replace && fs.exists(target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"view ${v.ident} already exists")
    }
    if (!fs.rename(tmp, target)) {
      fs.delete(target, false)
      require(fs.rename(tmp, target), s"could not install $target")
    }
  }

  def read(fs: FileSystem, nsDir: Path, ident: Identifier): Option[StoredView] = {
    val p = viewPath(nsDir, ident.name())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val kv = lines.flatMap { l =>
      l.split("=", 2) match {
        case Array(k, value) => Some(k -> dec(value))
        case _ => None
      }
    }.toMap
    def arr(k: String): Seq[String] =
      kv.getOrElse(k, "").split(",", -1).toSeq
        .filter(_.nonEmpty).map(dec)
    Some(StoredView(ident, kv("sql"), kv("currentCatalog"),
      arr("currentNamespace"),
      DataType.fromJson(kv("schema")).asInstanceOf[StructType],
      arr("queryColumnNames"), arr("columnAliases"), arr("columnComments"),
      kv.collect { case (k, v) if k.startsWith("p.") =>
        k.stripPrefix("p.") -> v }))
  }

  def drop(fs: FileSystem, nsDir: Path, name: String): Boolean = {
    val p = viewPath(nsDir, name)
    if (!fs.exists(p)) return false
    fs.delete(p, false)
    true
  }
}
