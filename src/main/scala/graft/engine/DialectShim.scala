package graft.engine

/** Statement router + Flink→Spark SQL dialect rewrites (SURVEY.md §7.1
  * item 3). String-level: everything Spark SQL parses natively passes
  * through untouched; only the Flink-isms the reference exercises get
  * handled here.
  */
object DialectShim {

  sealed trait Routed
  final case class EngineDdl(spec: TableSpec) extends Routed
  final case class SetConf(key: String, value: String) extends Routed
  final case class CreateCatalog(name: String, options: Map[String, String]) extends Routed
  final case class UseCatalog(name: String) extends Routed
  final case class StatementSet(statements: Seq[String]) extends Routed
  final case class DropTable(name: String, ifExists: Boolean) extends Routed
  final case class InsertInto(target: String, overwrite: Boolean, query: String) extends Routed
  final case class Passthrough(sql: String) extends Routed

  private val SetRe = """(?is)\s*SET\s+'([^']+)'\s*=\s*'([^']*)'\s*;?\s*""".r
  private val SetBareRe = """(?is)\s*SET\s+([\w.\-]+)\s*=\s*(\S+)\s*;?\s*""".r
  private val CreateCatalogRe =
    """(?is)\s*CREATE\s+CATALOG\s+([`\w]+)\s+WITH\s*\((.*)\)\s*;?\s*""".r
  private val UseCatalogRe = """(?is)\s*USE\s+CATALOG\s+([`\w]+)\s*;?\s*""".r
  private val DropTableRe =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([`\w.]+)\s*;?\s*""".r
  private val ExecStmtSetRe =
    """(?is)\s*EXECUTE\s+STATEMENT\s+SET\s+BEGIN\s+(.*)\s+END\s*;?\s*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+([`\w.]+)\s+(SELECT.*|VALUES.*)""".r

  def route(sql: String): Routed = sql match {
    case _ if FlinkDdl.isCreateTableWith(sql) => EngineDdl(FlinkDdl.parse(sql))
    case SetRe(k, v) => SetConf(k, v)
    case SetBareRe(k, v) => SetConf(k, v)
    case CreateCatalogRe(name, opts) =>
      CreateCatalog(name.stripPrefix("`").stripSuffix("`"),
        FlinkDdl.parseOptions(opts))
    case UseCatalogRe(name) =>
      UseCatalog(name.stripPrefix("`").stripSuffix("`"))
    case DropTableRe(ifExists, name) =>
      DropTable(name.stripPrefix("`").stripSuffix("`"), ifExists != null)
    case ExecStmtSetRe(body) =>
      StatementSet(body.split(';').map(_.trim).filter(_.nonEmpty).toSeq)
    // Flink `SHOW JARS` → Spark `LIST JARS` (ADD JAR is spelled identically)
    case s if s.trim.toUpperCase.stripSuffix(";").trim == "SHOW JARS" =>
      Passthrough("LIST JARS")
    case InsertRe(verb, target, query) =>
      InsertInto(target.stripPrefix("`").stripSuffix("`"),
        verb.equalsIgnoreCase("OVERWRITE"), rewriteGroupWindows(query))
    case _ => Passthrough(rewriteGroupWindows(sql))
  }

  /** Legacy Flink group-window syntax → Spark window functions:
    * TUMBLE/HOP/SESSION in GROUP BY and their _START/_END accessors
    * (reference query: examples/01-datagen-streaming.flinknb:47).
    * Note HOP argument order flips: Flink HOP(t, slide, size) vs Spark
    * window(t, size, slide).
    */
  def rewriteGroupWindows(sql: String): String = {
    val iv = """INTERVAL\s*'(\d+)'\s*(\w+)"""
    def dur(n: String, u: String) = {
      val unit = u.toLowerCase
      s"$n ${if (unit.endsWith("s")) unit else unit + "s"}"
    }
    var out = sql
    // accessors first (TUMBLE_START would otherwise match the TUMBLE rule)
    out = s"""(?is)TUMBLE_START\\s*\\(\\s*[\\w.`]+\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, _ => "window.start")
    out = s"""(?is)TUMBLE_END\\s*\\(\\s*[\\w.`]+\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, _ => "window.end")
    out = s"""(?is)HOP_START\\s*\\(\\s*[\\w.`]+\\s*,\\s*$iv\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, _ => "window.start")
    out = s"""(?is)HOP_END\\s*\\(\\s*[\\w.`]+\\s*,\\s*$iv\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, _ => "window.end")
    out = s"""(?is)SESSION_START\\s*\\(\\s*[\\w.`]+\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, _ => "session_window.start")
    out = s"""(?is)SESSION_END\\s*\\(\\s*[\\w.`]+\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, _ => "session_window.end")
    out = s"""(?is)TUMBLE\\s*\\(\\s*([\\w.`]+)\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, m => s"window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    out = s"""(?is)HOP\\s*\\(\\s*([\\w.`]+)\\s*,\\s*$iv\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, m =>
        s"window(${m.group(1)}, '${dur(m.group(4), m.group(5))}', '${dur(m.group(2), m.group(3))}')")
    out = s"""(?is)SESSION\\s*\\(\\s*([\\w.`]+)\\s*,\\s*$iv\\s*\\)""".r
      .replaceAllIn(out, m =>
        s"session_window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    out
  }
}
