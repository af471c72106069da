package graft.ingest

/** F8/H5: configuration resolution with the reference's exact semantics
  * (/root/reference/lambda/subirDB.py:13-56):
  *
  *   - each setting coalesces over alias names, first non-blank wins
  *     (MYSQL_HOST then DB_HOST, etc.);
  *   - missing settings fail fast, listing every missing name;
  *   - unreplaced `${VAR}` placeholders are rejected by name;
  *   - a non-integer port is its own error class.
  */
object Config {

  final case class ConfigError(message: String) extends RuntimeException(message)

  /** first non-blank value among alias names (F8) */
  def first(env: Map[String, String], names: String*): Option[String] =
    names.iterator
      .flatMap(env.get)
      .map(_.trim)
      .find(_.nonEmpty)

  case class Db(host: String, user: String, pass: String, name: String, port: Int)

  private val placeholder = """\$\{[^}]*\}""".r

  /** Mirror of the reference's `_read_env` (subirDB.py:13-56). */
  def readDb(env: Map[String, String]): Db = {
    val wanted = Seq(
      "host" -> Seq("MYSQL_HOST", "DB_HOST"),
      "user" -> Seq("MYSQL_USER", "DB_USER"),
      "pass" -> Seq("MYSQL_PASS", "DB_PASS"),
      "name" -> Seq("MYSQL_DB", "MYSQL_NAME", "DB_NAME"))
    val resolved = wanted.map { case (k, aliases) => k -> first(env, aliases: _*) }

    val missing = resolved.collect { case (k, None) => k }
    if (missing.nonEmpty)
      throw ConfigError(s"ENV faltantes: ${missing.mkString(", ")}")

    val unreplaced = resolved.collect {
      case (k, Some(v)) if placeholder.findFirstIn(v).isDefined => k
    }
    if (unreplaced.nonEmpty)
      throw ConfigError(
        s"placeholders sin reemplazar en: ${unreplaced.mkString(", ")}")

    val portStr = first(env, "MYSQL_PORT", "DB_PORT").getOrElse("3306")
    val port =
      try portStr.toInt
      catch {
        case _: NumberFormatException =>
          throw ConfigError(s"puerto inválido: '$portStr'")
      }

    val m = resolved.collect { case (k, Some(v)) => k -> v }.toMap
    Db(m("host"), m("user"), m("pass"), m("name"), port)
  }
}
