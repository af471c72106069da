package graft

import graft.ingest.Config

/** F8/H5 parity with /root/reference/lambda/subirDB.py:13-56, golden
  * values from /root/reference/tests/tests.py:104-141.
  */
class ConfigSpec extends SparkSpec {

  private val good = Map(
    "MYSQL_HOST" -> "localhost", "MYSQL_USER" -> "root",
    "MYSQL_PASS" -> "secret", "MYSQL_DB" -> "testdb", "MYSQL_PORT" -> "3307")

  test("read_env ok (tests.py:104-112)") {
    val db = Config.readDb(good)
    assert(db == Config.Db("localhost", "root", "secret", "testdb", 3307))
  }

  test("F8: DB_* aliases coalesce when MYSQL_* absent") {
    val db = Config.readDb(Map(
      "DB_HOST" -> "h", "DB_USER" -> "u", "DB_PASS" -> "p", "DB_NAME" -> "n"))
    assert(db == Config.Db("h", "u", "p", "n", 3306))
  }

  test("F8: MYSQL_NAME db-name alias coalesces (subirDB.py:28)") {
    val db = Config.readDb(good - "MYSQL_DB" + ("MYSQL_NAME" -> "named"))
    assert(db.name == "named")
    // MYSQL_DB still wins when both are present (alias order)
    assert(Config.readDb(good + ("MYSQL_NAME" -> "named")).name == "testdb")
  }

  test("H5: missing env fails fast listing names (tests.py:114-120)") {
    val e = intercept[Config.ConfigError] { Config.readDb(Map.empty) }
    assert(e.getMessage.contains("ENV faltantes"))
  }

  test("unreplaced placeholders rejected (tests.py:122-130)") {
    val e = intercept[Config.ConfigError] {
      Config.readDb(good + ("MYSQL_HOST" -> "${MYSQL_HOST}"))
    }
    assert(e.getMessage.contains("placeholders"))
  }

  test("non-integer port is its own error (tests.py:132-141)") {
    val e = intercept[Config.ConfigError] {
      Config.readDb(good + ("MYSQL_PORT" -> "not-int"))
    }
    assert(e.getMessage.toLowerCase.contains("inválido"))
  }
}
