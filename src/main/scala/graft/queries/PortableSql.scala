package graft.queries

/** Shared spellings for oracle SQL that must mean the SAME thing in
  * every engine version (the r7 `integrity_checksum` lesson: the
  * builder's DuckDB and the driver's DuckDB resolved the nonstandard
  * `CAST('0x'||hex AS BIGINT)` path differently, turning a locally
  * green oracle red driver-side). Everything here sticks to operators
  * whose semantics are fixed by SQL itself — instr / substr / integer
  * `*` `+` `%` — so no engine version has room to disagree.
  * `tools/compare_oracle.py`'s portability probe enforces that the
  * banned spellings never reappear in `oracle_sql.json`.
  */
object PortableSql {

  /** SQL expression for the integer value of the first `digits` hex
    * chars of the (lowercase-hex) string expression `m`, via positional
    * arithmetic: Σ (instr('0123456789abcdef', substr(m,i,1)) − 1) ·
    * 16^(digits−i). Max 15 digits (60 bits) to stay inside BIGINT.
    */
  def hexValue(m: String, digits: Int): String = {
    require(digits >= 1 && digits <= 15, "1..15 hex digits fit BIGINT")
    (1 to digits).map { i =>
      // the digit is CAST to BIGINT before scaling: engines disagree on
      // instr's return type (BIGINT in DuckDB, INT in Spark), and an
      // INT digit times an int-ranged weight overflows 32 bits — found
      // by PropertySpec's cross-evaluation of this very spelling
      val weight = java.math.BigInteger.valueOf(16L).pow(digits - i).longValueExact()
      val digit = s"CAST(instr('0123456789abcdef', substr($m, $i, 1)) AS BIGINT) - 1"
      if (weight == 1L) s"($digit)" else s"($digit) * $weight"
    }.mkString(" + ")
  }

  /** Portable truncating integer division for NON-NEGATIVE integer
    * operands — replaces DuckDB-specific `a // b`. Spelled
    * `(a - a % b) / b`: the numerator is exactly divisible, so even
    * though `/` is float division in DuckDB, the quotient is an
    * integer computed without rounding (exact while q·b < 2^53 — far
    * beyond every rank/chunk value in this repo). `%` on non-negative
    * integers is identical in every engine.
    */
  def intDiv(a: String, b: String): String =
    s"CAST((($a) - (($a) % ($b))) / ($b) AS BIGINT)"
}
