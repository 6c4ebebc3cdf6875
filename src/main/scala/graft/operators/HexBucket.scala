package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared md5-hex-prefix construction behind every deterministic
  * selection operator ([[Splits]], [[Mixing]]): the first `width` hex
  * chars of md5(salt || key-as-string), compared lexicographically
  * (fixed-width hex sorts like the number it spells).
  *
  * The Column form and the SQL form MUST stay byte-identical — the
  * DuckDB oracles replay the SQL form against the Spark results — so
  * both live here and nowhere else. */
private[operators] object HexBucket {

  def prefix(key: Column, salt: String, width: Int): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, width)

  def prefixSql(keyExpr: String, salt: String, width: Int): String =
    s"substr(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, $width)"
}
