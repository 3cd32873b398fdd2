package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE portable salted hash — single source for every operator whose
  * oracle replays hashing externally ([[graft.operators.Sampling]],
  * [[graft.operators.Sketches]]): first 60 bits of md5(salt ␁ key).
  *
  * One definition on purpose: the DuckDB twin (`duckHash60` in
  * `graft.Queries`) must stay byte-in-lockstep with this expression,
  * and divergent copies would desynchronize silently. (q19's token hash
  * is a DIFFERENT, deliberately unsalted recipe — md5 over the raw
  * token bytes — and lives with its oracle in Queries.)
  *
  * chr(1) joining prevents (salt, key) aliasing (salts must not contain
  * chr(1)); 15 hex digits = 60 bits keeps the value positive in a
  * signed BIGINT on both engines.
  */
object PortableHash {
  def hash60(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat_ws("\u0001", lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")
}
