package graft.llm

/** Cross-engine deterministic primitives shared by the LLM-pipeline
  * operators and their DuckDB oracles.
  *
  * The driver's correctness gate hash-compares Spark output against
  * DuckDB running `oracleSql` — so every pseudo-random quantity
  * (MinHash permutations, SimHash bit mixing, LSH hyperplanes) must be
  * computable bit-identically in BOTH engines. Rather than relying on
  * engine-native `hash()` (xxhash64 in Spark, its own algorithm in
  * DuckDB), everything derives from md5, which both engines implement
  * per RFC 1321:
  *
  *   H(s) = int(md5(s)[0:15 hex chars])  — a 60-bit non-negative value
  *
  * 60 bits keeps all arithmetic inside a signed 64-bit BIGINT with
  * headroom, so shifts/sums below never overflow in either engine.
  *
  * Different hash *families* are obtained by prefixing a seed:
  * `H(seed || '|' || s)` — the standard way to derive k MinHash
  * permutations from one base hash.
  */
object Portable {

  /** Spark SQL snippet: 60-bit md5 hash of string expression `e`. */
  def hSpark(e: String): String =
    s"cast(conv(substring(md5($e), 1, 15), 16, 10) as bigint)"

  /** DuckDB snippet: identical value for the same input. */
  def hDuck(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** Seeded variant: hash family member `seed` (int or column snippet). */
  def hSparkSeeded(seed: String, e: String): String =
    hSpark(s"concat(cast($seed as string), '|', $e)")

  def hDuckSeeded(seed: String, e: String): String =
    hDuck(s"(($seed)::VARCHAR || '|' || ($e))")

  /** JVM twin of [[hSpark]]/[[hDuck]] — same 60-bit md5 value. Used to
    * PRECOMPUTE row-independent pseudo-random quantities (LSH
    * hyperplanes) on the driver and inline them as literals in both
    * engines' queries: the per-row md5 work disappears from the data
    * plane entirely, and cross-engine agreement becomes trivial (both
    * sides read the same constants). */
  def h(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
