package graft

/** Deterministic integer hashing used by the dedup / fingerprint operators.
  *
  * Everything here is pure 64-bit integer arithmetic chosen so that the exact
  * same computation is expressible in DuckDB SQL (the correctness oracle):
  * a left fold of `acc * 31 + charCode (mod m)` over the characters of a
  * string. Intermediate values stay far below 2^63 (m <= 2^32, multipliers
  * <= 10^6), so neither engine can overflow or diverge.
  *
  * Spark side: built from codegen-friendly `functions._` higher-order
  * expressions (transform/aggregate/sequence) — no UDFs, stays inside
  * whole-stage codegen and distributes per-row with zero shuffle.
  */
object Hashing {
  /** Large prime modulus for shingle / fingerprint hashes. */
  val P: Long = 1000000007L

  /** 2^32 modulus for simhash word hashes (32 usable bits). */
  val M32: Long = 4294967296L

  /** MinHash parameter set: (j, a, b) for h_j(x) = (a*x + b) mod P.
    * `a` is kept < 10^6 so a*x < 10^15 << 2^63. Generated from a fixed
    * multiplicative sequence — stable across rounds. */
  val minhashParams: Seq[(Int, Long, Long)] =
    (0 until 16).map { j =>
      val a = ((j * 2654435761L + 1013904223L) % 999983L) | 1L
      val b = (j * 97531L + 12345L)             % 999979L
      (j, a, b)
    }

  /** Number of minhash rows per LSH band (16 hashes -> 4 bands of 4). */
  val bandRows = 4

  // Spark-side hashing lives in graft.functions.HashExpressions (codegen'd
  // Catalyst expressions); the interpreted transform/aggregate variants that
  // used to live here were superseded and removed.

  // --------------------------------------------------------------- DuckDB

  /** DuckDB expression computing the same rolling hash over varchar `s`.
    * `v` names the lambda variables — must be unique when nested inside
    * another lambda (DuckDB lambda parameters shadow outer scopes). */
  def duckRollHash(s: String, m: Long, v: String = "ci"): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($s)+1), $v -> CAST(unicode(($s)[$v]) AS BIGINT))), " +
      s"(${v}a, ${v}b) -> (${v}a*31 + ${v}b) % $m)"

  /** DuckDB VALUES clause for the minhash parameter table (j, a, b). */
  def duckMinhashParams: String =
    minhashParams.map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ")
}
