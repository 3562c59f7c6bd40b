package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Portable deterministic hashing shared by the dedup / similarity
 * operators AND their DuckDB oracles. The primitive is the first 60 bits
 * of md5 — both engines compute it from the same bytes:
 *
 *   Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
 *   DuckDB: ('0x' || substr(md5(s), 1, 15)) :: BIGINT
 *
 * Everything above it (minhash permutations, simhash bits, LSH bands,
 * hyperplane signs) is integer arithmetic, so results are bit-identical
 * across engines — which is what lets the driver hash-compare near-dup
 * and ANN results instead of settling for rows-only checks.
 *
 * All of it is built-in codegen'd expressions: at 100 TB the md5 is the
 * only per-token cost, comparable to what any shingle-hashing engine pays.
 */
object Hashing {

  /** Modulus for permutation hashing: 2^31 - 1 (prime). Products
   * a * (h % P) stay under 2^62 — no overflow in either engine. */
  val P: Long = 2147483647L

  /** 60-bit md5-derived hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Driver-side twin of [[h60]] for deriving constants (e.g. LSH
   * hyperplanes) that are literal-embedded into both plans. */
  def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** DuckDB SQL fragment computing h60 of `expr`. */
  def h60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** MinHash permutation constants (a, b) — fixed LCG so Spark plan and
   * oracle SQL embed identical literals. */
  def minhashPerms(n: Int): Seq[(Long, Long)] =
    (1 to n).map { j =>
      val a = (1103515245L * j + 12345L) % P
      val b = (1103515245L * (j + 100) + 54321L) % P
      (if (a == 0) 1L else a, b)
    }
}
