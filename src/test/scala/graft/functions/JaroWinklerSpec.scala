package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Native integer-micro Jaro–Winkler (functions/JaroWinkler.scala):
  * textbook vectors re-derived under the declared floor semantics, the
  * codegen/interpreted agreement, and the SQL registration. */
class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerMicro.jwMicro(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("textbook vectors under floor semantics") {
    // MARTHA/MARHTA: jaro = 17/18, prefix 3 → 944444 + 3·55556/10
    assert(jw("MARTHA", "MARHTA") === 961110L)
    // DIXON/DICKSONX: m=4, t=0, l1=5, l2=8 → jaro = (4/5+4/8+4/4)/3
    // num = 16·8+16·5+4·40 = 368; den = 3·40·4 = 480 → 766666
    // prefix 2 → 766666 + 2·233334/10 = 813332
    assert(jw("DIXON", "DICKSONX") === 813332L)
    assert(jw("", "") === 1000000L)
    assert(jw("", "x") === 0L)
    assert(jw("same", "same") === 1000000L)
    assert(jw("abc", "xyz") === 0L)
    // symmetry
    assert(jw("DWAYNE", "DUANE") === jw("DUANE", "DWAYNE"))
  }

  test("prefix reward: JW ranks shared-prefix pair above edit-equal pair") {
    // both pairs are 1 substitution on length 6, but only one shares
    // a 4-char prefix
    assert(jw("ABCDEF", "ABCDXF") > jw("XBCDEF", "YBCDEF"))
  }

  test("BigInt overflow branch: long inputs match the analytic formula") {
    // independent reference: the published formula evaluated in BigInt
    // with (m, t, prefix) known by construction — never the kernel's own
    // arithmetic, so a regression in either branch (or the 14000
    // threshold) fails here instead of shipping silently
    def expected(l1: Int, l2: Int, m: Long, t: Long, prefix: Int): Long = {
      val num = BigInt(m) * m * l2 + BigInt(m) * m * l1 +
        BigInt(m - t) * l1 * l2
      val jaro = (num * 1000000 / (BigInt(3) * l1 * l2 * m)).toLong
      jaro + prefix * (1000000L - jaro) / 10L
    }
    // ~15k codepoints, one trailing substitution: m = 14999, t = 0
    assert(jw("a" * 15000, "a" * 14999 + "b")
      === expected(15000, 15000, 14999L, 0L, 4))
    // transposed tail at long length: every codepoint matches
    // (m = 15001), the final "ab"/"ba" swap is one transposition
    val p = "c" * 14999
    assert(jw(p + "ab", p + "ba") === expected(15001, 15001, 15001L, 1L, 4))
    // branch boundary: max length 14000 stays on the Long path, 14001
    // routes through BigInt — both must agree with the same formula
    assert(jw("a" * 14000, "a" * 13999 + "b")
      === expected(14000, 14000, 13999L, 0L, 4))
    assert(jw("a" * 14001, "a" * 14000 + "b")
      === expected(14001, 14001, 14000L, 0L, 4))
  }

  test("column API ≡ kernel; SQL registration works") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"))
      .toDF("a", "b")
    val viaCol = df.select(
      JaroWinklerMicro.jaro_winkler_micro(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol === Seq(961110L, 813332L))
    // whole-stage codegen path over a larger input agrees with the kernel
    val names = graft.core.Tables.customer(spark, sfDir)
      .select(col("c_name").as("a"),
        expr("concat(substring(c_name, 1, 2), substring(c_name, 4))").as("b"))
    val got = names.select(
        JaroWinklerMicro.jaro_winkler_micro(col("a"), col("b")).as("s"),
        col("a"), col("b"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) === jw(r.getString(1), r.getString(2)))
    }
  }
}
