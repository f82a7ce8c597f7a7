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
