package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, MinHashSig, SignBitLsh, SimHash64, WordShingles}

/** Session extensions: registers the engine's native expressions for the
  * SQL surface, so `SELECT cosine_similarity(a, b)` /
  * `simhash64(tokens)` / `minhash_sig(shingles, 16)` work anywhere the
  * DataFrame wrappers do. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator extension: the as-of join logical node plans to the
    // co-partitioned single-pass merge exec (graft.plans.AsOfJoinExec)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("jaro_winkler_micro"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerMicro].getName,
        "jaro_winkler_micro"),
      (exprs: Seq[Expression]) =>
        graft.functions.JaroWinklerMicro(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(text, Literal(n: Int, IntegerType)) => WordShingles(text, n)
        case _ => throw new IllegalArgumentException(
          s"word_shingles(text, n): expected (STRING, INT literal), got ${exprs.mkString(", ")}")
      }))
    e.injectFunction((
      new FunctionIdentifier("sign_bit_lsh"),
      new ExpressionInfo(classOf[SignBitLsh].getName, "sign_bit_lsh"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(v, Literal(dim: Int, IntegerType), Literal(p: Int, IntegerType)) =>
          SignBitLsh(v, dim, p)
        case _ => throw new IllegalArgumentException(
          s"sign_bit_lsh(v, dim, nPlanes): expected (ARRAY<DOUBLE>, INT literal, INT literal), got ${exprs.mkString(", ")}")
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(arr, Literal(k: Int, IntegerType)) => MinHashSig(arr, k)
        case _ => throw new IllegalArgumentException(
          s"minhash_sig(arr, k): expected (ARRAY<STRING>, INT literal), got ${exprs.mkString(", ")}")
      }))
    e.injectFunction((
      new FunctionIdentifier("md5_minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.Md5MinHashSig].getName,
        "md5_minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(arr, Literal(k: Int, IntegerType)) =>
          graft.functions.Md5MinHashSig(arr, k)
        case _ => throw new IllegalArgumentException(
          s"md5_minhash_sig(arr, k): expected (ARRAY<STRING>, INT literal), got ${exprs.mkString(", ")}")
      }))
  }
}
