package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver runs
  * for the hash-compare gate. `oracle = None` ⇒ the driver records a
  * weaker rows-only check (used for ops whose hashing/seeding cannot be
  * replicated in SQL, e.g. murmur3-based MinHash).
  *
  * Contract (BASELINE.md, SURVEY.md §5.2): column names must match the
  * oracle SQL aliases exactly; every query ends in a total ORDER BY on
  * non-null keys; no nondeterministic functions.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
}
