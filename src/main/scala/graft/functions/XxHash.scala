package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side twin of Spark's `xxhash64(string)` (seed 42): used when
  * a plan needs the hash of a KNOWN literal as a literal — e.g. turning
  * query terms into the bucket ids an index probe prunes on
  * (`Search.rankedSearchIndexed`). Delegates to the same XXH64 kernel
  * the codegen'd expression calls, so the value is identical by
  * construction (pinned in SearchSketchSpec). */
object XxHash {
  def forString(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }
}
