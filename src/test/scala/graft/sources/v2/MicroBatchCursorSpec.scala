package graft.sources.v2

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side unit test of the micro-batch offset cursor — no Spark
  * session needed: the restart contract is that a fresh stream instance,
  * handed a checkpointed offset via deserializeOffset, must never publish
  * an offset BELOW it (which would regress the offset log and replay
  * already-emitted ids into an append sink).
  */
class MicroBatchCursorSpec extends AnyFunSuite {

  private def stream(rowsPerBatch: Long) =
    new SyntheticDocsMicroBatch(0L, 10000L, 4, 42L,
      StructType(SyntheticDocs.schema.fields.take(1)), rowsPerBatch)

  test("fresh instance after checkpoint restore never publishes below the restored offset") {
    val s = stream(100L)
    s.deserializeOffset("5000") // checkpoint restore path
    val next = s.latestOffset().asInstanceOf[DocsOffset].id
    assert(next >= 5000L, s"published $next regressed below the checkpointed 5000")
    assert(next === 5100L) // advanced by exactly one batch from the watermark
  }

  test("commit also ratchets the cursor") {
    val s = stream(100L)
    s.commit(DocsOffset(7000L))
    assert(s.latestOffset().asInstanceOf[DocsOffset].id === 7100L)
  }

  test("cursor saturates at the corpus end") {
    val s = stream(100L)
    s.deserializeOffset("9990")
    assert(s.latestOffset().asInstanceOf[DocsOffset].id === 10000L)
    assert(s.latestOffset().asInstanceOf[DocsOffset].id === 10000L) // stays
  }
}
