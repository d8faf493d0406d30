package graft

import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._

/** Alternative-plan equivalences: same semantics, different physical shape,
  * output pinned equal to the registered (oracle-checked) form.
  */
class TextOpsAltSpec extends AnyFunSuite {

  test("per-row-fold minhash == explode-form minhash (bit-equal candidate pairs)") {
    import graft.queries.TextOps
    val viaExplode = TextOps.dedupMinhashLsh(spark, Sf001).collect().toSeq
    val viaFold = TextOps.dedupMinhashPerRow(spark, Sf001).collect().toSeq
    assert(viaFold === viaExplode)
    assert(viaFold.nonEmpty)
  }
}
