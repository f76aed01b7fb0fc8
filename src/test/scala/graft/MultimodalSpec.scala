package graft

import graft.operators.Multimodal

/** The multimodal plumbing: deterministic stub decode and the
  * partition-batched typed decode surface. */
class MultimodalSpec extends SparkSuite {

  test("decodeStub chunk means are deterministic and hand-computable") {
    // 8 bytes → 4 chunks of 2: means (1.5, 3.5, 5.5, 7.5)
    val payload = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    assert(Multimodal.decodeStub(payload).toSeq == Seq(1.5, 3.5, 5.5, 7.5))
    // unsigned byte handling: 0xFF reads as 255, not -1
    assert(Multimodal.decodeStub(Array(0xff.toByte)).toSeq == Seq(255.0, 0.0, 0.0, 0.0))
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("decodeBatch emits one 4-feature row per document") {
    val ds = Multimodal.decodeBatch(spark, "/root/testdata/sf0.001")
    val rows = ds.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.feature.length == 4))
    assert(rows.forall(r => r.n_bytes > 0))
    // features are byte means — bounded by the byte range
    assert(rows.forall(_.feature.forall(f => f >= 0.0 && f <= 255.0)))
  }
}
