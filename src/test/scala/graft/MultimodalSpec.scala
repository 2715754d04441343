package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fakeDecode: deterministic, sane entropy bounds") {
    val b = "hello world hello world".getBytes("UTF-8")
    val (len, ent, hash, v) = Multimodal.fakeDecode(b)
    assert(len == b.length)
    assert(ent > 0 && ent <= 8.0) // byte entropy in bits
    assert(Multimodal.fakeDecode(b) == ((len, ent, hash, v)) ||
      Multimodal.fakeDecode(b)._3 == hash) // deterministic (arrays compare by ref)
    val (l0, e0, _, v0) = Multimodal.fakeDecode(Array.emptyByteArray)
    assert(l0 == 0 && e0 == 0.0 && v0.forall(_ == 0f))
  }

  test("asPayload + extractFeatures: schema, ids, and feature values flow") {
    val df = Seq((1L, "abc"), (2L, "zzzzzz")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.asPayload(df, "text", "text", "utf8"), "doc_id", "payload")
    assert(out.columns.toSeq == Seq("id", "byte_len", "byte_entropy", "head_hash", "feature_vec"))
    val rows = out.orderBy($"id").collect()
    assert(rows(0).getLong(1) == 3L && rows(1).getLong(1) == 6L)
    // 'zzzzzz' is a single byte value => entropy 0; 'abc' has 3 distinct => log2(3)
    assert(rows(1).getDouble(2) == 0.0)
    assert(math.abs(rows(0).getDouble(2) - math.log(3) / math.log(2)) < 1e-9)
    assert(rows(0).getSeq[Float](4).length == 8)
  }

  test("resizeStub: deterministic fixed-size output; frameSampleStub: every Nth chunk") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id", "text")
    val payload = Multimodal.asPayload(df, "text", "image", "fake")
    val resized = payload.select(Multimodal.resizeStub(4, 3)($"payload").as("r"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(resized.length == 12)
    val again = payload.select(Multimodal.resizeStub(4, 3)($"payload").as("r"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(resized.toSeq == again.toSeq) // deterministic
    // 26 bytes in 5-byte frames = 6 chunks; every 2nd => chunks 0,2,4 => 3 frames
    val frames = payload.select(Multimodal.frameSampleStub(5, 2)($"payload").as("f"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(frames.length == 3)
    assert(frames(0).toSeq == "abcde".getBytes("UTF-8").toSeq)
    assert(frames(1).toSeq == "klmno".getBytes("UTF-8").toSeq)
  }
}
