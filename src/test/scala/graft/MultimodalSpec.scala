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

  test("extractFeatures: native expressions, no RDD boundary in the plan") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.asPayload(df, "text", "text", "utf8"), "doc_id", "payload")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"plan exits Catalyst:\n$plan")
  }

  test("extractFeaturesBatched (typed mapPartitions codec path) matches the native path") {
    val df = Seq((1L, "abc"), (2L, "zzzzzz"), (3L, ""), (4L, "mixed bytes é世")).toDF("doc_id", "text")
    val payload = Multimodal.asPayload(df, "text", "text", "utf8")
    val native = Multimodal.extractFeatures(payload, "doc_id", "payload")
      .orderBy($"id").collect()
    val batched = Multimodal.extractFeaturesBatched(payload, "doc_id", "payload")
      .orderBy($"id").collect()
    assert(native.length == batched.length)
    native.zip(batched).foreach { case (n, b) =>
      assert(n.getLong(0) == b.getLong(0) && n.getLong(1) == b.getLong(1))
      assert(n.getDouble(2) == b.getDouble(2)) // entropy, bit-exact
      assert(n.getLong(3) == b.getLong(3)) // head hash
      assert(n.getSeq[Float](4) == b.getSeq[Float](4))
    }
  }

  test("extractFeatures: null payload treated as empty bytes") {
    val df = Seq((1L, Some(Array[Byte](1, 2, 3))), (2L, None))
      .toDF("doc_id", "payload")
    val rows = Multimodal.extractFeatures(df, "doc_id", "payload")
      .orderBy($"id").collect()
    assert(rows(1).getLong(1) == 0L && rows(1).getDouble(2) == 0.0)
    assert(rows(1).getSeq[Float](4).forall(_ == 0f))
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
