package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image/png", "fake-png-payload-AAAA".getBytes("UTF-8"),
        Row(64, 64, null)),
      Row(2L, "audio/wav", "fake-wav-payload-BBBBBBBB".getBytes("UTF-8"),
        Row(null, null, 2000L)),
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("schema round-trips through parquet (binary + typed meta)") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet reads are always nullable: compare names and types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    assert(back.count() == 2)
  }

  test("extractFeatures: deterministic, normalized, right shape") {
    val f = Multimodal.extractFeatures(media, dim = 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f.keySet == Set(1L, 2L))
    f.values.foreach { v =>
      assert(v.length == 32)
      assert(math.abs(v.sum - 1.0f) < 1e-5)
    }
    val again = Multimodal.extractFeatures(media, dim = 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f == again)
  }

  test("resize updates payload size and typed metadata, preserves schema") {
    val out = Multimodal.resize(media, width = 8, height = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2)
    out.values.foreach { r =>
      assert(r.getAs[Array[Byte]]("bytes").length == 32) // 8*4
      val meta = r.getStruct(3)
      assert(meta.getInt(0) == 8 && meta.getInt(1) == 4)
    }
    // audio row keeps its duration through the metadata rewrite
    assert(out(2L).getStruct(3).getLong(2) == 2000L)
    // deterministic
    val again = Multimodal.resize(media, width = 8, height = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes").toSeq).toMap
    assert(out.keys.forall(k =>
      again(k) == out(k).getAs[Array[Byte]]("bytes").toSeq))
  }

  test("frameSample emits ordered frame ranges per media item") {
    val df = Multimodal.frameSample(media, nFrames = 4)
    // round-7: the byte slicing is pure Catalyst — no ScalaUDF node
    // breaking whole-stage codegen in the plan
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"),
      "frameSample plan still contains a UDF node")
    val frames = df.collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getInt(1)).sorted.sameElements(0 until 4))
    val joined = byId(1L).sortBy(_.getInt(1))
      .flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(new String(joined.take(8), "UTF-8") == "fake-png")
  }

  test("media features flow into the similarity operators end-to-end") {
    // the multimodal -> dedup pipeline: featurize binary payloads,
    // then run the embedding near-dup machinery over the features.
    // Items 1 and 3 share a payload prefix (near-identical byte
    // histograms); item 2 is unrelated.
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      Row(1L, "image/png", ("A" * 400 + "PAD").getBytes("UTF-8"), Row(64, 64, null)),
      Row(2L, "audio/wav", ("zx9" * 200).getBytes("UTF-8"), Row(null, null, 2000L)),
      Row(3L, "image/png", ("A" * 400 + "QED").getBytes("UTF-8"), Row(64, 64, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(df, dim = 32)
      .select(col("media_id").as("v1"), col("feature").as("e1"))
    val pairs = feats.as("x")
      .join(feats.select(col("v1").as("v2"), col("e1").as("e2")).as("y"),
        col("v1") < col("v2"))
      .select(col("v1"), col("v2"), Similarity.cosine("e1", "e2").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 3L)) > 0.99, s"near-dup pair ${pairs((1L, 3L))}")
    assert(pairs((1L, 2L)) < 0.9 && pairs((2L, 3L)) < 0.9, pairs)
  }

  test("decodeMedia is an explicit stub") {
    intercept[NotImplementedError](
      Multimodal.decodeMedia(Array[Byte](1, 2), "image/png"))
  }
}
