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

  test("frameSample emits ordered frame ranges per media item") {
    val frames = Multimodal.frameSample(media, nFrames = 4).collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getInt(1)).sorted.sameElements(0 until 4))
    val joined = byId(1L).sortBy(_.getInt(1))
      .flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(new String(joined.take(8), "UTF-8") == "fake-png")
  }

  test("decodeMedia is an explicit stub") {
    intercept[NotImplementedError](
      Multimodal.decodeMedia(Array[Byte](1, 2), "image/png"))
  }
}
