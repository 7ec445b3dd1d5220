package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing (stub decode, real schema /
  * partitioning / batch shape — see Multimodal scaladoc). */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  lazy val media = Multimodal.fromDocuments(spark, sf)

  test("media table models binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    val n = media.count()
    assert(n == 500)
    val types = media.select("media_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("decodeAll is deterministic and total") {
    val a = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    assert(a.length == 500)
    assert(a.toSeq == b.toSeq)
    // payload is the UTF-8 text, so n_bytes == n_chars fixture column
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach(m => assert(m.n_bytes == chars(m.media_id)))
    a.filter(_.media_type == "audio").foreach(m => assert(m.width == 0))
    a.filter(_.media_type == "video").foreach(m => assert(m.n_frames >= 1))
  }

  test("extractFeatures computes per-record byte statistics") {
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.length == 500)
    f.foreach { x =>
      assert(x.byte_mean > 0 && x.byte_mean < 256)
      assert(x.byte_entropy_x1e4 >= 0 && x.byte_entropy_x1e4 <= 80000)
    }
    // hand-check one record end-to-end
    val doc0 = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id = 0").select("text").collect()(0).getString(0)
    val got = f.find(_.media_id == 0L).get
    assert(got.n_bytes == doc0.getBytes("UTF-8").length)
    val expMean = doc0.getBytes("UTF-8").map(_ & 0xff).sum.toDouble /
      doc0.length
    assert(math.abs(got.byte_mean - expMean) < 1e-9)
  }

  test("resizeAll leaves audio untouched and bounds visual payloads") {
    val r = Multimodal.resizeAll(media, 64, 64).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    r.foreach { m =>
      if (m.media_type == "audio")
        assert(m.content.sameElements(orig(m.media_id).content))
      else assert(m.content.length <= orig(m.media_id).content.length)
    }
  }

  test("sampleFrames explodes videos one row per sampled frame") {
    val frames = Multimodal.sampleFrames(media, 10).collect()
    val videos = Multimodal.decodeAll(media).collect()
      .filter(_.media_type == "video")
    val expected = videos.map(v => (v.n_frames + 9) / 10).sum
    assert(frames.length == expected)
    assert(frames.forall(_.frame_idx % 10 == 0))
  }
}
