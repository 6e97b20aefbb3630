package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTest {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8")),
      MediaRecord(2L, "video", ("frame" * 20).getBytes("UTF-8")),
      MediaRecord(3L, "audio", "pcm".getBytes("UTF-8"))
    ).toDS()
  }

  test("decodeFeatures is deterministic and keeps one row per record") {
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(a.forall(f => f.n_bytes > 0 && f.width >= 16 && f.height >= 16))
  }

  test("video records report multiple frames, others exactly one") {
    val fs = Multimodal.decodeFeatures(media).collect()
      .map(f => f.kind -> f.n_frames).toMap
    assert(fs("video") > 1)
    assert(fs("image") == 1 && fs("audio") == 1)
  }

  test("sampleFrames explodes only video payloads with strided chunks") {
    val frames = Multimodal.sampleFrames(media, stride = 16).collect()
    assert(frames.nonEmpty)
    assert(frames.map(_.getLong(0)).toSet == Set(2L))
    assert(frames.map(_.getInt(1)).forall(_ % 2 == 0)) // every 2nd chunk
  }

  test("full training-data shape: decode -> featurize -> embed -> ANN") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    // media -> stub features -> deterministic fake embedding (bytes-driven)
    // -> cosine top-k against itself: the end-to-end pipeline plumbing a
    // real decoder/encoder would slot into without schema changes
    val media = (0 until 20).map(i =>
      MediaRecord(i.toLong, "image", s"payload-$i-${"x" * (i % 5)}".getBytes("UTF-8"))).toDS()
    val feats = Multimodal.decodeFeatures(media)
    val embedded = feats.toDF()
      .select(col("media_id").as("vec_id"),
        array((0 until 8).map(j =>
          (pmod(pmod(col("checksum"), lit(100000)) * (j + 1), lit(1000))
            .cast("double") / 1000.0)): _*)
          .as("cv"))
    val queries = embedded.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("cv").as("qv"))
    val top = graft.operators.Similarity.bruteForceTopK(queries, embedded, 3)
      .orderBy("rn").select("vec_id").collect().map(_.getLong(0))
    assert(top.head == 0L) // self-match ranks first
    assert(top.length == 3)
  }

  test("fromDocuments wraps text tables in the media schema") {
    import spark.implicits._
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload"))
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.count() == 1)
  }

  test("resize bounds every payload to the target grid, deterministically") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Array.tabulate(1000)(_.toByte)),
      Multimodal.MediaRecord(2L, "image", Array.tabulate(7)(_.toByte)),
      Multimodal.MediaRecord(3L, "image", Array.emptyByteArray)).toDS()
    val r = Multimodal.resize(media, 8, 4).collect().sortBy(_.media_id)
    assert(r.forall(x => x.width == 8 && x.height == 4))
    assert(r(0).payload.length == 32 && r(1).payload.length == 32)
    assert(r(2).payload.isEmpty)
    // strided selection is reproducible
    val again = Multimodal.resize(media, 8, 4).collect().sortBy(_.media_id)
    assert(r.zip(again).forall { case (a, b) => a.payload.sameElements(b.payload) })
  }
}
