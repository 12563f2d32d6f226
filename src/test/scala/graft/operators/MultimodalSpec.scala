package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  test("payloads: binary column + typed metadata, partitioning preserved") {
    val ds = payloads(spark, sfDir)
    assert(ds.schema("payload").dataType.typeName == "binary")
    assert(ds.schema("modality").dataType.typeName == "string")
    val reparted = ds.repartition(8)
    assert(reparted.rdd.getNumPartitions == 8)
    val row = ds.head()
    assert(new String(row.payload, "UTF-8").nonEmpty)
  }

  test("decodeStub: deterministic fake features with the real batch shape") {
    val ds = payloads(spark, sfDir).repartition(4)
    val feats = decodeStub(ds)
    // schema is the decode contract a real decoder must honor
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "modality", "width", "height", "n_bytes", "feature"))
    val a = feats.collect().sortBy(_.doc_id)
    val b = decodeStub(payloads(spark, sfDir)).collect().sortBy(_.doc_id)
    assert(a.map(_.n_bytes).sameElements(b.map(_.n_bytes)), "decode must be deterministic")
    assert(a.forall(f => f.feature.length == math.min(8, f.n_bytes)))
    assert(a.forall(f => f.feature.forall(x => x >= 0f && x <= 1f)))
  }

  test("decodeImage: real PNG decode via javax.imageio, exact pixels") {
    import spark.implicits._
    // 2x2 PNG with known pixels, written by the same JVM codec that will
    // read it back (lossless format -> exact round-trip).
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red
    img.setRGB(1, 0, 0x00ff00) // green
    img.setRGB(0, 1, 0x0000ff) // blue
    img.setRGB(1, 1, 0xffffff) // white
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val notAnImage = "just text bytes".getBytes("UTF-8")
    val ds = Seq(
      MediaPayload(1L, "image", png),
      MediaPayload(2L, "image", notAnImage)).toDS()
    val out = decodeImage(ds).collect().sortBy(_.doc_id)

    val decoded = out(0)
    assert(decoded.width == 2 && decoded.height == 2)
    assert(decoded.n_bytes == png.length.toLong)
    // row-major integer-mean luminance: (r+g+b)/3 then /255
    val expected = Array(255 / 3, 255 / 3, 255 / 3, 255).map(_ / 255.0f)
    assert(decoded.feature.sameElements(expected),
      s"got ${decoded.feature.mkString(",")}")

    // undecodable payload degrades to the stub, never crashes the partition
    val fallback = out(1)
    assert(fallback.n_bytes == notAnImage.length.toLong)
    assert(fallback.width == notAnImage.length % 640 &&
      fallback.height == notAnImage.length % 480)
  }

  test("frame sampling emits every 3rd 32-byte frame") {
    val out = queries("q61_multimodal_frames")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val fs = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(fs.forall(_._2 % FrameStride == 0))
    // frame count per doc matches ceil(nframes / stride)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), (floor(length(col("text")) / FrameSize)).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = fs.groupBy(_._1).view.mapValues(_.length)
    counts.foreach { case (d, n) =>
      val nf = docs(d)
      assert(n == (nf + FrameStride - 1) / FrameStride)
    }
  }
}
