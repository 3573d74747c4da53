package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal binary-column plumbing: schema, encoder boundary,
  * partition-batch decode stub, and the HLL error bound.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("asMedia produces binary payload + typed metadata") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.asMedia(df, "doc_id", "text")
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("media_type") == "string" && schema("width") == "int")
    val r = m.head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(r.getAs[Int]("width") == 11)
  }

  test("decodeFeatures stub computes deterministic byte statistics") {
    val payload = "abcdef".getBytes("UTF-8")
    val ds = Seq(MediaRow(7L, payload, "text/plain", 6, 1)).toDS()
    val f = Multimodal.decodeFeatures(ds, frameStride = 2).collect().head
    assert(f.n_bytes == 6)
    assert(f.byte_sum == "abcdef".map(_.toLong).sum)
    assert(f.head_hex == payload.map("%02x".format(_)).mkString)
    assert(f.frame_sum == 'a'.toLong + 'c'.toLong + 'e'.toLong) // stride 2: positions 0,2,4
    assert(f.n_sampled == 3)
  }

  test("decode survives empty and binary-unsafe payloads") {
    val ds = Seq(
      MediaRow(1L, Array.emptyByteArray, "text/plain", 0, 1),
      MediaRow(2L, Array[Byte](-1, 0, 127, -128), "application/octet-stream", 4, 1)).toDS()
    val out = Multimodal.decodeFeatures(ds, 16).collect().sortBy(_.doc_id)
    assert(out(0).n_bytes == 0 && out(0).byte_sum == 0 && out(0).n_sampled == 0)
    assert(out(1).byte_sum == 255 + 0 + 127 + 128) // unsigned fold
  }

  test("decode runs partition-parallel with stable results") {
    val rows = (1L to 500L).map(i => MediaRow(i, s"payload-$i".getBytes, "t", 1, 1))
    val a = Multimodal.decodeFeatures(rows.toDS().repartition(8)).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(rows.toDS().repartition(3)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("approx_count_distinct stays within the configured error of exact") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val both = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"exact=$exact approx=$approx")
  }
}
