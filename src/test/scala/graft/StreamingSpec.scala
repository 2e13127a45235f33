package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.geo.{functions => G}
import graft.sources.Images
import graft.streaming.StreamingTiles

/** Batch/stream parity: the streaming rollups must produce exactly the
  * batch results on the same input, including across a second incremental
  * batch resumed from the same checkpoint (exactly-once file source). */
class StreamingSpec extends SparkFunSuite {

  private def runAvailableNow(df: org.apache.spark.sql.DataFrame,
                              name: String, ckpt: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streaming leaf tiles == batch leaf tiles, incrementally") {
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ck").toString
    val imgs = Images.images(spark, SparkSpec.Sf)
      .select("image_id", "lat", "lon", "w", "h", "phash")

    // batch 1: first half of the table
    imgs.filter(col("phash") % 2 === 0).write.mode("append").parquet(inDir)
    runAvailableNow(StreamingTiles.leafTileStream(spark, inDir, 10), "tiles", ckpt)

    // batch 2: the rest lands later; resume from the same checkpoint
    imgs.filter(col("phash") % 2 =!= 0).write.mode("append").parquet(inDir)
    runAvailableNow(StreamingTiles.leafTileStream(spark, inDir, 10), "tiles", ckpt)

    val got = spark.table("tiles").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = imgs
      .withColumn("cell", G.cell_encode(col("lat"), col("lon"), lit(10)))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"),
        sum((col("w") * col("h") * 3).cast("long")).as("bytes_sum"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("streaming pyramid (all levels) == batch pyramid, across a resume") {
    val inDir = Files.createTempDirectory("graft-stream-pyr").toString
    val ckpt = Files.createTempDirectory("graft-stream-pyrck").toString
    val imgs = Images.images(spark, SparkSpec.Sf)
      .select("image_id", "lat", "lon", "w", "h", "phash")

    // increment 1, then increment 2 resumed from the same checkpoint
    imgs.filter(col("phash") % 2 === 0).write.mode("append").parquet(inDir)
    runAvailableNow(StreamingTiles.pyramidStream(spark, inDir, 8, 10), "pyr", ckpt)
    imgs.filter(col("phash") % 2 =!= 0).write.mode("append").parquet(inDir)
    runAvailableNow(StreamingTiles.pyramidStream(spark, inDir, 8, 10), "pyr", ckpt)

    val got = spark.table("pyr").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // batch truth: per-level leaf grouping over the full table
    val want = imgs
      .select(explode(G.cell_encode_multi(col("lat"), col("lon"), 8, 10)).as("cell"),
        (col("w") * col("h") * 3).cast("long").as("b"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"), sum(col("b")).as("bytes_sum"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // all three levels present and each level's totals equal the image count
    val perRes = got.keys.toSeq.groupBy(c => (c >>> 58).toInt)
    assert(perRes.keySet == Set(8, 9, 10))
    val total = imgs.count()
    perRes.foreach { case (res, cells) =>
      assert(cells.map(c => got(c)._1).sum == total, s"level $res undercounts")
    }
  }

  test("streaming event windows == batch windows") {
    val inDir = Files.createTempDirectory("graft-stream-ev").toString
    val ckpt = Files.createTempDirectory("graft-stream-evck").toString
    spark.read.parquet(s"${SparkSpec.Sf}/events.parquet")
      .write.mode("append").parquet(inDir)
    runAvailableNow(StreamingTiles.eventWindowStream(spark, inDir), "ev_win", ckpt)

    val got = spark.table("ev_win").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap
    val want = spark.read.parquet(s"${SparkSpec.Sf}/events.parquet")
      .withColumn("ets", col("ts").cast("timestamp"))
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want && got.nonEmpty)
  }
}
