package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{CostBasis, MultiModal}
import graft.sources.{PriceSink, Tables, UniverseCsv}

class SourcesMultiModalSpec extends SparkSpec {
  import spark.implicits._

  test("foldTyped (Aggregator) matches the streaming fold on real data") {
    val tr = Tables.trades(spark, sf())
    val a = CostBasis.fold(tr).orderBy("user_id", "ticker").collect()
    val b = CostBasis.foldTyped(tr).orderBy("user_id", "ticker").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1))
      assert(x.getDouble(2) == y.getDouble(2)) // bit-equal qty
      assert(x.getDouble(3) == y.getDouble(3)) // bit-equal avg
      assert(x.getDouble(4) == y.getDouble(4)) // bit-equal realized
    }
  }

  test("universe CSV loader: aliases, BOM, normalization, derived cols") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("u.csv")
    // BOM + alias headers (ticker/name/list) + "(publ)" + extra spaces
    Files.write(f, ("﻿name;ticker;list\n" +
      "Investor  AB (publ);INVE-B.ST;Large\n" +
      "Volvo AB;VOLV-B.ST;Mid\n").getBytes("UTF-8"))
    val df = UniverseCsv.load(spark, f.toString)
    assert(df.columns.toSeq ==
      Seq("yf_symbol", "name_display", "segment", "search_blob", "display"))
    val inv = df.filter($"yf_symbol" === "INVE-B.ST").collect().head
    assert(inv.getAs[String]("name_display") == "Investor AB") // (publ) + spaces gone
    assert(inv.getAs[String]("search_blob") == "investor ab inve-b.st inve-b")
    assert(inv.getAs[String]("display") == "Investor AB — INVE-B.ST")
  }

  test("universe CSV loader: missing required column raises") {
    val dir = Files.createTempDirectory("graft_csv2")
    val f = dir.resolve("bad.csv")
    Files.write(f, "name;list\nFoo;Large\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](UniverseCsv.load(spark, f.toString))
    assert(e.getMessage.contains("yf_symbol"))
  }

  test("price sink: melt + idempotent partitioned append") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/prices"
    val wide = Seq(
      ("2024-01-05", Some(10.0), Some(20.0)),
      ("2024-02-05", None, Some(21.0))).toDF("ts", "AAA", "BBB")
      .withColumn("ts", to_date($"ts"))
    val tidy = PriceSink.melt(wide)
    assert(tidy.count() == 3) // null close dropped
    val n1 = PriceSink.appendDedup(spark, dir, tidy)
    assert(n1 == 3)
    val n2 = PriceSink.appendDedup(spark, dir, tidy) // replay: all dups
    assert(n2 == 0)
    assert(PriceSink.read(spark, dir).count() == 3)
    // new month partition only appends
    val more = Seq(("BBB", "2024-03-05", 22.0)).toDF("ticker", "ts", "close")
      .withColumn("ts", to_date($"ts"))
    assert(PriceSink.appendDedup(spark, dir, more) == 1)
    assert(PriceSink.read(spark, dir).count() == 4)
  }

  test("latestWithFallback prefers live, falls back to stored") {
    val stored = Seq(("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0),
      ("B", "2024-01-01", 5.0)).toDF("ticker", "ts", "close")
      .withColumn("ts", to_date($"ts"))
    val live = Seq(("A", "2024-01-03", 3.0)).toDF("ticker", "ts", "close")
      .withColumn("ts", to_date($"ts"))
    val out = PriceSink.latestWithFallback(live, stored).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("A" -> 3.0, "B" -> 5.0))
  }

  test("watchlist schema is declared and empty frame is schema-stable") {
    val w = graft.sources.Tables.emptyWatchlist(spark)
    assert(w.columns.toSeq == Seq("id", "user_id", "ticker"))
    assert(w.count() == 0)
    // unions against a populated frame keep the schema
    import spark.implicits._
    val one = Seq((1L, "u1", "ERIC-B.ST")).toDF("id", "user_id", "ticker")
    assert(w.unionByName(one).count() == 1)
  }

  test("multimodal: decode meta is deterministic, frames cover the payload") {
    val assets = MultiModal.syntheticAssets(Tables.documents(spark, sf()))
    val dec = MultiModal.decodeMeta(assets)
    val r = dec.filter($"asset_id" === 0).collect().head
    assert(r.getAs[Long]("width") >= 16 && r.getAs[Long]("width") < 256)
    assert(r.getAs[String]("modality") == "image")
    assert(r.getAs[Long]("channels") == 3L)
    val feat = MultiModal.byteFeatures(assets)
    val f = feat.filter($"asset_id" === 0).collect().head
    assert(f.getAs[Long]("byte_sum") > 0 && f.getAs[Long]("byte_max") <= 255)
    val frames = MultiModal.sampleFrames(assets, 64, 2)
    val fr = frames.filter($"asset_id" === 2).orderBy("frame_idx").collect()
    assert(fr.nonEmpty)
    assert(fr.map(_.getAs[Long]("frame_idx")).forall(_ % 2 == 0))
    assert(fr.forall(_.getAs[Long]("frame_len") <= 64))
    // resize halves dims
    val rs = MultiModal.resize(dec, 2).filter($"asset_id" === 0).collect().head
    assert(rs.getAs[Long]("width") == r.getAs[Long]("width") / 2)
  }

  test("multimodal: PNG IHDR parse matches stored ground truth; non-PNG stays on stub") {
    import org.apache.spark.sql.functions._
    val png = spark.read.parquet(graft.queries.PipelineQueries.PngFixture)
    val dec = MultiModal.decodeMeta(
      png.select($"asset_id", lit("image").as("modality"), $"content",
        $"true_width", $"true_height", $"true_bit_depth"))
    assert(dec.filter($"width" =!= $"true_width" ||
      $"height" =!= $"true_height" || $"bit_depth" =!= $"true_bit_depth" ||
      $"color_type" =!= 2L).count() == 0)
    assert(dec.count() == 300)
    // big-endian multi-byte dims really exercised (width 257 and 300 exist)
    assert(dec.filter($"width" > 255).count() > 0)
    // a payload that merely starts with the 8-byte signature but lacks
    // IHDR is NOT treated as PNG — falls back to the stub arm (null depth)
    val fake = MultiModal.decodeMeta(
      spark.range(1).select($"id".as("asset_id"), lit("image").as("modality"),
        concat(lit(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)),
          lit("JUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNK").cast("binary")).as("content")))
    val f = fake.collect().head
    assert(f.isNullAt(f.fieldIndex("bit_depth")))
    assert(f.getAs[Long]("width") >= 16 && f.getAs[Long]("width") < 256)
  }

  test("multimodal: WAV fmt-chunk parse matches stored ground truth (LE fields)") {
    import org.apache.spark.sql.functions._
    val wav = spark.read.parquet(graft.queries.PipelineQueries.WavFixture)
    val dec = MultiModal.decodeMeta(
      wav.select($"asset_id", lit("audio").as("modality"), $"content",
        $"true_sample_rate", $"true_channels", $"true_bits", $"true_duration_ms"))
    assert(dec.filter($"sample_rate" =!= $"true_sample_rate" ||
      $"channels" =!= $"true_channels" || $"bit_depth" =!= $"true_bits" ||
      $"duration_ms" =!= $"true_duration_ms").count() == 0)
    assert(dec.count() == 200)
    // multi-byte LE really exercised: 44100/48000 need all high bytes
    assert(dec.filter($"sample_rate" > 40000).count() > 0)
    // stereo vs mono both present
    assert(dec.select("channels").distinct().count() == 2)
  }

  test("multimodal: PCM sample decode matches the independent Python decoder") {
    import org.apache.spark.sql.functions._
    val wav = spark.read.parquet(graft.queries.PipelineQueries.WavFixture)
    val dec = wav
      .withColumn("_pcm", MultiModal.pcmSampleStats($"content"))
      .select($"asset_id", $"true_bits", $"_pcm.n_samples".as("n"),
        $"_pcm.sample_sum".as("s"), $"_pcm.sample_peak".as("p"),
        $"true_n_samples", $"true_sample_sum", $"true_sample_peak")
    // every asset, both bit depths, sample-exact against ground truth
    // computed by struct.unpack at fixture-generation time
    assert(dec.filter($"n" =!= $"true_n_samples" || $"s" =!= $"true_sample_sum" ||
      $"p" =!= $"true_sample_peak").count() == 0)
    assert(dec.filter($"true_bits" === 16).count() > 0)
    assert(dec.filter($"true_bits" === 8).count() > 0)
    // amplitude domain sanity: 16-bit |sample| <= 32768 (abs of the
    // asymmetric two's-complement minimum), 8-bit within [0, 128]
    assert(dec.filter($"true_bits" === 16 && ($"p" < 0 || $"p" > 32768)).count() == 0)
    assert(dec.filter($"true_bits" === 8 && ($"p" < 0 || $"p" > 128)).count() == 0)
    // a non-WAV payload decodes to null, not garbage
    val junk = spark.range(1)
      .select(lit("not a riff file at all".getBytes("US-ASCII")).as("content"))
      .select(MultiModal.pcmSampleStats($"content").as("pcm"))
    assert(junk.collect().head.isNullAt(0))
  }

  test("multimodal: PcmFold kernel is bit-equal to the interpreted HOF reference fold") {
    import org.apache.spark.sql.functions._
    // the HOF twin is O(samples × blob) — run it on a small slice only
    val wav = spark.read.parquet(graft.queries.PipelineQueries.WavFixture)
      .orderBy(length($"content").asc).limit(5)
    val both = wav.select($"asset_id",
        MultiModal.pcmSampleStats($"content").as("fast"),
        MultiModal.pcmSampleStatsHof($"content").as("ref"))
      .select($"asset_id",
        $"fast.n_samples" === $"ref.n_samples",
        $"fast.sample_sum" === $"ref.sample_sum",
        $"fast.sample_peak" === $"ref.sample_peak")
    assert(both.collect().forall(r => r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3)))
    // and both agree the junk payload is null
    val junk = spark.range(1)
      .select(lit("RIFFxxxxJUNK".getBytes("US-ASCII")).as("content"))
      .select(MultiModal.pcmSampleStats($"content").as("a"),
        MultiModal.pcmSampleStatsHof($"content").as("b"))
      .collect().head
    assert(junk.isNullAt(0) && junk.isNullAt(1))
  }

  test("multimodal: JPEG SOF parse via segment walk matches stored ground truth") {
    import org.apache.spark.sql.functions._
    val jp = spark.read.parquet(graft.queries.PipelineQueries.JpegFixture)
    val sof = MultiModal.jpegSof($"content")
    val dec = jp.select($"asset_id", sof.as("sof"), $"true_width",
      $"true_height", $"true_n_components", $"true_progressive")
    assert(dec.filter($"sof.width" =!= $"true_width" ||
      $"sof.height" =!= $"true_height" || $"sof.precision" =!= 8L ||
      $"sof.n_components" =!= $"true_n_components" ||
      $"sof.progressive" =!= $"true_progressive").count() == 0)
    assert(dec.count() == 300)
    // the walk, not a byte scan: rows whose APP1 payload plants FF C0
    // BEFORE the real SOF must still parse right — prove such rows exist
    // by locating the first FFC0 pair and checking it differs from the
    // walked SOF offset on a large fraction of the fixture
    val trap = jp.select(
      MultiModal.jpegSofOffset($"content").as("walked"),
      (locate("FFC0", hex($"content")) / 2 + 1).cast("long").as("naive"))
    assert(trap.filter($"walked" =!= $"naive").count() > 100)
    assert(trap.filter($"walked".isNull).count() == 0)
    // both baseline and progressive frames present; multi-byte BE dims
    assert(dec.select($"sof.progressive").distinct().count() == 2)
    assert(dec.filter($"sof.width" > 255).count() > 0)
    // decodeMeta surfaces the same fields for jpeg assets
    val meta = MultiModal.decodeMeta(jp.select($"asset_id",
      lit("image").as("modality"), $"content", $"true_width", $"true_n_components"))
    assert(meta.filter($"width" =!= $"true_width" ||
      $"channels" =!= $"true_n_components" || $"bit_depth" =!= 8L).count() == 0)
    // malformed: SOI but garbage after — null SOF fields, not a misparse
    val bad = spark.range(1).select(
      MultiModal.jpegSof(concat(lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)),
        lit("notasegment").cast("binary"))).as("sof"))
      .select($"sof.width").collect().head
    assert(bad.isNullAt(0))
  }

  test("multimodal: MP4 box-tree walk matches stored ground truth") {
    import org.apache.spark.sql.functions._
    val m = spark.read.parquet(graft.queries.PipelineQueries.Mp4Fixture)
    val dec = MultiModal.withMp4Meta(m, $"content", "m_")
    assert(dec.count() == 300)
    assert(dec.filter($"m_timescale" =!= $"true_timescale" ||
      $"m_duration_ms" =!= $"true_duration_ms" ||
      $"m_track_id" =!= $"true_track_id" ||
      $"m_width" =!= $"true_width" ||
      $"m_height" =!= $"true_height").count() == 0)
    // the one-shot Column form must agree with the staged form (it is
    // the same walk; only evaluation sharing differs)
    val one = m.limit(20).select($"asset_id",
      MultiModal.mp4Meta($"content").as("m"), $"true_width")
    assert(one.filter($"m.width" =!= $"true_width").count() == 0)
    // the walk, not a byte scan: decoy "moov" bytes inside free-box
    // payloads precede the real moov on a fraction of the fixture, so
    // the naive locate() offset must disagree with the walked one there
    val trap = m.select(
      MultiModal.mp4ChildBox($"content", "moov", lit(1L),
        length($"content").cast("long")).as("walked"),
      (locate("6D6F6F76", hex($"content")) / 2 - 3).cast("long").as("naive"))
    assert(trap.filter($"walked".isNull).count() == 0)
    assert(trap.filter($"walked" =!= $"naive").count() > 50)
    // decodeMeta routes MP4 payloads through the real parser
    val viaMeta = MultiModal.decodeMeta(m.select($"asset_id",
      lit("video").as("modality"), $"content", $"true_width", $"true_duration_ms"))
    assert(viaMeta.filter($"width" =!= $"true_width" ||
      $"duration_ms" =!= $"true_duration_ms").count() == 0)
    // malformed: ftyp but a corrupt size chain — null fields, no misparse
    val bad = spark.range(1).select(
      MultiModal.mp4Meta(concat(
        lit(Array[Byte](0, 0, 0, 16)), lit("ftypisom".getBytes),
        lit(Array[Byte](0, 0, 0, 2)), lit("junk".getBytes)).cast("binary"))
        .as("m"))
      .select($"m.width").collect().head
    assert(bad.isNullAt(0))
  }

  test("ORC roundtrip: filters reach the ORC scan as pushed filters") {
    val dir = Files.createTempDirectory("graft_orc").toFile.getAbsolutePath
    Tables.lineitem(spark, sf())
      .select("l_orderkey", "l_shipdate", "l_returnflag", "l_quantity")
      .coalesce(2).write.orc(s"$dir/orc")
    val rt = spark.read.orc(s"$dir/orc")
    val q = rt.filter($"l_returnflag" === "R" &&
      to_date($"l_shipdate") >= lit("1997-01-01"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_sh"), plan) // truncated render
    // and the roundtrip itself is lossless
    val want = Tables.lineitem(spark, sf())
      .filter($"l_returnflag" === "R" && to_date($"l_shipdate") >= lit("1997-01-01"))
      .count()
    assert(q.count() == want)
  }
}
