package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Bucketing}
import graft.sources.Tables

class AsofBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward join picks the latest right row at or before each left time") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "A", t("2024-01-01 10:00:00")),
      (2L, "A", t("2024-01-01 12:00:00")),
      (3L, "A", t("2024-01-01 09:00:00")), // before any right -> null
      (4L, "B", t("2024-01-01 12:00:00"))) // equal time -> matches
      .toDF("event_id", "ticker", "ts")
    val right = Seq(
      ("A", t("2024-01-01 09:30:00"), 10.0, 100L),
      ("A", t("2024-01-01 11:00:00"), 11.0, 101L),
      ("B", t("2024-01-01 12:00:00"), 20.0, 102L))
      .toDF("ticker", "rts", "close", "rid")
    val out = AsofJoin.backward(left, right, "ticker", "ts", "rts",
        "close", "asof_close", Seq("rid"))
      .orderBy("event_id").collect()
    assert(out(0).getDouble(3) == 10.0)
    assert(out(1).getDouble(3) == 11.0)
    assert(out(2).isNullAt(3))
    assert(out(3).getDouble(3) == 20.0) // >= semantics: equal time matches
  }

  test("asof matches a right row whose payload is null (yields null, not an older row)") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, "A", t("2024-01-01 12:00:00")))
      .toDF("event_id", "ticker", "ts")
    val right = Seq(
      ("A", t("2024-01-01 09:00:00"), Some(10.0)),
      ("A", t("2024-01-01 11:00:00"), None)) // most recent, null payload
      .toDF("ticker", "rts", "close")
    val out = AsofJoin.backward(left, right, "ticker", "ts", "rts",
      "close", "asof_close").collect()
    assert(out.head.isNullAt(3)) // NOT 10.0
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
      Bucketing.writeBucketed(li, "graft_li_b", 8, Seq("l_orderkey"))
      Bucketing.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "graft_o_b", 8, Seq("l_orderkey"))
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_o_b"), "l_orderkey")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      assert(Bucketing.isShuffleFree(
        spark.table("graft_li_b").join(spark.table("graft_o_b"), "l_orderkey")))
      // the aggregation on the bucket key also needs no new exchange
      assert(Bucketing.isShuffleFree(joined))
      // sanity: same row count as the unbucketed join
      val expect = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(spark.table("graft_li_b").join(spark.table("graft_o_b"), "l_orderkey").count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_o_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
