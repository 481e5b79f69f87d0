package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotCache

/** TTL snapshot cache (S10): freshness window, expiry-by-clock,
  * rebuild-on-stale, and snapshot replacement — clock injected, no
  * sleeping. */
class SnapshotCacheSpec extends SparkSpec {

  test("fresh snapshot serves without rebuilding; expiry rebuilds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap").toString
    var clock = 1000L
    var builds = 0
    def build = {
      builds += 1
      Seq((1L, s"v$builds")).toDF("id", "payload")
    }
    val (r1, hit1) = SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(!hit1 && builds == 1 && r1.collect().head.getString(1) == "v1")

    // inside the TTL: served from snapshot, build NOT invoked — the
    // payload stays v1 even though a rebuild would produce v2
    clock += 400
    val (r2, hit2) = SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(hit2 && builds == 1 && r2.collect().head.getString(1) == "v1")

    // past the TTL: rebuilt and the snapshot replaced
    clock += 200
    val (r3, hit3) = SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(!hit3 && builds == 2 && r3.collect().head.getString(1) == "v2")

    // and fresh again right after
    val (r4, hit4) = SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(hit4 && builds == 2 && r4.collect().head.getString(1) == "v2")
  }

  test("rebuilds are versioned dirs behind one pointer file; two generations retained") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap_v").toString
    var clock = 1000L
    def build = Seq((1L, clock)).toDF("id", "at")
    def versions = {
      val s = new java.io.File(dir).list()
      (s.filter(_.startsWith("v")).sorted.toSeq, s.contains("_current"))
    }
    SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(versions == (Seq("v0"), true))
    clock += 1000 // expire → rebuild: new version dir, old one RETAINED
    SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(versions == (Seq("v0", "v1"), true),
      "previous snapshot must survive one generation for in-flight readers")
    clock += 1000 // third build: v0 finally collected, v1 retained
    val (served, hit) = SnapshotCache.readThrough(spark, dir, 500L, () => clock)(build)
    assert(versions == (Seq("v1", "v2"), true) && !hit)
    assert(served.head().getLong(1) == clock, "pointer must name the newest snapshot")
  }

  test("q110 cache round-trip equals the direct build") {
    val got = graft.queries.SourceQueries.q110TtlCache(spark, sf())
      .collect().map(_.toSeq).toSeq
    val want = graft.sources.Tables.prices(spark, sf())
      .select(col("ticker"), col("ts"), col("event_id"),
        round(col("close") * 1e6).cast("long").as("close_micro"))
      .groupBy("ticker")
      .agg(max_by(struct(col("ts"), col("close_micro")),
        struct(col("ts"), col("event_id"))).as("_l"))
      .select(col("ticker"), col("_l.ts"), col("_l.close_micro"))
      .orderBy("ticker").collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
