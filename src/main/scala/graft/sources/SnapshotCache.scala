package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TTL read-through snapshot cache (SURVEY S10; ref caches provider
  * fetches with `st.cache_data(ttl=3600)` —
  * app/pages/1_Dashboard.py:130, ttl=300 at 2_Trades.py:24). The
  * reference memoizes in-process; the engine equivalent must survive
  * restarts and be shared by every executor, so the cache is a parquet
  * SNAPSHOT directory plus a commit marker carrying the build time:
  *
  *  - fresh (marker age <= ttl): serve the snapshot — a plain parquet
  *    scan, no recompute, pruning/pushdown apply as on any table;
  *  - stale or absent: rebuild from source, atomically replace the
  *    snapshot (write to `_tmp`, rename over), stamp the marker.
  *
  * The clock is INJECTED so expiry is testable without sleeping; the
  * marker is a sibling file, not parquet metadata, so freshness checks
  * never open footers. Rebuilds write-then-rename: a reader either
  * sees the old complete snapshot or the new one, never a partial
  * directory (same commit discipline as q102's state store).
  */
object SnapshotCache {

  /** Serve `build`'s result from the snapshot at `dir` unless older
    * than `ttlMs` by `now()`. Returns (frame, servedFromCache). */
  def readThrough(spark: SparkSession, dir: String, ttlMs: Long,
                  now: () => Long = () => System.currentTimeMillis())
                 (build: => DataFrame): (DataFrame, Boolean) = {
    val marker = Paths.get(dir, "_built_at")
    val fresh = Files.exists(marker) && {
      val builtAt = new String(Files.readAllBytes(marker), "UTF-8").trim.toLong
      now() - builtAt <= ttlMs
    }
    if (fresh) (spark.read.parquet(s"$dir/data"), true)
    else {
      val tmp = s"$dir/_tmp"
      build.write.mode("overwrite").parquet(tmp)
      val dataDir = Paths.get(dir, "data")
      // atomic swap: old snapshot stays readable until the rename
      val old = Paths.get(dir, s"_old_${now()}")
      if (Files.exists(dataDir)) Files.move(dataDir, old)
      Files.move(Paths.get(tmp), dataDir)
      if (Files.exists(old)) {
        Files.walk(old).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      Files.createDirectories(Paths.get(dir))
      Files.write(marker, now().toString.getBytes("UTF-8"))
      (spark.read.parquet(s"$dir/data"), false)
    }
  }
}
