package graft

import graft.queries.SourceQueries

/** q95's claim is that AQE's runtime skew handling — not anything in the
  * data model — absorbs the hot key. That is a physical-plan property,
  * so this spec executes the skewed join under the fixture-scale
  * thresholds and asserts the adaptive plan actually split the skewed
  * partition (`skew=true` on the sort-merge join), and that the split
  * did not change the answer.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition: skew=true in the executed plan") {
    SourceQueries.withAqeSkewConfs(spark) {
      val joined = SourceQueries.skewJoinFrame(spark, sf("sf0.01"))
      // collect() runs joined's OWN QueryExecution (count() would build
      // a new one and leave this plan unexecuted / non-final)
      assert(joined.collect().length == 10000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join, got:\n$plan")
    }
  }

  test("skew split is exact: same aggregate with and without AQE skew handling") {
    val with_ = SourceQueries.q95AqeSkewJoin(spark, sf("sf0.01")).collect()
    val prev = spark.conf.getOption("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val without = SourceQueries.q95AqeSkewJoin(spark, sf("sf0.01")).collect()
      assert(with_.map(_.toSeq).toSeq == without.map(_.toSeq).toSeq)
      // keys surviving the remap are ≡ {0,7,8,9} mod 10 → labels
      // r0,r2,r3,r4 (never r1)
      assert(with_.length == 4)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.skewJoin.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    }
  }
}
