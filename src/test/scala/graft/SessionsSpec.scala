package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the local-cluster executor-sizing contract (SCALING.md r13:
  * the bracket's third field is only the worker's advertised capacity;
  * executors launch at the 1 GiB default unless spark.executor.memory
  * is set from it). No SparkSession needed — the parse is pure. */
class SessionsSpec extends AnyFunSuite {

  test("bracket memMB parses to executor memory, with or without whitespace") {
    assert(Sessions.executorMemFromMaster("local-cluster[4,8,6144]")
      .contains("6144m"))
    // Spark's own master regex accepts spaces; silently falling back to
    // the 1 GiB default on them was the exact bug this parse fixes
    assert(Sessions.executorMemFromMaster("local-cluster[4, 8, 6144]")
      .contains("6144m"))
    assert(Sessions.executorMemFromMaster("local-cluster[ 2 , 4 , 3072 ]")
      .contains("3072m"))
  }

  test("non-local-cluster masters imply no executor sizing") {
    assert(Sessions.executorMemFromMaster("local[32]").isEmpty)
    assert(Sessions.executorMemFromMaster("spark://host:7077").isEmpty)
  }

  test("a malformed local-cluster bracket fails loudly, never under-sizes") {
    assert(Sessions.executorMemFromMaster("local-cluster[4,8]").isEmpty)
    val e = intercept[IllegalArgumentException] {
      Sessions.applyMaster(org.apache.spark.sql.SparkSession.builder(),
        "local-cluster[4,8]", memOverride = None)
    }
    assert(e.getMessage.contains("cannot size executors"))
    // the explicit override rescues an unparseable bracket
    Sessions.applyMaster(org.apache.spark.sql.SparkSession.builder(),
      "local-cluster[4,8]", memOverride = Some("2048m"))
  }
}
