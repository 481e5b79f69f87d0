package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** ScalaCheck-generator property tests for the span-level
  * exact-substring dedup operator (q165): on randomized corpora —
  * tiny vocabularies so cross-doc k-gram collisions actually occur,
  * plus planted shared runs — the distributed gaps-and-islands
  * implementation must equal an O(docs · positions · k) in-memory
  * reference that marks covered tokens in a boolean array (the
  * semantics stated the naive way). Drives Gen directly with fixed
  * seeds (the scalatest bridge artifact is not on the offline
  * classpath), so runs are reproducible.
  */
class SubstringDedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  /** Docs over a 6-token vocabulary, lengths 0..14 — short enough that
    * some docs fall under k tokens (must be excluded), small enough
    * that shared 4-grams arise by chance; one planted pair per corpus
    * shares a verbatim 6-token run to guarantee at least one
    * multi-window overlap case. */
  private def corpus(nDocs: Int, seed: Long): Seq[(Long, String)] = {
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val genDoc = Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val docs = Gen.listOfN(nDocs, genDoc)
      .pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val run = Gen.listOfN(6, Gen.oneOf(vocab))
      .pureApply(Gen.Parameters.default, Seed(seed + 1)).mkString(" ")
    docs ++ Seq((nDocs.toLong, s"$run x y"), (nDocs + 1L, s"z $run"))
  }

  /** Naive reference: gram -> doc set, then per doc mark every token
    * under a cross-doc-duplicated window in a boolean array. */
  private def model(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ", -1).toVector
    }.filter(_._2.length >= K)
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, tk) =>
      tk.sliding(K).map(_.mkString(" ")).foreach { g =>
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
      }
    }
    toks.flatMap { case (id, tk) =>
      val covered = Array.fill(tk.length)(false)
      var dupWins = 0L
      (0 to tk.length - K).foreach { p =>
        val g = tk.slice(p, p + K).mkString(" ")
        if (gramDocs(g).exists(_ != id)) {
          dupWins += 1
          (p until p + K).foreach(covered(_) = true)
        }
      }
      if (dupWins == 0) None
      else Some(id -> ((tk.length - K + 1).toLong, dupWins, covered.count(identity).toLong))
    }.toMap
  }

  /** Naive removal reference: same marking array, text rebuilt from
    * the uncovered tokens; docs under k tokens pass through. */
  private def modelClean(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.foreach { case (id, t) =>
      val tk = t.split(" ", -1).toVector
      if (tk.length >= K)
        tk.sliding(K).map(_.mkString(" ")).foreach { g =>
          gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
        }
    }
    docs.map { case (id, t) =>
      val tk = t.split(" ", -1).toVector
      val covered = Array.fill(tk.length)(false)
      if (tk.length >= K)
        (0 to tk.length - K).foreach { p =>
          if (gramDocs(tk.slice(p, p + K).mkString(" ")).exists(_ != id))
            (p until p + K).foreach(covered(_) = true)
        }
      val kept = tk.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> ((tk.length.toLong, covered.count(identity).toLong, kept.mkString(" ")))
    }.toMap
  }

  test("substringDupStats equals the naive marking reference on random corpora") {
    (1L to 6L).foreach { seed =>
      val docs = corpus(nDocs = 30, seed = seed * 1000)
      val got = Dedup.substringDupStats(docs.toDF("doc_id", "text"), "doc_id", "text", K)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == model(docs), s"mismatch at seed $seed")
    }
  }

  test("substringDedupClean equals the naive removal reference on random corpora") {
    (1L to 6L).foreach { seed =>
      val docs = corpus(nDocs = 30, seed = seed * 1000)
      val got = Dedup.substringDedupClean(docs.toDF("doc_id", "text"), "doc_id", "text", K)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == modelClean(docs), s"mismatch at seed $seed")
      // cross-operator invariant: removed_tokens == q165's dup_tokens
      val stats = Dedup.substringDupStats(docs.toDF("doc_id", "text"), "doc_id", "text", K)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      got.foreach { case (id, (_, removed, _)) =>
        assert(stats.getOrElse(id, 0L) == removed, s"q165/q166 disagree on doc $id seed $seed")
      }
    }
  }
}
