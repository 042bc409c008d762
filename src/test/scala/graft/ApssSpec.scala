package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Apss
import graft.testkit.SparkTestKit._

class ApssSpec extends AnyFunSuite {

  /** Independent brute force: full n² cosine over n-gram TF-IDF,
    * rounded HALF_UP at 6 like the engine. */
  private def bruteForce(
      docs: Seq[(Long, String)], n: Int, t: Double): Map[(Long, Long), Double] = {
    def gramsOf(s: String): Seq[String] = {
      val tk = s.trim.split(" +").toSeq
      if (tk.size < n) Seq.empty
      else (0 to tk.size - n).map(i => tk.slice(i, i + n).mkString(" "))
    }
    val tf: Map[Long, Map[String, Int]] = docs.map { case (id, s) =>
      id -> gramsOf(s).groupBy(identity).view.mapValues(_.size).toMap
    }.toMap
    val dfm: Map[String, Int] = tf.values.flatMap(_.keySet).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val nd = docs.size.toDouble
    val nwm: Map[Long, Map[String, Double]] = tf.flatMap { case (id, m) =>
      val w = m.map { case (g, c) => g -> c * math.log(nd / dfm(g)) }
      val norm = math.sqrt(w.values.map(x => x * x).sum)
      if (norm > 0) Some(id -> w.map { case (g, x) => g -> x / norm }) else None
    }
    val ids = nwm.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      d = nwm(i).keySet.intersect(nwm(j).keySet).toSeq
        .map(g => nwm(i)(g) * nwm(j)(g)).sum
      r = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if r >= t
    } yield (i, j) -> r).toMap
  }

  private def mix(seed: Long): Iterator[Long] = {
    var x = seed
    Iterator.continually {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33) & 0x7fffffffL
    }
  }

  test("allPairsCosine equals brute force on a twin-planted corpus (generative)") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def doc(seed: Int): String =
      mix(seed.toLong + 7).take(30).map(h => vocab((h % vocab.size).toInt))
        .mkString(" ")
    val base = (0L until 40L).map(i => (i, doc(i.toInt + 1)))
    val twins = base.take(15).map { case (id, s) => (id + 1000L, s + " zz") }
    val corpus = base ++ twins
    val exp = bruteForce(corpus, 3, 0.7)
    assert(exp.nonEmpty) // twins guarantee qualifying pairs
    val got = Apss.allPairsCosine(
        table("id bigint, text string", corpus.map(c => row(c._1, c._2))),
        "id", "text", n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == exp.keySet,
      s"missing=${exp.keySet -- got.keySet} extra=${got.keySet -- exp.keySet}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - exp(k)) <= 1.000001e-6, s"$k: $v vs ${exp(k)}")
    }
  }

  test("identical docs score exactly 1.0") {
    val d = table("id bigint, text string", Seq(
      row(1L, "p q r s t u v w"),
      row(2L, "p q r s t u v w"),
      row(3L, "completely different trailing words here now")))
    val got = Apss.allPairsCosine(d, "id", "text", 3, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSeq
    assert(got == Seq(((1L, 2L), 1.0)), got.toString)
  }

  test("hot posting raises loudly; dropOversize loses exactly its pairs") {
    // d1-d4 share ONLY the gram "x y z" (df 4 of 5; d5 keeps its idf
    // positive); every qualifying pair rides that one hot posting.
    val d = table("id bigint, text string", Seq(
      row(1L, "x y z a"), row(2L, "x y z b"), row(3L, "x y z c"),
      row(4L, "x y z d"), row(5L, "p q r s")))
    val full = Apss.allPairsCosine(d, "id", "text", 3, 0.01, maxPosting = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)), full.toString)
    val e = intercept[Exception] {
      Apss.allPairsCosine(d, "id", "text", 3, 0.01, maxPosting = 3).collect()
    }
    assert(e.getMessage.contains("apss: posting list exceeds"), e.getMessage)
    val dropped = Apss.allPairsCosine(d, "id", "text", 3, 0.01,
      maxPosting = 3, dropOversize = true).collect()
    assert(dropped.isEmpty, dropped.mkString(","))
  }

  test("parameter validation fails loudly") {
    val d = table("id bigint, text string", Seq(row(1L, "a b c")))
    intercept[IllegalArgumentException] {
      Apss.allPairsCosine(d, "id", "text", 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Apss.allPairsCosine(d, "id", "text", 3, 0.0)
    }
    intercept[IllegalArgumentException] {
      Apss.allPairsCosine(d, "id", "text", 3, 0.5, maxPosting = 0)
    }
  }
}
