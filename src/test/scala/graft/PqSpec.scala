package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq
import graft.testkit.SparkTestKit._

/** Product quantization train/encode/ADC (SURVEY.md §2.8). */
class PqSpec extends AnyFunSuite {

  // m=2, k=2, dsub=2 hand model
  private val handModel = Pq.Model(Vector(
    Vector(Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    Vector(Array(1.0f, 1.0f), Array(-1.0f, -1.0f))))

  test("encode: hand-computed codes, ties toward the higher cell") {
    val df = table("vec_id bigint, v array<float>", Seq(
      row(1L, Seq(0.9f, 0.1f, 0.5f, 0.5f)),   // -> [0, 0]
      row(2L, Seq(0.1f, 0.9f, -0.5f, -0.4f)), // -> [1, 1]
      row(3L, Seq(0.5f, 0.5f, 1.0f, 0.9f))))  // sub0 exact tie -> cell 1
    val got = Pq.encode(df, "v", handModel, "code")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](2).toList)).toSeq
    assert(got == Seq((1L, List(0, 0)), (2L, List(1, 1)), (3L, List(1, 0))),
      got.toString)
  }

  test("native encode agrees with a brute-force replica; degenerate inputs null") {
    // the native PqEncode loop vs an independent Scala argmax over the
    // same surrogate (dot - ||c||^2/2, double-over-float fold, ties to
    // the higher cell) — one disagreement on 200 random vectors fails
    val rnd = new scala.util.Random(19)
    val m = 4; val k = 8; val d = 4
    val model = Pq.Model(Vector.fill(m)(Vector.fill(k)(
      Array.fill(d)(rnd.nextFloat() * 2 - 1))))
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(m * d)(rnd.nextFloat() * 2 - 1)))
    val df = table("vec_id bigint, v array<float>",
      vecs.map { case (i, v) => row(i, v) })
    val got = Pq.encode(df, "v", model, "code")
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Int](2).toList).toSeq
    val exp = vecs.map { case (_, v) =>
      (0 until m).map { s =>
        var best = Double.NegativeInfinity; var bestC = 0
        for (c <- 0 until k) {
          var dot = 0.0
          for (j <- 0 until d)
            dot += v(s * d + j).toDouble * model.codebooks(s)(c)(j).toDouble
          var nsq = 0.0
          for (j <- 0 until d) {
            val x = model.codebooks(s)(c)(j).toDouble; nsq += x * x
          }
          val score = dot - nsq / 2.0
          if (score >= best) { best = score; bestC = c }
        }
        bestC
      }.toList
    }
    assert(got == exp)
    // wrong-length vector and null element yield NULL codes, loudly typed
    val degenerate = table("vec_id bigint, v array<float>", Seq(
      row(1L, Seq(1.0f, 2.0f)),                 // wrong length
      row(2L, null.asInstanceOf[Seq[Float]])))  // null vector
    val nulls = Pq.encode(degenerate, "v", model, "code")
      .orderBy("vec_id").collect()
    assert(nulls.forall(_.isNullAt(2)))
  }

  test("searchAdc: hand-computed lookup sums, deterministic tie order") {
    val enc = table("vec_id bigint, code array<int>", Seq(
      row(1L, Seq(0, 0)),   // 1 + 2 = 3
      row(2L, Seq(1, 1)),   // 0 - 2 = -2
      row(3L, Seq(1, 0)),   // 0 + 2 = 2
      row(4L, Seq(0, 0))))  // 3 too -> ties with 1, id asc
    val got = Pq.searchAdc(enc, "vec_id", "code", handModel,
        Seq(1.0f, 0.0f, 1.0f, 1.0f), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 3.0), (4L, 3.0), (3L, 2.0)), got.toString)
  }

  test("train is bit-identical across partitionings") {
    val rnd = new scala.util.Random(101)
    val vecs = (0 until 120).map(i =>
      row(i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = table("vec_id bigint, v array<float>", vecs)
    val a = Pq.train(df, "vec_id", "v", m = 4, k = 4, iters = 3)
    val b = Pq.train(df.repartition(7), "vec_id", "v", m = 4, k = 4, iters = 3)
    assert(a.m == 4 && a.k == 4 && a.dsub == 2)
    for (s <- 0 until 4; c <- 0 until 4)
      assert(a.codebooks(s)(c).toSeq == b.codebooks(s)(c).toSeq,
        s"sub $s cell $c differs")
  }

  test("codebook-point vectors reconstruct exactly: ADC dot equals true dot") {
    // every corpus vector is a concatenation of centroids, so its PQ
    // reconstruction is itself and ADC introduces no quantization error
    val df = table("vec_id bigint, v array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f, 1.0f, 1.0f)),
      row(2L, Seq(0.0f, 1.0f, -1.0f, -1.0f)),
      row(3L, Seq(1.0f, 0.0f, -1.0f, -1.0f))))
    val query = Seq(0.3f, -0.2f, 0.7f, 0.4f)
    val enc = Pq.encode(df, "v", handModel, "code")
    val got = Pq.searchAdc(enc.select("vec_id", "code"), "vec_id", "code",
        handModel, query, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val vecs = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((id, v) <- vecs) {
      val exact = v.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(math.abs(got(id) - exact) < 1e-9, s"id $id: ${got(id)} vs $exact")
    }
  }

  test("searchIvfPq: cell pruning bounds the scored set, nprobe recovers it") {
    import graft.operators.Ivf
    val ivf = Ivf.Model(Vector(Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f)))
    val df = table("vec_id bigint, v array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f, 1.0f, 1.0f)),    // cell 0, ADC 3
      row(2L, Seq(0.0f, 1.0f, -1.0f, -1.0f)),  // cell 1, ADC -2
      row(3L, Seq(1.0f, 0.1f, 1.0f, 1.0f))))   // cell 0, ADC 3 (tie, id)
    val indexed = Pq.encode(Ivf.assign(df, "v", ivf), "v", handModel, "code")
      .select("vec_id", "cell", "code")
    val query = Seq(1.0f, 0.0f, 1.0f, 1.0f)
    def run(np: Int) = Pq.searchIvfPq(indexed, "vec_id", "cell", "code",
        ivf, handModel, query, topK = 3, nprobe = np)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // nprobe=1: only cell 0 is read — v2 never scored, by design
    assert(run(1) == Seq((1L, 3.0), (3L, 3.0)), run(1).toString)
    // nprobe=2 (= k): every cell probed — equals plain ADC search
    assert(run(2) == Seq((1L, 3.0), (3L, 3.0), (2L, -2.0)), run(2).toString)
    val plain = Pq.searchAdc(indexed.select("vec_id", "code"),
        "vec_id", "code", handModel, query, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run(2) == plain)
  }

  test("train validates divisibility and byte-code range") {
    val df = table("vec_id bigint, v array<float>",
      Seq(row(1L, Seq(1.0f, 2.0f, 3.0f))))
    val e = intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "v", m = 2, k = 1)
    }
    assert(e.getMessage.contains("divisible"))
    val e2 = intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "v", m = 1, k = 300)
    }
    assert(e2.getMessage.contains("256"))
  }
}
