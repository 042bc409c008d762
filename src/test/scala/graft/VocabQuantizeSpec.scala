package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Similarity}
import graft.testkit.SparkTestKit._

/** Vocabulary building and int8 quantization (SURVEY.md §2.8). */
class VocabQuantizeSpec extends AnyFunSuite {

  test("buildVocabulary: freq-desc contiguous ids, ties by token, minFreq prunes") {
    val df = table("text string", Seq(
      row("b b b a a c"), row("a b d"), row("b")))
    // freqs: b=5, a=3, c=1, d=1
    val out = Corpus.buildVocabulary(df, "text").orderBy("token_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, "b", 5L), (1L, "a", 3L), (2L, "c", 1L), (3L, "d", 1L)))
    val pruned = Corpus.buildVocabulary(df, "text", minFreq = 2L)
      .orderBy("token_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(pruned == Seq((0L, "b"), (1L, "a")))
  }

  test("quantizeInt8: symmetric round-half-up codes, zero-vector safe") {
    val df = table("id bigint, v array<float>", Seq(
      row(1L, Seq(2.0f, -1.0f, 0.5f, 0.0f)),
      row(2L, Seq(0.0f, 0.0f))))
    val q = Similarity.quantizeInt8(col("v"))
    val rows = df.select(col("id"), q.getField("q").as("q"),
        q.getField("scale").as("scale"))
      .orderBy("id").collect()
    // id=1: scale = 127/2 = 63.5; codes = floor(x*63.5 + 0.5)
    assert(rows(0).getDouble(2) == 63.5)
    assert(rows(0).getSeq[Int](1) == Seq(127, -63, 32, 0))
    // zero vector: scale 0, all-zero codes (never Inf/NaN)
    assert(rows(1).getDouble(2) == 0.0)
    assert(rows(1).getSeq[Int](1) == Seq(0, 0))
  }

  test("quantizedTopK: integer dots rank the planted twin first") {
    val df = table("id bigint, v array<float>", Seq(
      row(1L, Seq(1.0f, 2.0f, -1.0f)),   // same direction as query
      row(2L, Seq(-1.0f, -2.0f, 1.0f)),  // opposite
      row(3L, Seq(2.0f, -1.0f, 1.0f))))  // near-orthogonal
    val out = Similarity.quantizedTopK(df, "id", "v",
        query = Seq(1.0f, 2.0f, -1.0f), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L))
    // query quantizes to (64,127,-63) at scale 63.5; self-dot exact
    assert(out.head._2 == 64L * 64 + 127L * 127 + 63L * 63)
  }

  test("native quantizedDot == composed quantizeInt8 + zip_with dot") {
    import graft.expressions.GraftFunctions
    val vecs = (1L to 50L).map { i =>
      row(i, (0 until 16).map(j => ((i * 31 + j * 7) % 23).toFloat - 11.0f))
    }
    val df = table("id bigint, v array<float>", vecs)
    val query = (0 until 16).map(j => (j % 5).toFloat - 2.0f)
    val (qCodes, _) = Similarity.quantizeInt8Local(query)
    val native = GraftFunctions.quantizedDot(df, col("v"),
      array(qCodes.map(lit): _*))
    val composed = Similarity.quantizeInt8(col("v"))
    val bad = df.select(
        native.getField("dot_q").as("nd"), native.getField("scale").as("ns"),
        aggregate(zip_with(composed.getField("q"), array(qCodes.map(lit): _*),
          (a, b) => a.cast("long") * b.cast("long")), lit(0L), _ + _).as("cd"),
        composed.getField("scale").as("cs"))
      .filter(col("nd") =!= col("cd") || col("ns") =!= col("cs"))
    assert(bad.isEmpty)
  }

  test("quantizeInt8 codes stay within [-127, 127]") {
    val df = table("v array<float>",
      Seq(row(Seq(3.3f, -3.3f, 1.1f, -0.7f))))
    val codes = df.select(Similarity.quantizeInt8(col("v")).getField("q"))
      .head().getSeq[Int](0)
    assert(codes.head == 127 && codes(1) == -127)
    assert(codes.forall(c => c >= -127 && c <= 127))
  }

  test("semanticDedup: within-cell groups, min-id rep, nprobe recall knob") {
    import graft.operators.{Ivf, Similarity}
    // hand-computed: cells along the two axes; (1,2) pair at cosine
    // .9902 and (3,4) at .9950 group within their cells; (5,6) are at
    // cosine .9996 but straddle the cell boundary (5 -> cell 0 at
    // .7170 vs .6971, 6 mirrored) — nprobe=1 misses them BY DESIGN
    // (the single-probe SemDeDup approximation), both stay kept.
    val df = table("vec_id bigint, embedding array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f)),
      row(2L, Seq(0.99f, 0.14f)),
      row(3L, Seq(0.0f, 1.0f)),
      row(4L, Seq(0.1f, 0.995f)),
      row(5L, Seq(0.72f, 0.70f)),
      row(6L, Seq(0.70f, 0.72f))))
    val model = Ivf.Model(Vector(Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
    val got = Similarity.semanticDedup(df, "vec_id", "embedding", model, 0.98,
        nprobe = 1)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false),
      (5L, 5L, true), (6L, 6L, true)), got.toString)
    // nprobe=2: 5 and 6 both probe {cell0, cell1}, share a cell, and
    // the straddled pair is recovered — 6 joins 5's group
    val probed = Similarity.semanticDedup(df, "vec_id", "embedding", model, 0.98,
        nprobe = 2)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(probed == Seq(
      (1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false),
      (5L, 5L, true), (6L, 5L, false)), probed.toString)
  }

  test("semanticDedup: transitive chains group via components; oversize cell guard") {
    import graft.operators.{Ivf, Similarity}
    // a~b (.96) and b~c (.9628) but NOT a~c (.8486): components must
    // still place all three in one group under rep a — pairwise-only
    // retention would keep c.
    val chain = table("vec_id bigint, embedding array<float>", Seq(
      row(10L, Seq(1.0f, 0.0f)),
      row(11L, Seq(0.96f, 0.28f)),
      row(12L, Seq(0.85f, 0.53f))))
    val one = Ivf.Model(Vector(Array(1.0f, 0.0f)))
    val got = Similarity.semanticDedup(chain, "vec_id", "embedding", one, 0.95)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((10L, 10L, true), (11L, 10L, false), (12L, 10L, false)),
      got.toString)
    // strict default: a 3-vector cell over maxCell=2 must raise loudly
    val err = intercept[Throwable] {
      Similarity.semanticDedup(chain, "vec_id", "embedding", one, 0.95,
        maxCell = 2).collect()
    }
    val messages = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("maxCell=2"), messages.take(500))
    // dropOversize: the cell's pairs are sacrificed observably — no
    // groups form, every vector survives as its own representative
    val dropped = Similarity.semanticDedup(chain, "vec_id", "embedding", one,
        0.95, maxCell = 2, dropOversize = true)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(dropped == Seq((10L, 10L, true), (11L, 11L, true), (12L, 12L, true)),
      dropped.toString)
  }

  test("semanticDedup at nprobe=k equals in-JVM brute-force components (generative)") {
    import graft.operators.{Ivf, Similarity}
    // nprobe = k probes every cell, so recall is exact BY CONSTRUCTION
    // regardless of the model — the whole pipeline must equal a plain
    // all-pairs cosine graph + union-find + min-id retention computed
    // here with the native expression's own accumulation order.
    val rnd = new scala.util.Random(77)
    val dims = 8
    val base = (0 until 50).map(i =>
      i.toLong -> Array.fill(dims)(rnd.nextFloat() - 0.5f))
    // planted exact twins guarantee non-trivial groups at any threshold
    val vecs = base ++ Seq(1000L -> base(0)._2, 1001L -> base(1)._2,
      1002L -> base(1)._2)
    val df = table("vec_id bigint, embedding array<float>",
      vecs.map { case (id, v) => row(id, v.toSeq) })
    val model = Ivf.train(df, "vec_id", "embedding", k = 4, iters = 2)
    val thr = 0.93
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dims) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // union-find over the exact pair graph
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- vecs.indices; j <- (i + 1) until vecs.length
         if cosine(vecs(i)._2, vecs(j)._2) >= thr) {
      val (ra, rb) = (find(vecs(i)._1), find(vecs(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = vecs.map { case (id, _) =>
      val rep = find(id); (id, rep, id == rep)
    }.sortBy(_._1)
    val got = Similarity.semanticDedup(df, "vec_id", "embedding", model, thr,
        nprobe = model.k)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(expected.count(!_._3) >= 3) // the planted twins really grouped
  }

  test("semanticDecontaminate: cross hits, straddle miss at nprobe=1, dedup across shared cells") {
    import graft.operators.{Ivf, Similarity}
    // hand-computed on the axis-cell model: e101 ~ t1 at cosine .9901
    // (same cell 0); e102 ~ t3 at .9996 but the pair straddles the
    // cell boundary (t3 -> cell 0 at .7170 vs .6971, e102 mirrored) so
    // nprobe=1 misses it BY DESIGN; e103 = (-1, 0) is near nothing.
    val train = table("vec_id bigint, embedding array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f)),
      row(2L, Seq(0.0f, 1.0f)),
      row(3L, Seq(0.72f, 0.70f))))
    val eval = table("vec_id bigint, embedding array<float>", Seq(
      row(101L, Seq(0.99f, 0.14f)),
      row(102L, Seq(0.70f, 0.72f)),
      row(103L, Seq(-1.0f, 0.0f))))
    val model = Ivf.Model(Vector(Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
    def run(np: Int) = Similarity.semanticDecontaminate(eval, train,
        "vec_id", "embedding", model, threshold = 0.98, nprobe = np)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(run(1) == Seq(
      (101L, true, 1L, 1L),
      (102L, false, 0L, null),
      (103L, false, 0L, null)), run(1).toString)
    // nprobe=2: the straddled pair shares BOTH probed cells — it must
    // be recovered AND counted once (distinct), not once per cell
    assert(run(2) == Seq(
      (101L, true, 1L, 1L),
      (102L, true, 1L, 3L),
      (103L, false, 0L, null)), run(2).toString)
  }

  test("semanticDecontaminate: oversize train cell raises loudly; dropOversize loses observably") {
    import graft.operators.{Ivf, Similarity}
    val train = table("vec_id bigint, embedding array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f)),
      row(2L, Seq(0.99f, 0.14f)),
      row(3L, Seq(0.96f, 0.28f))))
    val eval = table("vec_id bigint, embedding array<float>", Seq(
      row(101L, Seq(1.0f, 0.0f))))
    val one = Ivf.Model(Vector(Array(1.0f, 0.0f)))
    val err = intercept[Throwable] {
      Similarity.semanticDecontaminate(eval, train, "vec_id", "embedding",
        one, threshold = 0.95, maxCell = 2).collect()
    }
    val messages = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("maxCell=2"), messages.take(500))
    val dropped = Similarity.semanticDecontaminate(eval, train, "vec_id",
        "embedding", one, threshold = 0.95, maxCell = 2, dropOversize = true)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(dropped == Seq((101L, false)), dropped.toString)
  }

  test("semanticDecontaminate at nprobe=k equals brute-force cross pairs (generative)") {
    import graft.operators.{Ivf, Similarity}
    val rnd = new scala.util.Random(78)
    val dims = 8
    val trainVecs = (0 until 40).map(i =>
      i.toLong -> Array.fill(dims)(rnd.nextFloat() - 0.5f))
    // eval: exact twins of train 0/1/2 (guaranteed hits) + fresh
    // random vectors (hits only if the exact graph says so)
    val evalVecs = Seq(100L -> trainVecs(0)._2, 101L -> trainVecs(1)._2,
      102L -> trainVecs(2)._2) ++
      (103 until 120).map(i =>
        i.toLong -> Array.fill(dims)(rnd.nextFloat() - 0.5f))
    val train = table("vec_id bigint, embedding array<float>",
      trainVecs.map { case (id, v) => row(id, v.toSeq) })
    val eval = table("vec_id bigint, embedding array<float>",
      evalVecs.map { case (id, v) => row(id, v.toSeq) })
    val model = Ivf.train(train, "vec_id", "embedding", k = 4, iters = 2)
    val thr = 0.9
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dims) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = evalVecs.map { case (eid, ev) =>
      val hits = trainVecs.filter(t => cosine(ev, t._2) >= thr).map(_._1)
      (eid, hits.nonEmpty, hits.size.toLong,
        if (hits.isEmpty) null else hits.min)
    }.sortBy(_._1)
    val got = Similarity.semanticDecontaminate(eval, train, "vec_id",
        "embedding", model, thr, nprobe = model.k)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(expected.count(_._2) >= 3) // the planted twins really hit
  }
}
