package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, General}
import graft.testkit.SparkTestKit._

/** Intra-corpus duplicated n-gram stats, capped inverted index, and
  * per-stratum cap sampling (SURVEY.md §2.8). */
class CorpusIndexSpec extends AnyFunSuite {

  private val corpus = table("id bigint, text string", Seq(
    row(1L, "a b c d"),     // grams {a_b_c, b_c_d}
    row(2L, "a b c x"),     // grams {a_b_c, b_c_x} — shares a_b_c with 1
    row(3L, "p q"),         // < 3 tokens -> 0 grams
    row(4L, "z z z z z")))  // gram z_z_z repeated intra-doc -> distinct 1

  test("interDocDuplicationStats: cross-doc grams counted, intra-doc repeats once") {
    val out = Corpus.interDocDuplicationStats(corpus, "id", "text", 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2, 1L, 0.5),   // a_b_c also in doc 2
      (2L, 2, 1L, 0.5),
      (3L, 0, 0L, 0.0),
      (4L, 1, 0L, 0.0)))  // z_z_z repeats only INSIDE doc 4 -> not duplicated
  }

  test("interDocDuplicationStats: hashed and string gram paths agree") {
    val hashed = Corpus.interDocDuplicationStats(corpus, "id", "text", 3)
      .orderBy("id").collect().toSeq
    val strings = Corpus.interDocDuplicationStats(corpus, "id", "text", 3,
      hashGrams = false).orderBy("id").collect().toSeq
    assert(hashed == strings)
  }

  test("invertedIndex: caps postings at k by (tf desc, id asc), prunes by doc_freq") {
    val docs = table("id bigint, text string", Seq(
      row(1L, "w w w t a"),
      row(2L, "w w t b"),
      row(3L, "w c")))
    val out = Corpus.invertedIndex(docs, "id", "text", k = 2, minDocFreq = 2L)
      .orderBy("token", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      // w: df=3, postings capped to top-2 by tf
      ("t", 2L, 1L, 1L), ("t", 2L, 2L, 1L), // tf tie -> id asc retained
      ("w", 3L, 1L, 3L), ("w", 3L, 2L, 2L)))
  }

  test("hybridSearch: lexical candidate cutoff, dense re-rank, exclusions") {
    val docs = table("doc_id bigint, text string", Seq(
      row(0L, "hash hash hash hash"),   // excluded (the query doc)
      row(1L, "hash hash hash"),        // tf=3, candidate
      row(2L, "hash merge"),            // tf=2, candidate
      row(3L, "hash"),                  // tf=1, cut by nCandidates=2
      row(4L, "scan table row")))       // tf=0, never a candidate
    val emb = table("vec_id bigint, embedding array<float>", Seq(
      row(0L, Seq(1.0f, 0.0f)),
      row(1L, Seq(0.0f, 1.0f)),         // orthogonal to query
      row(2L, Seq(1.0f, 0.0f)),         // parallel -> top
      row(3L, Seq(1.0f, 0.0f)),
      row(4L, Seq(1.0f, 0.0f))))
    val out = Corpus.hybridSearch(docs, "doc_id", "text",
        emb, "vec_id", "embedding",
        queryTerms = Seq("hash", "merge"), queryVec = Seq(1.0f, 0.0f),
        nCandidates = 2, k = 2, excludeIds = Seq(0L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // candidates = {1 (tf 3), 2 (tf 2)}; re-rank puts 2 (cos 1) above 1 (cos 0)
    assert(out == Seq((2L, 2), (1L, 3)))
  }

  test("embeddingTruncationReport: hand-computed recall, prefix flips rank") {
    import graft.operators.Similarity
    // query [1,0,0,0]; full-dim ranking c(0.5) > b(0.316) > a(0);
    // 2-dim prefixes rank b(1.0) > c(0.707) > a(0) — truncation FLIPS
    // the winner, so recall@1 = 0 while the top-2 SET is unchanged
    val emb = table("vec_id bigint, embedding array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // the query row
      row(2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // a
      row(3L, Seq(1.0f, 0.0f, 0.0f, 3.0f)),   // b
      row(4L, Seq(0.5f, 0.5f, 0.5f, 0.5f))))  // c
    val q = emb.filter(col("vec_id") === 1L)
    def recalls(k: Int) = Similarity.embeddingTruncationReport(
        emb, "vec_id", "embedding", q, "vec_id", "embedding",
        dimBudgets = Seq(2), k = k)
      .collect().map(r => (r.getAs[Int]("dims_budget"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toSeq
    assert(recalls(1) == Seq((2, 0L, 0.0)))
    assert(recalls(2) == Seq((2, 2L, 1.0)))
  }

  test("embeddingTruncationReport: zero-norm prefix scores 0, guards fire") {
    import graft.operators.Similarity
    // query's 2-dim prefix is all-zero: every prefix cosine is 0, so
    // the d=2 top-1 is the lowest id, not NaN-poisoned
    val emb = table("vec_id bigint, embedding array<float>", Seq(
      row(1L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      row(2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      row(3L, Seq(0.0f, 0.0f, 1.0f, 1.0f))))
    val q = emb.filter(col("vec_id") === 1L)
    val out = Similarity.embeddingTruncationReport(
        emb, "vec_id", "embedding", q, "vec_id", "embedding",
        dimBudgets = Seq(2), k = 1)
      .collect()
    // full top-1 = {3} (cos 1/sqrt(2)); d2 top-1 = {2} (all cos 0, id
    // tie-break) -> 0 hits, and no NaN anywhere
    assert(out.length == 1 && out(0).getAs[Long]("n_hits") == 0L)
    val tooMany = intercept[IllegalArgumentException] {
      Similarity.embeddingTruncationReport(emb, "vec_id", "embedding",
        emb, "vec_id", "embedding", Seq(2), k = 1, maxQueries = 2)
    }
    assert(tooMany.getMessage.contains("queries"))
    val badBudget = intercept[IllegalArgumentException] {
      Similarity.embeddingTruncationReport(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", Seq(4), k = 1)
    }
    assert(badBudget.getMessage.contains("full dims"))
  }

  test("truncatedRerankReport: small funnel misses, larger funnel recovers") {
    import graft.operators.Similarity
    // prefix-2 ranking b > c > a, full ranking c > b > a: at m=1 the
    // funnel only sees b and misses the true winner c; at m=2 the
    // re-rank recovers c exactly
    val emb = table("vec_id bigint, embedding array<float>", Seq(
      row(1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      row(2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // a
      row(3L, Seq(1.0f, 0.0f, 0.0f, 3.0f)),   // b
      row(4L, Seq(0.5f, 0.5f, 0.5f, 0.5f))))  // c
    val q = emb.filter(col("vec_id") === 1L)
    val out = Similarity.truncatedRerankReport(
        emb, "vec_id", "embedding", q, "vec_id", "embedding",
        prefixDims = 2, mCandidates = Seq(1, 2), k = 1)
      .collect().map(r => (r.getAs[Int]("m"), r.getAs[Long]("n_hits"),
        r.getAs[Double]("recall"))).toSeq
    assert(out == Seq((1, 0L, 0.0), (2, 1L, 1.0)))
    val badM = intercept[IllegalArgumentException] {
      Similarity.truncatedRerankReport(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 2, Seq(1), k = 2)
    }
    assert(badM.getMessage.contains(">= k"))
  }

  test("capPerStratumSample: computed rates match hand-specified stratifiedHashSample") {
    val rows = (0L until 10L).map(i => row(i, "big")) ++
      (100L until 103L).map(i => row(i, "small"))
    val df = table("id bigint, s string", rows)
    val capped = General.capPerStratumSample(df, "s", "id", cap = 3L, m = 64)
      .collect().map(r => r.getLong(0)).sorted.toSeq
    val manual = General.stratifiedHashSample(df, "s", "id",
        rates = Map("big" -> 0.3, "small" -> 1.0), m = 64)
      .collect().map(r => r.getLong(0)).sorted.toSeq
    assert(capped == manual)
    // whole small stratum survives (cap >= its count)
    assert(capped.filter(_ >= 100L) == Seq(100L, 101L, 102L))
  }

  test("capPerStratumSample: cap >= every stratum keeps the full frame") {
    val df = table("id bigint, s string",
      (0L until 6L).map(i => row(i, if (i % 2 == 0) "a" else "b")))
    assert(General.capPerStratumSample(df, "s", "id", cap = 10L).count() == 6L)
  }

  test("capPerStratumSample: non-string strata cap via the string cast") {
    val df = table("id bigint, s int",
      (0L until 6L).map(i => row(i, (i % 2).toInt)))
    assert(General.capPerStratumSample(df, "s", "id", cap = 10L).count() == 6L)
  }

  test("capPerStratumSample: NULL stratum fails loudly, never silently drops") {
    val df = table("id bigint, s string",
      Seq(row(0L, "a"), row(1L, null), row(2L, "a")))
    val e = intercept[IllegalArgumentException] {
      General.capPerStratumSample(df, "s", "id", cap = 10L)
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("capGroupShare: share-derived cap, smallest hashes win, floor of one") {
    import graft.functions.TextFunctions
    // 20 rows, maxShare 0.2 -> cap 4; group 'big' has 15, 'small' 5
    val rows = (0L until 15L).map(i => row(i, "big")) ++
      (100L until 105L).map(i => row(i, "small"))
    val df = table("id bigint, g string", rows)
    val got = Corpus.capGroupShare(df, Seq("g"), "id", 0.2, "s1")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(got.count(_._1 == "big") == 4 && got.count(_._1 == "small") == 4)
    // ground truth: per group the cap SMALLEST portable hashes of
    // "s1:<id>", ties by id
    val hv = df.select(col("g"), col("id"),
        TextFunctions.portableTokenHash32(
          concat(lit("s1:"), col("id").cast("string"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hv.groupBy(_._1).toSeq.flatMap { case (g, grp) =>
      grp.sortBy(t => (t._3, t._2)).take(4).map(t => (g, t._2))
    }.toSet
    assert(got.toSet == expected)
    // the floor: a cap below one row keeps one representative per group
    val tiny = Corpus.capGroupShare(df, Seq("g"), "id", 0.01, "s1")
    assert(tiny.groupBy("g").count().collect()
      .forall(_.getLong(1) == 1L))
    // determinism: identical rerun, identical survivors
    assert(Corpus.capGroupShare(df, Seq("g"), "id", 0.2, "s1")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet == got.toSet)
    // loudness
    intercept[IllegalArgumentException] {
      Corpus.capGroupShare(df, Seq("g"), "id", 1.5, "s1")
    }
    intercept[IllegalArgumentException] {
      Corpus.capGroupShare(
        table("id bigint, g string", Seq(row(null, "a"))),
        Seq("g"), "id", 0.5, "s1")
    }
  }

  test("exactCapPerStratum: unsupported key type fails loudly, never empty") {
    val df = table("id double, s string",
      Seq(row(1.5, "x"), row(2.5, "x")))
    val e = intercept[IllegalArgumentException] {
      General.exactCapPerStratum(df, "s", "id", cap = 1)
    }
    assert(e.getMessage.contains("integral or string"))
  }

  test("exactCapPerStratum: string ids match the row_number formulation") {
    import graft.functions.TextFunctions
    val rows = (0 until 9).map(i => row(s"url-$i", "big")) ++
      Seq(row("url-x", "small"), row("url-y", "small"))
    val df = table("id string, s string", rows)
    val got = General.exactCapPerStratum(df, "s", "id", cap = 3)
      .collect().map(r => (r.getString(1), r.getString(0))).toSet
    assert(got.count(_._1 == "big") == 3 && got.count(_._1 == "small") == 2)
    // ground truth: per stratum, the cap ids with largest portable
    // hash, ties by id ascending (lexicographic)
    val hv = df.select(col("s"), col("id"),
        TextFunctions.portableTokenHash32(col("id")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = hv.groupBy(_._1).toSeq.flatMap { case (s, g) =>
      g.sortBy(t => (-t._3, t._2)).take(3).map(t => (s, t._2)).toSeq
    }.toSet
    assert(got == expected)
  }

  test("bm25: exact weights on a hand-computed corpus; minDocFreq prunes") {
    val docs = table("id bigint, text string", Seq(
      row(1L, "a a b"),
      row(2L, "a c c c")))
    // N=2, total tokens 7, avgdl=3.5; same IEEE op order as the operator
    def tfNorm(tf: Long, dl: Int): Double =
      (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / 3.5))
    def idfArg(dfq: Long): Double = (2.0 - dfq + 0.5) / (dfq + 0.5) + 1.0
    val out = Corpus.bm25(docs, "id", "text")
      .orderBy("id", "token").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    val expected = Seq(
      (1L, "a", 2L, 2L, 3, tfNorm(2, 3), idfArg(2)),
      (1L, "b", 1L, 1L, 3, tfNorm(1, 3), idfArg(1)),
      (2L, "a", 1L, 2L, 4, tfNorm(1, 4), idfArg(2)),
      (2L, "c", 3L, 1L, 4, tfNorm(3, 4), idfArg(1)))
    assert(out.length == 4)
    out.zip(expected).foreach { case (got, e) =>
      assert((got._1, got._2, got._3, got._4, got._5) == ((e._1, e._2, e._3, e._4, e._5)))
      assert(got._6 == e._6, s"tf_norm mismatch for ${e._2}") // exact doubles
      assert(got._7 == e._7, s"idf_arg mismatch for ${e._2}")
      assert(got._8 == math.log(e._7) * e._6, s"bm25 mismatch for ${e._2}")
    }
    // hapax pruning drops b and c entirely
    val pruned = Corpus.bm25(docs, "id", "text", minDocFreq = 2L)
      .select("token").distinct().collect().map(_.getString(0)).toSeq
    assert(pruned == Seq("a"))
  }

  test("interDocDuplicationStats: agrees with brute force on random corpora") {
    // seeded random corpora over a tiny alphabet so gram collisions
    // across docs actually happen; brute force recomputes the per-doc
    // duplicated-gram count from first principles
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val docs = (0 until 8).map { i =>
        val n = rnd.nextInt(7) // 0..6 tokens
        row(i.toLong, Seq.fill(n)(('a' + rnd.nextInt(3)).toChar.toString).mkString(" "))
      }
      val texts = docs.map(_.getString(1))
      def grams(t: String): Set[String] = {
        val toks = t.split(" +").filter(_.nonEmpty)
        if (toks.length < 3) Set.empty
        else toks.sliding(3).map(_.mkString("_")).toSet
      }
      val gsets = texts.map(grams)
      val expected = gsets.zipWithIndex.map { case (g, i) =>
        val others = gsets.zipWithIndex.collect { case (h, j) if j != i => h }
        val dup = g.count(x => others.exists(_.contains(x)))
        (i.toLong, g.size, dup.toLong,
          if (g.isEmpty) 0.0 else dup.toDouble / g.size)
      }
      val got = Corpus.interDocDuplicationStats(
          table("id bigint, text string", docs), "id", "text", 3)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == expected)
    }
  }

  test("contentDefinedChunks: boundary closes its chunk; version edit preserves fingerprints") {
    // transparent hash for hand-checkable boundaries: token length,
    // boundary iff len % 2 == 0
    val lenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => length(t).cast("long")
    val df = table("id bigint, text string", Seq(row(1L, "aa b cc dd e")))
    val out = Corpus.contentDefinedChunks(df, "id", "text", m = 2, r = 0,
        tokenHash = lenHash)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getString(3)))
    // chunks: [aa] [b cc] [dd] [e] — each even-length token closes one
    assert(out.map(c => (c._1, c._2)).toSeq == Seq((0, 1L), (1, 2L), (2, 1L), (3, 1L)))
    // CDC robustness: inserting a chunk-aligned span leaves every other
    // chunk's fingerprint intact (the property fixed-stride chunking lacks)
    val v2 = table("id bigint, text string", Seq(row(1L, "aa zz b cc dd e")))
    val fps2 = Corpus.contentDefinedChunks(v2, "id", "text", m = 2, r = 0,
        tokenHash = lenHash)
      .collect().map(_.getString(3)).toSet
    val fps1 = out.map(_._3).toSet
    // all original chunks except [aa] (whose neighborhood changed) survive
    assert((fps1 -- fps2).size <= 1, s"lost ${(fps1 -- fps2).size} fingerprints")
  }

  test("contentDefinedChunks: default portable hash matches a local md5 brute force") {
    val docs = table("id bigint, text string", Seq(row(7L, "alpha beta gamma delta epsilon zeta eta theta")))
    val out = Corpus.contentDefinedChunks(docs, "id", "text", m = 2, r = 1)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getString(3)))
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
      d.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    val toks = "alpha beta gamma delta epsilon zeta eta theta".split(" ")
    val chunks = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[String])
    toks.foreach { t =>
      chunks.last += t
      if (h32(t) % 2 == 1) chunks += scala.collection.mutable.ArrayBuffer.empty[String]
    }
    val expected = chunks.filter(_.nonEmpty).zipWithIndex.map { case (c, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(c.mkString(" ").getBytes("UTF-8"))
      (i, md.map(b => f"${b & 0xff}%02x").mkString)
    }
    assert(out.toSeq == expected.toSeq)
  }

  test("cdcDuplicationStats: cross-doc shared chunks counted, intra-doc repeats not") {
    val lenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => length(t).cast("long")
    val df = table("id bigint, text string", Seq(
      row(1L, "aa b cc dd e"),   // chunks [aa][b cc][dd][e]
      row(2L, "xx b cc dd yy"),  // chunks [xx][b cc][dd][yy] — shares 2
      row(3L, "ff ff")))         // [ff][ff] repeats only WITHIN doc 3
    val out = Corpus.cdcDuplicationStats(df, "id", "text", m = 2, r = 0,
        tokenHash = lenHash)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 4L, 5L, 2L, 3L, 0.6), // [b cc] + [dd] shared with doc 2
      (2L, 4L, 5L, 2L, 3L, 0.6),
      (3L, 2L, 2L, 0L, 0L, 0.0))) // same fp twice in ONE doc is not dup
  }

  test("meanPoolBy: per-key element-wise means in long form") {
    import graft.operators.Similarity
    val df = table("k string, v array<float>", Seq(
      row("a", Seq(1.0f, 2.0f)),
      row("a", Seq(3.0f, 6.0f)),
      row("b", Seq(10.0f, 0.0f))))
    val out = Similarity.meanPoolBy(df, "k", "v")
      .orderBy("k", "dim").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 0, 2L, 2.0), ("a", 1, 2L, 4.0),
      ("b", 0, 1L, 10.0), ("b", 1, 1L, 0.0)))
  }

  test("embeddingDrift: identical corpora score zero, a shifted one scores high") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(19)
    val vecs = (0 until 120).map(_ => Seq.fill(4)(rnd.nextFloat() - 0.3f))
    def frame(vs: Seq[Seq[Float]]) =
      table("v array<float>", vs.map(v => row(v)))
    val same = Similarity.embeddingDrift(frame(vecs), frame(vecs),
        "v", bins = 8)
      .collect().map(_.getDouble(3))
    // identical distributions: every bucket's p_ref == p_cur exactly
    assert(same.forall(_ == 0.0), same.mkString(","))
    val flipped = vecs.map(v => v.map(x => -x))
    val moved = Similarity.embeddingDrift(frame(vecs), frame(flipped),
        "v", bins = 8)
      .collect().map(_.getDouble(3)).sum
    assert(moved > 0.25, s"psi $moved")
    intercept[IllegalArgumentException] {
      Similarity.embeddingDrift(
        frame(Nil).filter(lit(false)), frame(vecs), "v", bins = 8)
    }
  }

  test("exactCapPerStratum: exact sizes, matches the row_number formulation, nested") {
    import graft.functions.TextFunctions
    val rows = (0L until 10L).map(i => row(i, "big")) ++
      (100L until 103L).map(i => row(i, "small"))
    val df = table("id bigint, s string", rows)
    val got4 = General.exactCapPerStratum(df, "s", "id", cap = 4)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got4.count(_._1 == "big") == 4 && got4.count(_._1 == "small") == 3)
    // ground truth: per stratum, the cap ids with largest portable hash
    val hv = df.select(col("s"), col("id"),
        TextFunctions.portableTokenHash32(col("id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = hv.groupBy(_._1).toSeq.flatMap { case (s, g) =>
      g.sortBy(t => (-t._3, t._2)).take(4).map(t => (s, t._2)).toSeq
    }.toSet
    assert(got4 == expected)
    // nested: lowering the cap only removes rows, never swaps them
    val got2 = General.exactCapPerStratum(df, "s", "id", cap = 2)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got2.subsetOf(got4))
  }

  test("bigram LM score: hand-computed MLE probabilities; short docs excluded") {
    import graft.operators.Corpus
    val df = table("id bigint, text string", Seq(
      row(1L, "a b"), row(2L, "a b"), row(3L, "a c"), row(4L, "solo")))
    // c(a,b)=2, c(a,c)=1, prefix c(a)=3
    val got = Corpus.bigramLogProbScore(df, "id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L)) // doc 4 has one token: excluded
    assert(got.map(_._2) == Seq(1L, 1L, 1L))
    assert(math.abs(got(0)._3 - math.log(2.0 / 3)) < 1e-12)
    assert(math.abs(got(2)._3 - math.log(1.0 / 3)) < 1e-12)
  }

  test("vocabCoverageCurve: thresholds hand-computed, tie order pinned") {
    import graft.operators.Corpus
    // freqs: a:5, b:3, c:1, d:1 (N=10); order a, b, c, d (ties by token)
    val df = table("id bigint, text string", Seq(
      row(1L, "a a a a a b b"), row(2L, "b c d")))
    val got = Corpus.vocabCoverageCurve(df, "text",
        Seq(0.5, 0.8, 0.9, 1.0))
      .orderBy("target").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    // 0.5*10=5: a alone reaches it -> 1; 0.8*10=8: a+b -> 2;
    // 0.9*10=9: a+b+c -> 3; 1.0: all 4
    assert(got == Seq(
      (0.5, 1L, 10L), (0.8, 2L, 10L), (0.9, 3L, 10L), (1.0, 4L, 10L)),
      got.toString)
    intercept[IllegalArgumentException] {
      Corpus.vocabCoverageCurve(df, "text", Seq(0.5, 1.5))
    }
  }

  test("paddingReport: ceil arithmetic and utilizations hand-computed") {
    import graft.operators.Corpus
    // token counts 3, 4, 5 at seqLen 4: padded seqs 1+1+2=4 (16 slots),
    // packed seqs ceil(12/4)=3 (12 slots, 100% utilization)
    val df = table("id bigint, text string", Seq(
      row(1L, "a b c"), row(2L, "a b c d"), row(3L, "a b c d e")))
    val r = Corpus.paddingReport(df, "text", seqLen = 4).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
      r.getLong(4), r.getLong(6)) == ((3L, 12L, 4, 4L, 16L, 3L)))
    assert(r.getDouble(5) == 12.0 / 16)
    assert(r.getDouble(7) == 1.0)
    intercept[IllegalArgumentException] {
      Corpus.paddingReport(df, "text", seqLen = 0)
    }
  }

  test("compositionReport: shares, OOV rates, and counts hand-computed") {
    import graft.operators.Corpus
    val docs = table("src string, text string", Seq(
      row("s1", "a a b"), row("s1", "a zz"),   // s1: 5 tokens, 1 oov (zz)
      row("s2", "b b")))                        // s2: 2 tokens, 0 oov
    val vocab = table("token string", Seq(row("a"), row("b")))
    val got = Corpus.compositionReport(docs, Seq("src"), "text", vocab)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("s1", 2L, 9L, 5L, 5.0 / 7, 1L, 0.2),
      ("s2", 1L, 3L, 2L, 2.0 / 7, 0L, 0.0)), got.toString)
    intercept[IllegalArgumentException] {
      Corpus.compositionReport(docs, Nil, "text", vocab)
    }
  }

  test("stupidBackoffScore: all four paths hand-computed, short docs excluded") {
    import graft.operators.Corpus
    // reference "a b c a b d": c1 = {a:2, b:2, c:1, d:1}, N=6;
    // bigrams {(a,b):2, (b,c):1, (c,a):1, (b,d):1};
    // trigrams {(a,b,c), (b,c,a), (c,a,b), (a,b,d)} all x1
    val ref = table("id bigint, text string", Seq(row(0L, "a b c a b d")))
    val cand = table("id bigint, text string", Seq(
      row(1L, "a b c"),   // trigram hit: 1 / c2(a,b)=2
      row(2L, "x b c"),   // backoff to bigram: 0.4 * c2(b,c)=1 / c1(b)=2
      row(3L, "d c b"),   // bigram (c,b) unseen -> unigram: 0.16 * c1(b)=2 / 6
      row(4L, "b c x"),   // x never seen -> OOV floor: 0.16 * 1 / 6
      row(5L, "c a b"),   // trigram hit with ctx c2(c,a)=1 -> ln(1) = 0
      row(6L, "a b")))    // < 3 tokens: excluded
    val got = Corpus.stupidBackoffScore(ref, cand, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._2) == Seq(1L, 1L, 1L, 1L, 1L))
    assert(math.abs(got(0)._3 - math.log(1.0 / 2)) < 1e-12)
    assert(math.abs(got(1)._3 - math.log(0.4 * 1.0 / 2)) < 1e-12)
    assert(math.abs(got(2)._3 - math.log(0.4 * 0.4 * 2.0 / 6)) < 1e-12)
    assert(math.abs(got(3)._3 - math.log(0.4 * 0.4 * 1.0 / 6)) < 1e-12)
    assert(got(4)._3 == 0.0)
    intercept[IllegalArgumentException] {
      Corpus.stupidBackoffScore(ref, cand, "id", "text", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Corpus.stupidBackoffScore(
        table("id bigint, text string", Seq.empty[org.apache.spark.sql.Row]),
        cand, "id", "text")
    }
  }

  test("pmiCollocations: hand-computed PMI, hapax pruning, independence at zero") {
    import graft.operators.Corpus
    // tokens: a b a b a c  -> N=6, c(a)=3, c(b)=2, c(c)=1
    // bigrams: (a,b)x2, (b,a)x1, (a,c)x1  [per-doc streams]
    val df = table("id bigint, text string", Seq(
      row(1L, "a b a b"), row(2L, "a c")))
    val got = Corpus.pmiCollocations(df, "text", minPairCount = 1L)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == Seq(
      ("a", "b", 2L, 3L, 2L),
      ("a", "c", 1L, 3L, 1L),
      ("b", "a", 1L, 2L, 3L)), got.toString)
    assert(math.abs(got(0)._6 - math.log(2.0 * 6 / (3 * 2))) < 1e-12)
    assert(math.abs(got(1)._6 - math.log(1.0 * 6 / (3 * 1))) < 1e-12)
    assert(math.abs(got(2)._6 - math.log(1.0 * 6 / (2 * 3))) < 1e-12)
    // pruning removes the singletons, keeps (a,b)
    val pruned = Corpus.pmiCollocations(df, "text", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pruned == Seq(("a", "b")), pruned.toString)
    // a pair occurring exactly as often as independence predicts has
    // pmi 0: corpus "x y" once -> c(x,y)=1, N=2, c(x)=c(y)=1 -> ln(2)..
    // use two tokens each appearing once: pmi = ln(1*2/(1*1)) = ln 2 —
    // the rarity reward minPairCount exists to prune.
    val solo = Corpus.pmiCollocations(
      table("id bigint, text string", Seq(row(1L, "x y"))), "text", 1L)
      .collect()
    assert(solo.length == 1 &&
      math.abs(solo(0).getDouble(5) - math.log(2.0)) < 1e-12)
  }

  test("skipGramPairs: hand-computed window pairs, symmetry, repeated tokens") {
    import graft.operators.Corpus
    // "a b a", window 2: forward (a,b), (a,a) [pos0->pos2], (b,a);
    // symmetric emission doubles each unordered pair's directed counts:
    // n(a,b)=n(b,a)=2, n(a,a)=2.
    val got = Corpus.skipGramPairs(
        table("id bigint, text string", Seq(row(1L, "a b a"))), "text", 2)
      .orderBy("w_a", "w_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "a", 2L), ("a", "b", 2L), ("b", "a", 2L)),
      got.toString)
    // window 1 degenerates to symmetric adjacency; a 4-token doc has 3
    // adjacent pairs, each counted in both directions. Window larger
    // than the doc just caps at the tail (slice never overruns).
    val adj = Corpus.skipGramPairs(
        table("id bigint, text string", Seq(row(1L, "w x y z"))), "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(adj.sortBy(t => (t._1, t._2)) == Seq(
      ("w", "x", 1L), ("x", "w", 1L), ("x", "y", 1L),
      ("y", "x", 1L), ("y", "z", 1L), ("z", "y", 1L)), adj.toString)
    val wide = Corpus.skipGramPairs(
        table("id bigint, text string", Seq(row(1L, "w x"))), "text", 99)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(wide.sortBy(t => (t._1, t._2)) ==
      Seq(("w", "x", 1L), ("x", "w", 1L)), wide.toString)
    // symmetry holds pairwise across a multi-doc corpus
    val sym = Corpus.skipGramPairs(
        table("id bigint, text string",
          Seq(row(1L, "p q r p"), row(2L, "q p p"))), "text", 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    sym.foreach { case ((a, b), n) => assert(sym((b, a)) == n, s"($a,$b)") }
  }

  test("maskTokens: Scala-replica agreement, nesting, rate extremes, validation") {
    import graft.operators.Corpus
    def hv(id: Long, pos: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_$pos".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(h.take(8), 16)
    }
    val texts = Seq(
      5L -> "the quick brown fox jumps over the lazy dog again today",
      6L -> "one two three four five six seven eight nine ten")
    val df = table("doc_id bigint, text string",
      texts.map { case (id, t) => row(id, t) })
    val got = Corpus.maskTokens(df, "doc_id", "text", num = 4, den = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = texts.map { case (id, t) =>
      val toks = t.split(" ")
      val m = toks.zipWithIndex.map { case (tok, i) =>
        if (hv(id, i) % 16 < 4) "<mask>" else tok
      }
      (id, m.mkString(" "), toks.length.toLong,
        m.count(_ == "<mask>").toLong)
    }
    assert(got.toSeq == exp, s"$got vs $exp")
    assert(exp.map(_._4).sum > 0, "rate 4/16 must mask something here")
    // nesting: positions masked at 1/16 are a subset of those at 4/16
    def maskedPos(num: Int) =
      Corpus.maskTokens(df, "doc_id", "text", num, 16).collect()
        .map(r => r.getLong(0) -> r.getString(1).split(" ").zipWithIndex
          .filter(_._1 == "<mask>").map(_._2).toSet).toMap
    val low = maskedPos(1); val high = maskedPos(4)
    low.foreach { case (id, ps) => assert(ps.subsetOf(high(id)), s"doc $id") }
    // extremes
    val none = Corpus.maskTokens(df, "doc_id", "text", 0, 16).collect()
    assert(none.forall(_.getLong(3) == 0L))
    val all = Corpus.maskTokens(df, "doc_id", "text", 16, 16).collect()
    assert(all.forall(r => r.getLong(3) == r.getLong(2)))
    intercept[IllegalArgumentException] {
      Corpus.maskTokens(df, "doc_id", "text", 17, 16)
    }
    intercept[IllegalArgumentException] {
      Corpus.maskTokens(df, "doc_id", "text", 1, 16, maskToken = "two words")
    }
  }

  test("contrastivePairs: positives verified, derangement negatives below threshold") {
    import graft.operators.Corpus
    val texts = Map(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta", // exact dup of 1
      3L -> "one two three four five six seven",
      4L -> "red orange yellow green blue indigo",
      5L -> "cat dog bird fish mouse horse cow",
      6L -> "north south east west up down")
    val df = table("doc_id bigint, text string",
      texts.toSeq.sortBy(_._1).map { case (id, t) => row(id, t) })
    val got = Corpus.contrastivePairs(df, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val pos = got.filter(_._3 == 1).map(t => (t._1, t._2)).toSet
    val neg = got.filter(_._3 == 0).map(t => (t._1, t._2)).toSet
    assert(pos == Set((1L, 2L)), pos.toString)
    // n=6 even, shift=3: the derangement yields exactly 3 unordered
    // pairs (minus any that verified positive)
    assert(neg.size == 3 - neg.count(pos.contains), got.toString)
    assert(neg.intersect(pos).isEmpty)
    assert(got.forall(t => t._1 < t._2), got.toString)
    // every negative is genuinely below threshold on exact Jaccard
    def sh(s: String): Set[String] =
      s.split(" ").sliding(3).map(_.mkString("_")).toSet
    neg.foreach { case (a, b) =>
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j < 0.5, s"($a,$b) j=$j")
    }
  }

  test("bpeMerges: hand-computed merge sequence, frequency weighting, early exhaustion") {
    // words: hug freq 3, pug freq 2. pairs: (h,u)=3, (u,g)=5, (p,u)=2
    // -> merge ug(5); then (h,ug)=3 -> hug; then (p,ug)=2 -> pug; dry.
    val df = table("id bigint, text string", Seq(
      row(1L, "hug pug hug"), row(2L, "hug pug"),
      row(3L, null), row(4L, "")))
    val got = Corpus.bpeMerges(df, "text", numMerges = 8)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "u", "g", "ug", 5L),
      (2, "h", "ug", "hug", 3L),
      (3, "p", "ug", "pug", 2L)), got.toString)
  }

  test("bpeMerges: overlap counting, greedy left-to-right apply, lexicographic ties") {
    // aaa(freq 2): overlapping (a,a) counts twice per word -> 4.
    // After merging (a,a), aaa segments greedily to [aa, a] (never
    // [a, aa]); the (a,b)=2 vs (aa,a)=2 tie breaks to (a,b) (a < aa).
    val df = table("id bigint, text string", Seq(
      row(1L, "aaa aaa"), row(2L, "abab")))
    val got = Corpus.bpeMerges(df, "text", numMerges = 8)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "a", "aaa", 2L),
      (4, "ab", "ab", "abab", 1L)), got.toString)
  }

  test("bpeEncode: hand-computed greedy rank-order apply; empty/null text; roundtrip") {
    import graft.operators.Corpus
    // manual merge table (a,b)@1 then (ab,c)@2:
    //  ab   -> [ab]           abc -> [abc] (ab first, then ab+c)
    //  a    -> [a]            cab -> [c, ab] (no " ab  c " match)
    //  aaa  -> [a, a, a] (no merge applies)
    val merges = Seq(("a", "b"), ("ab", "c"))
    val df = table("id bigint, text string", Seq(
      row(1L, "ab abc a cab"),
      row(2L, "aaa"),
      row(3L, ""), row(4L, null)))
    val got = Corpus.bpeEncode(df, "text", merges)
      .orderBy("id")
      .collect().map(r => if (r.isNullAt(2)) null else r.getSeq[String](2)).toSeq
    assert(got(0) == Seq("ab", "abc", "a", "c", "ab"), got(0).toString)
    assert(got(1) == Seq("a", "a", "a"))
    assert(got(2) == Seq.empty) // empty text -> zero subwords
    assert(got(3) == null)      // null text propagates
    // greedy left-to-right: "aaa" under (a,a) is [aa, a], never [a, aa]
    val greedy = Corpus.bpeEncode(table("id bigint, text string",
        Seq(row(1L, "aaa"))), "text", Seq(("a", "a")))
      .head().getSeq[String](2)
    assert(greedy == Seq("aa", "a"), greedy.toString)
    // learn -> collect -> apply roundtrip: encoding the training corpus
    // with its own merges reproduces the end-of-training word states
    // (hug/pug fully merged after the 3 learned merges)
    val corpus = table("id bigint, text string", Seq(
      row(1L, "hug pug hug"), row(2L, "hug pug")))
    val learned = Corpus.collectMerges(Corpus.bpeMerges(corpus, "text", 8))
    assert(learned == Seq(("u", "g"), ("h", "ug"), ("p", "ug")))
    val enc = Corpus.bpeEncode(corpus, "text", learned)
      .orderBy("id").collect().map(_.getSeq[String](2)).toSeq
    assert(enc == Seq(Seq("hug", "pug", "hug"), Seq("hug", "pug")), enc.toString)
  }

  test("bpeEncode: segmentation is lossless on random corpora with self-learned merges (generative)") {
    import graft.operators.Corpus
    // Defining invariant of BPE segmentation: merges only ever CONCAT
    // adjacent symbols, so the encoded subwords of a document,
    // concatenated, must reproduce the document's character stream
    // exactly — any merge-table ordering bug, boundary slip, or
    // repr-delimiter corruption breaks it.
    val rnd = new scala.util.Random(1234)
    (0 until 3).foreach { trial =>
      val words = (0 until 40).map(_ =>
        (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = words.grouped(5).zipWithIndex
        .map { case (ws, i) => row(i.toLong, ws.mkString(" ")) }.toSeq
      val df = table("id bigint, text string", docs)
      val learned = Corpus.collectMerges(
        Corpus.bpeMerges(df, "text", numMerges = 1 + rnd.nextInt(6)))
      Corpus.bpeEncode(df, "text", learned).collect().foreach { r =>
        val chars = r.getString(1).trim.split(" +").filter(_.nonEmpty).mkString
        val subs = r.getSeq[String](2)
        assert(subs.mkString == chars,
          s"trial $trial doc ${r.getLong(0)}: '$chars' != ${subs.mkString("[", ",", "]")}")
        assert(subs.forall(_.nonEmpty))
      }
    }
  }

  test("bpeTokenFrequencies == explode+count of bpeEncode (generative)") {
    import graft.operators.Corpus
    // the distinct-word factorization (count words once, encode only
    // the DISTINCT word table, weight) must be value-identical to
    // counting the encoded corpus stream — same tokens, same counts
    val rnd = new scala.util.Random(99)
    (0 until 3).foreach { trial =>
      val words = (0 until 40).map(_ =>
        (0 until (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val docs = words.grouped(5).zipWithIndex
        .map { case (ws, i) => row(i.toLong, ws.mkString(" ")) }.toSeq ++
        Seq(row(98L, ""), row(99L, null)) // degenerate docs drop identically
      val df = table("id bigint, text string", docs)
      val learned = Corpus.collectMerges(
        Corpus.bpeMerges(df, "text", numMerges = 1 + rnd.nextInt(6)))
      val direct = Corpus.bpeEncode(df, "text", learned)
        .select(explode(col("bpe_tokens")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val factored = Corpus.bpeTokenFrequencies(df, "text", learned)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(factored == direct, s"trial $trial: $factored != $direct")
    }
  }

  test("collectMerges/bpeEncode: corrupted merge tables fail loudly at the API") {
    import graft.operators.Corpus
    val docs = table("id bigint, text string", Seq(row(1L, "ab")))
    def mergesDf(rows: Seq[org.apache.spark.sql.Row]) =
      table("merge_rank int, lhs string, rhs string", rows)
    // non-contiguous ranks (a dropped artifact row)
    val gap = intercept[IllegalArgumentException](Corpus.collectMerges(
      mergesDf(Seq(row(1, "a", "b"), row(3, "c", "d")))))
    assert(gap.getMessage.contains("contiguous"))
    // duplicated rank (a double-appended artifact)
    intercept[IllegalArgumentException](Corpus.collectMerges(
      mergesDf(Seq(row(1, "a", "b"), row(1, "a", "b")))))
    // duplicate (lhs, rhs) pair under distinct ranks
    val dup = intercept[IllegalArgumentException](Corpus.collectMerges(
      mergesDf(Seq(row(1, "a", "b"), row(2, "a", "b")))))
    assert(dup.getMessage.contains("duplicate"))
    // bpeEncode validates a caller-supplied table the same way
    intercept[IllegalArgumentException](
      Corpus.bpeEncode(docs, "text", Seq(("a", "b"), ("a", "b"))))
    intercept[IllegalArgumentException](
      Corpus.bpeEncode(docs, "text", Seq(("a b", "c")))) // delimiter byte
    intercept[IllegalArgumentException](
      Corpus.bpeEncode(docs, "text", Seq(("", "c"))))    // empty symbol
    // and a valid table still collects and encodes
    val ok = Corpus.collectMerges(mergesDf(Seq(row(1, "a", "b"), row(2, "ab", "c"))))
    assert(ok == Seq(("a", "b"), ("ab", "c")))
    assert(Corpus.bpeEncode(docs, "text", ok).head().getSeq[String](2) == Seq("ab"))
  }

  test("bpeEncode: vocabulary-scale merge table — >=256 trained merges, fold-equivalent, constant plan size") {
    import graft.operators.Corpus
    import graft.functions.TextFunctions
    // Synthetic corpus sized so training yields well past 256 merges:
    // 60 distinct 12-char words over a 20-letter alphabet share few
    // pairs, so nearly every word needs its own merge chain (~11 steps
    // each, ~660 available) — 300 requested merges all succeed.
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(60)((0 until 12).map(_ => ('a' + rnd.nextInt(20)).toChar).mkString).distinct
    val docs = words.grouped(6).zipWithIndex
      .map { case (ws, i) => row(i.toLong, ws.mkString(" ")) }.toSeq
    val df = table("id bigint, text string", docs)
    val merges = Corpus.collectMerges(Corpus.bpeMerges(df, "text", numMerges = 300))
    assert(merges.size == 300, s"trained only ${merges.size} merges")
    // The pre-round-12 formulation: one `replace` plan node per merge.
    // Value-identical by the ReplaceChain contract; kept here as the
    // reference implementation the native path must match at scale.
    def foldEncode(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val encodeWord: org.apache.spark.sql.Column => org.apache.spark.sql.Column = w => {
        val repr0 = concat(lit(" "),
          array_join(transform(sequence(lit(1), length(w)),
            i => w.substr(i, lit(1))), "  "),
          lit(" "))
        val reprN = merges.foldLeft(repr0) { case (r, (a, b)) =>
          org.apache.spark.sql.functions.replace(r, lit(s" $a  $b "), lit(s" $a$b "))
        }
        split(trim(reprN), "  ")
      }
      d.withColumn("bpe_tokens", flatten(transform(
        filter(TextFunctions.tokens(col("text")), w => length(w) > 0), encodeWord)))
    }
    // held-out text exercises partial merges: concatenated word pairs
    // and fragments the trainer never saw as whole words
    val held = table("id bigint, text string",
      words.sliding(2, 7).zipWithIndex.map { case (ws, i) =>
        row(100L + i, ws.mkString("") + " " + ws.head.take(7))
      }.toSeq)
    Seq(df, held).foreach { corpus =>
      val native = Corpus.bpeEncode(corpus, "text", merges)
        .orderBy("id").collect().map(_.getSeq[String](2)).toSeq
      val folded = foldEncode(corpus)
        .orderBy("id").collect().map(_.getSeq[String](2)).toSeq
      assert(native == folded, "native ReplaceChain path != per-merge replace fold")
      // segmentation losslessness at scale
      native.zip(corpus.orderBy("id").collect().map(_.getString(1))).foreach {
        case (subs, text) =>
          assert(subs.mkString == text.split(" +").filter(_.nonEmpty).mkString)
      }
    }
    // THE scale property: plan size is constant in the merge count —
    // the 300-merge analyzed tree has exactly as many expression nodes
    // as the 8-merge one (the table lives in a reference array, not in
    // plan nodes), where the fold path grows by one node per merge.
    def nodeCount(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.analyzed.expressions.map(_.collect { case e => e }.size).sum
    val small = nodeCount(Corpus.bpeEncode(df, "text", merges.take(8)))
    val large = nodeCount(Corpus.bpeEncode(df, "text", merges))
    assert(large == small,
      s"plan grew with merge count: $small nodes @8 merges, $large @300")
    assert(nodeCount(foldEncode(df)) > large + 250, "fold baseline should dwarf it")
  }

  test("bpeMerges batching: engineered conflict corpora where naive batching would diverge") {
    import graft.operators.Corpus
    // maxDriverWords = 0 forces the DISTRIBUTED tier — the batching
    // guards under test here live in its pass simulation
    def seqOf(d: org.apache.spark.sql.DataFrame, n: Int, k: Int) =
      Corpus.bpeMerges(d, "text", n, batchK = k, maxDriverWords = 0)
        .orderBy("merge_rank")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    // NEW-PAIR OVERTAKE: "xab" x100 + "cd" x99. Original counts
    // (a,b)=100, (x,a)=100, (c,d)=99; merge 1 = (a,b) (lex). Applying
    // it CREATES (x,ab)=100, so sequential merge 2 is (x,ab) — NOT
    // (c,d), which a naive take-top-k batch (symbol-disjointness
    // alone) would have applied in the same pass. The count-gap guard
    // must push (c,d) out of the first batch.
    val overtake = table("id bigint, text string", Seq(
      row(1L, Seq.fill(100)("xab").mkString(" ")),
      row(2L, Seq.fill(99)("cd").mkString(" "))))
    val exp1 = seqOf(overtake, 4, 1)
    assert(exp1.map(t => (t._2, t._3)).take(3) ==
      Seq(("a", "b"), ("x", "ab"), ("c", "d")), exp1.toString)
    (2 to 8).foreach { k =>
      assert(seqOf(overtake, 4, k) == exp1, s"batchK=$k diverged")
    }
    // and the driver tier reproduces the same sequence
    val drv = Corpus.bpeMerges(overtake, "text", 4).orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(drv == exp1, s"driver tier diverged: $drv")
    // OVERLAPPING CANDIDATES: top pairs share a symbol ((t,h) then
    // (th,e) after the merge) — symbol-disjointness must serialize.
    val chain = table("id bigint, text string", Seq(
      row(1L, Seq.fill(50)("the").mkString(" ")),
      row(2L, Seq.fill(30)("qz").mkString(" "))))
    val exp2 = seqOf(chain, 3, 1)
    (2 to 8).foreach { k =>
      assert(seqOf(chain, 3, k) == exp2, s"batchK=$k diverged")
    }
    // SELF-ADJACENT MERGE: (a,a)'s new-pair bound is its own count,
    // so nothing may batch after it ("aaaa" overlap chains recount).
    val selfadj = table("id bigint, text string", Seq(
      row(1L, Seq.fill(40)("aaaa").mkString(" ")),
      row(2L, Seq.fill(39)("bc").mkString(" "))))
    val exp3 = seqOf(selfadj, 4, 1)
    (2 to 8).foreach { k =>
      assert(seqOf(selfadj, 4, k) == exp3, s"batchK=$k diverged")
    }
  }

  test("bpeMerges batching: random-corpus equivalence and measured pass reduction") {
    import graft.operators.Corpus
    // generative equivalence: batched and sequential merge tables are
    // identical on random corpora (Zipf-ish repetition mix)
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val base = Seq.fill(12)((0 until (2 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val words = base.flatMap(w => Seq.fill(1 + rnd.nextInt(9))(w))
      val docs = rnd.shuffle(words).grouped(8).zipWithIndex
        .map { case (ws, i) => row(i.toLong, ws.mkString(" ")) }.toSeq
      val df = table("id bigint, text string", docs)
      val n = 10 + rnd.nextInt(10)
      val sequential = Corpus
        .bpeMerges(df, "text", n, batchK = 1, maxDriverWords = 0)
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      val batched = Corpus
        .bpeMerges(df, "text", n, batchK = 8, maxDriverWords = 0)
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      val driver = Corpus.bpeMerges(df, "text", n) // driver tier
        .orderBy("merge_rank").collect().map(_.toSeq).toSeq
      assert(batched == sequential, s"trial $trial: batched != sequential")
      assert(driver == sequential, s"trial $trial: driver tier != sequential")
    }
    // measured pass reduction on the 300-merge training corpus of the
    // vocabulary-scale encode spec: sequential is one pass per merge
    // (+1 exhaustion probe at most); batching must land well under
    // half that — the q103-family scale fix this spec pins.
    val words = {
      val r = new scala.util.Random(42)
      Seq.fill(60)((0 until 12).map(_ => ('a' + r.nextInt(20)).toChar).mkString).distinct
    }
    val df = table("id bigint, text string",
      words.grouped(6).zipWithIndex
        .map { case (ws, i) => row(i.toLong, ws.mkString(" ")) }.toSeq)
    val (batchedDf, passes) =
      Corpus.bpeMergesWithPasses(df, "text", 300, batchK = 16,
        maxDriverWords = 0)
    val batched = batchedDf.orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val sequential = Corpus.bpeMerges(df, "text", 300) // driver tier
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(batched == sequential, "300-merge batched != driver sequential")
    assert(batched.size == 300)
    assert(passes < 150, s"expected a >2x pass reduction, got $passes passes")
    info(s"300 merges in $passes batched passes (sequential = ~300)")
    // the driver tier trains the same table in ONE pass (one Spark job)
    val (drvDf, drvPasses) =
      Corpus.bpeMergesWithPasses(df, "text", 300, batchK = 16)
    assert(drvPasses == 1)
    assert(drvDf.orderBy("merge_rank").collect().map(_.toSeq).toSeq == batched)
  }

  test("bpeMerges tier equivalence on supplementary-plane text (non-BMP)") {
    import graft.operators.Corpus
    // Emoji / supplementary-plane code points are TWO UTF-16 code
    // units but ONE Spark substr character: the driver tier must split
    // by code points or its initial alphabet (lone surrogates) can
    // never align with the distributed tier / bpeEncode segmentation.
    val sun = new String(Character.toChars(0x1F31E)) // 🌞
    val moon = new String(Character.toChars(0x1F31D)) // 🌝
    val dbl = new String(Character.toChars(0x1D54F)) // 𝕏 (math bold X)
    val df = table("id bigint, text string", Seq(
      row(1L, Seq.fill(20)(s"$sun${moon}a").mkString(" ")),
      row(2L, Seq.fill(15)(s"$dbl$sun").mkString(" ")),
      row(3L, Seq.fill(9)(s"ab$moon").mkString(" "))))
    def tbl(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val dist = tbl(Corpus.bpeMerges(df, "text", 5, batchK = 1,
      maxDriverWords = 0))
    val driver = tbl(Corpus.bpeMerges(df, "text", 5)) // driver tier
    assert(driver == dist,
      s"non-BMP tier divergence:\n driver=$driver\n dist=$dist")
    // first merge must pair WHOLE code points, never a lone surrogate
    val (lhs, rhs) = (driver.head(1).toString, driver.head(2).toString)
    Seq(lhs, rhs).foreach { s =>
      assert(!s.exists(c => Character.isSurrogate(c) &&
          (s.length == 1 || !Character.isSurrogatePair(s(0), s(1)))),
        s"lone surrogate symbol in merge: ${s.map(_.toInt)}")
    }
    // and the trained table round-trips through bpeEncode losslessly
    val enc = Corpus.bpeEncode(df, "text",
      Corpus.bpeMerges(df, "text", 5).orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
    import org.apache.spark.sql.functions._
    val joined = enc.select(concat_ws("", col("bpe_tokens")).as("glued"),
        regexp_replace(col("text"), " +", "").as("orig"))
    assert(joined.filter(col("glued") =!= col("orig")).count() == 0)
  }

  test("mixtureWeights: tau=1 is natural share, small tau upsamples the tail") {
    import graft.operators.Corpus
    // head source 90 tokens, tail 10: p = (0.9, 0.1)
    val df = table("src string, text string", Seq(
      row("head", Seq.fill(90)("w").mkString(" ")),
      row("tail", Seq.fill(10)("w").mkString(" "))))
    val natural = Corpus.mixtureWeights(df, "src", "text", temperature = 1.0)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(natural == Seq(("head", 90L, 0.9, 0.9, 1.0),
      ("tail", 10L, 0.1, 0.1, 1.0)), natural.toString)
    // tau = 0.5: w ∝ sqrt(p) -> tail share rises from 0.1 to 0.25,
    // oversampling 2.5x; head drops to 0.75
    val half = Corpus.mixtureWeights(df, "src", "text", temperature = 0.5)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getDouble(4), r.getDouble(5))).toSeq
    assert(half == Seq(("head", 0.75, 0.833333), ("tail", 0.25, 2.5)),
      half.toString)
    // weights always sum to 1 (up to the 6dp rounding)
    assert(math.abs(half.map(_._2).sum - 1.0) < 2e-6)
    intercept[IllegalArgumentException] {
      Corpus.mixtureWeights(df, "src", "text", temperature = 1.5)
    }
    intercept[IllegalArgumentException] {
      Corpus.mixtureWeights(df.withColumn("text", lit(null).cast("string")),
        "src", "text", 0.7)
    }
  }

  test("tokenBudgetAllocation: waterfilling caps the prefix, fills the rest, conserves budget") {
    import graft.operators.Corpus
    // sources: tiny 10 tokens, small 30, big 60 (total 100); τ=1 so
    // w = p exactly; budget 150, maxEpochs 2.
    //   caps C = (20, 60, 120); r = C/p = 200 for every source — tie
    //   broken by name. All-same-r means either all cap (ΣC=200 > 150)
    //   or none: cond for first (a=big after name sort? names chosen
    //   to pin order) ... pick distinct epochs instead: maxEpochs
    //   differs per call, so use sizes that separate r.
    val df = table("src string, text string", Seq(
      row("tiny", Seq.fill(10)("w").mkString(" ")),
      row("small", Seq.fill(30)("w").mkString(" ")),
      row("big", Seq.fill(60)("w").mkString(" "))))
    // τ=0.5: pt = sqrt(p) -> tiny is upweighted most, so its cap
    // binds first: r = 2*n / sqrt(n/100) — increasing in n, so the
    // capped prefix is (tiny, small, big) order by r ascending...
    // r(10)=63.2, r(30)=109.5, r(60)=154.9; budget 150:
    //   cond(tiny): 63.2*(sum pt) <= 150? sum pt = .316+.548+.775=1.639
    //     63.2*1.639=103.6 <= 150 -> capped (alloc 20)
    //   cond(small): 109.5*(1.639-.316)=144.9 <= 150-20=130? NO ->
    //     uncapped. lambda = 130/1.323 = 98.26
    //   alloc(small)=53.8, alloc(big)=76.1; total = 20+53.8+76.1 ~ 150
    val got = Corpus.tokenBudgetAllocation(df, "src", "text",
        budgetTokens = 150, temperature = 0.5, maxEpochs = 2.0)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    val m = got.map(t => t._1 -> t).toMap
    assert(m("tiny")._5 && m("tiny")._3 == 20.0 && m("tiny")._4 == 2.0,
      got.toString)
    assert(!m("small")._5 && !m("big")._5, got.toString)
    // budget conservation (within the 6dp rounding of each term)
    val totalAlloc = got.map(_._3).sum
    assert(math.abs(totalAlloc - 150.0) < 1e-3, totalAlloc.toString)
    // epochs never exceed the cap
    assert(got.forall(_._4 <= 2.0 + 1e-9), got.toString)
    // a budget beyond every cap allocates exactly the caps (2 epochs
    // each) and leaves the remainder honestly unassigned
    val rich = Corpus.tokenBudgetAllocation(df, "src", "text",
        budgetTokens = 10000, temperature = 0.5, maxEpochs = 2.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(rich.forall { case (_, n, alloc, ep, capped) =>
      capped && alloc == 2.0 * n && ep == 2.0
    }, rich.toString)
    intercept[IllegalArgumentException] {
      Corpus.tokenBudgetAllocation(df, "src", "text", 0L)
    }
  }

  test("zipfFit: exact power law recovers slope -1 with r2 1; validation") {
    import graft.operators.Corpus
    // freq_i = 24/i for ranks 1..4 is an EXACT power law: slope -1,
    // intercept ln 24, r2 = 1 (up to the 1e-12 per-term rounding)
    val words = Seq.fill(24)("aa") ++ Seq.fill(12)("bb") ++
      Seq.fill(8)("cc") ++ Seq.fill(6)("dd")
    val df = table("id bigint, text string",
      words.grouped(10).zipWithIndex
        .map { case (ws, i) => row(i.toLong, ws.mkString(" ")) }.toSeq)
    val got = Corpus.zipfFit(df, "text", topN = 10).head()
    assert(got.getLong(0) == 4L)
    assert(got.getDouble(1) == -1.0, s"slope ${got.getDouble(1)}")
    assert(math.abs(got.getDouble(2) - 3.178054) < 1e-9,
      s"intercept ${got.getDouble(2)}")
    assert(got.getDouble(3) == 1.0, s"r2 ${got.getDouble(3)}")
    // topN truncates the tail: with topN=2 only aa/bb rank
    assert(Corpus.zipfFit(df, "text", topN = 2).head().getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      Corpus.zipfFit(df, "text", topN = 1)
    }
    // a single-token corpus cannot fit a line
    intercept[IllegalArgumentException] {
      Corpus.zipfFit(table("id bigint, text string",
        Seq(row(1L, "solo solo"))), "text", 5)
    }
  }

  test("removeBoilerplateLines: cross-doc lines cut, short/intra-doc/unique kept") {
    val docs = table("id bigint, text string", Seq(
      row(1L, "hello world\nnav bar\nunique one\nok"),
      row(2L, "nav bar\nunique two\nok"),
      row(3L, "nav bar\nnav bar\nsolo text"),
      row(4L, "rep line\nrep line\nend text"),   // intra-doc only: kept
      row(5L, "  nav bar  \nx"),                 // trimmed match; "x" short
      row(6L, null.asInstanceOf[String])))
    val out = Corpus.removeBoilerplateLines(docs, "id", "text",
        minDocs = 2, minLineChars = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out(0) == ((1L, 4, 1, "hello world\nunique one\nok")))
    assert(out(1) == ((2L, 3, 1, "unique two\nok")))
    // doc3: BOTH copies of the cross-doc boilerplate line go
    assert(out(2) == ((3L, 3, 2, "solo text")))
    // doc4: "rep line" repeats only intra-doc -> distinct-doc count 1, kept
    assert(out(3) == ((4L, 3, 0, "rep line\nrep line\nend text")))
    // doc5: line identity is the TRIMMED line; rebuild keeps originals
    assert(out(4) == ((5L, 2, 1, "x")))
    // NULL text = the empty document
    assert(out(5) == ((6L, 0, 0, "")))
    // hashed and plain-text line keys agree
    val plain = Corpus.removeBoilerplateLines(docs, "id", "text",
        minDocs = 2, minLineChars = 3, hashLines = false)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(plain.toSeq == out.toSeq)
    // validation: minDocs=1 would drop every line
    assert(intercept[IllegalArgumentException] {
      Corpus.removeBoilerplateLines(docs, "id", "text", minDocs = 1)
    }.getMessage.contains(">= 2"))
  }

  test("tokenBudgetSelect: prefix rule, tie order, NULL scores dropped") {
    val docs = table("id bigint, grp string, score double, n_tokens bigint", Seq(
      // g1 ranking (score desc, id asc): 1 (cum 5), 2 (cum 9), 4 (cum 19), 3 (cum 22)
      row(1L, "g1", 0.9, 5L),
      row(2L, "g1", 0.9, 4L),   // score tie with doc 1 -> id breaks it
      row(3L, "g1", 0.5, 3L),
      row(4L, "g1", 0.8, 10L),
      // g2: doc 5 exactly fills the budget; doc 6 is one over
      row(5L, "g2", 1.0, 10L),
      row(6L, "g2", 0.9, 1L),
      row(7L, "g2", null.asInstanceOf[java.lang.Double], 2L))) // unrankable
    val out = Corpus.tokenBudgetSelect(docs, "id", "grp", "score",
        "n_tokens", budgetTokens = 10L)
      .orderBy("grp", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // PREFIX rule: doc 4 overflows the g1 budget and BLOCKS doc 3 even
    // though doc 3 alone would fit — the deliberate, stated semantics
    assert(out.toSeq == Seq(
      ("g1", 1L, 5L, 5L), ("g1", 2L, 4L, 9L), ("g2", 5L, 10L, 10L)))
    assert(intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSelect(docs, "id", "grp", "score", "n_tokens", 0L)
    }.getMessage.contains("budgetTokens"))
  }
}
