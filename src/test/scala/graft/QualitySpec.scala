package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality
import graft.testkit.SparkTestKit._

class QualitySpec extends AnyFunSuite {

  private def frame() = table("id bigint, v double, s string", Seq(
    row(1L, 5.0, "AA"),
    row(2L, 99.0, "bb"),     // out of range, regex fail
    row(3L, null, null),     // null v (range rule: NULL -> violation)
    row(1L, 7.0, "CC")))     // duplicate id

  test("check: hand-computed violation counts; NULL predicate counts as violation") {
    val got = Quality.check(frame(),
        Seq(
          Quality.inRange("v", 0.0, 10.0),
          Quality.notNull("s"),
          Quality.matchesRegex("s", "^[A-Z]+$"),
          Quality.acceptedValues("s", Seq("AA", "CC"))),
        uniqueKeys = Seq(Seq("id")))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      // bb fails membership, NULL is a violation too
      ("accepted_values(s)", 4L, 2L, false),
      // 99 out of range, NULL v -> unknown -> violation
      ("in_range(v)", 4L, 2L, false),
      // bb lowercase, NULL rlike -> violation
      ("matches_regex(s)", 4L, 2L, false),
      ("not_null(s)", 4L, 1L, false),
      // both rows of the duplicated id count as violations
      ("unique_key(id)", 4L, 2L, false)), got.toString)
  }

  test("check: strict pass on clean data; tolerance rate flips the verdict") {
    val clean = table("id bigint, v double", Seq(
      row(1L, 1.0), row(2L, 2.0), row(3L, 30.0)))
    val strict = Quality.check(clean,
        Seq(Quality.inRange("v", 0.0, 10.0), Quality.notNull("v")),
        uniqueKeys = Seq(Seq("id")))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4))).toSeq
    assert(strict == Seq(
      ("in_range(v)", 1L, false),   // the 30.0 row
      ("not_null(v)", 0L, true),
      ("unique_key(id)", 0L, true)), strict.toString)
    // 1 violation in 3 rows passes at a 40% tolerance
    val tolerant = Quality.check(clean,
        Seq(Quality.inRange("v", 0.0, 10.0)), maxViolationRate = 0.4)
      .collect().map(r => r.getBoolean(4)).toSeq
    assert(tolerant == Seq(true))
  }

  test("kAnonymityAudit: size profile hand-computed; NULL quasi values form a class") {
    import graft.operators.Quality
    val df = table("seg string, nat int, x int", Seq(
      row("A", 1, 0), row("A", 1, 0), row("A", 1, 0),   // class of 3
      row("A", 2, 0), row("A", 2, 0),                   // class of 2
      row("B", 1, 0),                                   // singleton
      row(null, 1, 0), row(null, 1, 0)))                // NULL class of 2
    val got = Quality.kAnonymityAudit(df, Seq("seg", "nat"), k = 3L)
      .orderBy("group_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, 1L, true),
      (2L, 2L, 4L, true),
      (3L, 1L, 3L, false)), got.toString)
    intercept[IllegalArgumentException] {
      Quality.kAnonymityAudit(df, Seq("seg"), k = 1L)
    }
    intercept[IllegalArgumentException] {
      Quality.kAnonymityAudit(df, Seq("nope"), k = 3L)
    }
  }

  test("referentialIntegrity: orphans, NULL refs, distinct keys hand-computed") {
    import graft.operators.Quality
    val child = table("fk bigint, x int", Seq(
      row(1L, 0), row(1L, 0), row(2L, 0),    // resolve
      row(9L, 0), row(9L, 0), row(8L, 0),    // orphans: keys 9 (x2), 8
      row(null, 0)))                          // NULL ref: counted apart
    val parent = table("pk bigint", Seq(row(1L), row(2L), row(3L)))
    val got = Quality.referentialIntegrity(child, Seq("fk"),
        parent, Seq("pk"), "child->parent")
      .collect()(0)
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) ==
      (("child->parent", 7L, 1L, 3L, 2L)))
    assert(got.getDouble(5) == 3.0 / 7)
    intercept[IllegalArgumentException] {
      Quality.referentialIntegrity(child, Seq("fk", "x"),
        parent, Seq("pk"), "bad")
    }
  }

  test("blocklistAudit: token granularity, overlapping phrases, flag boundary") {
    import graft.testkit.SparkTestKit.{row, table}
    val docs = table("doc_id bigint, text string", Seq(
      row(1L, "class token stream"),        // 'ass' is a substring, NOT a token
      row(2L, "big big table end"),         // phrase matches once, 'big' twice
      row(3L, "slow slow slow"),            // overlapping bigram: 2 phrase hits
      row(4L, "perfectly clean words")))
    val got = Quality.blocklistAudit(docs, "doc_id", "text",
        terms = Seq("ass", "big", "big table", "slow slow"), maxHits = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 0L, false),
      (2L, 3L, 2L, true),   // big x2 + 'big table' x1 = 3 > 2
      (3L, 2L, 1L, false),  // overlapping 'slow slow' x2; 2 > 2 is false
      (4L, 0L, 0L, false)), got.toString)
    // boundary: exactly maxHits hits is NOT flagged (strict >)
    val atBound = Quality.blocklistAudit(docs, "doc_id", "text",
        terms = Seq("big"), maxHits = 2L)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2L)
      .collect()(0)
    assert(atBound.getLong(1) == 2L && !atBound.getBoolean(3))
    // policy validation fails loudly
    intercept[IllegalArgumentException] {
      Quality.blocklistAudit(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Quality.blocklistAudit(docs, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Quality.blocklistAudit(docs, "doc_id", "text", Seq("bad  spacing"))
    }
  }

  test("check: duplicate rule names and empty suites fail loudly") {
    intercept[IllegalArgumentException] {
      Quality.check(frame(), Seq(
        Quality.notNull("s"), Quality.notNull("s")))
    }
    intercept[IllegalArgumentException] {
      Quality.check(frame(), Nil)
    }
  }

  test("passRateCI: textbook Wilson bounds, boundary rates, NULL flags excluded") {
    import org.apache.spark.sql.functions._
    def flags(g: String, passes: Int, fails: Int, nulls: Int = 0) =
      Seq.fill(passes)(row(g, true)) ++ Seq.fill(fails)(row(g, false)) ++
        Seq.fill(nulls)(row(g, null.asInstanceOf[java.lang.Boolean]))
    val df = table("g string, f boolean",
      flags("a", 9, 1) ++ flags("b", 10, 0) ++ flags("c", 0, 10) ++
        flags("d", 2, 2, nulls = 3) ++ flags("e", 0, 0, nulls = 2))
    val got = Quality.passRateCI(df, Seq("g"), "f")
      .orderBy("g").collect()
    val m = got.map(r => r.getString(0) -> r).toMap
    // 9/10 at z=1.96: the classic Wilson example
    assert(m("a").getLong(1) == 10 && m("a").getLong(2) == 9)
    assert(m("a").getDouble(3) == 0.9)
    assert(m("a").getDouble(4) == 0.595844 && m("a").getDouble(5) == 0.982124)
    // all-pass pins hi to exactly 1, all-fail pins lo to exactly 0
    assert(m("b").getDouble(5) == 1.0 && m("b").getDouble(4) == 0.72246)
    assert(m("c").getDouble(4) == 0.0 && m("c").getDouble(5) == 0.27754)
    // NULL flags are excluded from n, not failures
    assert(m("d").getLong(1) == 4 && m("d").getLong(2) == 2)
    assert(m("d").getDouble(4) == 0.150036 && m("d").getDouble(5) == 0.849964)
    // a group with only NULL flags keeps its row, NULL stats
    assert(m("e").getLong(1) == 0 && m("e").isNullAt(3) && m("e").isNullAt(4))
    intercept[IllegalArgumentException] {
      Quality.passRateCI(df, Nil, "f")
    }
    intercept[IllegalArgumentException] {
      Quality.passRateCI(df, Seq("g"), "f", z = 0.0)
    }
  }

  test("piiScan: counts non-overlapping matches per category; flags and totals") {
    val df = table("id bigint, t string", Seq(
      row(1L, "contact a@b.io or c.d+x@e-f.org today"),
      row(2L, "fetch https://x.io/a and http://y.z/b_c now"),
      row(3L, "hosts 10.0.0.1 192.168.1.255 but not 1.2.3"),
      row(4L, "call 555-123-4567; not 55-123-4567 or 5551234567"),
      row(5L, "perfectly clean text with no patterns at all")))
    val got = Quality.piiScan(df, "id", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toMap
    assert(got(1L) == ((2L, 0L, 0L, 0L, 2L, true)), got(1L).toString)
    assert(got(2L) == ((0L, 2L, 0L, 0L, 2L, true)), got(2L).toString)
    assert(got(3L) == ((0L, 0L, 2L, 0L, 2L, true)), got(3L).toString)
    assert(got(4L) == ((0L, 0L, 0L, 1L, 1L, true)), got(4L).toString)
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L, false)), got(5L).toString)
    // a doc with MANY hits counts them all (directory-page detection)
    val many = table("id bigint, t string", Seq(
      row(9L, (1 to 40).map(i => s"u$i@ex.com").mkString(" "))))
    assert(Quality.piiScan(many, "id", "t").head().getLong(1) == 40L)
    // custom patterns ride the same machinery
    val custom = Quality.piiScan(df, "id", "t",
      Seq("digits" -> "\\d+"))
      .filter(org.apache.spark.sql.functions.col("id") === 3L).head()
    assert(custom.getLong(1) == 11L, custom.toString) // 8 + 3 digit runs
    // a bad regex fails at PLAN time, loudly
    intercept[java.util.regex.PatternSyntaxException] {
      Quality.piiScan(df, "id", "t", Seq("bad" -> "(unclosed"))
    }
    intercept[IllegalArgumentException] {
      Quality.piiScan(df, "id", "t",
        Seq("a" -> "x", "a" -> "y")) // duplicate category
    }
    intercept[IllegalArgumentException] {
      Quality.piiScan(df, "id", "t", Seq("not a col name" -> "x"))
    }
  }

  test("tableFingerprint: order-independent, change-sensitive, NULL-distinct") {
    val df = table("k bigint, s string", Seq(
      row(1L, "ab"), row(2L, "cd"), row(3L, null)))
    def fp(d: org.apache.spark.sql.DataFrame) = {
      val r = Quality.tableFingerprint(d, Seq("k", "s")).head()
      (r.getLong(0), r.getDecimal(1).toBigInteger)
    }
    val base = fp(df)
    assert(base._1 == 3L)
    // shuffle/partitioning invariance: the sum is commutative
    assert(fp(df.repartition(5)) == base)
    assert(fp(df.orderBy(org.apache.spark.sql.functions.col("s").desc)) == base)
    // any single-value change moves the fingerprint
    assert(fp(table("k bigint, s string", Seq(
      row(1L, "ab"), row(2L, "ce"), row(3L, null)))) != base)
    // NULL is not the empty string
    assert(fp(table("k bigint, s string", Seq(
      row(1L, "ab"), row(2L, "cd"), row(3L, "")))) != base)
    // field boundaries are framed: ("ab","c") != ("a","bc")
    val t1 = table("a string, b string", Seq(row("ab", "c")))
    val t2 = table("a string, b string", Seq(row("a", "bc")))
    assert(Quality.tableFingerprint(t1, Seq("a", "b")).head().getDecimal(1) !=
      Quality.tableFingerprint(t2, Seq("a", "b")).head().getDecimal(1))
    // the JVM reference hash: one row, hand-composed canonical string
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("1\u0001ab".getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString
    val expected = new java.math.BigInteger(md, 16).longValue()
    val one = Quality.tableFingerprint(
      table("k bigint, s string", Seq(row(1L, "ab"))), Seq("k", "s")).head()
    assert(one.getDecimal(1).toBigInteger ==
      java.math.BigInteger.valueOf(expected), one.toString)
    // non-portable types are refused at plan time
    val err = intercept[IllegalArgumentException] {
      Quality.tableFingerprint(
        table("k bigint, x double", Seq(row(1L, 0.5))), Seq("k", "x"))
    }
    assert(err.getMessage.contains("not"), err.getMessage)
  }

  test("tableFingerprintDelta: fp(base) + delta == fp(after CDC), randomized") {
    val rnd = new scala.util.Random(23)
    (0 until 3).foreach { trial =>
      val base = (0L until 30L).map(i => (i, s"v${rnd.nextInt(9)}"))
      val delIds = rnd.shuffle(base.map(_._1)).take(5).toSet
      val inserted = (100L until 104L).map(i => (i, s"n$i")) ++
        delIds.take(2).map(i => (i, "updated")) // updates: del old, ins new
      val after = base.filterNot(r => delIds(r._1)) ++ inserted
      def df(rows: Seq[(Long, String)]) =
        table("k bigint, s string", rows.map(r => row(r._1, r._2)))
      def fp(d: org.apache.spark.sql.DataFrame) =
        Quality.tableFingerprint(d, Seq("k", "s")).head()
          .getDecimal(1).toBigInteger
      val delta = Quality.tableFingerprintDelta(
          df(inserted), df(base.filter(r => delIds(r._1))), Seq("k", "s"))
        .head()
      assert(delta.getLong(0) == inserted.size.toLong)
      assert(delta.getLong(1) == 5L)
      assert(fp(df(base)).add(delta.getDecimal(2).toBigInteger) ==
        fp(df(after)), s"trial $trial: incremental != recompute")
    }
  }

  test("functionalDependencyAudit: held and violated dependencies, NULL groups") {
    val df = table("k bigint, g string, x string", Seq(
      row(1L, "a", "p"), row(2L, "a", "p"),   // a -> p (held, 2 rows)
      row(3L, "b", "p"), row(4L, "b", "q"),   // b -> {p, q} (violated)
      row(5L, "b", "q"),
      row(6L, null, "p"), row(7L, null, null))) // NULL group, NULL variant
    val r = Quality.functionalDependencyAudit(df, Seq("g"), Seq("x")).head()
    // groups: a, b, NULL = 3; violators: b (2 variants), NULL (p + NULL)
    assert(r.getLong(0) == 3L, r.toString)
    assert(r.getLong(1) == 2L, r.toString)
    assert(r.getLong(2) == 5L, r.toString) // rows 3,4,5 + 6,7
    assert(r.getLong(3) == 2L, r.toString)
    // a dependency that HOLDS reports zero violators
    val held = Quality.functionalDependencyAudit(df, Seq("k"), Seq("g", "x"))
      .head()
    assert(held.getLong(0) == 7L && held.getLong(1) == 0L &&
      held.getLong(2) == 0L && held.getLong(3) == 1L, held.toString)
    intercept[IllegalArgumentException] {
      Quality.functionalDependencyAudit(df, Seq("g"), Seq("g", "x"))
    }
    intercept[IllegalArgumentException] {
      Quality.functionalDependencyAudit(df, Nil, Seq("x"))
    }
  }
}
