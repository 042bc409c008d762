package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of ONE word under a unigram-LM vocabulary as a
  * single native expression node — the hot inner loop of
  * [[graft.operators.Corpus.unigramEncode]], which runs once per word
  * OCCURRENCE over the whole corpus.
  *
  * Why native: the same lattice is expressible with `aggregate`/
  * `transform` higher-order functions (the first implementation), but
  * HOF lambdas evaluate INTERPRETED — one Catalyst node walk per dp
  * candidate per position per word — and the encode pass over sf0.1
  * measured 17 s for ~275k word occurrences. This node runs the whole
  * DP as one compiled JVM method (measured well under a second on the
  * same corpus), and the vocabulary lives in the plan's reference
  * array — shipped once per stage like [[ReplaceChain]]'s pattern
  * table, never rebuilt per lookup.
  *
  * Semantics are the operator contract, bit-for-bit (pinned by the
  * unchanged [[graft.UnigramSpec]] fixtures and the q373/q374
  * oracles, which replay the identical recurrence in SQL):
  *
  *  - positions are Unicode CODE POINTS (Spark `length`/`substr`
  *    semantics — supplementary-plane characters are single symbols);
  *  - `dp[j] = max over len 1..L of (dp[j−len] + lp(w[j−len..j)))`,
  *    a multi-code-point edge valid only when its substring is in the
  *    vocabulary, a single-code-point edge always valid (vocabulary
  *    lp, else `lpUnk`);
  *  - log-probs are 12dp fixed-point LONGS (exact integer path sums);
  *  - ties break to the LONGER token (struct-max-on-(score, len)
  *    order: equal score, larger len wins);
  *  - the token array reconstructs by walking the stored edge lengths
  *    back from the end.
  */
case class UnigramSegment(
    child: Expression,
    tokens: Seq[String],
    lps: Seq[Long],
    maxTokenLen: Int,
    lpUnk: Long) extends UnaryExpression {

  require(tokens.nonEmpty && tokens.length == lps.length,
    s"$prettyName: ${tokens.length} tokens vs ${lps.length} log-probs")
  require(maxTokenLen >= 1 && maxTokenLen <= 64,
    s"$prettyName: maxTokenLen ($maxTokenLen) outside [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  // values boxed explicitly: a Scala-Long-valued java map would unbox
  // a miss's null to 0L and silently admit every unknown token
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](tokens.length * 2)
    tokens.iterator.zip(lps.iterator).foreach { case (t, l) =>
      m.put(t, java.lang.Long.valueOf(l))
    }
    m
  }

  /** The compiled DP — called from both eval paths. */
  def segment(input: UTF8String): ArrayData = {
    val w = input.toString
    // code-point start offsets (char indices); n = code-point count
    val n = w.codePointCount(0, w.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](n + 1)
    var ci = 0
    var j = 0
    while (j < n) {
      off(j) = ci
      ci += Character.charCount(w.codePointAt(ci))
      j += 1
    }
    off(n) = w.length
    val score = new Array[Long](n + 1)
    val len = new Array[Int](n + 1)
    j = 1
    while (j <= n) {
      var bestScore = Long.MinValue
      var bestLen = 0
      val lMax = math.min(maxTokenLen, j)
      var l = 1
      while (l <= lMax) {
        val sub = w.substring(off(j - l), off(j))
        val lp = vocab.get(sub)
        val valid = lp != null || l == 1
        if (valid) {
          val s = score(j - l) + (if (lp != null) lp.longValue else lpUnk)
          // struct-max-on-(score, len): equal score, larger len wins;
          // l ascends, so >= implements the longer-token tie rule
          if (s > bestScore || (s == bestScore && l > bestLen)) {
            bestScore = s
            bestLen = l
          }
        }
        l += 1
      }
      score(j) = bestScore
      len(j) = bestLen
      j += 1
    }
    // back-walk: count edges, then fill front-to-back
    var pos = n
    var k = 0
    while (pos > 0) { k += 1; pos -= len(pos) }
    val out = new Array[Any](k)
    pos = n
    var i = k - 1
    while (pos > 0) {
      out(i) = UTF8String.fromString(w.substring(off(pos - len(pos)), off(pos)))
      i -= 1
      pos -= len(pos)
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call into the compiled DP; the vocabulary rides the
    // reference array, never Java source
    val self = ctx.addReferenceObj("unigramSegment", this,
      classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $self.segment($in);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegment = copy(child = newChild)
}
