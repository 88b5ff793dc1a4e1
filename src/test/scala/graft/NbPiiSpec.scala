package graft

import org.apache.spark.sql.functions._

import graft.queries.{QueriesAnalytics, QueriesText}
import graft.text.Text

/** Round-12 entries: the trained multinomial-NB classifier family
  * (q229/q231) and the PII scan/redaction governance pass (q230).
  *
  * The NB pins verify the fixed-point decomposition
  *   score(d, c) = prior_f(c) + Σ_w tf_w·a(w,c) − nTok_v(d)·b_f(c)
  * against an INDEPENDENT Scala computation of the full smoothed grid
  * (absent (word, class) pairs contribute a = round(1e6·ln 1) = 0, which
  * is the identity that lets serving skip the grid), and incremental
  * (delta-state) training against one-shot batch training. The PII pins
  * exercise the java.util.regex side of the Java↔RE2 parity subset on
  * adversarial near-misses the corpus scan never produces.
  */
class NbPiiSpec extends SparkSpec {
  import spark.implicits._

  // ── Naive Bayes ────────────────────────────────────────────────────

  private val tinyDocs = Seq(
    (0L, "en", "spark join the table the table"),
    (1L, "en", "join the query plan"),
    (2L, "de", "table der plan der der"),
    (3L, "de", "der spark plan"),
    (4L, "en", "the plan z q"), // z/q are OOV for some classes
    (5L, "de", "der join")
  ).toDF("doc_id", "lang", "text")

  /** Independent full-grid NB: tokenize in Scala, smooth over the full
    * (vocab × class) grid, quantize each ln to 1e6 fixed point exactly
    * as the engine does, argmax with the same (score desc, class asc)
    * tie-break.
    */
  private def referenceNb(train: Seq[(Long, String, String)],
      test: Seq[(Long, String, String)]): Map[Long, (String, Long, Long)] = {
    def toks(t: String): Seq[String] =
      t.split("[^A-Za-z]+").filter(_.nonEmpty).toSeq
    val classes = train.map(_._2).distinct.sorted
    val nTrain = train.size.toDouble
    val cwc = train.flatMap { case (_, c, t) => toks(t).map((c, _)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vocab = cwc.keys.map(_._2).toSet
    val totC = classes.map(c => c -> cwc.collect { case ((`c`, _), n) => n }.sum).toMap
    def fx(x: Double): Long = math.round(1e6 * x)
    val priorF = classes.map(c => c -> fx(math.log(train.count(_._2 == c) / nTrain))).toMap
    val bF = classes.map(c => c -> fx(math.log(totC(c).toDouble + vocab.size))).toMap
    val aF = cwc.map { case (k, n) => k -> fx(math.log(n.toDouble + 1.0)) }
    test.map { case (id, _, t) =>
      val tf = toks(t).filter(vocab).groupBy(identity).map { case (w, v) => w -> v.size.toLong }
      val scores = classes.map { c =>
        // the FULL grid: every in-vocab token contributes a(w,c) − b(c),
        // absent pairs via a = 0
        c -> (priorF(c) + tf.map { case (w, n) =>
          n * (aF.getOrElse((c, w), 0L) - bF(c))
        }.sum)
      }.sortBy { case (c, sc) => (-sc, c) }
      id -> (scores.head._1, scores.head._2, scores.head._2 - scores(1)._2)
    }.toMap
  }

  test("nbServe equals the independent full-grid NB (scores, argmax, margin)") {
    val train = tinyDocs.filter(col("doc_id") < 4)
    val test = tinyDocs.filter(col("doc_id") >= 4)
    val got = QueriesText
      .nbServe(QueriesText.nbWordCounts(train), QueriesText.nbClassDocs(train), test)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val want = referenceNb(
      Seq((0L, "en", "spark join the table the table"), (1L, "en", "join the query plan"),
        (2L, "de", "table der plan der der"), (3L, "de", "der spark plan")),
      Seq((4L, "en", "the plan z q"), (5L, "de", "der join")))
    assert(got == want)
  }

  test("held-out doc with only OOV tokens scores prior-only and predicts the majority class") {
    val train = tinyDocs.filter(col("doc_id") =!= 4L && col("doc_id") =!= 5L)
      .union(Seq((6L, "en", "spark spark")).toDF("doc_id", "lang", "text")) // en majority 3:2
    val test = Seq((9L, "de", "xxxx yyyy zzzz")).toDF("doc_id", "lang", "text")
    val r = QueriesText
      .nbServe(QueriesText.nbWordCounts(train), QueriesText.nbClassDocs(train), test)
      .collect().head
    assert(r.getString(2) == "en") // majority prior wins
    assert(r.getLong(3) == math.round(1e6 * math.log(3.0 / 5.0))) // prior only
    assert(r.getInt(5) == 0)
  }

  test("q231 (delta-state incremental NB) equals q229 (one-shot batch NB) row-for-row") {
    val a = QueriesText.q229_nb_langid(spark, sf("sf0.001")).collect().toSeq
    val b = QueriesText.q231_nb_stream_ivm(spark, sf("sf0.001")).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  // ── PII scan / redaction ───────────────────────────────────────────

  private def piiCounts(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("text").select(
      regexp_count(col("text"), lit(QueriesAnalytics.PiiEmailRe)).cast("long"),
      regexp_count(col("text"), lit(QueriesAnalytics.PiiIpRe)).cast("long"),
      regexp_count(col("text"), lit(QueriesAnalytics.PiiNumRe)).cast("long"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), QueriesAnalytics.PiiEmailRe, "<EMAIL>"),
          QueriesAnalytics.PiiIpRe, "<IP>"),
        QueriesAnalytics.PiiNumRe, "<NUM>")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("PII patterns find seeded spans and redact them in order") {
    val (e, i, n, red) =
      piiCounts("call me at 5551234567 or jane.doe+spam@mail.example.org from 10.0.255.3 ok")
    assert((e, i, n) == (1L, 1L, 1L))
    assert(red == "call me at <NUM> or <EMAIL> from <IP> ok")
  }

  test("PII near-misses do not match: no TLD, 6-digit run, 4-digit IP octet") {
    val (e, i, n, red) = piiCounts("abc@def and 123456 and 1.2.3.4567 end")
    assert((e, i, n) == (0L, 0L, 0L))
    assert(red == "abc@def and 123456 and 1.2.3.4567 end")
  }

  test("digit runs match without word boundaries; IPs require them") {
    val (_, i1, n1, _) = piiCounts("a1234567890b")
    assert((i1, n1) == (0L, 1L))
    val (_, i2, _, _) = piiCounts("x1.2.3.4 5.6.7.8")
    assert(i2 == 1L) // first is glued to a word char, second is clean
  }

  test("q230 on the corpus: exactly the doc_id % 7 == 0 docs carry one PII span of each " +
      "kind; clean docs fingerprint their ORIGINAL text (redaction is the identity)") {
    val out = QueriesAnalytics.q230_pii_redaction(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))).toMap
    val raw = graft.core.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"),
        md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.nonEmpty && out.keySet == raw.keySet)
    out.foreach { case (id, (e, i, n, fp)) =>
      if (id % 7 == 0) assert((e, i, n) == (1L, 1L, 1L), s"doc $id")
      else {
        assert((e, i, n) == (0L, 0L, 0L), s"doc $id")
        assert(fp == raw(id), s"doc $id clean fingerprint")
      }
    }
  }
}
