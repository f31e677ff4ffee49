package graft.operators

import graft.SparkSpec

/** Discriminative check for the language-ID classifier: the synthetic
  * corpus shares one vocabulary across `lang` labels (so the oracle-gated
  * `text_langid` query verifies arithmetic, not discrimination); this
  * fixture gives each language a genuinely distinct marker distribution
  * and asserts the argmax recovers the labels.
  */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("langid recovers labels on a corpus with distinct marker distributions") {
    // the classifier's own marker vocabulary, as bare words (markers are
    // matched as " word ", so joining words with single spaces produces
    // exactly one occurrence per appearance)
    val markerWords = Map(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "die"),
      "es" -> Seq("el", "los", "una"),
      "fr" -> Seq("le", "les", "est"))
    val rnd = new scala.util.Random(7)
    val docs = for {
      (lang, li) <- markerWords.keys.toSeq.sorted.zipWithIndex
      i <- 0 until 25
    } yield {
      val own = markerWords(lang)
      val others = (markerWords - lang).values.flatten.toSeq
      // 4-8 own-language markers, exactly one foreign marker as noise,
      // filler between so marker spans never overlap
      val k = 4 + rnd.nextInt(5)
      val words = Seq("doc") ++
        (0 until k).flatMap(_ => Seq(own(rnd.nextInt(own.size)), "filler")) ++
        Seq(others(rnd.nextInt(others.size)), "tail")
      (li * 100L + i, lang, words.mkString(" "))
    }
    val out = TextAnalysis.langidOn(docs.toDF("doc_id", "lang", "text"))
      .select($"lang", $"pred_lang").as[(String, String)].collect()
    assert(out.length === 100)
    val acc = out.count { case (l, p) => l == p }.toDouble / out.length
    assert(acc > 0.9, s"langid accuracy $acc on the discriminative fixture")
    // every language must actually be predicted — guards against a
    // degenerate always-'en' classifier passing on label imbalance
    assert(out.map(_._2).distinct.sorted === Seq("de", "en", "es", "fr"))
  }

  private val dir = sf("sf0.001")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("text_chunks covers every token with correctly-sized overlapping windows") {
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val chunks = TextAnalysis.chunks.run(spark, dir)
      .select($"doc_id", $"chunk_id", $"n_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toks = texts(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      sorted.foreach { case (_, cid, n, text) =>
        val start = (cid * 48).toInt
        val expect = toks.slice(start, start + 64)
        assert(n === expect.length.toLong, s"doc $id chunk $cid size")
        assert(text === expect.mkString(" "), s"doc $id chunk $cid text")
      }
      // the last chunk must reach the final token: full coverage
      val (_, lastCid, lastN, _) = sorted.last
      assert(lastCid * 48 + lastN === toks.length.toLong, s"doc $id coverage")
    }
  }

  test("text_decontam agrees with a direct 8-gram set-intersection replay") {
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val eval = all.map { case (id, t) => (md5hex(t), id) }.sorted.take(5).map(_._2).toSet
    def grams(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
    val evalGrams = all.filter(r => eval(r._1)).flatMap(r => grams(r._2)).toSet
    val expect = all.filterNot(r => eval(r._1))
      .map { case (id, t) => id -> grams(t).count(evalGrams).toLong }.toMap
    val got = TextAnalysis.decontam.run(spark, dir)
      .select($"doc_id", $"n_shared_ngrams").as[(Long, Long)].collect().toMap
    assert(got === expect)
  }
}
