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
}
