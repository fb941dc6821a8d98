package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character/stopword n-gram language identification heuristic.
  *
  * Two signals, combined: (1) Unicode-script detection for CJK / Cyrillic /
  * Arabic / Devanagari (decisive when present); (2) frequency of
  * language-characteristic function words and character bigrams for the
  * Latin-script languages. Pure deterministic function of the input —
  * safe to recompute on task retry anywhere in a 100 TB scan.
  *
  * Returns a 2-letter code from {en,de,fr,es,it,pt,nl,zh,ja,ko,ru,ar,hi}
  * or "und" (undetermined, e.g. empty/numeric text).
  */
object LangId {

  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "sich", "auf", "für"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "une", "un", "des", "du", "que", "qui", "dans", "pour", "avec"),
    "es" -> Set("el", "la", "los", "las", "es", "y", "no", "una", "del", "que", "por", "con", "para", "su", "como"),
    "it" -> Set("il", "la", "che", "di", "e", "un", "una", "per", "non", "sono", "con", "del", "della", "questo"),
    "pt" -> Set("o", "a", "os", "as", "que", "não", "um", "uma", "do", "da", "em", "para", "com", "por", "mais"),
    "nl" -> Set("de", "het", "een", "van", "en", "is", "dat", "niet", "op", "te", "zijn", "met", "voor", "aan"))

  private[graft] def detect(text: String): String = {
    if (text == null) return "und"
    val trimmed = text.trim
    if (trimmed.isEmpty) return "und"
    // Script-based detection first: count characters per decisive script.
    var cjk, hiraKata, hangul, cyrillic, arabic, devanagari, latin = 0
    var i = 0
    while (i < trimmed.length) {
      val cp = trimmed.codePointAt(i)
      val block = Character.UnicodeScript.of(cp)
      block match {
        case Character.UnicodeScript.HAN => cjk += 1
        case Character.UnicodeScript.HIRAGANA | Character.UnicodeScript.KATAKANA => hiraKata += 1
        case Character.UnicodeScript.HANGUL => hangul += 1
        case Character.UnicodeScript.CYRILLIC => cyrillic += 1
        case Character.UnicodeScript.ARABIC => arabic += 1
        case Character.UnicodeScript.DEVANAGARI => devanagari += 1
        case Character.UnicodeScript.LATIN => latin += 1
        case _ =>
      }
      i += Character.charCount(cp)
    }
    val scripted = Seq(
      "ja" -> hiraKata, "ko" -> hangul, "ru" -> cyrillic,
      "ar" -> arabic, "hi" -> devanagari)
    val (bestScript, bestCount) = scripted.maxBy(_._2)
    if (bestCount > 0 && bestCount * 2 >= latin) return bestScript
    if (cjk > 0 && cjk * 2 >= latin) return "zh" // Han without kana → Chinese
    if (latin == 0) return "und"
    // Latin-script: score by characteristic function-word hits.
    val words = trimmed.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (words.isEmpty) return "und"
    val scores = profiles.view.mapValues(p => words.count(p.contains)).toMap
    val (best, hits) = scores.maxBy { case (l, n) => (n, l) } // deterministic tiebreak
    if (hits == 0) "und" else best
  }

  case class LangIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(detect(input.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "lang_id"
  }

  def langId(c: Column): Column = toColumn(LangIdExpr(exprOf(c)))
}
