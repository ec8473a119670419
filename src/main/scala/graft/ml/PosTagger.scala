package graft.ml

import org.apache.spark.ml.UnaryTransformer
import org.apache.spark.ml.param.BooleanParam
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}

/** Universal-tagset POS tagger — the one reference operator with no
  * Spark built-in (U3, `transformers.py:67-77`, which wraps
  * `nltk.pos_tag(tokens, tagset='universal')`).
  *
  * The reference's NLTK tagger is a perceptron model; fidelity target is
  * CAPABILITY, not bit-compat (SURVEY.md §7.4). This implementation is a
  * deterministic lexicon + suffix-rule tagger over the same 12-tag
  * universal set NLTK maps to: VERB NOUN PRON ADJ ADV ADP CONJ DET NUM
  * PRT X and '.'.
  *
  * Design for scale: the lexicon is a compile-time constant captured in
  * the transform closure — Spark ships it once per executor in the task
  * binary (a few KB), no broadcast bookkeeping, no Python worker. Tags
  * align positionally with the input tokens (F3 depends on that).
  */
class PosTagger(override val uid: String)
  extends UnaryTransformer[Seq[String], Seq[String], PosTagger]
  with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("posTagger"))

  /** Character-class mode. Default FALSE = ASCII-strict predicates that
    * the generated DuckDB oracle (MlQueries.q50Sql) mirrors exactly, so
    * the hash check holds on ANY corpus — non-ASCII letters are
    * consistently non-letters in both engines. TRUE = Unicode-aware
    * `java.lang.Character` classes (linguistically better on
    * multilingual text; é counts as a letter) — deliberately NOT
    * oracle-expressible (RE2 has no full Unicode case/category tables
    * matching the JDK), so unicode-mode results get spec coverage, not
    * a DuckDB twin. Behavior is explicit either way; nothing diverges
    * silently. */
  final val unicode: BooleanParam = new BooleanParam(this, "unicode",
    "use Unicode-aware character classes (no oracle twin); default false = ASCII-strict, oracle-faithful")
  setDefault(unicode -> false)
  def setUnicode(value: Boolean): this.type = set(unicode, value)
  def getUnicode: Boolean = $(unicode)

  override protected def createTransformFunc: Seq[String] => Seq[String] = {
    val uni = $(unicode)
    tokens => tokens.map(t => PosTagger.tagToken(t, uni))
  }

  override protected def outputDataType: DataType = ArrayType(StringType)

  override protected def validateInputType(inputType: DataType): Unit =
    inputType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"Input must be array<string>, got $other")
    }
}

/** One (word, tag) element of the zipped tagger output — a named case
  * class so the encoder produces `struct<word, tag>` field names, not
  * the tuple encoder's `_1`/`_2`. */
case class TaggedWord(word: String, tag: String)

/** The reference's zipped output variant (`main_firstTry_cluster.py:
  * 165-166`): `array<struct<word, tag>>` instead of tags-only — keeps
  * each token physically next to its tag so downstream ops needn't rely
  * on positional alignment across two columns. Same tagger, same rules;
  * only the output shape differs. */
class PosTaggedWords(override val uid: String)
  extends UnaryTransformer[Seq[String], Seq[TaggedWord], PosTaggedWords]
  with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("posTaggedWords"))

  /** Same mode switch as [[PosTagger.unicode]]. */
  final val unicode: BooleanParam = new BooleanParam(this, "unicode",
    "use Unicode-aware character classes (no oracle twin); default false = ASCII-strict, oracle-faithful")
  setDefault(unicode -> false)
  def setUnicode(value: Boolean): this.type = set(unicode, value)

  override protected def createTransformFunc: Seq[String] => Seq[TaggedWord] = {
    val uni = $(unicode)
    tokens => tokens.map(t => TaggedWord(t, PosTagger.tagToken(t, uni)))
  }

  override protected def outputDataType: DataType =
    ArrayType(StructType(Seq(
      StructField("word", StringType), StructField("tag", StringType))))

  override protected def validateInputType(inputType: DataType): Unit =
    inputType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"Input must be array<string>, got $other")
    }
}

object PosTaggedWords extends DefaultParamsReadable[PosTaggedWords]

object PosTagger extends DefaultParamsReadable[PosTagger] {

  /** Closed-class lexicon, universal tagset. Word lists must be
    * disjoint across tags (checked below) so that the generated oracle
    * SQL's CASE order can't diverge from this Map. */
  val Lexicon: Map[String, String] = {
    def m(tag: String, ws: String) = ws.split(' ').map(_ -> tag)
    (m("DET", "the a an this that these those each every some any no all both either neither another such") ++
      m("PRON", "i you he she it we they me him her us them my your his its our their mine yours hers ours theirs myself yourself himself herself itself ourselves themselves who whom whose which what something anything nothing everything someone anyone everyone") ++
      m("ADP", "of in for with on at by from about into over under between through during against among within without before after above below near behind beside") ++
      m("CONJ", "and or but nor so yet because although while if when than as until unless since whether though") ++
      m("VERB", "is are was were be been being am do does did doing have has had having will would can could shall should may might must get got gets make made makes go went gone goes see saw seen says said know knew think thought take took come came want wanted give gave feel felt seem seemed look looked") ++
      m("ADV", "not very really too also just never always often sometimes quite rather almost already still again perhaps maybe however then there here now even only more most much well") ++
      m("PRT", "to n't 's up out off down away back") ++
      m("NUM", "one two three four five six seven eight nine ten zero hundred thousand million billion first second third"))
  }.ensuring(pairs => pairs.map(_._1).distinct.size == pairs.size,
    "POS lexicon word lists overlap across tags").toMap

  /** Suffix rules, first match wins (longest suffixes first). */
  val SuffixRules: Seq[(String, String)] = Seq(
    "ational" -> "ADJ", "fulness" -> "NOUN",
    "ility" -> "NOUN", "ation" -> "NOUN", "ingly" -> "ADV",
    "ness" -> "NOUN", "ment" -> "NOUN", "tion" -> "NOUN",
    "sion" -> "NOUN", "ship" -> "NOUN", "hood" -> "NOUN",
    "ance" -> "NOUN", "ence" -> "NOUN", "ism" -> "NOUN", "ist" -> "NOUN",
    "able" -> "ADJ", "ible" -> "ADJ", "less" -> "ADJ", "ful" -> "ADJ",
    "ous" -> "ADJ", "ive" -> "ADJ", "ish" -> "ADJ", "est" -> "ADJ",
    "ally" -> "ADV", "ly" -> "ADV",
    "ing" -> "VERB", "ed" -> "VERB", "ize" -> "VERB", "ise" -> "VERB",
    "ity" -> "NOUN", "er" -> "NOUN", "or" -> "NOUN", "al" -> "ADJ",
    "ic" -> "ADJ", "y" -> "ADJ")

  private val numberRe = "^[0-9]+([.,][0-9]+)*$".r

  /** ASCII-strict default — the form the generated oracle mirrors. */
  def tagToken(token: String): String = tagToken(token, unicode = false)

  /** @param unicode character-class mode, see [[PosTagger.unicode]].
    * Lowercasing is Locale.ROOT either way — the default-locale form
    * would tag differently under a Turkish JVM locale (I→ı). */
  def tagToken(token: String, unicode: Boolean): String = {
    if (token == null || token.isEmpty) return "X"
    def isLetter(c: Char): Boolean =
      if (unicode) Character.isLetter(c)
      else (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isLetterOrDigit(c: Char): Boolean =
      isLetter(c) || (if (unicode) Character.isDigit(c) else c >= '0' && c <= '9')
    def isUpper(c: Char): Boolean =
      if (unicode) Character.isUpperCase(c) else c >= 'A' && c <= 'Z'
    val lower = token.toLowerCase(java.util.Locale.ROOT)
    if (token.forall(c => !isLetterOrDigit(c))) "."
    else if (numberRe.findFirstIn(token).isDefined) "NUM"
    else Lexicon.get(lower) match {
      case Some(tag) => tag
      case None =>
        SuffixRules.collectFirst {
          case (suf, tag) if lower.length > suf.length + 2 && lower.endsWith(suf) => tag
        }.getOrElse {
          if (isUpper(token.head)) "NOUN"
          else if (token.exists(!isLetter(_))) "X"
          else "NOUN"
        }
    }
  }
}
