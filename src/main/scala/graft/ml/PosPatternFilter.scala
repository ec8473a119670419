package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

/** F3: keep word-trigram i iff tag-trigram i is in the authorized
  * POS-pattern set (`script4.py:124-137`). The reference does this in a
  * Python map over a broadcast set; here it is pure higher-order Spark
  * SQL — zip_with → filter → transform — fully codegen'd, no UDF.
  */
class PosPatternFilter(override val uid: String)
  extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("posPatternFilter"))

  final val wordsCol = new Param[String](this, "wordsCol", "word n-gram column")
  final val tagsCol = new Param[String](this, "tagsCol", "tag n-gram column")
  final val outputCol = new Param[String](this, "outputCol", "output column")
  final val patterns = new StringArrayParam(this, "patterns", "authorized tag n-grams")

  setDefault(wordsCol -> "wordTrigrams", tagsCol -> "tagTrigrams",
    outputCol -> "selectedTrigrams",
    patterns -> PosPatternFilter.AuthorizedTrigrams.toArray)

  def setWordsCol(v: String): this.type = set(wordsCol, v)
  def setTagsCol(v: String): this.type = set(tagsCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setPatterns(v: Seq[String]): this.type = set(patterns, v.toArray)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val auth = $(patterns).toSeq
    val zipped = zip_with(col($(wordsCol)), col($(tagsCol)),
      (w, t) => struct(w.as("w"), t.as("t")))
    val kept = filter(zipped, s => s.getField("t").isInCollection(auth))
    // qualify: the Transformer.transform member shadows functions.transform
    dataset.withColumn($(outputCol),
      org.apache.spark.sql.functions.transform(kept, s => s.getField("w")))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), ArrayType(StringType))

  override def copy(extra: ParamMap): PosPatternFilter = defaultCopy(extra)
}

object PosPatternFilter extends DefaultParamsReadable[PosPatternFilter] {
  /** The reference's 11 authorized patterns (`script4.py:124`). */
  val AuthorizedTrigrams: Seq[String] = Seq(
    "NOUN VERB ADJ", "PRON VERB ADJ", "ADP ADJ NOUN", "VERB ADJ NOUN",
    "PRON VERB PRON", "PRON ADV VERB", "ADV ADJ NOUN", "VERB ADV ADJ",
    "PRON VERB DET", "DET ADJ NOUN", "VERB DET NOUN")

  /** script4_bis reduced set (`script4_bis.py:76`). */
  val ReducedTrigrams: Seq[String] = Seq("NOUN VERB ADJ")
}
