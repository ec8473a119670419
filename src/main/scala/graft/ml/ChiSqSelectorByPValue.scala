package graft.ml

import org.apache.spark.ml.feature.VectorSlicer
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.stat.ChiSquareTest
import org.apache.spark.sql.Dataset

/** F1: χ²-test feature selection by p-value threshold
  * (`script3_bis.py:143-175` p ≤ 0.3, `script3_ter.py:100-136` p ≤ 0.5).
  *
  * The reference collects the full per-feature p-value vector to the
  * driver, rebuilds a vocabulary dict, and re-vectorizes every document
  * from scratch. Here: `ChiSquareTest.test` returns a one-row DataFrame
  * (the aggregate runs distributed; only |V| p-values reach the driver,
  * which is inherent to choosing indices), and the surviving indices
  * configure a [[VectorSlicer]] — re-indexing happens executor-side in
  * one narrow pass, no re-vectorization.
  */
object ChiSqSelectorByPValue {

  /** Indices of features with p-value <= threshold (ascending order —
    * VectorSlicer preserves relative feature order like the reference's
    * re-enumeration did). */
  def selectIndices(data: Dataset[_], featuresCol: String, labelCol: String,
                    maxPValue: Double): Array[Int] = {
    val pValues = ChiSquareTest.test(data.toDF(), featuresCol, labelCol)
      .select("pValues").head().getAs[Vector](0)
    pValues.toArray.zipWithIndex
      .collect { case (p, i) if p <= maxPValue => i }
  }

  /** Fit a slicer keeping only features passing the χ² threshold. */
  def fit(data: Dataset[_], featuresCol: String, labelCol: String,
          maxPValue: Double, outputCol: String): VectorSlicer =
    new VectorSlicer()
      .setInputCol(featuresCol)
      .setOutputCol(outputCol)
      .setIndices(selectIndices(data, featuresCol, labelCol, maxPValue))
}
