package graft.model

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Factor-embedding projection (SURVEY L16): the reference visualizes movie
  * vectors with t-SNE on ≤36 hand-picked movies
  * (/root/reference/explicit_ratings/tSNE_and_conv_plot.py:107-108) —
  * a driver-side, visualization-only step declared a non-goal. The engine's
  * substitute is distributed PCA over the full factor table (ml.feature.PCA),
  * which scales to every movie rather than a hand-picked subset. */
object Embed {

  /** Project (id, features ARRAY<DOUBLE>) factor frames to `k` dims.
    * Output: (id, projection ARRAY<DOUBLE> of length k). */
  def pcaProject(factors: DataFrame, k: Int): DataFrame = {
    val vecs = factors.select(col("id"), array_to_vector(col("features")).as("fv"))
    val model = new PCA().setInputCol("fv").setOutputCol("pv").setK(k).fit(vecs)
    model.transform(vecs)
      .select(col("id"), vector_to_array(col("pv")).as("projection"))
  }
}
