package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-contract validation shared by the public ops ([[TextOps]],
  * [[DedupOps]], [[SimilarityOps]], media/stream ops): fail AT THE CALL
  * SITE with the op name, the required contract and the actual schema,
  * instead of an unresolved-column AnalysisException surfacing from deep
  * inside a lazily-built plan (possibly several transformations away from
  * the mistake).
  */
private[graft] object OpContract {
  def requireCols(df: DataFrame, op: String, cols: String*): DataFrame = {
    // case-insensitive via equalsIgnoreCase, matching Spark's default
    // column resolution — the guard must never reject an input the ops
    // would resolve fine (locale-independent: a toLowerCase comparison
    // would mis-match e.g. I/i under a Turkish default locale)
    val missing = cols.filterNot(c => df.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"$op requires input columns ${cols.mkString("(", ", ", ")")} but " +
        s"${missing.mkString("(", ", ", ")")} are missing from the given " +
        s"schema ${df.columns.mkString("(", ", ", ")")}")
    df
  }
}
