package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared guard for operators that stage work through temp columns:
  * fail loudly when the input already owns a reserved name, instead of
  * an ambiguous-reference error (or a silently dropped column) deep in
  * the plan. */
private[operators] object TempCols {

  def reserve(df: DataFrame, owner: String, names: String*): Unit =
    names.foreach(t => require(!df.columns.contains(t),
      s"$owner reserves temp column name '$t'; rename it in the input"))
}
