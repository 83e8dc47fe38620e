package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (optionally) an ANSI-SQL
  * oracle string the driver runs through DuckDB over the same parquet tables.
  *
  * Contract (see /root/repo/SURVEY.md §2.4 and §7.5):
  *   - result columns are aliased identically in Spark and oracle SQL;
  *   - output carries a total ORDER BY (unique tiebreak) in both;
  *   - displayed doubles are rounded (2–6 dp) in both so aggregation order
  *     cannot flip hash bits;
  *   - timestamps are formatted to second-precision strings in outputs.
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(run)
}
