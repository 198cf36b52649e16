package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encoders for the training handoff (SURVEY.md §7.4
  * extension set): the hashing trick and explicit one-hot indicators.
  * Both are narrow codegen'd projections — no shuffle, no fitted
  * vocabulary state — and both use engine-parity hashing/derivations so
  * every encoded value is DuckDB-oracle checkable.
  */
object Encoding {

  /** Hashing-trick bucket of a categorical value: the first 8 hex chars of
    * md5, parsed as an integer, mod `nBuckets` — stable across engines
    * (md5 is bytewise identical; the 32-bit prefix fits a long with no
    * sign issues) and across corpus growth (no fitted dictionary, the
    * property that makes the hashing trick the 100 TB encoder: unseen
    * categories at serving time map without a vocabulary broadcast).
    * NULL categories map to NULL (caller decides imputation).
    */
  def hashBucket(cat: Column, nBuckets: Int): Column =
    (conv(substring(md5(cat), 1, 8), 16, 10).cast("long") % nBuckets)
      .cast("int")

  /** Append a hashed-bucket column per categorical column:
    * `<col>_bucket`. */
  def featureHash(df: DataFrame, catCols: Seq[String],
                  nBuckets: Int): DataFrame =
    catCols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_bucket", hashBucket(col(c), nBuckets)))

  /** Explicit one-hot indicators over a DECLARED category list (the
    * bounded-domain encoder — order of `categories` fixes column order;
    * values outside the list get all-zero indicators, the standard
    * handle-unknown=ignore contract). Indicator columns are
    * `is_<category>` ints; the declared categories must be distinct and
    * identifier-safe (they become column names) — enforced up front so a
    * stray space or duplicate fails loud instead of producing broken or
    * colliding columns.
    */
  def oneHot(df: DataFrame, catCol: String,
             categories: Seq[String]): DataFrame = {
    require(categories.distinct.size == categories.size,
      s"oneHot: duplicate categories in ${categories.mkString(",")}")
    val unsafe = categories.filterNot(_.matches("[A-Za-z0-9_]+"))
    require(unsafe.isEmpty,
      s"oneHot: categories must be identifier-safe ([A-Za-z0-9_]+) to " +
        s"become column names; got ${unsafe.mkString(",")}")
    categories.foldLeft(df)((d, c) =>
      d.withColumn(s"is_$c",
        when(col(catCol) === c, 1).otherwise(0)))
  }
}
