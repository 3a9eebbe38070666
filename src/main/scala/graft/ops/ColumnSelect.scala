package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** User-facing column-set algebra: ordered include/exclude/`all` selection
  * over a table's column universe, mirroring the reference's schema
  * selection semantics (crates/freeze/src/types/schemas.rs:165-237; its
  * test battery at schemas.rs:239-380 is mirrored in ColumnSelectSpec).
  *
  * Semantics (order-preserving throughout, like the reference's IndexSet):
  *  - `columns` (explicit list) wins outright; the single marker `all`
  *    expands to every column; an unknown explicit column is an error;
  *  - otherwise start from the ordered `defaults`; `include` appends (the
  *    `all` marker expands; unknown includes are permissively skipped —
  *    they may apply to another dataset); `exclude` removes (unknown
  *    excludes ignored).
  *
  * This is config-level projection: the emitted plan is a plain `select`,
  * so Catalyst still prunes the scan to exactly these columns.
  */
object ColumnSelect {

  val All = "all"

  final case class Spec(
      columns: Option[Seq[String]] = None,
      include: Option[Seq[String]] = None,
      exclude: Option[Seq[String]] = None)

  /** compute_used_columns mirror (schemas.rs:209-237). */
  def usedColumns(all: Seq[String], defaults: Seq[String], spec: Spec): Seq[String] =
    spec.columns match {
      case Some(cols) if cols == Seq(All) => all
      case Some(cols) =>
        cols.foreach(c => require(all.contains(c), s"invalid column: $c"))
        cols.distinct
      case None =>
        val withIncludes = spec.include match {
          case Some(inc) if inc == Seq(All) => all
          case Some(inc) => (defaults.distinct ++ inc).distinct.filter(all.contains)
          case None => defaults.distinct
        }
        spec.exclude match {
          case Some(exc) => withIncludes.filterNot(exc.contains)
          case None => withIncludes
        }
    }

  /** Apply the spec against a DataFrame whose columns are the universe. */
  def apply(df: DataFrame, defaults: Seq[String], spec: Spec): DataFrame =
    df.select(usedColumns(df.columns.toSeq, defaults, spec).map(col): _*)
}
