import org.apache.spark.sql.ColumnName

/** Library-wide helpers. The `$"col"` interpolator mirrors
  * `SQLImplicits.StringToColumn` so main-source operators can use Column
  * shorthand without holding a SparkSession.
  */
package object graft {
  implicit class StringToColumn(val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
