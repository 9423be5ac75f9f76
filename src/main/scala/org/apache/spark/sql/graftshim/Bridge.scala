package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeExpression, ExpressionColumnNode}

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 split `Column` from Catalyst (`Column` wraps a `ColumnNode`);
  * attaching a custom Expression needs the classic-converter node types,
  * which are `private[sql]` — hence this shim package under
  * `org.apache.spark.sql`. This is the standard extension seam for
  * libraries shipping custom codegen expressions on Spark 4.x.
  */
object Bridge {

  /** Wrap a custom Expression (whose children were built with `childExpr`)
    * as a user-facing Column.
    */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Use a public Column as a child of a custom Expression. The resulting
    * placeholder is resolved by the classic ColumnNode→Expression converter
    * during analysis.
    */
  def childExpr(c: Column): Expression = ColumnNodeExpression(c.node)
}
