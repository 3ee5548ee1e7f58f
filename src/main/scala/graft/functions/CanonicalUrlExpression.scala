package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.model.UrlCanonicalizer

/** Static, executor-side canonicalization entry points for codegen — the
  * generated code calls these directly (no Scala-UDF encoder/serialization
  * glue, no closure capture).
  */
object CanonicalUrl {
  def pathOrNull(url: UTF8String): UTF8String = {
    if (url == null) return null
    UrlCanonicalizer.parse(url.toString) match {
      case Right(unit) => UTF8String.fromString(unit.toPathStr)
      case Left(_)     => null
    }
  }
}

/** `canonical_unit_path(url)` as a native Catalyst Expression with
  * `doGenCode` (SURVEY §2.11 C1): the frontier's hottest scalar — parsing
  * every discovered URL into its canonical storage path — participates in
  * whole-stage codegen instead of crossing a Scala-UDF boundary per row.
  * Unparseable URLs yield null (errors-as-data); the hosting id is then the
  * builtin `substring_index(unit_path, '/', 1)`, so one parse serves both.
  */
case class CanonicalUnitPath(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_unit_path"

  override def eval(input: InternalRow): Any =
    CanonicalUrl.pathOrNull(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = CanonicalUrl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = $helper.pathOrNull(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUnitPath =
    copy(child = newChild)
}

object CanonicalUnitPath {
  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  /** Column form: `canonical_unit_path(url)`. */
  def apply(url: Column): Column = columnOf(CanonicalUnitPath(expressionOf(url)))
}
