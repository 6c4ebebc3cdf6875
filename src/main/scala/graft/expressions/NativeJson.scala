package graft.expressions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-field JSON extraction.
  *
  * Spark's `get_json_object` and `from_json` are both CodegenFallback
  * expressions — one of them in a projection kicks the entire stage
  * off whole-stage codegen, so every other column in the row pays the
  * interpreted path. This expression streams the document with
  * Jackson (already on the Spark classpath) until the requested
  * top-level field, skips everything else, and generates a single
  * static call.
  *
  * Semantics match `from_json(col, struct<field: long>).field`:
  * integer value → long, anything else (missing field, non-integer
  * value, malformed document, non-object root) → NULL.
  */
object NativeJson {

  private val factory = new JsonFactory()

  def jsonGetLongEval(s: UTF8String, field: String): java.lang.Long = {
    try {
      val p = factory.createParser(s.getBytes)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          val t = p.nextToken()
          if (name == field) {
            return if (t == JsonToken.VALUE_NUMBER_INT)
              java.lang.Long.valueOf(p.getLongValue)
            else null
          } else if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY) {
            p.skipChildren()
          }
        }
        null
      } finally p.close()
    } catch { case _: Exception => null }
  }

  case class JsonGetLongExpr(child: Expression, field: String)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "json_get_long_native"

    override def nullSafeEval(v: Any): Any =
      jsonGetLongEval(v.asInstanceOf[UTF8String], field)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fieldRef = ctx.addReferenceObj("jsonField", field, "java.lang.String")
      nullSafeCodeGen(ctx, ev, c =>
        s"""java.lang.Long ${ev.value}_r =
           |  graft.expressions.NativeJson.jsonGetLongEval($c, $fieldRef);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}_r.longValue(); }""".stripMargin)
    }

    override protected def withNewChildInternal(c: Expression): JsonGetLongExpr =
      copy(child = c)
  }

  def jsonGetLong(doc: Column, field: String): Column =
    ColumnBridge.column(JsonGetLongExpr(ColumnBridge.expression(doc), field))
}
