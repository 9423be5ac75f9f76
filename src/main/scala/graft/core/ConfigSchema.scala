package graft.core

import scala.reflect.ClassTag

/** Connector-config JSON Schema from a case class — the reference reflects
  * its Go config struct with `jsonschema.New` and `default:`/`hint:` tags
  * (`sourcedef.go:120-126`, `integrations/shopify/shopify.go:20`); here the
  * case class is reflected field-by-field, [[Masked]] fields are emitted as
  * secret strings (`airbyte_secret: true`), and every field is required
  * (matching the reference's required-by-default posture).
  */
object ConfigSchema {

  def of[T <: Product : ClassTag](
      defaults: Map[String, String] = Map.empty,
      hints: Map[String, String] = Map.empty): String = {
    val cls = implicitly[ClassTag[T]].runtimeClass
    val fields = cls.getDeclaredFields.toSeq
      .filterNot(f => f.isSynthetic || f.getName.contains("$"))
    val props = fields.map { f =>
      val base = f.getType match {
        case t if t == classOf[Masked] => """"type":"string","airbyte_secret":true"""
        case t if t == classOf[String] => """"type":"string""""
        case t if t == classOf[Int] || t == classOf[Long] ||
          t == classOf[java.lang.Integer] || t == classOf[java.lang.Long] => """"type":"integer""""
        case t if t == classOf[Double] || t == classOf[Float] ||
          t == classOf[java.lang.Double] || t == classOf[java.lang.Float] => """"type":"number""""
        case t if t == classOf[Boolean] || t == classOf[java.lang.Boolean] => """"type":"boolean""""
        case _ => """"type":"string""""
      }
      // defaults typed to the field (an integer field's default must be an
      // unquoted number, not "5"); hints/string defaults JSON-escaped — a
      // quote or backslash in either would otherwise emit malformed spec
      // JSON
      def jstr(s: String): String = Json.write(Json.mapper.valueToTree(s))
      val isNum = Seq(classOf[Int], classOf[Long], classOf[Double], classOf[Float],
        classOf[java.lang.Integer], classOf[java.lang.Long],
        classOf[java.lang.Double], classOf[java.lang.Float]).contains(f.getType)
      val isBool = f.getType == classOf[Boolean] || f.getType == classOf[java.lang.Boolean]
      val extra =
        defaults.get(f.getName).map { d =>
          // emit unquoted only when the default IS a JSON number literal:
          // toDoubleOption alone also accepts "NaN"/"Infinity"/"5d"/hex
          // floats/padded whitespace — all malformed inside spec JSON;
          // anything non-literal falls back to the quoted string
          val jsonNumber = "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?"
          val raw =
            if (isNum && d.matches(jsonNumber)) d
            else if (isBool && (d == "true" || d == "false")) d
            else jstr(d)
          s""","default":$raw"""
        }.getOrElse("") +
          hints.get(f.getName).map(h => s""","description":${jstr(h)}""").getOrElse("")
      s""""${f.getName}":{$base$extra}"""
    }
    val required = fields.map(f => s""""${f.getName}"""").mkString(",")
    s"""{"type":"object","properties":{${props.mkString(",")}},"required":[$required]}"""
  }
}
