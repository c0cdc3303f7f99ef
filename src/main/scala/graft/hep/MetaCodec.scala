package graft.hep

/** Typed custom-metadata codec (SURVEY.md §7 hard part 1).
  *
  * The reference stores arbitrary typed attrs (str|int|float|bool|ndarray,
  * `read/hdf.py:41`) as HDF5 attributes; our metadata maps are
  * `MAP<STRING,STRING>` (table-property values are string-typed), so
  * non-string values round-trip through a tagged JSON-ish encoding:
  * `i:`, `f:`, `b:`, `s:` scalar tags and `ai:`/`af:` comma-separated
  * arrays. Deterministic, human-readable, and order-preserving.
  */
object MetaCodec {

  sealed trait MetaValue
  final case class MetaInt(v: Long) extends MetaValue
  final case class MetaDouble(v: Double) extends MetaValue
  final case class MetaBool(v: Boolean) extends MetaValue
  final case class MetaString(v: String) extends MetaValue
  final case class MetaIntArray(v: Seq[Long]) extends MetaValue
  final case class MetaDoubleArray(v: Seq[Double]) extends MetaValue

  def encode(v: MetaValue): String = v match {
    case MetaInt(x) => s"i:$x"
    case MetaDouble(x) => s"f:$x"
    case MetaBool(x) => s"b:$x"
    case MetaString(x) => s"s:$x"
    case MetaIntArray(xs) => s"ai:${xs.mkString(",")}"
    case MetaDoubleArray(xs) => s"af:${xs.mkString(",")}"
  }

  def decode(s: String): MetaValue = {
    val idx = s.indexOf(':')
    require(idx > 0, s"untagged metadata value: $s")
    val (tag, body) = (s.substring(0, idx), s.substring(idx + 1))
    tag match {
      case "i" => MetaInt(body.toLong)
      case "f" => MetaDouble(body.toDouble)
      case "b" => MetaBool(body.toBoolean)
      case "s" => MetaString(body)
      case "ai" =>
        MetaIntArray(if (body.isEmpty) Nil else body.split(",").toSeq.map(_.toLong))
      case "af" =>
        MetaDoubleArray(
          if (body.isEmpty) Nil else body.split(",").toSeq.map(_.toDouble))
      case other => throw new IllegalArgumentException(s"unknown tag: $other")
    }
  }

  /** Convenience: encode a whole typed map for `custom_meta`. */
  def encodeMap(m: Map[String, MetaValue]): Map[String, String] =
    m.map { case (k, v) => k -> encode(v) }

  def decodeMap(m: Map[String, String]): Map[String, MetaValue] =
    m.map { case (k, v) => k -> decode(v) }
}
