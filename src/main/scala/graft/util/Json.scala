package graft.util

/** Minimal deterministic JSON writer for the config/cell-set documents
  * (`4_Prepare_experiment.r:350-357`, `5_Upload-to-aws.py:256`). Maps
  * are emitted in insertion order when a `Seq[(String, Any)]` is used,
  * or key-sorted for plain Maps — either way the output is a pure
  * function of the value (no gsub literal fix-ups needed, unlike the
  * reference's bool/null rewrites). */
object Json {

  /** Pre-serialized JSON emitted verbatim (for embedding an
    * already-built document inside another). */
  final case class Raw(json: String)

  def write(v: Any): String = v match {
    case null => "null"
    case Raw(j) => j
    case s: String => quote(s)
    case b: Boolean => b.toString
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case n: Number => n.toString
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => (k.toString, x) }.sortBy(_._1)
        .map { case (k, x) => s"${quote(k)}:${write(x)}" }
        .mkString("{", ",", "}")
    case kvs: Seq[_] if kvs.nonEmpty && kvs.forall(_.isInstanceOf[(_, _)]) =>
      kvs.map { case (k, x) => s"${quote(k.toString)}:${write(x)}" }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(write).mkString("[", ",", "]")
    case xs: Array[_] => xs.toSeq.map(write).mkString("[", ",", "]")
    case other => quote(other.toString)
  }

  private def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
