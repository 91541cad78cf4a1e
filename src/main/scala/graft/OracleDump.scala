package graft

import java.nio.file.{Files, Paths}

/** Serializer for the registry's oracle SQL. Building the registry only
  * constructs query closures (nothing runs), so dumping needs no Spark
  * session — [[DumpOracle]] refreshes the full-registry dump in seconds,
  * which keeps `tools/bench_duck.py` / `tools/benchscale.py` and the
  * committed `ORACLE_SQL.json` artifact in lockstep with the code.
  */
object OracleDump {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def json: String =
    SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")

  def write(path: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, json)
  }
}

/** `sbt "runMain graft.DumpOracle <out.json>"` — full-registry oracle SQL
  * dump with no Spark startup.
  */
object DumpOracle {
  def main(args: Array[String]): Unit =
    OracleDump.write(if (args.nonEmpty) args(0) else "ORACLE_SQL.json")
}
