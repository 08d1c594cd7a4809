package graft.tools

import graft.SparkEntry

/** Dev tool: dump SparkEntry.oracleSql as JSON WITHOUT running any
  * query — lets dev/check-style comparisons run on a subset of
  * RunOne outputs instead of a full Verify pass.
  * Usage: dev/run.sh graft.tools.OracleDump [outFile]
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/tmp/oracle_sql.json")
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
