package graft
import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON without executing any query — the
  * registry is a pure value, so no SparkSession is needed. Feeds
  * tools/oracle_ledger.py, which times every oracle in DuckDB on the
  * same parquet and records the per-query single-node baseline beside
  * the Spark bench medians (the pragmatic stand-in for BASELINE.json's
  * absent numbers). Shares Verify's escaping contract: all control
  * chars escaped so a tab/CR in authored SQL can't break json.load.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "oracle_sql.json"
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json): Unit
  }
}
