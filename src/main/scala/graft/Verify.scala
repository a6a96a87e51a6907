package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only; the driver always passes two): run just
    // the named queries — re-checking one query without the full sweep
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty)
      // loud, not fatal: a typo'd name must not silently produce an empty
      // sweep that reads as a vacuous pass
      System.err.println(s"[verify] WARNING: unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // explicit failure MARKER in the query's output slot: a throw must
        // surface as an `err` row in the driver's correctness record, not
        // as key-absence — round 7 proved absence can masquerade as health
        // when the whole sweep breaks. The slot holds _error.txt and no
        // parquet part files (any partial write is removed), so a reader
        // of the slot fails loudly instead of parsing a half-result.
        try {
          val slot = Paths.get(outDir, name)
          if (Files.exists(slot))
            Files.walk(slot).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
          Files.createDirectories(slot)
          val head = (s"$e" +: e.getStackTrace.take(8).map("  at " + _))
            .mkString("", "\n", "\n")
          Files.writeString(slot.resolve("_error.txt"), head)
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name: could not write error marker: $m")
        }
      }
      spark.catalog.clearCache() // drop per-operator persisted intermediates
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
