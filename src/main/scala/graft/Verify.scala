package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata timestamps are parquet TIMESTAMP(MICROS) (scanned
      // natively as TIMESTAMP_NTZ); this flag is a no-op for them and
      // stays only so a NANOS-stamped regeneration reads as long
      // instead of failing the whole scan.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session-level engine init up front (r18): queries call
    // Graft.init themselves as needed, but initializing HERE makes the
    // whole dump run under the library session configuration
    // (cached-plan AQE conf included) from the first query — the
    // oracle-verified configuration is exactly the benched one.
    Graft.init(spark)
    new java.io.File(outDir).mkdirs()
    var failures = 0
    // engine-computed intermediates some oracles re-derive results from
    // (seeded hash families the oracle can't recompute); dumped first so
    // a later query failure still leaves the oracle inputs in place.
    // A SIBLING of outDir (r12), not a child: the driver treats every
    // directory under outDir as a query result, so an in-tree dump
    // surfaced as a permanent no-oracle row in the correctness
    // artifact. The oracle SQL reads the dump via the absolute path
    // Verify substitutes for __AUX__, so its location is free.
    val auxDir = new java.io.File(
      new java.io.File(outDir).getAbsolutePath.stripSuffix("/") + "__aux"
    ).getAbsolutePath
    // opt-in comma-separated name filter for fast local iteration on a
    // single query; the driver never sets it, so its runs dump everything.
    // The filter also selects aux dumps (by aux name), so iterating on
    // one query doesn't pay for every other query's intermediates.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.auxiliary
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$auxDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux $name failed: ${e.getMessage}")
        failures += 1
      }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += 1
        // remove any stale result from a previous run: a leftover
        // parquet would let the oracle compare silently validate old
        // data for a now-broken query
        val stale = new java.io.File(s"$outDir/$name")
        if (stale.exists()) {
          stale.listFiles().foreach(_.delete()); stale.delete()
        }
      }
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
    // resolve the __AUX__ placeholder to the absolute dump dir so the
    // driver's DuckDB run reads the intermediates regardless of its cwd
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__AUX__", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // non-zero exit when any query failed so exit-status-only automation
    // can't mistake a partial dump for success (the driver still gets
    // per-query results: missing dirs read as failures)
    if (failures > 0) {
      System.err.println(s"[verify] $failures quer${if (failures == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
