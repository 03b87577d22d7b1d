package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe for the r11 `dedup_incremental` bench drift
  * (4.4 -> 7.7 s in the full 208-query sweep; 3.9 s isolated). Runs a
  * configurable amount of sweep context (the alphabetical prefix of
  * declared queries, same order Bench uses), then repeats
  * dedup_incremental N times recording wall time, GC time delta and
  * the storage-memory block count per run — enough to tell apart the
  * three candidate causes: JIT warm-up dilution, driver-heap/GC
  * pressure from accumulated localCheckpoint/broadcast blocks, and a
  * real plan regression (which would show as a stable floor well above
  * the isolated number).
  *
  * Usage: runMain graft.tools.DedupIncProbe [prefixCount] [repeats]
  */
object DedupIncProbe {
  def main(args: Array[String]): Unit = {
    val prefixN = args.headOption.map(_.toInt).getOrElse(32)
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B the codegen-class-cache-eviction hypothesis (static conf,
    // must be set before the session exists)
    sys.env.get("GRAFT_CODEGEN_CACHE").foreach(v =>
      b.config("spark.sql.codegen.cache.maxEntries", v))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def blocks(): Int =
      spark.sparkContext.getRDDStorageInfo.length

    val ordered = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val target = "dedup_incremental"
    val prefix = ordered.takeWhile(_._1 != target).take(prefixN)
    val fn = graft.SparkEntry.queries(target)
    def runTarget(label: String): Unit = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val dg = (gcMillis() - g0) / 1e3
      println(f"[probe] $label%-28s $dt%6.2f s  (gc $dg%5.2f s, " +
        f"persisted RDDs ${blocks()}%d)")
    }
    def runContext(): Unit = prefix.foreach { case (n, f) =>
      try f(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[probe] context $n failed: ${e.getMessage}")
      }
    }
    // bench-shaped interleave: target / full context / target — the
    // second target run is what Bench's pass 2 measures
    (1 to repeats).foreach { i =>
      runTarget(s"pass $i (after context)")
      println(s"[probe] context: ${prefix.size} prefix queries...")
      runContext()
    }
    runTarget("final (after context)")
    spark.stop()
  }
}
