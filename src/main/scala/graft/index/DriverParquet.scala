package graft.index

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession

/** Driver-side reads of BOUNDED index metadata (single-row `_stats`
  * sidecars, k-row codebooks): every index load used to pay a full
  * Spark job per sidecar — file-listing, schema inference, plan,
  * schedule, one 1-task stage — to move a handful of longs to the
  * driver, and the index-routed query family pays several such loads
  * per construction (the r17 profile: ~10 sub-30 ms metadata jobs per
  * hybrid_index run, with the scheduling gaps between them costing
  * more than the jobs). Metadata this small is driver work by the
  * guide's own rule (§5: the driver should do no DATA work — these
  * are not data), so read it with parquet-hadoop's Group API
  * directly: footer + one page, no job, no plan.
  *
  * NOT a cache: every call re-reads the files, so maintenance stays
  * visible exactly as before. Callers assert boundedness — this must
  * never be pointed at corpus data. */
object DriverParquet {

  /** Every row of every `*.parquet` part under `dir`, in
    * deterministic (sorted part name, file order) row order. */
  def groups(spark: SparkSession, dir: String): Vector[Group] = {
    val p = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter { f =>
        val n = f.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getName)
    files.iterator.flatMap { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), f)
        .withConf(conf)
        .build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).toVector
      finally reader.close()
    }.toVector
  }

  /** A float-array column (Spark's 3-level LIST encoding:
    * `optional group f (LIST) { repeated group list
    * { optional float element } }`). */
  def floatArray(g: Group, field: String): Array[Float] = {
    val list = g.getGroup(field, 0)
    val n = list.getFieldRepetitionCount(0)
    Array.tabulate(n)(i => list.getGroup(0, i).getFloat(0, 0))
  }
}
