package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot storage for the PARTITION-LAYOUT index families — the
  * vector indexes ([[IvfVectorIndex]], [[LshVectorIndex]]) and, since
  * later in r17, the three postings lakes
  * ([[graft.operators.Bm25Index]], [[graft.operators.ShingleIndex]],
  * [[graft.operators.WinnowIndex]]) — the versioned-read discipline
  * the flat [[VectorIndex]] already had, brought to the
  * cluster/bucket-partitioned layouts so maintenance is safe against
  * CONCURRENT READERS (until r17 compact swapped the live directory
  * and retrain/grow deleted live partitions mid-commit, so a scan
  * overlapping a maintenance window could observe a half-swapped
  * layout or die on vanished files — at 100 TB a multi-minute scan
  * overlapping maintenance is the normal case, not the exception).
  *
  * Layout (all under the index root):
  *
  * {{{
  *   _manifests/m-0000000007        committed manifests, one per commit
  *   gen=g-0000000007/cluster=3/…   write-once generation directories
  *   _books/b-0000000007/centroids  versioned codebooks (IVF)
  * }}}
  *
  * A MANIFEST is the index: a small text file listing the
  * `gen=…/cluster=…` partition directories (and codebook dir) that
  * make up one consistent snapshot. Every write lands WHOLE in a
  * fresh generation directory first; the atomic tmp-then-rename
  * manifest commit is the only visibility point. Readers resolve the
  * newest manifest once and read exactly its directories
  * (`basePath` keeps `cluster` a partition column, so Catalyst's
  * partition pruning works unchanged); nothing a committed manifest
  * references is ever mutated or renamed, so a resolved plan stays
  * valid while maintenance commits NEW generations next to it.
  *
  * Consequences, each spec-pinned:
  *  - a reader pinned to manifest N is undisturbed by a concurrent
  *    compact / retrain / grow / append (they commit N+1);
  *  - a crash before the manifest commit leaves the new generation
  *    INVISIBLE (no torn append: the pre-r17 IVF append could land a
  *    visible subset of a batch) and the orphan is reaped by the next
  *    commit;
  *  - shard merges move whole generation DIRECTORIES — O(generations)
  *    renames instead of O(files).
  *
  * Retention bounds the time-travel window: a commit keeps the last
  * [[DefaultRetain]] manifests and deletes generations/books no
  * retained manifest references. A reader must be younger than
  * `retain` maintenance COMMITS (not wall-clock) — the same contract
  * as any lakehouse snapshot expiry; size `retain` to the longest
  * scan overlapping the busiest maintenance cadence. */
object Manifests {

  /** One committed snapshot: `parts` are `gen=…/<prefix>=…` partition
    * dirs relative to the index root, `book` the codebook dir under
    * `_books` (when the family has one). */
  final case class Manifest(
      n: Long, book: Option[String], parts: Vector[String]) {
    def genOf(part: String): String = Manifests.genOf(part)
  }

  private val Dir = "_manifests"
  private val Header = "graft-manifest v1"

  /** Manifests (and the generations only they reference) retained per
    * commit: the current one plus two predecessors, so a reader that
    * resolved its snapshot before a maintenance op is safe through
    * TWO further commits — enough to hold a scan open across a
    * compact AND a grow back-to-back. Storage cost is bounded by the
    * retained snapshots' non-shared generations (only a compact
    * duplicates the whole data tree; append/retrain/grow snapshots
    * share their untouched generations). */
  val DefaultRetain = 3

  private[index] def manifestName(n: Long) = f"m-$n%010d"
  /** Generation-directory name for commit `n` — public because the
    * postings lakes ([[graft.operators.Bm25Index]] and siblings)
    * share the storage convention (r17). */
  def genDirName(n: Long) = f"gen=g-$n%010d"
  private[index] def bookName(n: Long) = f"b-$n%010d"

  /** The `gen=…` component of a part line. */
  def genOf(part: String): String = part.substring(0, part.indexOf('/'))

  /** The partition value (e.g. cluster id) of a part line. */
  def partitionValueOf(part: String): String =
    part.substring(part.lastIndexOf('=') + 1)

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The newest committed manifest, or None for a path that has no
    * manifest store (not built yet, or a pre-r17 layout). */
  def current(spark: SparkSession, path: String): Option[Manifest] = {
    val fs = fsOf(spark, path)
    val dir = new Path(path, Dir)
    if (!fs.exists(dir)) return None
    val names = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("m-")).sorted
    names.lastOption.map(nm => read(spark, path, nm))
  }

  /** [[current]] or a loud failure naming the path. */
  def require(spark: SparkSession, path: String): Manifest =
    current(spark, path).getOrElse(throw new IndexNotFoundException(
      s"No index manifest at $path/$Dir — not an index (or built by a " +
      "pre-manifest layout; rebuild it)"))

  private def read(
      spark: SparkSession, path: String, name: String): Manifest = {
    val fs = fsOf(spark, path)
    val p = new Path(new Path(path, Dir), name)
    val in = fs.open(p)
    val raw = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    val lines = raw.split("\n").filter(_.nonEmpty)
    // committed manifests are rename-atomic, so a torn one is
    // out-of-band damage: refuse loudly rather than read a partial
    // file list as "the index shrank"
    if (lines.length < 2 || lines.head != Header || lines.last != "end")
      throw new IllegalStateException(
        s"torn or foreign index manifest at $p — refusing to guess")
    val body = lines.tail.init
    val book = body.find(_.startsWith("book "))
      .map(_.stripPrefix("book "))
    val parts = body.filter(_.startsWith("part "))
      .map(_.stripPrefix("part ")).toVector
    Manifest(name.stripPrefix("m-").toLong, book, parts)
  }

  /** Commit the next snapshot: write-to-tmp + atomic rename, then
    * expire manifests beyond `retain` and delete the generations and
    * books only expired manifests referenced. Single-writer (the
    * families' maintenance contract): a lost race surfaces as a
    * failed rename, never a silent overwrite. */
  def commit(
      spark: SparkSession, path: String,
      book: Option[String], parts: Seq[String],
      retain: Int = DefaultRetain): Manifest = {
    val fs = fsOf(spark, path)
    val dir = new Path(path, Dir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val n = current(spark, path).map(_.n).getOrElse(0L) + 1
    val m = Manifest(n, book, parts.distinct.sorted.toVector)
    val tmp = new Path(dir, s".tmp-${manifestName(n)}")
    val out = fs.create(tmp, true)
    try out.write((
      Header + "\n" +
      m.book.map(b => s"book $b\n").getOrElse("") +
      m.parts.map(p => s"part $p\n").mkString +
      "end\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    scala.Predef.require(fs.rename(tmp, new Path(dir, manifestName(n))),
      s"manifest commit lost a race at $path (single-writer contract " +
      "violated?)")
    reap(spark, path, retain)
    m
  }

  /** Expire old manifests and the storage only they reference. Skipped
    * while a `_merge_pending` marker is present: a mid-merge crash
    * leaves moved-in generations that the roll-forward will commit —
    * they must not be swept as orphans before it runs (every load
    * rolls the merge forward BEFORE its first commit, so the skip is
    * belt and braces, not load-bearing). */
  private def reap(spark: SparkSession, path: String, retain: Int): Unit = {
    val fs = fsOf(spark, path)
    if (fs.exists(new Path(path, "_merge_pending"))) return
    val dir = new Path(path, Dir)
    val names = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("m-")).sorted
    if (names.length <= retain) return
    val (expired, retained) = names.splitAt(names.length - retain)
    val live = retained.map(nm => read(spark, path, nm))
    val liveGens = live.flatMap(_.parts.map(genOf)).toSet
    val liveBooks = live.flatMap(_.book).toSet
    expired.foreach(nm => fs.delete(new Path(dir, nm), false))
    // top-level generation dirs not referenced by any retained
    // manifest — includes crash orphans (written, never committed)
    fs.listStatus(new Path(path)).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.startsWith("gen=") && !liveGens.contains(nm))
        fs.delete(st.getPath, true)
    }
    val books = new Path(path, "_books")
    if (fs.exists(books)) fs.listStatus(books).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && !liveBooks.contains(nm))
        fs.delete(st.getPath, true)
    }
  }

  /** The partition dirs a just-written generation holds, as part
    * lines (one driver listing). */
  def listParts(
      spark: SparkSession, path: String, genDir: String): Vector[String] = {
    val fs = fsOf(spark, path)
    val g = new Path(path, genDir)
    if (!fs.exists(g)) return Vector.empty
    fs.listStatus(g)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(st => s"$genDir/${st.getPath.getName}")
      .toVector.sorted
  }

  /** The snapshot `m` as a DataFrame: exactly its partition dirs,
    * with `basePath` so the partition column (`cluster`/`bucket`)
    * stays a partition column — Catalyst prunes on it as if this were
    * a plain Hive-layout read — and the internal `gen` column
    * dropped. The file listing is resolved NOW, against directories
    * no later commit mutates: the returned plan is a pinned snapshot,
    * valid until `retain` further commits expire it.
    *
    * Scan roots are GENERATION directories, not part directories
    * (r17 late, measured on the fan-in sweep): a fragmented lake's
    * manifest holds gens × partitions part lines, and handing Spark
    * thousands of root paths made every resolve pay a per-root
    * listing round (S=64 BM25 probe measured 19.6 s vs ~1 s on gen
    * roots — BASELINE). A committed generation is normally
    * referenced WHOLE, so one root per gen lists the same files; the
    * exception is a retrain/grow commit, whose part list keeps a
    * SUBSET of older generations (the untouched clusters) — those
    * partial gens contribute a partition-column whitelist predicate
    * that Catalyst prunes with at planning time, so the replaced
    * partitions' files are listed but never read. */
  def dataFrame(
      spark: SparkSession, path: String, m: Manifest): DataFrame = {
    scala.Predef.require(m.parts.nonEmpty,
      s"index manifest ${m.n} at $path lists no data")
    import org.apache.spark.sql.functions.{col, lit}
    val head = m.parts.head
    val sub = head.substring(head.indexOf('/') + 1)
    val partCol = sub.substring(0, sub.indexOf('='))
    def partPred(ps: Seq[String]): org.apache.spark.sql.Column = {
      val vals = ps.map(partitionValueOf)
      if (vals.forall(_.matches("-?\\d+")))
        col(partCol).isin(vals.map(_.toInt): _*)
      else col(partCol).cast("string").isin(vals: _*)
    }
    // one driver listing per gen decides full vs partial reference
    val listed = m.parts.groupBy(genOf).toSeq.sortBy(_._1).map {
      case (g, ps) =>
        (g, ps, listParts(spark, path, g).toSet == ps.toSet)
    }
    val base = spark.read.option("basePath", path)
      .parquet(listed.map { case (g, _, _) => s"$path/$g" }: _*)
    val pruned =
      if (listed.forall(_._3)) base
      else {
        val fullGens = listed.collect {
          case (g, _, true) => g.stripPrefix("gen=") }
        val fullPred = if (fullGens.isEmpty) lit(false)
          else col("gen").isin(fullGens: _*)
        base.filter(listed.collect { case (g, ps, false) =>
          col("gen").equalTo(g.stripPrefix("gen=")).and(partPred(ps))
        }.foldLeft(fullPred)(_ or _))
      }
    pruned.drop("gen")
  }

  /** Deterministic destination name for a generation absorbed from a
    * merge source — stable across crash re-runs (same source path +
    * gen name → same target), disjoint from the local `g-…` number
    * space. */
  def mergedGenName(srcPath: String, genDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$srcPath/$genDir".getBytes("UTF-8"))
    "gen=g-m" + md.take(5).map(b => f"$b%02x").mkString
  }

  /** Roll an interrupted shard merge forward — called by the vector
    * families' `load` and at every `mergeAll` entry (where it is also
    * the RESUME: the fresh marker written just before makes the
    * mainline merge a roll-forward too). Protocol state on disk is a
    * `_merge_pending` marker listing the owned source paths; every
    * step is idempotent: generation moves skip already-moved dirs,
    * the manifest commit dedups part lines, source deletes and the
    * marker delete are no-ops when already done. */
  def completeMerge(spark: SparkSession, path: String): Unit = {
    val dst = new Path(path)
    val fs = fsOf(spark, path)
    if (!fs.exists(dst)) return
    graft.operators.IndexMerge.readMarker(fs, dst).foreach {
      case (srcLine, _) =>
        val srcs = graft.operators.IndexMerge.splitSrcs(srcLine)
        val m = require(spark, path)
        val moved = srcs.flatMap { s =>
          // a source is movable while its manifest store survives; a
          // tree already drained (or torn by a crashed delete) is
          // finished by the delete below
          if (current(spark, s).isDefined) moveGenerations(spark, s, path)
          else Vector.empty
        }
        if (moved.nonEmpty)
          commit(spark, path, m.book, m.parts ++ moved)
        srcs.foreach { s =>
          val sp = new Path(s)
          sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(sp, true)
          ()
        }
        graft.operators.IndexMerge.deleteMarker(fs, dst)
        graft.plans.AnnRouteRule.invalidate(path)
    }
  }

  /** Move every generation a source manifest references into `dst`
    * under [[mergedGenName]] names (whole-directory renames, skipped
    * when already moved) and return the source's part lines rebased
    * to the new names. */
  def moveGenerations(
      spark: SparkSession, srcPath: String, dstPath: String)
      : Vector[String] = {
    val src = require(spark, srcPath)
    val fs = fsOf(spark, dstPath)
    src.parts.map(genOf).distinct.foreach { gen =>
      val from = new Path(srcPath, gen)
      val to = new Path(dstPath, mergedGenName(srcPath, gen))
      if (fs.exists(from)) {
        if (!fs.exists(to))
          scala.Predef.require(fs.rename(from, to),
            s"index merge: cannot move $from to $to")
        else // a crashed re-run already moved part of this gen: the
          // rename is all-or-nothing per dir, so both existing means
          // two sources hashed alike — impossible by construction
          throw new IllegalStateException(
            s"index merge: both $from and $to exist")
      } // already moved by an interrupted run: nothing to do
    }
    src.parts.map { p =>
      s"${mergedGenName(srcPath, genOf(p))}/${p.substring(p.indexOf('/') + 1)}"
    }
  }
}
