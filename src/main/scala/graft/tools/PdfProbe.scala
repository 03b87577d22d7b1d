package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{MediaFixtures, Pdf}

/** pdf_text phase attribution (r13, the r12 verdict's stretch ask):
  * at ~66k PDFs/s it is the one decode costing several times its
  * scan (BASELINE.md r8). This probe splits the kernel into the
  * mixed-fixture phases so the dominant cost has a name:
  *
  *   gen      — fixture bytes only (the floor every phase pays)
  *   graph    — + xref walk, object graph, page-tree walk
  *              (Pdf.pageCount: no content streams touched)
  *   inflate  — + content-stream fetch + FlateDecode
  *              (Pdf.contentLength: no operator interpretation)
  *   full     — + the content operator interpreter (Pdf.text)
  *
  * Probe-only Scala UDFs (never in the product path): phase deltas
  * need function boundaries the expression kernel deliberately does
  * not expose. Run:
  *   sbt "runMain graft.tools.PdfProbe [n]"
  */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pdfprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val gen = udf((id: Long) => MediaFixtures.pdfMediaFor(id).length)
    val graph = udf((id: Long) =>
      Pdf.pageCount(MediaFixtures.pdfMediaFor(id)).getOrElse(-1))
    val inflate = udf((id: Long) =>
      Pdf.contentLength(MediaFixtures.pdfMediaFor(id)).getOrElse(-1L))
    val full = udf((id: Long) =>
      Pdf.text(MediaFixtures.pdfMediaFor(id)).map(_.length).getOrElse(-1))

    val ids = spark.range(n)
    def run(c: org.apache.spark.sql.Column): Unit = {
      ids.select(sum(c)).head(); ()
    }
    // warm everything once (codegen + JIT)
    run(gen(col("id"))); run(graph(col("id")))
    run(inflate(col("id"))); run(full(col("id")))
    (1 to 2).foreach { pass =>
      println(s"[pdfprobe] pass $pass, n=$n")
      time("gen-only")(run(gen(col("id"))))
      time("gen+graph (xref/objects/page tree)")(run(graph(col("id"))))
      time("gen+graph+inflate (no interpreter)")(run(inflate(col("id"))))
      time("gen+graph+inflate+interpret (full)")(run(full(col("id"))))
    }
    spark.stop()
  }
}
