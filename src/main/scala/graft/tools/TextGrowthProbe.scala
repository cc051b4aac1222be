package graft.tools

import graft.core.GraftSession
import graft.operators.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: the GrowthProbe arm for the TEXT INDEX (BM25 postings store)
  * — a [[Search.buildTextIndex]] index grown past its seed bucket count by
  * STREAMED SEGMENTS + beside-live folds ONLY (never a stop-the-world
  * [[Search.compactTextIndex]]), verifying that the `_POSTINGS` generation
  * machinery ported from the band stores holds the per-term probe cost
  * FLAT across corpus growth while a frozen-P control drifts linearly
  * (the pre-round-13 behavior: `buckets` frozen in meta forever, a term's
  * probe reading O(totalPostings / buckets) rows).
  *
  * Arms (same growth schedule, one store each):
  *   - grow:   per-bucket postings target from args — P moves with the
  *             store (generation flips behind the `_POSTINGS` pointer)
  *   - frozen: `graft.text.bucket.target.rows` pinned huge — the seed
  *             layout never re-buckets (the control)
  *
  * Usage: runMain graft.tools.TextGrowthProbe [startDocs] [horizonDocs] [chunkDocs] [foldEvery] [reps] [targetRows] [arms]
  */
object TextGrowthProbe {

  private val TokensPerDoc = 32
  private val Vocab = 50000L

  /** Synthetic docs: 32 tokens each, hash-drawn from a 50k vocabulary —
    * every term's postings grow linearly with the corpus, the shape that
    * exposes the frozen-P drift. */
  private def docRows(spark: SparkSession, from: Long, until: Long): DataFrame =
    spark.range(from, until).select(col("id").as("doc_id"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(TokensPerDoc - 1)),
          i => concat(lit("w"), pmod(xxhash64(col("doc_id"), i), lit(Vocab))))))

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val startDocs = args.lift(0).map(_.toLong).getOrElse(50000L)
    val horizon = args.lift(1).map(_.toLong).getOrElse(800000L)
    val chunkDocs = args.lift(2).map(_.toLong).getOrElse(50000L)
    val foldEvery = args.lift(3).map(_.toInt).getOrElse(4)
    val reps = args.lift(4).map(_.toInt).getOrElse(9)
    val targetRows = args.lift(5).map(_.toLong).getOrElse(16384L)
    val arms = args.lift(6).map(_.split(",").toSeq).getOrElse(Seq("grow", "frozen"))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-textgrowth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("graft_textgrowth_")
    import spark.implicits._

    // a FIXED query batch (8 queries, 4 terms each, vocabulary-resident):
    // the probe cost is the pruned postings read for these terms' buckets
    val qs = (1L to 8L).map(q =>
        (q, (0 until 4).map(t => s"w${(q * 7919 + t * 104729) % Vocab}").mkString(" ")))
      .toDF("query_id", "query_text").localCheckpoint()

    def generation(idx: String): String = {
      val ptr = new java.io.File(s"$idx/_POSTINGS")
      if (ptr.exists())
        new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim
      else "(base)"
    }

    // the query terms' raw hashes (Spark's xxhash64, the index's bucket
    // hash) — fixed across the whole run
    val termHashes = qs
      .select(explode(split(col("query_text"), " ")).as("tok"))
      .select(xxhash64(col("tok"))).distinct().collect().map(_.getLong(0))

    /** The probe's exact read amplification: postings rows living in the
      * HIT buckets of every live root — precisely the rows bm25Indexed's
      * pruned read touches (before the tok rowgroup filter), counted from
      * parquet footers. Deterministic, so the IO story is noise-free where
      * wall time at this scale is dominated by fixed per-probe job
      * overheads. */
    def hitRows(idx: String): Long = {
      def rootBuckets(root: String, fallback: Int): Int = {
        val m = new java.io.File(s"$root/_BUCKETS")
        if (m.exists())
          new String(java.nio.file.Files.readAllBytes(m.toPath)).trim.toInt
        else fallback
      }
      val metaB = spark.read.parquet(s"$idx/meta").head().getInt(2)
      val base = s"$idx/${generation(idx) match { case "(base)" => "postings"; case g => g }}"
      val segRoots = Option(new java.io.File(s"$idx/segs").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(d => d.isDirectory && new java.io.File(d, "postings/_SUCCESS").exists())
        .map(d => s"$d/postings")
      (base +: segRoots).map { r =>
        val p = rootBuckets(r, metaB)
        val hit = termHashes.map(h => java.lang.Math.floorMod(h, p.toLong).toInt).distinct
        val dirs = hit.map(b => s"$r/pb=$b").filter(new java.io.File(_).exists())
        if (dirs.nonEmpty) spark.read.parquet(dirs: _*).count()
        else {
          val hasData = Option(new java.io.File(r).listFiles())
            .exists(_.exists(_.getName.endsWith(".parquet")))
          if (!hasData) 0L
          else spark.read.parquet(r)
            .filter(col("pb").isin(hit.toIndexedSeq: _*)).count()
        }
      }.sum
    }

    def probe(idx: String): (Double, Long) = {
      val t = System.nanoTime()
      val hits = Search.bm25Indexed(spark, idx, qs, topK = 10).count()
      ((System.nanoTime() - t) / 1e9, hits)
    }

    for (arm <- arms) {
      if (arm == "frozen") sys.props("graft.text.bucket.target.rows") = "1000000000000"
      else sys.props("graft.text.bucket.target.rows") = targetRows.toString
      val idx = s"$out/$arm"
      // both arms seed identically at the floor P=64 (the auto size of the
      // start corpus under either target); only the growth path differs
      Search.buildTextIndex(docRows(spark, 0, startDocs), idx, buckets = 64)

      var n = startDocs
      var nextCheckpoint = startDocs * 2
      var batch = 0
      probe(idx) // warmup listing + codegen
      println(f"[textgrowth] arm=$arm n=$n%,d " +
        f"P=${Search.textIndexStats(spark, idx)("graft.text.buckets")} " +
        f"gen=${generation(idx)} " +
        f"probe=${median((1 to reps).map(_ => probe(idx)._1))}%.3f s " +
        f"hit-rows=${hitRows(idx)}%,d")
      while (n < horizon) {
        Search.writePostingsSegment(
          docRows(spark, n, n + chunkDocs), idx, f"g_$batch%05d")
        n += chunkDocs; batch += 1
        if (batch % foldEvery == 0)
          Search.foldTextSegments(spark, idx, gc = true) // beside-live cycle
        if (n >= nextCheckpoint || n >= horizon) {
          probe(idx) // warmup after layout changes
          val runs = (1 to reps).map(_ => probe(idx))
          require(runs.map(_._2).forall(_ > 0L),
            s"vocabulary terms must keep hitting at n=$n (hits=${runs.map(_._2).toSet})")
          val st = Search.textIndexStats(spark, idx)
          println(f"[textgrowth] arm=$arm n=$n%,d " +
            f"P=${st("graft.text.buckets")} gen=${generation(idx)} " +
            f"probe=${median(runs.map(_._1))}%.3f s " +
            f"hit-rows=${hitRows(idx)}%,d " +
            f"postings=${st("graft.text.postings")} " +
            f"segs=${st("graft.text.segments")}")
          nextCheckpoint = n * 2
        }
      }
      val st = Search.textIndexStats(spark, idx)
      require(st("graft.text.docs").toLong == horizon,
        s"every streamed doc must be live in the stats view: $st")
      println(s"[textgrowth] arm=$arm final stats=$st gen=${generation(idx)}")
    }
    sys.props.remove("graft.text.bucket.target.rows")
    spark.stop()
  }
}
