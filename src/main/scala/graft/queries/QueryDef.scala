package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL run by the driver on the same parquet.
  *
  * Result discipline (FIXTURES.md §2): total ORDER BY, every computed column
  * aliased identically on both sides, money sums accumulated in decimal so
  * results are independent of partitioning/row order, doubles produced by
  * structurally identical expressions on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object QueryDef {

  /** Order-independent exact sum for money-like doubles: accumulate as
    * DECIMAL(30,10), return double rounded to 2 decimals. The per-row double
    * expression is computed identically in Spark and DuckDB (same IEEE ops),
    * the decimal cast rounds the same double the same way, and the decimal
    * sum is exact. The final 2-decimal rounding absorbs the engines'
    * decimal->double conversion difference: Spark converts correctly rounded
    * (BigDecimal.doubleValue), DuckDB may be 1-2 ulp off (int128/scale double
    * division) — at sums ~1e10, 1 ulp > 1e-6 and would break the driver's
    * 6-decimal hash. Exact sums of 2-decimal inputs are 0.01-multiples,
    * >= 0.005 from any rounding boundary, so <= 2 ulp of conversion error can
    * never change the rounded value (safe to sums ~1e12). */
  def decSum(e: Column): Column =
    round(sum(e.cast(DecimalType(30, 10))).cast("double"), 2)

  /** Matching DuckDB SQL for [[decSum]]. */
  def decSumSql(e: String): String = s"round(CAST(SUM(CAST($e AS DECIMAL(30,10))) AS DOUBLE), 2)"

  /** Exact average via decimal sum / count, both engines dividing the same
    * two doubles. */
  def decAvg(e: Column): Column = decSum(e) / count(lit(1)).cast("double")
  def decAvgSql(e: String): String = s"${decSumSql(e)} / CAST(COUNT(*) AS DOUBLE)"

  /** TPC-H revenue expression (same text in both engines). */
  val revenueExpr: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  val revenueSql: String = "l_extendedprice * (1 - l_discount)"

  /** Expose a parquet table as a directory of symlinks for a file-stream
    * source (file sources need a directory they can list): a single-file
    * table links as one entry, a directory table links each data part —
    * the file source does not follow directory symlinks. */
  def linkParquetInputs(table: java.nio.file.Path, srcDir: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    Files.createDirectories(srcDir)
    if (Files.isDirectory(table)) {
      val listing = Files.list(table)
      try listing.forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          Files.createSymbolicLink(srcDir.resolve(p.getFileName.toString), p)
      } finally listing.close()
    } else {
      Files.createSymbolicLink(srcDir.resolve(table.getFileName.toString), table)
    }
  }

  /** Recursive delete (children before parents); missing path is a no-op. */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally stream.close()
    }
  }

  /** Temp dir whose contents a query's RESULT still reads lazily (so it
    * cannot be deleted inside the query function): registered for recursive
    * deletion at JVM exit — no filesystem residue survives the run. */
  def tempDirForResult(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try deleteRecursively(p)
      catch { case _: Throwable => () }
    }))
    p
  }
}
