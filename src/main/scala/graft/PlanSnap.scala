package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` snapshots for named queries — the
  * per-round before/after plan evidence (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: PlanSnap <outDir> <tag> <query>[,<query>...] [sfDir]
  * Giant in-line literals (codebooks, LUTs) are elided per line, as in
  * PlanDump, so every FileScan stays auditable.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    sys.props("graft.bench") = "1" // plans, not the eager recall gates
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val elided = plan.linesIterator.map { l =>
        if (l.length <= 1200) l
        else l.take(600) + s" …<${l.length - 900} literal chars elided>… " +
          l.takeRight(300)
      }.mkString("\n")
      val sanitized = elided.map {
        case c if c < ' ' && c != '\n' && c != '\t' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }.mkString
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), sanitized)
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
