package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-execution scan-metric extraction: how many files / bytes each
  * parquet scan in a plan actually read. This is the evidence partition
  * pruning and file skipping leave behind — a `month >= X` predicate on
  * the partitioned store must show up HERE as fewer files and bytes, not
  * just as a `PartitionFilters` line in explain output.
  *
  * Run the DataFrame's action first; file metrics are filled in when the
  * scan resolves its partitions. AQE wraps stages, so the traversal
  * descends through [[AdaptiveSparkPlanExec]]/[[QueryStageExec]] and into
  * subqueries.
  */
object ScanStats {

  final case class Scan(files: Long, bytes: Long, partitions: Option[Long])

  def of(df: DataFrame): Seq[Scan] = {
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec => go(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => (o.children ++ o.subqueries).flatMap(go)
    }
    go(df.queryExecution.executedPlan).map { f =>
      def m(k: String): Option[Long] = f.metrics.get(k).map(_.value)
      Scan(m("numFiles").getOrElse(-1L), m("filesSize").getOrElse(-1L),
        m("numPartitions"))
    }
  }

  /** Totals across every file scan in the plan: (files, bytes). */
  def totals(df: DataFrame): (Long, Long) = {
    val s = of(df)
    (s.map(_.files).sum, s.map(_.bytes).sum)
  }
}
