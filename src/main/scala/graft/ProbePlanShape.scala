package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: dump the shuffle-exchange count of every registry query's
  * physical plan as TSV — the generator for
  * `src/test/resources/exchange_counts.tsv`, which PlanAuditSpec pins so
  * ANY future exchange-count regression fails CI (not just the hand-picked
  * plan tests). Regenerate after an INTENTIONAL plan change:
  *
  *   tools/run.sh graft.ProbePlanShape /root/testdata/sf0.01 \
  *     > src/test/resources/exchange_counts.tsv
  */
object ProbePlanShape {
  // SHUFFLE exchanges only (broadcast/reused exchanges are not
  // data-movement regressions) — keep in lockstep with
  // PlanAuditSpec.countExchanges
  def countExchanges(plan: String): Int =
    ("Exchange (hash|range)partitioning|Exchange SinglePartition|" +
      "Exchange RoundRobinPartitioning").r.findAllIn(plan).size

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.registry.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val n = countExchanges(q.build(spark, sfDir).queryExecution.executedPlan.toString)
      println(s"$name\t$n")
    }
    spark.stop()
  }
}
