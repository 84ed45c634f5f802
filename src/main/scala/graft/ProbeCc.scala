package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where do dedup_cluster's jobs go? */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })
    val docs = graft.sources.Tables.read(spark, dir, "documents")
    // warm
    graft.Queries.registry("dedup_cluster").build(spark, dir).count()
    Thread.sleep(300)

    def mark(label: String): Unit = { println(s"[cc] $label jobs=$jobs"); }

    jobs = 0
    var t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 1, threshold = 0.8, maxId = 60)
    pairs.count()
    Thread.sleep(200)
    println(f"[cc] pairs count in ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs")

    jobs = 0
    t0 = System.nanoTime()
    val cc = graft.operators.TrainPipeline.connectedComponentsAuto(
      docs.where(col("doc_id") < 60).select(col("doc_id")), "doc_id",
      pairs, "id_a", "id_b", requireConvergence = true)
    Thread.sleep(200)
    println(f"[cc] cc build (loop ran) in ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs")

    // inline replica of the loop with per-phase marks — AQE OFF experiment
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    locally {
      import org.apache.spark.sql.types.DecimalType
      val nodes = docs.where(col("doc_id") < 60).select(col("doc_id"))
      val edges = pairs
      jobs = 0; t0 = System.nanoTime()
      val nodeSet = nodes.select(col("doc_id").as("node")).distinct()
      val bidir = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct()
      val e = bidir
        .join(nodeSet.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(nodeSet.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .repartition(col("src"))
        .localCheckpoint()
      println(f"[cc]   e checkpoint ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs")
      jobs = 0; t0 = System.nanoTime()
      var labels = nodes.select(col("doc_id").as("node"), col("doc_id").as("label"))
        .repartition(col("node"))
        .localCheckpoint()
      println(f"[cc]   labels init ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs")
      def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO)
      jobs = 0; t0 = System.nanoTime()
      var prevSum = labelSum(labels)
      println(f"[cc]   init sum ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs")
      var converged = false
      var iter = 0
      while (!converged && iter < 8) {
        val rounds = math.min(2, 8 - iter)
        jobs = 0; t0 = System.nanoTime()
        var prop = labels
        (1 to rounds).foreach { _ =>
          prop = prop.join(e, col("node") === col("src"))
            .select(col("dst").as("node"), col("label"))
            .union(prop)
            .groupBy("node").agg(min("label").as("label"))
        }
        prop = prop.localCheckpoint(false)
        val s = labelSum(prop)
        labels = prop
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        iter += rounds
        println(f"[cc]   step(iter=$iter) ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs converged=$converged")
      }
    }

    jobs = 0
    t0 = System.nanoTime()
    cc.orderBy("node").count()
    Thread.sleep(200)
    println(f"[cc] final count in ${(System.nanoTime()-t0)/1e9}%.3fs jobs=$jobs")

    // raw action-latency floor in this session shape: no-shuffle and
    // 1-exchange aggregates, AQE on vs off, warm
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    (1 to 3).foreach { _ => spark.range(0, 1000, 1, 32).agg(sum("id")).head() }
    (1 to 3).foreach { i =>
      t0 = System.nanoTime()
      spark.range(0, 1000, 1, 32).agg(sum("id")).head()
      println(f"[cc] aqe-on 1-agg head rep$i ${(System.nanoTime()-t0)/1e9}%.3fs")
    }
    (1 to 3).foreach { i =>
      t0 = System.nanoTime()
      spark.range(0, 1000, 1, 32)
        .withColumn("k", col("id") % 7).groupBy("k").agg(sum("id"))
        .agg(sum("k")).head()
      println(f"[cc] aqe-on 2-stage head rep$i ${(System.nanoTime()-t0)/1e9}%.3fs")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 3).foreach { _ => spark.range(0, 1000, 1, 32).agg(sum("id")).head() }
    (1 to 3).foreach { i =>
      t0 = System.nanoTime()
      spark.range(0, 1000, 1, 32)
        .withColumn("k", col("id") % 7).groupBy("k").agg(sum("id"))
        .agg(sum("k")).head()
      println(f"[cc] aqe-off 2-stage head rep$i ${(System.nanoTime()-t0)/1e9}%.3fs")
    }
    spark.stop()
  }
}
