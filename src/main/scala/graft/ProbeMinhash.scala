package graft

import graft.expressions.SketchExprs
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-by-stage timing of the minhash dedup pipeline (scratch). */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SketchExprs.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val res = f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $res")
      res
    }

    val withSh = docs.select(col("doc_id").as("id"),
      array_distinct(TF.shingles(col("text"), 2)).as("sh")).cache()
    time("shingles")(withSh.count())
    val withSig = withSh.withColumn("sig", SketchExprs.minhash(col("sh"), 32)).cache()
    time("signatures")(withSig.count())
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => xxhash64(array_join(transform(
          slice(col("sig"), b * 4 + 1, lit(4)),
          v => v.cast(StringType)), ","), b)))
        .as(Seq("band", "bandhash"))).cache()
    time("banded")(banded.count())
    val candidates = banded.as("l").join(banded.as("r"), Seq("band", "bandhash"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct().cache()
    time("candidates")(candidates.count())
    val verified = candidates
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
          .as("jaccard"))
      .where(col("jaccard") >= 0.4)
    time("verified")(verified.count())
    spark.stop()
  }
}
