package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order clustering: the mask-shift Morton encode against a bit-by-bit
  * reference, the 16-bit scaling bounds, and the layout property the
  * operator exists for — a 2-D box touches only its grid cells' files.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Bit-at-a-time reference interleave: x on even bits, y on odd. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("mask-shift zValue equals the bit-by-bit reference on random 16-bit pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("scale16 pins min to 0, max to 65535, and is monotone") {
    val df = Seq(10L, 20L, 500L, 1000L).toDF("v")
      .select(ZOrder.scale16(col("v"), lit(10L), lit(1000L)).as("s"))
    val s = df.collect().map(_.getLong(0))
    assert(s.head == 0L && s.last == 65535L && s.sameElements(s.sorted))
  }

  test("clustered layout: rows preserved, and a 2-D box touches only its cells' files") {
    val out = tmp("graft-zorder-spec")
    val n = 20000
    val rnd = new scala.util.Random(7)
    val df = (0 until n)
      .map(i => (i.toLong, rnd.nextInt(10000).toLong, rnd.nextInt(100000).toLong))
      .toDF("id", "x", "y")
    ZOrder.cluster(df, "x", "y", out)

    val back = spark.read.parquet(out)
    assert(back.count() == n, "clustering must preserve every row")

    // box covering 1/8 of each dimension = exactly one column/row span of
    // the 8x8 grid: at most a 2x2 block of cells (cell boundaries may
    // split the box), so ≤ 4 of the 64 bucket directories
    val box = back.where(col("x").between(2000, 3200) &&
      col("y").between(40000, 52000))
    val buckets = box.select("zbucket").distinct().count()
    val filesTouched = box.select(input_file_name()).distinct().count()
    val totalFiles = back.select(input_file_name()).distinct().count()
    assert(buckets <= 4, s"10-15% box must stay within a 2x2 cell block, hit $buckets")
    assert(filesTouched < totalFiles / 4,
      s"box scan must touch a small fraction of files: $filesTouched of $totalFiles")
  }

  test("degenerate dimension spread is rejected") {
    val df = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    assertThrows[IllegalArgumentException] {
      ZOrder.cluster(df, "x", "y", tmp("graft-zorder-degenerate"))
    }
    // empty input: the null min/max must surface as the same descriptive
    // guard, not an opaque NPE from Row.getLong on a null cell
    assertThrows[IllegalArgumentException] {
      ZOrder.cluster(df.where(lit(false)), "x", "y",
        tmp("graft-zorder-empty"))
    }
  }
}
