package graft

import graft.sources.Tables

/** The session reader cache's contracts: identity reuse within a session,
  * the documented pinned-listing staleness after external appends, and
  * invalidate() as the remedy.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("read() reuses one DataFrame per (session, path); invalidate() refreshes after appends") {
    val dir = tmp("tables-cache")
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$dir/region.parquet")
    val first = Tables.read(spark, dir, "region")
    assert(first.count() == 3)
    // same object back — no per-call listing/schema work
    assert(Tables.read(spark, dir, "region") eq first)
    // an external append is invisible to the pinned listing (documented)
    Seq(4L, 5L).toDF("v").write.mode("append").parquet(s"$dir/region.parquet")
    assert(Tables.read(spark, dir, "region").count() == 3,
      "cached reader must pin the listing it resolved with")
    Tables.invalidate(dir)
    val fresh = Tables.read(spark, dir, "region")
    assert(!(fresh eq first))
    assert(fresh.count() == 5, "invalidate() must pick up appended files")
    // spelling variants must not silently no-op
    Seq(6L).toDF("v").write.mode("append").parquet(s"$dir/region.parquet")
    Tables.invalidate(s"$dir///")
    assert(Tables.read(spark, dir, "region").count() == 6,
      "trailing slashes must still invalidate")
    Seq(7L).toDF("v").write.mode("append").parquet(s"$dir/region.parquet")
    Tables.invalidate(s"$dir/region.parquet")
    assert(Tables.read(spark, dir, "region").count() == 7,
      "an exact table path must invalidate its own entry")
  }
}
