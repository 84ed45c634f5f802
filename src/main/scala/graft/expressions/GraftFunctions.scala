package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.lit

/** Central registry of all graft native expressions. Registration is
  * idempotent and safe on any session; every query-builder entry point
  * calls [[registerAll]] so the functions resolve regardless of how the
  * session was built (production sessions can instead load
  * [[graft.plans.GraftExtensions]] via `spark.sql.extensions`).
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es.head, es(1))),
    "graft_cosine" -> (es => CosineSimilarity(es.head, es(1))),
    "graft_minhash" -> (es => MinHashSignature(es.head, es(1))),
    "graft_simhash" -> (es => SimHash(es.head)),
    "graft_simhash_wide" -> (es => SimHashWide(es.head, es(1))),
    "graft_tokens" -> (es => Tokenize(es.head)),
    "graft_shingles" -> (es => WordShingles(es.head, es(1))),
    "graft_hyperplane" -> (es => HyperplaneSketch(es.head, es(1), es(2))),
    "graft_remove_at" -> (es => RemoveAtPositions(es.head, es(1))),
    "graft_bloom_contains" -> (es => BloomContainsString(es.head, es(1))),
    "graft_bloom_contains_all" -> (es => BloomMightContainAll(es.head, es(1))),
    "graft_round" -> (es => RoundHalfAway(es.head, es(1))),
    "graft_ingest" -> (es => JsonIngest.fromArgs(es)),
    "graft_fb_records" -> (es => FbRecords(es.head)),
    // Spark's own runtime-filter bloom pair (the machinery behind
    // spark.sql.optimizer.runtime.bloomFilter), surfaced as callable
    // functions so graft.operators.BloomJoin can build the same
    // partial-aggregated bloom and codegen'd probe EXPLICITLY — for join
    // keys the optimizer's InjectRuntimeFilter heuristics won't cover
    // (derived keys, pre-aggregated probes). Same-family build+probe
    // guarantees the serialized format always matches.
    "graft_bloom_agg" -> (es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es.head, es(1), es(2))),
    "graft_might_contain" -> (es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es.head, es(1))),
  )

  // Memoized on the LIVE session object (weak keys, identity equality —
  // SparkSession does not override equals): an identityHashCode-keyed set
  // would retain every dead session's hash forever, and a hash collision
  // with a GC'd session would silently skip registering functions and the
  // optimizer rule for a genuinely new session.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  // one lock around the whole check-then-register block: two threads
  // racing the same fresh session could otherwise both pass the
  // extraOptimizations.contains check and append PromoteMapKeys twice
  // (or clobber a concurrently-added rule via the read-modify-write)
  private val registerLock = new Object

  def registerAll(spark: SparkSession): Unit = registerLock.synchronized {
    if (registered.get(spark) == null) {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      all.foreach { case (name, builder) =>
        classic.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
      }
      // the promoted-column rewrite (map subscript → materialized column)
      if (!classic.experimental.extraOptimizations.contains(graft.plans.PromoteMapKeys)) {
        classic.experimental.extraOptimizations =
          classic.experimental.extraOptimizations :+ graft.plans.PromoteMapKeys
      }
      registered.put(spark, java.lang.Boolean.TRUE)
      ()
    }
  }
}
