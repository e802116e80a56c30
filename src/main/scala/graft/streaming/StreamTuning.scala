package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stream-scoped shuffle/state-partition posture.
  *
  * A stateful streaming query creates ONE state-store instance per
  * shuffle partition, and every micro-batch commits every instance
  * (delta file + snapshot maintenance + offset bookkeeping) whether or
  * not the instance saw a row. With the session default
  * (`spark.sql.shuffle.partitions` = core count in the bench) a
  * micro-batch of a few thousand rows pays 32 state commits plus 32-task
  * stateful stages — pure fixed cost that grows with CORES, not data
  * (the r16 verdict's anti-scaling finding: the stream family ran as
  * fast on 8 cores as 32).
  *
  * The right shard count for streaming STATE tracks key cardinality and
  * per-trigger throughput, not the session's core count — so it is a
  * per-operator setting, scoped to the streaming query: Spark clones the
  * session (and its conf) synchronously when a streaming query starts,
  * so setting the conf around `.start()` pins the posture to the stream
  * while the caller's session keeps its own parallelism for everything
  * else.
  *
  * Parameterized for scale: `spark.graft.stream.statePartitions` wins
  * when set (a production ingest sizes it to its key space / throughput,
  * e.g. hundreds for a multi-TB/day feed); the default is
  * min(defaultParallelism, 8) — enough instances that a replayed
  * checkpoint from a small session still spreads, few enough that
  * micro-batch fixed cost stays flat as cores grow. Results are
  * partition-count-invariant by the operators' merge contracts
  * (commutative state folds, set-accumulated sinks), which the DuckDB
  * oracle certifies per query.
  */
private[graft] object StreamTuning {

  val ConfKey = "spark.graft.stream.statePartitions"

  def statePartitions(spark: SparkSession): Int =
    spark.conf.getOption(ConfKey).map(_.toInt).getOrElse(
      math.min(spark.sparkContext.defaultParallelism, 8).max(1))

  /** Run `start` (a `writeStream...start()` chain) with the stream
    * posture applied; the session conf is restored before returning. */
  def withStatePartitions[T](spark: SparkSession)(start: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, statePartitions(spark).toString)
    try start
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
