package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the classic
  * bridge lives in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim (inside the sql package tree) re-exports the two
  * conversions the graft engine needs to register custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully CONVERT a Column's node tree to a catalyst Expression
    * (`ColumnNodeToExpressionConverter` is `private[sql]`).
    * [[expression]] merely wraps the node (fine inside Dataset ops, which
    * convert during analysis); a FunctionRegistry builder must return a
    * real catalyst tree, so composed-Column SQL functions go through this
    * — remaining UnresolvedFunction children resolve in the analyzer's
    * normal fixpoint. */
  def toCatalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Build a DataFrame from a logical plan (Dataset.ofRows is
    * `private[sql]`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Drain the async listener bus so per-query metric snapshots are
    * complete (`listenerBus` is `private[spark]`, hence this shim). */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Resolve a boolean condition against a bare attribute list with the
    * session's FULL analyzer (type coercion, implicit casts, function
    * resolution — a hand-rolled attribute substitution would silently
    * skip coercion and mis-eval e.g. `col("id") % 2 === 0` on a LONG id),
    * then bind it to ordinal references so executors can eval it on
    * InternalRows without a session. Used by the stored-serve keep
    * predicate (the zipServe paths in `graft.operators.Vamana` evaluate
    * it per decoded file row via [[createPredicate]];
    * `sessionState` is `private[sql]`, hence this shim). */
  def resolveBoundPredicate(spark: org.apache.spark.sql.SparkSession,
      cond: Expression,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference])
      : Expression = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val analyzed = cs.sessionState.analyzer.execute(
      Filter(cond, LocalRelation(attrs)))
    cs.sessionState.analyzer.checkAnalysis(analyzed)
    val resolved = analyzed.collectFirst { case f: Filter => f.condition }
      .getOrElse(sys.error(s"predicate $cond did not analyze to a Filter"))
    org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(resolved, attrs.map(a =>
        a: org.apache.spark.sql.catalyst.expressions.Attribute))
  }

  /** Compile a BOUND boolean expression (from [[resolveBoundPredicate]])
    * into an evaluator — called task-side (BasePredicate instances are
    * not shareable across threads; the bound Expression is what ships in
    * the closure). SQL filter semantics: a null result counts as false. */
  def createPredicate(bound: Expression)
      : org.apache.spark.sql.catalyst.InternalRow => Boolean = {
    val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(bound)
    p.initialize(0)
    row => p.eval(row)
  }

  /** One serializable parquet-file → InternalRow reader for `schema`,
    * built ONCE driver-side — O(1) Spark planning no matter how many
    * files it later reads executor-side. This is FileSourceScanExec's own
    * reader (`ParquetFileFormat.buildReaderWithPartitionValues`,
    * `private[sql]`) with no partition columns and no pushed filters. */
  def parquetRowReader(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .buildReaderWithPartitionValues(cs, schema,
        new org.apache.spark.sql.types.StructType(), schema, Nil,
        // rows, not smuggled ColumnarBatches (the vectorized reader still
        // runs underneath; it just unrolls batches to rows itself)
        Map(org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
        cs.sessionState.newHadoopConfWithOptions(Map.empty))
  }

  /** Wrap a (path, length, modificationTime) listing entry for
    * [[parquetRowReader]] (`PartitionedFile` is `private[sql]`-adjacent
    * plumbing; whole-file range, no partition values). */
  def partitionedFile(path: String, length: Long, modificationTime: Long)
      : org.apache.spark.sql.execution.datasources.PartitionedFile =
    org.apache.spark.sql.execution.datasources.PartitionedFile(
      org.apache.spark.sql.catalyst.InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(path), 0L, length,
      Array.empty, modificationTime, length)

  /** The reader hands back whole ColumnarBatches DISGUISED as
    * InternalRow on the vectorized path (FileSourceScanExec knows which;
    * callers here must not) — flatten either shape to genuine rows.
    * Batch-backed rows are reused mutable views: consume each one fully
    * (eval + copy/decode) before advancing. */
  def flattenToRows(it: Iterator[org.apache.spark.sql.catalyst.InternalRow])
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    it.flatMap { r =>
      (r: Any) match {
        case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
          import scala.jdk.CollectionConverters._
          b.rowIterator().asScala
        case row: org.apache.spark.sql.catalyst.InternalRow =>
          Iterator.single(row)
      }
    }

  /** Serializable InternalRow → external Row decoder for `schema` —
    * build per task via `.createDeserializer()` (deserializers are not
    * thread-safe; the encoder is, and ships in closures). Decoded Rows
    * are fresh copies, safe to buffer past reused batch-backed inputs. */
  def rowDecoder(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        org.apache.spark.sql.Row] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
      .resolveAndBind()

  /** Register a Catalyst expression as a SQL function on a live session —
    * `sessionState` is `private[sql]`, hence this shim's package. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       usage: String,
                       builder: Seq[Expression] => Expression): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      builder.getClass.getCanonicalName, null, name, usage, "")
    cs.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
  }
}
