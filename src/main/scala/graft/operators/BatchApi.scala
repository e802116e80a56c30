package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** `mapInPandas`-shaped columnar batch API (SURVEY §2.8 multimodal plumbing).
  *
  * PySpark's arrow batch UDF contract is
  * {{{
  *   def fn(batches: Iterator[pandas.DataFrame]) -> Iterator[pandas.DataFrame]
  *   df.mapInPandas(fn, schema="doc_id long, n_samples long, ...")
  * }}}
  * — the kernel sees bounded COLUMNAR batches, may return any number of
  * output batches of any row count, and declares its output schema up front.
  * [[mapInBatches]] is the same contract on the JVM: named column arrays per
  * batch (the pandas-DataFrame analog), a caller-declared output schema the
  * runtime enforces per batch (pyspark raises the same way when a UDF
  * returns a frame whose columns drift from the declared schema), and
  * `batchSize`-bounded peak memory per task regardless of partition size
  * (the `spark.sql.execution.arrow.maxRecordsPerBatch` knob).
  *
  * A real Python model-inference UDF slots into the same seam: ship the
  * columns through Arrow instead of Scala arrays and point `fn` at the
  * Python worker — schema, batch shape, and partitioning are already what
  * `mapInPandas` needs. The JVM kernels ([[Multimodal.decodeSums]] and
  * friends) stay the in-process implementations of that contract.
  */
object BatchApi {

  /** One columnar batch — the pandas-DataFrame analog: equal-length column
    * arrays keyed by field name. */
  final case class ColumnarBatch(columns: Map[String, Array[Any]], size: Int) {
    def apply(name: String): Array[Any] = columns.getOrElse(name,
      throw new IllegalArgumentException(
        s"batch has no column '$name' (has: ${columns.keys.mkString(", ")})"))
  }

  object ColumnarBatch {
    /** Build from parallel columns, checking the rectangle invariant. */
    def of(cols: (String, Array[Any])*): ColumnarBatch = {
      require(cols.nonEmpty, "empty batch schema")
      val n = cols.head._2.length
      cols.foreach { case (name, arr) =>
        require(arr.length == n,
          s"ragged batch: column '$name' has ${arr.length} rows, expected $n")
      }
      ColumnarBatch(cols.toMap, n)
    }
  }

  /** Apply a columnar-batch kernel to every partition: rows are grouped into
    * `batchSize`-bounded [[ColumnarBatch]]es, `fn` maps the batch iterator
    * (1:1, 1:N, and N:1 batch shapes all allowed, like mapInPandas), and the
    * output batches are validated against `outputSchema` — missing or ragged
    * columns fail the task loudly rather than mis-zipping rows. */
  def mapInBatches(df: DataFrame, outputSchema: StructType,
                   batchSize: Int = Multimodal.DefaultBatch)(
      fn: Iterator[ColumnarBatch] => Iterator[ColumnarBatch]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val inNames = df.schema.fieldNames
    val outNames = outputSchema.fieldNames
    df.mapPartitions { rows =>
      val inBatches = rows.grouped(batchSize).map { chunk =>
        val cols = inNames.zipWithIndex.map { case (name, i) =>
          val arr = new Array[Any](chunk.size)
          var j = 0
          chunk.foreach { r => arr(j) = r.get(i); j += 1 }
          name -> arr
        }
        ColumnarBatch(cols.toMap, chunk.size)
      }
      fn(inBatches).flatMap { out =>
        outNames.foreach { f =>
          require(out.columns.contains(f),
            s"kernel output missing declared column '$f' " +
              s"(produced: ${out.columns.keys.mkString(", ")})")
          require(out.columns(f).length == out.size,
            s"ragged kernel output: column '$f' has " +
              s"${out.columns(f).length} rows, batch declares ${out.size}")
        }
        (0 until out.size).iterator.map { i =>
          Row.fromSeq(outNames.toIndexedSeq.map(f => out.columns(f)(i)))
        }
      }
    }(Encoders.row(outputSchema))
  }
}
