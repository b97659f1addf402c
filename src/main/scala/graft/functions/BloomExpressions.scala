package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter membership probe as a native Catalyst expression.
  *
  * The 100 TB incremental-ingest trick: a corpus of N already-ingested
  * fingerprints compresses to ~1.2 bytes/item at 1% false-positive
  * rate, so a billion-document history rides along as a ~1.2 GB
  * broadcast (or far less for daily-scale increments) and the
  * increment is pre-filtered on the map side — only the tiny
  * might-contain fraction pays the anti-join shuffle. No false
  * negatives, so downstream exact confirmation keeps results
  * bit-identical to the full anti-join.
  *
  * Spark's own runtime row-level filtering uses the same sketch
  * internally (`BloomFilterMightContain`), but only as an optimizer
  * injection — this surface makes the sketch a first-class reusable
  * asset (build once per ingest cycle, probe many batches).
  */
object BloomExpressions {

  /** True when `value` might be in the broadcast filter; false means
    * definitely absent. String inputs probe the UTF-8 bytes — the same
    * encoding `DataFrameStatFunctions.bloomFilter` inserts, so a
    * filter built over a string column round-trips exactly.
    */
  case class BloomMightContain(child: Expression, bf: Broadcast[BloomFilter])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    // Spark's BloomFilter only hashes strings/bytes/longs — reject
    // anything else (e.g. decimal) at analysis time instead of
    // throwing (or silently false-ing) per row at runtime.
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType | BinaryType | LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string, binary, or integral argument, got ${other.catalogString}")
    }

    override def nullSafeEval(input: Any): Any = input match {
      case s: UTF8String => bf.value.mightContainBinary(s.getBytes)
      case b: Array[Byte] => bf.value.mightContainBinary(b)
      case l: Long => bf.value.mightContainLong(l)
      case i: Int => bf.value.mightContainLong(i.toLong)
      case s: Short => bf.value.mightContainLong(s.toLong)
      case b: Byte => bf.value.mightContainLong(b.toLong)
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  def bloomMightContain(value: Column, bf: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(value), bf))
}
