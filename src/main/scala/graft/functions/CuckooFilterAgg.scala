package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/** `cuckoo_filter_agg(longCol, expectedItems)` — distributed cuckoo-filter
  * build as a TypedImperativeAggregate: each partition builds a local
  * filter over its hashes (update), partial filters merge via partial-key
  * relocation (merge), the final binary image is the result (eval). The
  * same shape as Spark's built-in BloomFilterAggregate, with deletion
  * available on the materialized filter. */
case class CuckooFilterAgg(
    child: Expression,
    expectedItems: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilterImpl]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): CuckooFilterImpl =
    CuckooFilterImpl.create(expectedItems)

  override def update(buffer: CuckooFilterImpl, input: InternalRow): CuckooFilterImpl = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CuckooFilterImpl, other: CuckooFilterImpl): CuckooFilterImpl =
    buffer.mergeInPlace(other)

  override def eval(buffer: CuckooFilterImpl): Any = buffer.serialize()

  override def serialize(buffer: CuckooFilterImpl): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): CuckooFilterImpl =
    CuckooFilterImpl.deserialize(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CuckooFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CuckooFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): CuckooFilterAgg = copy(child = c)
}

/** `cuckoo_might_contain(filterBinary, longCol)` — probe expression; the
  * filter side must be foldable (a literal / aggregate result), and is
  * deserialized once per expression instance, not per row. */
case class CuckooMightContain(filterExpr: Expression, valueExpr: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = filterExpr
  override def right: Expression = valueExpr
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val filter: CuckooFilterImpl = {
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null else CuckooFilterImpl.deserialize(bytes)
  }

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = valueExpr.eval(input)
    if (v == null) null else java.lang.Boolean.valueOf(filter.mightContain(v.asInstanceOf[Long]))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CuckooMightContain =
    copy(filterExpr = l, valueExpr = r)
}

object CuckooFilterAgg {
  def cuckoo_filter_agg(c: Column, expectedItems: Long): Column =
    column(CuckooFilterAgg(expression(c), expectedItems)
      .toAggregateExpression())

  def cuckoo_might_contain(filter: Column, value: Column): Column =
    column(CuckooMightContain(expression(filter), expression(value)))
}
