package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom aggregate functions (the `TypedImperativeAggregate`
  * extension point — mutable buffer, partial-aggregation friendly).
  */
object AggExprs {

  /** Slot-wise minimum over per-row minhash signatures — merges
    * document signatures into ONE signature for the whole group
    * (slot-wise min is associative + commutative, so partial
    * aggregation and any merge order give identical results). The
    * merged signature estimates the Jaccard similarity of the UNION of
    * the group's shingle sets: the corpus-level near-duplication
    * primitive (compare sources/shards/snapshots without pairwise doc
    * joins). Input contract: array<long> of length k per row (the
    * [[VecExprs.MinHashSig]] output).
    */
  case class MinHashMerge(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_merge"

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(k)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        val n = math.min(k, arr.numElements())
        var i = 0
        while (i < n) {
          // skip NULL slots: ArrayData.getLong reads a null element
          // as 0, which would silently pin the signature slot to the
          // global minimum and inflate every estimated Jaccard the
          // group participates in (the expression is SQL-exposed, so
          // null-bearing arrays are reachable from user queries)
          if (!arr.isNullAt(i)) {
            val x = arr.getLong(i)
            if (x < buf(i)) buf(i) = x
          }
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * k)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(k)(bb.getLong())
    }

    override def withNewMutableAggBufferOffset(o: Int): MinHashMerge =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinHashMerge =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashMerge =
      copy(child = c.head)
  }
}
