// Test-only minimal mirror of the PUBLIC Apache Pig UDF API surface
// (org.apache.pig.EvalFunc / data.Tuple / data.TupleFactory signatures),
// so PigUdf's reflective adapter can be exercised end-to-end in this
// container, which has no Pig jar. In production the user REGISTERs the
// real pig jar and these names resolve to the real classes — the adapter
// binds purely by name, never at compile time.
package org.apache.pig {

  import org.apache.pig.data.Tuple
  import org.apache.pig.impl.logicalLayer.schema.Schema

  abstract class EvalFunc[T] {
    @throws[java.io.IOException]
    def exec(input: Tuple): T
    // real Pig derives a default from getReturnType; null = "no declared
    // schema", which is all the adapter needs to distinguish
    def outputSchema(input: Schema): Schema = null
    def setInputSchema(input: Schema): Unit = ()
  }

  /** Combiner-aware UDAF contract: each getter names an EvalFunc class;
    * Initial runs per input tuple, Intermed over bags of partials
    * (0..n times), Final over the last partials.
    */
  trait Algebraic {
    def getInitial: String
    def getIntermed: String
    def getFinal: String
  }

  /** Streaming reduce-side UDAF contract (no combiner): the group's bag
    * streams through accumulate (possibly in chunks), then getValue.
    */
  trait Accumulator[T] {
    @throws[java.io.IOException]
    def accumulate(b: Tuple): Unit
    def getValue: T
    def cleanup(): Unit
  }
}

package org.apache.pig.impl.logicalLayer.schema {

  /** Mirror of Pig's public Schema/FieldSchema surface (public fields
    * alias/type/schema, add/getFields) — the adapter reads them
    * reflectively, field-or-method.
    */
  class Schema {
    private val fs = new java.util.ArrayList[Schema.FieldSchema]()
    def add(f: Schema.FieldSchema): Unit = fs.add(f)
    def getFields: java.util.List[Schema.FieldSchema] = fs
  }

  object Schema {
    class FieldSchema(val alias: String, val schema: Schema, val `type`: Byte) {
      def this(alias: String, t: Byte) = this(alias, null, t)
    }
  }
}

package org.apache.pig.data {

  /** Pig's public type-byte constants (org.apache.pig.data.DataType). */
  object DataType {
    final val BOOLEAN: Byte = 5
    final val INTEGER: Byte = 10
    final val LONG: Byte = 15
    final val FLOAT: Byte = 20
    final val DOUBLE: Byte = 25
    final val BYTEARRAY: Byte = 50
    final val CHARARRAY: Byte = 55
    final val TUPLE: Byte = 110
    final val BAG: Byte = 120
  }

  trait Tuple {
    def size(): Int
    def get(i: Int): AnyRef
    def set(i: Int, v: AnyRef): Unit
  }

  private[data] class ArrayTuple(fields: Array[AnyRef]) extends Tuple {
    def size(): Int = fields.length
    def get(i: Int): AnyRef = fields(i)
    def set(i: Int, v: AnyRef): Unit = fields(i) = v
  }

  class TupleFactory {
    def newTuple(n: Int): Tuple = new ArrayTuple(new Array[AnyRef](n))
  }

  object TupleFactory {
    private val instance = new TupleFactory
    def getInstance: TupleFactory = instance
  }

  trait DataBag {
    def add(t: Tuple): Unit
    def iterator(): java.util.Iterator[Tuple]
    def size(): Long
  }

  private[data] class ListBag extends DataBag {
    private val ts = new java.util.ArrayList[Tuple]()
    def add(t: Tuple): Unit = ts.add(t)
    def iterator(): java.util.Iterator[Tuple] = ts.iterator()
    def size(): Long = ts.size().toLong
  }

  class BagFactory {
    def newDefaultBag(): DataBag = new ListBag
  }

  object BagFactory {
    private val instance = new BagFactory
    def getInstance: BagFactory = instance
  }
}
