// Test-only minimal mirror of the PUBLIC Apache Pig UDF API surface
// (org.apache.pig.EvalFunc / data.Tuple / data.TupleFactory signatures),
// so PigUdf's reflective adapter can be exercised end-to-end in this
// container, which has no Pig jar. In production the user REGISTERs the
// real pig jar and these names resolve to the real classes — the adapter
// binds purely by name, never at compile time.
package org.apache.pig {

  import org.apache.pig.data.Tuple

  abstract class EvalFunc[T] {
    @throws[java.io.IOException]
    def exec(input: Tuple): T
  }
}

package org.apache.pig.data {

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
}
