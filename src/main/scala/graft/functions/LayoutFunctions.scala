package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Data-layout clustering keys (SURVEY §7.1 phase 5 scale work): scalar
  * space-filling-curve keys that make `repartitionByRange(...).sortWithinPartitions(...)`
  * writes produce files whose zone maps are narrow in several dimensions at
  * once — the standard multi-dimensional clustering technique for
  * scan-pruning at 100 TB.
  */
object LayoutFunctions {

  /** Z-order (Morton) key over the low `bits` bits of two long columns —
    * native codegen'd expression [[graft.expressions.InterleaveBits]].
    */
  def zorder2(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(graft.expressions.InterleaveBits(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
