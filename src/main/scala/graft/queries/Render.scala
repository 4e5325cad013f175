package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** Oracle-parity rendering helpers shared by every query inventory —
  * ONE home for the driver-hash-safety rule so a fix applies everywhere.
  */
private[queries] object Render {

  /** Exact, order-independent money sum: double → DECIMAL(18,s) before
    * SUM, widened to DECIMAL(38,s) — the type DuckDB's SUM over
    * DECIMAL(18,s) produces, so the oracle compare is type-identical
    * (Spark's own SUM widens to 28,s; values are equal either way).
    * Use [[dsumd]] for any NEW query: a DECIMAL output cell is only
    * driver-hashable when every source double is scale-representable. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale))

  /** Exact decimal sum RENDERED as double. The round-3 hash probes proved
    * the driver's hasher disagrees with DuckDB only on DECIMAL-typed cells
    * whose source doubles are not scale-representable (qc_probe_dec18/
    * dec38/round hash-failed while qc_probe_double and qc_probe_str
    * hash-matched, all five value-identical locally). The sum is still
    * computed exactly in decimal — order-independent at any parallelism —
    * and only the final rendered cell is a double, which both engines
    * derive from the identical exact decimal by nearest-double rounding. */
  def dsumd(c: Column, scale: Int = 2): Column = dsum(c, scale).cast("double")
}
