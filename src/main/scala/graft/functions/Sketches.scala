package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog (Flajolet et al. 2007) built from md5 —
  * the "novel sketch" custom-operator family of the builder brief.
  *
  * Spark's own `approx_count_distinct` is HLL++ with an opaque
  * xxHash64 seed per plan — useful, but its estimates cannot be
  * certified cross-engine. This variant derives every register from
  * md5 hex digits with integer arithmetic (the simhash/minhash
  * convention), so DuckDB reproduces the registers — and therefore
  * the ESTIMATE — bit-for-bit: an approximate operator with an exact
  * oracle.
  *
  * Geometry: m = 256 registers (b = 8). The first 2 hex digits pick
  * the register; the next 14 (56 bits) give the rank rho = leading
  * zero bits + 1 (57 when all 56 are zero). Standard small-range
  * linear-counting correction below 2.5·m when empty registers exist;
  * the 32-bit large-range correction is N/A at 56-bit rank width.
  *
  * Scale: registers aggregate with ONE partial-agg groupBy on
  * (group, register) — max(rho) combines map-side — then a per-group
  * fold over at most m=256 register values. State per group is bounded
  * (256 bytes of rho, like a real HLL), so distinct-counting a 100 TB
  * column costs one narrow map + one shuffle of (group, 256) rows.
  * The harmonic-mean fold runs in register order (sequential IEEE
  * fold, the sim_topk convention), and the estimate is rounded to 4
  * decimals (the kg_bm25 convention) so the single `ln`/`pow` calls
  * cannot leak a last-ulp libm difference across engines.
  */
object Sketches {

  val HllM = 256

  private val HexDigits = "0123456789abcdef"

  private def hexVal(d: Column): Column =
    call_function("instr", lit(HexDigits), d) - 1

  /** (register, rho) for one value: md5-derived, integer-only. */
  def hllParts(v: Column): (Column, Column) = {
    val h = md5(v.cast("string"))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("int")
    val sub = substring(h, 3, 14)
    // leading zero HEX DIGITS, then leading zero bits inside the first
    // non-zero digit: 8-15 none, 4-7 one, 2-3 two, 1 three
    val p = length(regexp_extract(sub, "^0*", 0))
    val dv = hexVal(sub.substr(p + 1, lit(1)))
    val lzInDigit = when(dv >= 8, 0).when(dv >= 4, 1).when(dv >= 2, 2).otherwise(3)
    val rho = when(p === 14, lit(57)).otherwise(p * 4 + lzInDigit + 1)
    (bucket, rho)
  }

  /** alpha_m * m^2 for m = 256. */
  val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM

  // ── Count-Min sketch (Cormode & Muthukrishnan 2005) ────────────────
  // Same determinism convention: row-salted md5 buckets, so the DuckDB
  // oracle rebuilds the counter matrix AND every point estimate
  // exactly. d=4 rows × w=1024 counters; estimate = min over rows.
  // Scale: the counter matrix is ≤ d·w rows regardless of corpus size
  // (one partial-agg groupBy), and point queries are a broadcast-sized
  // join against it — heavy-hitter frequency at 100 TB without a
  // per-distinct-value shuffle.

  val CmsW = 1024
  val CmsD = 4

  /** Counter bucket of `v` in sketch row `row`. */
  def cmsBucket(v: Column, row: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$row:"), v.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(CmsW.toLong))

  // ── Bloom filter (deterministic) ───────────────────────────────────
  // k=3 salted md5 positions over m=8192 bits. The built filter is the
  // DISTINCT set-position list — broadcast-sized by construction
  // (≤ m entries however large the build side) — and the probe is a
  // narrow map checking all k positions, the runtime-row-filter shape
  // Spark itself uses for large joins. Oracle-exact like the rest.

  val BloomM = 8192
  val BloomK = 3

  /** The k bit positions of `v`. */
  def bloomBits(v: Column): Column =
    array((0 until BloomK).map(i =>
      pmod(conv(substring(md5(concat(lit(s"${i}b:"), v.cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(BloomM.toLong))): _*)

  /** Dense m/64-word bitset from a distinct-position column `p` —
    * the single-row broadcast payload. A POSITION LIST probe would
    * linear-scan up to m entries per check (measured 12× slower at
    * sf0.1); the bitset probe is one O(1) word index + bit test.
    */
  def bloomBitset(pos: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pos.groupBy(call_function("shiftright", col("p"), lit(6)).as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        col("p").bitwiseAND(lit(63L)).cast("int"))).as("bits"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("w"), col("bits"))))).as("m"))
      .select(transform(sequence(lit(0L), lit((BloomM / 64 - 1).toLong)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bs"))

  /** Bit test of position `p` against bitset array `bs`. */
  def bloomContains(bs: Column, p: Column): Column =
    call_function("shiftright",
      element_at(bs, call_function("shiftright", p, lit(6)).cast("int") + 1),
      p.bitwiseAND(lit(63L)).cast("int"))
      .bitwiseAND(lit(1L)) === 1L

  /** Estimate from the per-group register list `regs` =
    * sort_array(collect_list(struct(bucket, r))) — registers absent
    * from the list hold 0. Harmonic mean via a register-ordered
    * sequential fold; linear counting below 2.5·m with empties.
    */
  def hllEstimate(regs: Column): Column = {
    val zeros = (lit(HllM) - size(regs)).cast("double")
    val z = aggregate(regs, lit(0.0),
      (acc, x) => acc + pow(lit(2.0), -x.getField("r"))) + zeros
    val raw = lit(HllAlphaM2) / z
    val linear = lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros)
    round(when(raw <= 2.5 * HllM && zeros > 0, linear).otherwise(raw), 4)
  }
}
