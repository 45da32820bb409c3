package graft.ops

/** Shared DuckDB-SQL fragments for the oracle builders. */
object OracleSql {

  /** DuckDB replica of Spark's `round(double, scale)`.
    *
    * Spark rounds doubles through `BigDecimal.valueOf(d)` — i.e. the
    * SHORTEST-ROUND-TRIP decimal string of d — then HALF_UP. DuckDB's
    * `round(DOUBLE, s)` rounds the raw binary value instead, so any
    * result landing within an ulp of a .xxx5 tie rounds differently
    * (seen as sporadic 1e-4 diffs on p09/q13 at off-gate SFs). Casting
    * through VARCHAR reproduces the shortest-round-trip step (DuckDB
    * prints doubles shortest-round-trip too) and DECIMAL rounding is
    * HALF_UP, making both engines bit-identical; the final DOUBLE cast
    * restores the column type Spark emits.
    *
    * Scale must exceed the 17 fraction digits a shortest repr can carry:
    * DECIMAL(38,15) double-rounded 0.19374999999999998 -> (at 15 digits)
    * 0.19375 -> 0.1938 where Spark says 0.1937. Scale 20 still leaves
    * 18 integer digits — far above any aggregate here. */
  def roundD(expr: String, scale: Int): String =
    s"CAST(round(CAST(CAST(($expr) AS VARCHAR) AS DECIMAL(38,20)), $scale) AS DOUBLE)"

  /** SQL string literal with `''` doubling — the ONE escaping spelling
    * every oracle builder interpolating user/trained text must use
    * (review r10: four independent copies existed and the seed
    * interpolations in ShardOps skipped escaping entirely, so a quote
    * in a seed broke the oracle at differential-run time). */
  def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
}
