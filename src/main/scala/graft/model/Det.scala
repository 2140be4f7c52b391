package graft.model

/** Deterministic, partition-layout-independent pseudo-randomness.
  *
  * Every generated value is a pure function of (seed, stream coordinates) —
  * never of wall clock, partition index, or iteration order (FIXTURES.md §5).
  * Uses the splitmix64 finalizer from [[Ids.mix]].
  */
object Det {
  def rand(seed: Long, a: Long): Long = Ids.mix(Ids.mix(seed ^ 0x5eed5eedL) ^ a)
  def rand(seed: Long, a: Long, b: Long): Long = Ids.mix(rand(seed, a) ^ Ids.mix(b))
  def rand(seed: Long, a: Long, b: Long, c: Long): Long = Ids.mix(rand(seed, a, b) ^ Ids.mix(c))

  /** Uniform int in [0, n). */
  def nextInt(r: Long, n: Int): Int = (((r >>> 1) % n + n) % n).toInt
  /** Uniform double in [0, 1). */
  def nextDouble(r: Long): Double = (r >>> 11).toDouble / (1L << 53).toDouble
}
