package graft.operators

/** Collision-free internal column names. Operators that add temp columns
  * (sort ranks, salt, LSH buckets, as-of markers) must not silently
  * shadow a user column of the same name — `fresh` appends a numeric
  * suffix until the name is unused.
  */
object Cols {

  def fresh(base: String, taken: Iterable[String]): String = {
    val used = taken.toSet
    if (!used(base)) base
    else Iterator.from(1).map(i => s"$base$i").find(n => !used(n)).get
  }

  /** Mint several distinct fresh names at once (later names avoid the
    * earlier ones too).
    */
  def fresh(bases: Seq[String], taken: Iterable[String]): Seq[String] =
    bases.foldLeft((Vector.empty[String], taken.toSet)) {
      case ((acc, used), b) =>
        val n = fresh(b, used)
        (acc :+ n, used + n)
    }._1
}
