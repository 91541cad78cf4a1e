package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cols
import graft.schema.SchemaDSL

/** Property-style invariants (seeded exhaustive sampling) for the pure
  * no-SparkSession surface: name minting, schema DSL round-trips.
  */
class PropertySpec extends AnyFunSuite {

  private def ident(rnd: scala.util.Random): String =
    "c" + Iterator.fill(1 + rnd.nextInt(8))(
      ('a' + rnd.nextInt(26)).toChar).mkString

  test("Cols.fresh never returns a taken name and is stable when free") {
    val rnd = new scala.util.Random(1)
    for (_ <- 1 to 500) {
      val base = ident(rnd)
      val taken = List.fill(rnd.nextInt(10))(ident(rnd)) ++
        (if (rnd.nextBoolean()) List(base) else Nil) ++
        (if (rnd.nextBoolean()) List(base + "1") else Nil)
      val n = Cols.fresh(base, taken)
      assert(!taken.contains(n), s"base=$base taken=$taken -> $n")
      if (!taken.contains(base)) assert(n === base)
      assert(n.startsWith(base))
    }
  }

  test("Cols.fresh(seq) mints pairwise-distinct names") {
    val rnd = new scala.util.Random(2)
    for (_ <- 1 to 500) {
      // duplicate bases on purpose: minted names must still be distinct
      val b = ident(rnd)
      val bases = List(b, b, ident(rnd), b + "1")
      val taken = List.fill(rnd.nextInt(8))(ident(rnd))
      val ns = Cols.fresh(bases, taken)
      assert(ns.distinct.length === ns.length, s"bases=$bases taken=$taken -> $ns")
      assert(ns.forall(n => !taken.contains(n)))
    }
  }

  test("SchemaDSL render∘parse is a canonical fixed point") {
    val rnd = new scala.util.Random(3)
    val prims = Vector("str", "long", "int", "double", "bool", "date", "datetime")
    def fieldType(): String = rnd.nextInt(10) match {
      case 0 => s"[${prims(rnd.nextInt(prims.length))}]"
      case 1 => s"{x:${prims(rnd.nextInt(prims.length))},y:[long]}"
      case _ => prims(rnd.nextInt(prims.length))
    }
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(5)
      val s0 = (0 until n).map(i => s"f$i:${fieldType()}").mkString(",")
      val parsed = SchemaDSL.parse(s0)
      val rendered = SchemaDSL.render(parsed)
      assert(SchemaDSL.parse(rendered) === parsed, s"input=$s0 rendered=$rendered")
      assert(SchemaDSL.render(SchemaDSL.parse(rendered)) === rendered)
    }
  }
}
