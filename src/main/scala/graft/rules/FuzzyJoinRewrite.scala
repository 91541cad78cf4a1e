package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Whole-operator rewrite rule: a declarative fuzzy join
  *
  *   `left JOIN right ON levenshtein(a, b) <= 1`
  *
  * has no equi-join key, so Spark plans it as BroadcastNestedLoopJoin /
  * CartesianProduct — O(|L|·|R|) levenshtein calls, the classic
  * quadratic trap. This rule rewrites the inner-join case into the
  * FastSS deletion-neighborhood plan ([[graft.operators.FuzzyJoin]],
  * Bocek et al. 2007): explode each side's distance-1 deletion
  * neighborhood (L+1 keys per string — linear), equi-join on the key,
  * verify only the colliding candidates.
  *
  * Multiplicity safety WITHOUT a Distinct: a matching pair shares
  * possibly several neighborhood keys, so the candidate join would emit
  * it once per shared key. A trailing predicate keeps only the emission
  * whose key is the FIRST left-side key also present in the right-side
  * key array — exactly one survivor per pair, so duplicate input rows
  * keep their join multiplicity (same trick as the range join's
  * first-shared-bin dedup, rj3). The rewritten plan is an equi-join:
  * Catalyst picks broadcast/shuffled-hash/sort-merge by size, AQE still
  * applies, and the nested loop is gone.
  *
  * Conditions handled: an inner join whose condition contains the
  * conjunct `levenshtein(a,b) <= 1` (or `< 2`, or the commuted forms)
  * with `a` from one side and `b` from the other, both deterministic.
  * Remaining conjuncts stay as a post-join filter. Anything else is
  * left untouched.
  */
object FuzzyJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** levenshtein(a,b) bounded by 1, in any of its spellings. */
  private def levArgs(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), IntegerLiteral(1)) => Some((a, b))
    case LessThan(Levenshtein(a, b, None), IntegerLiteral(2))        => Some((a, b))
    case GreaterThanOrEqual(IntegerLiteral(1), Levenshtein(a, b, None)) => Some((a, b))
    case GreaterThan(IntegerLiteral(2), Levenshtein(a, b, None))     => Some((a, b))
    case _ => None
  }

  /** Catalyst tree for FuzzyJoin.deletionNeighborhood(s):
    * if length(s)=0 then [s] else concat([s], transform(sequence(1,
    * length(s)), i -> substring(s,1,i-1) || substring(s,i+1,MAX))).
    */
  private def neighborhood(s: Expression): Expression = {
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val del = Concat(Seq(
      Substring(s, Literal(1), Subtract(i, Literal(1))),
      Substring(s, Add(i, Literal(1)), Literal(Int.MaxValue))))
    val all = Concat(Seq(
      CreateArray(Seq(s)),
      ArrayTransform(
        // Sequence is TimeZoneAware even for integers — without a zone it
        // stays unresolved and poisons every alias above it
        Sequence(Literal(1), Length(s), None, Some(conf.sessionLocalTimeZone)),
        LambdaFunction(del, Seq(i)))))
    ArrayDistinct(If(EqualTo(Length(s), Literal(0)), CreateArray(Seq(s)), all))
  }

  /** Project str's key array onto `side`, then explode it. Returns the
    * generate node plus the (keys, key) attributes.
    */
  private def keyed(side: LogicalPlan, str: Expression, tag: String)
      : (LogicalPlan, Attribute, Attribute) = {
    val keysAlias = Alias(neighborhood(str), s"_fj_keys_$tag")()
    val proj = Project(side.output :+ keysAlias, side)
    val keysAttr = keysAlias.toAttribute
    val keyAttr = AttributeReference(s"_fj_key_$tag", StringType, nullable = true)()
    val gen = Generate(Explode(keysAttr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(keyAttr), child = proj)
    (gen, keysAttr, keyAttr)
  }

  /** Session knob for the degenerate-key seatbelt below; <= 0 disables. */
  val MaxBucketConf = "spark.graft.fuzzyJoin.maxBucket"

  /** Degenerate-key seatbelt, mirroring
    * [[graft.operators.FuzzyJoin.join]]'s `maxBucket`: a neighborhood key
    * carried by more than `maxBucket` exploded rows (empty strings,
    * boilerplate tokens) would make the candidate equi-join quadratic in
    * that bucket — precisely in the declarative path where the user never
    * chose a bound. Rows of oversized buckets are dropped via a windowed
    * per-key count (partition-by-key shuffle the candidate join needs
    * anyway, so the exchange is reused). The trailing dedup still keys on
    * the FIRST shared key of the full arrays, so a pair whose first
    * shared key is hot is lost even if another shared key survives —
    * never duplicated, though: at most the one firstShared emission can
    * pass. Same completeness-for-survival trade the operator form
    * documents; audit with [[graft.operators.FuzzyJoin.droppedKeys]].
    */
  private def bounded(gen: LogicalPlan, keyAttr: Attribute, tag: String)
      : LogicalPlan = {
    val maxBucket = conf.getConfString(MaxBucketConf, "10000").toInt
    if (maxBucket <= 0) return gen
    val cntAlias = Alias(
      WindowExpression(
        Count(Literal(1)).toAggregateExpression(),
        WindowSpecDefinition(Seq(keyAttr), Nil,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
            UnboundedFollowing))),
      s"_fj_cnt_$tag")()
    val win = Window(Seq(cntAlias), Seq(keyAttr), Nil, gen)
    val filt = Filter(
      LessThanOrEqual(cntAlias.toAttribute, Literal(maxBucket.toLong)), win)
    Project(gen.output, filt)
  }

  private def rewrite(j: Join, a0: Expression, b0: Expression,
      rest: Seq[Expression], lev: Expression): Option[LogicalPlan] = {
    // orient (a, b) to (left, right)
    val (a, b) =
      if (a0.references.subsetOf(j.left.outputSet) &&
          b0.references.subsetOf(j.right.outputSet)) (a0, b0)
      else if (b0.references.subsetOf(j.left.outputSet) &&
          a0.references.subsetOf(j.right.outputSet)) (b0, a0)
      else return None
    if (!a.deterministic || !b.deterministic) return None
    if (a.dataType != StringType || b.dataType != StringType) return None

    val (genL, lKeys, lKey) = keyed(j.left, a, "l")
    val (genR, rKeys, rKey) = keyed(j.right, b, "r")

    val candidates = Join(bounded(genL, lKey, "l"), bounded(genR, rKey, "r"),
      Inner, Some(EqualTo(lKey, rKey)), JoinHint.NONE)

    // one emission per pair: this key must be the first left key that the
    // right side also carries
    val x = NamedLambdaVariable("x", StringType, nullable = true)
    val firstShared = ElementAt(
      ArrayFilter(lKeys, LambdaFunction(ArrayContains(rKeys, x), Seq(x))),
      Literal(1))
    val verified = Filter(
      (Seq(lev, EqualTo(lKey, firstShared)) ++ rest).reduce(And),
      candidates)

    Some(Project(j.left.output ++ j.right.output, verified))
  }

  /** An equi-join conjunct (one side's expr = other side's expr) means
    * Catalyst already has a hash-join key and the levenshtein predicate
    * rides along as a cheap residual — no rewrite needed. This is also
    * the fixpoint guard: the rewritten plan's join carries the generated
    * key equality, so the rule never fires on its own output (predicate
    * pushdown folds the residual verify back into that join).
    */
  private def hasEquiKey(j: Join, conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
        (r.references.subsetOf(j.left.outputSet) && l.references.subsetOf(j.right.outputSet))
      case EqualNullSafe(l, r) =>
        (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
        (r.references.subsetOf(j.left.outputSet) && l.references.subsetOf(j.right.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKey(j, conjuncts)) j
      else conjuncts.iterator.flatMap { c =>
        levArgs(c).flatMap { case (a, b) =>
          rewrite(j, a, b, conjuncts.filterNot(_ eq c), c)
        }
      }.nextOption().getOrElse(j)
  }
}
