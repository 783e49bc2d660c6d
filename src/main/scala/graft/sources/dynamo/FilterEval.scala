package graft.sources.dynamo

import org.apache.spark.sql.sources._

import graft.sources.dynamo.ItemJson.Item

/** Store-side evaluation of Spark `sources.Filter`s over items — the
  * accept/translate half of the reference's pushdown
  * [REF: connector/FilterPushdown.scala]. `supported` mirrors the
  * reference's pushable set (EqualTo, comparisons, In, IsNull,
  * IsNotNull, begins_with, contains, And/Or/Not); anything else is
  * left for Spark to re-evaluate post-scan.
  *
  * Like DynamoDB's `FilterExpression`, the filter is applied AFTER an
  * item is read from storage — it saves decode + network width, not
  * storage I/O (SURVEY.md §4.1 semantic note). The win here is that
  * rejected items are dropped before JSON→InternalRow decoding and
  * before entering Spark's row pipeline.
  */
object FilterEval {

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => simple(a)
    case EqualNullSafe(a, _)      => simple(a)
    case GreaterThan(a, _)        => simple(a)
    case GreaterThanOrEqual(a, _) => simple(a)
    case LessThan(a, _)           => simple(a)
    case LessThanOrEqual(a, _)    => simple(a)
    case In(a, _)                 => simple(a)
    case IsNull(a)                => simple(a)
    case IsNotNull(a)             => simple(a)
    case StringStartsWith(a, _)   => simple(a)
    case StringContains(a, _)     => simple(a)
    case StringEndsWith(a, _)     => simple(a)
    case And(l, r)                => supported(l) && supported(r)
    case Or(l, r)                 => supported(l) && supported(r)
    case Not(c)                   => supported(c)
    case _: AlwaysTrue            => true // e.g. DELETE FROM t WHERE true
    case _: AlwaysFalse           => true
    case _                        => false
  }

  /** Top-level attributes only — nested paths stay Spark-side. */
  private def simple(attr: String): Boolean = !attr.contains(".")

  /** A row survives iff the predicate is definitely TRUE — the SQL
    * WHERE-clause rule. Spark does NOT re-evaluate filters a source
    * accepts, so this must implement full three-valued logic: a naive
    * boolean `!eval(c)` for NOT would KEEP rows where `c` is UNKNOWN
    * (null attribute), while SQL drops them — e.g.
    * `NOT contains(s, 'x') OR n = 3` over a null `s` (Catalyst only
    * adds an IsNotNull guard for top-level conjuncts, not under OR).
    * PushdownLawsSpec property-checks this against Spark's own
    * evaluation on random predicate trees.
    */
  def eval(f: Filter, item: Item): Boolean = eval3(f, item).contains(true)

  /** Kleene three-valued evaluation: None = UNKNOWN (null attribute,
    * or a type-mismatched comparison, which Spark's decoded column
    * would also see as null). Package-visible so [[PredicateV2]]'s
    * mixed v2 trees reuse it for their v1-expressible subtrees.
    */
  private[dynamo] def eval3(f: Filter, item: Item): Option[Boolean] = f match {
    case _: AlwaysTrue            => Some(true)
    case _: AlwaysFalse           => Some(false)
    case EqualTo(a, v)            => cmp(item, a, v).map(_ == 0)
    case EqualNullSafe(a, v) =>
      Some(if (isNull(item, a)) v == null else cmp(item, a, v).contains(0))
    case GreaterThan(a, v)        => cmp(item, a, v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(item, a, v).map(_ >= 0)
    case LessThan(a, v)           => cmp(item, a, v).map(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(item, a, v).map(_ <= 0)
    case In(a, vs) =>
      // SQL IN: TRUE on a match; UNKNOWN if the attr is null/incomparable
      // or a null literal hides a potential match; else FALSE.
      val cs = vs.toSeq.map(v => if (v == null) None else cmp(item, a, v))
      if (cs.exists(_.contains(0))) Some(true)
      else if (isNull(item, a) || vs.contains(null) ||
               (cs.nonEmpty && cs.forall(_.isEmpty))) None
      else Some(false)
    case IsNull(a)                => Some(isNull(item, a))
    case IsNotNull(a)             => Some(!isNull(item, a))
    case StringStartsWith(a, p)   => str(item, a).map(_.startsWith(p))
    case StringContains(a, p)     => str(item, a).map(_.contains(p))
    case StringEndsWith(a, p)     => str(item, a).map(_.endsWith(p))
    case And(l, r) => (eval3(l, item), eval3(r, item)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval3(l, item), eval3(r, item)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(c) => eval3(c, item).map(!_)
    case other =>
      throw new IllegalStateException(s"filter $other was not accepted for pushdown")
  }

  private def isNull(item: Item, attr: String): Boolean = item.get(attr) match {
    case None | Some(AttrVal.Null) => true
    case _ => false
  }

  private def str(item: Item, attr: String): Option[String] = item.get(attr) match {
    case Some(AttrVal.S(s)) => Some(s)
    case _ => None
  }

  /** Three-way compare of a stored attribute against a Spark literal;
    * None = incomparable (missing attr, type mismatch) → the enclosing
    * predicate is UNKNOWN, feeding the Kleene logic in [[eval3]].
    */
  private def cmp(item: Item, attr: String, v: Any): Option[Int] =
    item.get(attr).flatMap {
      case AttrVal.S(s) => v match {
        // UTF8String binary (code-point) order, matching Catalyst and
        // PredicateV2.compare — java.lang.String.compareTo sorts by
        // UTF-16 code UNIT, which orders supplementary characters
        // (surrogate pairs, U+10000 and up) BELOW U+E000..U+FFFF: a pushed
        // range filter would silently disagree with Spark's own order
        // on exactly those rows, and Spark never re-checks pushed
        // predicates.
        case x: String =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(x)))
        case _ => None
      }
      case AttrVal.N(n) => v match {
        case x: Byte    => Some(n.compare(BigDecimal(x.toInt)))
        case x: Short   => Some(n.compare(BigDecimal(x.toInt)))
        case x: Int     => Some(n.compare(BigDecimal(x)))
        case x: Long    => Some(n.compare(BigDecimal(x)))
        case x: Float   => Some(n.compare(BigDecimal(x.toDouble)))
        case x: Double  => Some(n.compare(BigDecimal(x)))
        case x: java.math.BigDecimal => Some(n.compare(BigDecimal(x)))
        case x: BigDecimal => Some(n.compare(x))
        case _ => None
      }
      case AttrVal.Bool(b) => v match {
        case x: Boolean => Some(java.lang.Boolean.compare(b, x))
        case _ => None
      }
      case _ => None
    }
}
