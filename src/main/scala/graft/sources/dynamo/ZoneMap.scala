package graft.sources.dynamo

import org.apache.spark.sql.sources._

/** Zone-map pruning: decide from a shard's [[ShardStats]] whether a
  * pushed predicate could possibly be TRUE for some item in the shard.
  * `false` ⇒ the shard is skipped entirely (its segment is not
  * planned); `true` just means "cannot prove otherwise".
  *
  * Soundness mirrors [[FilterEval]]'s three-valued semantics exactly:
  * a row survives a pushed filter only when the predicate is
  * DEFINITELY TRUE, and [[FilterEval.cmp]]'s typed compare makes a
  * numeric literal comparable only to stored `N` values and a string
  * literal only to stored `S` values (UTF8String code-point order —
  * the same order [[AttrStats]] ranges in). So:
  *
  *  - `EqualTo`/ranges/`In` prune when the literal's type family has
  *    no stored values in range. With a COMPLETE map, an attribute
  *    absent from the map never occurs at all, so any comparison on
  *    it is UNKNOWN for every item — prunable.
  *  - `StringStartsWith(a, p)` can only be TRUE via a stored S ≥ p
  *    (a string with prefix p is ≥ p in code-point order), so
  *    `sMax < p` prunes.
  *  - Everything null-sensitive or negated (`IsNull`, `IsNotNull`,
  *    `EqualNullSafe`, `Not`, contains/endsWith) conservatively
  *    reports `true`: their truth can rest on absence, which a
  *    min/max range cannot bound.
  *
  * At 100 TB the win is layout-correlation: partition keys whose
  * items share a value locality (a tenant's time range, a device's
  * last-active window) make recent-range predicates skip every
  * retired key's shard without touching it — the Parquet-footer
  * min/max move, applied to the store's shard files.
  */
object ZoneMap {

  /** Could `f` be TRUE for at least one item in a shard with stats
    * `st`? Callers pass each top-level pushed filter separately (they
    * are conjuncts): any conjunct that cannot be true anywhere in the
    * shard prunes it.
    */
  def mayMatch(f: Filter, st: ShardStats): Boolean = f match {
    case _: AlwaysTrue  => true
    case _: AlwaysFalse => false
    case And(l, r)      => mayMatch(l, st) && mayMatch(r, st)
    case Or(l, r)       => mayMatch(l, st) || mayMatch(r, st)
    case EqualTo(a, v)            => cmpMayHold(st, a, v, _ == 0)
    case GreaterThan(a, v)        => cmpMayHold(st, a, v, _ > 0)
    case GreaterThanOrEqual(a, v) => cmpMayHold(st, a, v, _ >= 0)
    case LessThan(a, v)           => cmpMayHold(st, a, v, _ < 0)
    case LessThanOrEqual(a, v)    => cmpMayHold(st, a, v, _ <= 0)
    case In(a, vs) =>
      // TRUE requires some non-null literal to equal a stored value
      vs.exists(v => v != null && cmpMayHold(st, a, v, _ == 0))
    case StringStartsWith(a, p) => st.attrs.get(a) match {
      case Some(as) => as.sMax.exists(AttrStats.sGe(_, p))
      case None     => !st.complete
    }
    // Truth can rest on null/absence or on content a range cannot
    // bound — never prune through these.
    case _ => true
  }

  /** Could `cmp(stored, v) sat ok` hold for some stored value of `a`?
    * Evaluates the literal against the matching type family's range;
    * literal types [[FilterEval.cmp]] cannot compare never hold.
    */
  private def cmpMayHold(st: ShardStats, a: String, v: Any,
      ok: Int => Boolean): Boolean = {
    val as = st.attrs.get(a) match {
      case Some(x) => x
      case None    => return !st.complete // complete map: attr never occurs
    }
    v match {
      case x: String =>
        (as.sMin, as.sMax) match {
          case (Some(lo), Some(hi)) =>
            rangeMayHold(AttrStats.utf8Order.compare(lo, x),
              AttrStats.utf8Order.compare(hi, x), ok)
          case _ => false // no stored strings → UNKNOWN for every item
        }
      case _ =>
        numLit(v) match {
          // an ADD-incremented attribute's FINAL value lies in no
          // recorded range (base + delta) — any numeric comparison
          // may hold
          case Some(_) if as.nOpen => true
          case Some(n) => (as.nMin, as.nMax) match {
            case (Some(lo), Some(hi)) =>
              rangeMayHold(lo.compare(n), hi.compare(n), ok)
            case _ => false // no stored numbers
          }
          // bool/binary/etc literals: Bool compares but is untracked —
          // conservatively assume possible
          case None => true
        }
    }
  }

  /** Given the compare results of the range ENDPOINTS against the
    * literal, could some value inside the range satisfy `ok`? The
    * compare function is monotone over the range, and every sign
    * between `sign(lo ⋄ v)` and `sign(hi ⋄ v)` is attainable (if 0 is
    * between them, some value equals v... only guaranteed for the
    * endpoints themselves — so test only signs the ENDPOINTS exhibit,
    * plus 0 when the endpoints straddle it, which IS sound for the
    * comparisons in play: `>`/`>=` need only the max's sign, `<`/`<=`
    * the min's, and `=` needs 0, attainable only if lo ≤ v ≤ hi — for
    * equality that is exactly "v may be present", the zone-map
    * contract (maps bound presence, they don't certify it).
    */
  private def rangeMayHold(loCmp: Int, hiCmp: Int, ok: Int => Boolean): Boolean =
    ok(loCmp) || ok(hiCmp) || (loCmp < 0 && hiCmp > 0 && ok(0))

  private def numLit(v: Any): Option[BigDecimal] = v match {
    case x: Byte    => Some(BigDecimal(x.toInt))
    case x: Short   => Some(BigDecimal(x.toInt))
    case x: Int     => Some(BigDecimal(x))
    case x: Long    => Some(BigDecimal(x))
    case x: Float   => Some(BigDecimal(x.toDouble))
    case x: Double  => Some(BigDecimal(x))
    case x: java.math.BigDecimal => Some(BigDecimal(x))
    case x: BigDecimal => Some(x)
    case _ => None
  }
}
