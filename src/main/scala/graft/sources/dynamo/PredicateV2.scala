package graft.sources.dynamo

import org.apache.spark.sql.connector.expressions.{Cast => V2Cast, Expression => V2Expr, GeneralScalarExpression, Literal => V2Lit, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse => V2False, AlwaysTrue => V2True, And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.dynamo.ItemJson.Item

/** Spark-4 V2 `Predicate` pushdown surface (`SupportsPushDownV2Filters`)
  * — the generalization of the reference's v1 filter pushdown
  * [REF: connector/FilterPushdown.scala — the accept/translate split
  * being widened to the v2 expression family].
  *
  * Translation is two-tier:
  *
  *  1. Predicates whose shape the v1 `sources.Filter` family can
  *     express exactly (column-vs-literal comparisons, IN, IS [NOT]
  *     NULL, string prefix/suffix/contains, boolean combinations)
  *     translate to v1 filters and ride the existing machinery —
  *     [[FilterEval]] evaluation, point-lookup shard pruning, WAL/CDC
  *     readers — unchanged.
  *  2. Predicates v1 cannot express — comparisons between two COLUMNS
  *     (`price > cost`), and comparisons over arithmetic (`qty * price
  *     > 1000`, with numeric casts) — translate to the serializable
  *     [[VPred]] AST below and are evaluated store-side on the wire
  *     item, pre-decode, with the same Kleene three-valued null
  *     semantics as [[FilterEval]]. Spark does NOT re-evaluate pushed
  *     predicates, so evaluation must match Catalyst exactly:
  *     comparisons use Spark's nan-safe floating compare (NaN largest,
  *     NaN = NaN, -0.0 = 0.0) and UTF8String binary order; arithmetic
  *     runs in the expression's own declared type with ANSI-faithful
  *     overflow (captured from the session at translation time —
  *     ANSI throws like Catalyst's checked ops, legacy wraps in the
  *     JVM primitive domain, which IS Catalyst's legacy behavior).
  *
  * Anything outside both tiers is rejected and stays a Spark-side
  * post-scan filter — declining is always correct.
  */
object PredicateV2 {

  // ---------------------------------------------------------------------
  // Serializable AST for the v2-only (adv) tier
  // ---------------------------------------------------------------------

  /** A value expression evaluated on the wire item; `dt` is the exact
    * Spark type the evaluation domain runs in.
    */
  sealed trait VExpr extends Serializable { def dt: DataType }
  final case class VCol(name: String, dt: DataType) extends VExpr {
    override def toString: String = name
  }
  /** `value` holds the EXTERNAL JVM form (String not UTF8String) so the
    * AST serializes without Spark internals.
    */
  final case class VLit(value: Any, dt: DataType) extends VExpr {
    override def toString: String = value.toString
  }
  /** Numeric→numeric cast; JVM primitive conversion = Spark's own
    * legacy cast lowering, and the translation gate below only admits
    * non-overflowing directions so ANSI and legacy agree.
    */
  final case class VCastE(child: VExpr, dt: DataType) extends VExpr {
    override def toString: String = s"CAST($child AS ${dt.simpleString})"
  }
  /** Binary arithmetic (+ - * and floating /) in type `dt`; `ansi`
    * selects checked (throwing) vs wrapping integral overflow.
    */
  final case class VArith(op: String, l: VExpr, r: VExpr, dt: DataType, ansi: Boolean)
      extends VExpr {
    override def toString: String = s"($l $op $r)"
  }
  final case class VNeg(child: VExpr, dt: DataType, ansi: Boolean) extends VExpr {
    override def toString: String = s"(- $child)"
  }

  sealed trait VPred extends Serializable
  final case class VCmp(op: String, l: VExpr, r: VExpr) extends VPred {
    override def toString: String = s"$l $op $r"
  }
  final case class VAnd(l: VPred, r: VPred) extends VPred {
    override def toString: String = s"($l) AND ($r)"
  }
  final case class VOr(l: VPred, r: VPred) extends VPred {
    override def toString: String = s"($l) OR ($r)"
  }
  final case class VNot(c: VPred) extends VPred {
    override def toString: String = s"NOT ($c)"
  }
  /** A v1-expressible subtree inside a v2-only tree (e.g. one OR arm);
    * evaluation delegates to [[FilterEval]] so the two tiers cannot
    * disagree on shared shapes.
    */
  final case class VWrap(f: Filter) extends VPred {
    override def toString: String = f.toString
  }

  // ---------------------------------------------------------------------
  // Translation: v2 Predicate → Either[v1 Filter, VPred]
  // ---------------------------------------------------------------------

  /** Translate one pushed v2 predicate. Left = exactly expressible as a
    * v1 filter (preferred: feeds shard pruning and the streaming
    * readers); Right = v2-only, evaluated via [[eval]]; None = decline.
    */
  def translate(p: Predicate, schema: StructType, ansi: Boolean): Option[Either[Filter, VPred]] = {
    // A predicate may reference columns that exist in the QUERY but
    // not on the wire — metadata columns (`_shard`/`_size`) being the
    // live case. The store evaluates filters on the wire item, where a
    // missing attribute reads as "doesn't match" — accepting such a
    // push would silently drop every row. Decline; Spark keeps it.
    val known = schema.fieldNames.toSet
    if (!p.references().forall(r =>
        r.fieldNames().length == 1 && known(r.fieldNames().head))) None
    else toV1(p).map(Left(_)).orElse(toAdv(p, schema, ansi).map(Right(_)))
  }

  private def colName(e: V2Expr): Option[String] = e match {
    case f: NamedReference if f.fieldNames().length == 1 => Some(f.fieldNames().head)
    case _ => None
  }

  /** v1 filter values are external JVM values; v2 literals carry
    * Catalyst internals. Dates/timestamps stay as their internal
    * epoch-days/micros numerics — the store holds them as `N` of the
    * same numbers, so [[FilterEval.cmp]] and point-lookup `toAttr`
    * compare them directly.
    */
  private def external(lit: V2Lit[_]): Option[Any] = lit.dataType() match {
    case StringType => Some(if (lit.value == null) null else lit.value.toString)
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | DateType | TimestampType => Some(lit.value)
    case _: DecimalType =>
      Some(if (lit.value == null) null
      else lit.value.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal)
    case _ => None
  }

  /** Column-vs-literal leaf: (col, lit) or flipped (lit, col). */
  private def colLit(children: Array[V2Expr]): Option[(String, Any, Boolean)] =
    children match {
      case Array(c, l: V2Lit[_]) =>
        colName(c).flatMap(n => external(l).map(v => (n, v, false)))
      case Array(l: V2Lit[_], c) =>
        colName(c).flatMap(n => external(l).map(v => (n, v, true)))
      case _ => None
    }

  /** Exact v1 translation, or None. Mirrors (inverted) Spark's own
    * `Filter.toV2` mapping, restricted to what [[FilterEval.supported]]
    * accepts — so every Left result is evaluable by construction.
    */
  def toV1(p: Predicate): Option[Filter] = {
    val name = p.name()
    val ch = p.children()
    val v1: Option[Filter] = name match {
      case "ALWAYS_TRUE"  => Some(AlwaysTrue())
      case "ALWAYS_FALSE" => Some(AlwaysFalse())
      case "AND" =>
        val a = p.asInstanceOf[V2And]
        for (l <- toV1(a.left()); r <- toV1(a.right())) yield And(l, r)
      case "OR" =>
        val o = p.asInstanceOf[V2Or]
        for (l <- toV1(o.left()); r <- toV1(o.right())) yield Or(l, r)
      case "NOT" =>
        toV1(p.asInstanceOf[V2Not].child()).map(Not)
      case "IS_NULL" =>
        ch match { case Array(c) => colName(c).map(IsNull); case _ => None }
      case "IS_NOT_NULL" =>
        ch match { case Array(c) => colName(c).map(IsNotNull); case _ => None }
      case "=" => colLit(ch).map { case (n, v, _) => EqualTo(n, v) }
      case "<=>" => colLit(ch).map { case (n, v, _) => EqualNullSafe(n, v) }
      case "<>" => colLit(ch).map { case (n, v, _) => Not(EqualTo(n, v)) }
      case ">" => colLit(ch).map { case (n, v, flipped) =>
        if (flipped) LessThan(n, v) else GreaterThan(n, v) }
      case ">=" => colLit(ch).map { case (n, v, flipped) =>
        if (flipped) LessThanOrEqual(n, v) else GreaterThanOrEqual(n, v) }
      case "<" => colLit(ch).map { case (n, v, flipped) =>
        if (flipped) GreaterThan(n, v) else LessThan(n, v) }
      case "<=" => colLit(ch).map { case (n, v, flipped) =>
        if (flipped) GreaterThanOrEqual(n, v) else LessThanOrEqual(n, v) }
      case "IN" =>
        if (ch.length >= 2) {
          val vs = ch.tail.map {
            case l: V2Lit[_] => external(l)
            case _ => None
          }
          if (vs.forall(_.isDefined))
            colName(ch.head).map(n => In(n, vs.map(_.get)))
          else None
        } else None
      case "STARTS_WITH" => strPred(ch)(StringStartsWith)
      case "ENDS_WITH"   => strPred(ch)(StringEndsWith)
      case "CONTAINS"    => strPred(ch)(StringContains)
      case _ => None
    }
    v1.filter(FilterEval.supported)
  }

  private def strPred(ch: Array[V2Expr])(mk: (String, String) => Filter): Option[Filter] =
    ch match {
      case Array(c, l: V2Lit[_]) if l.dataType == StringType && l.value != null =>
        colName(c).map(n => mk(n, l.value.toString))
      case _ => None
    }

  // ---- adv tier ----

  private def numeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }
  private def comparable(dt: DataType): Boolean =
    numeric(dt) || dt == StringType || dt == BooleanType ||
      dt == DateType || dt == TimestampType

  /** Casts the adv tier admits: numeric→numeric directions where the
    * JVM conversion is total and ANSI/legacy agree (no integral
    * narrowing, no fractional→integral — those differ between modes).
    */
  private def castOk(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
    case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
    case (IntegerType, LongType | FloatType | DoubleType) => true
    case (LongType, FloatType | DoubleType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  private def toVExpr(e: V2Expr, schema: StructType, ansi: Boolean): Option[VExpr] = e match {
    case f: NamedReference if f.fieldNames().length == 1 =>
      schema.fields.find(_.name == f.fieldNames().head)
        .filter(f => comparable(f.dataType))
        .map(f => VCol(f.name, f.dataType))
    case l: V2Lit[_] if comparable(l.dataType) && l.value != null =>
      external(l).map(VLit(_, l.dataType))
    case c: V2Cast =>
      toVExpr(c.expression(), schema, ansi)
        .filter(ch => castOk(ch.dt, c.dataType()))
        .map(ch => VCastE(ch, c.dataType()))
    case g: GeneralScalarExpression if g.name() == "-" && g.children().length == 1 =>
      toVExpr(g.children()(0), schema, ansi)
        .filter(ch => numeric(ch.dt))
        .map(ch => VNeg(ch, ch.dt, ansi))
    case g: GeneralScalarExpression if Set("+", "-", "*", "/").contains(g.name()) &&
        g.children().length == 2 =>
      for {
        l <- toVExpr(g.children()(0), schema, ansi)
        r <- toVExpr(g.children()(1), schema, ansi)
        if l.dt == r.dt && numeric(l.dt) &&
          // "/" over integral or decimal has mode-dependent zero/rounding
          // semantics; floating division is IEEE in both modes.
          (g.name() != "/" || l.dt == DoubleType || l.dt == FloatType)
      } yield VArith(g.name(), l, r, l.dt, ansi)
    case _ => None
  }

  private def toAdv(p: Predicate, schema: StructType, ansi: Boolean): Option[VPred] = {
    val name = p.name()
    name match {
      case "AND" =>
        val a = p.asInstanceOf[V2And]
        for (l <- toAdvOrV1(a.left(), schema, ansi); r <- toAdvOrV1(a.right(), schema, ansi))
          yield VAnd(l, r)
      case "OR" =>
        val o = p.asInstanceOf[V2Or]
        for (l <- toAdvOrV1(o.left(), schema, ansi); r <- toAdvOrV1(o.right(), schema, ansi))
          yield VOr(l, r)
      case "NOT" =>
        toAdvOrV1(p.asInstanceOf[V2Not].child(), schema, ansi).map(VNot)
      case "=" | "<=>" | "<>" | "<" | "<=" | ">" | ">=" =>
        p.children() match {
          case Array(l, r) =>
            for {
              le <- toVExpr(l, schema, ansi)
              re <- toVExpr(r, schema, ansi)
              if le.dt == re.dt
            } yield VCmp(name, le, re)
          case _ => None
        }
      case _ => None
    }
  }

  /** Inside an adv tree, prefer wrapping a v1-expressible subtree. */
  private def toAdvOrV1(p: Predicate, schema: StructType, ansi: Boolean): Option[VPred] =
    toV1(p).map(VWrap).orElse(toAdv(p, schema, ansi))

  // ---------------------------------------------------------------------
  // Evaluation (Kleene 3-valued; None = UNKNOWN/null)
  // ---------------------------------------------------------------------

  def eval(p: VPred, item: Item): Boolean = eval3(p, item).contains(true)

  private[dynamo] def eval3(p: VPred, item: Item): Option[Boolean] = p match {
    case VWrap(f) => FilterEval.eval3(f, item)
    case VAnd(l, r) => (eval3(l, item), eval3(r, item)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case VOr(l, r) => (eval3(l, item), eval3(r, item)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case VNot(c) => eval3(c, item).map(!_)
    case VCmp("<=>", l, r) =>
      (evalE(l, item), evalE(r, item)) match {
        case (Some(a), Some(b)) => Some(compare(l.dt, a, b) == 0)
        case (None, None)       => Some(true)
        case _                  => Some(false)
      }
    case VCmp(op, l, r) =>
      for (a <- evalE(l, item); b <- evalE(r, item)) yield {
        val c = compare(l.dt, a, b)
        op match {
          case "="  => c == 0
          case "<>" => c != 0
          case "<"  => c < 0
          case "<=" => c <= 0
          case ">"  => c > 0
          case ">=" => c >= 0
        }
      }
  }

  /** Spark's `nanSafeCompareDoubles`: NaN = NaN and greater than
    * everything else; -0.0 = 0.0 (primitive <,> see them equal).
    */
  private def nanSafe(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x.isNaN) { if (y.isNaN) 0 else 1 }
    else if (y.isNaN) -1 else 0

  private def compare(dt: DataType, a: Any, b: Any): Int = dt match {
    case ByteType    => java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case ShortType   => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case IntegerType | DateType =>
      Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType | TimestampType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType =>
      nanSafe(a.asInstanceOf[Float].toDouble, b.asInstanceOf[Float].toDouble)
    case DoubleType  => nanSafe(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case BooleanType =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case StringType =>
      // UTF8String binary order = Catalyst's string comparison
      UTF8String.fromString(a.asInstanceOf[String])
        .compareTo(UTF8String.fromString(b.asInstanceOf[String]))
    case other => throw new IllegalStateException(s"adv compare over $other")
  }

  /** Evaluate a value expression on the wire item. None = null (absent
    * attribute, stored null, or type-mismatched storage — the same
    * cases [[FilterEval]] treats as UNKNOWN).
    */
  /** Typed read of one attribute in the evaluation domain `dt` — the
    * SAME coercion [[eval]] applies to a `VCol` leaf, exposed so the
    * pushed join hashes its equi keys on coerced values (raw stored
    * AttrVals can differ for values the typed compare calls equal,
    * e.g. N(1) vs N(1.0) under LongType).
    */
  private[dynamo] def typedValue(item: Item, name: String, dt: DataType): Option[Any] =
    evalE(VCol(name, dt), item)

  private def evalE(e: VExpr, item: Item): Option[Any] = e match {
    case VLit(v, _) => Some(v)
    case VCol(name, dt) => item.get(name).flatMap {
      case AttrVal.N(n) => dt match {
        case ByteType    => Some(n.toByte)
        case ShortType   => Some(n.toShort)
        case IntegerType | DateType => Some(n.toInt)
        case LongType | TimestampType => Some(n.toLong)
        case FloatType   => Some(n.toFloat)
        case DoubleType  => Some(n.toDouble)
        case _ => None
      }
      case AttrVal.S(s) if dt == StringType => Some(s)
      case AttrVal.Bool(b) if dt == BooleanType => Some(b)
      case _ => None
    }
    case VCastE(ch, to) => evalE(ch, item).map(v => cast(v, to))
    case VNeg(ch, dt, ansi) => evalE(ch, item).map { v =>
      dt match {
        case ByteType  =>
          val x = v.asInstanceOf[Byte]
          if (ansi && x == Byte.MinValue) overflow() else (-x).toByte
        case ShortType =>
          val x = v.asInstanceOf[Short]
          if (ansi && x == Short.MinValue) overflow() else (-x).toShort
        case IntegerType =>
          if (ansi) Math.negateExact(v.asInstanceOf[Int]) else -v.asInstanceOf[Int]
        case LongType =>
          if (ansi) Math.negateExact(v.asInstanceOf[Long]) else -v.asInstanceOf[Long]
        case FloatType  => -v.asInstanceOf[Float]
        case DoubleType => -v.asInstanceOf[Double]
        case other => throw new IllegalStateException(s"negate over $other")
      }
    }
    case VArith(op, l, r, dt, ansi) =>
      for (a <- evalE(l, item); b <- evalE(r, item)) yield arith(op, a, b, dt, ansi)
  }

  private def overflow(): Nothing =
    throw new ArithmeticException(
      "pushed-predicate arithmetic overflow (ANSI mode, matching Spark's own error)")

  private def cast(v: Any, to: DataType): Any = (v, to) match {
    case (x: Byte, ShortType)    => x.toShort
    case (x: Byte, IntegerType)  => x.toInt
    case (x: Byte, LongType)     => x.toLong
    case (x: Byte, FloatType)    => x.toFloat
    case (x: Byte, DoubleType)   => x.toDouble
    case (x: Short, IntegerType) => x.toInt
    case (x: Short, LongType)    => x.toLong
    case (x: Short, FloatType)   => x.toFloat
    case (x: Short, DoubleType)  => x.toDouble
    case (x: Int, LongType)      => x.toLong
    case (x: Int, FloatType)     => x.toFloat
    case (x: Int, DoubleType)    => x.toDouble
    case (x: Long, FloatType)    => x.toFloat
    case (x: Long, DoubleType)   => x.toDouble
    case (x: Float, DoubleType)  => x.toDouble
    case _ => throw new IllegalStateException(s"adv cast $v → $to (gate admits widening only)")
  }

  private def arith(op: String, a: Any, b: Any, dt: DataType, ansi: Boolean): Any =
    dt match {
      case ByteType =>
        val r = iOp(op, a.asInstanceOf[Byte].toInt, b.asInstanceOf[Byte].toInt, ansi = false)
        if (ansi && r.toByte != r) overflow() else r.toByte
      case ShortType =>
        val r = iOp(op, a.asInstanceOf[Short].toInt, b.asInstanceOf[Short].toInt, ansi = false)
        if (ansi && r.toShort != r) overflow() else r.toShort
      case IntegerType => iOp(op, a.asInstanceOf[Int], b.asInstanceOf[Int], ansi)
      case LongType    => lOp(op, a.asInstanceOf[Long], b.asInstanceOf[Long], ansi)
      case FloatType =>
        val (x, y) = (a.asInstanceOf[Float], b.asInstanceOf[Float])
        op match {
          case "+" => x + y; case "-" => x - y; case "*" => x * y; case "/" => x / y
        }
      case DoubleType =>
        val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
        op match {
          case "+" => x + y; case "-" => x - y; case "*" => x * y; case "/" => x / y
        }
      case other => throw new IllegalStateException(s"adv arithmetic over $other")
    }

  private def iOp(op: String, x: Int, y: Int, ansi: Boolean): Int = op match {
    case "+" => if (ansi) try Math.addExact(x, y) catch { case _: ArithmeticException => overflow() } else x + y
    case "-" => if (ansi) try Math.subtractExact(x, y) catch { case _: ArithmeticException => overflow() } else x - y
    case "*" => if (ansi) try Math.multiplyExact(x, y) catch { case _: ArithmeticException => overflow() } else x * y
  }

  private def lOp(op: String, x: Long, y: Long, ansi: Boolean): Long = op match {
    case "+" => if (ansi) try Math.addExact(x, y) catch { case _: ArithmeticException => overflow() } else x + y
    case "-" => if (ansi) try Math.subtractExact(x, y) catch { case _: ArithmeticException => overflow() } else x - y
    case "*" => if (ansi) try Math.multiplyExact(x, y) catch { case _: ArithmeticException => overflow() } else x * y
  }

  /** Column names a VPred references — the adv analogue of
    * `Filter.references`, used only for diagnostics.
    */
  def references(p: VPred): Seq[String] = p match {
    case VWrap(f)   => f.references.toSeq
    case VAnd(l, r) => references(l) ++ references(r)
    case VOr(l, r)  => references(l) ++ references(r)
    case VNot(c)    => references(c)
    case VCmp(_, l, r) => refsE(l) ++ refsE(r)
  }
  private def refsE(e: VExpr): Seq[String] = e match {
    case VCol(n, _)   => Seq(n)
    case VLit(_, _)   => Nil
    case VCastE(c, _) => refsE(c)
    case VNeg(c, _, _)   => refsE(c)
    case VArith(_, l, r, _, _) => refsE(l) ++ refsE(r)
  }
}
