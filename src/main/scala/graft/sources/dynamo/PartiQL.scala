package graft.sources.dynamo

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PartiQL `ExecuteStatement` analogue — the one user-visible DynamoDB
  * query surface with no other counterpart here. A thin TRANSLATOR,
  * not an engine: the statement's DynamoDB PartiQL subset
  * (single-table SELECT / INSERT / UPDATE / DELETE, key conditions,
  * `begins_with`/`contains`/`IN`/`BETWEEN`/`IS [NOT] MISSING`,
  * `ORDER BY`, `?` parameters) maps onto the connector's OWN reads
  * and journal write ops, so a SELECT runs exactly the plan the
  * equivalent DataFrame read would (pushdown, key windows, index
  * serve — all intact) and writes ride the store's atomic conditional
  * ops (`PutIfAbsent` / `UpdateIfExists`), the same machinery the
  * sinks use. Unsupported syntax fails loudly — never a silent
  * approximation. [REF: the service's ExecuteStatement API — its
  * PartiQL dialect is documented as exactly this subset.]
  *
  * Service-semantics notes: INSERT of an existing key reports the
  * DuplicateItemException analogue (and the underlying op is
  * conditional, so even a racing writer cannot make it overwrite);
  * UPDATE/DELETE require the full primary key in WHERE (the service's
  * single-item rule); UPDATE of a missing item reports the
  * ConditionalCheckFailedException analogue; DELETE of a missing item
  * succeeds silently (DeleteItem semantics). SELECT materializes on
  * the driver — ExecuteStatement is the service's OLTP surface
  * (bounded pages), not the analytics path; unbounded scans belong on
  * the DataFrame read.
  */
object PartiQL {
  import ItemJson.Item

  // ---- AST ----

  sealed trait Cond
  final case class Cmp(attr: String, op: String, v: AttrVal) extends Cond
  final case class Between(attr: String, lo: AttrVal, hi: AttrVal) extends Cond
  final case class InList(attr: String, vs: Seq[AttrVal]) extends Cond
  /** `begins_with(attr, v)` / `contains(attr, v)`. */
  final case class FnCond(fn: String, attr: String, v: AttrVal) extends Cond
  final case class Missing(attr: String, negated: Boolean) extends Cond

  sealed trait Stmt
  final case class Select(table: String, index: Option[String],
      projection: Option[Seq[String]], where: Seq[Cond],
      orderBy: Seq[(String, Boolean)]) extends Stmt
  final case class Insert(table: String, item: Item) extends Stmt
  final case class Update(table: String, sets: Seq[(String, AttrVal)],
      removes: Seq[String], where: Seq[Cond]) extends Stmt
  final case class Delete(table: String, where: Seq[Cond]) extends Stmt

  // ---- entry point ----

  def execute(root: String, statement: String, params: Seq[AttrVal])
      : (StructType, Array[InternalRow]) = {
    val stmt = parse(statement, params)
    val store = new LocalKVStore(root)
    val table = stmt match {
      case s: Select => s.table
      case i: Insert => i.table
      case u: Update => u.table
      case d: Delete => d.table
    }
    require(store.exists(table), s"PartiQL: table '$table' does not exist")
    store.assertNotRestorePending(table)
    stmt match {
      case sel: Select => runSelect(root, sel)
      case Insert(t, item) =>
        val meta = store.describe(t)
        val keyAttrs = Seq(meta.hashKey) ++ meta.rangeKey
        keyAttrs.foreach(k => require(item.contains(k),
          s"PartiQL INSERT: item must carry key attribute '$k'"))
        val key: Item = keyAttrs.map(k => k -> item(k)).toMap
        // loud duplicate report (the DuplicateItemException analogue);
        // the op itself is CONDITIONAL, so even a writer racing this
        // check can never be overwritten — worst case the race loses
        // the error report, never data (A14's millisecond window)
        require(store.transactGet(t, Seq(key)).head.isEmpty,
          s"PartiQL INSERT: an item with the same key already exists " +
            s"in '$t' (the service's DuplicateItemException)")
        store.appendWal(t, System.currentTimeMillis(), "partiql",
          Seq(store.PutIfAbsent(item)))
        opRow("INSERT", t)
      case Update(t, sets, removes, where) =>
        val meta = store.describe(t)
        val key = keyEqWhere(meta, where, "UPDATE")
        val keyAttrs = Set(meta.hashKey) ++ meta.rangeKey
        (sets.map(_._1) ++ removes).foreach(a => require(!keyAttrs(a),
          s"PartiQL UPDATE: cannot SET/REMOVE key attribute '$a' " +
            "(the service's ValidationException — write a new item instead)"))
        require(store.transactGet(t, Seq(key)).head.nonEmpty,
          s"PartiQL UPDATE: no item with the specified key in '$t' " +
            "(the service's ConditionalCheckFailedException analogue)")
        // one journal append = one atomic publish; UpdateIfExists
        // merges the SETs only into a live item, RemoveAttrs drops the
        // REMOVEd attributes (replay applies them in order)
        val ops = Seq.newBuilder[store.Op]
        if (sets.nonEmpty) ops += store.UpdateIfExists(key ++ sets.toMap)
        if (removes.nonEmpty)
          ops += store.RemoveAttrs(key ++ removes.map(_ -> (AttrVal.Null: AttrVal)).toMap)
        store.appendWal(t, System.currentTimeMillis(), "partiql", ops.result())
        opRow("UPDATE", t)
      case Delete(t, where) =>
        val meta = store.describe(t)
        val key = keyEqWhere(meta, where, "DELETE")
        store.appendWal(t, System.currentTimeMillis(), "partiql",
          Seq(store.Delete(key)))
        opRow("DELETE", t)
    }
  }

  private def runSelect(root: String, sel: Select)
      : (StructType, Array[InternalRow]) = {
    val spark = SparkSession.active
    var rd = spark.read.format("dynamo")
      .option("path", root).option("tableName", sel.table)
    sel.index.foreach(ix => rd = rd.option("indexName", ix))
    var df = rd.load()
    sel.where.foreach(c => df = df.filter(cond2col(c)))
    sel.projection.foreach(p => df = df.select(p.map(col): _*))
    if (sel.orderBy.nonEmpty)
      df = df.orderBy(sel.orderBy.map { case (a, asc) =>
        if (asc) col(a).asc else col(a).desc }: _*)
    (df.schema, df.queryExecution.executedPlan.executeCollect().map(_.copy()))
  }

  private def opRow(op: String, table: String)
      : (StructType, Array[InternalRow]) = (
    StructType(Seq(
      StructField("op", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("applied", BooleanType, nullable = false))),
    Array[InternalRow](new GenericInternalRow(Array[Any](
      UTF8String.fromString(op), UTF8String.fromString(table), true))))

  /** UPDATE/DELETE target exactly one item: WHERE must be equality
    * conjuncts naming the full primary key, nothing else (the
    * service's own single-item rule for PartiQL writes).
    */
  private def keyEqWhere(meta: TableMeta, where: Seq[Cond], what: String): Item = {
    val eqs = where.map {
      case Cmp(a, "=", v) => a -> v
      case other => throw new IllegalArgumentException(
        s"PartiQL $what: WHERE accepts only primary-key equalities, got $other")
    }
    val m = eqs.toMap
    require(m.size == eqs.size, s"PartiQL $what: WHERE names an attribute twice")
    val expect = Set(meta.hashKey) ++ meta.rangeKey
    require(m.keySet == expect,
      s"PartiQL $what: WHERE must name exactly the full primary key " +
        s"(${expect.mkString(", ")}), got (${m.keySet.mkString(", ")})")
    m
  }

  // ---- condition → Column (the read path IS the DataFrame read) ----

  private def rawLit(v: AttrVal): Any = v match {
    case AttrVal.S(s) => s
    case AttrVal.N(n) => if (n.isWhole && n.isValidLong) n.toLong else n.bigDecimal
    case AttrVal.Bool(b) => b
    case AttrVal.B(b) => b
    case AttrVal.Null => null
    case other => throw new IllegalArgumentException(
      s"PartiQL: unsupported literal in a condition: $other")
  }
  private def sparkLit(v: AttrVal): Column = lit(rawLit(v))

  private def cond2col(c: Cond): Column = c match {
    case Cmp(a, "=", v) => col(a) === sparkLit(v)
    case Cmp(a, "<>", v) => col(a) =!= sparkLit(v)
    case Cmp(a, "<", v) => col(a) < sparkLit(v)
    case Cmp(a, "<=", v) => col(a) <= sparkLit(v)
    case Cmp(a, ">", v) => col(a) > sparkLit(v)
    case Cmp(a, ">=", v) => col(a) >= sparkLit(v)
    case Cmp(a, op, _) => throw new IllegalArgumentException(
      s"PartiQL: unsupported comparison '$op' on '$a'")
    case Between(a, lo, hi) => col(a) >= sparkLit(lo) && col(a) <= sparkLit(hi)
    case InList(a, vs) => col(a).isin(vs.map(rawLit): _*)
    case FnCond("begins_with", a, AttrVal.S(p)) => col(a).startsWith(p)
    case FnCond("contains", a, AttrVal.S(s)) => col(a).contains(s)
    case FnCond(fn, a, v) => throw new IllegalArgumentException(
      s"PartiQL: $fn('$a', $v) requires a string argument")
    case Missing(a, false) => col(a).isNull
    case Missing(a, true) => col(a).isNotNull
  }

  // ---- parser (recursive descent over the DynamoDB PartiQL subset) --

  def parse(statement: String, params: Seq[AttrVal]): Stmt = {
    val p = new P(statement, params)
    val stmt =
      if (p.tryKw("SELECT")) p.select()
      else if (p.tryKw("INSERT")) p.insert()
      else if (p.tryKw("UPDATE")) p.update()
      else if (p.tryKw("DELETE")) p.delete()
      else p.fail("expected SELECT, INSERT, UPDATE or DELETE")
    p.ws()
    if (p.tryChar(';')) p.ws()
    if (!p.eof) p.fail("trailing content after statement")
    require(p.paramIdx == params.size,
      s"PartiQL: statement uses ${p.paramIdx} parameter(s) but ${params.size} were supplied")
    stmt
  }

  private final class P(s: String, params: Seq[AttrVal]) {
    var pos = 0
    var paramIdx = 0
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"PartiQL: $msg at position $pos in: $s")
    def ws(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def eof: Boolean = pos >= s.length
    private def identChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    def tryKw(kw: String): Boolean = {
      ws()
      val end = pos + kw.length
      if (end <= s.length && s.regionMatches(true, pos, kw, 0, kw.length) &&
          (end == s.length || !identChar(s.charAt(end)))) { pos = end; true }
      else false
    }
    def kw(k: String): Unit = if (!tryKw(k)) fail(s"expected $k")
    def tryChar(c: Char): Boolean = {
      ws(); if (pos < s.length && s.charAt(pos) == c) { pos += 1; true } else false
    }
    def ch(c: Char): Unit = if (!tryChar(c)) fail(s"expected '$c'")

    /** Bare or double-quoted identifier (PartiQL quotes table names). */
    def ident(): String = {
      ws()
      if (pos < s.length && s.charAt(pos) == '"') {
        pos += 1
        val start = pos
        while (pos < s.length && s.charAt(pos) != '"') pos += 1
        if (eof) fail("unterminated quoted identifier")
        val r = s.substring(start, pos); pos += 1; r
      } else {
        val start = pos
        while (pos < s.length && identChar(s.charAt(pos))) pos += 1
        if (pos == start) fail("expected an identifier")
        s.substring(start, pos)
      }
    }

    /** `'single-quoted'` with `''` escaping — PartiQL string literals. */
    private def strLit(): String = {
      ch('\'')
      val b = new StringBuilder
      var done = false
      while (!done) {
        if (eof) fail("unterminated string literal")
        val c = s.charAt(pos)
        if (c == '\'') {
          if (pos + 1 < s.length && s.charAt(pos + 1) == '\'') { b.append('\''); pos += 2 }
          else { pos += 1; done = true }
        } else { b.append(c); pos += 1 }
      }
      b.toString()
    }

    private def numLit(): BigDecimal = {
      ws()
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.' ||
        s.charAt(pos) == 'e' || s.charAt(pos) == 'E' ||
        ((s.charAt(pos) == '-' || s.charAt(pos) == '+') &&
          (s.charAt(pos - 1) == 'e' || s.charAt(pos - 1) == 'E')))) pos += 1
      try BigDecimal(s.substring(start, pos))
      catch { case _: NumberFormatException => fail("expected a number") }
    }

    def value(): AttrVal = {
      ws()
      if (eof) fail("expected a value")
      s.charAt(pos) match {
        case '\'' => AttrVal.S(strLit())
        case '?' =>
          pos += 1
          if (paramIdx >= params.size)
            fail(s"statement has more ? placeholders than the ${params.size} parameter(s) supplied")
          val v = params(paramIdx); paramIdx += 1; v
        case '[' =>
          pos += 1
          val b = Vector.newBuilder[AttrVal]
          if (!tryChar(']')) {
            var done = false
            while (!done) { b += value(); if (!tryChar(',')) { ch(']'); done = true } }
          }
          AttrVal.L(b.result())
        case '{' => AttrVal.M(tuple())
        case c if c == '-' || c == '+' || c.isDigit => AttrVal.N(numLit())
        case _ =>
          if (tryKw("TRUE")) AttrVal.Bool(true)
          else if (tryKw("FALSE")) AttrVal.Bool(false)
          else if (tryKw("NULL")) AttrVal.Null
          else fail("expected a literal value, ?, [list] or {tuple}")
      }
    }

    /** PartiQL tuple literal: `{'attr': value, ...}` (INSERT's VALUE). */
    def tuple(): Map[String, AttrVal] = {
      ch('{')
      val b = Map.newBuilder[String, AttrVal]
      if (tryChar('}')) return b.result()
      var done = false
      while (!done) {
        val k = { ws(); if (pos < s.length && s.charAt(pos) == '\'') strLit() else ident() }
        ch(':')
        b += k -> value()
        if (!tryChar(',')) { ch('}'); done = true }
      }
      b.result()
    }

    private def cmpOp(): String = {
      ws()
      val two = if (pos + 2 <= s.length) s.substring(pos, pos + 2) else ""
      if (two == "<>" || two == "<=" || two == ">=") { pos += 2; two }
      else if (two == "!=") { pos += 2; "<>" }
      else if (pos < s.length && "=<>".contains(s.charAt(pos))) {
        val c = s.charAt(pos).toString; pos += 1; c
      } else fail("expected a comparison operator")
    }

    def cond(): Cond = {
      val fn =
        if (tryKw("begins_with")) Some("begins_with")
        else if (tryKw("contains")) Some("contains")
        else None
      if (fn.isDefined) {
        ch('('); val a = ident(); ch(','); val v = value(); ch(')')
        FnCond(fn.get, a, v)
      } else {
        val a = ident()
        if (tryKw("IS")) {
          val neg = tryKw("NOT"); kw("MISSING"); Missing(a, neg)
        } else if (tryKw("BETWEEN")) {
          val lo = value(); kw("AND"); Between(a, lo, value())
        } else if (tryKw("IN")) {
          ch('(')
          val b = Vector.newBuilder[AttrVal]
          var done = false
          while (!done) { b += value(); if (!tryChar(',')) { ch(')'); done = true } }
          InList(a, b.result())
        } else Cmp(a, cmpOp(), value())
      }
    }

    def condAnd(): Seq[Cond] = {
      val b = Vector.newBuilder[Cond]
      b += cond()
      while (tryKw("AND")) b += cond()
      b.result()
    }

    def select(): Select = {
      val proj = if (tryChar('*')) None else {
        val b = Vector.newBuilder[String]
        b += ident()
        while (tryChar(',')) b += ident()
        Some(b.result())
      }
      kw("FROM")
      val t = ident()
      val ix = if (tryChar('.')) Some(ident()) else None
      val where = if (tryKw("WHERE")) condAnd() else Nil
      val order = if (tryKw("ORDER")) {
        kw("BY")
        val b = Vector.newBuilder[(String, Boolean)]
        var done = false
        while (!done) {
          val a = ident()
          val asc = if (tryKw("DESC")) false else { tryKw("ASC"); true }
          b += a -> asc
          if (!tryChar(',')) done = true
        }
        b.result()
      } else Nil
      Select(t, ix, proj, where, order)
    }

    def insert(): Insert = {
      kw("INTO")
      val t = ident()
      kw("VALUE")
      Insert(t, tuple())
    }

    def update(): Update = {
      val t = ident()
      val sets = Vector.newBuilder[(String, AttrVal)]
      val removes = Vector.newBuilder[String]
      var any = false
      var cont = true
      while (cont) {
        if (tryKw("SET")) {
          any = true
          var more = true
          while (more) {
            val a = ident(); ch('='); sets += a -> value()
            more = tryChar(',')
          }
        } else if (tryKw("REMOVE")) {
          any = true
          var more = true
          while (more) { removes += ident(); more = tryChar(',') }
        } else cont = false
      }
      if (!any) fail("UPDATE requires at least one SET or REMOVE clause")
      kw("WHERE")
      Update(t, sets.result(), removes.result(), condAnd())
    }

    def delete(): Delete = {
      kw("FROM")
      val t = ident()
      kw("WHERE")
      Delete(t, condAnd())
    }
  }
}
