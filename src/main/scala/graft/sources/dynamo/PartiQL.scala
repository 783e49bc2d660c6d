package graft.sources.dynamo

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.{col, length, lit, try_element_at, when}
import org.apache.spark.sql.types.{BinaryType, BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PartiQL `ExecuteStatement` analogue — the one user-visible DynamoDB
  * query surface with no other counterpart here. A thin TRANSLATOR,
  * not an engine: the statement's DynamoDB PartiQL subset maps onto
  * the connector's OWN reads and journal write ops, so a SELECT runs
  * exactly the plan the equivalent DataFrame read would (pushdown,
  * key windows, index serve — all intact) and writes ride the store's
  * atomic conditional ops (`PutIfAbsent` / `UpdateIfExists`), the
  * same machinery the sinks use. Unsupported syntax fails loudly —
  * never a silent approximation. [REF: the service's ExecuteStatement
  * API — its PartiQL dialect is documented as exactly this subset.]
  *
  * SCOPE vs the service's documented grammar (the conformance-sweep
  * spec walks this list production by production):
  *   - SELECT: `*` or attribute-path projection, `FROM table[.index]`
  *     (bare or double-quoted identifiers), WHERE, multi-key ORDER BY
  *     ASC/DESC, `?` parameters. Limit/ConsistentRead/NextToken are
  *     API parameters beside the statement, like the service.
  *   - WHERE conditions: `= <> < <= > >=`, `BETWEEN`, `IN`,
  *     `begins_with`, `contains`, `size()`, `attribute_type()`,
  *     `IS [NOT] MISSING`, full `AND`/`OR`/`NOT` + parentheses,
  *     nested document paths (`a.b`, `l[2]`, mixed).
  *   - INSERT: `INTO table VALUE {tuple}` — one item (the grammar has
  *     no VALUES list and no INSERT..SELECT).
  *   - UPDATE: repeated `SET path = literal` / `REMOVE path` clauses,
  *     `SET l = list_append(l, v)` / `list_append(v, l)` (the
  *     same-path forms — reading ANOTHER path has no single-item
  *     conditional edit and is rejected loudly), key-equality WHERE,
  *     `RETURNING ALL|MODIFIED OLD|NEW *` (UpdateItem's four
  *     ReturnValues). The value side is a LITERAL: the grammar has no
  *     arithmetic, attribute references, or set_add/set_delete (sets
  *     decode as L here).
  *   - DELETE: key-equality WHERE, `RETURNING ALL OLD *` only.
  *   - execute_transaction: `;`-separated all-read or all-write list,
  *     plus `[NOT] EXISTS (SELECT * FROM t WHERE ...)` condition
  *     checks (transactions-only, like the service; EXISTS carries
  *     extra attribute conditions, NOT EXISTS is key-only absence).
  *   - execute_batch: `;`-separated independent statements with
  *     per-statement error slots; EXISTS rejected per-statement.
  *   - OUT OF SCOPE, loud: LIMIT keyword, multi-table FROM, JOIN,
  *     GROUP BY, aggregates, DISTINCT, subqueries outside EXISTS,
  *     native-UpdateExpression spellings (`attribute_exists`, `ADD`,
  *     arithmetic), set literals/functions (`<<..>>`, set_add).
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
  *
  * Known divergence — `IS MISSING` vs stored `NULL`: the service
  * distinguishes an ABSENT attribute (MISSING) from one present with
  * the NULL type. The connector's relational decode deliberately
  * conflates the two (`Codec.scala` maps both to SQL NULL — a
  * DataFrame column has no third state), so `IS [NOT] MISSING` here
  * translates to `isNull`/`isNotNull` and items carrying an explicit
  * NULL-typed attribute match `IS MISSING` where the service would
  * not. Intentional and bounded: the same conflation governs every
  * read path (scans, filters, oracles), so PartiQL agrees with the
  * equivalent DataFrame read — the invariant this translator pins.
  */
object PartiQL {
  import ItemJson.Item

  // ---- AST ----

  /** Attribute reference: a top-level name plus optional nested
    * document segments — M fields (`a.b`) and L indices (`l[2]`),
    * freely mixed (`a.b[3].c`). `simple` = a plain top-level attr,
    * the only shape key conditions and write targets accept where
    * the service requires one.
    */
  final case class DocPath(head: String,
      segs: Seq[Either[String, Int]] = Nil) {
    def simple: Boolean = segs.isEmpty
    def render: String = head + segs.map {
      case Left(f)  => "." + f
      case Right(i) => s"[$i]"
    }.mkString
    /** The store-op path shape (top attr + segments). */
    def full: Seq[Either[String, Int]] = Left(head) +: segs
  }
  object DocPath {
    /** Source-compat: a bare string is a simple top-level path. */
    import scala.language.implicitConversions
    implicit def fromString(a: String): DocPath = DocPath(a)
  }

  sealed trait Cond
  final case class Cmp(attr: DocPath, op: String, v: AttrVal) extends Cond
  final case class Between(attr: DocPath, lo: AttrVal, hi: AttrVal) extends Cond
  final case class InList(attr: DocPath, vs: Seq[AttrVal]) extends Cond
  /** `begins_with(attr, v)` / `contains(attr, v)`. */
  final case class FnCond(fn: String, attr: DocPath, v: AttrVal) extends Cond
  /** `size(attr) <op> n` — the service's size() condition function:
    * string length in characters, binary length in bytes, element
    * count for lists/maps (the decoded M is a struct; its size is the
    * count of PRESENT fields, matching the per-item map entry count).
    */
  final case class SizeCmp(attr: DocPath, op: String, v: AttrVal) extends Cond
  /** `attribute_type(attr, 'S'|'N'|'BOOL'|'B'|'L'|'M')` — true when
    * the attribute exists with that wire type. Post-decode a column
    * has ONE static type, so this is `isNotNull` when the decoded type
    * matches the tag and constant-false otherwise; the set tags
    * (SS/NS/BS decode as L) and 'NULL' (indistinguishable from
    * MISSING after decode — the documented IS MISSING conflation)
    * are rejected loudly.
    */
  final case class AttrType(attr: DocPath, tag: String) extends Cond
  final case class Missing(attr: DocPath, negated: Boolean) extends Cond
  /** Boolean structure (the service's PartiQL accepts full boolean
    * WHERE expressions): parsed with standard precedence
    * (NOT > AND > OR, parentheses group); top-level ANDs are
    * flattened back into the conjunct list, so pure-conjunct
    * statements keep their exact previous shape (and the write
    * paths' key-equality rule keeps rejecting anything else loudly).
    */
  final case class OrCond(l: Cond, r: Cond) extends Cond
  final case class AndCond(l: Cond, r: Cond) extends Cond
  final case class NotCond(c: Cond) extends Cond

  sealed trait Stmt
  final case class Select(table: String, index: Option[String],
      projection: Option[Seq[DocPath]], where: Seq[Cond],
      orderBy: Seq[(DocPath, Boolean)]) extends Stmt
  final case class Insert(table: String, item: Item) extends Stmt
  /** `returning`: `Some("OLD")`/`Some("NEW")` for `RETURNING ALL
    * OLD|NEW *`, `Some("MOD_OLD")`/`Some("MOD_NEW")` for `RETURNING
    * MODIFIED OLD|NEW *` (the service's UpdateItem ReturnValues
    * surface — ALL_OLD/ALL_NEW/UPDATED_OLD/UPDATED_NEW — in PartiQL
    * spelling); DELETE supports ALL OLD only, INSERT none.
    */
  /** `appends`: `SET l = list_append(l, v)` clauses — (target path,
    * list operand, true = append at end / false = prepend). The
    * target must be one of list_append's own operands (the service's
    * read-elsewhere-write-here form `SET a = list_append(b, v)` has
    * no single-path conditional edit and is rejected loudly).
    */
  final case class Update(table: String, sets: Seq[(DocPath, AttrVal)],
      removes: Seq[DocPath], where: Seq[Cond],
      returning: Option[String] = None,
      appends: Seq[(DocPath, AttrVal, Boolean)] = Nil) extends Stmt
  final case class Delete(table: String, where: Seq[Cond],
      returning: Option[String] = None) extends Stmt
  /** `[NOT] EXISTS (SELECT * FROM t WHERE ...)` — the service's
    * transaction ConditionCheck in PartiQL spelling, valid ONLY inside
    * `execute_transaction` (the service rejects it in
    * ExecuteStatement and BatchExecuteStatement). EXISTS requires the
    * keyed item to exist AND satisfy any extra WHERE conditions at
    * publish time (evaluated atomically with the commit); NOT EXISTS
    * asserts absence (key-only WHERE — the service's
    * attribute_not_exists-on-the-key shape). A failed check cancels
    * the whole transaction with nothing staged anywhere.
    */
  final case class ExistsCheck(sel: Select, negated: Boolean) extends Stmt

  /** Navigate a document path over a concrete item (None = the path
    * doesn't exist — MISSING on the service).
    */
  private def lookupPath(it: Item, p: DocPath): Option[AttrVal] =
    p.segs.foldLeft(it.get(p.head)) {
      case (Some(AttrVal.M(m)), Left(f))  => m.get(f)
      case (Some(AttrVal.L(l)), Right(i)) => l.lift(i)
      case _ => None
    }

  /** Top-level AND conjuncts of a parsed WHERE tree. */
  private def flattenAnd(c: Cond): Seq[Cond] = c match {
    case AndCond(l, r) => flattenAnd(l) ++ flattenAnd(r)
    case other => Seq(other)
  }

  // ---- entry point ----

  /** Per-call writer id: two concurrent statements landing in the
    * same millisecond would otherwise target the SAME journal file
    * name (seq + writerId + shard) and overwrite each other's ops —
    * the service has no such collision, so neither may we.
    */
  private def writerId(): String =
    "partiql-" + java.util.UUID.randomUUID().toString.take(8)

  /** `limit`/`consistentRead` are the ExecuteStatement API's own
    * request parameters (they sit beside the statement, not in it —
    * PartiQL has no LIMIT keyword and no consistency syntax): both
    * apply to SELECT only and fail loudly on writes, like the
    * service's validation. ConsistentRead on a GSI read keeps the
    * connector's own GSI rejection.
    */
  /** Service page bound: ExecuteStatement returns at most ~1 MB of
    * items per call, with a NextToken to resume.
    */
  val PageBytes: Int = 1 << 20

  def execute(root: String, statement: String, params: Seq[AttrVal],
      limit: Option[Int] = None, consistentRead: Boolean = false,
      nextToken: Option[String] = None, pageBytes: Int = PageBytes)
      : (StructType, Array[InternalRow]) =
    executeOne(root, parse(statement, params), limit, consistentRead,
      nextToken, pageBytes)

  private def executeOne(root: String, stmt: Stmt,
      limit: Option[Int] = None, consistentRead: Boolean = false,
      nextToken: Option[String] = None, pageBytes: Int = PageBytes)
      : (StructType, Array[InternalRow]) = {
    if (!stmt.isInstanceOf[Select]) {
      require(limit.isEmpty,
        "PartiQL: the Limit parameter applies to SELECT statements only")
      require(!consistentRead,
        "PartiQL: the ConsistentRead parameter applies to SELECT " +
          "statements only")
      require(nextToken.isEmpty,
        "PartiQL: the NextToken parameter applies to SELECT " +
          "statements only")
    }
    val store = new LocalKVStore(root)
    val table = stmt match {
      case s: Select => s.table
      case i: Insert => i.table
      case u: Update => u.table
      case d: Delete => d.table
      case _: ExistsCheck => throw new IllegalArgumentException(
        "PartiQL: EXISTS is valid only in execute_transaction (the " +
          "service's ConditionCheck — it rejects EXISTS in " +
          "ExecuteStatement and BatchExecuteStatement)")
    }
    require(store.exists(table), s"PartiQL: table '$table' does not exist")
    store.assertNotRestorePending(table)
    stmt match {
      // unreachable: the table extraction above already threw
      case _: ExistsCheck => throw new IllegalStateException("unreachable")
      case sel: Select =>
        runSelect(root, store, sel, limit, consistentRead, nextToken, pageBytes)
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
        store.appendWal(t, System.currentTimeMillis(), writerId(),
          Seq(store.PutIfAbsent(item)))
        opRow("INSERT", t)
      case Update(t, sets, removes, where, returning, appends) =>
        val meta = store.describe(t)
        val key = keyEqWhere(meta, where, "UPDATE")
        val keyAttrs = Set(meta.hashKey) ++ meta.rangeKey
        (sets.map(_._1) ++ removes ++ appends.map(_._1)).foreach(a =>
          require(!keyAttrs(a.head),
            s"PartiQL UPDATE: cannot SET/REMOVE key attribute '${a.head}' " +
              "(the service's ValidationException — write a new item instead)"))
        val cur = store.transactGet(t, Seq(key)).head.getOrElse(
          throw new IllegalArgumentException(
            s"PartiQL UPDATE: no item with the specified key in '$t' " +
              "(the service's ConditionalCheckFailedException analogue)"))
        val (edits, newImgFn) =
          updateOps(store, key, sets, removes, appends, Some(cur))
        // one journal append = one atomic publish; ALL ops are
        // conditional on the item existing AT REPLAY ORDER, so a
        // DELETE racing the advisory existence check above can only
        // lose the error report, never resurrect the item (an
        // unconditional RemoveAttrs would upsert a key-only phantom)
        store.appendWal(t, System.currentTimeMillis(), writerId(), edits)
        returning match {
          case None => opRow("UPDATE", t)
          case Some("OLD") => opRowWithItem("UPDATE", t, Some(cur))
          // NEW image derived from the same read the existence check
          // used — the merge the conditional replay applies (A14's
          // millisecond race window, like the read itself)
          case Some("NEW") => opRowWithItem("UPDATE", t, Some(newImgFn(cur)))
          // MODIFIED = UpdateItem's UPDATED_OLD/UPDATED_NEW: only the
          // top-level attributes this statement touched (a nested
          // edit returns its whole top-level attribute, the service's
          // shape); a REMOVEd attribute is naturally absent from the
          // NEW side, and a SET of a previously-absent one from OLD
          case Some(mod @ ("MOD_OLD" | "MOD_NEW")) =>
            val touched = (sets.map(_._1.head) ++ removes.map(_.head) ++
              appends.map(_._1.head)).toSet
            val img = if (mod == "MOD_OLD") cur else newImgFn(cur)
            opRowWithItem("UPDATE", t,
              Some(img.filter { case (k, _) => touched(k) }))
          case Some(other) => throw new IllegalStateException(
            s"PartiQL UPDATE: unknown returning marker '$other' — the " +
              "parser and this match drifted (fail loudly, never serve " +
              "a guessed image)")
        }
      case Delete(t, where, returning) =>
        val meta = store.describe(t)
        val key = keyEqWhere(meta, where, "DELETE")
        // capture the OLD image before the marker lands (absent item =
        // null, like the service's empty Attributes)
        val old = if (returning.isDefined)
          store.transactGet(t, Seq(key)).head else None
        store.appendWal(t, System.currentTimeMillis(), writerId(),
          Seq(store.Delete(key)))
        if (returning.isDefined) opRowWithItem("DELETE", t, old)
        else opRow("DELETE", t)
    }
  }

  private def opRowWithItem(op: String, table: String, item: Option[Item])
      : (StructType, Array[InternalRow]) = (
    StructType(Seq(
      StructField("op", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("applied", BooleanType, nullable = false),
      StructField("item", StringType, nullable = true))),
    Array[InternalRow](new GenericInternalRow(Array[Any](
      UTF8String.fromString(op), UTF8String.fromString(table), true,
      item.map(it => UTF8String.fromString(ItemJson.write(it))).orNull))))

  /** The service's `ExecuteTransaction` analogue: a `;`-separated list
    * of INSERT/UPDATE/DELETE statements applied ALL-OR-NOTHING through
    * the store's cross-table transaction commit (one `-sall` journal
    * publish per table + the atomic marker set — the same machinery
    * `TransactWriteItems` parity already uses). Per-statement
    * conditions become transaction checks, so failures CANCEL the
    * whole transaction with nothing staged anywhere (the service's
    * TransactionCanceledException): INSERT carries an Absent(key)
    * check (duplicate cancels), UPDATE an Exists(key) check (missing
    * item cancels), DELETE is unconditional (DeleteItem semantics).
    * An ALL-SELECT list is the service's read-only transaction
    * (TransactGetItems): full-primary-key point reads served from ONE
    * cross-table-consistent snapshot (`transactGetMulti`), each item
    * returned in the wire shape (`stmt`, `table`, `item` JSON; null
    * item = absent). Mixing reads and writes is rejected — the
    * service's all-read-or-all-write rule. Capped at 100 statements,
    * the service's bound.
    */
  def executeTransaction(root: String, statements: String,
      params: Seq[AttrVal]): (StructType, Array[InternalRow]) = {
    val stmts = parseMulti(statements, params)
    require(stmts.nonEmpty, "PartiQL: empty transaction")
    require(stmts.size <= 100,
      "PartiQL: a transaction is capped at 100 statements (the " +
        "service's TransactWriteItems bound)")
    val store = new LocalKVStore(root)
    // READ-ONLY transaction (the service allows all-SELECT or
    // all-write, never mixed): every statement a full-primary-key
    // point SELECT → one cross-table-CONSISTENT snapshot read
    // (transactGetMulti's fingerprint-fenced pass), items returned in
    // the wire shape. Mixed statements fall through to the write path
    // below, whose Select case rejects them loudly.
    if (stmts.forall(_.isInstanceOf[Select])) {
      val sels = stmts.map(_.asInstanceOf[Select])
      val keyed = sels.map { sel =>
        require(sel.index.isEmpty && sel.orderBy.isEmpty,
          "PartiQL read transaction: index reads and ORDER BY are not " +
            "supported (point reads by full primary key only)")
        require(store.exists(sel.table),
          s"PartiQL: table '${sel.table}' does not exist")
        store.assertNotRestorePending(sel.table)
        val meta = store.describe(sel.table)
        sel.table -> keyEqWhere(meta, sel.where, "read-transaction SELECT")
      }
      val got = store.transactGetMulti(
        keyed.map { case (t, k) => t -> Seq(k) })
      val schema = StructType(Seq(
        StructField("stmt", IntegerType, nullable = false),
        StructField("table", StringType, nullable = false),
        StructField("item", StringType, nullable = true)))
      val rows = keyed.zip(got).zipWithIndex.map {
        case (((t, _), items), i) =>
          val found = items.head.map { it =>
            val proj: Item = sels(i).projection match {
              // document paths navigate the stored item (the service's
              // ProjectionExpression); missing/dead paths just drop
              case Some(cols) => cols.flatMap(p =>
                lookupPath(it, p).map(v =>
                  (if (p.simple) p.head else p.render) -> v)).toMap
              case None => it
            }
            UTF8String.fromString(ItemJson.write(proj))
          }.orNull
          new GenericInternalRow(Array[Any](
            i, UTF8String.fromString(t), found)): InternalRow
      }
      return (schema, rows.toArray)
    }
    // one (table, ops, check) slice per statement, in statement order
    final case class Slice(table: String, ops: Seq[store.Op],
        check: Option[TxnCheck], op: String, key: Item)
    val slices = stmts.map {
      case _: Select => throw new IllegalArgumentException(
        "PartiQL: SELECT cannot mix with writes in execute_transaction " +
          "(the service's rule: a transaction is all-read or all-write)")
      case Insert(t, item) =>
        require(store.exists(t), s"PartiQL: table '$t' does not exist")
        store.assertNotRestorePending(t)
        val meta = store.describe(t)
        val keyAttrs = Seq(meta.hashKey) ++ meta.rangeKey
        keyAttrs.foreach(k => require(item.contains(k),
          s"PartiQL INSERT: item must carry key attribute '$k'"))
        val key: Item = keyAttrs.map(k => k -> item(k)).toMap
        Slice(t, Seq(store.PutIfAbsent(item)),
          Some(TxnCheck.Absent(key)), "INSERT", key)
      case Update(t, sets, removes, where, returning, appends) =>
        require(returning.isEmpty, "PartiQL: RETURNING is not supported " +
          "in execute_transaction (the service's TransactWriteItems " +
          "returns no item images)")
        require(store.exists(t), s"PartiQL: table '$t' does not exist")
        store.assertNotRestorePending(t)
        val meta = store.describe(t)
        val key = keyEqWhere(meta, where, "UPDATE")
        val keyAttrs = Set(meta.hashKey) ++ meta.rangeKey
        (sets.map(_._1) ++ removes ++ appends.map(_._1)).foreach(a =>
          require(!keyAttrs(a.head),
            s"PartiQL UPDATE: cannot SET/REMOVE key attribute '${a.head}'"))
        // nested-path / list_append targets: advisory single-item read
        // for the LOUD ValidationException on a dead path (the
        // transaction's own Exists check still guards existence
        // atomically at commit)
        val curOpt = if ((sets.map(_._1) ++ removes).exists(!_.simple)
            || appends.nonEmpty)
          store.transactGet(t, Seq(key)).head else None
        val (ops, _) = updateOps(store, key, sets, removes, appends, curOpt)
        Slice(t, ops, Some(TxnCheck.Exists(key)), "UPDATE", key)
      case Delete(t, where, returning) =>
        require(returning.isEmpty, "PartiQL: RETURNING is not supported " +
          "in execute_transaction (the service's TransactWriteItems " +
          "returns no item images)")
        require(store.exists(t), s"PartiQL: table '$t' does not exist")
        store.assertNotRestorePending(t)
        val meta = store.describe(t)
        val key = keyEqWhere(meta, where, "DELETE")
        Slice(t, Seq(store.Delete(key)), None, "DELETE", key)
      case ExistsCheck(sel, negated) =>
        val what = if (negated) "NOT EXISTS" else "EXISTS"
        require(store.exists(sel.table),
          s"PartiQL: table '${sel.table}' does not exist")
        store.assertNotRestorePending(sel.table)
        require(sel.index.isEmpty && sel.orderBy.isEmpty &&
            sel.projection.isEmpty,
          s"PartiQL $what: the inner statement must be `SELECT * FROM " +
            "table WHERE ...` — no index read, projection or ORDER BY " +
            "(the service's ConditionCheck shape)")
        val meta = store.describe(sel.table)
        val (key, extra) = keyAndConds(meta, sel.where, what)
        val check =
          if (negated) {
            // NOT EXISTS asserts ABSENCE of the keyed item; an extra
            // attribute condition under negation would mean "no item
            // OR an item failing the condition" — a shape the
            // service's ConditionCheck expresses with EXISTS + a
            // negated ConditionExpression, so require the key-only
            // spelling here rather than guess.
            require(extra.isEmpty, "PartiQL NOT EXISTS: WHERE must name " +
              "the full primary key only — assert attribute conditions " +
              "with EXISTS (absence is the service's " +
              "attribute_not_exists on the key)")
            TxnCheck.Absent(key)
          } else if (extra.isEmpty) TxnCheck.Exists(key)
          else TxnCheck.Cond(key, extra.map(cond2filter)
            .reduce(org.apache.spark.sql.sources.And(_, _)))
        Slice(sel.table, Nil, Some(check), what, key)
    }
    // the service's rule: one transaction cannot include multiple
    // operations on one item (ValidationException) — without this,
    // e.g. INSERT k + UPDATE k would cancel via the pre-apply Exists
    // check with a misleading error. (Binary key attrs compare by
    // reference here and may slip through — the conservative
    // direction: such a pair still just cancels via its checks.)
    val dup = slices.groupBy(s => (s.table, s.key)).collectFirst {
      case ((t, k), ss) if ss.size > 1 =>
        s"table '$t' key ${ItemJson.write(k)} (${ss.map(_.op).mkString(" + ")})"
    }
    require(dup.isEmpty,
      "PartiQL: a transaction cannot include multiple operations on " +
        s"one item (the service's ValidationException): ${dup.getOrElse("")}")
    // transactWriteMulti wants one TableTxn per table; merging keeps
    // each table's ops in statement order (replay applies in order)
    val txns = slices.map(_.table).distinct.map { t =>
      val mine = slices.filter(_.table == t)
      TableTxn(t, mine.flatMap(_.ops), mine.flatMap(_.check))
    }
    store.transactWriteMulti(txns, System.currentTimeMillis(), writerId())
    (StructType(Seq(
      StructField("op", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("applied", BooleanType, nullable = false))),
      slices.map(sl => new GenericInternalRow(Array[Any](
        UTF8String.fromString(sl.op), UTF8String.fromString(sl.table),
        true)): InternalRow).toArray)
  }

  /** The service's `BatchExecuteStatement`: a `;`-separated list run
    * NON-transactionally — each statement commits or fails ON ITS
    * OWN, and the result reports per-statement success/error instead
    * of aborting the batch (the service's BatchStatementResponse
    * shape). SELECTs are allowed mixed with writes here (each is an
    * independent singleton read); a failed statement's error message
    * lands in its row and later statements still run. 25-statement
    * cap, the service's bound.
    */
  def executeBatch(root: String, statements: String, params: Seq[AttrVal])
      : (StructType, Array[InternalRow]) = {
    val stmts = parseMulti(statements, params)
    require(stmts.nonEmpty, "PartiQL: empty batch")
    require(stmts.size <= 25,
      "PartiQL: a batch is capped at 25 statements (the service's " +
        "BatchExecuteStatement bound)")
    val schema = StructType(Seq(
      StructField("stmt", IntegerType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("applied", BooleanType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("error", StringType, nullable = true)))
    val rows = stmts.zipWithIndex.map { case (stmt, i) =>
      val (op, table) = stmt match {
        case s: Select => ("SELECT", s.table)
        case s: Insert => ("INSERT", s.table)
        case s: Update => ("UPDATE", s.table)
        case s: Delete => ("DELETE", s.table)
        // transactions-only; executeOne below reports it in this
        // statement's error slot (the batch's per-statement shape)
        case s: ExistsCheck =>
          (if (s.negated) "NOT EXISTS" else "EXISTS", s.sel.table)
      }
      val (ok, n, err) =
        try {
          val (_, rs) = executeOne(root, stmt)
          (true, rs.length.toLong, null: String)
        } catch { case e: Exception =>
          (false, 0L, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      new GenericInternalRow(Array[Any](
        i, UTF8String.fromString(op), UTF8String.fromString(table), ok, n,
        Option(err).map(UTF8String.fromString).orNull)): InternalRow
    }
    (schema, rows.toArray)
  }

  /** SELECT with the service's paging model: the driver-side response
    * is bounded at `pageBytes` (~the service's 1 MB); a truncated page
    * carries an opaque continuation token in an extra `next_token`
    * column (same value on every row — the tabular analogue of the
    * response's NextToken sibling field), and resuming re-runs the
    * ordered read with a PUSHED sort-key start window (the page-index
    * prune machinery the connector already has), so page N+1 never
    * rescans pages 1..N's key range. Paging requires the service's
    * own Query shape — hash key pinned by equality, a sort key, and
    * at most a sort-key ORDER BY (its direction is the page order);
    * a SELECT outside that shape whose result exceeds the bound fails
    * LOUDLY pointing at the unbounded composable read
    * ([[selectDataFrame]]) instead of silently truncating. The driver
    * pulls result partitions INCREMENTALLY (`toRdd.toLocalIterator`),
    * so an over-bound result never materializes whole on the driver —
    * the round-13 ExecuteStatement scope cut this closes.
    */
  private def runSelect(root: String, store: LocalKVStore, sel: Select,
      limit: Option[Int], consistentRead: Boolean,
      nextToken: Option[String], pageBytes: Int)
      : (StructType, Array[InternalRow]) = {
    val spark = SparkSession.active
    val meta = store.describe(sel.table)
    val rkName = meta.rangeKey
    val hashPinned = sel.where.exists {
      case Cmp(a, "=", _) => a.simple && a.head == meta.hashKey
      case _ => false
    }
    val pageable = hashPinned && rkName.isDefined && sel.index.isEmpty &&
      (sel.orderBy.isEmpty ||
        (sel.orderBy.sizeIs == 1 && sel.orderBy.head._1.simple &&
          sel.orderBy.head._1.head == rkName.get))
    val desc = sel.orderBy.headOption.exists(!_._2)
    val sig = pageSig(sel, meta)
    // resume window from the token: a pushed sort-key bound
    val resume: Option[AttrVal] = nextToken.map { tok =>
      val m = try ItemJson.parse(new String(
        java.util.Base64.getDecoder.decode(tok), java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception => throw new IllegalArgumentException(
        s"PartiQL: malformed NextToken", e) }
      require(m.get("sig").contains(AttrVal.S(sig)),
        "PartiQL: NextToken was issued for a different statement")
      require(pageable, "PartiQL: NextToken requires the paged Query shape")
      m("rk")
    }
    // paging needs the sort key IN the scanned output and a total
    // order over it — append both internally, strip before returning
    val appendedRk = pageable &&
      sel.projection.exists(p => !p.exists(pp => pp.simple && rkName.contains(pp.head)))
    val innerProj =
      if (!pageable) sel.projection
      else sel.projection.map(p => if (appendedRk) p :+ DocPath(rkName.get) else p)
    val innerOrder =
      if (pageable) Seq(DocPath(rkName.get) -> !desc)
      else sel.orderBy
    var df = buildSelect(spark, root,
      if (pageable) sel.copy(projection = innerProj, orderBy = innerOrder) else sel,
      consistentRead)
    resume.foreach { last =>
      // the token's sort-key value must still mean what it meant when
      // issued: a table recreated under the token with a same-NAMED
      // range key of a different TYPE would otherwise resume into a
      // mistyped comparison (empty or full pages — silently wrong
      // either way, the one paging shape data mutations can corrupt)
      val dt = df.schema(rkName.get).dataType
      val kindOk = (last, dt) match {
        case (_: AttrVal.S, StringType) => true
        case (_: AttrVal.N, LongType | IntegerType |
          org.apache.spark.sql.types.DoubleType) => true
        case (_: AttrVal.N, _: org.apache.spark.sql.types.DecimalType) => true
        case (_: AttrVal.B, BinaryType) => true
        case _ => false
      }
      require(kindOk, "PartiQL: NextToken's sort-key value does not " +
        s"match the table's current sort-key type ($dt) — the table " +
        "was recreated under the token; re-run the statement without " +
        "a token")
      val c = col(rkName.get)
      df = df.filter(if (desc) c < sparkLit(last) else c > sparkLit(last))
    }
    limit.foreach { n =>
      require(n > 0, s"PartiQL: Limit must be positive, got $n")
      // the service's Limit stops EVALUATION but still returns a
      // NextToken when more data remains — so on the pageable shape,
      // push limit+1 (the pushdown still bounds the read) and let the
      // loop below stop at n with the (n+1)th row proving truncation;
      // a non-pageable SELECT keeps the plain limit (no token exists
      // to hand back)
      df = df.limit(if (pageable) n + 1 else n)
    }
    val schema = df.schema
    val rkIdx = if (pageable) schema.fieldIndex(rkName.get) else -1
    // copy on the EXECUTOR side: toLocalIterator buffers each
    // partition, and buffering reused UnsafeRows without copying
    // yields a page of identical rows
    val it = df.queryExecution.toRdd
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .toLocalIterator
    val rows = Vector.newBuilder[InternalRow]
    var bytes = 0L
    var n = 0
    var truncated = false
    val rowCap = if (pageable) limit.getOrElse(Int.MaxValue) else Int.MaxValue
    while (it.hasNext && !truncated) {
      val r = it.next()
      rows += r
      n += 1
      bytes += (r match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          u.getSizeInBytes.toLong
        case _ => 32L * schema.length
      })
      if ((bytes >= pageBytes || n >= rowCap) && it.hasNext) truncated = true
    }
    val collected = rows.result()
    if (!truncated)
      return (stripRk(schema, appendedRk, rkIdx),
        collected.map(projectOut(schema, appendedRk, rkIdx, _, None)).toArray)
    require(pageable,
      s"PartiQL: the SELECT's result exceeds the ${pageBytes}-byte page " +
        "bound and this statement shape cannot page (paging needs a " +
        "single-hash-key key condition and a sort key, ordered by that " +
        "sort key) — use the unbounded DataFrame read (selectDataFrame) " +
        "for large results")
    val lastRk = rkAttrOf(schema(rkIdx).dataType, collected.last, rkIdx)
    val token = java.util.Base64.getEncoder.encodeToString(
      ItemJson.write(Map("sig" -> AttrVal.S(sig), "rk" -> lastRk))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the continuation column is reserved: appending it next to a
    // projected user attribute of the same name would leave two
    // 'next_token' fields and token-loop consumers reading item data
    // as the token — reject loudly instead
    require(!stripRk(schema, appendedRk, rkIdx).fieldNames
        .contains("next_token"),
      "PartiQL: the paged result projects an attribute named " +
        "'next_token', which collides with the reserved continuation " +
        "column — project it under another name (or use the unbounded " +
        "DataFrame read)")
    (stripRk(schema, appendedRk, rkIdx)
       .add(StructField("next_token", StringType, nullable = true)),
      collected.map(projectOut(schema, appendedRk, rkIdx, _, Some(token))).toArray)
  }

  /** A value in the canonical item wire encoding — binary values
    * render as their base64 CONTENT, not the JVM array identity that
    * `Array[Byte].toString` would give (two executes of the same
    * binary-keyed statement must produce the same signature, or the
    * token loop breaks on every resume).
    */
  private def renderVal(v: AttrVal): String = ItemJson.write(Map("v" -> v))

  private def renderCond(c: Cond): String = c match {
    case Cmp(a, op, v) => s"cmp(${a.render},$op,${renderVal(v)})"
    case Between(a, lo, hi) =>
      s"between(${a.render},${renderVal(lo)},${renderVal(hi)})"
    case InList(a, vs) => s"in(${a.render},${vs.map(renderVal).mkString(",")})"
    case FnCond(fn, a, v) => s"$fn(${a.render},${renderVal(v)})"
    case SizeCmp(a, op, v) => s"size(${a.render},$op,${renderVal(v)})"
    case AttrType(a, tag) => s"attrtype(${a.render},$tag)"
    case Missing(a, neg) => s"missing(${a.render},$neg)"
    case OrCond(l, r) => s"or(${renderCond(l)},${renderCond(r)})"
    case AndCond(l, r) => s"and(${renderCond(l)},${renderCond(r)})"
    case NotCond(x) => s"not(${renderCond(x)})"
  }

  /** Binds a token to the statement that issued it AND to the table's
    * key schema: the digest is a CANONICAL rendering of the AST (value
    * literals in the item wire encoding — never case-class toString,
    * whose `Array[Byte]` identity would change per call) plus the
    * hash/range key names. A table dropped and recreated with
    * different keys under a held token therefore fails loudly as
    * "different statement" instead of resuming into a read whose
    * pushed sort-key window no longer means anything.
    */
  private def pageSig(sel: Select, meta: TableMeta): String = {
    val canon = Seq(
      sel.table,
      sel.index.getOrElse(""),
      sel.projection.fold("*")(_.map(_.render).mkString(",")),
      sel.where.map(renderCond).mkString(";"),
      sel.orderBy.map { case (a, asc) =>
        a.render + (if (asc) ":a" else ":d") }.mkString(","),
      s"keys:${meta.hashKey},${meta.rangeKey.getOrElse("")}"
    ).mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def stripRk(schema: StructType, appended: Boolean, rkIdx: Int): StructType =
    if (!appended) schema
    else StructType(schema.fields.zipWithIndex.collect {
      case (f, i) if i != rkIdx => f })

  private def projectOut(schema: StructType, appended: Boolean, rkIdx: Int,
      r: InternalRow, token: Option[String]): InternalRow = {
    val keep = schema.fields.indices.filter(i => !appended || i != rkIdx)
    val vals = keep.map(i => r.get(i, schema(i).dataType)).toArray[Any]
    new GenericInternalRow(token.fold(vals)(t => vals :+ (UTF8String.fromString(t): Any)))
  }

  /** The sort-key value of a result row, as the AttrVal the resume
    * window pushes (keys are S/N/B on the service).
    */
  private def rkAttrOf(dt: org.apache.spark.sql.types.DataType,
      r: InternalRow, i: Int): AttrVal = dt match {
    case StringType => AttrVal.S(r.getUTF8String(i).toString)
    case LongType => AttrVal.N(BigDecimal(r.getLong(i)))
    case IntegerType => AttrVal.N(BigDecimal(r.getInt(i)))
    case org.apache.spark.sql.types.DoubleType => AttrVal.N(BigDecimal(r.getDouble(i)))
    case d: org.apache.spark.sql.types.DecimalType =>
      AttrVal.N(r.getDecimal(i, d.precision, d.scale).toBigDecimal)
    case org.apache.spark.sql.types.BinaryType => AttrVal.B(r.getBinary(i))
    case other => throw new IllegalArgumentException(
      s"PartiQL: unsupported sort-key type for paging: $other")
  }

  /** A SELECT statement as a lazy DataFrame — the composable form of
    * `execute` (filter further, join, write), and what specs use to
    * pin that a statement's plan IS the equivalent read's plan
    * (pushed key conditions, pruned shards, index serve).
    */
  def selectDataFrame(spark: SparkSession, root: String,
      statement: String, params: Seq[AttrVal] = Nil)
      : org.apache.spark.sql.DataFrame =
    parse(statement, params) match {
      case sel: Select => buildSelect(spark, root, sel)
      case other => throw new IllegalArgumentException(
        s"PartiQL.selectDataFrame takes a SELECT, got $other")
    }

  private def buildSelect(spark: SparkSession, root: String,
      sel: Select, consistentRead: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    var rd = spark.read.format("dynamo")
      .option("path", root).option("tableName", sel.table)
      .option("stronglyConsistentReads", consistentRead.toString)
    sel.index.foreach(ix => rd = rd.option("indexName", ix))
    var df = rd.load()
    sel.where.foreach(c => df = df.filter(cond2col(c, df.schema)))
    sel.projection.foreach(p => df = df.select(p.map(pp =>
      if (pp.simple) col(pp.head) else pathCol(pp).as(pp.render)): _*))
    if (sel.orderBy.nonEmpty)
      df = df.orderBy(sel.orderBy.map { case (a, asc) =>
        if (asc) pathCol(a).asc else pathCol(a).desc }: _*)
    df
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
      case Cmp(a, "=", v) if a.simple => a.head -> v
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

  /** EXISTS's WHERE split: full-primary-key equalities (exactly the
    * table's key, via [[keyEqWhere]]'s own validation) plus whatever
    * extra attribute conditions ride along — the ConditionCheck's
    * Key + ConditionExpression halves.
    */
  private def keyAndConds(meta: TableMeta, where: Seq[Cond], what: String)
      : (Item, Seq[Cond]) = {
    val keyAttrs = Set(meta.hashKey) ++ meta.rangeKey
    val (keyEqs, extra) = where.partition {
      case Cmp(a, "=", _) if a.simple && keyAttrs(a.head) => true
      case _ => false
    }
    (keyEqWhere(meta, keyEqs, what), extra)
  }

  /** A WHERE conjunct as a Spark `sources.Filter` for a transaction
    * ConditionCheck ([[TxnCheck.Cond]] — evaluated with
    * [[FilterEval]]'s three-valued semantics over the keyed item's
    * CURRENT wire form, atomically at publish). Top-level attributes
    * and the Filter-expressible family only; anything with no Filter
    * analogue (size(), attribute_type(), nested paths, binary/NULL
    * literals — FilterEval compares S/N/BOOL) is rejected LOUDLY,
    * never compiled into a silently-always-cancelling check.
    */
  private def cond2filter(c: Cond): org.apache.spark.sql.sources.Filter = {
    import org.apache.spark.sql.{sources => F}
    def top(a: DocPath): String = {
      require(a.simple, s"PartiQL EXISTS: nested path '${a.render}' is " +
        "not supported in a transaction condition (top-level " +
        "attributes only)")
      a.head
    }
    def l(v: AttrVal, at: DocPath): Any = v match {
      case AttrVal.B(_) | AttrVal.Null => throw new IllegalArgumentException(
        s"PartiQL EXISTS: binary/NULL literals in the condition on " +
          s"'${at.render}' have no wire-item comparison analogue here")
      case other => rawLit(other)
    }
    c match {
      case Cmp(a, "=", v)  => F.EqualTo(top(a), l(v, a))
      case Cmp(a, "<>", v) => F.Not(F.EqualTo(top(a), l(v, a)))
      case Cmp(a, "<", v)  => F.LessThan(top(a), l(v, a))
      case Cmp(a, "<=", v) => F.LessThanOrEqual(top(a), l(v, a))
      case Cmp(a, ">", v)  => F.GreaterThan(top(a), l(v, a))
      case Cmp(a, ">=", v) => F.GreaterThanOrEqual(top(a), l(v, a))
      case Between(a, lo, hi) => F.And(
        F.GreaterThanOrEqual(top(a), l(lo, a)),
        F.LessThanOrEqual(top(a), l(hi, a)))
      case InList(a, vs) => F.In(top(a), vs.map(v => l(v, a)).toArray)
      case FnCond("begins_with", a, AttrVal.S(p)) =>
        F.StringStartsWith(top(a), p)
      case FnCond("contains", a, AttrVal.S(x)) =>
        F.StringContains(top(a), x)
      case Missing(a, negated) =>
        if (negated) F.IsNotNull(top(a)) else F.IsNull(top(a))
      case AndCond(x, y) => F.And(cond2filter(x), cond2filter(y))
      case OrCond(x, y)  => F.Or(cond2filter(x), cond2filter(y))
      case NotCond(x)    => F.Not(cond2filter(x))
      case other => throw new IllegalArgumentException(
        s"PartiQL EXISTS: condition $other has no transaction " +
          "ConditionCheck analogue (size()/attribute_type() are " +
          "read-side only here)")
    }
  }

  /** Build the conditional journal ops for an UPDATE's SET/REMOVE
    * lists: plain top-level targets ride `UpdateIfExists` /
    * `RemoveAttrsIfExists`, nested document paths ride ONE
    * `PathEdits` op. When the caller holds the current item, every
    * path is validated against it — a path that doesn't navigate the
    * current structure is the service's ValidationException, reported
    * loudly BEFORE anything lands (at replay a racing restructure
    * degrades to the op's documented silent no-op). Also returns the
    * new-image function (the same transforms over a concrete OLD
    * image) for `RETURNING ALL NEW *`.
    */
  private def updateOps(store: LocalKVStore, key: Item,
      sets: Seq[(DocPath, AttrVal)], removes: Seq[DocPath],
      appends: Seq[(DocPath, AttrVal, Boolean)],
      cur: Option[Item]): (Seq[store.Op], Item => Item) = {
    val (simpleSets, pathSets) = sets.partition(_._1.simple)
    val (simpleRems, pathRems) = removes.partition(_.simple)
    val pathTargets: Seq[(DocPath, Option[AttrVal])] =
      pathSets.map { case (p, v) => p -> (Some(v): Option[AttrVal]) } ++
        pathRems.map(p => p -> (None: Option[AttrVal]))
    // list_append's operand is a LIST on the service — statement
    // shape, so reject it loudly regardless of the item's state
    appends.foreach { case (p, v, _) => require(v.isInstanceOf[AttrVal.L],
      s"PartiQL UPDATE: list_append's operand for '${p.render}' must be " +
        "a list (the service's ValidationException)") }
    cur.foreach { c =>
      pathTargets.foreach { case (p, v) =>
        val ok = v match {
          case Some(_) => c.get(p.head)
            .exists(LocalKVStore.editValue(_, p.segs, v).isDefined)
          // REMOVE faults only on invalid INTERMEDIATE navigation —
          // an absent LEAF in a navigable container of the right kind
          // is the service's documented no-op
          case None =>
            lookupPath(c, DocPath(p.head, p.segs.init)).exists {
              case AttrVal.M(_) => p.segs.last.isLeft
              case AttrVal.L(_) => p.segs.last.isRight
              case _ => false
            }
        }
        require(ok, s"PartiQL UPDATE: the document path '${p.render}' " +
          "does not exist in the item (the service's ValidationException)")
      }
      appends.foreach { case (p, _, _) =>
        require(lookupPath(c, p).exists(_.isInstanceOf[AttrVal.L]),
          s"PartiQL UPDATE: list_append target '${p.render}' is not an " +
            "existing list (the service's ValidationException)")
      }
    }
    val edits =
      pathTargets.map { case (p, v) => LocalKVStore.PathEdit(p.full, v) } ++
        appends.map { case (p, v, atEnd) =>
          LocalKVStore.PathEdit(p.full, Some(v), Some(atEnd)) }
    val ops = Seq.newBuilder[store.Op]
    if (simpleSets.nonEmpty)
      ops += store.UpdateIfExists(key ++ simpleSets.map { case (p, v) => p.head -> v })
    if (simpleRems.nonEmpty)
      ops += store.RemoveAttrsIfExists(
        key ++ simpleRems.map(_.head -> (AttrVal.Null: AttrVal)))
    if (edits.nonEmpty) ops += store.PathEdits(key, edits)
    val img = (old: Item) => LocalKVStore.applyPathEdits(
      (old ++ simpleSets.map { case (p, v) => p.head -> v })
        -- simpleRems.map(_.head),
      edits)
    (ops.result(), img)
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

  /** A path as a Spark Column: struct-field access for M segments,
    * array index for L segments — the connector's decode maps M to
    * StructType and L to ArrayType, so navigation is native Catalyst
    * (`GetStructField`/`GetArrayItem`), never a UDF.
    */
  private def pathCol(p: DocPath): Column =
    p.segs.foldLeft(col(p.head)) {
      case (c, Left(f))  => c.getField(f)
      // try_element_at, not getItem: an out-of-range index is MISSING
      // (null) on the service, never an error — getItem under the
      // session's ANSI mode would fault the whole scan instead
      case (c, Right(i)) => try_element_at(c, lit(i + 1))
    }

  private def cmpCol(c: Column, op: String, v: Column, at: DocPath): Column =
    op match {
      case "=" => c === v
      case "<>" => c =!= v
      case "<" => c < v
      case "<=" => c <= v
      case ">" => c > v
      case ">=" => c >= v
      case other => throw new IllegalArgumentException(
        s"PartiQL: unsupported comparison '$other' on '${at.render}'")
    }

  /** The decoded Spark type a document path lands on, from the read's
    * own schema (None = the path names nothing the decode produced).
    * `size()`/`attribute_type()` resolve against this — post-decode a
    * column's type is STATIC, so both functions compile to plain
    * Catalyst over the typed column, never a per-row type dispatch.
    */
  private def pathType(schema: StructType, p: DocPath)
      : Option[org.apache.spark.sql.types.DataType] = {
    def walk(dt: org.apache.spark.sql.types.DataType,
        segs: Seq[Either[String, Int]])
        : Option[org.apache.spark.sql.types.DataType] = segs match {
      case Seq() => Some(dt)
      case Left(f) +: rest => dt match {
        case st: StructType =>
          st.fields.find(_.name == f).flatMap(x => walk(x.dataType, rest))
        case org.apache.spark.sql.types.MapType(_, v, _) => walk(v, rest)
        case _ => None
      }
      case Right(_) +: rest => dt match {
        case org.apache.spark.sql.types.ArrayType(et, _) => walk(et, rest)
        case _ => None
      }
    }
    schema.fields.find(_.name == p.head).flatMap(f => walk(f.dataType, p.segs))
  }

  private def cond2col(c: Cond, schema: StructType): Column = c match {
    case Cmp(a, op, v) => cmpCol(pathCol(a), op, sparkLit(v), a)
    case Between(a, lo, hi) => pathCol(a) >= sparkLit(lo) && pathCol(a) <= sparkLit(hi)
    case InList(a, vs) => pathCol(a).isin(vs.map(rawLit): _*)
    case FnCond("begins_with", a, AttrVal.S(p)) => pathCol(a).startsWith(p)
    case FnCond("contains", a, AttrVal.S(s)) => pathCol(a).contains(s)
    case FnCond(fn, a, v) => throw new IllegalArgumentException(
      s"PartiQL: $fn('${a.render}', $v) requires a string argument")
    case SizeCmp(a, op, n) =>
      require(n.isInstanceOf[AttrVal.N], s"PartiQL: size('${a.render}') " +
        "compares against a number (the service's ValidationException)")
      val sz: Column = pathType(schema, a) match {
        // string: character count; binary: byte count — both are
        // Spark's own `length`, matching the service's size()
        case Some(StringType | BinaryType) => length(pathCol(a))
        case Some(_: org.apache.spark.sql.types.ArrayType |
                  _: org.apache.spark.sql.types.MapType) =>
          org.apache.spark.sql.functions.size(pathCol(a))
        // decoded M = struct of every key the table's items use; the
        // per-item entry count is the count of PRESENT fields
        case Some(st: StructType) =>
          val base = pathCol(a)
          // NULL (not 0) when the attribute is absent from the item —
          // the service's size() on a missing attribute is false under
          // every comparison, and 0 would make `size(m) = 0` match
          // items that have no m at all.
          val cnt: Column =
            if (st.fields.isEmpty) lit(0) // an always-empty decoded M
            else st.fields.map(f => when(base.getField(f.name).isNotNull, 1)
              .otherwise(0): Column).reduce(_ + _)
          when(base.isNotNull, cnt).otherwise(lit(null))
        case Some(other) => throw new IllegalArgumentException(
          s"PartiQL: size('${a.render}') is undefined on the decoded " +
            s"type $other (the service's ValidationException)")
        case None => throw new IllegalArgumentException(
          s"PartiQL: size('${a.render}') names no attribute the read " +
            "decodes — the condition could never be true")
      }
      cmpCol(sz, op, sparkLit(n), a)
    case AttrType(a, tag) =>
      val dt = pathType(schema, a)
      val matches = (tag, dt) match {
        case ("S", Some(StringType)) => true
        case ("N", Some(_: org.apache.spark.sql.types.NumericType)) => true
        case ("BOOL", Some(BooleanType)) => true
        case ("B", Some(BinaryType)) => true
        case ("L", Some(_: org.apache.spark.sql.types.ArrayType)) => true
        case ("M", Some(_: StructType |
                        _: org.apache.spark.sql.types.MapType)) => true
        case ("S" | "N" | "BOOL" | "B" | "L" | "M", _) => false
        case (other, _) => throw new IllegalArgumentException(
          s"PartiQL: attribute_type tag '$other' is not supported here " +
            "(sets decode as L; NULL is indistinguishable from MISSING " +
            "after decode — use IS MISSING)")
      }
      if (matches) pathCol(a).isNotNull else lit(false)
    case Missing(a, false) => pathCol(a).isNull
    case Missing(a, true) => pathCol(a).isNotNull
    case OrCond(l, r) => cond2col(l, schema) || cond2col(r, schema)
    case AndCond(l, r) => cond2col(l, schema) && cond2col(r, schema)
    case NotCond(x) => !cond2col(x, schema)
  }

  // ---- parser (recursive descent over the DynamoDB PartiQL subset) --

  def parse(statement: String, params: Seq[AttrVal]): Stmt = {
    val p = new P(statement, params)
    val stmt = p.statement()
    p.ws()
    if (p.tryChar(';')) p.ws()
    if (!p.eof) p.fail("trailing content after statement")
    require(p.paramIdx == params.size,
      s"PartiQL: statement uses ${p.paramIdx} parameter(s) but ${params.size} were supplied")
    stmt
  }

  /** `;`-separated statement list (ExecuteTransaction's shape).
    * `?` placeholders bind positionally across the WHOLE list, in
    * statement order.
    */
  def parseMulti(statements: String, params: Seq[AttrVal]): Seq[Stmt] = {
    val p = new P(statements, params)
    val b = Vector.newBuilder[Stmt]
    var done = false
    while (!done) {
      b += p.statement()
      p.ws()
      if (p.tryChar(';')) { p.ws(); done = p.eof }
      else { if (!p.eof) p.fail("expected ';' between statements"); done = true }
    }
    require(p.paramIdx == params.size,
      s"PartiQL: statements use ${p.paramIdx} parameter(s) but ${params.size} were supplied")
    b.result()
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

    /** Keyword-then-'(' lookahead: consumes the keyword ONLY when a
      * call follows, so an attribute that happens to be named like a
      * condition function (`size = 3`) still parses as a path.
      */
    def tryFn(name: String): Boolean = {
      val save = pos
      if (!tryKw(name)) false
      else {
        ws()
        if (pos < s.length && s.charAt(pos) == '(') true
        else { pos = save; false }
      }
    }

    def statement(): Stmt =
      if (tryFn("EXISTS")) existsCheck(negated = false)
      else if (tryNotExists()) existsCheck(negated = true)
      else if (tryKw("SELECT")) select()
      else if (tryKw("INSERT")) insert()
      else if (tryKw("UPDATE")) update()
      else if (tryKw("DELETE")) delete()
      else fail("expected SELECT, INSERT, UPDATE, DELETE or [NOT] EXISTS")

    /** `NOT EXISTS (` lookahead — restores on anything else, so a
      * statement can never start with a bare NOT anyway and nothing
      * is stolen from the other productions.
      */
    private def tryNotExists(): Boolean = {
      val save = pos
      if (tryKw("NOT") && tryFn("EXISTS")) true
      else { pos = save; false }
    }

    /** `[NOT] EXISTS (SELECT ...)` — transaction ConditionCheck. */
    def existsCheck(negated: Boolean): ExistsCheck = {
      ch('(')
      kw("SELECT")
      val sel = select()
      ch(')')
      ExistsCheck(sel, negated)
    }

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

    /** `attr(.field | [index])*` — a nested document path. */
    def path(): DocPath = {
      val h = ident()
      val segs = Vector.newBuilder[Either[String, Int]]
      var done = false
      while (!done) {
        if (pos < s.length && s.charAt(pos) == '.') {
          pos += 1; segs += Left(ident())
        } else if (pos < s.length && s.charAt(pos) == '[') {
          pos += 1
          val n = numLit()
          ch(']')
          if (!n.isWhole || n < 0 || !n.isValidInt)
            fail("list index must be a non-negative integer")
          segs += Right(n.toInt)
        } else done = true
      }
      DocPath(h, segs.result())
    }

    def cond(): Cond = {
      val fn =
        if (tryFn("begins_with")) Some("begins_with")
        else if (tryFn("contains")) Some("contains")
        else None
      if (fn.isDefined) {
        ch('('); val a = path(); ch(','); val v = value(); ch(')')
        FnCond(fn.get, a, v)
      } else if (tryFn("size")) {
        ch('('); val a = path(); ch(')')
        SizeCmp(a, cmpOp(), value())
      } else if (tryFn("attribute_type")) {
        ch('('); val a = path(); ch(','); val v = value(); ch(')')
        v match {
          case AttrVal.S(tag) => AttrType(a, tag)
          case other => fail(s"attribute_type's second argument must " +
            s"be a type tag string, got $other")
        }
      } else {
        val a = path()
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

    /** WHERE expression, standard precedence: NOT > AND > OR;
      * parentheses group. Top-level ANDs flatten back into the
      * conjunct list ([[flattenAnd]]), so pure-conjunct statements —
      * including every key-condition shape the write paths accept —
      * parse to exactly the shape they always did.
      */
    def orExpr(): Cond = {
      var l = andExpr()
      while (tryKw("OR")) l = OrCond(l, andExpr())
      l
    }
    private def andExpr(): Cond = {
      var l = notExpr()
      while (tryKw("AND")) l = AndCond(l, notExpr())
      l
    }
    private def notExpr(): Cond =
      if (tryKw("NOT")) NotCond(notExpr())
      else {
        ws()
        if (pos < s.length && s.charAt(pos) == '(') {
          pos += 1; val c = orExpr(); ch(')'); c
        } else cond()
      }

    def condAnd(): Seq[Cond] = flattenAnd(orExpr())

    def select(): Select = {
      val proj = if (tryChar('*')) None else {
        val b = Vector.newBuilder[DocPath]
        ws(); b += path()
        while (tryChar(',')) { ws(); b += path() }
        Some(b.result())
      }
      kw("FROM")
      val t = ident()
      val ix = if (tryChar('.')) Some(ident()) else None
      val where = if (tryKw("WHERE")) condAnd() else Nil
      val order = if (tryKw("ORDER")) {
        kw("BY")
        val b = Vector.newBuilder[(DocPath, Boolean)]
        var done = false
        while (!done) {
          ws(); val a = path()
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
      val sets = Vector.newBuilder[(DocPath, AttrVal)]
      val removes = Vector.newBuilder[DocPath]
      val appends = Vector.newBuilder[(DocPath, AttrVal, Boolean)]
      // one list_append operand: the target path itself, or a value
      def appendOperand(target: DocPath): Option[AttrVal] = {
        ws()
        val save = pos
        val identStart = pos < s.length &&
          s.charAt(pos).isLetter || (pos < s.length && s.charAt(pos) == '_')
        if (identStart) {
          // TRUE/FALSE/NULL are value keywords, not paths (restore
          // pos: value() re-parses them)
          if (tryKw("TRUE") || tryKw("FALSE") || tryKw("NULL")) {
            pos = save; Some(value())
          } else {
            val p = path()
            if (p != target) fail(s"list_append may only read the SET " +
              s"target itself ('${target.render}'); reading another " +
              s"path ('${p.render}') has no single-item conditional form")
            None // the target-path operand
          }
        } else Some(value())
      }
      var any = false
      var cont = true
      while (cont) {
        if (tryKw("SET")) {
          any = true
          var more = true
          while (more) {
            ws(); val a = path(); ch('=')
            if (tryFn("list_append")) {
              ch('(')
              val op1 = appendOperand(a); ch(',')
              val op2 = appendOperand(a); ch(')')
              (op1, op2) match {
                // list_append(target, v) appends; list_append(v,
                // target) prepends — the service's two spellings
                case (None, Some(v)) => appends += ((a, v, true))
                case (Some(v), None) => appends += ((a, v, false))
                case (None, None) => fail("list_append's operands " +
                  "cannot both be the target path")
                case (Some(_), Some(_)) => fail("one of list_append's " +
                  "operands must be the SET target path")
              }
            } else sets += a -> value()
            more = tryChar(',')
          }
        } else if (tryKw("REMOVE")) {
          any = true
          var more = true
          while (more) { ws(); removes += path(); more = tryChar(',') }
        } else cont = false
      }
      if (!any) fail("UPDATE requires at least one SET or REMOVE clause")
      kw("WHERE")
      Update(t, sets.result(), removes.result(), condAnd(),
        returningClause(allowNew = true), appends.result())
    }

    def delete(): Delete = {
      kw("FROM")
      val t = ident()
      kw("WHERE")
      Delete(t, condAnd(), returningClause(allowNew = false))
    }

    /** `RETURNING [ALL|MODIFIED] [OLD|NEW] *` — the service's full
      * PartiQL return-values grammar for UPDATE (UpdateItem's ALL_OLD
      * / UPDATED_OLD / ALL_NEW / UPDATED_NEW); DELETE accepts
      * `ALL OLD *` only (DeleteItem's ReturnValues has no NEW or
      * UPDATED forms).
      */
    private def returningClause(allowNew: Boolean): Option[String] =
      if (!tryKw("RETURNING")) None
      else {
        val modified =
          if (tryKw("ALL")) false
          else if (tryKw("MODIFIED")) {
            if (!allowNew) fail("DELETE supports RETURNING ALL OLD * only")
            true
          } else fail("expected ALL or MODIFIED after RETURNING")
        val which =
          if (tryKw("OLD")) "OLD"
          else if (tryKw("NEW")) {
            if (!allowNew) fail("DELETE supports RETURNING ALL OLD * only")
            "NEW"
          } else fail("expected OLD or NEW after RETURNING " +
            (if (modified) "MODIFIED" else "ALL"))
        ch('*')
        Some((if (modified) "MOD_" else "") + which)
      }
  }
}
