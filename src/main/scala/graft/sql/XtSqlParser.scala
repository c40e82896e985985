package graft.sql

/** Parser for the XT SQL dialect surface that Spark's parser does not know
  * (reference grammar core/src/main/antlr/xtdb/antlr/Sql.g4):
  *
  *  - per-table-ref temporal clauses `FOR (VALID_TIME|SYSTEM_TIME)
  *    (AS OF t | ALL | FROM a TO b | BETWEEN a AND b)` and
  *    `FOR ALL (VALID_TIME|SYSTEM_TIME)` (Sql.g4:557-573)
  *  - query-level `SETTING DEFAULT VALID_TIME …[, DEFAULT SYSTEM_TIME …]`
  *  - SQL-text DML: INSERT / UPDATE / DELETE / ERASE / PATCH / ASSERT
  *    (Sql.g4:19-35, routed to XtDb by XtSqlEngine)
  *  - `RECORDS {k: v, …}` object-literal rows (Sql.g4:388-393)
  *  - `NEST_ONE(SELECT …)` / `NEST_MANY(SELECT …)` (Sql.g4:283-284),
  *    rewritten to Spark scalar subqueries over named_struct /
  *    collect_list(named_struct)
  *
  * Everything inside expressions and query bodies is delegated verbatim to
  * Spark's parser — this layer only lifts the XT-specific surface.
  */
object XtSqlParser {

  // ---- AST ----------------------------------------------------------------

  /** Textual temporal spec for one dimension; expression texts are resolved
    * to Columns by the engine. */
  sealed trait SpecAst
  object SpecAst {
    case object Current extends SpecAst
    final case class AsOf(ts: String) extends SpecAst
    case object All extends SpecAst
    final case class Range(from: String, to: String, inclusiveEnd: Boolean)
      extends SpecAst
  }

  /** A `table FOR …` occurrence: [start, end) span in the (nest-rewritten)
    * query text to replace with a resolved snapshot view. */
  final case class TemporalRef(table: String, valid: SpecAst,
      system: SpecAst, start: Int, end: Int)

  final case class ParsedQuery(text: String,
      defaultValid: SpecAst, defaultSystem: SpecAst,
      refs: Seq[TemporalRef])

  /** One RECORDS literal: ordered (field → expression-text) pairs. */
  type Record = Seq[(String, String)]

  /** Valid-time bound pair for DML: (from, Option(to)). */
  type ValidRange = (String, Option[String])

  sealed trait XtStatement
  object XtStatement {
    final case class Query(parsed: ParsedQuery) extends XtStatement
    final case class Insert(table: String, source: InsertSource)
      extends XtStatement
    sealed trait InsertSource
    /** SQL text (SELECT/WITH, or the VALUES clause wrapped for Spark). */
    final case class FromQuery(sql: String) extends InsertSource
    final case class FromRecords(records: Seq[Record]) extends InsertSource
    final case class Update(table: String, valid: Option[ValidRange],
        sets: Seq[(String, String)], where: Option[String]) extends XtStatement
    final case class Delete(table: String, valid: Option[ValidRange],
        where: Option[String]) extends XtStatement
    final case class Erase(table: String, where: String) extends XtStatement
    final case class Patch(table: String, valid: Option[ValidRange],
        records: Seq[Record]) extends XtStatement
    final case class Assert(cond: String, label: Option[String])
      extends XtStatement
    /** COPY <table> TO '<path>' [WITH (FORMAT <fmt>)] — snapshot export. */
    final case class CopyOut(table: String, path: String,
        format: Option[String]) extends XtStatement

    /** COPY <table> FROM '<path>' [WITH (FORMAT <fmt>)] — bulk ingest. */
    final case class CopyIn(table: String, path: String,
        format: Option[String]) extends XtStatement
    /** CREATE TABLE <t> (<col> <type>, …)
      * [WITH (layout_key = <col>, layout_buckets = <n>)] — schema
      * pre-declaration, optionally carrying the table's bucket-layout
      * declaration (the write-time storage organization the engine's
      * compactor materializes — reference compactor/Compactor.kt: layout
      * is a write-time property, transparent to readers). */
    final case class CreateTable(table: String, columnsDdl: String,
        layout: Option[(String, Int)] = None) extends XtStatement
    /** ALTER TABLE <t> DECLARE LAYOUT (key = <col>, buckets = <n>) —
      * declare/replace the bucket layout of an EXISTING table; the engine
      * compacts immediately so the bucketed snapshot materializes. */
    final case class DeclareLayout(table: String, key: String, buckets: Int)
      extends XtStatement
    /** ALTER TABLE <t> DROP LAYOUT — remove the declaration; reads fall
      * back to live resolution / flat serving. */
    final case class DropLayout(table: String) extends XtStatement
    /** GRANT/REVOKE <what> TO/FROM <grantee> (role catalog record). */
    /** DML with a trailing `RETURNING <select list>` (Sql.g4:19-31):
      * the wrapped statement executes and the affected rows, projected by
      * the list, come back as the result. */
    final case class WithReturning(stmt: XtStatement, selectList: String)
      extends XtStatement
    /** BEGIN / START TRANSACTION [READ ONLY | READ WRITE
      * [WITH (SYSTEM_TIME = …)]] (Sql.g4:41, 837-859). Isolation levels
      * parse and are ignored (single-writer serialized log). */
    final case class Begin(readOnly: Boolean, systemTime: Option[String])
      extends XtStatement
    case object Commit extends XtStatement
    case object Rollback extends XtStatement
    /** SET [SESSION] TIME ZONE <expr> (Sql.g4:46). */
    final case class SetTimeZone(zone: String) extends XtStatement
    /** SET [SESSION] <name> (TO | =) <literal>, and the accepted-but-
      * recorded SET TRANSACTION / SESSION CHARACTERISTICS forms. */
    final case class SetSessionVar(name: String, value: String)
      extends XtStatement
    /** SHOW <variable>: timezone, snapshot_token, clock_time,
      * transaction_isolation, await_token, or any session variable. */
    final case class ShowVar(name: String) extends XtStatement
    /** ATTACH DATABASE <name> [WITH '<config>'] / DETACH DATABASE <name>
      * (Sql.g4:55-56). Config accepts `path: <dir>` (our storage layout's
      * root for the attached store). */
    final case class AttachDb(name: String, config: Option[String])
      extends XtStatement
    final case class DetachDb(name: String) extends XtStatement
    /** PREPARE <name> AS <statement> (Sql.g4:37). */
    final case class Prepare(name: String, statement: String)
      extends XtStatement
    /** EXECUTE <name> [(args…)] — positional `?` params spliced in order. */
    final case class ExecuteStmt(name: String, args: Seq[String])
      extends XtStatement
    final case class GrantRevoke(grant: Boolean, what: String,
        grantee: String) extends XtStatement
  }

  final case class SqlParseException(msg: String)
    extends RuntimeException(msg)

  // ---- entry --------------------------------------------------------------

  def parse(sql: String): XtStatement = parse(sql, Set.empty)

  def parse(sql0: String, dbNames: Set[String]): XtStatement = {
    val sql =
      try SqlLexer.normalizeDollarQuotes(sql0)
      catch { case e: IllegalArgumentException =>
        throw SqlParseException(e.getMessage) }
    val toks = SqlLexer.tokenize(sql)
    if (toks.isEmpty) throw SqlParseException("empty statement")
    toks.head.upper match {
      case "INSERT" | "UPDATE" | "DELETE"
          if depth0Returning(toks) >= 0 =>
        val r = depth0Returning(toks)
        val head = sql.substring(0, toks(r).start)
        val list = sql.substring(toks(r).end).trim
        if (list.isEmpty) throw SqlParseException("empty RETURNING list")
        XtStatement.WithReturning(parse(head), list)
      case "INSERT" => parseInsert(sql, toks)
      case "UPDATE" => parseUpdate(sql, toks)
      case "DELETE" => parseDelete(sql, toks)
      case "ERASE" => parseErase(sql, toks)
      case "PATCH" => parsePatch(sql, toks)
      case "ASSERT" => parseAssert(sql, toks)
      case "COPY" => parseCopy(sql, toks)
      case "CREATE" => parseCreate(sql, toks)
      case "ALTER" => parseAlter(sql, toks)
      case "GRANT" | "REVOKE" => parseGrantRevoke(sql, toks)
      case "BEGIN" | "START" => parseBegin(sql, toks)
      case "COMMIT" => XtStatement.Commit
      case "ROLLBACK" => XtStatement.Rollback
      case "SET" => parseSet(sql, toks)
      case "SHOW" => parseShow(sql, toks)
      case "PREPARE" => parsePrepare(sql, toks)
      case "EXECUTE" => parseExecute(sql, toks)
      case "ATTACH" =>
        expect(toks, 1, "DATABASE")
        val name = tableNameAt(toks, 2)
        val cfg =
          if (toks.length > 3 && toks(3).is("WITH") && toks.length > 4 &&
              toks(4).kind == Tok.Str)
            Some(toks(4).text.substring(1, toks(4).text.length - 1))
          else None
        XtStatement.AttachDb(name, cfg)
      case "DETACH" =>
        expect(toks, 1, "DATABASE")
        XtStatement.DetachDb(tableNameAt(toks, 2))
      case _ => XtStatement.Query(parseQuery(sql, dbNames))
    }
  }

  /** Index of a depth-0 RETURNING keyword, or -1 (paren-nested and
    * string-literal occurrences never match — the lexer already skips
    * literals). */
  private def depth0Returning(toks: Vector[Tok]): Int = {
    var d = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).isPunct("(")) d += 1
      else if (toks(i).isPunct(")")) d -= 1
      else if (d == 0 && toks(i).is("RETURNING")) return i
      i += 1
    }
    -1
  }

  // ---- session statements (Sql.g4:37-54) ----------------------------------

  private def parseBegin(sql: String, toks: Vector[Tok]): XtStatement = {
    var i = 1
    if (i < toks.length && toks(i).is("TRANSACTION")) i += 1
    var readOnly = false
    var systemTime: Option[String] = None
    while (i < toks.length) {
      if (toks(i).is("READ") && i + 1 < toks.length) {
        readOnly = toks(i + 1).is("ONLY")
        if (!readOnly && !toks(i + 1).is("WRITE"))
          throw SqlParseException(
            s"expected ONLY or WRITE at ${pos(toks, i + 1)}")
        i += 2
      } else if (toks(i).is("ISOLATION")) {
        // ISOLATION LEVEL <words> — parsed, ignored (serialized writer)
        i += 2
        while (i < toks.length && toks(i).kind == Tok.Ident &&
          !toks(i).is("READ") && !toks(i).is("WITH")) i += 1
      } else if (toks(i).is("WITH") && i + 1 < toks.length &&
          toks(i + 1).isPunct("(")) {
        val close = matchParen(toks, i + 1)
        var j = i + 2
        while (j < close) {
          if (toks(j).is("SYSTEM_TIME")) {
            var k = j + 1
            if (k < close && toks(k).isPunct("=")) k += 1
            var e = k
            var d = 0
            while (e < close && !(d == 0 && toks(e).isPunct(","))) {
              if (toks(e).isPunct("(")) d += 1
              else if (toks(e).isPunct(")")) d -= 1
              e += 1
            }
            systemTime = Some(sql.substring(toks(k).start, toks(e - 1).end))
            j = e
          } else j += 1
        }
        i = close + 1
      } else if (toks(i).isPunct(",")) i += 1
      else throw SqlParseException(
        s"unexpected token in BEGIN at ${pos(toks, i)}")
    }
    XtStatement.Begin(readOnly, systemTime)
  }

  private def parseSet(sql: String, toks: Vector[Tok]): XtStatement = {
    var i = 1
    if (i < toks.length && toks(i).is("SESSION") &&
        !(i + 1 < toks.length && toks(i + 1).is("CHARACTERISTICS"))) i += 1
    if (i >= toks.length) throw SqlParseException("SET of nothing")
    if (toks(i).is("TIME") && i + 1 < toks.length && toks(i + 1).is("ZONE"))
      XtStatement.SetTimeZone(restText(sql, toks, i + 2).trim)
    else if (toks(i).is("TIMEZONE"))
      XtStatement.SetTimeZone(restText(sql, toks, i + 1).trim)
    else if (toks(i).is("TRANSACTION") || toks(i).is("SESSION"))
      // SET TRANSACTION ISOLATION LEVEL … / SET SESSION CHARACTERISTICS … —
      // accepted and recorded; the single-writer log serializes anyway
      XtStatement.SetSessionVar("transaction_characteristics",
        restText(sql, toks, i + 1).trim)
    else {
      val name = identName(toks(i)).toLowerCase
      var j = i + 1
      if (j < toks.length && (toks(j).is("TO") || toks(j).isPunct("=")))
        j += 1
      else throw SqlParseException(s"expected TO or = at ${pos(toks, j)}")
      XtStatement.SetSessionVar(name, restText(sql, toks, j).trim)
    }
  }

  private def parseShow(sql: String, toks: Vector[Tok]): XtStatement = {
    if (toks.length < 2)
      throw SqlParseException("SHOW of nothing")
    if (toks(1).is("TRANSACTION")) XtStatement.ShowVar("transaction_isolation")
    else if (toks(1).is("TIME") || toks(1).is("TIMEZONE"))
      XtStatement.ShowVar("timezone")
    else XtStatement.ShowVar(identName(toks(1)).toLowerCase)
  }

  private def parsePrepare(sql: String, toks: Vector[Tok]): XtStatement = {
    val name = tableNameAt(toks, 1)
    expect(toks, 2, "AS")
    val stmt = restText(sql, toks, 3).trim
    if (stmt.isEmpty) throw SqlParseException("PREPARE without a statement")
    XtStatement.Prepare(name, stmt)
  }

  private def parseExecute(sql: String, toks: Vector[Tok]): XtStatement = {
    val name = tableNameAt(toks, 1)
    val args =
      if (toks.length > 2 && toks(2).isPunct("(")) {
        val close = matchParen(toks, 2)
        val out = Vector.newBuilder[String]
        var start = 3
        var d = 0
        var j = 3
        while (j < close) {
          if (toks(j).isPunct("(")) d += 1
          else if (toks(j).isPunct(")")) d -= 1
          else if (d == 0 && toks(j).isPunct(",")) {
            out += sql.substring(toks(start).start, toks(j - 1).end)
            start = j + 1
          }
          j += 1
        }
        if (start < close)
          out += sql.substring(toks(start).start, toks(close - 1).end)
        out.result()
      } else Vector.empty
    XtStatement.ExecuteStmt(name, args)
  }

  // ---- query path ---------------------------------------------------------

  def parseQuery(sql: String): ParsedQuery = parseQuery(sql, Set.empty)

  /** `dbNames`: attached-database names (plus the primary's alias) whose
    * qualified refs `db[.public].table` fold to the internal
    * `__db_<db>__<table>` ident before temporal-clause parsing, so
    * `other.t FOR SYSTEM_TIME AS OF …` works like any table ref
    * (reference: 3-part db.schema.table scans, sql.clj:2944). */
  def parseQuery(sql00: String, dbNames: Set[String]): ParsedQuery = {
    // dollar-quoted literals first (idempotent if parse() already did it),
    // then fold qualified refs, so every later pass (and its spans) works
    // on one consistent text
    val sql0 =
      try SqlLexer.normalizeDollarQuotes(sql00)
      catch { case e: IllegalArgumentException =>
        throw SqlParseException(e.getMessage) }
    val sql: String = if (dbNames.isEmpty) sql0 else {
      val ts = SqlLexer.tokenize(sql0)
      val splices = Vector.newBuilder[(Int, Int, String)]
      var i = 0
      while (i < ts.length) {
        val isDb = ts(i).kind == Tok.Ident &&
          dbNames.contains(ts(i).text.toLowerCase(java.util.Locale.ROOT)) &&
          (i == 0 || !ts(i - 1).isPunct("."))
        if (isDb && i + 2 < ts.length && ts(i + 1).isPunct(".") &&
            (ts(i + 2).kind == Tok.Ident || ts(i + 2).kind == Tok.QIdent)) {
          val db = ts(i).text.toLowerCase(java.util.Locale.ROOT)
          // optional `public` schema part: db.public.t
          val (tblTok, end) =
            if (ts(i + 2).is("PUBLIC") && i + 4 < ts.length &&
                ts(i + 3).isPunct(".") &&
                (ts(i + 4).kind == Tok.Ident || ts(i + 4).kind == Tok.QIdent))
              (ts(i + 4), i + 4)
            else (ts(i + 2), i + 2)
          // only table position: next token must not be '(' (function call)
          val isCall = end + 1 < ts.length && ts(end + 1).isPunct("(")
          if (!isCall) {
            splices += ((ts(i).start, ts(end).end,
              s"__db_${db}__${identName(tblTok)}"))
            i = end + 1
          } else i += 1
        } else i += 1
      }
      val s = splices.result()
      if (s.isEmpty) sql0 else SqlLexer.splice(sql0, s)
    }
    var toks = SqlLexer.tokenize(sql)
    // 1. SETTING DEFAULT … prefix
    var defaultValid: SpecAst = SpecAst.Current
    var defaultSystem: SpecAst = SpecAst.Current
    var body = sql
    if (toks.nonEmpty && toks.head.is("SETTING")) {
      var i = 1
      var done = false
      while (!done) {
        expect(toks, i, "DEFAULT"); i += 1
        val dim = dimAt(toks, i); i += 1
        val (spec, next) = parseSpecTail(sql, toks, i)
        if (dim == "VALID_TIME") defaultValid = spec else defaultSystem = spec
        i = next
        if (i < toks.length && toks(i).isPunct(",")) i += 1 else done = true
      }
      body = sql.substring(if (i < toks.length) toks(i).start else sql.length)
    }
    // 2. NEST_ONE / NEST_MANY → scalar subqueries (loop: outermost first,
    //    re-tokenize so nested occurrences and inner temporal refs are seen)
    var guard = 0
    var rewritten = rewriteOneNest(body)
    while (rewritten.isDefined && guard < 64) {
      body = rewritten.get
      rewritten = rewriteOneNest(body)
      guard += 1
    }
    // 2b. quantified comparisons (x > ALL (sub) etc.) — Spark has no native
    //     support; rewrite to count-guarded min/max scalar subqueries
    guard = 0
    rewritten = rewriteOneQuantified(body)
    while (rewritten.isDefined && guard < 64) {
      body = rewritten.get
      rewritten = rewriteOneQuantified(body)
      guard += 1
    }
    // 2b'. infix period predicates (Sql.g4:227-243):
    //      `a [STRICTLY|IMMEDIATELY] OVERLAPS b` → `p_strictly_overlaps(a, b)`
    guard = 0
    rewritten = rewriteOnePeriodPredicate(body)
    while (rewritten.isDefined && guard < 64) {
      body = rewritten.get
      rewritten = rewriteOnePeriodPredicate(body)
      guard += 1
    }
    // 2b''. PG JSON access (`x -> 'k'`, `#>` paths) and regex match
    //       operators (`a ~ 'pat'`) → j_json/j_text/regexp_like calls
    guard = 0
    rewritten = rewriteOneJsonOp(body)
    while (rewritten.isDefined && guard < 64) {
      body = rewritten.get
      rewritten = rewriteOneJsonOp(body)
      guard += 1
    }
    guard = 0
    rewritten = rewriteOneRegexOp(body)
    while (rewritten.isDefined && guard < 64) {
      body = rewritten.get
      rewritten = rewriteOneRegexOp(body)
      guard += 1
    }
    // 2c. object constructors OBJECT(k: v)/RECORD(k: v)/{k: v} →
    //     named_struct (Sql.g4:388-393); outermost-first, re-tokenized so
    //     nested objects are picked up on later passes
    body = rewriteObjects(body)
    // 2d. * EXCLUDE … / * RENAME … (Sql.g4:651-661) → Spark * EXCEPT +
    //     explicit aliased re-projections
    guard = 0
    rewritten = rewriteOneStarClause(body)
    while (rewritten.isDefined && guard < 64) {
      body = rewritten.get
      rewritten = rewriteOneStarClause(body)
      guard += 1
    }
    // 2d'. SQL-standard timestamp type names (Sql.g4 dateTimeType):
    //      `TIMESTAMP [(p)] WITH TIME ZONE` → TIMESTAMP_LTZ (an instant,
    //      rendered in the session zone — SET TIME ZONE governs, mirroring
    //      default_tz_test.clj), `… WITHOUT TIME ZONE` → TIMESTAMP_NTZ
    body = rewriteTimestampTypes(body)
    // 2e. SQL-standard `OFFSET n ROWS` / `FETCH FIRST|NEXT n ROWS ONLY`
    //     (Sql.g4:700-707) → Spark's LIMIT/OFFSET clauses
    body = rewriteFetchOffset(body)
    // 2f. comma-tolerant WHERE (XT-ism, expr_test test-where-commas):
    //     `WHERE a = 1, , b = 2 ,` ≡ AND-chain, bare `WHERE` ≡ true
    body = rewriteWhereCommas(body)
    // 2g. `WITH MATERIALIZED name AS (…)` (with_test mat-clause): the
    //     materialization hint is accepted and dropped — Spark CTEs are
    //     evaluated per Catalyst's own reuse decision; results identical
    locally {
      val ts = SqlLexer.tokenize(body)
      val drops = Vector.newBuilder[(Int, Int, String)]
      var k = 0
      while (k < ts.length) {
        if ((ts(k).is("WITH") || ts(k).isPunct(",")) &&
            k + 3 < ts.length && ts(k + 1).is("MATERIALIZED") &&
            (ts(k + 2).kind == Tok.Ident || ts(k + 2).kind == Tok.QIdent) &&
            ts(k + 3).is("AS"))
          drops += ((ts(k + 1).start, ts(k + 2).start, ""))
        k += 1
      }
      val d = drops.result()
      if (d.nonEmpty) body = SqlLexer.splice(body, d)
    }
    // 3. temporal table refs
    toks = SqlLexer.tokenize(body)
    val refs = Vector.newBuilder[TemporalRef]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val isIdent = t.kind == Tok.Ident || t.kind == Tok.QIdent
      if (isIdent && i + 2 < toks.length && toks(i + 1).is("FOR") &&
          startsTemporalSpec(toks, i + 2)) {
        var j = i + 1
        var valid: Option[SpecAst] = None
        var system: Option[SpecAst] = None
        while (j < toks.length && toks(j).is("FOR") &&
            startsTemporalSpec(toks, j + 1)) {
          val (dim, spec, next) = parseForClause(body, toks, j)
          if (dim == "VALID_TIME") valid = Some(spec) else system = Some(spec)
          j = next
        }
        val tableName =
          if (t.kind == Tok.QIdent) t.text.substring(1, t.text.length - 1)
          else t.text
        // reference with_test 3440: temporal clauses are a scan concept;
        // on a CTE reference they are an error, not silently ignored
        if (cteNames(toks).contains(tableName.toLowerCase))
          throw SqlParseException(
            s"Period specifications not allowed on CTE reference: $tableName")
        refs += TemporalRef(tableName,
          valid.getOrElse(SpecAst.Current), system.getOrElse(SpecAst.Current),
          t.start, toks(j - 1).end)
        i = j
      } else i += 1
    }
    ParsedQuery(body, defaultValid, defaultSystem, refs.result())
  }

  /** Names declared as CTEs anywhere in the text: `WITH [MATERIALIZED |
    * RECURSIVE] name AS (` plus subsequent `, name AS (` members. */
  private def cteNames(toks: Vector[Tok]): Set[String] = {
    val names = Set.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (toks(i).is("WITH") || toks(i).isPunct(",")) {
        var j = i + 1
        if (j < toks.length &&
          (toks(j).is("MATERIALIZED") || toks(j).is("RECURSIVE"))) j += 1
        if (j + 2 < toks.length &&
            (toks(j).kind == Tok.Ident || toks(j).kind == Tok.QIdent) &&
            toks(j + 1).is("AS") && toks(j + 2).isPunct("(")) {
          val t = toks(j)
          names += (if (t.kind == Tok.QIdent)
            t.text.substring(1, t.text.length - 1).toLowerCase
          else t.text.toLowerCase)
        }
      }
      i += 1
    }
    names.result()
  }

  private def dimAt(toks: Vector[Tok], i: Int): String = {
    if (i >= toks.length ||
      (!toks(i).is("VALID_TIME") && !toks(i).is("SYSTEM_TIME")))
      throw SqlParseException(
        s"expected VALID_TIME or SYSTEM_TIME at ${pos(toks, i)}")
    toks(i).upper
  }

  private def pos(toks: Vector[Tok], i: Int): String =
    if (i < toks.length) s"offset ${toks(i).start} ('${toks(i).text}')"
    else "end of input"

  private def expect(toks: Vector[Tok], i: Int, kw: String): Unit =
    if (i >= toks.length || !toks(i).is(kw))
      throw SqlParseException(s"expected $kw at ${pos(toks, i)}")

  /** Does `FOR <here>` open a temporal clause? (Guards against
    * `substring(x FROM 1 FOR 3)` and similar.) */
  private def startsTemporalSpec(toks: Vector[Tok], i: Int): Boolean =
    i < toks.length && (toks(i).is("VALID_TIME") || toks(i).is("SYSTEM_TIME") ||
      (toks(i).is("ALL") && i + 1 < toks.length &&
        (toks(i + 1).is("VALID_TIME") || toks(i + 1).is("SYSTEM_TIME"))))

  /** Parse `FOR …` at token i (which must be FOR); returns (dim, spec,
    * next-token-index). */
  private def parseForClause(sql: String, toks: Vector[Tok],
      i: Int): (String, SpecAst, Int) = {
    var j = i + 1
    if (toks(j).is("ALL")) { // FOR ALL <dim>
      val dim = dimAt(toks, j + 1)
      (dim, SpecAst.All, j + 2)
    } else {
      val dim = dimAt(toks, j)
      j += 1
      val (spec, next) = parseSpecTail(sql, toks, j)
      (dim, spec, next)
    }
  }

  /** Parse the spec after the dimension keyword:
    * `AS OF e | ALL | FROM a TO b | BETWEEN a AND b`. */
  private def parseSpecTail(sql: String, toks: Vector[Tok],
      i0: Int): (SpecAst, Int) = {
    var i = i0
    if (i >= toks.length)
      throw SqlParseException("dangling temporal clause at end of input")
    if (toks(i).is("ALL")) (SpecAst.All, i + 1)
    else if (toks(i).is("AS")) {
      expect(toks, i + 1, "OF")
      val (ts, next) = parseTsExpr(sql, toks, i + 2)
      (SpecAst.AsOf(ts), next)
    } else if (toks(i).is("FROM")) {
      val (from, n1) = parseTsExpr(sql, toks, i + 1)
      expect(toks, n1, "TO")
      val (to, n2) = parseTsExpr(sql, toks, n1 + 1)
      (SpecAst.Range(from, to, inclusiveEnd = false), n2)
    } else if (toks(i).is("BETWEEN")) {
      val (from, n1) = parseTsExpr(sql, toks, i + 1)
      expect(toks, n1, "AND")
      val (to, n2) = parseTsExpr(sql, toks, n1 + 1)
      (SpecAst.Range(from, to, inclusiveEnd = true), n2)
    } else throw SqlParseException(
      s"malformed temporal clause at ${pos(toks, i)}: " +
        "expected AS OF | ALL | FROM … TO … | BETWEEN … AND …")
  }

  /** A timestamp-valued primary: `[TIMESTAMP|DATE] 'lit'`,
    * `CURRENT_TIMESTAMP/CURRENT_DATE/LOCALTIMESTAMP`, `NOW()`, or a
    * parenthesized expression. Returns its source text. */
  private def parseTsExpr(sql: String, toks: Vector[Tok],
      i: Int): (String, Int) = {
    if (i >= toks.length)
      throw SqlParseException("expected timestamp expression at end of input")
    val t = toks(i)
    if ((t.is("TIMESTAMP") || t.is("DATE")) && i + 1 < toks.length &&
        toks(i + 1).kind == Tok.Str)
      (sql.substring(t.start, toks(i + 1).end), i + 2)
    else if (t.kind == Tok.Str) (t.text, i + 1)
    else if (t.is("CURRENT_TIMESTAMP") || t.is("CURRENT_DATE") ||
        t.is("LOCALTIMESTAMP")) (t.text, i + 1)
    else if (t.is("NOW") && i + 2 < toks.length && toks(i + 1).isPunct("(") &&
        toks(i + 2).isPunct(")")) ("current_timestamp", i + 3)
    else if (t.isPunct("(")) {
      val close = matchParen(toks, i)
      (sql.substring(t.start, toks(close).end), close + 1)
    } else throw SqlParseException(
      s"expected timestamp literal/expression at ${pos(toks, i)}")
  }

  /** Index of the ')' matching the '(' at `open`. */
  private def matchParen(toks: Vector[Tok], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < toks.length) {
      if (toks(i).isPunct("(")) depth += 1
      else if (toks(i).isPunct(")")) {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    throw SqlParseException(s"unbalanced parentheses from ${pos(toks, open)}")
  }

  // ---- NEST_ONE / NEST_MANY ----------------------------------------------

  /** Rewrite the first NEST_ONE/NEST_MANY call found; None if none left. */
  private def rewriteOneNest(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if ((t.is("NEST_ONE") || t.is("NEST_MANY")) && i + 1 < toks.length &&
          toks(i + 1).isPunct("(")) {
        val close = matchParen(toks, i + 1)
        val inner = rewriteNestBody(sql, toks, i + 2, close, t.is("NEST_MANY"))
        return Some(SqlLexer.splice(sql,
          Seq((t.start, toks(close).end, inner))))
      }
      i += 1
    }
    None
  }

  /** `(SELECT items FROM rest)` → scalar subquery text. */
  private def rewriteNestBody(sql: String, toks: Vector[Tok], start: Int,
      close: Int, many: Boolean): String = {
    expect(toks, start, "SELECT")
    // find top-level FROM
    var depth = 0
    var fromIdx = -1
    var i = start + 1
    while (i < close && fromIdx < 0) {
      if (toks(i).isPunct("(")) depth += 1
      else if (toks(i).isPunct(")")) depth -= 1
      else if (depth == 0 && toks(i).is("FROM")) fromIdx = i
      i += 1
    }
    if (fromIdx < 0)
      throw SqlParseException("NEST_* subquery must have a FROM clause")
    // split select items at top-level commas
    val items = Vector.newBuilder[(Int, Int)] // token index ranges
    var d = 0
    var s = start + 1
    i = start + 1
    while (i < fromIdx) {
      if (toks(i).isPunct("(")) d += 1
      else if (toks(i).isPunct(")")) d -= 1
      else if (d == 0 && toks(i).isPunct(",")) { items += ((s, i)); s = i + 1 }
      i += 1
    }
    items += ((s, fromIdx))
    val itemList = items.result()
    val fields = itemList.zipWithIndex.map { case ((a, b), idx) =>
      val (exprEnd, name) =
        if (b - a >= 2 && toks(b - 2).is("AS") &&
            (toks(b - 1).kind == Tok.Ident || toks(b - 1).kind == Tok.QIdent))
          (b - 2, identName(toks(b - 1)))
        else if (toks(b - 1).kind == Tok.Ident &&
            (b - a == 1 || (b - a >= 2 && toks(b - 2).isPunct("."))))
          (b, identName(toks(b - 1))) // bare column / dotted path
        else (b, s"col${idx + 1}")
      val exprText = sql.substring(toks(a).start, toks(exprEnd - 1).end)
      s"'$name', ($exprText)"
    }
    val struct = s"named_struct(${fields.mkString(", ")})"
    val rest = sql.substring(toks(fromIdx).start, toks(close - 1).end)
    if (many) s"(SELECT collect_list($struct) $rest)"
    else s"(SELECT $struct $rest)"
  }

  // ---- quantified comparisons (Sql.g4 quantified predicate) --------------

  private val cmpOps = Set(">", ">=", "<", "<=", "=", "<>", "!=")

  /** Rewrite the first `<operand> <cmp> ALL|ANY|SOME (<subquery>)` found.
    * `= ANY` → `IN`, `<> ALL` → `NOT IN`; the ordered comparators become
    * count-guarded min/max scalar subqueries (x > ALL S ⇔ S empty OR
    * x > max(S); empty-set gives true for ALL, false for ANY, matching
    * the standard). Aggregates ignore NULL elements of S — the unknown
    * outcome for a null element that would decide the result is
    * approximated by the non-null extremum. */
  private def rewriteOneQuantified(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if ((t.is("ALL") || t.is("ANY") || t.is("SOME")) && i >= 2 &&
          toks(i - 1).kind == Tok.Punct && cmpOps.contains(toks(i - 1).text) &&
          i + 1 < toks.length && toks(i + 1).isPunct("(")) {
        val op = toks(i - 1).text
        val isAll = t.is("ALL")
        val close = matchParen(toks, i + 1)
        val sub = sql.substring(toks(i + 1).start + 1, toks(close).start)
        // operand: dotted-identifier chain / literal / balanced-paren group
        val opndEnd = i - 2
        var opndStart = opndEnd
        if (toks(opndEnd).isPunct(")")) {
          var depth = 0
          var k = opndEnd
          var found = -1
          while (k >= 0 && found < 0) {
            if (toks(k).isPunct(")")) depth += 1
            else if (toks(k).isPunct("(")) {
              depth -= 1
              if (depth == 0) found = k
            }
            k -= 1
          }
          opndStart = if (found >= 0) found else opndEnd
          // include a function name before the '('
          if (opndStart > 0 && toks(opndStart - 1).kind == Tok.Ident)
            opndStart -= 1
        } else {
          while (opndStart >= 2 && toks(opndStart - 1).isPunct(".") &&
            (toks(opndStart - 2).kind == Tok.Ident ||
              toks(opndStart - 2).kind == Tok.QIdent)) opndStart -= 2
        }
        val operand = sql.substring(toks(opndStart).start, toks(opndEnd).end)
        val replacement = (op, isAll) match {
          case ("=", false) => s"(($operand) IN ($sub))"
          case ("<>", true) | ("!=", true) => s"(($operand) NOT IN ($sub))"
          case (o, all) if Set(">", ">=", "<", "<=").contains(o) =>
            val agg = (o, all) match {
              case (">", true) | (">=", true) => "max"
              case ("<", true) | ("<=", true) => "min"
              case (">", false) | (">=", false) => "min"
              case _ => "max"
            }
            val empty = if (all) "true" else "false"
            s"(CASE WHEN (SELECT count(*) FROM ($sub) __qq) = 0 THEN $empty" +
              s" ELSE ($operand) $o (SELECT $agg(__qv) FROM ($sub) __qq(__qv)) END)"
          case (o, all) => throw SqlParseException(
            s"unsupported quantified comparison: $o ${if (all) "ALL" else "ANY"}")
        }
        return Some(SqlLexer.splice(sql,
          Seq((toks(opndStart).start, toks(close).end, replacement))))
      }
      i += 1
    }
    None
  }

  // ---- OFFSET/FETCH (Sql.g4:700-707) --------------------------------------

  /** SQL-standard timestamp type names → Spark's: `TIMESTAMP [(p)] WITH
    * TIME ZONE` → `TIMESTAMP_LTZ`, `TIMESTAMP [(p)] WITHOUT TIME ZONE` →
    * `TIMESTAMP_NTZ` (Sql.g4 dateTimeType; reference types.clj:258-262).
    * Precision is accepted and dropped — Spark timestamps are fixed
    * microsecond. Bare `TIMESTAMP` (literals, plain casts) is untouched. */
  def rewriteTimestampTypes(sql: String): String = {
    val toks = SqlLexer.tokenize(sql)
    val splices = Vector.newBuilder[(Int, Int, String)]
    var i = 0
    while (i < toks.length) {
      // pg `timestamptz` alias, only in unambiguous type contexts:
      // after a `::` cast, in `CAST(… AS timestamptz)`, or as a typed
      // literal `TIMESTAMPTZ '…'` — never as a bare identifier
      if (toks(i).is("TIMESTAMPTZ") && (
            (i > 0 && toks(i - 1).isPunct("::")) ||
            (i > 0 && toks(i - 1).is("AS") && i + 1 < toks.length &&
              toks(i + 1).isPunct(")")) ||
            (i + 1 < toks.length && toks(i + 1).kind == Tok.Str))) {
        splices += ((toks(i).start, toks(i).end, "TIMESTAMP_LTZ"))
        i += 1
      } else if (toks(i).is("TIMESTAMP")) {
        var j = i + 1
        if (j + 2 < toks.length && toks(j).isPunct("(") &&
            toks(j + 1).kind == Tok.Num && toks(j + 2).isPunct(")")) j += 3
        // two-word `TIME ZONE` or single-word `TIMEZONE` (reference
        // expr_test test-timezone-single-word-syntax)
        val twoWord = j + 2 < toks.length &&
          (toks(j).is("WITH") || toks(j).is("WITHOUT")) &&
          toks(j + 1).is("TIME") && toks(j + 2).is("ZONE")
        val oneWord = !twoWord && j + 1 < toks.length &&
          (toks(j).is("WITH") || toks(j).is("WITHOUT")) &&
          toks(j + 1).is("TIMEZONE")
        if (twoWord || oneWord) {
          val endTok = if (twoWord) toks(j + 2) else toks(j + 1)
          splices += ((toks(i).start, endTok.end,
            if (toks(j).is("WITH")) "TIMESTAMP_LTZ" else "TIMESTAMP_NTZ"))
          i = (if (twoWord) j + 3 else j + 2)
        } else i += 1
      } else i += 1
    }
    val s = splices.result()
    if (s.isEmpty) sql else SqlLexer.splice(sql, s)
  }

  /** Comma-tolerant WHERE (an XT-ism — reference expr_test
    * test-where-commas; sql.clj plans WHERE as an `(and …)` of
    * comma-separated terms): top-level commas inside a WHERE clause become
    * ANDs, empty terms (leading/trailing/doubled commas) are dropped, and
    * a WHERE with no terms at all becomes `WHERE true`. Clause extent is
    * tracked by paren/bracket depth, so list commas (`IN (…)`, `ARRAY[…]`,
    * function args) are never touched. */
  private def rewriteWhereCommas(sql: String): String = {
    var out = sql
    var changed = rewriteOneWhereCommas(out)
    var guard = 0
    while (changed.isDefined && guard < 64) {
      out = changed.get
      changed = rewriteOneWhereCommas(out)
      guard += 1
    }
    out
  }

  /** Rewrites the first WHERE clause (left-to-right) that has top-level
    * commas or no terms; nested WHEREs are picked up on later passes. */
  private def rewriteOneWhereCommas(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    val terminators = Set("GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET",
      "FETCH", "UNION", "INTERSECT", "EXCEPT", "WINDOW", "QUALIFY",
      "RETURNING")
    var i = 0
    while (i < toks.length) {
      if (toks(i).is("WHERE")) {
        var d = 0
        var k = i + 1
        var end = toks.length
        val commas = Vector.newBuilder[Int]
        var done = false
        while (k < toks.length && !done) {
          val u = toks(k)
          if (u.isPunct("(") || u.isPunct("[")) { d += 1; k += 1 }
          else if (u.isPunct(")") || u.isPunct("]")) {
            if (d == 0) { end = k; done = true } else { d -= 1; k += 1 }
          } else if (d == 0 && u.kind == Tok.Ident &&
              terminators(u.upper)) { end = k; done = true }
          else { if (d == 0 && u.isPunct(",")) commas += k; k += 1 }
        }
        val commaIdxs = commas.result()
        val clauseEmpty = end == i + 1
        if (commaIdxs.nonEmpty || clauseEmpty) {
          // token index bounds of each comma-separated term
          val bounds = (Vector(i) ++ commaIdxs ++ Vector(end))
            .sliding(2).map { case Vector(a, b) => (a + 1, b) }.toVector
          val terms = bounds
            .filter { case (a, b) => b > a }
            .map { case (a, b) =>
              sql.substring(toks(a).start, toks(b - 1).end) }
          val clauseEnd =
            if (end < toks.length) toks(end).start else sql.length
          val repl =
            if (terms.isEmpty) "WHERE true "
            else s"WHERE ${terms.mkString(" AND ")} "
          return Some(SqlLexer.splice(sql,
            Seq((toks(i).start, clauseEnd, repl))))
        }
      }
      i += 1
    }
    None
  }

  /** `OFFSET n [ROW|ROWS] [FETCH FIRST|NEXT m [ROW|ROWS] ONLY]` and
    * standalone FETCH → Spark `LIMIT m OFFSET n`. All occurrences
    * (subqueries included); plain `LIMIT`/`OFFSET n` without ROW noise
    * passes through untouched. */
  private def rewriteFetchOffset(sql: String): String = {
    val toks = SqlLexer.tokenize(sql)
    val splices = Vector.newBuilder[(Int, Int, String)]
    var i = 0
    def rowWord(k: Int): Boolean =
      k < toks.length && (toks(k).is("ROW") || toks(k).is("ROWS"))
    // parses `FETCH FIRST|NEXT [m] ROW|ROWS ONLY` at k; returns (m, end)
    def fetchAt(k: Int): Option[(String, Int)] =
      if (k < toks.length && toks(k).is("FETCH") && k + 1 < toks.length &&
          (toks(k + 1).is("FIRST") || toks(k + 1).is("NEXT"))) {
        var j = k + 2
        val m =
          if (j < toks.length && toks(j).kind == Tok.Num) {
            j += 1; toks(j - 1).text
          } else "1"
        if (rowWord(j) && j + 1 < toks.length && toks(j + 1).is("ONLY"))
          Some((m, j + 2))
        else None
      } else None
    while (i < toks.length) {
      if (toks(i).is("OFFSET") && i + 1 < toks.length &&
          toks(i + 1).kind == Tok.Num && rowWord(i + 2)) {
        val n = toks(i + 1).text
        fetchAt(i + 3) match {
          case Some((m, end)) =>
            splices += ((toks(i).start, toks(end - 1).end,
              s"LIMIT $m OFFSET $n"))
            i = end
          case None =>
            splices += ((toks(i).start, toks(i + 2).end, s"OFFSET $n"))
            i += 3
        }
      } else fetchAt(i) match {
        case Some((m, end)) =>
          splices += ((toks(i).start, toks(end - 1).end, s"LIMIT $m"))
          i = end
        case None => i += 1
      }
    }
    val s = splices.result()
    if (s.isEmpty) sql else SqlLexer.splice(sql, s)
  }

  // ---- infix period predicates (Sql.g4:227-243) ---------------------------

  private val periodBases =
    Set("OVERLAPS", "EQUALS", "CONTAINS", "PRECEDES", "SUCCEEDS", "LAGS",
      "LEADS")
  // idents that can never END an lhs operand — a base keyword right after
  // one of these is a function call or a stray word, not an infix predicate
  private val nonOperandWords =
    Set("SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "ON", "WHEN", "THEN",
      "ELSE", "CASE", "END", "BY", "AS", "IN", "IS", "JOIN", "HAVING",
      "GROUP", "ORDER", "BETWEEN", "LIKE", "SET", "VALUES", "DISTINCT",
      "ALL", "ANY", "SOME", "EXISTS", "UNION", "INTERSECT", "EXCEPT",
      "LIMIT", "OFFSET", "STRICTLY", "IMMEDIATELY")

  /** Rewrite the first infix period predicate to its registered p_*
    * function call. `a OVERLAPS b`, `a STRICTLY CONTAINS b`,
    * `period(x, y) IMMEDIATELY PRECEDES t.p` … — operands are
    * dotted-identifier chains, literals, function calls, or balanced-paren
    * groups, exactly the operand shapes the quantified-comparison rewrite
    * accepts. (Point-containment stays the explicit `p_contains_ts(p, ts)`
    * call: infix CONTAINS maps to the period×period predicate.) */
  private def rewriteOnePeriodPredicate(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val isBase = t.kind == Tok.Ident && periodBases.contains(
        t.text.toUpperCase(java.util.Locale.ROOT))
      if (isBase) {
        // optional STRICTLY/IMMEDIATELY modifier directly before the base
        val (modTok, kwStart) =
          if (i >= 1 && (toks(i - 1).is("STRICTLY") ||
              toks(i - 1).is("IMMEDIATELY")))
            (Some(toks(i - 1).text.toLowerCase(java.util.Locale.ROOT)), i - 1)
          else (None, i)
        val lhsEnd = kwStart - 1
        val lhsOk = lhsEnd >= 0 && {
          val p = toks(lhsEnd)
          (p.kind == Tok.Ident &&
            !nonOperandWords.contains(p.text.toUpperCase(java.util.Locale.ROOT))) ||
            p.kind == Tok.QIdent || p.kind == Tok.Num ||
            p.kind == Tok.Str || p.isPunct(")")
        }
        val rhsStart = i + 1
        if (lhsOk && rhsStart < toks.length) {
          // lhs: balanced group (incl. function name) or dotted chain
          var lhsStart = lhsEnd
          if (toks(lhsEnd).isPunct(")")) {
            var depth = 0
            var k = lhsEnd
            var found = -1
            while (k >= 0 && found < 0) {
              if (toks(k).isPunct(")")) depth += 1
              else if (toks(k).isPunct("(")) {
                depth -= 1
                if (depth == 0) found = k
              }
              k -= 1
            }
            lhsStart = if (found >= 0) found else lhsEnd
            // include a function name before '(' — but never a keyword
            // (`SELECT (a) SUCCEEDS …` must not absorb SELECT)
            if (lhsStart > 0 && toks(lhsStart - 1).kind == Tok.Ident &&
                !nonOperandWords.contains(
                  toks(lhsStart - 1).text.toUpperCase(java.util.Locale.ROOT)))
              lhsStart -= 1
          } else {
            while (lhsStart >= 2 && toks(lhsStart - 1).isPunct(".") &&
              (toks(lhsStart - 2).kind == Tok.Ident ||
                toks(lhsStart - 2).kind == Tok.QIdent)) lhsStart -= 2
          }
          // rhs: paren group | (dotted chain)(function call)? | literal
          var rhsEnd = -1
          val r0 = toks(rhsStart)
          if (r0.isPunct("(")) rhsEnd = matchParen(toks, rhsStart)
          else if (r0.kind == Tok.Ident || r0.kind == Tok.QIdent) {
            var k = rhsStart
            while (k + 2 < toks.length && toks(k + 1).isPunct(".") &&
              (toks(k + 2).kind == Tok.Ident ||
                toks(k + 2).kind == Tok.QIdent)) k += 2
            rhsEnd =
              if (k + 1 < toks.length && toks(k + 1).isPunct("("))
                matchParen(toks, k + 1)
              else k
          } else if (r0.kind == Tok.Num || r0.kind == Tok.Str) rhsEnd = rhsStart
          if (rhsEnd >= 0) {
            val fn = "p_" + modTok.map(_ + "_").getOrElse("") +
              t.text.toLowerCase(java.util.Locale.ROOT)
            val lhs = sql.substring(toks(lhsStart).start, toks(lhsEnd).end)
            val rhs = sql.substring(toks(rhsStart).start, toks(rhsEnd).end)
            return Some(SqlLexer.splice(sql,
              Seq((toks(lhsStart).start, toks(rhsEnd).end,
                s"$fn(($lhs), ($rhs))"))))
          }
        }
      }
      i += 1
    }
    None
  }

  // ---- PG JSON access (-> ->> #> #>>, Sql.g4:273-276) and regex match
  // (~ ~* !~ !~*, Sql.g4:743) infix operators -------------------------------

  /** Start index of the operand that ends at `lhsEnd`: a balanced
    * paren/bracket group (with optional function name), a dotted
    * identifier chain, or a literal. -1 when the token at `lhsEnd` cannot
    * end an operand (keyword, comma, other punct) — which is how a unary
    * `~` (bit-not) or a lambda-less context is told apart from an infix
    * operator. */
  private def operandStartBefore(toks: Vector[Tok], lhsEnd: Int): Int = {
    if (lhsEnd < 0) return -1
    val p = toks(lhsEnd)
    val ok = (p.kind == Tok.Ident &&
      !nonOperandWords.contains(p.text.toUpperCase(java.util.Locale.ROOT))) ||
      p.kind == Tok.QIdent || p.kind == Tok.Num || p.kind == Tok.Str ||
      p.isPunct(")") || p.isPunct("]")
    if (!ok) return -1
    var lhsStart = lhsEnd
    if (p.isPunct(")") || p.isPunct("]")) {
      val open = if (p.isPunct(")")) "(" else "["
      var depth = 0
      var k = lhsEnd
      var found = -1
      while (k >= 0 && found < 0) {
        if (toks(k).isPunct(p.text)) depth += 1
        else if (toks(k).isPunct(open)) {
          depth -= 1
          if (depth == 0) found = k
        }
        k -= 1
      }
      lhsStart = if (found >= 0) found else lhsEnd
      if (lhsStart > 0 && toks(lhsStart - 1).kind == Tok.Ident &&
          !nonOperandWords.contains(
            toks(lhsStart - 1).text.toUpperCase(java.util.Locale.ROOT)))
        lhsStart -= 1
    } else if (p.kind == Tok.Ident || p.kind == Tok.QIdent) {
      while (lhsStart >= 2 && toks(lhsStart - 1).isPunct(".") &&
        (toks(lhsStart - 2).kind == Tok.Ident ||
          toks(lhsStart - 2).kind == Tok.QIdent)) lhsStart -= 2
    }
    lhsStart
  }

  private val jsonOps = Set("->", "->>", "#>", "#>>")
  private val simpleJsonKey =
    java.util.regex.Pattern.compile("^[A-Za-z_][A-Za-z0-9_]*$")

  /** One JSON-path element from a literal token: integer → `[n]` (array
    * index), string → `.key` or bracket-quoted when not a simple word. */
  private def jsonPathElem(t: Tok): Option[String] = t.kind match {
    case Tok.Num if !t.text.contains(".") => Some(s"[${t.text}]")
    case Tok.Str =>
      val k = t.text.substring(1, t.text.length - 1).replace("''", "'")
      Some(if (simpleJsonKey.matcher(k).matches) "." + k
      else "['" + k.replace("'", "\\'") + "']")
    case _ => None
  }

  /** Rewrite the first `x -> 'k'` / `x ->> 0` / `x #> ARRAY['a','b']` /
    * `x #>> ARRAY[…]` to `j_json`/`j_text` calls with the JSON path
    * compiled at parse time (the path argument of the underlying Spark
    * expressions must be foldable, so only literal keys/arrays are legal —
    * exactly the reference grammar's shape). Chains (`x -> 'a' ->> 'b'`)
    * resolve over successive passes, leftmost first. */
  private def rewriteOneJsonOp(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == Tok.Punct && jsonOps.contains(t.text)) {
        val lhsStart = operandStartBefore(toks, i - 1)
        val rhsStart = i + 1
        if (lhsStart >= 0 && rhsStart < toks.length) {
          var rhsEnd = -1
          var path: String = null
          if (!t.text.startsWith("#")) { // -> / ->> : one literal elem
            jsonPathElem(toks(rhsStart)).foreach { e =>
              path = "$" + e
              rhsEnd = rhsStart
            }
          } else if (toks(rhsStart).is("ARRAY") && rhsStart + 1 < toks.length
              && toks(rhsStart + 1).isPunct("[")) { // #> / #>> : ARRAY[…]
            var depth = 0
            var k = rhsStart + 1
            var close = -1
            while (k < toks.length && close < 0) {
              if (toks(k).isPunct("[")) depth += 1
              else if (toks(k).isPunct("]")) {
                depth -= 1
                if (depth == 0) close = k
              }
              k += 1
            }
            if (close > 0) {
              val elems = Vector.newBuilder[String]
              var ok = true
              var expectElem = true
              var j = rhsStart + 2
              while (j < close && ok) {
                if (expectElem) jsonPathElem(toks(j)) match {
                  case Some(e) => elems += e; expectElem = false
                  case None => ok = false
                } else if (toks(j).isPunct(",")) expectElem = true
                else ok = false
                j += 1
              }
              if (ok && (!expectElem || close == rhsStart + 2)) {
                path = "$" + elems.result().mkString
                rhsEnd = close
              }
            }
          }
          if (rhsEnd >= 0) {
            val fn =
              if (t.text == "->" || t.text == "#>") "j_json" else "j_text"
            val lhs = sql.substring(toks(lhsStart).start, toks(i - 1).end)
            val pathLit = "'" + path.replace("'", "''") + "'"
            return Some(SqlLexer.splice(sql,
              Seq((toks(lhsStart).start, toks(rhsEnd).end,
                s"$fn(($lhs), $pathLit)"))))
          }
        }
      }
      i += 1
    }
    None
  }

  // op → (negated, case-insensitive)
  private val regexOps: Map[String, (Boolean, Boolean)] = Map(
    "~" -> ((false, false)), "~*" -> ((false, true)),
    "!~" -> ((true, false)), "!~*" -> ((true, true)))

  /** Rewrite the first PG regex-match operator to `regexp_like`. A `~`
    * with no operand to its left is unary bit-not and is left alone. */
  private def rewriteOneRegexOp(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == Tok.Punct && regexOps.contains(t.text)) {
        val lhsStart = operandStartBefore(toks, i - 1)
        val rhsStart = i + 1
        if (lhsStart >= 0 && rhsStart < toks.length) {
          var rhsEnd = -1
          val r0 = toks(rhsStart)
          if (r0.isPunct("(")) rhsEnd = matchParen(toks, rhsStart)
          else if (r0.kind == Tok.Ident || r0.kind == Tok.QIdent) {
            var k = rhsStart
            while (k + 2 < toks.length && toks(k + 1).isPunct(".") &&
              (toks(k + 2).kind == Tok.Ident ||
                toks(k + 2).kind == Tok.QIdent)) k += 2
            rhsEnd =
              if (k + 1 < toks.length && toks(k + 1).isPunct("("))
                matchParen(toks, k + 1)
              else k
          } else if (r0.kind == Tok.Str) rhsEnd = rhsStart
          if (rhsEnd >= 0) {
            val (neg, ci) = regexOps(t.text)
            val lhs = sql.substring(toks(lhsStart).start, toks(i - 1).end)
            val rhs = sql.substring(toks(rhsStart).start, toks(rhsEnd).end)
            val pat = if (ci) s"concat('(?i)', ($rhs))" else s"($rhs)"
            val call = s"regexp_like(($lhs), $pat)"
            return Some(SqlLexer.splice(sql,
              Seq((toks(lhsStart).start, toks(rhsEnd).end,
                if (neg) s"(NOT $call)" else s"($call)"))))
          }
        }
      }
      i += 1
    }
    None
  }

  // ---- object constructors (Sql.g4 objectConstructor) ---------------------

  /** Rewrite every OBJECT(k: v)/RECORD(k: v)/{k: v} constructor in `sql`
    * to `named_struct('k', (v), …)`. Public: the engine also applies it to
    * RECORDS field expressions, where nested objects are legal. */
  def rewriteObjects(sql: String): String = {
    var body = sql
    var guard = 0
    var next = rewriteOneObject(body)
    while (next.isDefined && guard < 64) {
      body = next.get
      next = rewriteOneObject(body)
      guard += 1
    }
    body
  }

  private def rewriteOneObject(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if ((t.is("OBJECT") || t.is("RECORD")) && i + 1 < toks.length &&
          toks(i + 1).isPunct("(") && looksLikeObjectBody(toks, i + 2)) {
        val close = matchParen(toks, i + 1)
        val fields = parseObjectFields(sql, toks, i + 2, close)
        return Some(SqlLexer.splice(sql,
          Seq((t.start, toks(close).end, namedStruct(fields)))))
      }
      if (t.isPunct("{") && looksLikeObjectBody(toks, i + 1)) {
        val (rec, next) = parseRecord(sql, toks, i)
        return Some(SqlLexer.splice(sql,
          Seq((t.start, toks(next - 1).end, namedStruct(rec)))))
      }
      i += 1
    }
    None
  }

  /** `name :` (or immediate close) — distinguishes an object body from a
    * function call or block. */
  private def looksLikeObjectBody(toks: Vector[Tok], i: Int): Boolean =
    (i < toks.length && (toks(i).isPunct(")") || toks(i).isPunct("}"))) ||
      (i + 1 < toks.length &&
        (toks(i).kind == Tok.Ident || toks(i).kind == Tok.QIdent ||
          toks(i).kind == Tok.Str) && toks(i + 1).isPunct(":"))

  /** Fields of `OBJECT( … )` between token indices [start, close). */
  private def parseObjectFields(sql: String, toks: Vector[Tok], start: Int,
      close: Int): Record = {
    val fields = Vector.newBuilder[(String, String)]
    var i = start
    while (i < close) {
      val name = toks(i).kind match {
        case Tok.Ident | Tok.QIdent => identName(toks(i))
        case Tok.Str => toks(i).text.substring(1, toks(i).text.length - 1)
        case _ =>
          throw SqlParseException(s"expected field name at ${pos(toks, i)}")
      }
      if (!toks(i + 1).isPunct(":"))
        throw SqlParseException(s"expected : at ${pos(toks, i + 1)}")
      var j = i + 2
      var d = 0
      while (j < close && !(d == 0 && toks(j).isPunct(","))) {
        if (toks(j).isPunct("(") || toks(j).isPunct("[") ||
          toks(j).isPunct("{")) d += 1
        else if (toks(j).isPunct(")") || toks(j).isPunct("]") ||
          toks(j).isPunct("}")) d -= 1
        j += 1
      }
      fields += ((name, sql.substring(toks(i + 2).start, toks(j - 1).end)))
      i = j + 1
    }
    fields.result()
  }

  private def namedStruct(fields: Record): String =
    if (fields.isEmpty) "named_struct()"
    else "named_struct(" +
      fields.map { case (n, e) => s"'$n', ($e)" }.mkString(", ") + ")"

  // ---- * EXCLUDE / * RENAME (Sql.g4 excludeClause/qualifiedRenameClause) --

  /** Rewrite the first `* EXCLUDE …` / `* RENAME …` found: EXCLUDE columns
    * and rename sources drop via Spark's `* EXCEPT (…)`; renamed columns
    * re-project as trailing `src AS dst` items. */
  private def rewriteOneStarClause(sql: String): Option[String] = {
    val toks = SqlLexer.tokenize(sql)
    var i = 0
    while (i < toks.length) {
      if (toks(i).isPunct("*") && i + 1 < toks.length &&
          (toks(i + 1).is("EXCLUDE") || toks(i + 1).is("RENAME"))) {
        var j = i + 1
        var excludes = Vector.empty[String]
        var renames = Vector.empty[(String, String)]
        if (toks(j).is("EXCLUDE")) {
          val (cols, n) = parseIdentList(toks, j + 1)
          excludes = cols; j = n
        }
        if (j < toks.length && toks(j).is("RENAME")) {
          val (pairs, n) = parseRenameList(toks, j + 1)
          renames = pairs; j = n
        }
        val dropList = excludes ++ renames.map(_._1)
        val parts =
          (if (dropList.nonEmpty) Seq(s"EXCEPT (${dropList.mkString(", ")})")
           else Seq.empty) ++
            renames.map { case (src, dst) => s", $src AS $dst" }
        return Some(SqlLexer.splice(sql,
          Seq((toks(i + 1).start, toks(j - 1).end, parts.mkString(" ")))))
      }
      i += 1
    }
    None
  }

  /** `ident` or `(ident, …)` — returns (names, next index). */
  private def parseIdentList(toks: Vector[Tok],
      i0: Int): (Vector[String], Int) = {
    if (i0 < toks.length && toks(i0).isPunct("(")) {
      val close = matchParen(toks, i0)
      val names = (i0 + 1 until close).filter(k =>
        toks(k).kind == Tok.Ident || toks(k).kind == Tok.QIdent)
        .map(k => identName(toks(k))).toVector
      (names, close + 1)
    } else if (i0 < toks.length &&
        (toks(i0).kind == Tok.Ident || toks(i0).kind == Tok.QIdent))
      (Vector(identName(toks(i0))), i0 + 1)
    else throw SqlParseException(s"expected column list at ${pos(toks, i0)}")
  }

  /** `a AS b` / `(a AS b, c AS d)`; AS is optional per the grammar's
    * asClause. Returns (pairs, next index). */
  private def parseRenameList(toks: Vector[Tok],
      i0: Int): (Vector[(String, String)], Int) = {
    def pair(i: Int): ((String, String), Int) = {
      if (i >= toks.length ||
        (toks(i).kind != Tok.Ident && toks(i).kind != Tok.QIdent))
        throw SqlParseException(s"expected column name at ${pos(toks, i)}")
      val src = identName(toks(i))
      var j = i + 1
      if (j < toks.length && toks(j).is("AS")) j += 1
      if (j >= toks.length ||
        (toks(j).kind != Tok.Ident && toks(j).kind != Tok.QIdent))
        throw SqlParseException(s"expected new name at ${pos(toks, j)}")
      ((src, identName(toks(j))), j + 1)
    }
    if (i0 < toks.length && toks(i0).isPunct("(")) {
      val close = matchParen(toks, i0)
      val pairs = Vector.newBuilder[(String, String)]
      var i = i0 + 1
      while (i < close) {
        val (p, n) = pair(i)
        pairs += p
        i = if (n < close && toks(n).isPunct(",")) n + 1 else n
      }
      (pairs.result(), close + 1)
    } else {
      val (p, n) = pair(i0)
      (Vector(p), n)
    }
  }

  private def identName(t: Tok): String =
    if (t.kind == Tok.QIdent) t.text.substring(1, t.text.length - 1)
    else t.text

  // ---- DML ----------------------------------------------------------------

  private def tableNameAt(toks: Vector[Tok], i: Int): String = {
    if (i >= toks.length ||
      (toks(i).kind != Tok.Ident && toks(i).kind != Tok.QIdent))
      throw SqlParseException(s"expected table name at ${pos(toks, i)}")
    identName(toks(i))
  }

  /** Optional `FOR [PORTION OF] VALID_TIME FROM a [TO b]`; returns (range,
    * next index). */
  private def parseDmlValid(sql: String, toks: Vector[Tok],
      i0: Int): (Option[ValidRange], Int) = {
    var i = i0
    if (i < toks.length && toks(i).is("FOR")) {
      i += 1
      if (i + 1 < toks.length && toks(i).is("PORTION") && toks(i + 1).is("OF"))
        i += 2
      expect(toks, i, "VALID_TIME"); i += 1
      expect(toks, i, "FROM"); i += 1
      val (from, n1) = parseTsExpr(sql, toks, i)
      i = n1
      if (i < toks.length && toks(i).is("TO")) {
        val (to, n2) = parseTsExpr(sql, toks, i + 1)
        (Some((from, Some(to))), n2)
      } else (Some((from, None)), i)
    } else (None, i)
  }

  private def restText(sql: String, toks: Vector[Tok], i: Int): String =
    if (i < toks.length) sql.substring(toks(i).start) else ""

  private def parseInsert(sql: String, toks: Vector[Tok]): XtStatement = {
    expect(toks, 1, "INTO")
    val table = tableNameAt(toks, 2)
    var i = 3
    // optional (col, col, …) list
    var cols: Option[Seq[String]] = None
    if (i < toks.length && toks(i).isPunct("(")) {
      val close = matchParen(toks, i)
      cols = Some((i + 1 until close).filter(k =>
        toks(k).kind == Tok.Ident || toks(k).kind == Tok.QIdent)
        .map(k => identName(toks(k))))
      i = close + 1
    }
    if (i < toks.length && toks(i).is("RECORDS"))
      XtStatement.Insert(table,
        XtStatement.FromRecords(parseRecords(sql, toks, i + 1)._1))
    else if (i < toks.length && toks(i).is("VALUES")) {
      val colList = cols.getOrElse(throw SqlParseException(
        "INSERT … VALUES requires an explicit column list"))
      val valuesText = restText(sql, toks, i + 1)
      XtStatement.Insert(table, XtStatement.FromQuery(
        s"SELECT * FROM (VALUES $valuesText) AS __ins(${colList.mkString(", ")})"))
    } else {
      val q = restText(sql, toks, i)
      if (q.isEmpty) throw SqlParseException("INSERT without a source")
      XtStatement.Insert(table, XtStatement.FromQuery(q))
    }
  }

  private def parseUpdate(sql: String, toks: Vector[Tok]): XtStatement = {
    val table = tableNameAt(toks, 1)
    val (valid, afterValid) = parseDmlValid(sql, toks, 2)
    expect(toks, afterValid, "SET")
    var i = afterValid + 1
    val sets = Vector.newBuilder[(String, String)]
    var whereIdx = -1
    var done = false
    while (!done) {
      val name = identName(toks(i))
      if (!toks(i + 1).isPunct("="))
        throw SqlParseException(s"expected = at ${pos(toks, i + 1)}")
      var j = i + 2
      var d = 0
      // expression runs to top-level ',' or WHERE or end
      while (j < toks.length && !(d == 0 && (toks(j).isPunct(",") ||
          toks(j).is("WHERE")))) {
        if (toks(j).isPunct("(")) d += 1
        else if (toks(j).isPunct(")")) d -= 1
        j += 1
      }
      sets += ((name, sql.substring(toks(i + 2).start, toks(j - 1).end)))
      if (j >= toks.length) done = true
      else if (toks(j).is("WHERE")) { whereIdx = j; done = true }
      else i = j + 1 // skip ','
    }
    val where =
      if (whereIdx >= 0) Some(restText(sql, toks, whereIdx + 1)) else None
    XtStatement.Update(table, valid, sets.result(), where)
  }

  private def parseDelete(sql: String, toks: Vector[Tok]): XtStatement = {
    expect(toks, 1, "FROM")
    val table = tableNameAt(toks, 2)
    val (valid, i) = parseDmlValid(sql, toks, 3)
    val where =
      if (i < toks.length && toks(i).is("WHERE"))
        Some(restText(sql, toks, i + 1))
      else if (i < toks.length)
        throw SqlParseException(s"unexpected tokens at ${pos(toks, i)}")
      else None
    XtStatement.Delete(table, valid, where)
  }

  private def parseErase(sql: String, toks: Vector[Tok]): XtStatement = {
    expect(toks, 1, "FROM")
    val table = tableNameAt(toks, 2)
    expect(toks, 3, "WHERE")
    XtStatement.Erase(table, restText(sql, toks, 4))
  }

  private def parsePatch(sql: String, toks: Vector[Tok]): XtStatement = {
    expect(toks, 1, "INTO")
    val table = tableNameAt(toks, 2)
    val (valid, i) = parseDmlValid(sql, toks, 3)
    expect(toks, i, "RECORDS")
    XtStatement.Patch(table, valid, parseRecords(sql, toks, i + 1)._1)
  }

  private def parseAssert(sql: String, toks: Vector[Tok]): XtStatement = {
    // ASSERT <cond> [, 'message']  — message must be a trailing string lit
    val last = toks.last
    if (toks.length >= 3 && last.kind == Tok.Str &&
        toks(toks.length - 2).isPunct(",")) {
      val cond = sql.substring(toks(1).start, toks(toks.length - 3).end)
      XtStatement.Assert(cond,
        Some(last.text.substring(1, last.text.length - 1)))
    } else XtStatement.Assert(restText(sql, toks, 1), None)
  }

  private def parseCopy(sql: String, toks: Vector[Tok]): XtStatement = {
    val table = tableNameAt(toks, 1)
    val outbound =
      if (toks.length > 2 && toks(2).is("TO")) true
      else { expect(toks, 2, "FROM"); false }
    if (toks.length <= 3 || toks(3).kind != Tok.Str)
      throw SqlParseException(s"expected path at ${pos(toks, 3)}")
    val path = toks(3).text.substring(1, toks(3).text.length - 1)
    var format: Option[String] = None
    if (toks.length > 4 && toks(4).is("WITH")) {
      // WITH (FORMAT <fmt>)
      val idents = toks.drop(5).filter(t => t.kind == Tok.Ident)
      idents.zipWithIndex.foreach { case (t, i) =>
        if (t.upper == "FORMAT" && i + 1 < idents.length)
          format = Some(idents(i + 1).text.toLowerCase)
      }
    }
    if (outbound) XtStatement.CopyOut(table, path, format)
    else XtStatement.CopyIn(table, path, format)
  }

  private def parseCreate(sql: String, toks: Vector[Tok]): XtStatement = {
    expect(toks, 1, "TABLE")
    val table = tableNameAt(toks, 2)
    if (toks.length <= 3 || !toks(3).isPunct("("))
      throw SqlParseException("CREATE TABLE requires a column list")
    val close = matchParen(toks, 3)
    val layout =
      if (close + 1 < toks.length && toks(close + 1).is("WITH"))
        Some(parseLayoutOptions(toks, close + 2,
          keyName = "layout_key", bucketsName = "layout_buckets"))
      else None
    XtStatement.CreateTable(table,
      sql.substring(toks(4).start, toks(close - 1).end), layout)
  }

  /** ALTER TABLE <t> (DECLARE LAYOUT (key = <col>, buckets = <n>) |
    * DROP LAYOUT). */
  private def parseAlter(sql: String, toks: Vector[Tok]): XtStatement = {
    expect(toks, 1, "TABLE")
    val table = tableNameAt(toks, 2)
    if (toks.length > 3 && toks(3).is("DROP")) {
      expect(toks, 4, "LAYOUT")
      if (toks.length > 5)
        throw SqlParseException(
          s"unexpected input after DROP LAYOUT: '${toks(5).text}'")
      XtStatement.DropLayout(table)
    } else {
      expect(toks, 3, "DECLARE")
      expect(toks, 4, "LAYOUT")
      val (key, buckets) = parseLayoutOptions(toks, 5,
        keyName = "key", bucketsName = "buckets")
      // the option list's closing paren must end the statement —
      // symmetric with the DROP LAYOUT trailing-token check
      val close = matchParen(toks, 5)
      if (close + 1 < toks.length)
        throw SqlParseException(
          s"unexpected input after DECLARE LAYOUT (…): " +
            s"'${toks(close + 1).text}'")
      XtStatement.DeclareLayout(table, key, buckets)
    }
  }

  /** `( <keyName> = <col|'col'>, <bucketsName> = <n> )` in either order. */
  private def parseLayoutOptions(toks: Vector[Tok], open: Int,
      keyName: String, bucketsName: String): (String, Int) = {
    if (open >= toks.length || !toks(open).isPunct("("))
      throw SqlParseException(s"expected ($keyName = …, $bucketsName = …)")
    val close = matchParen(toks, open)
    var key: Option[String] = None
    var buckets: Option[Int] = None
    var i = open + 1
    while (i < close - 1) {
      val name = toks(i).text.toLowerCase(java.util.Locale.ROOT)
      if (i + 2 >= close || !toks(i + 1).isPunct("="))
        throw SqlParseException(s"expected <option> = <value> at '$name'")
      val v = toks(i + 2)
      name match {
        case `keyName` =>
          key = Some(
            if (v.kind == Tok.Str) v.text.substring(1, v.text.length - 1)
            else identName(v))
        case `bucketsName` =>
          if (v.kind != Tok.Num)
            throw SqlParseException(s"$bucketsName must be an integer")
          buckets = Some(v.text.toInt)
        case other =>
          throw SqlParseException(s"unknown layout option: $other")
      }
      i += 3
      if (i < close - 1) {
        if (!toks(i).isPunct(","))
          throw SqlParseException("expected ',' between layout options")
        i += 1
      }
    }
    (key.getOrElse(throw SqlParseException(s"missing $keyName")),
      buckets.getOrElse(throw SqlParseException(s"missing $bucketsName")))
  }

  private def parseGrantRevoke(sql: String, toks: Vector[Tok]): XtStatement = {
    val grant = toks.head.is("GRANT")
    val sep = if (grant) "TO" else "FROM"
    val sepIdx = toks.indices.find(i => toks(i).is(sep)).getOrElse(
      throw SqlParseException(s"expected $sep in ${toks.head.upper}"))
    // `GRANT [ROLE] analyst TO alice` — the reference's grammar takes the
    // bare role name; the optional ROLE keyword is normalized away
    val whatFrom = if (sepIdx > 2 && toks(1).is("ROLE")) 2 else 1
    XtStatement.GrantRevoke(grant,
      sql.substring(toks(whatFrom).start, toks(sepIdx - 1).end),
      tableNameAt(toks, sepIdx + 1))
  }

  /** `{k: expr, …}, {…}, …` — returns records + next index. */
  private def parseRecords(sql: String, toks: Vector[Tok],
      i0: Int): (Seq[Record], Int) = {
    val records = Vector.newBuilder[Record]
    var i = i0
    var more = true
    while (more) {
      if (i >= toks.length || !toks(i).isPunct("{"))
        throw SqlParseException(s"expected {{ at ${pos(toks, i)}")
      val (rec, next) = parseRecord(sql, toks, i)
      records += rec
      i = next
      if (i < toks.length && toks(i).isPunct(",")) i += 1 else more = false
    }
    (records.result(), i)
  }

  private def parseRecord(sql: String, toks: Vector[Tok],
      open: Int): (Record, Int) = {
    val fields = Vector.newBuilder[(String, String)]
    var i = open + 1
    while (!toks(i).isPunct("}")) {
      val name = toks(i).kind match {
        case Tok.Ident | Tok.QIdent => identName(toks(i))
        case Tok.Str => toks(i).text.substring(1, toks(i).text.length - 1)
        case _ =>
          throw SqlParseException(s"expected field name at ${pos(toks, i)}")
      }
      if (!toks(i + 1).isPunct(":"))
        throw SqlParseException(s"expected : at ${pos(toks, i + 1)}")
      var j = i + 2
      var d = 0
      while (!(d == 0 && (toks(j).isPunct(",") || toks(j).isPunct("}")))) {
        if (toks(j).isPunct("(") || toks(j).isPunct("[") ||
          toks(j).isPunct("{")) d += 1
        else if (toks(j).isPunct(")") || toks(j).isPunct("]") ||
          toks(j).isPunct("}")) d -= 1
        j += 1
        if (j >= toks.length)
          throw SqlParseException("unterminated record literal")
      }
      fields += ((name, sql.substring(toks(i + 2).start, toks(j - 1).end)))
      i = if (toks(j).isPunct(",")) j + 1 else j
    }
    (fields.result(), i + 1)
  }
}
