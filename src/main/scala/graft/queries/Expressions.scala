package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.PresentOps
import graft.functions.{Ids, Periods, Temporal}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar expression catalog coverage (SURVEY.md §2.9): strings, like/regex,
  * math, CASE/IN/BETWEEN/COALESCE/NULLIF, casts, JSON access, temporal
  * extract/trunc, date_bin, range_bins, age, the 18 period predicates, _iid,
  * uri accessors, keyword namespace/local_name.
  *
  * Reference: core/src/main/clojure/xtdb/expression.clj +
  * expression/temporal.clj. Everything here is built-in Spark functions or
  * the codegen-friendly compositions in graft.functions.* — no UDFs.
  */
object Expressions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- string catalog (expression.clj:1228-1594)
    QueryDef("q50_string_fns", (s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") < 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 8).as("sub"),
          length(col("p_name")).cast("long").as("len"),
          instr(col("p_name"), "a").cast("long").as("pos_a"),
          regexp_replace(col("p_name"), "a", "@").as("repl"),
          reverse(col("p_brand")).as("rev"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, ".").as("rp"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("cat"),
          overlay(col("p_name"), lit("XX"), lit(3), lit(2)).as("ovl"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
             substr(p_name, 1, 8) AS sub, CAST(length(p_name) AS BIGINT) AS len,
             instr(p_name, 'a') AS pos_a,
             regexp_replace(p_name, 'a', '@', 'g') AS repl,
             reverse(p_brand) AS rev,
             trim('  ' || p_brand || '  ') AS trimmed,
             lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '.') AS rp,
             p_brand || '/' || p_type AS cat,
             substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS ovl
      FROM part WHERE p_partkey < 100 ORDER BY p_partkey""")),

    // ---- like / like_regex / regexp_replace (expression.clj:1061-1161)
    QueryDef("q51_like_regex", (s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(
          col("p_partkey"),
          col("p_name").like("%a%").as("has_a"),
          col("p_name").rlike("^[a-z]+ [a-z]+$").as("two_words"),
          col("p_name").like("s_all%").as("like_us"),
          regexp_replace(col("p_type"), "[aeiou]", "_").as("novowel"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, p_name LIKE '%a%' AS has_a,
             regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words,
             p_name LIKE 's_all%' AS like_us,
             regexp_replace(p_type, '[aeiou]', '_', 'g') AS novowel
      FROM part WHERE p_partkey < 200 ORDER BY p_partkey""")),

    // ---- math catalog (expression.clj:872-1050, 1751-1830)
    QueryDef("q52_math_fns", (s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 50)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("absd"),
          floor(col("l_extendedprice")).cast("long").as("flr"),
          ceil(col("l_extendedprice")).cast("long").as("cl"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(pow(col("l_quantity"), 2), 2).as("pw"),
          pmod(col("l_orderkey"), lit(7)).as("md"),
          signum(col("l_discount") - 0.05).cast("long").as("sgn"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_tax"), col("l_discount")).as("ls"))
        .orderBy("l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS absd,
             CAST(floor(l_extendedprice) AS BIGINT) AS flr,
             CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
             round(sqrt(l_quantity), 6) AS sq,
             round(ln(l_extendedprice), 6) AS lg,
             round(exp(l_discount), 6) AS ex,
             round(power(l_quantity, 2), 2) AS pw,
             mod(l_orderkey, 7) AS md,
             CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn,
             greatest(l_quantity, l_discount * 100) AS gr,
             least(l_tax, l_discount) AS ls
      FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber""")),

    // ---- CASE / IN / BETWEEN / COALESCE / NULLIF (Sql.g4:215-295)
    QueryDef("q53_case_in_between", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 250000, "medium")
            .otherwise("large").as("bucket"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hot"),
          col("o_totalprice").between(100000, 200000).as("mid"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("done")).as("st"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 250000 THEN 'medium'
                  ELSE 'large' END AS bucket,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS hot,
             o_totalprice BETWEEN 100000 AND 200000 AS mid,
             coalesce(nullif(o_orderstatus, 'O'), 'done') AS st
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")),

    // ---- cast matrix (expression.clj codegen-cast 221-350; DuckDB CAST of
    // double->int rounds while Spark truncates, so floor() first in both)
    QueryDef("q54_casts", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("k_str"),
          (col("o_orderkey").cast("double") / 2).as("k_dbl"),
          floor(col("o_totalprice")).cast("long").as("p_int"),
          col("o_orderdate").cast("date").cast("string").as("d_str"),
          lit("1996-03-04 12:30:00").cast("timestamp").as("ts_lit"),
          lit("42").cast("long").as("s_int"),
          col("o_orderdate").cast("date").as("d"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS k_str,
             CAST(o_orderkey AS DOUBLE) / 2 AS k_dbl,
             CAST(floor(o_totalprice) AS BIGINT) AS p_int,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d_str,
             TIMESTAMP '1996-03-04 12:30:00' AS ts_lit,
             CAST('42' AS BIGINT) AS s_int,
             CAST(o_orderdate AS DATE) AS d
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")),

    // ---- JSON document access -> / ->> (Sql.g4:273-276; props is a JSON
    // text column on events)
    QueryDef("q55_json_access", (s, dir) => {
      t(s, dir, "events").filter(col("event_id") < 200)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          get_json_object(col("props"), "$.missing").as("missing"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             json_extract_string(props, '$.missing') AS missing
      FROM events WHERE event_id < 200 ORDER BY event_id""")),

    // ---- extract (temporal.clj:1489-1597): YEAR..EPOCH, DOW/ISODOW/DOY/
    // WEEK/QUARTER — DuckDB dow is Sunday=0 (Spark dayofweek is Sunday=1)
    QueryDef("q56_extract", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          weekofyear(col("o_orderdate")).cast("long").as("wk"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          unix_timestamp(col("o_orderdate")).as("ep"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
             CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
             CAST(extract(day FROM o_orderdate) AS BIGINT) AS d,
             CAST(extract(dow FROM o_orderdate) AS BIGINT) AS dow,
             CAST(extract(isodow FROM o_orderdate) AS BIGINT) AS isodow,
             CAST(extract(doy FROM o_orderdate) AS BIGINT) AS doy,
             CAST(extract(week FROM o_orderdate) AS BIGINT) AS wk,
             CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS q,
             CAST(epoch(o_orderdate) AS BIGINT) AS ep
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")),

    // ---- date_trunc millennium..hour (temporal.clj:1599-1734); DuckDB
    // returns DATE for >= day granularities — cast to TIMESTAMP in oracle
    QueryDef("q57_date_trunc", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          date_trunc("year", col("o_orderdate")).as("ty"),
          date_trunc("quarter", col("o_orderdate")).as("tq"),
          date_trunc("month", col("o_orderdate")).as("tm"),
          date_trunc("week", col("o_orderdate")).as("tw"),
          date_trunc("day", col("o_orderdate")).as("td"),
          date_trunc("hour", col("o_orderdate")).as("th"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS ty,
             CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS tq,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS tm,
             CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS tw,
             CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS td,
             CAST(date_trunc('hour', o_orderdate) AS TIMESTAMP) AS th
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")),

    // ---- date_bin: 15-minute epoch-aligned buckets over the event stream
    // (temporal.clj date_bin; emitted as epoch seconds — engine-neutral).
    // Round-8 MEASURED: a fused mapPartitions partial aggregation was
    // tried and FALSIFIED at 25× (0.46-0.54 s vs 0.38-0.45 s hot for this
    // declarative plan — the boxed open-hash pass loses to Tungsten's
    // UnsafeRow hash aggregate; BASELINE.md round-8). The remaining 4×
    // letter is the vectorization constant, not a plan defect.
    QueryDef("q58_date_bin", (s, dir) => {
      t(s, dir, "events")
        .groupBy(unix_timestamp(Temporal.dateBin(900, col("ts"))).as("bin"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .presentSortedK("bin", "event_type")
    }, Some("""
      SELECT ep - (ep % 900) AS bin, event_type, count(*) AS n,
             round(sum(value), 2) AS total
      FROM (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_type, value
            FROM events)
      GROUP BY 1, 2 ORDER BY bin, event_type"""), bench = true),

    // ---- range_bins: weekly epoch-aligned bins covering each order's
    // 30-day period (temporal.clj:2055-2230), exploded
    QueryDef("q59_range_bins", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 20)
        .select(col("o_orderkey"),
          explode(Temporal.rangeBins(604800,
            col("o_orderdate"),
            col("o_orderdate") + expr("INTERVAL 30 DAY"))).as("bin"))
        .select(col("o_orderkey"),
          unix_timestamp(col("bin._from")).as("bin_from"),
          unix_timestamp(col("bin._to")).as("bin_to"))
        .orderBy("o_orderkey", "bin_from")
    }, Some("""
      SELECT o_orderkey, bin_from, bin_from + 604800 AS bin_to FROM (
        SELECT o_orderkey,
               unnest(generate_series(ep - (ep % 604800),
                                      ep + 2592000 - 1, 604800)) AS bin_from
        FROM (SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS ep
              FROM orders WHERE o_orderkey < 20))
      ORDER BY o_orderkey, bin_from""")),

    // ---- age (temporal.clj:1736-1770): symbolic year/month/day interval
    QueryDef("q60_age", (s, dir) => {
      val asOf = lit("2001-09-15").cast("timestamp")
      val (y, m, d) = Temporal.ageParts(asOf, col("o_orderdate"))
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"), y.as("y"), m.as("m"), d.as("d"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CAST(date_part('year', age(TIMESTAMP '2001-09-15', o_orderdate)) AS BIGINT) AS y,
             CAST(date_part('month', age(TIMESTAMP '2001-09-15', o_orderdate)) AS BIGINT) AS m,
             CAST(date_part('day', age(TIMESTAMP '2001-09-15', o_orderdate)) AS BIGINT) AS d
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")),

    // ---- the 18 period predicates (temporal.clj:1997-2079) against a
    // plain-SQL endpoint-comparison oracle. p1 = [orderdate, +30d),
    // p2 = fixed [1996-06-01, 1996-12-01).
    QueryDef("q61_period_predicates", (s, dir) => {
      val p1 = Periods.period(col("o_orderdate"),
        col("o_orderdate") + expr("INTERVAL 30 DAY"))
      val p2 = Periods.period(lit("1996-06-01").cast("timestamp"),
        lit("1996-12-01").cast("timestamp"))
      val mid = lit("1996-09-01").cast("timestamp")
      t(s, dir, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          Periods.overlaps(p1, p2).as("ovl"),
          Periods.strictlyOverlaps(p1, p2).as("sovl"),
          Periods.containsPeriod(p2, p1).as("cont"),
          Periods.strictlyContains(p2, p1).as("scont"),
          Periods.containsPoint(p1, mid).as("cpt"),
          Periods.equalsPeriod(p1, p2).as("eq"),
          Periods.precedes(p1, p2).as("prec"),
          Periods.strictlyPrecedes(p1, p2).as("sprec"),
          Periods.immediatelyPrecedes(p1, p2).as("iprec"),
          Periods.succeeds(p1, p2).as("succ"),
          Periods.strictlySucceeds(p1, p2).as("ssucc"),
          Periods.immediatelySucceeds(p1, p2).as("isucc"),
          Periods.leads(p1, p2).as("leads"),
          Periods.strictlyLeads(p1, p2).as("sleads"),
          Periods.immediatelyLeads(p1, p2).as("ileads"),
          Periods.lags(p1, p2).as("lags"),
          Periods.strictlyLags(p1, p2).as("slags"),
          Periods.immediatelyLags(p1, p2).as("ilags"))
        .orderBy("o_orderkey")
    }, Some("""
      WITH p AS (
        SELECT o_orderkey,
               o_orderdate AS f1, o_orderdate + INTERVAL 30 DAY AS t1,
               TIMESTAMP '1996-06-01' AS f2, TIMESTAMP '1996-12-01' AS t2,
               TIMESTAMP '1996-09-01' AS mid
        FROM orders WHERE o_orderkey < 1000)
      SELECT o_orderkey,
             f1 < t2 AND t1 > f2 AS ovl,
             f1 > f2 AND t1 < t2 AS sovl,
             f2 <= f1 AND t2 >= t1 AS cont,
             f2 < f1 AND t2 > t1 AS scont,
             f1 <= mid AND t1 > mid AS cpt,
             f1 = f2 AND t1 = t2 AS eq,
             t1 <= f2 AS prec, t1 < f2 AS sprec, t1 = f2 AS iprec,
             f1 >= t2 AS succ, f1 > t2 AS ssucc, f1 = t2 AS isucc,
             f1 < f2 AND f2 < t1 AND t1 <= t2 AS leads,
             f1 < f2 AND f2 < t1 AND t1 < t2 AS sleads,
             f1 < f2 AND t1 = t2 AS ileads,
             f1 >= f2 AND f2 < t1 AND t1 > t2 AS lags,
             f1 > f2 AND f2 < t1 AND t1 > t2 AS slags,
             f1 = f2 AND t1 > t2 AS ilags
      FROM p ORDER BY o_orderkey""")),

    // ---- _iid internal identity hash (expression.clj:1112-1131; md5-based,
    // see Ids.iidHex scaladoc for the divergence rationale)
    QueryDef("q62_iid", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"), Ids.iidHex(col("o_orderkey")).as("iid"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS iid
      FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""")),

    // ---- uri accessors (expression/uri.clj:12-65) via parse_url
    QueryDef("q63_uri_fns", (s, dir) => {
      val url = concat(lit("https://h"), col("o_custkey"),
        lit(".example.com/path/"), col("o_orderkey"),
        lit("?q="), col("o_orderstatus"))
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY")).as("query"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             regexp_extract(u, 'https?://([^/]+)', 1) AS host,
             regexp_extract(u, '://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(u, '\?(.*)$', 1) AS query
      FROM (SELECT o_orderkey,
                   'https://h' || o_custkey || '.example.com/path/' ||
                   o_orderkey || '?q=' || o_orderstatus AS u
            FROM orders WHERE o_orderkey < 200)
      ORDER BY o_orderkey""")),

    // ---- keyword namespace / local_name (expression.clj:1342-1371)
    QueryDef("q64_keyword_fns", (s, dir) => {
      val kw = concat(lit("region"), col("n_regionkey"), lit("/"), col("n_name"))
      t(s, dir, "nation")
        .select(col("n_nationkey"), kw.as("kw"),
          substring_index(kw, "/", 1).as("ns"),
          substring_index(kw, "/", -1).as("local"))
        .orderBy("n_nationkey")
    }, Some("""
      SELECT n_nationkey, kw, split_part(kw, '/', 1) AS ns,
             split_part(kw, '/', 2) AS local
      FROM (SELECT n_nationkey,
                   'region' || n_regionkey || '/' || n_name AS kw
            FROM nation)
      ORDER BY n_nationkey""")),

    // ---- collection fns (expression.clj:2159-2366): nth/cardinality/
    // slice/contains over a split-derived array
    QueryDef("q65_array_fns", (s, dir) => {
      val words = split(col("text"), " ")
      t(s, dir, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id"),
          size(words).cast("long").as("card"),
          element_at(words, 1).as("first_w"),
          element_at(words, -1).as("last_w"),
          concat_ws("|", slice(words, 1, 3)).as("head3"),
          array_contains(words, "the").as("has_the"),
          concat_ws("|", array_sort(array_distinct(slice(words, 1, 5)))).as("d5"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, CAST(len(words) AS BIGINT) AS card,
             words[1] AS first_w, words[-1] AS last_w,
             array_to_string(words[1:3], '|') AS head3,
             list_contains(words, 'the') AS has_the,
             array_to_string(list_sort(list_distinct(words[1:5])), '|') AS d5
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
            WHERE doc_id < 30)
      ORDER BY doc_id"""))
  )
}
