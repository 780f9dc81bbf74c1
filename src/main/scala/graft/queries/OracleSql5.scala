package graft.queries

/** DuckDB oracles for ContractQueries5 (SURVEY §5.2 discipline:
  * rounded doubles, BIGINT-aligned ints, total ORDER BY).
  */
object OracleSql5 {

  val all: Map[String, String] = Map(
    // q119: supplier EXCEPT ALL customer keeps a key only where the
    // supplier bag has surplus multiplicity (the reverse direction
    // would drown in customer volume).
    "q119_bagsetops" ->
      """with c as (select cast(c_nationkey as bigint) nk from customer),
        |s as (select cast(s_nationkey as bigint) nk from supplier),
        |i as (select nk from c intersect all select nk from s),
        |x as (select nk from s except all select nk from c)
        |select 'intersect_all' op, nk, cast(count(*) as bigint) m
        |from i group by nk
        |union all
        |select 'except_all', nk, cast(count(*) as bigint) m
        |from x group by nk
        |order by op, nk""".stripMargin,
    // q116: the evolved table = old rows null-filled + the one
    // name-routed insert.
    "q116_alter" ->
      """select cast(n_nationkey as bigint) n_nationkey, n_name,
        |  cast(null as bigint) pop from nation
        |union all
        |select cast(99 as bigint), 'NEWLAND', cast(777 as bigint)
        |order by n_nationkey""".stripMargin,

    // q117: the merge-with-delete replayed relationally — %3 keys
    // vanish, %7 (non-%3) keys become 0.5, everything else keeps its
    // balance.
    "q117_merge_del" ->
      """select c_custkey k,
        |  case when c_custkey % 7 = 0 then 0.5
        |    else round(c_acctbal, 2) end bal
        |from customer
        |where c_custkey % 3 <> 0
        |order by k limit 200""".stripMargin,

    // q115: the crafted malformed lines never reach the result, so the
    // oracle is the original table's rollup.
    "q115_badcsv" ->
      """select cast(n_regionkey as bigint) n_regionkey,
        |  cast(count(*) as bigint) n, min(n_name) mn,
        |  cast(sum(n_nationkey) as bigint) sk
        |from nation group by 1 order by 1""".stripMargin,

    "q111_rollrange" ->
      """with x as (select o_custkey,
        |    cast(date_diff('day', timestamp '1995-01-01', o_orderdate)
        |      as bigint) d,
        |    round(o_totalprice, 2) price
        |  from orders where o_custkey <= 100)
        |select o_custkey, d, price,
        |  round(sum(price) over (partition by o_custkey order by d
        |    range between 6 preceding and current row), 2) roll7,
        |  cast(count(*) over (partition by o_custkey order by d
        |    range between 6 preceding and current row) as bigint) n7
        |from x order by o_custkey, d, price""".stripMargin,

    "q112_boolagg" ->
      """select o_orderstatus,
        |  bool_and(o_totalprice > 1000) all_over_1k,
        |  bool_or(o_orderpriority = '1-URGENT') any_urgent,
        |  cast(count(*) filter (where o_totalprice > 200000) as bigint) n_big,
        |  count(*) n
        |from orders group by 1 order by 1""".stripMargin,

    "q113_str3" ->
      """select c_custkey,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') tr,
        |  split_part(c_mktsegment, 'I', 1) sp,
        |  lpad(c_mktsegment, 12, '.') lp,
        |  rpad(c_mktsegment, 12, '.') rp,
        |  repeat(left(c_mktsegment, 2), 3) rep,
        |  reverse(c_mktsegment) rev,
        |  right(c_mktsegment, 3) rgt
        |from customer order by c_custkey limit 100""".stripMargin,

    "q114_dates3" ->
      """select o_orderkey,
        |  cast(o_orderdate + interval 1 month as date) plus_m,
        |  cast(date '2000-01-31' + interval 1 month as date) leap_clamp,
        |  cast(last_day(o_orderdate) as date) eom,
        |  cast(quarter(o_orderdate) as bigint) q,
        |  cast(dayofweek(o_orderdate) + 1 as bigint) dow1
        |from orders where o_custkey <= 50
        |order by o_orderkey limit 100""".stripMargin,

    // q118: the version chain replayed relationally — the engine side
    // must reproduce it by READING each pinned parquet version.
    "q118_timetravel" ->
      """with v0 as (select c_custkey k, round(c_acctbal, 2) bal from customer),
        |v1 as (select k, case when k <= 50 then round(bal + 100.0, 2)
        |    else bal end bal from v0),
        |v2 as (select * from v1 where k % 7 <> 0)
        |select cast(0 as bigint) ver, k, bal from v0 where k <= 20
        |union all select 1, k, bal from v1 where k <= 20
        |union all select 2, k, bal from v2 where k <= 20
        |order by ver, k""".stripMargin)
}
