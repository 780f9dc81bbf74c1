package graft.queries

/** DuckDB-dialect oracles for ContractQueries4. Dialect notes:
  *  - q85: DuckDB regr_count returns DOUBLE (Postgres heritage) — cast;
  *    the regr_* math itself is the same covar_pop/var_pop arithmetic.
  *  - q86: DuckDB skewness/kurtosis are SAMPLE-corrected; Spark's are
  *    population forms, so the oracle computes the population moments
  *    explicitly from a two-pass mean join. DuckDB sum() on integers
  *    widens to HUGEINT — cast back to BIGINT.
  *  - q93: Spark unix_timestamp TRUNCATES fractional seconds; DuckDB
  *    cast(double as bigint) rounds — floor(epoch(ts)) aligns them.
  */
object OracleSql4 {

  val all: Map[String, String] = Map(
    "q85_regr" ->
      """select l_returnflag,
        |  cast(regr_count(l_extendedprice, l_quantity) as bigint) rc,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) ax,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) ay,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) sl,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) ic,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) r2
        |from lineitem group by l_returnflag order by l_returnflag""".stripMargin,

    "q86_moments" ->
      """with mu as (select o_orderstatus, avg(o_totalprice) m
        |  from orders group by 1)
        |select o.o_orderstatus,
        |  round((sum(pow(o_totalprice - m, 3)) / count(*))
        |        / pow(sum(pow(o_totalprice - m, 2)) / count(*), 1.5), 6) sk,
        |  round((sum(pow(o_totalprice - m, 4)) / count(*))
        |        / pow(sum(pow(o_totalprice - m, 2)) / count(*), 2) - 3, 6) kt,
        |  cast(bit_and(o_custkey) as bigint) ba,
        |  cast(bit_or(o_custkey) as bigint) bo,
        |  cast(bit_xor(o_custkey) as bigint) bx,
        |  count(*) n
        |from orders o join mu using(o_orderstatus)
        |group by o.o_orderstatus order by o.o_orderstatus""".stripMargin,

    "q87_mergeschema" ->
      """select c_mktsegment,
        |  count(*) n,
        |  cast(count(case when c_custkey % 2 = 1 then c_acctbal end) as bigint) n_bal,
        |  round(sum(case when c_custkey % 2 = 1 then c_acctbal end), 2) bal
        |from customer group by c_mktsegment order by c_mktsegment""".stripMargin,

    "q88_url" ->
      """select c_custkey,
        |  'shop.example.com' host,
        |  '/seg/' || lower(c_mktsegment) || '/item' path,
        |  'k=' || c_custkey || '&v=1' query,
        |  c_custkey k
        |from customer order by c_custkey limit 100""".stripMargin,

    "q89_inline" ->
      """with tok as (select doc_id,
        |    list_filter(string_split(text, ' '), w -> w <> '')[1:3] tl
        |  from documents),
        |flat as (
        |  select doc_id, tl[i] tok, cast(i as bigint) pos
        |  from tok, unnest(range(1, len(tl) + 1)) u(i)
        |  where doc_id % 7 <> 0
        |  union all
        |  select doc_id, null, null from tok where doc_id % 7 = 0)
        |select doc_id, tok, pos from flat
        |order by doc_id, pos nulls first limit 200""".stripMargin,

    "q90_rundistinct" ->
      """select o_custkey, o_orderkey,
        |  count(distinct o_orderpriority) over (partition by o_custkey
        |    order by o_orderdate, o_orderkey rows unbounded preceding) rd
        |from orders where o_custkey <= 200
        |order by o_custkey, o_orderkey limit 300""".stripMargin,

    "q91_asof_tol" ->
      """select event_id, user_id, o_orderkey, gap from (
        |  select e.event_id, e.user_id, o.o_orderkey,
        |    date_diff('day', cast(o.o_orderdate as date), cast(e.ts as date)) gap,
        |    row_number() over (partition by e.event_id
        |      order by o.o_orderdate desc, o.o_orderkey desc) rn
        |  from events e join orders o
        |    on o.o_custkey = e.user_id and o.o_orderdate <= e.ts)
        |where rn = 1 and gap <= 8300 order by event_id limit 50""".stripMargin,

    "q92_pdisc" ->
      """select o_orderstatus,
        |  percentile_disc(0.5) within group (order by o_totalprice) pd,
        |  round(percentile_cont(0.25) within group (order by o_totalprice), 4) pc,
        |  count(*) n
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q93_datefmt" ->
      """select event_id, strftime(ts, '%Y-%m') ym, strftime(ts, '%H') hh,
        |  strftime(ts, '%j') doy, cast(floor(epoch(ts)) as bigint) es
        |from events order by event_id limit 100""".stripMargin,

    "q94_maps2" ->
      """select event_id,
        |  cast(json_extract(props, '$.k') as bigint) + 10 za,
        |  2 * cast(json_extract(props, '$.k') as bigint) + 20 zb,
        |  'a:' || json_extract(props, '$.k') || ',b:' ||
        |    (2 * cast(json_extract(props, '$.k') as bigint)) ents,
        |  true has_a
        |from events order by event_id limit 100""".stripMargin,

    "q95_groupby_all" ->
      """select o_orderstatus, o_orderpriority, count(*) n,
        |  round(sum(o_totalprice), 2) total
        |from orders group by all order by all""".stripMargin,

    "q96_ignorenulls" ->
      """with v as (select event_id, user_id, ts,
        |    case when event_type = 'click' then round(value, 2) end v
        |  from events)
        |select event_id, user_id,
        |  last_value(v ignore nulls) over (partition by user_id
        |    order by ts, event_id rows unbounded preceding) carried,
        |  lag(v ignore nulls) over (partition by user_id
        |    order by ts, event_id) prev_v
        |from v order by event_id limit 200""".stripMargin,

    "q97_try2" ->
      """select o_orderkey, o_custkey,
        |  case when o_custkey > 100 then null
        |       else 9223372036854775707 + o_custkey end ta,
        |  case when o_custkey >= 2 then null
        |       else 9223372036854775707 * o_custkey end tm
        |from orders order by o_orderkey limit 100""".stripMargin,

    "q98_arrset" ->
      """with l as (select doc_id,
        |    list_distinct(list_filter(string_split(text, ' '),
        |      w -> w <> '')[1:10]) a
        |  from documents)
        |select doc_id,
        |  coalesce(array_to_string(list_sort(
        |    list_intersect(a, ['the','a','spark','data'])), ','), '') ai,
        |  array_to_string(list_sort(list_distinct(
        |    list_concat(a, ['the','a','spark','data']))), ',') au,
        |  coalesce(array_to_string(list_sort(list_filter(a,
        |    x -> not list_contains(['the','a','spark','data'], x))), ','), '') ae
        |from l order by doc_id limit 100""".stripMargin,

    "q99_dategrid" ->
      """with b as (select date_trunc('month', min(o_orderdate)) lo,
        |    date_trunc('month', max(o_orderdate)) hi from orders),
        |spine as (select unnest(generate_series(lo, hi,
        |    interval 1 month)) m from b),
        |c as (select date_trunc('month', o_orderdate) m, count(*) n,
        |    round(sum(o_totalprice), 2) total
        |  from orders group by 1)
        |select spine.m, coalesce(n, 0) n, coalesce(total, 0) total
        |from spine left join c using(m) order by spine.m""".stripMargin,

    "q100_scd2" ->
      """select user_id, ts valid_from, round(value, 2) v,
        |  lead(ts) over (partition by user_id order by ts, event_id) valid_to,
        |  lead(ts) over (partition by user_id order by ts, event_id)
        |    is null is_current
        |from events where user_id <= 100
        |order by user_id, valid_from limit 300""".stripMargin,

    "q101_view" ->
      """select n_regionkey, count(*) n, min(n_name) mn
        |from nation where n_nationkey >= 10
        |group by 1 order by 1""".stripMargin,

    "q102_params" ->
      """select c_nationkey, count(*) n, round(sum(c_acctbal), 2) bal
        |from customer
        |where c_mktsegment = 'BUILDING' and c_acctbal > 0
        |group by c_nationkey order by c_nationkey""".stripMargin,

    "q103_unionbyname" ->
      """with u as (
        |  select c_custkey, c_mktsegment, null c_acctbal from customer
        |  union all
        |  select c_custkey, null, c_acctbal from customer)
        |select c_custkey % 10 bucket, count(*) n,
        |  cast(count(c_mktsegment) as bigint) n_seg,
        |  cast(count(c_acctbal) as bigint) n_bal,
        |  round(sum(c_acctbal), 2) bal
        |from u group by 1 order by 1""".stripMargin,

    "q104_multidistinct" ->
      """select o_orderstatus,
        |  count(distinct o_custkey) nd_cust,
        |  count(distinct o_orderpriority) nd_prio,
        |  count(distinct year(o_orderdate)) nd_year,
        |  count(*) n
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q105_notin" ->
      """select
        |  (select count(*) from customer where c_custkey not in
        |    (select case when o_orderkey % 100 = 0 then null
        |            else o_custkey end from orders)) n_notin,
        |  (select count(*) from customer c where not exists
        |    (select 1 from orders o
        |     where case when o.o_orderkey % 100 = 0 then null
        |           else o.o_custkey end = c.c_custkey)) n_notexists""".stripMargin,

    "q106_corrscalar" ->
      """select c_custkey,
        |  (select count(*) from orders o
        |   where o.o_custkey = c.c_custkey) n_orders,
        |  (select round(max(o_totalprice), 2) from orders o
        |   where o.o_custkey = c.c_custkey) max_price
        |from customer c
        |where c_custkey <= 100 order by c_custkey""".stripMargin,

    "q107_filter" ->
      """select o_orderstatus,
        |  count(*) n,
        |  count(*) filter (where o_totalprice > 200000) n_big,
        |  round(sum(o_totalprice) filter (where year(o_orderdate) = 1995), 2)
        |    total_1995,
        |  round(avg(o_totalprice) filter (where o_orderpriority = '1-URGENT'), 2)
        |    avg_urgent
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q108_encoding" ->
      """select c_custkey,
        |  md5(c_mktsegment) m5,
        |  hex(c_custkey) hx,
        |  base64(encode(c_mktsegment)) b64,
        |  cast(ascii(c_mktsegment) as bigint) a_code,
        |  chr(cast(65 + c_custkey % 26 as int)) ch
        |from customer order by c_custkey limit 100""".stripMargin,

    "q109_aggmisc" ->
      """select l_returnflag,
        |  round(product(1.0 + l_tax), 6) prod_tax,
        |  round(sum(distinct cast(l_quantity as double)), 2) sd_qty,
        |  round(avg(cast(l_quantity as double)), 4) avg_qty,
        |  count(*) n
        |from lineitem where l_orderkey <= 200
        |group by l_returnflag order by l_returnflag""".stripMargin,

    // q110: the ENTIRE merge replayed relationally — snapshot, latest
    // update per key, synthetic inserts, full-outer disposition — so
    // the oracle is independent of the catalog/INSERT OVERWRITE
    // machinery it gates.
    "q110_merge" ->
      """with tgt as (select c_custkey k, round(c_acctbal, 2) bal from customer),
        |upd as (select k, bal from (
        |    select o_custkey k, round(o_totalprice, 2) bal,
        |      row_number() over (partition by o_custkey
        |        order by o_orderdate desc, o_orderkey desc) rn
        |    from orders) where rn = 1),
        |ins as (select cast(10000000 + n_nationkey as bigint) k,
        |    round(100.0 + n_nationkey, 2) bal from nation),
        |src as (select * from upd union all select * from ins),
        |m as (select coalesce(t.k, s.k) k,
        |    case when s.k is not null then s.bal else t.bal end bal,
        |    case when t.k is null then 'I' when s.k is null then 'K'
        |      else 'U' end op
        |  from tgt t full outer join src s on t.k = s.k)
        |select cast(k as bigint) k, cast(bal as double) bal, op from m
        |order by case op when 'I' then 0 else 1 end, k limit 100""".stripMargin)
}
