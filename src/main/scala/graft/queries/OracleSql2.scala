package graft.queries

/** DuckDB-dialect oracles for the round-2 contract queries
  * (ContractQueries2). Dialect notes per query:
  *  - pivot: expressed as FILTER-ed conditional aggregates; aliases quoted
  *    to preserve Spark's case-sensitive pivot column names.
  *  - unpivot: DuckDB UNPIVOT ... INTO NAME/VALUE.
  *  - date_trunc('month', ts) returns DATE in DuckDB (TIMESTAMP in Spark)
  *    → cast back to timestamp.
  *  - DuckDB ASC sort defaults to NULLS LAST (Spark: NULLS FIRST) → pinned
  *    explicitly wherever a sort key is nullable (q54).
  *  - int widths aligned to BIGINT on both sides where they differ.
  */
object OracleSql2 {

  val all: Map[String, String] = Map(
    "q40_pivot" ->
      """select o_orderpriority,
        | round(sum(o_totalprice) filter (o_orderstatus='F'),2) "F",
        | round(sum(o_totalprice) filter (o_orderstatus='O'),2) "O",
        | round(sum(o_totalprice) filter (o_orderstatus='P'),2) "P"
        |from orders group by o_orderpriority order by o_orderpriority""".stripMargin,

    "q41_unpivot" ->
      """select l_orderkey, l_linenumber, m, round(v,2) v from (
        | unpivot (select l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |          from lineitem where l_orderkey < 200)
        | on l_quantity, l_discount, l_tax into name m value v)
        |order by l_orderkey, l_linenumber, m, v limit 60""".stripMargin,

    "q42_winextra" ->
      """select o_custkey, o_orderkey,
        | first_value(o_orderkey) over w fv, last_value(o_orderkey) over w lv,
        | nth_value(o_orderkey,2) over w nv,
        | round(percent_rank() over w,4) pr, round(cume_dist() over w,4) cd
        |from orders window w as (partition by o_custkey order by o_orderdate, o_orderkey)
        |order by o_custkey, o_orderkey limit 100""".stripMargin,

    "q43_cond" ->
      """select o_orderkey, coalesce(nullif(o_orderstatus,'O'),'X') st,
        | greatest(o_totalprice, cast(100000.0 as double)) g,
        | least(o_totalprice, cast(100000.0 as double)) l,
        | case when o_totalprice > 200000 then 'big'
        |      when o_totalprice > 100000 then 'mid' else 'small' end bucket
        |from orders order by o_orderkey limit 50""".stripMargin,

    "q44_bits" ->
      """select o_orderkey, o_orderkey & 255 ba, o_orderkey | 7 bo,
        | xor(o_orderkey, 15) bx, o_orderkey << 2 sl, o_orderkey >> 1 sr
        |from orders order by o_orderkey limit 50""".stripMargin,

    "q45_str2" ->
      """select p_partkey, lpad(p_brand,12,'_') lp, rpad(p_brand,12,'_') rp,
        | split_part(p_type,' ',1) sp, levenshtein(p_brand,'Brand#11') lev,
        | reverse(p_brand) rv, repeat(p_brand,2) rpt, strpos(p_name,'a') ps,
        | left(p_name,4) lf, right(p_name,4) rt
        |from part order by p_partkey limit 30""".stripMargin,

    "q46_subq" ->
      """select o_orderkey, round(o_totalprice,2) tp from orders
        |where o_totalprice > (select avg(o_totalprice) from orders)
        |  and o_custkey in (select c_custkey from customer where c_mktsegment='BUILDING')
        |order by o_orderkey limit 50""".stripMargin,

    "q47_aggext" ->
      """select o_orderstatus,
        | count(*) filter (o_totalprice > 100000) ci,
        | bool_and(o_totalprice > 0) ba,
        | bool_or(o_orderpriority = '1-URGENT') bo,
        | arg_max(o_custkey, o_orderkey) mb, arg_min(o_custkey, o_orderkey) nb,
        | any_value(o_orderstatus) av
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q48_regexp" ->
      """select p_partkey, regexp_extract(p_name,'([a-z]+) ([a-z]+)',2) r2,
        | regexp_matches(p_name,'^a') m
        |from part order by p_partkey limit 30""".stripMargin,

    "q49_arr2" ->
      """select doc_id,
        | array_to_string(string_split(text,' ')[1:3],',') sl,
        | cast(list_position(string_split(text,' '),'dup') as bigint) ap,
        | cast(len(flatten([string_split(text,' '), ['z']])) as bigint) fl,
        | array_to_string(list_sort(list_distinct(string_split(text,' ')[1:5])),',') sd
        |from documents order by doc_id limit 30""".stripMargin,

    "q50_hof" ->
      """select doc_id,
        | array_to_string(list_transform(string_split(text,' '), x -> upper(x)),',') tr,
        | array_to_string(list_filter(string_split(text,' '), x -> length(x)>3),',') fi,
        | len(list_filter(string_split(text,' '), x -> x='dup'))>0 ex,
        | cast(list_sum(list_transform(string_split(text,' '), x -> length(x))) as bigint) tot
        |from documents order by doc_id limit 30""".stripMargin,

    "q51_json" ->
      """select event_id, array_to_string(list_sort(json_keys(props)),',') ks,
        | json_extract_string(props,'$.k') v
        |from events order by event_id limit 30""".stripMargin,

    "q52_sample" ->
      """select c_custkey, c_mktsegment from customer
        |where substr(sha256(cast(c_custkey as varchar)),1,1)='0'
        |order by c_custkey""".stripMargin,

    "q53_lateral" ->
      """select c.c_custkey, o.o_orderkey, round(o.o_totalprice,2) tp
        |from customer c,
        |lateral (select o_orderkey, o_totalprice from orders o
        |         where o.o_custkey = c.c_custkey
        |         order by o_totalprice desc, o_orderkey limit 1) o
        |order by c_custkey limit 50""".stripMargin,

    "q54_gen_outer" ->
      """select t.o_orderkey, u.x
        |from (select o_orderkey,
        |        case when o_orderstatus='F' then ['a','b'] else [] end l
        |      from orders where o_orderkey < 100) t
        |left join lateral (select unnest(t.l) x) u on true
        |order by o_orderkey, x nulls first""".stripMargin,

    "q56_exceptall" ->
      """select k, count(*) c from (
        | select c_nationkey k from customer except all select n_nationkey from nation)
        |group by k order by k""".stripMargin,

    "q57_intersectall" ->
      """select k, count(*) c from (
        | select c_nationkey k from customer
        | intersect all
        | select c_nationkey k from customer where c_custkey < 500)
        |group by k order by k""".stripMargin,

    "q58_offset" ->
      """select o_orderkey, round(o_totalprice,2) tp from orders
        |order by o_orderkey limit 20 offset 40""".stripMargin,

    "q59_grouping" ->
      """select o_orderstatus, o_orderpriority,
        | cast(grouping(o_orderstatus) as bigint) g1,
        | cast(grouping(o_orderpriority) as bigint) g2, count(*) c
        |from orders
        |group by grouping sets ((o_orderstatus), (o_orderpriority))
        |order by o_orderstatus nulls first, o_orderpriority nulls first""".stripMargin,

    "q60_median" ->
      """select o_orderstatus, round(median(o_totalprice),4) med, count(*) c
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q64_rightouter" ->
      """select c_custkey, count(event_id) n_events
        |from events e right join customer c on e.user_id = c.c_custkey
        |group by c_custkey order by c_custkey limit 50""".stripMargin,

    "q62_csv_roundtrip" ->
      """select c_mktsegment, count(*) n, round(sum(c_acctbal),2) bal
        |from customer group by c_mktsegment order by c_mktsegment""".stripMargin,

    "q63_orc_roundtrip" ->
      """select c_mktsegment, count(*) n, round(sum(c_acctbal),2) bal
        |from customer group by c_mktsegment order by c_mktsegment""".stripMargin,

    "q61_supplier" ->
      """select n_name, round(sum(l_extendedprice*(1-l_discount)),2) rev,
        | count(distinct s_suppkey) n_supp
        |from lineitem join supplier on l_suppkey=s_suppkey
        |join nation on s_nationkey=n_nationkey
        |group by n_name order by n_name""".stripMargin,

    "q65_sliding" ->
      """with e as (select event_type,
        |  cast(floor(epoch(ts)/900)*900 as bigint) top from events),
        |x as (select event_type, top - 900*i.generate_series ws_epoch
        |  from e cross join generate_series(0,3) i)
        |select make_timestamp(ws_epoch*1000000) ws, event_type,
        |  count(*) cnt
        |from x group by 1,2 order by 1,2""".stripMargin,

    "q66_recursive" ->
      """WITH RECURSIVE ranked AS (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) rn,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) nx
        |  FROM orders
        |),
        |walk(custkey, okey, depth) AS (
        |  SELECT o_custkey, o_orderkey, 1 FROM ranked WHERE rn = 1
        |  UNION ALL
        |  SELECT w.custkey, r.nx, w.depth + 1
        |  FROM walk w JOIN ranked r ON w.okey = r.o_orderkey
        |  WHERE r.nx IS NOT NULL
        |)
        |SELECT custkey, cast(max(depth) as bigint) chain_len
        |FROM walk GROUP BY custkey ORDER BY custkey LIMIT 100""".stripMargin,

    "q67_listagg" ->
      """select r_name, string_agg(n_name, ',' order by n_name) nations
        |from nation join region on n_regionkey = r_regionkey
        |group by r_name order by r_name""".stripMargin,

    "q68_approx_topk" ->
      """select event_type, count(*) cnt from events
        |group by event_type order by cnt desc, event_type limit 3""".stripMargin,

    "q69_try" ->
      """select o_orderkey,
        |  o_totalprice / nullif(o_custkey % 3, 0) td,
        |  try_cast(o_orderstatus as int) tc,
        |  try_cast(substring(o_orderpriority, 1, 1) as int) tp
        |from orders order by o_orderkey limit 50""".stripMargin,

    "q70_asof_fwd" ->
      """select o_orderkey, o_custkey, event_id from (
        |  select o.o_orderkey, o.o_custkey, e.event_id,
        |    row_number() over (partition by o.o_orderkey
        |      order by e.ts asc, e.event_id asc) rn
        |  from orders o join events e
        |    on e.user_id = o.o_custkey and e.ts >= o.o_orderdate
        |) where rn=1 order by o_orderkey limit 50""".stripMargin,

    "q55_dates2" ->
      """select o_orderkey, cast(date_trunc('month', o_orderdate) as timestamp) m,
        | cast(cast(o_orderdate as date) + interval 1 month as date) am,
        | last_day(cast(o_orderdate as date)) ld,
        | cast(extract(dow from o_orderdate)+1 as bigint) dw,
        | cast(extract(quarter from o_orderdate) as bigint) qt
        |from orders order by o_orderkey limit 30""".stripMargin)
}
