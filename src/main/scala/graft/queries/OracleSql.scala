package graft.queries

/** DuckDB-dialect oracle SQL for every contract query (SURVEY Appendix A,
  * with the documented dialect overrides applied: json_extract_string,
  * string_split/unnest, 'g' regexp flag, quantile_cont, epoch_ms,
  * date_diff argument order, list_* functions).
  *
  * Type-alignment rules baked in (the driver compares values across
  * engines): integer sums cast to BIGINT (DuckDB sum(INT) is HUGEINT),
  * decimal literals kept out of output expressions (cast to DOUBLE),
  * list outputs stringified on both sides.
  */
object OracleSql {

  private lazy val all24: String =
    """with t as (select doc_id, list_distinct(string_split(text,' ')) s, len(string_split(text,' ')) n from documents)
      |select a.doc_id da, b.doc_id db,
      |  round(cast(len(list_intersect(a.s,b.s)) as double)/len(list_distinct(list_concat(a.s,b.s))),4) jac
      |from t a join t b on a.doc_id < b.doc_id and abs(a.n-b.n)<=1
      |where cast(len(list_intersect(a.s,b.s)) as double)/len(list_distinct(list_concat(a.s,b.s))) >= 0.5
      |  and (a.n>=30 or b.n>=30)
      |order by jac desc, da, db limit 50""".stripMargin

  val all: Map[String, String] = Map(
    "b1" ->
      """select l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty,
        | round(sum(l_extendedprice),2) sum_base,
        | round(sum(l_extendedprice*(1-l_discount)),2) sum_disc,
        | round(avg(l_quantity),4) avg_qty, round(avg(l_discount),4) avg_disc, count(*) cnt
        |from lineitem where l_shipdate <= timestamp '1998-09-02'
        |group by l_returnflag, l_linestatus order by l_returnflag, l_linestatus""".stripMargin,

    "b2" ->
      """select n_name, round(sum(l_extendedprice*(1-l_discount)),2) revenue
        |from customer join orders on c_custkey=o_custkey
        |join lineitem on l_orderkey=o_orderkey
        |join nation on c_nationkey=n_nationkey
        |join region on n_regionkey=r_regionkey
        |where r_name='ASIA' group by n_name order by revenue desc, n_name""".stripMargin,

    "b3" ->
      """select l_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) revenue, o_orderdate
        |from customer join orders on c_custkey=o_custkey join lineitem on l_orderkey=o_orderkey
        |where c_mktsegment='BUILDING' and o_orderdate < timestamp '1998-01-01'
        |group by l_orderkey, o_orderdate order by revenue desc, l_orderkey limit 10""".stripMargin,

    "b4" ->
      """select * from (select o_custkey, o_orderkey, o_totalprice,
        |  row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rn
        |  from orders) where rn<=3 order by o_custkey, rn limit 100""".stripMargin,

    "b4_agg" ->
      """select * from (select o_custkey, o_orderkey, o_totalprice,
        |  row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) rn
        |  from orders) where rn<=3 order by o_custkey, rn limit 100""".stripMargin,

    "b5" ->
      """select n_name, c_mktsegment, count(*) cnt, round(sum(c_acctbal),2) bal
        |from customer join nation on c_nationkey=n_nationkey
        |group by rollup(n_name, c_mktsegment)
        |order by n_name nulls first, c_mktsegment nulls first""".stripMargin,

    "b6" ->
      """select event_type, count(distinct user_id) du, count(*) cnt
        |from events group by event_type order by event_type""".stripMargin,

    "b7" ->
      """select date_trunc('hour', ts) h, event_type,
        | cast(sum(cast(json_extract_string(props,'$.k') as int)) as bigint) sk,
        | round(sum(value),2) sv, count(*) cnt
        |from events group by 1,2 order by 1,2 limit 100""".stripMargin,

    "b8" ->
      """with toks as (select unnest(string_split(text,' ')) w from documents)
        |select w, count(*) c from toks where w<>'' group by w order by c desc, w limit 20""".stripMargin,

    "b9" -> cooccurSql,
    "b9_join" -> cooccurSql,

    "b10" ->
      """with probe as (select embedding e from embeddings where vec_id=0)
        |select vec_id,
        | round(list_dot_product(cast(embedding as double[]), cast(e as double[]))
        | / (sqrt(list_dot_product(cast(embedding as double[]), cast(embedding as double[])))
        |  * sqrt(list_dot_product(cast(e as double[]), cast(e as double[])))),4) sim
        |from embeddings cross join probe where vec_id<>0 order by sim desc, vec_id limit 10""".stripMargin,

    "q11" ->
      """select c_custkey, c_name from customer c
        |where exists (select 1 from orders o where o.o_custkey=c.c_custkey and o.o_totalprice>100000)
        |order by c_custkey limit 50""".stripMargin,

    "q12" ->
      """select c_custkey, c_mktsegment from customer c
        |where not exists (select 1 from orders o where o.o_custkey=c.c_custkey)
        |order by c_custkey limit 50""".stripMargin,

    "q12b" ->
      """select c_custkey, c_mktsegment from customer c
        |where not exists (select 1 from orders o where o.o_custkey=c.c_custkey and o.o_totalprice>250000)
        |order by c_custkey limit 50""".stripMargin,

    "q13" ->
      """select k, count(*) c from (
        |  select c_custkey k from customer where c_mktsegment='BUILDING'
        |  union all select o_custkey from orders where o_orderstatus='F'
        |) group by k order by c desc, k limit 20""".stripMargin,

    "q13b" ->
      """(select c_custkey k from customer where c_mktsegment='BUILDING'
        | intersect select o_custkey from orders where o_orderstatus='F') order by k limit 20""".stripMargin,

    "q13c" ->
      """(select c_custkey k from customer except select o_custkey from orders) order by k limit 20""".stripMargin,

    "q13d" ->
      """(select c_custkey k from customer where c_mktsegment='BUILDING'
        | except select o_custkey from orders where o_orderstatus='F') order by k limit 20""".stripMargin,

    "q14" ->
      """select o_orderkey, o_custkey, round(o_totalprice,2) tp from orders o
        |where o_totalprice > (select 1.5*avg(o2.o_totalprice) from orders o2 where o2.o_custkey=o.o_custkey)
        |order by o_orderkey limit 50""".stripMargin,

    "q15" ->
      """select p_partkey, upper(p_brand) ub, substr(p_name,1,8) s8, length(p_name) ln,
        | concat(p_brand,'#',p_type) ct, trim(p_name) tr, replace(p_type,'a','@') rp,
        | regexp_replace(p_name,'[aeiou]','','g') rr
        |from part order by p_partkey limit 30""".stripMargin,

    "q16" ->
      """select o_orderkey, extract(year from o_orderdate) y, extract(month from o_orderdate) m,
        | extract(day from o_orderdate) d,
        | cast(o_orderdate as date) + 30 d30,
        | date_diff('day', o_orderdate, timestamp '2000-01-01') dd
        |from orders order by o_orderkey limit 30""".stripMargin,

    "q17" ->
      """select l_orderkey, l_linenumber, round(abs(l_discount-0.05),4) a,
        | cast(ceil(l_quantity) as bigint) ce, cast(floor(l_extendedprice) as bigint) fl,
        | round(sqrt(l_extendedprice),4) sq, round(ln(l_extendedprice+1),4) lg,
        | round(pow(l_discount,2),6) pw, cast(l_quantity as int) % 7 md
        |from lineitem order by l_orderkey, l_linenumber, fl, ce, sq, lg, a, pw, md limit 30""".stripMargin,

    "q18" ->
      """select doc_id, len(string_split(text,' ')) n, len(list_distinct(string_split(text,' '))) nd,
        | string_split(text,' ')[1] first_tok, list_contains(string_split(text,' '),'dup') hasdup
        |from documents order by doc_id limit 30""".stripMargin,

    "q19" ->
      """select event_id, cast(json_extract_string(props,'$.k') as int) k
        |from events where cast(json_extract_string(props,'$.k') as int) > 90
        |order by event_id limit 30""".stripMargin,

    "q20" ->
      """select event_id, user_id, o_orderkey from (
        |  select e.event_id, e.user_id, o.o_orderkey,
        |    row_number() over (partition by e.event_id order by o.o_orderdate desc, o.o_orderkey desc) rn
        |  from events e join orders o on o.o_custkey = e.user_id and o.o_orderdate <= e.ts
        |) where rn=1 order by event_id limit 50""".stripMargin,

    "q20_merge" ->
      """select event_id, user_id, o_orderkey from (
        |  select e.event_id, e.user_id, o.o_orderkey,
        |    row_number() over (partition by e.event_id order by o.o_orderdate desc, o.o_orderkey desc) rn
        |  from events e join orders o on o.o_custkey = e.user_id and o.o_orderdate <= e.ts
        |) where rn=1 order by event_id limit 50""".stripMargin,

    "q21" ->
      """select o_orderstatus, o_orderpriority, count(*) c, round(sum(o_totalprice),2) s
        |from orders group by cube(o_orderstatus, o_orderpriority)
        |order by o_orderstatus nulls first, o_orderpriority nulls first""".stripMargin,

    "q24" -> all24,

    "q24_join" -> all24,

    "q25" ->
      """with g as (select user_id, ts, epoch_ms(ts) tms,
        |  lag(epoch_ms(ts)) over (partition by user_id order by ts, event_id) ptms from events),
        |s as (select user_id, ts, case when ptms is null or tms-ptms > 1800000 then 1 else 0 end brk from g),
        |sid as (select user_id, ts, sum(brk) over (partition by user_id order by ts rows unbounded preceding) sess from s)
        |select user_id, count(distinct sess) n_sessions, count(*) n_events
        |from sid group by user_id order by user_id limit 50""".stripMargin,

    "q27" ->
      """with toks as (select unnest(string_split(text,' ')) w from documents)
        |select w, count(*) c, row_number() over (order by count(*) desc, w) id
        |from toks where w <> '' group by w having count(*) >= 5 order by id""".stripMargin,

    "q29" ->
      """with toks0 as (select doc_id, unnest(string_split(text,' ')) w from documents),
        |toks as (select doc_id, w from toks0 where w<>''),
        |tf as (select doc_id, w, count(*) tf from toks group by doc_id, w),
        |df as (select w, count(distinct doc_id) df from toks group by w),
        |n as (select count(*) n from documents)
        |select tf.doc_id, tf.w, round(tf.tf * ln(cast(n.n as double)/df.df), 6) tfidf
        |from tf join df on tf.w=df.w cross join n
        |order by tfidf desc, tf.doc_id, tf.w limit 30""".stripMargin,

    "q31" ->
      """select o_orderstatus, round(quantile_cont(o_totalprice, 0.5),4) med,
        | round(quantile_cont(o_totalprice, 0.9),4) p90, count(*) c
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q32" ->
      """select count(*) total, count(distinct text) distinct_text,
        | count(distinct sha256(text)) distinct_hash from documents""".stripMargin,

    "q33" ->
      """select o_orderstatus, round(stddev(o_totalprice),4) sd, round(variance(o_totalprice),4) vr,
        | round(stddev_pop(o_totalprice),4) sdp, round(covar_samp(o_totalprice,o_custkey),4) cv,
        | round(corr(o_totalprice,o_custkey),6) cr
        |from orders group by o_orderstatus order by o_orderstatus""".stripMargin,

    "q34" ->
      """select c_nationkey, array_to_string(list_sort(list(c_mktsegment)),',') segs, count(*) c
        |from customer where c_custkey <= 20 group by c_nationkey order by c_nationkey""".stripMargin,

    "q35" ->
      """select o_custkey, o_orderkey, rank() over w rk, dense_rank() over w drk,
        | lag(o_orderkey) over w lg, lead(o_orderkey) over w ld,
        | round(sum(o_totalprice) over (partition by o_custkey order by o_orderdate, o_orderkey
        |   rows between 2 preceding and current row),2) mv,
        | round(avg(o_totalprice) over (partition by o_custkey order by o_orderdate, o_orderkey
        |   range between unbounded preceding and current row),2) ra,
        | ntile(4) over w nt
        |from orders window w as (partition by o_custkey order by o_orderdate, o_orderkey)
        |order by o_custkey, o_orderkey limit 100""".stripMargin,

    "q36" ->
      """select k from (select c_nationkey k from customer
        |  union select n_nationkey from nation) order by k""".stripMargin,

    "q37" ->
      """select c_custkey, count(o_orderkey) n_orders,
        | round(coalesce(sum(o_totalprice), cast(0.0 as double)), 2) spend
        |from customer c left join orders o on c_custkey=o_custkey
        |group by c_custkey order by c_custkey limit 50""".stripMargin,

    "q39" ->
      """select o_orderstatus, o_orderpriority, count(*) c, round(sum(o_totalprice),2) tp
        |from orders
        |group by grouping sets ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        |order by o_orderstatus nulls first, o_orderpriority nulls first""".stripMargin,

    "q38" ->
      """select coalesce(a.ka, b.kb) k, a.ka is not null in_customer, b.kb is not null in_nation
        |from (select distinct c_nationkey ka from customer) a
        |full join (select distinct n_nationkey kb from nation) b on a.ka=b.kb
        |order by k""".stripMargin
  )

  private lazy val cooccurSql: String =
    """with toks as (select doc_id, generate_subscripts(string_split(text,' '),1) pos,
      |  unnest(string_split(text,' ')) w from documents),
      |pairs as (select a.w w1, b.w w2, cast(1.0 as double)/abs(a.pos-b.pos) wt
      |  from toks a join toks b on a.doc_id=b.doc_id
      |  and b.pos between a.pos-2 and a.pos+2 and a.pos<>b.pos)
      |select w1, w2, round(sum(wt),3) x, count(*) c from pairs
      |group by w1,w2 order by x desc, w1, w2 limit 20""".stripMargin
}
