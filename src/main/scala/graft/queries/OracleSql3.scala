package graft.queries

/** DuckDB-dialect oracles for the round-3 contract queries
  * (ContractQueries3). Dialect notes:
  *  - q73: session_window ≡ gaps-and-islands with a >= gap island break
  *    (Spark merges strictly-within-gap events; an event at exactly
  *    last+gap opens a new session).
  *  - q74: mode(col, true) ≡ count-desc/value-asc argmax.
  *  - q75: variant_get(…, '$.k', 'bigint') ≡ cast(json_extract) —
  *    DuckDB's sum(BIGINT) widens to HUGEINT, cast back.
  *  - q77: DuckDB regexp_extract returns '' on no match where Spark's
  *    regexp_substr returns NULL → nullif aligns them; pos of a literal
  *    pattern is strpos on both engines (0 = no match on both).
  */
object OracleSql3 {

  private val customerRollup =
    """select c_mktsegment, count(*) n, round(sum(c_acctbal),2) bal
      |from customer group by c_mktsegment order by c_mktsegment""".stripMargin

  val all: Map[String, String] = Map(
    "q71_avro_roundtrip" -> customerRollup,
    "q72_xml_roundtrip" -> customerRollup,
    "q82_json_roundtrip" -> customerRollup,
    "q84_compact" -> customerRollup,

    "q83_ctas" ->
      """select n_regionkey, n from (
        |  select n_regionkey, count(*) n from nation group by n_regionkey
        |  union all select 99, 0)
        |order by n_regionkey""".stripMargin,

    "q73_sessionwin" ->
      """with e as (select user_id, ts, event_id,
        |    case when lag(ts) over (partition by user_id order by ts, event_id) is null
        |      or epoch(ts) - epoch(lag(ts) over (partition by user_id order by ts, event_id)) >= 1800
        |      then 1 else 0 end f
        |  from events),
        |s as (select user_id, ts, sum(f) over (partition by user_id order by ts, event_id
        |        rows unbounded preceding) sid from e)
        |select user_id, min(ts) ss, max(ts) + interval 30 minutes se, count(*) n_events
        |from s group by user_id, sid order by user_id, ss limit 200""".stripMargin,

    "q74_mode" ->
      """with c as (select o_orderstatus, o_orderpriority, count(*) cn
        |  from orders group by 1, 2),
        |r as (select o_orderstatus, o_orderpriority, cn,
        |    row_number() over (partition by o_orderstatus
        |      order by cn desc, o_orderpriority asc) rk
        |  from c)
        |select o_orderstatus, o_orderpriority md,
        |  (select count(*) from orders o where o.o_orderstatus = r.o_orderstatus) n
        |from r where rk = 1 order by o_orderstatus""".stripMargin,

    "q75_variant" ->
      """select event_type, count(k) n, cast(sum(k) as bigint) sum_k, max(k) max_k
        |from (select event_type, cast(json_extract(props, '$.k') as bigint) k
        |      from events)
        |group by event_type order by event_type""".stripMargin,

    "q76_map" ->
      """select event_id,
        |  array_to_string(json_keys(props), ',') ks,
        |  cast(json_extract(props, '$.k') as bigint) k,
        |  2 * cast(json_extract(props, '$.k') as bigint) k2,
        |  cast(case when cast(json_extract(props, '$.k') as bigint) > 50
        |       then 1 else 0 end as bigint) n_big,
        |  cast(7 as bigint) extra
        |from events order by event_id limit 100""".stripMargin,

    "q77_regexp2" ->
      """select doc_id,
        |  len(regexp_extract_all(text, 'ta[a-z]+')) n_ta,
        |  strpos(text, 'spark') pos_spark,
        |  nullif(regexp_extract(text, '[a-z]{5,}'), '') long_tok
        |from documents order by doc_id limit 100""".stripMargin,

    "q78_binaryfile" ->
      """select 'keys' src,
        |  cast(sum(length(cast(c_custkey as varchar)) + 1) as bigint) length,
        |  sha256(string_agg(cast(c_custkey as varchar) || chr(10), ''
        |    order by c_custkey)) sha
        |from customer""".stripMargin,

    "q79_mad" ->
      """with m as (select o_orderstatus, quantile_cont(o_totalprice, 0.5) med
        |  from orders group by o_orderstatus)
        |select o.o_orderstatus, round(min(med), 2) med,
        |  round(quantile_cont(abs(o_totalprice - med), 0.5), 2) mad,
        |  count(*) n
        |from orders o join m using(o_orderstatus)
        |group by o.o_orderstatus order by o.o_orderstatus""".stripMargin,

    "q80_dynpart" ->
      """select cast(year(o_orderdate) as bigint) yr, count(*) n,
        |  round(sum(case when year(o_orderdate) = 1995
        |                 then o_totalprice * 2 else o_totalprice end), 2) total
        |from orders group by 1 order by 1""".stripMargin,

    "q81_arr3" ->
      """with l as (select doc_id,
        |  list_filter(string_split(text,' '), w -> w <> '') tl from documents)
        |select doc_id,
        |  array_to_string(list_append(tl[1:3], 'zzz'), ',') ap,
        |  array_to_string(list_prepend('aaa', tl[1:3]), ',') pp,
        |  len(list_filter(tl, w -> w <> 'the')) nc,
        |  list_has_any(tl, ['spark','hash']) ov
        |from l order by doc_id limit 100""".stripMargin)
}
