package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scalar function sweep (SURVEY §2.8): string, date/time, math,
  * conditional, array (higher-order), JSON families — all
  * `org.apache.spark.sql.functions` builtins, so every expression stays
  * inside whole-stage codegen. Cross-engine typing notes: Spark `length`/
  * `size` return INT while DuckDB returns BIGINT (oracle casts); Spark
  * `ceil`/`floor` return BIGINT while DuckDB returns DOUBLE (oracle casts).
  */
object Functions extends QueryModule {

  def fnString(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 8).as("sub8"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        regexp_replace(col("p_name"), " ", "_").as("us"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        col("p_name").like("%red%").as("has_red"),
        reverse(col("p_name")).as("rev"),
        lpad(col("p_brand"), 10, "*").as("lpadded"))
      .orderBy("p_partkey")
  }

  def fnDatetime(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        date_add(to_date(col("o_orderdate")), 30).as("d30"),
        datediff(to_date(lit("1998-01-01")), to_date(col("o_orderdate"))).as("dd"),
        unix_timestamp(col("o_orderdate")).as("ets"),
        last_day(col("o_orderdate")).as("ld"))
      .orderBy("o_orderkey")
  }

  def fnMath(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice")).as("r0"),
        abs(col("l_discount") - 0.05).as("ab"),
        ceil(col("l_extendedprice")).as("ce"),
        floor(col("l_extendedprice")).as("fl"),
        round(pow(col("l_quantity"), 2.0), 6).as("pw"),
        sqrt(col("l_extendedprice")).as("sq"),
        (col("l_orderkey") % 7).as("md"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"))
      // (l_orderkey, l_linenumber) is not unique; (…, qty, price) is.
      // sq and pw are injective in price and qty, so this sort is total.
      .orderBy("l_orderkey", "l_linenumber", "sq", "pw")
  }

  /** Bitwise surface: and/or/xor, shifts, popcount — the bit-packing
    * primitives the layout (Z-order) and signature (SimHash) operators
    * build on, exposed as queryable scalar functions.
    */
  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
        col("o_orderkey").bitwiseXOR(lit(0x5555L)).as("k_xor"),
        shiftleft(col("o_orderkey").bitwiseAND(lit(15L)), 3).as("k_shl"),
        shiftright(col("o_orderkey"), 2).as("k_shr"),
        bit_count(col("o_orderkey")).as("k_bits"))
      .orderBy("o_orderkey")
  }

  def fnConditional(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") >= 5000.0, lit("high"))
          .when(col("c_acctbal") >= 0.0, lit("mid"))
          .otherwise(lit("neg")).as("bal_class"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("nz"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("nv"),
        when(col("c_acctbal") < 0.0, lit(-1)).otherwise(lit(1)).as("flag"))
      .orderBy("c_custkey")
  }

  /** Higher-order array functions over the whitespace-tokenized document —
    * codegen-free but still executor-side and columnar; this is the
    * "functions, not UDFs" path for per-row collection logic.
    */
  def fnArray(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(words).as("n_words"),
        concat_ws(" ", slice(words, 1, 5)).as("first5"),
        size(filter(words, w => length(w) > 4)).as("n_long"),
        aggregate(words, lit(0), (acc, w) => acc + length(w)).as("sum_len"),
        array_contains(words, "query").as("has_query"),
        size(array_distinct(words)).as("uniq_words"))
      .orderBy("doc_id")
  }

  def fnJson(spark: SparkSession, sfDir: String): DataFrame = {
    val kSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        from_json(col("props"), kSchema).getField("k").as("fj_k"),
        to_json(struct(col("event_type"), col("value"))).as("js"))
      .orderBy("event_id")
  }

  /** Exact decimal aggregation: cast to DECIMAL(18,2) before summing so the
    * sum is order-independent (integer cents), then surface as double —
    * lossless here since the totals stay far below 2^53 cents. The
    * no-rounding-tricks way to aggregate money deterministically.
    */
  def fnDecimal(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_exact"),
        sum(col("l_tax").cast("decimal(18,2)")).cast("double").as("tax_exact"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Error-tolerant scalar surface: `try_cast` / `try_divide` turn
    * malformed input into NULL instead of failing the job — the scalar
    * twin of the PERMISSIVE NDJSON path (a 100 TB run must quarantine bad
    * rows, never die on row 3 trillion). Failure cases are planted
    * deterministically: a non-numeric string cast, a division whose
    * denominator is zeroed on a key stride.
    */
  def fnTry(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        // ANSI is on (Spark 4 default): a plain cast of '2-HIGH' THROWS;
        // try_cast quarantines it as NULL instead.
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
        // the recoverable half: the leading priority digit parses
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
        // out-of-bounds element access nulls instead of erroring
        expr("try_element_at(split(o_orderpriority, '-'), 5)").as("oob"),
        try_add(col("o_orderkey"), lit(1L)).as("next_key"))
      .orderBy("o_orderkey")
  }

  /** Generator surface (SURVEY §2.10 U6): posexplode the token array — one
    * output row per (doc, position, token).
    */
  def fnPosexplode(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .orderBy("doc_id", "pos")
  }

  /** Map-typed column surface (the reference's `Record<string,string>`
    * metadata shape, §1.4): build, probe, and enumerate a map — outputs kept
    * scalar because map value-ordering is not comparable across engines.
    */
  def fnMap(spark: SparkSession, sfDir: String): DataFrame = {
    val m = map(
      lit("k"), get_json_object(col("props"), "$.k").cast("int"),
      lit("twice"), get_json_object(col("props"), "$.k").cast("int") * 2)
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        element_at(m, "k").as("k_val"),
        element_at(m, "twice").as("twice_val"),
        concat_ws(",", map_keys(m)).as("keys"),
        size(m).as("n_entries"))
      .orderBy("event_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_decimal"     -> (fnDecimal _),
    "fn_posexplode"  -> (fnPosexplode _),
    "fn_map"         -> (fnMap _),
    "fn_string"      -> (fnString _),
    "fn_datetime"    -> (fnDatetime _),
    "fn_math"        -> (fnMath _),
    "fn_bitwise"     -> (fnBitwise _),
    "fn_conditional" -> (fnConditional _),
    "fn_array"       -> (fnArray _),
    "fn_json"        -> (fnJson _),
    "fn_try"         -> (fnTry _),
  )

  override def oracles: Map[String, String] = Map(
    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS k_and,
        |  o_orderkey | 4096 AS k_or,
        |  xor(o_orderkey, 21845) AS k_xor,
        |  (o_orderkey & 15) << 3 AS k_shl,
        |  o_orderkey >> 2 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS k_bits
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_try" ->
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
        |  string_split(o_orderpriority, '-')[5] AS oob,
        |  o_orderkey + 1 AS next_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_decimal" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_exact,
        |  CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax_exact,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  (m['k'])[1] AS k_val,
        |  (m['twice'])[1] AS twice_val,
        |  array_to_string(map_keys(m), ',') AS keys,
        |  CAST(cardinality(m) AS INTEGER) AS n_entries
        |FROM (
        |  SELECT event_id,
        |    MAP {'k': CAST(json_extract_string(props, '$.k') AS INTEGER),
        |         'twice': CAST(json_extract_string(props, '$.k') AS INTEGER) * 2} AS m
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "fn_posexplode" ->
      """SELECT doc_id,
        |  CAST(unnest(range(0, len(string_split(text, ' ')))) AS INTEGER) AS pos,
        |  unnest(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id, pos""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        |  SUBSTRING(p_name, 1, 8) AS sub8,
        |  CAST(LENGTH(p_name) AS INTEGER) AS len,
        |  CONCAT_WS('|', p_brand, p_type) AS bt,
        |  REGEXP_REPLACE(p_name, ' ', '_', 'g') AS us,
        |  REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
        |  (p_name LIKE '%red%') AS has_red,
        |  REVERSE(p_name) AS rev,
        |  LPAD(p_brand, 10, '*') AS lpadded
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
        |  CAST(o_orderdate AS DATE) + 30 AS d30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS dd,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ets,
        |  last_day(CAST(o_orderdate AS DATE)) AS ld
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(l_extendedprice) AS r0,
        |  ABS(l_discount - 0.05) AS ab,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
        |  ROUND(POW(l_quantity, 2.0), 6) AS pw,
        |  SQRT(l_extendedprice) AS sq,
        |  l_orderkey % 7 AS md,
        |  GREATEST(l_tax, l_discount) AS gr,
        |  LEAST(l_tax, l_discount) AS le
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, sq, pw""".stripMargin,
    "fn_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal >= 5000.0 THEN 'high'
        |       WHEN c_acctbal >= 0.0 THEN 'mid'
        |       ELSE 'neg' END AS bal_class,
        |  NULLIF(c_mktsegment, 'BUILDING') AS nz,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS nv,
        |  CASE WHEN c_acctbal < 0.0 THEN -1 ELSE 1 END AS flag
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |  array_to_string(string_split(text, ' ')[1:5], ' ') AS first5,
        |  CAST(len(list_filter(string_split(text, ' '), w -> strlen(w) > 4)) AS INTEGER) AS n_long,
        |  CAST(list_sum(list_transform(string_split(text, ' '), w -> strlen(w))) AS INTEGER) AS sum_len,
        |  list_contains(string_split(text, ' '), 'query') AS has_query,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS uniq_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS fj_k,
        |  CAST(to_json(struct_pack(event_type := event_type, value := value)) AS VARCHAR) AS js
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
