package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** SURVEY.md §2.8 — scalar function surface (string/date/math/cond/array/
  * map/json/hash). All `functions._` built-ins → whole-stage codegen; no
  * UDFs in these paths.
  *
  * Parity notes: transcendental results (ln/log10/pow) are rounded to 6
  * decimals — JVM and libm can differ in the last ulp; array arithmetic
  * casts float elements to double BEFORE multiplying so both engines round
  * identically; only md5/sha2 hash-match across engines (xxhash64 is
  * Spark-only and never appears in an oracle-checked output).
  */
object Scalars {

  val qFnString: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey",
        upper($"p_name").as("up"),
        lower($"p_brand").as("lo"),
        trim(concat_ws("-", $"p_name", $"p_type")).as("joined"),
        length($"p_name").cast("long").as("len"),
        substring($"p_name", 1, 3).as("pre"),
        element_at(split($"p_name", " "), 2).as("second_word"),
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
        lpad($"p_brand", 12, "0").as("padded"))
      .orderBy($"p_partkey")
  }

  val qFnDate: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        date_add($"o_orderdate", 30).as("plus30"),
        datediff(ts("2000-01-01 00:00:00"), $"o_orderdate").cast("long").as("days_to_y2k"),
        last_day($"o_orderdate").as("eom"),
        unix_timestamp($"o_orderdate").as("epoch_sec"),
        to_date($"o_orderdate").as("as_date"))
      .orderBy($"o_orderkey")
  }

  val qFnMath: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey",
        round($"p_retailprice", 1).as("r1"),
        abs($"p_retailprice" - lit(1000.0)).as("dist"),
        ceil($"p_retailprice").cast("long").as("c"),
        floor($"p_retailprice").cast("long").as("f"),
        round(pow($"p_retailprice", 0.5), 6).as("sq"),
        round(log($"p_retailprice"), 6).as("lnp"),
        round(log10($"p_retailprice"), 6).as("lg"),
        sqrt($"p_size".cast("double")).as("sqs"),
        signum($"p_retailprice" - lit(1000.0)).cast("long").as("sgn"),
        pmod($"p_partkey", lit(7L)).as("pm"))
      .orderBy($"p_partkey")
  }

  val qFnCond: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "customer")
      .select($"c_custkey",
        when($"c_acctbal" < 0, "overdrawn")
          .when($"c_acctbal" < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("DEFAULT")).as("seg"),
        greatest($"c_acctbal", lit(0.0)).as("bal_floor"),
        least($"c_acctbal", lit(9999.99)).as("bal_cap"),
        try_divide(lit(1000.0), $"c_acctbal" - $"c_acctbal").as("div0"),
        try_divide($"c_acctbal", lit(2.0)).as("half"))
      .orderBy($"c_custkey")
  }

  val qFnArray: Q = (s, dir) => {
    import s.implicits._
    val asD = transform($"embedding", x => x.cast("double"))
    table(s, dir, "embeddings")
      .select($"vec_id",
        size($"embedding").cast("long").as("dim"),
        round(aggregate(zip_with(asD, asD, (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v), 4).as("norm2"),
        round(aggregate(transform(slice(asD, 1, 8), x => x * x),
          lit(0.0), (acc, v) => acc + v), 4).as("head8_norm2"),
        size(filter($"embedding", x => x > 0)).cast("long").as("n_pos"),
        array_max($"embedding").cast("double").as("mx"))
      .orderBy($"vec_id")
  }

  val qFnMap: Q = (s, dir) => {
    import s.implicits._
    val m = from_json($"props", MapType(StringType, IntegerType))
    events(s, dir)
      .select($"event_id",
        element_at(m, "k").cast("long").as("k"),
        size(map_keys(m)).cast("long").as("n_keys"))
      .orderBy($"event_id")
  }

  val qFnJson: Q = (s, dir) => {
    import s.implicits._
    events(s, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        json_tuple($"props", "k").as("k_tup"))
      .orderBy($"event_id")
  }

  val qFnHash: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id",
        md5($"text").as("h_md5"),
        sha2($"text", 256).as("h_sha256"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_fn_string" -> qFnString,
    "q_fn_date" -> qFnDate,
    "q_fn_math" -> qFnMath,
    "q_fn_cond" -> qFnCond,
    "q_fn_array" -> qFnArray,
    "q_fn_map" -> qFnMap,
    "q_fn_json" -> qFnJson,
    "q_fn_hash" -> qFnHash,
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        | trim(concat_ws('-', p_name, p_type)) AS joined,
        | CAST(length(p_name) AS BIGINT) AS len,
        | substr(p_name, 1, 3) AS pre,
        | string_split(p_name, ' ')[2] AS second_word,
        | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | lpad(p_brand, 12, '0') AS padded
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_date" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mo,
        | CAST(day(o_orderdate) AS BIGINT) AS dom,
        | date_trunc('month', o_orderdate) AS month_start,
        | (o_orderdate + INTERVAL 30 DAY)::DATE AS plus30,
        | date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
        | last_day(o_orderdate) AS eom,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
        | o_orderdate::DATE AS as_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_math" ->
      """SELECT p_partkey, round(p_retailprice, 1) AS r1,
        | abs(p_retailprice - 1000.0) AS dist,
        | CAST(ceil(p_retailprice) AS BIGINT) AS c,
        | CAST(floor(p_retailprice) AS BIGINT) AS f,
        | round(pow(p_retailprice, 0.5), 6) AS sq,
        | round(ln(p_retailprice), 6) AS lnp,
        | round(log10(p_retailprice), 6) AS lg,
        | sqrt(CAST(p_size AS DOUBLE)) AS sqs,
        | CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS sgn,
        | ((p_partkey % 7) + 7) % 7 AS pm
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_cond" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |      WHEN c_acctbal < 5000 THEN 'standard'
        |      ELSE 'premium' END AS tier,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg,
        | greatest(c_acctbal, 0.0) AS bal_floor,
        | least(c_acctbal, 9999.99) AS bal_cap,
        | CASE WHEN c_acctbal - c_acctbal = 0 THEN NULL
        |      ELSE 1000.0 / (c_acctbal - c_acctbal) END AS div0,
        | c_acctbal / 2.0 AS half
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        | round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm2,
        | round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS head8_norm2,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        | CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_fn_map" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        | CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        | json_extract_string(props, '$.k') AS k_str,
        | json_extract_string(props, '$.k') AS k_tup
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
