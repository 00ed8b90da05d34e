package graft.ops

import org.apache.spark.sql.functions._
import Util._

/** Second scalar-function battery + skew-mitigation pattern, broadening
  * §2.8 coverage (string2/date2/array2/bitwise) and demonstrating salted
  * two-phase aggregation (§4 skew note) with an identical-result oracle. */
object Scalars2 {

  val qFnString2: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey",
        repeat($"p_brand", 2).as("rep"),
        reverse($"p_name").as("rev"),
        instr($"p_name", "e").cast("long").as("pos_e"),
        substring($"p_name", 1, 4).as("l4"),
        $"p_name".substr(length($"p_name") - 3, lit(4)).as("r4"),
        $"p_name".contains("red").as("has_red"),
        $"p_name".startsWith("s").as("s_start"),
        $"p_name".endsWith("t").as("t_end"),
        regexp_replace($"p_name", " ", "_").as("snake"))
      .orderBy($"p_partkey")
  }

  val qFnDate2: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderkey",
        add_months($"o_orderdate", 3).as("plus3mo"),
        quarter($"o_orderdate").cast("long").as("qtr"),
        weekofyear($"o_orderdate").cast("long").as("woy"),
        dayofweek($"o_orderdate").cast("long").as("dow"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"),
        make_date(year($"o_orderdate"), month($"o_orderdate"), lit(1)).as("month_first"))
      .orderBy($"o_orderkey")
  }

  val qFnArray2: Q = (s, dir) => {
    import s.implicits._
    val ws = split($"p_name", " ")
    table(s, dir, "part")
      .select($"p_partkey",
        array_join(array_sort(array_distinct(ws)), ",").as("distinct_words"),
        array_join(flatten(array(ws, array(lit("x")))), ",").as("flat"),
        array_position(ws, "red").cast("long").as("red_pos"),
        array_contains(ws, "bolt").as("has_bolt"),
        size(array_distinct(ws)).cast("long").as("n_distinct"))
      .orderBy($"p_partkey")
  }

  val qFnBitwise: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "part")
      .select($"p_partkey",
        shiftleft($"p_size", 2).cast("long").as("shl"),
        shiftright($"p_partkey", 1).as("shr"),
        ($"p_partkey".bitwiseAND(255L)).as("band"),
        ($"p_partkey".bitwiseOR(16L)).as("bor"),
        ($"p_partkey".bitwiseXOR($"p_size".cast("long"))).as("bxor"))
      .orderBy($"p_partkey")
  }

  /** Salted two-phase aggregation — the skew mitigation for hot keys at
    * scale: phase 1 aggregates on (key, salt) spreading a hot key over N
    * reducers, phase 2 merges the partials. Decimal sums make the result
    * bit-identical to the unsalted oracle. */
  val qAggSalted: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .withColumn("salt", pmod($"l_orderkey", lit(8L)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum(dec($"l_quantity")).as("pq"), count(lit(1)).as("pn"))
      .groupBy($"l_returnflag")
      .agg(sum($"pq").cast("double").as("sum_qty"), sum($"pn").as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Spark 4 VARIANT: parse the JSON props column ONCE into a binary
    * variant, then typed-path extraction — the open-schema semi-structured
    * path (one parse feeding many extractions; shreddable columnar storage
    * at scale) vs q_fn_json's per-field string re-parse. try_variant_get
    * on a missing path yields NULL instead of failing. Oracle: DuckDB
    * json_extract_string + casts on the same paths. */
  val qFnVariant: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "events")
      .select($"event_id", parse_json($"props").as("v"))
      .select($"event_id",
        variant_get($"v", "$.k", "bigint").as("k_num"),
        variant_get($"v", "$.k", "string").as("k_str"),
        try_variant_get($"v", "$.missing", "bigint").as("k_missing"))
      .filter($"k_num" > 50)
      .orderBy($"event_id")
  }

  /** URL parsing — the domain-filtering primitive for web-crawl corpora.
    * URLs are synthesized deterministically from fixture columns (the
    * word-salad text has none), then decomposed with Spark's native
    * parse_url (HOST / PATH / per-key QUERY). The DuckDB oracle has no
    * parse_url, so it regexp-decomposes the same URLs — two independent
    * implementations agreeing on the same rows. */
  val qFnUrl: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "documents")
      .select($"doc_id", concat(lit("https://"), $"source",
        lit(".example.org/docs/"), $"doc_id",
        lit("?lang="), $"lang", lit("&v=1")).as("url"))
      .select($"doc_id",
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY"), lit("lang")).as("qlang"),
        regexp_extract(parse_url($"url", lit("HOST")),
          "^([a-z0-9]+)\\.", 1).as("subdomain"))
      .orderBy($"doc_id")
  }

  /** The higher-order-function battery over the token array: transform,
    * filter, exists, forall, aggregate (fold) and zip_with — the lambda
    * surface that keeps array work INSIDE codegen instead of exploding
    * rows or dropping to UDFs. At 100 TB the difference is a per-row
    * loop vs an explode→shuffle→reagg detour. DuckDB mirrors each with
    * its list_* forms (exists/forall spelled via list_filter lengths). */
  val qFnHof: Q = (s, dir) => {
    import s.implicits._
    val ws = LlmOps.toks($"text")
    table(s, dir, "documents")
      .select($"doc_id",
        size(filter(ws, w => length(w) > 4)).cast("long").as("n_long"),
        exists(ws, _ === "spark").as("has_spark"),
        forall(ws, w => length(w) > 0).as("all_nonempty"),
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
        md5(array_join(transform(ws, w => upper(w)), " ")).as("h_upper"),
        md5(array_join(zip_with(ws, reverse(ws),
          (a, b) => concat(a, lit("|"), b)), " ")).as("h_zip"))
      .orderBy($"doc_id")
  }

  /** Map-typed higher-order functions — transform_keys/transform_values/
    * map_filter/map_zip_with over a per-doc word-count map (q_fn_map
    * covers construction/lookup; this is the lambda surface). Maps have
    * no cross-engine canonical order, so every map output is serialized
    * as its SORTED entry list before comparison — the oracle computes
    * the same strings from the flat (word, count) table, which is also
    * how a DuckDB user would express these transforms. */
  val qFnMap2: Q = (s, dir) => {
    import s.implicits._
    val wc = table(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    val m = wc.groupBy($"doc_id")
      .agg(map_from_entries(array_sort(collect_list(struct($"w", $"c"))))
        .as("m"))
    def ser(mapCol: org.apache.spark.sql.Column) =
      array_join(array_sort(transform(map_entries(mapCol),
        e => concat(e.getField("key"), lit("="), e.getField("value")))), ",")
    m.select($"doc_id",
        size($"m").cast("long").as("n_keys"),
        ser(map_filter($"m", (_, v) => v >= 3)).as("frequent"),
        ser(transform_keys($"m", (k, _) => upper(k))).as("upper_keys"),
        ser(map_zip_with($"m",
          transform_values($"m", (_, v) => v * 2),
          (_, a, b) => a + b)).as("tripled"))
      .orderBy($"doc_id")
  }

  /** AES encryption round-trip (deterministic ECB/PKCS so the ciphertext
    * is a pure function of (key, plaintext)): the oracle can't run AES,
    * but it CAN pin the decrypt(encrypt(x)) == x round-trip and the
    * PKCS-padded ciphertext length 16·(⌊n/16⌋+1) — so the query is fully
    * hash-checked, and the ciphertext bytes themselves are pinned by a
    * known-vector assertion in QualitySpec. Per-row codegen'd; GCM (the
    * production mode) is random-IV and therefore untestable by value. */
  val qFnAes: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "customer")
      .select($"c_custkey", $"c_name",
        expr("aes_encrypt(c_name, '0123456789abcdef', 'ECB', 'PKCS')").as("ct"))
      .select($"c_custkey",
        expr("CAST(aes_decrypt(ct, '0123456789abcdef', 'ECB', 'PKCS') AS STRING)")
          .as("roundtrip"),
        length($"ct").cast("long").as("ct_len"))
      .orderBy($"c_custkey")
  }

  /** Error-safe arithmetic battery: try_add/try_subtract/try_multiply/
    * try_divide return null instead of raising on overflow or ÷0 — the
    * ANSI-mode companion of q_fn_trycast. The overflow probes use
    * Long.MaxValue-scale literals so the non-try result would abort the
    * whole 100 TB job; the oracle models each null case explicitly. */
  val qFnTryArith: Q = (s, dir) => {
    import s.implicits._
    table(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
      .select($"l_orderkey", $"l_linenumber",
        expr("try_divide(l_quantity, l_linenumber - 3)").as("div_maybe_zero"),
        expr("try_add(9223372036854775807L, l_orderkey)").as("add_overflow"),
        expr("try_multiply(4611686018427387904L, l_linenumber)").as("mul_overflow"),
        expr("try_subtract(-9223372036854775807L, l_orderkey)").as("sub_overflow"))
      .orderBy($"l_orderkey", $"l_linenumber",
        $"div_maybe_zero", $"add_overflow", $"mul_overflow", $"sub_overflow")
  }

  val queries: Map[String, Q] = Map(
    "q_fn_map2" -> qFnMap2,
    "q_fn_hof" -> qFnHof,
    "q_fn_aes" -> qFnAes,
    "q_fn_tryarith" -> qFnTryArith,
    "q_fn_string2" -> qFnString2,
    "q_fn_url" -> qFnUrl,
    "q_fn_date2" -> qFnDate2,
    "q_fn_array2" -> qFnArray2,
    "q_fn_bitwise" -> qFnBitwise,
    "q_agg_salted" -> qAggSalted,
    "q_fn_variant" -> qFnVariant,
  )

  val oracleSql: Map[String, String] = Map(
    "q_fn_map2" ->
      """WITH wc AS (SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY doc_id, w)
        |SELECT doc_id, count(*) AS n_keys,
        | coalesce(string_agg(CASE WHEN c >= 3 THEN w || '=' || c END, ','
        |   ORDER BY CASE WHEN c >= 3 THEN w || '=' || c END), '') AS frequent,
        | string_agg(upper(w) || '=' || c, ','
        |   ORDER BY upper(w) || '=' || c) AS upper_keys,
        | string_agg(w || '=' || (c * 3), ','
        |   ORDER BY w || '=' || (c * 3)) AS tripled
        |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_fn_hof" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        | CAST(len(list_filter(ws, w -> len(w) > 4)) AS BIGINT) AS n_long,
        | len(list_filter(ws, w -> w = 'spark')) > 0 AS has_spark,
        | len(list_filter(ws, w -> len(w) = 0)) = 0 AS all_nonempty,
        | CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS sum_len,
        | md5(array_to_string(list_transform(ws, w -> upper(w)), ' ')) AS h_upper,
        | md5(array_to_string(list_transform(generate_series(1, len(ws)),
        |    i -> ws[i] || '|' || ws[len(ws) - i + 1]), ' ')) AS h_zip
        |FROM tok ORDER BY doc_id""".stripMargin,
    "q_fn_aes" ->
      """SELECT c_custkey, c_name AS roundtrip,
        | CAST((length(c_name) // 16 + 1) * 16 AS BIGINT) AS ct_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_fn_tryarith" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_linenumber = 3 THEN NULL
        |      ELSE l_quantity / (l_linenumber - 3) END AS div_maybe_zero,
        | CASE WHEN l_orderkey > 0 THEN NULL
        |      ELSE 9223372036854775807 + l_orderkey END AS add_overflow,
        | CASE WHEN l_linenumber >= 2 THEN NULL
        |      ELSE 4611686018427387904 * l_linenumber END AS mul_overflow,
        | CASE WHEN l_orderkey >= 2 THEN NULL
        |      ELSE -9223372036854775807 - l_orderkey END AS sub_overflow
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, div_maybe_zero, add_overflow,
        | mul_overflow, sub_overflow""".stripMargin,
    "q_fn_string2" ->
      """SELECT p_partkey,
        | repeat(p_brand, 2) AS rep,
        | reverse(p_name) AS rev,
        | CAST(strpos(p_name, 'e') AS BIGINT) AS pos_e,
        | substr(p_name, 1, 4) AS l4,
        | substr(p_name, length(p_name)-3, 4) AS r4,
        | contains(p_name, 'red') AS has_red,
        | starts_with(p_name, 's') AS s_start,
        | p_name LIKE '%t' AS t_end,
        | replace(p_name, ' ', '_') AS snake
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_date2" ->
      """SELECT o_orderkey,
        | (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus3mo,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_first
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_array2" ->
      """WITH p AS (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part)
        |SELECT p_partkey,
        | array_to_string(list_sort(list_distinct(ws)), ',') AS distinct_words,
        | array_to_string(flatten([ws, ['x']]), ',') AS flat,
        | CAST(coalesce(list_position(ws, 'red'), 0) AS BIGINT) AS red_pos,
        | list_contains(ws, 'bolt') AS has_bolt,
        | CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
        |FROM p ORDER BY p_partkey""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT p_partkey,
        | CAST(p_size << 2 AS BIGINT) AS shl,
        | p_partkey >> 1 AS shr,
        | p_partkey & 255 AS band,
        | p_partkey | 16 AS bor,
        | xor(p_partkey, CAST(p_size AS BIGINT)) AS bxor
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_fn_url" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.org/docs/' || CAST(doc_id AS VARCHAR)
        |    || '?lang=' || lang || '&v=1' AS url
        | FROM documents)
        |SELECT doc_id,
        | regexp_extract(url, 'https://([^/]+)', 1) AS host,
        | regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        | regexp_extract(url, 'lang=([a-z]+)', 1) AS qlang,
        | regexp_extract(regexp_extract(url, 'https://([^/]+)', 1),
        |   '^([a-z0-9]+)\.', 1) AS subdomain
        |FROM u ORDER BY doc_id""".stripMargin,
    "q_fn_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
  )
}
