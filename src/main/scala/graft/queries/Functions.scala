package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Scalar-function breadth: string, datetime, binning, exact covariance.
  * Each Spark function is paired with the DuckDB expression that has
  * identical semantics (noted where numbering conventions differ).
  */
object Functions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[Q] = Seq(

    // SQL frontdoor: the same engine surface through spark.sql text,
    // including the extension-registered graft_cosine function
    Q("sql1_text_query",
      (s, dir) => {
        t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
        s.sql("""
          SELECT vec_id, label,
            CAST(ROUND(graft_cosine(embedding, embedding) * 1000000) AS BIGINT)
              AS self_cos_um
          FROM embeddings_v
          WHERE vec_id % 10 = 0
          ORDER BY vec_id
        """)
      },
      Some("""SELECT vec_id, label,
             | CAST(ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
             |   CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS self_cos_um
             |FROM embeddings WHERE vec_id % 10 = 0
             |ORDER BY vec_id""".stripMargin)),

    Q("e13_string_funcs",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_custkey") % 20 === 0)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          length(col("c_name")).cast(LongType).as("len"),
          substring(col("c_name"), 1, 8).as("sub"),
          concat(col("c_name"), lit("|"), col("c_mktsegment")).as("cat"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
          lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"),
          instr(col("c_name"), "0").cast(LongType).as("pos0"),
          reverse(col("c_name")).as("rev"),
          split_part(col("c_name"), lit("#"), lit(2)).as("part2"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
             | CAST(length(c_name) AS BIGINT) AS len,
             | substring(c_name, 1, 8) AS sub,
             | c_name || '|' || c_mktsegment AS cat,
             | regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
             | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
             | CAST(strpos(c_name, '0') AS BIGINT) AS pos0,
             | reverse(c_name) AS rev,
             | split_part(c_name, '#', 2) AS part2
             |FROM customer WHERE c_custkey % 20 = 0
             |ORDER BY c_custkey""".stripMargin)),

    Q("e14_datetime_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
          quarter(col("o_orderdate")).cast(LongType).as("q"),
          weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"),
          dayofweek(col("o_orderdate")).cast(LongType).as("dow_sun1"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
          date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
          add_months(col("o_orderdate").cast(DateType), 3).as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey"),
      // DuckDB numbering: dayofweek is 0=Sunday → +1 matches Spark;
      // weekofyear is ISO week in both
      Some("""SELECT o_orderkey,
             | CAST(year(o_orderdate) AS BIGINT) AS y,
             | CAST(month(o_orderdate) AS BIGINT) AS m,
             | CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
             | CAST(quarter(o_orderdate) AS BIGINT) AS q,
             | CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
             | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
             | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             | CAST(o_orderdate AS DATE) + 30 AS plus30,
             | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
             | CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
             |FROM orders WHERE o_orderkey % 100 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    Q("e15_array_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 200 === 0)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber").cast(LongType))).as("lines"))
        .select(
          col("l_orderkey"),
          // the driver's comparator can't hash raw array columns — ship the
          // array as a joined string, keep the array fns on the derived cols
          array_join(col("lines"), ",").as("lines_csv"),
          size(col("lines")).cast(LongType).as("n"),
          element_at(col("lines"), 1).as("first_line"),
          array_contains(col("lines"), 1L).as("has_line1"),
          aggregate(col("lines"), lit(0L), _ + _).as("line_sum"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             | array_to_string(lines, ',') AS lines_csv,
             | CAST(len(lines) AS BIGINT) AS n,
             | lines[1] AS first_line, list_contains(lines, 1) AS has_line1,
             | CAST(list_sum(lines) AS BIGINT) AS line_sum
             |FROM (
             | SELECT l_orderkey,
             |  list_sort(list(CAST(l_linenumber AS BIGINT))) AS lines
             | FROM lineitem WHERE l_orderkey % 200 = 0 GROUP BY 1)
             |ORDER BY l_orderkey""".stripMargin)),

    // E32 — higher-order array functions (the lambda surface Catalyst
    // codegens: transform/filter/exists/forall/zip_with + positional
    // ops), the §2.2 complement to e15's scalar array functions. The
    // empty-filter result rides COALESCE('') per the DuckDB
    // array_to_string([]) = NULL gotcha; array_position's absent-key 0
    // matches COALESCE(list_position, 0); zip_with pairs the array with
    // its reverse so lengths always match in both engines.
    Q("e32_array_lambda_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 200 === 0)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber").cast(LongType)))
          .as("lines"))
        .select(
          col("l_orderkey"),
          array_join(transform(col("lines"), _ * 2), ",").as("doubled_csv"),
          array_join(filter(col("lines"), _ % 2 === 0), ",").as("evens_csv"),
          exists(col("lines"), _ > 5).as("any_gt5"),
          forall(col("lines"), _ > 0).as("all_pos"),
          array_position(col("lines"), 3L).as("pos3"),
          array_join(slice(col("lines"), 1, 3), ",").as("head3_csv"),
          array_join(zip_with(col("lines"), reverse(col("lines")), _ + _), ",")
            .as("palsum_csv"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             | array_to_string(list_transform(lines, x -> x*2), ',') AS doubled_csv,
             | COALESCE(array_to_string(list_filter(lines, x -> x%2=0), ','), '')
             |   AS evens_csv,
             | len(list_filter(lines, x -> x > 5)) > 0 AS any_gt5,
             | len(list_filter(lines, x -> NOT (x > 0))) = 0 AS all_pos,
             | CAST(COALESCE(list_position(lines, 3), 0) AS BIGINT) AS pos3,
             | array_to_string(lines[1:3], ',') AS head3_csv,
             | array_to_string(list_transform(
             |   list_zip(lines, list_reverse(lines)), x -> x[1] + x[2]), ',')
             |   AS palsum_csv
             |FROM (
             | SELECT l_orderkey,
             |  list_sort(list(CAST(l_linenumber AS BIGINT))) AS lines
             | FROM lineitem WHERE l_orderkey % 200 = 0 GROUP BY 1)
             |ORDER BY l_orderkey""".stripMargin)),

    // explode round-trip: array construction per group, unnest back,
    // re-aggregate — generator (UDTF-shape) surface
    Q("e20_explode_roundtrip",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity").cast(LongType))).as("qs"))
        .select(col("l_orderkey"), explode(col("qs")).as("q"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), sum("q").as("total"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, COUNT(*) AS n,
             | CAST(SUM(q) AS BIGINT) AS total
             |FROM (
             | SELECT l_orderkey, unnest(qs) AS q FROM (
             |  SELECT l_orderkey, list(CAST(l_quantity AS BIGINT)) AS qs
             |  FROM lineitem WHERE l_orderkey % 500 = 0 GROUP BY 1))
             |GROUP BY 1 ORDER BY l_orderkey""".stripMargin)),

    // padding/slicing/repetition string surface (complements e13's
    // case/trim/substring family)
    Q("e31_string_pad_slice",
      (s, dir) => t(s, dir, "nation")
        .select(col("n_nationkey"),
          lpad(col("n_name"), 12, "*").as("lp"),
          rpad(col("n_name"), 12, "-").as("rp"),
          repeat(substring(col("n_name"), 1, 3), 2).as("rep"),
          reverse(col("n_name")).as("rev"),
          translate(col("n_name"), "_N", "-n").as("tr"),
          substring(col("n_name"), 1, 4).as("lft"),
          substring(col("n_name"), -4, 4).as("rgt"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey,
             | lpad(n_name, 12, '*') AS lp,
             | rpad(n_name, 12, '-') AS rp,
             | repeat(substring(n_name, 1, 3), 2) AS rep,
             | reverse(n_name) AS rev,
             | translate(n_name, '_N', '-n') AS tr,
             | substring(n_name, 1, 4) AS lft,
             | right(n_name, 4) AS rgt
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // explode_outer: rows with empty arrays survive with NULL — the
    // outer-generator semantics (vs e20's inner explode)
    Q("e30_explode_outer",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(
          when(col("l_quantity") > 45, col("l_linenumber").cast(LongType))
            .otherwise(lit(null)))).as("highs"))
        // filter(x -> x IS NOT NULL) empties most arrays → outer keeps rows
        .select(col("l_orderkey"),
          explode_outer(filter(col("highs"), _.isNotNull)).as("line"))
        .orderBy(asc_nulls_first("l_orderkey"), asc_nulls_first("line")),
      Some("""SELECT l_orderkey, u.line FROM (
             | SELECT l_orderkey,
             |  list_filter(list(CASE WHEN l_quantity > 45
             |    THEN CAST(l_linenumber AS BIGINT) END), x -> x IS NOT NULL) AS highs
             | FROM lineitem WHERE l_orderkey % 500 = 0 GROUP BY 1) t
             |LEFT JOIN LATERAL (SELECT unnest(t.highs) AS line) u ON TRUE
             |ORDER BY l_orderkey NULLS FIRST, u.line NULLS FIRST""".stripMargin)),

    // the Frame API end-to-end: conform -> truthy filter -> join ->
    // groupAgg -> orderBy, nothing but graft surface
    Q("fr1_frame_pipeline",
      (s, dir) => {
        import graft.operators.Frame
        import graft.schema.SchemaDSL
        val orders = Frame(t(s, dir, "orders"))
          .select(
            "custkey" -> col("o_custkey"),
            "price_str" -> col("o_totalprice").cast(StringType),
            "priority" -> col("o_orderpriority"))
          .conform(SchemaDSL.parse("custkey:long,price_str:double,priority:str"))
          .rename("price_str" -> "price")
        val customers = Frame(t(s, dir, "customer"))
          .select("custkey" -> col("c_custkey"), "nk" -> col("c_nationkey"))
        orders
          .filter(nullif(col("custkey") % 4, lit(1)))
          .join(customers, "inner", Seq("custkey"))
          .groupAgg(Seq("priority"),
            "cnt" -> count(lit(1)),
            "total_c" -> sum(round(col("price") * 100).cast(LongType)),
            "n_nations" -> countDistinct(col("nk")))
          .orderBy(asc_nulls_first("priority")).df
      },
      Some("""SELECT priority, COUNT(*) AS cnt,
             | CAST(SUM(CAST(ROUND(price*100) AS BIGINT)) AS BIGINT) AS total_c,
             | COUNT(DISTINCT nk) AS n_nations
             |FROM (
             | SELECT o_custkey AS custkey,
             |  CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price,
             |  o_orderpriority AS priority
             | FROM orders
             | WHERE NULLIF(o_custkey % 4, 1) IS NOT NULL
             |   AND NULLIF(o_custkey % 4, 1) <> 0) o
             |JOIN (SELECT c_custkey AS custkey, c_nationkey AS nk FROM customer) c
             |USING (custkey)
             |GROUP BY priority ORDER BY priority NULLS FIRST""".stripMargin)),

    // regexp surface: extract/extract-all/match on simple patterns (Java
    // regex and RE2 agree on these constructs)
    Q("e19_regexp_funcs",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_custkey") % 30 === 0)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "#(\\d+)", 1).as("num_part"),
          size(regexp_extract_all(col("c_name"), lit("[0-9]"), lit(0)))
            .cast(LongType).as("n_digits"),
          col("c_name").rlike("Customer#0*1").as("starts_one"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             | regexp_extract(c_name, '#(\d+)', 1) AS num_part,
             | CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits,
             | regexp_matches(c_name, 'Customer#0*1') AS starts_one
             |FROM customer WHERE c_custkey % 30 = 0
             |ORDER BY c_custkey""".stripMargin)),

    // boolean aggregates: count_if / bool_and / bool_or
    Q("a6_bool_aggs",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_quantity") > 45).as("any_large"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
             | bool_and(l_quantity > 0) AS all_positive,
             | bool_or(l_quantity > 45) AS any_large
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // numeric function surface — no transcendentals (JVM vs C libm last-
    // ulp differences would break the bit-exact compare); sqrt/ceil/floor
    // and remainder are IEEE-exact in both engines
    Q("e18_numeric_funcs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 30000).as("abs_v"),
          signum(col("l_discount") - 0.05).cast(LongType).as("sign_v"),
          (col("l_quantity").cast(LongType) % 7).as("mod_v"),
          ceil(col("l_extendedprice") / 1000).cast(LongType).as("ceil_v"),
          floor(col("l_extendedprice") / 1000).cast(LongType).as("floor_v"),
          sqrt(col("l_quantity")).as("sqrt_v"),
          greatest(col("l_tax"), col("l_discount")).as("gr_v"),
          least(col("l_tax"), col("l_discount")).as("le_v"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             | abs(l_extendedprice - 30000) AS abs_v,
             | CAST(sign(l_discount - 0.05) AS BIGINT) AS sign_v,
             | CAST(l_quantity AS BIGINT) % 7 AS mod_v,
             | CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_v,
             | CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_v,
             | sqrt(l_quantity) AS sqrt_v,
             | greatest(l_tax, l_discount) AS gr_v,
             | least(l_tax, l_discount) AS le_v
             |FROM lineitem WHERE l_orderkey % 100 = 0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // string↔array manipulation: split / slice / array_join round-trips
    Q("e23_split_join",
      (s, dir) => t(s, dir, "documents")
        .filter(col("doc_id") % 40 === 0)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_parts"),
          array_join(slice(split(col("text"), " "), 1, 5), "_").as("first5"),
          element_at(split(col("text"), " "), -1).as("last_word"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_parts,
             | array_to_string(string_split(text, ' ')[1:5], '_') AS first5,
             | string_split(text, ' ')[-1] AS last_word
             |FROM documents WHERE doc_id % 40 = 0
             |ORDER BY doc_id""".stripMargin)),

    // conditional scalar functions: if / ifnull / nullif / nvl2-shaped,
    // greatest/least NULL-skipping (identical in both engines)
    Q("e24_conditionals",
      (s, dir) => {
        val bal = col("c_acctbal")
        t(s, dir, "customer")
          .filter(col("c_custkey") % 25 === 0)
          .select(col("c_custkey"),
            when(bal > 0, lit("pos")).otherwise(lit("nonpos")).as("sign_class"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or"),
            greatest(nullif(col("c_nationkey") % 5, lit(2)).cast(LongType),
              lit(1L)).as("g"),
            least(nullif(col("c_nationkey") % 5, lit(2)).cast(LongType),
              lit(3L)).as("l"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             | if(c_acctbal > 0, 'pos', 'nonpos') AS sign_class,
             | ifnull(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or,
             | greatest(CAST(NULLIF(c_nationkey % 5, 2) AS BIGINT), 1) AS g,
             | least(CAST(NULLIF(c_nationkey % 5, 2) AS BIGINT), 3) AS l
             |FROM customer WHERE c_custkey % 25 = 0
             |ORDER BY c_custkey""".stripMargin)),

    // DecimalType end-to-end: exact money aggregation without the cents
    // convention (both engines' decimal sums are exact; result width
    // pinned to DECIMAL(18,2) since sum-type promotion differs)
    // Decimal aggregation (exact sum, no float drift); the output is
    // integerized to cents — a raw DECIMAL(18,2) column is a latent
    // comparator flake when a sum lands on whole-ten cents (trailing-zero
    // decimal string vs float shortest-repr), same failure mode as d2.
    Q("d1_decimal_sum",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderpriority"),
          col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
        .groupBy("o_orderpriority")
        .agg((sum("p").cast(DecimalType(18, 2)) * 100).cast(LongType).as("total_c"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c,
             | COUNT(*) AS cnt
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // struct construction + field access + nested struct in a struct —
    // flattened back to scalars so the comparator never sees the struct
    Q("e26_struct_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 250 === 0)
        .select(col("o_orderkey"),
          struct(
            col("o_orderpriority").as("pri"),
            round(col("o_totalprice") * 100).cast(LongType).as("total_c"),
            struct(col("o_custkey").as("ck")).as("who")).as("o"))
        .select(
          col("o_orderkey"),
          col("o").getField("pri").as("pri"),
          col("o").getField("total_c").as("total_c"),
          col("o").getField("who").getField("ck").as("custkey"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o.pri AS pri, o.total_c AS total_c,
             | o.who.ck AS custkey
             |FROM (
             | SELECT o_orderkey,
             |  struct_pack(pri := o_orderpriority,
             |    total_c := CAST(ROUND(o_totalprice*100) AS BIGINT),
             |    who := struct_pack(ck := o_custkey)) AS o
             | FROM orders WHERE o_orderkey % 250 = 0)
             |ORDER BY o_orderkey""".stripMargin)),

    // map construction + lookup + keys/size, flattened to scalars; a
    // missing key is NULL in both engines (DuckDB's m[k] yields a list —
    // [1] unwraps it, out-of-bounds → NULL, matching Spark element_at)
    Q("e28_map_funcs",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 250 === 0)
        .select(col("o_orderkey"),
          map_from_arrays(
            array(lit("cust"), lit("total_c")),
            array(col("o_custkey"),
              round(col("o_totalprice") * 100).cast(LongType))).as("m"))
        .select(
          col("o_orderkey"),
          element_at(col("m"), "cust").as("cust"),
          element_at(col("m"), "total_c").as("total_c"),
          element_at(col("m"), "absent").as("missing"),
          size(col("m")).cast(LongType).as("n"),
          array_join(map_keys(col("m")), ",").as("ks"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, m['cust'][1] AS cust,
             | m['total_c'][1] AS total_c, m['absent'][1] AS missing,
             | CAST(cardinality(m) AS BIGINT) AS n,
             | array_to_string(map_keys(m), ',') AS ks
             |FROM (
             | SELECT o_orderkey, MAP(['cust', 'total_c'],
             |  [o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT)]) AS m
             | FROM orders WHERE o_orderkey % 250 = 0)
             |ORDER BY o_orderkey""".stripMargin)),

    // greatest/least: both engines skip NULLs and return NULL only when
    // every argument is NULL (verified cell-by-cell)
    Q("e27_greatest_least",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Long, java.lang.Long, java.lang.Long)](
          (1, 1L, 5L, 3L), (2, null, 5L, 3L), (3, null, null, 3L),
          (4, null, null, null), (5, -2L, null, 7L)
        ).toDF("id", "x", "y", "z")
        df.select(col("id"),
          greatest(col("x"), col("y"), col("z")).as("g"),
          least(col("x"), col("y"), col("z")).as("l"))
          .orderBy("id")
      },
      Some("""SELECT id, greatest(x, y, z) AS g, least(x, y, z) AS l
             |FROM (VALUES (1, CAST(1 AS BIGINT), CAST(5 AS BIGINT), CAST(3 AS BIGINT)),
             | (2, NULL, 5, 3), (3, NULL, NULL, 3), (4, NULL, NULL, NULL),
             | (5, -2, NULL, 7)) t(id, x, y, z)
             |ORDER BY id""".stripMargin)),

    // Decimal arithmetic surface: add/sub/mul propagation, round,
    // string round-trip, floor-to-int — every output width pinned on
    // both sides because Spark and DuckDB promote sums/products to
    // different precisions (division is intentionally absent: the
    // engines disagree on result scale and rounding; the engine exposes
    // it only through explicit-cast forms)
    // All arithmetic runs in DecimalType; outputs are integerized to
    // BIGINT (value * 10^scale) plus the VARCHAR round-trip witness.
    // Round 2's driver run hash-mismatched when decimal columns reached
    // the comparator directly (scale-0 / trailing-zero decimals stringify
    // differently than their float repr), even though every cell matched
    // value-for-value in DuckDB locally — so decimal stays internal.
    Q("d2_decimal_arith",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
        .select(
          col("o_orderkey"),
          (col("p") * 100).cast(LongType).as("p_c"),
          ((col("p") + col("p")).cast(DecimalType(14, 2)) * 100).cast(LongType).as("dadd_c"),
          ((col("p") - lit(BigDecimal("0.01")).cast(DecimalType(4, 2))).cast(DecimalType(14, 2)) * 100).cast(LongType).as("dsub_c"),
          ((col("p") * lit(BigDecimal("1.05")).cast(DecimalType(4, 2))).cast(DecimalType(18, 4)) * 10000).cast(LongType).as("dmul_dm"),
          ((-col("p")).cast(DecimalType(12, 2)) * 100).cast(LongType).as("dneg_c"),
          round(col("p"), -2).cast(LongType).as("dround"),
          col("p").cast(StringType).as("dstr"),
          (col("p").cast(StringType).cast(DecimalType(12, 2)) * 100).cast(LongType).as("drt_c"),
          floor(col("p")).cast(LongType).as("dfloor"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             | CAST(p * 100 AS BIGINT) AS p_c,
             | CAST(CAST(p + p AS DECIMAL(14,2)) * 100 AS BIGINT) AS dadd_c,
             | CAST(CAST(p - CAST('0.01' AS DECIMAL(4,2)) AS DECIMAL(14,2)) * 100 AS BIGINT) AS dsub_c,
             | CAST(CAST(p * CAST('1.05' AS DECIMAL(4,2)) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS dmul_dm,
             | CAST(CAST(-p AS DECIMAL(12,2)) * 100 AS BIGINT) AS dneg_c,
             | CAST(ROUND(p, -2) AS BIGINT) AS dround,
             | CAST(p AS VARCHAR) AS dstr,
             | CAST(CAST(CAST(p AS VARCHAR) AS DECIMAL(12,2)) * 100 AS BIGINT) AS drt_c,
             | CAST(FLOOR(p) AS BIGINT) AS dfloor
             |FROM (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p
             |      FROM orders WHERE o_orderkey % 50 = 0)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("h1_histogram",
      (s, dir) => t(s, dir, "orders")
        .select(floor(col("o_totalprice") / 50000).cast(LongType).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
        .orderBy("bin"),
      Some("""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
             | COUNT(*) AS cnt
             |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin)),

    // custom typed Aggregator (UDAF surface, SURVEY §2.5): exact weighted
    // mean of price by quantity, permille — oracle is plain SQL arithmetic
    Q("a5_weighted_avg",
      (s, dir) => {
        val wavg = udaf(new graft.functions.Aggregators.WeightedMeanPermille)
        t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast(LongType).as("price_c"),
            col("l_quantity").cast(LongType).as("qty"))
          .groupBy("l_returnflag")
          .agg(wavg(col("price_c"), col("qty")).as("wavg_pm"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             | CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
             |  * 1000 // CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wavg_pm
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // bitwise operations (exact integer semantics in both engines)
    Q("e25_bitwise",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") % 150 === 0)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(255L).as("band"),
          col("o_orderkey").bitwiseOR(4096L).as("bor"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
          shiftleft(col("o_custkey"), 3).as("shl"),
          shiftright(col("o_orderkey"), 2).as("shr"),
          bit_count(col("o_orderkey")).cast(LongType).as("popcount"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             | o_orderkey & 255 AS band,
             | o_orderkey | 4096 AS bor,
             | xor(o_orderkey, o_custkey) AS bxor,
             | o_custkey << 3 AS shl,
             | o_orderkey >> 2 AS shr,
             | CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
             |FROM orders WHERE o_orderkey % 150 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    // deterministic mode: most frequent value per group with an explicit
    // (count DESC, value ASC) tie-break — engine mode() functions break
    // ties arbitrarily, so the tie policy is spelled out in both
    Q("a7_mode",
      (s, dir) => {
        val counts = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("q"))
          .groupBy("l_returnflag", "q").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(desc("n"), asc("q"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("q").as("mode_qty"), col("n").as("freq"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, q AS mode_qty, n AS freq FROM (
             | SELECT l_returnflag, q, n,
             |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |    ORDER BY n DESC, q ASC) AS rn
             | FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
             |   COUNT(*) AS n FROM lineitem GROUP BY 1, 2))
             |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)),

    // ordered string aggregation (listagg shape): sorted before joining
    // so both engines produce the identical string
    Q("a8_string_agg",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_custkey") % 200 === 0)
        .groupBy("o_custkey")
        .agg(array_join(
          sort_array(collect_list(col("o_orderkey").cast(StringType))), ",")
          .as("order_keys"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
             | string_agg(CAST(o_orderkey AS VARCHAR), ','
             |   ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys
             |FROM orders WHERE o_custkey % 200 = 0
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // exact integer covariance numerator: n·Σxy − Σx·Σy over
    // (quantity, discount-centi) — no float accumulation
    Q("a4_covar",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast(LongType).as("x"),
          round(col("l_discount") * 100).cast(LongType).as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("covar_num", col("n") * col("sxy") - col("sx") * col("sy"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, n, sx, sy, sxy, n * sxy - sx * sy AS covar_num
             |FROM (
             | SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             |  CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
             |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy
             | FROM lineitem GROUP BY 1)
             |ORDER BY l_returnflag""".stripMargin))
  )
}
