package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational operator battery — SURVEY.md §2.3 coverage, Spark-first.
  *
  * Each query has a DataFrame-API implementation (so Catalyst plans it:
  * pushdown, pruning, join selection, partial aggregation, AQE) and a
  * DuckDB-runnable ANSI oracle with IDENTICAL column names and row order.
  *
  * Numeric discipline for oracle hash-parity: floating-point aggregation is
  * order-dependent, so every SUM over a double column goes through a
  * DECIMAL cast (exact, associative) INTERNALLY — but no result column is
  * ever DECIMAL-typed. Output columns are DOUBLE: the exact decimal total
  * casts to its nearest double identically in Spark and DuckDB, and a
  * double renders identically however the driver's hasher loads the two
  * sides (pyarrow keeps parquet DECIMAL as scale-preserving
  * `decimal.Decimal('1.40')` objects while duckdb's pandas conversion
  * yields float64 `1.4` — same value, different canonical string — which
  * is exactly the round-1 hash-mismatch pattern). Values that pass through
  * untouched (projection/min/max/lag) stay raw doubles: bit-identical by
  * construction.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact associative sum of a double column: cast each value to
    * DECIMAL(14,2) (inputs are money-like, exactly 2dp in the testdata, so
    * the per-value cast is far from any rounding boundary and agrees across
    * engines), sum exactly in decimal, then cast the total to DOUBLE —
    * correctly rounded, hence bit-identical in Spark and DuckDB. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(14, scale))).cast(DoubleType)

  // ---------------------------------------------------------------- q1: agg
  // TPC-H Q1 shape: the reference's flagship groupBy-agg (SURVEY §2.3,
  // examples/02-datagen-batch.flinknb:54). Partial+final HashAggregate;
  // filter pushed to parquet scan.
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // cast each FACTOR to decimal (exact at 2dp), multiply and sum in
        // decimal (exact), cast the total to double — not the double
        // product to decimal, whose rounding at scale 4 sits on engine-
        // dependent boundaries.
        sum(col("l_extendedprice").cast(DecimalType(14, 2)) *
            (lit(1).cast(DecimalType(14, 2)) - col("l_discount").cast(DecimalType(14, 2))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(14,2)) - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------ q2: filters
  // WHERE predicate battery: range, IN, LIKE, BETWEEN, IS NOT NULL
  // (SURVEY §2.3 Filter tier-V). All forms push to the parquet scan.
  def q2Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_totalprice") > 1000.0 &&
        col("o_orderstatus").isin("O", "F") &&
        col("o_orderpriority").like("%URGENT%") &&
        col("o_custkey").between(1, 100000) &&
        col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  val q2Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_totalprice > 1000.0 AND o_orderstatus IN ('O','F')
      |  AND o_orderpriority LIKE '%URGENT%'
      |  AND o_custkey BETWEEN 1 AND 100000 AND o_orderdate IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------- q3: inner join
  // 3-way equi-join + agg (customer⋈orders⋈nation). nation/region are tiny
  // dims → broadcast() them explicitly: at 100 TB the fact side never
  // shuffles for these joins; only the final groupBy shuffles on n_name.
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val nat = t(s, dir, "nation")
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("order_cnt"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("n_name"))
  }

  val q3Sql: String =
    """SELECT n_name, COUNT(*) AS order_cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------- q4: outer/semi/anti
  def q4LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  val q4Sql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 50000.0)
    cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q4SemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 50000.0)
      |ORDER BY c_custkey""".stripMargin

  def q4AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val hugeOrders = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
    cust.join(hugeOrders, cust("c_custkey") === hugeOrders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q4AntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  def q4FullJoin(s: SparkSession, dir: String): DataFrame = {
    // Full outer on the nation/supplier keys — exercises FullOuter path.
    val nat = t(s, dir, "nation")
    val sup = t(s, dir, "supplier")
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_suppliers"))
    nat.join(sup, nat("n_nationkey") === sup("s_nationkey"), "full_outer")
      .select(col("n_name"), coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("n_name").asc_nulls_first)
  }

  val q4FullSql: String =
    """SELECT n_name, COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM nation FULL OUTER JOIN
      |  (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
      |  ON n_nationkey = s_nationkey
      |ORDER BY n_name ASC NULLS FIRST""".stripMargin

  // ----------------------------------------------------------- q5: top-N
  // ORDER BY … LIMIT → Catalyst TakeOrderedAndProject: per-partition top-k
  // then driver merge of k×partitions rows — no global sort shuffle, scales
  // to any input size (reference shape: examples/02…flinknb:71).
  def q5TopN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("total_spent"))
      .orderBy(col("order_count").desc, col("total_spent").desc, col("o_custkey"))
      .limit(10)

  val q5Sql: String =
    """SELECT o_custkey, COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spent
      |FROM orders GROUP BY o_custkey
      |ORDER BY order_count DESC, total_spent DESC, o_custkey LIMIT 10""".stripMargin

  // ------------------------------------------------- q6: multi-key sort
  def q6Sort(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("p_retailprice"))
      .orderBy(col("p_brand").asc, col("p_size").desc, col("p_partkey").asc)

  val q6Sql: String =
    """SELECT p_partkey, p_brand, p_size, p_retailprice
      |FROM part ORDER BY p_brand ASC, p_size DESC, p_partkey ASC""".stripMargin

  // ---------------------------------------------- q7: window ranking
  // ROW_NUMBER/RANK/DENSE_RANK per partition (SURVEY §2.3 over-windows).
  // One shuffle on the partition key; rank filter (rn<=3) is the scalable
  // streaming-top-N shape.
  def q7WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("rn"), col("rk"), col("drk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q7Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------- q8: analytic window functions
  // LAG/LEAD/FIRST_VALUE/LAST_VALUE + running frame (ROWS BETWEEN).
  def q8WindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .filter(col("l_suppkey") <= 3)
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
      .withColumn("first_qty", first(col("l_quantity")).over(wRun))
      .withColumn("running_qty",
        sum(col("l_quantity").cast(DecimalType(14, 2))).over(wRun)
          .cast(DoubleType))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("prev_qty"), col("next_qty"),
        col("first_qty"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val q8Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  l_quantity, prev_qty, next_qty, first_qty,
      |  CAST(running_qty AS DOUBLE) AS running_qty
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    LAG(l_quantity, 1) OVER w AS prev_qty,
      |    LEAD(l_quantity, 1) OVER w AS next_qty,
      |    FIRST_VALUE(l_quantity) OVER wr AS first_qty,
      |    SUM(CAST(l_quantity AS DECIMAL(14,2))) OVER wr AS running_qty
      |  FROM lineitem WHERE l_suppkey <= 3
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber),
      |    wr AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |) ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------------ q9: rollup/cube
  def q9Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q9Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  def q9Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q9CubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // --------------------------------------- q10: distinct & stat aggregates
  def q10DistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))

  val q10Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  MIN(l_quantity) AS min_qty,
      |  MAX(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------- q11: set ops
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val ordCust = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
    val bigCust = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("custkey"))
    val allCust = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
    // customers with any order, minus big spenders, intersected with customer dim
    ordCust.distinct()
      .except(bigCust.distinct())
      .intersect(allCust)
      .orderBy(col("custkey"))
  }

  val q11Sql: String =
    """SELECT * FROM (
      |  SELECT DISTINCT o_custkey AS custkey FROM orders
      |  EXCEPT
      |  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
      |) INTERSECT SELECT c_custkey AS custkey FROM customer
      |ORDER BY custkey""".stripMargin

  def q11Union(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("id"), lit("customer").as("src"))
    val sup = t(s, dir, "supplier")
      .select(col("s_suppkey").as("id"), lit("supplier").as("src"))
    c.union(sup).orderBy(col("src"), col("id"))
  }

  val q11UnionSql: String =
    """SELECT c_custkey AS id, 'customer' AS src FROM customer
      |UNION ALL SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
      |ORDER BY src, id""".stripMargin

  // ------------------------------------------------- q12: theta/non-equi join
  // Range (non-equi) join — small build side broadcast → nested-loop stays
  // local; never a cartesian shuffle.
  def q12ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    sup.join(broadcast(nat), sup("s_nationkey") < nat("n_nationkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_higher_nations"))
      .orderBy(col("s_suppkey"))
  }

  val q12Sql: String =
    """SELECT s_suppkey, COUNT(*) AS n_higher_nations
      |FROM supplier JOIN nation ON s_nationkey < n_nationkey
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------ q13: correlated subquery
  // IN-subquery → Catalyst rewrites to semi join (RewritePredicateSubquery).
  def q13InSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q13Sql: String =
    """SELECT o_orderkey, o_custkey
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ q14: scalar functions
  // String/date/math/conditional battery (SURVEY §2.3 scalar fns tier-V).
  def q14ScalarFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).as("name_len"),
        substring(col("c_mktsegment"), 1, 3).as("seg3"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast(StringType)).as("seg_key"),
        when(col("c_acctbal") > 5000.0, lit("high"))
          .when(col("c_acctbal") > 0.0, lit("mid"))
          .otherwise(lit("low")).as("bal_band"),
        abs(col("c_acctbal")).as("abs_bal"),
        // HALF_UP-to-1-decimal spelled as floor(x*10+0.5)/10: every step is
        // a single IEEE op evaluated identically in Spark and DuckDB, so
        // the result is bit-identical — whereas round(double, 1) takes the
        // exact-BigDecimal path in Spark but the multiply-then-rint path in
        // DuckDB, which disagree when x sits on a .x5 boundary (2dp inputs
        // divided by 100 produce them). + 0.0 collapses IEEE negative zero.
        ((floor(col("c_acctbal") / 100.0 * 10.0 + 0.5) / 10.0) + lit(0.0))
          .as("bal_hundreds"))
      .orderBy(col("c_custkey"))

  val q14Sql: String =
    """SELECT c_custkey,
      |  UPPER(c_name) AS name_upper,
      |  LENGTH(c_name) AS name_len,
      |  SUBSTRING(c_mktsegment, 1, 3) AS seg3,
      |  CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
      |  CASE WHEN c_acctbal > 5000.0 THEN 'high'
      |       WHEN c_acctbal > 0.0 THEN 'mid' ELSE 'low' END AS bal_band,
      |  ABS(c_acctbal) AS abs_bal,
      |  FLOOR(c_acctbal / 100.0 * 10.0 + 0.5) / 10.0 + 0.0 AS bal_hundreds
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------- q15: date/time functions
  def q15DateFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"))
      .orderBy(col("o_orderkey"))

  val q15Sql: String =
    """SELECT o_orderkey,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
      |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ q16: grouping sets
  def q16GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, cnt""".stripMargin)
  }

  val q16Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, cnt""".stripMargin

  // ------------------------------------------------ q17: exact dedup
  // dropDuplicates == SQL DISTINCT-by-key with deterministic survivor:
  // implemented as min-per-group to keep an oracle-checkable survivor rule.
  def q17DedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("first_orderkey"))
      .orderBy(col("o_custkey"), col("o_orderstatus"))

  val q17Sql: String =
    """SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS first_orderkey
      |FROM orders GROUP BY o_custkey, o_orderstatus
      |ORDER BY o_custkey, o_orderstatus""".stripMargin

  // ------------------------------------------------ q18: values / no-FROM
  // SETUP.md:76 smoke: SELECT without FROM.
  def q18Values(s: SparkSession, dir: String): DataFrame =
    s.sql("SELECT 1 AS id, 'Hello Spark!' AS message")

  val q18Sql: String = "SELECT 1 AS id, 'Hello Spark!' AS message"

  // ---------------------------------------------------- q19: JSON functions
  // JSON scalar functions (SURVEY §2.3 scalar fns: JSON_VALUE →
  // get_json_object / from_json). events.props is a JSON string {"k": n}.
  def q19Json(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_value"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_struct"))
      .filter(col("k_value") > 50)
      .orderBy(col("event_id"))

  val q19Sql: String =
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct
      |FROM events
      |WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------- q20: statistical aggregates
  def q20StatAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(avg(col("l_quantity")), 4).as("avg_qty"))
      .orderBy(col("l_returnflag"))

  val q20Sql: String =
    """SELECT l_returnflag,
      |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
      |  ROUND(var_samp(l_quantity), 4) AS var_qty,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------- q21: approximate (sketch) aggregates
  // HLL++ distinct counts + approx quantiles (SURVEY §2.3: approximate =
  // approx_count_distinct). Sketch VALUES are engine-specific, so the
  // driver-certified form is the error-bound check: every sketch estimate
  // is computed next to its exact twin and a row is emitted only when the
  // estimate breaks its accuracy contract (HLL: 3·rsd relative error;
  // percentile_approx(acc=1000): rank error n/1000 → ≤ 5% value slack on
  // this distribution). Provably-empty output; the oracle is the empty
  // relation. The raw sketch query remains in RelationalSpec.
  def q21Approx(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // one agg per exact twin: mixing countDistinct ×2 + exact percentile in
    // a single aggregate makes Catalyst Expand the input per distinct set
    // (3× the rows through a sort-heavy plan — 20 s vs ~1 s at sf0.1).
    // Separate single-purpose aggregations joined on the 3-row group key
    // are also the shapes that scale: two-phase distinct, map-combined
    // sketches.
    val apx = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey")).as("apx_parts"),
      approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("apx_supps"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("apx_p50"),
      percentile_approx(col("l_quantity"), lit(0.99), lit(1000)).as("apx_p99"))
    val exParts = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ex_parts"))
    val exSupps = li.select(col("l_returnflag"), col("l_suppkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("ex_supps"))
    val exPct = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, 0.5)").as("ex_p50"),
      expr("percentile(l_quantity, 0.99)").as("ex_p99"))
    val agg = apx
      .join(exParts, Seq("l_returnflag"))
      .join(exSupps, Seq("l_returnflag"))
      .join(exPct, Seq("l_returnflag"))
    def check(name: String, apx: Column, ex: Column, relBound: Double) =
      struct(lit(name).as("metric"),
        apx.cast(DoubleType).as("approx"),
        ex.cast(DoubleType).as("exact"),
        lit(relBound).as("bound"))
    agg.select(col("l_returnflag"), explode(array(
        check("parts_hll_rsd5", col("apx_parts"), col("ex_parts"), 0.15),
        check("supps_hll_rsd1", col("apx_supps"), col("ex_supps"), 0.03),
        check("p50_quantile", col("apx_p50"), col("ex_p50"), 0.05),
        check("p99_quantile", col("apx_p99"), col("ex_p99"), 0.05))).as("c"))
      .filter(abs(col("c.approx") - col("c.exact")) >
        col("c.bound") * greatest(col("c.exact"), lit(1.0)))
      .select(col("l_returnflag"), col("c.metric").as("metric"),
        col("c.approx").as("approx"), col("c.exact").as("exact"))
      .orderBy(col("l_returnflag"), col("metric"))
  }

  val q21Sql: String =
    """SELECT CAST(NULL AS VARCHAR) AS l_returnflag, CAST(NULL AS VARCHAR) AS metric,
      |  CAST(NULL AS DOUBLE) AS approx, CAST(NULL AS DOUBLE) AS exact
      |WHERE FALSE""".stripMargin

  // --------------------------------- q23: scalar-function breadth battery 2
  // Second scalar battery (SURVEY §2.3 scalar fns): regexp extraction,
  // format/pad/replace/split-part string surgery, NULLIF/COALESCE,
  // GREATEST, position — each with an exact DuckDB twin.
  def q23StringFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        regexp_extract(col("o_orderpriority"), "[0-9]+", 0).as("prio_digit"),
        element_at(split(col("o_orderpriority"), "-"), 1).as("prio_code"),
        replace(col("o_orderpriority"), lit("-"), lit("_")).as("prio_snake"),
        lpad(col("o_orderkey").cast(StringType), 10, "0").as("key_padded"),
        instr(col("o_orderpriority"), "URGENT").cast(LongType).as("urgent_pos"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("X")).as("status_or_x"),
        greatest(pmod(col("o_custkey"), lit(7L)), lit(3L)).as("g7"))
      .orderBy(col("o_orderkey"))

  val q23Sql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m') AS order_month,
      |  regexp_extract(o_orderpriority, '[0-9]+') AS prio_digit,
      |  split_part(o_orderpriority, '-', 1) AS prio_code,
      |  replace(o_orderpriority, '-', '_') AS prio_snake,
      |  lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
      |  CAST(strpos(o_orderpriority, 'URGENT') AS BIGINT) AS urgent_pos,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'X') AS status_or_x,
      |  GREATEST(o_custkey % 7, 3) AS g7
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ------------------------------------ q24: collection (array) functions
  // Array surface (SURVEY §2.3 scalar fns: CARDINALITY/ELEMENT/array ops):
  // size, indexing, membership, slicing, sorting — on the tokenized text
  // column, where both engines agree on binary string ordering.
  def q24CollectionFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"),
        size(col("t")).as("n_toks"),
        element_at(col("t"), 1).as("first_tok"),
        array_contains(col("t"), "the").as("has_the"),
        concat_ws(" ", slice(col("t"), 1, 3)).as("first3"),
        concat_ws(" ", slice(sort_array(col("t")), 1, 2)).as("sorted2"))
      .orderBy(col("doc_id"))

  val q24Sql: String =
    """SELECT doc_id, CAST(len(t) AS INT) AS n_toks, t[1] AS first_tok,
      |  list_contains(t, 'the') AS has_the,
      |  array_to_string(t[1:3], ' ') AS first3,
      |  array_to_string(list_sort(t)[1:2], ' ') AS sorted2
      |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------- q25: advanced aggregate surface
  // MAX_BY/arg-max (deterministic via a composite bigint ordering key —
  // struct arg-max isn't portable to the oracle), LISTAGG-style distinct
  // string aggregation (ordered, so collect_set's nondeterministic order
  // is canonicalized), and CORR.
  def q25AggMore(s: SparkSession, dir: String): DataFrame = {
    // injective while o_orderkey < 1e10 (TPC-H sf ~1600; cents ≤ 5e7 keeps
    // the product below 2^63) — ties then break on orderkey identically in
    // both engines
    val ordKey = round(col("o_totalprice") * 100, 0).cast(LongType) *
      lit(10000000000L) + col("o_orderkey")
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), ordKey).as("top_order"),
        concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
          .as("priorities"),
        (round(corr(col("o_totalprice"), col("o_custkey")), 4) + lit(0.0))
          .as("price_cust_corr"))
      .orderBy(col("o_orderstatus"))
  }

  val q25Sql: String =
    """SELECT o_orderstatus,
      |  arg_max(o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT)*10000000000 + o_orderkey) AS top_order,
      |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
      |  ROUND(corr(o_totalprice, o_custkey), 4) + 0.0 AS price_cust_corr
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------- q26: EXISTS / NOT EXISTS / scalar subquery
  // Catalyst rewrites EXISTS → LeftSemi, NOT EXISTS → LeftAnti, and the
  // correlated scalar COUNT to an aggregated left outer join
  // (RewritePredicateSubquery / RewriteCorrelatedScalarSubquery) — all
  // shuffle-keyed on the correlation key, no per-row re-execution. Identical
  // SQL runs on the oracle (both dialects share the full subquery envelope).
  val q26Sql: String =
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_totalprice > 100000.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
      |                  AND o2.o_orderstatus = 'F' AND o2.o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  def q26Exists(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q26Sql)
  }

  // ----------------------------------- q27: navigation window functions
  // FIRST/LAST/NTH_VALUE with explicit frames + NTILE/CUME_DIST/PERCENT_RANK.
  // o_orderkey is unique per partition, so every navigation value is
  // deterministic; CUME_DIST/PERCENT_RANK are single integer divisions —
  // the same IEEE op in both engines, so doubles hash bit-identically.
  val q27Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  FIRST_VALUE(o_totalprice) OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS first_price,
      |  LAST_VALUE(o_totalprice) OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
      |  NTH_VALUE(o_totalprice, 2) OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price,
      |  CAST(NTILE(4) OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS BIGINT) AS quartile,
      |  CUME_DIST() OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS cdist,
      |  PERCENT_RANK() OVER
      |    (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prank
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def q27WindowNav(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q27Sql)
  }

  // --------------------------------- q28: bitwise / try_cast / math battery
  // The rest of the Flink scalar surface (FUNCTIONS envelope): bitwise
  // ops, hex/bin rendering, chr/ascii, TRY_CAST, sign/mod/log/exp/power.
  // Pure per-row expressions — map-side, codegen'd, scan-bounded at any
  // scale. Integer/string ops are exact; the four libm doubles are
  // round(.,6)-stabilized (1-ulp engine divergence sits ~1e-10 from any
  // rounding boundary).
  def q28ScalarMore(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey,
        |  c_custkey & 255 AS bits_and,
        |  c_custkey | 4096 AS bits_or,
        |  c_custkey ^ c_nationkey AS bits_xor,
        |  shiftleft(CAST(c_nationkey AS BIGINT), 3) AS shl,
        |  shiftright(c_custkey, 2) AS shr,
        |  CAST(bit_count(c_custkey) AS BIGINT) AS pop,
        |  hex(CAST(c_nationkey AS BIGINT)) AS hx,
        |  bin(CAST(c_nationkey AS BIGINT)) AS bn,
        |  chr(65 + c_nationkey % 26) AS letter,
        |  CAST(ascii(substring(c_name, 1, 1)) AS BIGINT) AS first_ascii,
        |  reverse(c_mktsegment) AS seg_rev,
        |  repeat(substring(c_mktsegment, 1, 2), 2) AS seg_rep,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |  TRY_CAST(c_mktsegment AS INT) AS seg_num,
        |  CAST(TRY_CAST(concat('1', CAST(c_nationkey AS STRING)) AS INT) AS BIGINT) AS nk_num,
        |  CAST(sign(c_acctbal) AS BIGINT) AS bal_sign,
        |  mod(c_custkey, 7) AS k7,
        |  round(log10(abs(c_acctbal) + 1.0), 6) + 0.0 AS log_bal,
        |  round(sqrt(abs(c_acctbal)), 6) + 0.0 AS sqrt_bal,
        |  round(exp(CAST(c_nationkey AS DOUBLE) / 25.0), 6) AS exp_nk,
        |  power(CAST(c_nationkey AS DOUBLE), 2.0) AS pow_nk
        |FROM customer ORDER BY c_custkey""".stripMargin)
  }

  val q28Sql: String =
    """SELECT c_custkey,
      |  c_custkey & 255 AS bits_and,
      |  c_custkey | 4096 AS bits_or,
      |  xor(c_custkey, CAST(c_nationkey AS BIGINT)) AS bits_xor,
      |  CAST(c_nationkey AS BIGINT) << 3 AS shl,
      |  c_custkey >> 2 AS shr,
      |  CAST(bit_count(c_custkey) AS BIGINT) AS pop,
      |  hex(CAST(c_nationkey AS BIGINT)) AS hx,
      |  bin(CAST(c_nationkey AS BIGINT)) AS bn,
      |  chr(CAST(65 + c_nationkey % 26 AS INTEGER)) AS letter,
      |  CAST(ascii(substr(c_name, 1, 1)) AS BIGINT) AS first_ascii,
      |  reverse(c_mktsegment) AS seg_rev,
      |  repeat(substr(c_mktsegment, 1, 2), 2) AS seg_rep,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
      |  TRY_CAST(c_mktsegment AS INTEGER) AS seg_num,
      |  CAST(TRY_CAST('1' || CAST(c_nationkey AS VARCHAR) AS INTEGER) AS BIGINT) AS nk_num,
      |  CAST(sign(c_acctbal) AS BIGINT) AS bal_sign,
      |  mod(c_custkey, 7) AS k7,
      |  ROUND(log10(abs(c_acctbal) + 1.0), 6) + 0.0 AS log_bal,
      |  ROUND(sqrt(abs(c_acctbal)), 6) + 0.0 AS sqrt_bal,
      |  ROUND(exp(CAST(c_nationkey AS DOUBLE) / 25.0), 6) AS exp_nk,
      |  power(CAST(c_nationkey AS DOUBLE), 2.0) AS pow_nk
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------- q29: map functions
  // MAP construction + access (Flink's MAP<K,V> surface): entries built
  // per group from sorted (status, count) pairs so construction order —
  // and therefore map_keys order — is deterministic on both engines.
  // try_element_at (not element_at): ANSI mode errors on absent keys.
  def q29MapFns(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH cnt AS (
        |  SELECT o_orderpriority AS prio, o_orderstatus AS st, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2
        |), mp AS (
        |  SELECT prio,
        |    map_from_entries(array_sort(collect_list(struct(st, n)))) AS m
        |  FROM cnt GROUP BY prio
        |)
        |SELECT prio,
        |  CAST(cardinality(m) AS BIGINT) AS n_statuses,
        |  try_element_at(m, 'O') AS n_open,
        |  try_element_at(m, 'F') AS n_filled,
        |  try_element_at(m, 'P') AS n_partial,
        |  concat_ws(',', map_keys(m)) AS statuses,
        |  aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x) AS total
        |FROM mp ORDER BY prio""".stripMargin)
  }

  val q29Sql: String =
    """WITH cnt AS (
      |  SELECT o_orderpriority AS prio, o_orderstatus AS st,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1, 2
      |), mp AS (
      |  SELECT prio, MAP(list(st ORDER BY st), list(n ORDER BY st)) AS m
      |  FROM cnt GROUP BY prio
      |)
      |SELECT prio,
      |  CAST(cardinality(m) AS BIGINT) AS n_statuses,
      |  m['O'][1] AS n_open,
      |  m['F'][1] AS n_filled,
      |  m['P'][1] AS n_partial,
      |  array_to_string(map_keys(m), ',') AS statuses,
      |  CAST(list_aggregate(map_values(m), 'sum') AS BIGINT) AS total
      |FROM mp ORDER BY prio""".stripMargin

  // -------------------------------------- q30: GROUPING / GROUPING_ID
  // The grouping-function companions to q16/q9 (Flink exposes GROUPING and
  // GROUPING_ID over GROUPING SETS/CUBE/ROLLUP). Bit order is
  // first-argument-MSB in both engines. Same Expand + partial/final
  // HashAggregate plan as q16 — one shuffle of group partials.
  def q30GroupingFns(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  val q30Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ------------------------------------- q31: UNNEST / LATERAL table fn
  // Flink's UNNEST-with-ordinality envelope (array → rows as a lateral
  // table function). Spark plans LATERAL VIEW posexplode as a Generate
  // node — map-side row expansion, no shuffle before the report sort.
  def q31UnnestLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT p_partkey, CAST(pos + 1 AS BIGINT) AS pos, tok
        |FROM part LATERAL VIEW posexplode(split(p_name, ' ')) t AS pos, tok
        |ORDER BY p_partkey, pos""".stripMargin)
  }

  val q31Sql: String =
    """SELECT p_partkey,
      |  CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
      |  unnest(l) AS tok
      |FROM (SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS l FROM part)
      |ORDER BY p_partkey, pos""".stripMargin

  // ---------------------------------- q32: interval arithmetic / calendar
  // The rest of the temporal envelope: INTERVAL +/- (calendar month math
  // clamps identically in both engines: Mar 31 - 1 month = Feb 28),
  // quarter/day-of-week/ISO week, day differences, format, last_day.
  // DuckDB's dayofweek is 0-based Sunday; Spark's is 1-based — the oracle
  // adds 1. All map-side expressions.
  def q32IntervalFns(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL '30' DAY AS DATE) AS due_date,
        |  CAST(o_orderdate - INTERVAL '1' MONTH AS DATE) AS prev_month,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(datediff(DATE '1998-12-31', CAST(o_orderdate AS DATE)) AS BIGINT)
        |    AS days_to_eod,
        |  date_format(o_orderdate, 'yyyy-MM') AS ym,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  }

  val q32Sql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
      |  CAST(o_orderdate - INTERVAL 1 MONTH AS DATE) AS prev_month,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
      |    AS days_to_eod,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------ q33: PIVOT / UNPIVOT battery
  /** PIVOT (multi-aggregate, aliased IN-list) then UNPIVOT back to long
    * form — the reshaping pair of the relational envelope. Money sums go
    * through DECIMAL(18,2) internally (exact, order-independent) and cross
    * the result as DOUBLE; PIVOT yields NULL for empty (nation, priority)
    * combos where the oracle's FILTERed aggregates yield 0/NULL, so the
    * final projection coalesces both.
    *
    * Scale: one shuffle on the groupBy key (PIVOT is a HashAggregate with
    * per-pivot-value branches, map-side combined); UNPIVOT is a map-side
    * Expand. Dim joins broadcast. */
  def q33Pivot(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH base AS (
        |  SELECT n_name, o_orderpriority AS prio, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |), p AS (
        |  SELECT * FROM base
        |  PIVOT (
        |    COUNT(*) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS amt
        |    FOR prio IN ('1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium)
        |  )
        |), wide AS (
        |  SELECT n_name,
        |    CAST(urgent_n AS DOUBLE) AS urgent_n,
        |    CAST(high_n AS DOUBLE) AS high_n,
        |    CAST(medium_n AS DOUBLE) AS medium_n,
        |    CAST(urgent_amt AS DOUBLE) AS urgent_amt,
        |    CAST(high_amt AS DOUBLE) AS high_amt,
        |    CAST(medium_amt AS DOUBLE) AS medium_amt
        |  FROM p
        |)
        |SELECT n_name, metric, COALESCE(v, 0.0) + 0.0 AS val
        |FROM wide UNPIVOT INCLUDE NULLS (
        |  v FOR metric IN (urgent_n, high_n, medium_n, urgent_amt, high_amt, medium_amt)
        |)
        |ORDER BY n_name, metric""".stripMargin)
  }

  val q33Sql: String = {
    val prios = Seq("urgent" -> "1-URGENT", "high" -> "2-HIGH", "medium" -> "3-MEDIUM")
    val aggCols = prios.map { case (a, p) =>
      s"""CAST(COUNT(*) FILTER (prio = '$p') AS DOUBLE) AS ${a}_n,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (prio = '$p') AS DOUBLE) AS ${a}_amt""".stripMargin
    }.mkString(",\n    ")
    val branches = prios.flatMap { case (a, _) => Seq(s"${a}_n", s"${a}_amt") }
      .map(c => s"SELECT n_name, '$c' AS metric, COALESCE($c, 0.0) + 0.0 AS val FROM g")
      .mkString("\n  UNION ALL ")
    s"""WITH base AS (
       |  SELECT n_name, o_orderpriority AS prio, o_totalprice
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |), g AS (
       |  SELECT n_name,
       |    $aggCols
       |  FROM base GROUP BY n_name
       |)
       |$branches
       |ORDER BY n_name, metric""".stripMargin
  }

  // --------------------------------------- q34: recursive CTE (WITH RECURSIVE)
  /** Recursive month-calendar walk joined back to the fact table — the
    * canonical recursion a plain GROUP BY can't express (months with zero
    * orders still appear). Spark 4 plans WITH RECURSIVE as UnionLoop;
    * DuckDB runs the same statement verbatim.
    *
    * Scale: the recursion generates O(months) rows (model-state-sized),
    * then one broadcast-able join against the fact table and one
    * map-combined aggregation. */
  def q34Rcte(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH RECURSIVE months(m, hi) AS (
        |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
        |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi FROM months WHERE m < hi
        |)
        |SELECT m AS month_start, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        |GROUP BY m ORDER BY m""".stripMargin)
  }

  val q34Sql: String =
    """WITH RECURSIVE months(m, hi) AS (
      |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
      |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
      |  FROM orders
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi
      |)
      |SELECT m AS month_start, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      |FROM months LEFT JOIN orders
      |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      |GROUP BY m ORDER BY m""".stripMargin

  // ------------------------------ q35: mergeable-sketch (HLL union) laws
  /** The distributed-sketch contract that makes approximate distinct
    * counting work at 100 TB: per-group HLL sketches UNIONED must agree
    * with sketching the whole corpus in one pass, and both estimates must
    * sit within the sketch's error bound of the exact distinct count.
    * Merge-vs-whole agreement is a BOUND, not equality — DataSketches HLL
    * reports a directly-fed sketch through the order-dependent HIP
    * estimator but a union result through the composite estimator, so the
    * two legitimately differ by ~1-2% even over identical data (measured
    * here: 1991 vs 2023 on ~2000 exact). Emits violation rows; the oracle
    * pins schema + emptiness, deterministic on fixed data (q21 precedent).
    *
    * lgConfigK is PINNED (not Spark's default) and the bounds sit ~3× over
    * the measured estimator gap: at lgK=12 the sketch's relative standard
    * error is ~1.6%, so 5% ≈ 3σ — headroom against a testdata regen or a
    * DataSketches upgrade shifting the error profile, while a real defect
    * (a sketch that doesn't merge) still lands orders of magnitude out.
    *
    * Scale: hll_sketch_agg is map-combined (each task ships one ~KB
    * sketch); the union folds |groups| sketches; the exact twin exists
    * only to certify and is itself two-phase distinct. */
  def q35HllMerge(s: SparkSession, dir: String): DataFrame = {
    val lgConfigK = 12 // explicit: an upstream default change must not
                       // silently shift the error profile under the bounds
    val keyed = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"))
    val perGroup = keyed.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), lgConfigK).as("sk"))
    val merged = perGroup.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
    val whole = keyed.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lgConfigK))
        .as("whole_est"))
    val exact = keyed.select(col("l_partkey")).distinct()
      .agg(count(lit(1)).as("ex"))
    merged.crossJoin(whole).crossJoin(exact)
      .select(explode(array(
        struct(lit("merge_vs_whole_5pct").as("law"),
          col("merged_est").cast(DoubleType).as("got"),
          col("whole_est").cast(DoubleType).as("want"),
          lit(0.05).as("bound")),
        struct(lit("merged_vs_exact_5pct").as("law"),
          col("merged_est").cast(DoubleType).as("got"),
          col("ex").cast(DoubleType).as("want"),
          lit(0.05).as("bound")),
        struct(lit("whole_vs_exact_5pct").as("law"),
          col("whole_est").cast(DoubleType).as("got"),
          col("ex").cast(DoubleType).as("want"),
          lit(0.05).as("bound")))).as("c"))
      .filter(abs(col("c.got") - col("c.want")) >
        col("c.bound") * greatest(col("c.want"), lit(1.0)))
      .select(col("c.law").as("law"), col("c.got").as("got"),
        col("c.want").as("want"))
      .orderBy(col("law"))
  }

  val q35Sql: String =
    """SELECT CAST(NULL AS VARCHAR) AS law, CAST(NULL AS DOUBLE) AS got,
      |  CAST(NULL AS DOUBLE) AS want WHERE FALSE""".stripMargin

  // ----------------------------------- q36: behavioral funnel over events
  /** Ordered event funnel — the product-analytics staple: of the users who
    * VIEWed, how many went on to CLICK within 24 hours of their first
    * view, and then PURCHASE within 24 hours of that first qualifying
    * click. Stage k anchors at the user's EARLIEST qualifying event (min
    * ts inside the window after the previous anchor) — the standard
    * first-touch conversion-window rule, and the window is what makes the
    * funnel DISCRIMINATE (an unbounded funnel over a long-lived corpus
    * converges to "everyone did everything": 150/150/150 here, vs
    * 150/60/25 windowed).
    *
    * Scale: each stage is filter → user-keyed map-combined min; stage
    * joins are keyed by user_id — the funnel's inherent shuffle key, which
    * AQE will broadcast when a stage's survivor set shrinks enough. The
    * three stage counts reduce to single rows and union to a 3-row
    * report. */
  def q36EventFunnel(s: SparkSession, dir: String): DataFrame = {
    val win = expr("INTERVAL 24 HOURS")
    // NULL-ts guard (q37 precedent), also keeping the batch form
    // definitionally identical to StreamOps.streamingFunnel, which must
    // drop NULL event times (no event-time, no window arithmetic)
    val ev = t(s, dir, "events").filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(n: Int, name: String, d: DataFrame) =
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(n.toLong).as("stage"), lit(name).as("event_type"),
          col("n_users"))
    stage(1, "view", s1)
      .unionAll(stage(2, "click", s2))
      .unionAll(stage(3, "purchase", s3))
      .orderBy(col("stage"))
  }

  val q36Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, ts FROM events WHERE ts IS NOT NULL
      |), s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      |  GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |    AND e.ts <= s2.t2 + INTERVAL 24 HOUR
      |  GROUP BY e.user_id
      |)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
      |  CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
      |UNION ALL SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
      |UNION ALL SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
      |ORDER BY stage""".stripMargin

  // ---------------------------------------- q37: daily retention cohorts
  /** Cohort retention matrix — the second product-analytics staple next
    * to the funnel: users cohort by the DAY of their first event; for
    * each (cohort day, day offset) cell, how many of that cohort were
    * active offset days later, and the retention rate against the cohort
    * size. Days are epoch-day buckets (integer arithmetic — no calendar
    * boundary semantics to disagree on). Daily grain is what makes the
    * matrix discriminate on this corpus (weekly grain saturates at 1.0:
    * every user is active every week).
    *
    * Scale: first-event day is one user-keyed map-combined min; the
    * activity grid is one distinct over (user, day) joined back on
    * user_id (the inherent key); the matrix aggregation is map-combined
    * with cohorts·offsets output rows. */
  def q37Retention(s: SparkSession, dir: String): DataFrame = {
    // NULL-ts guard on BOTH engines: a NULL day would survive the joins
    // as a NULL day_offset, and the engines disagree on NULL sort order
    // (Spark NULLS FIRST vs DuckDB NULLS LAST) — the gate hash is
    // order-sensitive
    val ev = t(s, dir, "events").filter(col("ts").isNotNull)
      .select(col("user_id"), datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val active = ev.distinct()
    val cells = active.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firstDay.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    cells.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("day_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort").cast("double"), 6)
          .as("retention"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val q37Sql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS day
      |  FROM events WHERE ts IS NOT NULL
      |), fw AS (
      |  SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id
      |), active AS (
      |  SELECT DISTINCT user_id, day FROM ev
      |), cells AS (
      |  SELECT cohort, day - cohort AS day_offset,
      |    CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM active JOIN fw USING (user_id)
      |  GROUP BY 1, 2
      |), sizes AS (
      |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM fw GROUP BY 1
      |)
      |SELECT cohort, day_offset, n_active, n_cohort,
      |  ROUND(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6) AS retention
      |FROM cells JOIN sizes USING (cohort)
      |ORDER BY cohort, day_offset""".stripMargin

  // ------------------------------------------- q38: explicit sessionization
  /** Gaps-and-islands sessionization — the event-analytics primitive under
    * funnels and retention: assign every event to a per-user session (a
    * new session opens when the gap to the previous event exceeds 30
    * minutes) and emit per-session bounds, event count, and value sum.
    * Unlike [[graft.operators.WindowQueries]]' `session_window` aggregate
    * (which only yields the window bounds), this materializes the session
    * IDENTITY, so downstream queries can join events back to sessions.
    * Gap arithmetic runs on `unix_micros` (exact longs — no fractional-
    * second float drift between engines); ordering ties break by event_id.
    *
    * TIE CONVENTION — deliberately INCLUSIVE here: a gap of exactly 30
    * minutes (`> 1800s` splits, so `== 1800s` MERGES) keeps the session
    * open, matching this family's DuckDB oracle and both streaming twins
    * ([[graft.streaming.StreamOps.streamingSessionize]],
    * [[graft.streaming.StreamOps.streamingSessionizeTtl]], `<= gapUs`
    * merges). The window-operator family pins the OPPOSITE rule — strict
    * (`gap == 5 min` starts a NEW session,
    * [[graft.operators.WindowQueries.qSession]]) per ITS oracle. Both are
    * measure-zero on real µs data but each is hash-pinned by its own
    * oracle: "fixing" either side to match the other breaks a
    * CORRECTNESS row. Do not unify.
    *
    * Scale: one user-keyed window shuffle (per-key state = one user's
    * events) + the same-keyed session rollup — the second aggregation
    * reuses the window's partitioning, no extra exchange. */
  def q38Sessionize(s: SparkSession, dir: String): DataFrame = {
    // NULL-ts guard (q37 precedent)
    val ev = t(s, dir, "events").filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("gap_us", unix_micros(col("ts"))
        - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (round(sum(col("value").cast("decimal(30,15)")).cast("double"), 6) + 0.0)
          .as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q38Sql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, value FROM events WHERE ts IS NOT NULL
      |), flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      OR epoch_us(ts) - LAG(epoch_us(ts))
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      THEN 1 ELSE 0 END AS new_s,
      |    event_id
      |  FROM ev
      |), sess AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,15))) AS DOUBLE), 6) + 0.0
      |    AS sum_value
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter" -> (q2Filter _),
    "q3_join" -> (q3Join _),
    "q4_left_join" -> (q4LeftJoin _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q4_anti_join" -> (q4AntiJoin _),
    "q4_full_join" -> (q4FullJoin _),
    "q5_topn" -> (q5TopN _),
    "q6_sort" -> (q6Sort _),
    "q7_window_rank" -> (q7WindowRank _),
    "q8_window_analytic" -> (q8WindowAnalytic _),
    "q9_rollup" -> (q9Rollup _),
    "q9_cube" -> (q9Cube _),
    "q10_distinct_agg" -> (q10DistinctAgg _),
    "q11_setops" -> (q11SetOps _),
    "q11_union" -> (q11Union _),
    "q12_theta_join" -> (q12ThetaJoin _),
    "q13_in_subquery" -> (q13InSubquery _),
    "q14_scalar_fns" -> (q14ScalarFns _),
    "q15_date_fns" -> (q15DateFns _),
    "q16_grouping_sets" -> (q16GroupingSets _),
    "q17_dedup_exact" -> (q17DedupExact _),
    "q18_values" -> (q18Values _),
    "q19_json" -> (q19Json _),
    "q20_stat_agg" -> (q20StatAgg _),
    "q21_approx" -> (q21Approx _),
    "q22_lookup_join" -> (LookupJoin.q22 _),
    "q23_string_fns" -> (q23StringFns _),
    "q24_collection_fns" -> (q24CollectionFns _),
    "q25_agg_more" -> (q25AggMore _),
    "q26_exists" -> (q26Exists _),
    "q27_window_nav" -> (q27WindowNav _),
    "q28_scalar_more" -> (q28ScalarMore _),
    "q29_map_fns" -> (q29MapFns _),
    "q30_grouping_fns" -> (q30GroupingFns _),
    "q31_unnest_lateral" -> (q31UnnestLateral _),
    "q32_interval_fns" -> (q32IntervalFns _),
    "q33_pivot" -> (q33Pivot _),
    "q34_rcte" -> (q34Rcte _),
    "q35_hll_merge" -> (q35HllMerge _),
    "q36_event_funnel" -> (q36EventFunnel _),
    "q37_retention" -> (q37Retention _),
    "q38_sessionize" -> (q38Sessionize _),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_filter" -> q2Sql,
    "q3_join" -> q3Sql,
    "q4_left_join" -> q4Sql,
    "q4_semi_join" -> q4SemiSql,
    "q4_anti_join" -> q4AntiSql,
    "q4_full_join" -> q4FullSql,
    "q5_topn" -> q5Sql,
    "q6_sort" -> q6Sql,
    "q7_window_rank" -> q7Sql,
    "q8_window_analytic" -> q8Sql,
    "q9_rollup" -> q9Sql,
    "q9_cube" -> q9CubeSql,
    "q10_distinct_agg" -> q10Sql,
    "q11_setops" -> q11Sql,
    "q11_union" -> q11UnionSql,
    "q12_theta_join" -> q12Sql,
    "q13_in_subquery" -> q13Sql,
    "q14_scalar_fns" -> q14Sql,
    "q15_date_fns" -> q15Sql,
    "q16_grouping_sets" -> q16Sql,
    "q17_dedup_exact" -> q17Sql,
    "q18_values" -> q18Sql,
    "q19_json" -> q19Sql,
    "q20_stat_agg" -> q20Sql,
    "q21_approx" -> q21Sql,
    "q22_lookup_join" -> LookupJoin.q22Sql,
    "q23_string_fns" -> q23Sql,
    "q24_collection_fns" -> q24Sql,
    "q25_agg_more" -> q25Sql,
    "q26_exists" -> q26Sql,
    "q27_window_nav" -> q27Sql,
    "q28_scalar_more" -> q28Sql,
    "q29_map_fns" -> q29Sql,
    "q30_grouping_fns" -> q30Sql,
    "q31_unnest_lateral" -> q31Sql,
    "q32_interval_fns" -> q32Sql,
    "q33_pivot" -> q33Sql,
    "q34_rcte" -> q34Sql,
    "q35_hll_merge" -> q35Sql,
    "q36_event_funnel" -> q36Sql,
    "q37_retention" -> q37Sql,
    "q38_sessionize" -> q38Sql,
  )
}
