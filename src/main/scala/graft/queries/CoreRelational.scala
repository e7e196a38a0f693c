package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Cols, Tables}
import graft.Cols.{davg, davgSql, dsum, dsumSql}

/** Relational operator inventory over the driver's star schema.
  *
  * Each entry re-expresses an operator class from SURVEY.md §2 (reference:
  * kinecosystem/history-collector) as an idiomatic Catalyst plan, paired
  * with an ANSI-SQL oracle for DuckDB. Keys carry the §2 operator ids.
  * All queries order their output deterministically (unique sort keys) so
  * the driver's hash compare is stable, and all floating-point aggregates
  * go through [[graft.Cols]]' decimal casts for cross-engine bit-equality.
  */
object CoreRelational {
  type Q = (SparkSession, String) => DataFrame

  /** Exact global row_number for SKEWED sort keys — o6's two-pass
    * partition-offset plan with QUANTILE bucket boundaries. o6's
    * equi-width buckets over [min, max] degrade to one giant bucket
    * when the key mass concentrates (a heavy-tailed `value` puts ~all
    * rows below the first width); boundaries from approx_percentile
    * instead target ~equal ROW COUNTS per bucket for any distribution.
    * Same plan shape as o6 (PLANS.md's promised swap): one 1-row
    * broadcast boundary agg, one `bkt` hash exchange, per-bucket
    * window sort, ≤`buckets`-row broadcast prefix offsets. Output
    * equals the single-task global window for ANY boundaries (buckets
    * are disjoint and value-ordered; `tie` must complete a total
    * order), so boundary error degrades parallelism, never
    * correctness. Residual bound: rows EQUAL to one value cannot be
    * split by any value bucketing — per-bucket load is ~n/buckets
    * plus the multiplicity of its boundary value.
    */
  def globalRankQuantile(df: DataFrame, value: org.apache.spark.sql.Column,
      tie: org.apache.spark.sql.Column, buckets: Int = 32): DataFrame = {
    val probs = (1 until buckets).map(_.toDouble / buckets)
    // Boundaries are COLLECTED once (≤ buckets-1 doubles of driver-side
    // planning state) and embedded as literals, NOT left as a broadcast
    // subtree: the local-rank and offset arms below each re-evaluate
    // their lineage, and approx_percentile's GK-summary merge order is
    // not deterministic across evaluations — two independent boundary
    // evaluations could bucket the two arms differently and silently
    // corrupt ranks (exchange reuse usually deduplicates the subtrees,
    // but rank correctness must not depend on a physical-planning
    // optimization). Literals make both arms bucket identically by
    // construction.
    val qb: Seq[Double] = Option(
        df.agg(percentile_approx(value, array(probs.map(lit): _*),
          lit(10000)).as("qbounds")).head().getSeq[Double](0))
      .getOrElse(Seq.empty)
    val boundsArr = array(qb.map(lit): _*)
    val bucketed = df
      // bkt = number of boundaries ≤ value: monotone in value, 0-based
      .withColumn("bkt",
        (if (qb.isEmpty) lit(0L)
         else size(filter(boundsArr, b => b <= value)).cast("long")))
    val local = bucketed.withColumn("lrn",
      row_number().over(Window.partitionBy("bkt").orderBy(value, tie)).cast("long"))
    val off = bucketed.groupBy("bkt").agg(count(lit(1)).as("c"))
      .withColumn("before", coalesce(sum(col("c")).over(
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "before")
    local.join(broadcast(off), "bkt")
      .withColumn("rnk", col("before") + col("lrn"))
      .drop("bkt", "lrn", "before")
  }

  /** Exact PER-KEY row_number for a skewed partition key —
    * [[globalRankQuantile]] generalized to keyed windows (the swap-in
    * x41's scaladoc promises; x39's stratum rank is the same shape).
    * A keyed window sorts each key's rows in ONE task, so a corpus-
    * sized key is a single-task sort; here rows bucket by GLOBAL value
    * quantiles first (the o7 literal-embedding discipline — one
    * collect of ≤ buckets−1 doubles of planning state), rank locally
    * within (key, bucket), and add per-(key, bucket) prefix offsets.
    * Within a key the buckets are value-disjoint and ordered, so the
    * result equals the single-task keyed window for ANY boundaries
    * (`tie` must complete a total order); boundary quality degrades
    * parallelism, never correctness — global boundaries split a
    * dominant key ~evenly even when small keys land whole in one
    * bucket. The offsets frame is keys×buckets-sized; its join back
    * rides the (key, bucket) partitioning the local window already
    * established. Adds `rnk` (1-based per-key rank by (value, tie)
    * ascending) and `n_key` (the key's row count — offsets' own
    * per-key total, so no second corpus window).
    */
  def keyedRankQuantile(df: DataFrame, keys: Seq[String],
      value: org.apache.spark.sql.Column, tie: org.apache.spark.sql.Column,
      buckets: Int = 32): DataFrame = {
    val probs = (1 until buckets).map(_.toDouble / buckets)
    // the explicit double cast keeps the engine's result array<double>
    // for ANY input type — for a long-typed value percentile_approx
    // returns array<bigint>, and the Seq[Double] declaration below
    // would then hold boxed Longs that explode on first unboxed use
    // (r14 advice); the cast preserves ordering, and boundary QUALITY
    // is all these literals carry (correctness is boundary-independent,
    // per the method doc)
    val qb: Seq[Double] = Option(
        df.agg(percentile_approx(value.cast("double"), array(probs.map(lit): _*),
          lit(10000)).as("qbounds")).head().getSeq[Double](0))
      .getOrElse(Seq.empty)
    val boundsArr = array(qb.map(lit): _*)
    val keyCols = keys.map(col)
    val bucketed = df.withColumn("_bkt",
      (if (qb.isEmpty) lit(0L)
       else size(filter(boundsArr, b => b <= value)).cast("long")))
    val local = bucketed.withColumn("_lrn",
      row_number().over(Window.partitionBy(keyCols :+ col("_bkt"): _*)
        .orderBy(value, tie)).cast("long"))
    val off = bucketed.groupBy(keyCols :+ col("_bkt"): _*)
      .agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum(col("_c")).over(
        Window.partitionBy(keyCols: _*).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_nkey", sum(col("_c")).over(Window.partitionBy(keyCols: _*)))
      .select(keyCols :+ col("_bkt") :+ col("_before") :+ col("_nkey"): _*)
    local.join(off, keys :+ "_bkt")
      .withColumn("rnk", col("_before") + col("_lrn"))
      .withColumn("n_key", col("_nkey"))
      .drop("_bkt", "_lrn", "_before", "_nkey")
  }

  def queries: Map[String, Q] = Map(
    // ── Aggregations (§2.7) ────────────────────────────────────────────
    // A1 count/sum/avg family — TPC-H Q1-shaped pricing summary.
    "a1_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1997-06-30")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // A2 last-value-by-key (reference python/main.py:108-123 builds
    // last-wins dicts; here as max/max_by per key).
    "a2_last_by_key" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max(col("ts")).as("last_ts"),
          max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    // DISTINCT aggregation (absent in reference; §2.7 gap coverage).
    "a3_distinct_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    // ROLLUP over region→nation hierarchy.
    "a4_rollup" -> { (s, d) =>
      val c = Tables.customer(s, d); val n = Tables.nation(s, d); val r = Tables.region(s, d)
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    // CUBE over two lineitem dimensions.
    "a5_cube" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    // Exact median (sort-based aggregate).
    "a6_median" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("med_qty"))
        .orderBy("l_returnflag")
    },

    // ── Joins (§2.3) ───────────────────────────────────────────────────
    // J1 broadcast hash join, small dim side (reference ledgers dict).
    "j1_broadcast_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d); val sup = Tables.supplier(s, d)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .groupBy("s_name")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy("s_name")
    },
    // J2 large-large equi join planned as sort-merge (shuffle on key).
    "j2_shuffle_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d).hint("merge")
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    // Multi-way star join (lineitem⋈orders⋈customer⋈nation⋈region).
    "j3_star_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      val c = Tables.customer(s, d); val n = Tables.nation(s, d); val r = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    // Left outer join preserving unmatched left rows (reference dict.get
    // miss → NULL, python/main.py:134).
    "j4_left_outer" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_f_orders"), dsum(col("o_totalprice")).as("sum_f_price"))
        .orderBy("c_custkey")
    },
    // Left semi join (EXISTS).
    "j5_semi_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 40000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // Left anti join (NOT EXISTS).
    "j6_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 40000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // Range (non-equi) join against a broadcast interval dim.
    "j7_range_join" -> { (s, d) =>
      val p = Tables.part(s, d)
      val classes = s.createDataFrame(Seq((1, 10, "small"), (11, 25, "medium"), (26, 50, "large")))
        .toDF("lo", "hi", "size_class")
      p.join(broadcast(classes), p("p_size") >= classes("lo") && p("p_size") <= classes("hi"))
        .groupBy("size_class")
        .agg(count(lit(1)).as("n_parts"), davg(col("p_retailprice")).as("avg_price"))
        .orderBy("size_class")
    },
    // As-of join (Spark has no native one): composed shuffle-free as a
    // per-key RANGE window carrying the latest signup time forward —
    // matches DuckDB `ASOF LEFT JOIN ... ON e.ts >= s.ts` incl. ties,
    // and scales as one shuffle-by-key + sort instead of a pairwise join.
    "j8_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d).filter(col("event_type").isin("signup", "purchase"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prior_signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "prior_signup_ts")
        .orderBy("event_id")
    },

    // ── Flatten / generators (§2.2) ────────────────────────────────────
    // F1 explode (reference tx-set iteration) as token explode + count.
    "f1_explode_tokens" -> { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100)
    },
    // F2/J3 positional explode of zipped arrays (reference
    // enumerate(zip(ops, result_ops)), python/main.py:155-157).
    "f2_posexplode_zip" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          posexplode(arrays_zip(
            array(col("l_quantity"), col("l_extendedprice")).as("a"),
            array(col("l_discount"), col("l_tax")).as("b"))))
        .select(col("l_orderkey"), col("l_linenumber"), col("pos"),
          col("col.a").as("a_val"), col("col.b").as("b_val"))
        .orderBy("l_orderkey", "l_linenumber", "pos")
    },

    // explode_outer: empty/absent arrays preserve the parent row with a
    // NULL leg (the zip-pad cousin of F2's truncation semantics).
    "f4_explode_outer" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("arr",
          when(col("doc_id") % 3 === 0, array(lit("a"), lit("b")))
            .otherwise(array().cast("array<string>")))
        .select(col("doc_id"), explode_outer(col("arr")).as("v"))
        .orderBy(col("doc_id"), col("v").asc_nulls_first)
    },
    // Statistical moments from decimal power sums — deterministic
    // variance/stddev/covariance/correlation (the builtin one-pass aggs
    // are float-order-dependent and can't be oracle-checked bit-exactly).
    "a10_moments" -> { (s, d) =>
      val q = col("l_quantity"); val p = col("l_extendedprice")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          dsum(q).as("sum_q"), dsum(p).as("sum_p"),
          dsum(q * q).as("sum_qq"), dsum(p * p).as("sum_pp"), dsum(q * p).as("sum_qp"))
        .withColumn("var_q",
          (col("sum_qq") - col("sum_q") * col("sum_q") / col("n")) / (col("n") - 1))
        .withColumn("stddev_q", sqrt(col("var_q")))
        .withColumn("covar_qp",
          (col("sum_qp") - col("sum_q") * col("sum_p") / col("n")) / (col("n") - 1))
        .withColumn("var_p",
          (col("sum_pp") - col("sum_p") * col("sum_p") / col("n")) / (col("n") - 1))
        // corr recombined from the already-exact doubles — but DuckDB's
        // sqrt is libm, not correctly rounded (sqrt(var_p) for one flag
        // differs from the IEEE result by 1 ulp), so the full-precision
        // quotient is not verifiable bit-exactly. Emit round(·, 9): a
        // 1-ulp input wiggle can only flip the rounded value within
        // ~1e-16 of a 5e-10 boundary (same documented boundary-window
        // class as the Cols.Dec casts; 9 digits is ample for a
        // correlation statistic).
        .withColumn("corr_qp",
          round(col("covar_qp") / col("stddev_q") / sqrt(col("var_p")), 9))
        .select("l_returnflag", "n", "var_q", "stddev_q", "covar_qp", "corr_qp")
        .orderBy("l_returnflag")
    },

    // ── Set operations (§2.6) ──────────────────────────────────────────
    // U1 union-with-discriminator (payments ∪ creations,
    // python/adapters/s3_storage_adapter.py:57-62): missing columns NULL.
    "u1_union_discriminated" -> { (s, d) =>
      val pay = Tables.orders(s, d).select(
        col("o_orderkey").as("id"), col("o_totalprice").as("amount"),
        lit("payment").as("type"))
      val cre = Tables.customer(s, d).select(
        col("c_custkey").as("id"), col("c_acctbal").as("starting_balance"),
        lit("creation").as("type"))
      pay.unionByName(cre, allowMissingColumns = true).orderBy("type", "id")
    },
    "u2_intersect" -> { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")
    },
    "u3_except" -> { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // ── Sorts / limits (§2.8) + serving (§3 Q1/Q2) ─────────────────────
    // O1/S6 serving scan: filter + project + limit (sample/main.py:25),
    // with a deterministic ORDER BY the reference lacks (SURVEY §7.4).
    "o1_serving_filter_limit" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_custkey") === 7)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .orderBy("o_orderkey")
        .limit(20)
    },
    // O2 top-k by value → TakeOrderedAndProject, no full sort.
    "o2_topk" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5)
    },
    // O6: exact GLOBAL row_number at scale — the two-pass partition-
    // offset plan. A bare `row_number() OVER (ORDER BY …)` has an empty
    // PARTITION BY, which Spark plans as ONE task holding the whole
    // table — the single worst scale anti-pattern a ranking query can
    // hit. Instead: bucket every row by a MONOTONE function of the sort
    // key (equi-width over [min, max] from a 1-row broadcast agg — the
    // x8/mixRank discipline generalized to a total order; for skewed
    // keys swap in quantile boundaries, same plan shape), rank WITHIN
    // each bucket, and add the broadcast prefix-count of earlier
    // buckets. Identical output to the global window for ANY bucket
    // boundaries (buckets are disjoint and ordered), at one corpus
    // exchange + a ≤32-row side table. The `% 97` sample proves the
    // FULL ranking (every 97th rank across the whole table — a top-k
    // shortcut cannot produce it) while keeping output gate-sized.
    "o6_global_rank" -> { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "value")
      val mm = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      val bucketed = ev.crossJoin(broadcast(mm))
        .withColumn("bkt", least(lit(31L),
          floor((col("value") - col("lo")) /
            ((col("hi") - col("lo")) / 32.0 + lit(1e-12))).cast("long")))
      val local = bucketed.withColumn("lrn",
        row_number().over(Window.partitionBy("bkt").orderBy("value", "event_id"))
          .cast("long"))
      val off = bucketed.groupBy("bkt").agg(count(lit(1)).as("c"))
        .withColumn("before", coalesce(sum(col("c")).over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bkt", "before")
      local.join(broadcast(off), "bkt")
        .withColumn("rnk", col("before") + col("lrn"))
        .filter(col("rnk") % 97 === 0)
        .select("rnk", "event_id", "user_id", "value")
        .orderBy("rnk")
    },
    // O6's skew variant under the gate: the SAME exact global ranking
    // (identical oracle SQL shape), computed through the
    // quantile-boundary two-pass plan instead of equi-width buckets —
    // so "output equals the global window for ANY boundaries" is
    // hash-verified cross-engine, not only ScalaTest'd. events.value
    // is uniform here; the ScaleSpec pin drives the pathologically
    // skewed key this variant exists for.
    "o7_global_rank_skew" -> { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "value")
      globalRankQuantile(ev, col("value"), col("event_id"), 32)
        .filter(col("rnk") % 97 === 0)
        .select("rnk", "event_id", "user_id", "value")
        .orderBy("rnk")
    },
    // Q2 point lookup by derived hash key (sample/main.py:42).
    "q2_point_lookup" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("hash", md5(concat(lit("order|"), col("o_orderkey").cast("string"))))
        .filter(col("hash") === md5(lit("order|500")))
        .select("hash", "o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ── Window functions (§2.9) ────────────────────────────────────────
    "w1_row_number" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("user_id", "rn", "event_id", "event_type")
        .orderBy("user_id", "rn")
    },
    "w2_lag_delta" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .select("event_id", "user_id", "value", "prev_value", "delta")
        .orderBy("event_id")
    },
    "w3_running_sum" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_value",
          sum(col("value").cast(Cols.Dec)).over(w).cast("double"))
        .select("event_id", "user_id", "value", "running_value")
        .orderBy("event_id")
    },
    // Gap-based sessionization (30 min inactivity) — lag + running flag
    // sum; the streaming-native variant lives in graft.streaming.
    "w4_sessionize" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            (unix_micros(col("ts")) - col("prev_us") > 1800L * 1000 * 1000), 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(cum))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_id")
    },
    // Native session_window (batch shape): Spark's built-in gap-merge
    // semantics cross-checked against the manual lag/cumsum construction
    // (w4) in the oracle — session end = last event + gap.
    "w7_session_window_native" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
          col("user_id"), col("n_events"))
        .orderBy("user_id", "session_start")
    },
    // Event-time tumbling window (batch shape of §2.12's windowed aggs).
    "w5_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("hour_start"), col("n"), col("sum_value"))
        .orderBy("hour_start")
    },

    // ── Scalar transforms (§2.5, §2.10) ────────────────────────────────
    // T5/T9 epoch↔timestamp↔string round trips.
    "t5_epoch_roundtrip" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("ts"),
          unix_timestamp(col("ts")).as("epoch_s"),
          timestamp_seconds(unix_timestamp(col("ts"))).as("ts_s"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          date_format(col("ts"), "yyyy-MM-dd").as("date_str"))
        .orderBy("event_id")
    },
    // T8 hex archive-sequence arithmetic + nibble-pair dir fan-out
    // (python/main.py:82-86, 205-228).
    "t8_hex_sequence" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") % 97 === 0)
        .withColumn("seq", lower(lpad(hex(col("event_id") * 64), 8, "0")))
        // next_seq from the SAME source as seq (event_id), not from the
        // lpad-truncated seq string: above 2^26 the 8-char truncation
        // makes conv(seq)+64 diverge from event_id*64+64 — deriving
        // both from event_id keeps the two engines (and the two
        // columns) consistent at any magnitude
        .withColumn("next_seq",
          lower(lpad(hex(col("event_id") * 64 + 64), 8, "0")))
        .withColumn("dir", concat_ws("/",
          substring(col("seq"), 1, 2), substring(col("seq"), 3, 2), substring(col("seq"), 5, 2)))
        .select("event_id", "seq", "next_seq", "dir")
        .orderBy("event_id")
    },
    // JSON field extraction (serving payloads, sample/main.py:32,46).
    "t9_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") % 53 === 0)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },
    // T10 char-strip munge via translate (python/main.py:331-334).
    "t10_translate_munge" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") % 53 === 0)
        .select(col("event_id"),
          translate(col("props"), "{}\": k", "").as("stripped"),
          translate(col("props"), "{}\": k", "").cast("int").as("k_num"))
        .orderBy("event_id")
    },
    // P1 app-id memo filter: rlike with the reference's literal [A-z]
    // class + split-index predicate (python/main.py:57-58,141-148).
    "p1_appid_memo_filter" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("memo",
          concat(lit("1-"), substring(md5(col("text")), 1, 4), lit("-"), col("source")))
        .filter(col("memo").rlike("^1-[A-z0-9]{4}-.*") &&
          substring(split(col("memo"), "-")(1), 1, 1).between("a", "c"))
        .select("doc_id", "memo")
        .orderBy("doc_id")
    },

    // CDC MERGE / latest-wins upsert — the warehouse fundamental behind
    // every incremental table: a change batch (here: open orders arriving
    // re-priced and closed) merged into the base snapshot, newest version
    // per key winning. Expressed as union + one row_number window on the
    // key — ONE shuffle on the natural key and no join at all, where a
    // naive MERGE plans an outer join between two fact-sized inputs.
    "u4_merge_upsert" -> { (s, d) =>
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(0L).as("src"))
      val batch = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"), lit("F").as("o_orderstatus"),
          (col("o_totalprice") * lit(1.1)).as("o_totalprice"), lit(1L).as("src"))
      val w = Window.partitionBy("o_orderkey").orderBy(col("src").desc)
      base.unionByName(batch)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), (col("src") === 1L).as("was_updated"))
        .orderBy("o_orderkey")
    },

    // Keyed table diff — snapshot reconciliation / data validation:
    // current vs revised snapshot (some keys deleted, some re-priced,
    // some new), FULL OUTER joined on the key and classified
    // added/removed/changed, unchanged rows dropped. Both sides are
    // fact-sized so the sort-merge join on the key is the right plan;
    // the output is only the (small) delta.
    "u5_table_diff" -> { (s, d) =>
      val cur = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      val nxt = Tables.orders(s, d).filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") * lit(1.1))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .unionByName(Tables.orders(s, d).filter(col("o_orderkey") % 101 === 0)
          .select((col("o_orderkey") + 50000000L).as("o_orderkey"),
            col("o_totalprice")))
      cur.as("a")
        .join(nxt.as("b"), col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
        .withColumn("change_type",
          when(col("b.o_orderkey").isNull, "removed")
            .when(col("a.o_orderkey").isNull, "added")
            .when(col("a.o_totalprice") =!= col("b.o_totalprice"), "changed"))
        .filter(col("change_type").isNotNull)
        .select(coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
          col("change_type"), col("a.o_totalprice").as("old_price"),
          col("b.o_totalprice").as("new_price"))
        .orderBy("o_orderkey")
    },

    // Equi-width histogram — fixed bucket bounds (no data-driven min/max
    // pre-pass), so the whole thing is ONE map-side-combinable aggregate
    // over ~30 groups: the profile-at-scale shape where the shuffle
    // carries 30 rows regardless of corpus size.
    "a15_histogram" -> { (s, d) =>
      val bw = lit(20000.0)
      Tables.orders(s, d)
        .withColumn("bucket", floor(col("o_totalprice") / bw).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
        .select(col("bucket"), (col("bucket") * bw).as("lo"),
          ((col("bucket") + 1) * bw).as("hi"), col("cnt"), col("sum_price"))
        .orderBy("bucket")
    },

    // Grouped OLS regression — trend extraction as ONE combinable
    // aggregate: per event type, value regressed on hour-of-day in
    // closed form from the six moment sums (the a10 ladder), slope /
    // intercept / r² recombined in double with the identical expression
    // tree as the oracle. No ML library, no iteration, no second pass:
    // at 100 TB this is exactly one map-side-combinable shuffle of 6
    // decimal sums per group.
    "a16_regression" -> { (s, d) =>
      graft.operators.EventAnalytics.olsTrend(
        Tables.events(s, d), "event_type", hour(col("ts")), col("value"))
        .orderBy("event_type")
    },

    // Data-quality constraint suite (the deequ-style validation gate a
    // training pipeline runs before a corpus is admitted): completeness,
    // bounds, and composite-key uniqueness evaluated in ONE scan and
    // emitted as a constraint report (check, observed, threshold,
    // passed). All metrics come from a single global aggregate — the
    // plain metrics partial-aggregate map-side; the composite-key
    // distinct count is the one genuinely corpus-sized part (Catalyst's
    // Expand two-phase distinct, a keyed exchange on the checked key —
    // the price of an EXACT uniqueness check; a14's HLL is the sketch
    // alternative when approximate suffices). Observed values are
    // integer ratios or raw column min/max — no float summation, so the
    // report is hash-exact without decimal staging.
    "a17_quality_checks" -> { (s, d) =>
      Tables.lineitem(s, d)
        .agg(
          count(lit(1)).as("n"),
          count(col("l_quantity")).as("nq"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"),
          max(col("l_quantity")).as("max_qty"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("dc"))
        .selectExpr(
          """stack(5,
            |  'completeness_l_quantity',
            |    cast(nq as double) / cast(n as double), 0.999D,
            |    cast(nq as double) / cast(n as double) >= 0.999D,
            |  'max_l_discount_le_0.1', max_disc, 0.1D, max_disc <= 0.1D,
            |  'max_l_quantity_le_50', max_qty, 50.0D, max_qty <= 50.0D,
            |  'min_l_discount_ge_0', min_disc, 0.0D, min_disc >= 0.0D,
            |  'uniqueness_orderkey_linenumber',
            |    cast(dc as double) / cast(n as double), 1.0D, dc = n
            |) as (check_name, observed, threshold, passed)""".stripMargin)
        .orderBy("check_name")
    }
  )

  def oracles: Map[String, String] = Map(
    "a1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("(l_extendedprice * (1.0 - l_discount))")} AS sum_disc_price,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_last_by_key" ->
      """WITH l AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |a AS (
        |  SELECT user_id, max(ts) AS last_ts, count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT a.user_id, a.last_ts, l.event_type AS last_type, a.n_events
        |FROM a JOIN l ON a.user_id = l.user_id AND l.rn = 1
        |ORDER BY a.user_id""".stripMargin,
    "a3_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a4_rollup" ->
      s"""SELECT r_name, n_name, count(*) AS n_cust, ${dsumSql("c_acctbal")} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "a5_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a6_median" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j1_broadcast_join" ->
      s"""SELECT s_name, ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "j2_shuffle_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items, ${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "j3_star_join" ->
      s"""SELECT n_name, ${dsumSql("(l_extendedprice * (1.0 - l_discount))")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "j4_left_outer" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_f_orders, ${dsumSql("o_totalprice")} AS sum_f_price
         |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
         |  ON c_custkey = o.o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "j5_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 40000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 40000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j7_range_join" ->
      s"""SELECT size_class, count(*) AS n_parts, ${davgSql("p_retailprice")} AS avg_price
         |FROM part JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 50, 'large'))
         |  AS c(lo, hi, size_class) ON p_size BETWEEN lo AND hi
         |GROUP BY size_class ORDER BY size_class""".stripMargin,
    "j8_asof_join" ->
      """SELECT e.event_id, e.user_id, s.ts AS prior_signup_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin,
    "f1_explode_tokens" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin,
    "f2_posexplode_zip" ->
      """SELECT l_orderkey, l_linenumber,
        |  generate_subscripts([l_quantity, l_extendedprice], 1) - 1 AS pos,
        |  unnest([l_quantity, l_extendedprice]) AS a_val,
        |  unnest([l_discount, l_tax]) AS b_val
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, pos""".stripMargin,
    "f4_explode_outer" ->
      """SELECT d.doc_id, u.v
        |FROM (SELECT doc_id,
        |        CASE WHEN doc_id % 3 = 0 THEN ['a', 'b'] ELSE [] END AS arr
        |      FROM documents WHERE doc_id < 100) d
        |LEFT JOIN LATERAL (SELECT unnest(d.arr) AS v) u ON true
        |ORDER BY doc_id, v NULLS FIRST""".stripMargin,
    "a10_moments" -> {
      val sq = Cols.dsumSql("l_quantity"); val sp = Cols.dsumSql("l_extendedprice")
      val sqq = Cols.dsumSql("(l_quantity * l_quantity)")
      val spp = Cols.dsumSql("(l_extendedprice * l_extendedprice)")
      val sqp = Cols.dsumSql("(l_quantity * l_extendedprice)")
      s"""WITH sums AS (
         |  SELECT l_returnflag, count(*) AS n, $sq AS sum_q, $sp AS sum_p,
         |    $sqq AS sum_qq, $spp AS sum_pp, $sqp AS sum_qp
         |  FROM lineitem GROUP BY l_returnflag),
         |m AS (
         |  SELECT l_returnflag, n,
         |    (sum_qq - sum_q * sum_q / n) / (n - 1) AS var_q,
         |    sqrt((sum_qq - sum_q * sum_q / n) / (n - 1)) AS stddev_q,
         |    (sum_qp - sum_q * sum_p / n) / (n - 1) AS covar_qp,
         |    (sum_pp - sum_p * sum_p / n) / (n - 1) AS var_p
         |  FROM sums)
         |SELECT l_returnflag, n, var_q, stddev_q, covar_qp,
         |  round(covar_qp / stddev_q / sqrt(var_p), 9) AS corr_qp
         |FROM m ORDER BY l_returnflag""".stripMargin
    },
    "u1_union_discriminated" ->
      """SELECT o_orderkey AS id, o_totalprice AS amount, 'payment' AS type,
        |  CAST(NULL AS DOUBLE) AS starting_balance
        |FROM orders
        |UNION ALL
        |SELECT c_custkey, CAST(NULL AS DOUBLE), 'creation', c_acctbal FROM customer
        |ORDER BY type, id""".stripMargin,
    "u2_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY custkey""".stripMargin,
    "u3_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,
    "o1_serving_filter_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
        |FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey LIMIT 20""".stripMargin,
    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin,
    "o6_global_rank" ->
      """WITH r AS (SELECT event_id, user_id, value,
        |    CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS rnk
        |  FROM events)
        |SELECT rnk, event_id, user_id, value FROM r
        |WHERE rnk % 97 = 0 ORDER BY rnk""".stripMargin,
    // o7: the SAME global-ranking oracle as o6 — boundary choice must
    // never change a single rank
    "o7_global_rank_skew" ->
      """WITH r AS (SELECT event_id, user_id, value,
        |    CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS rnk
        |  FROM events)
        |SELECT rnk, event_id, user_id, value FROM r
        |WHERE rnk % 97 = 0 ORDER BY rnk""".stripMargin,
    "q2_point_lookup" ->
      """SELECT md5('order|' || CAST(o_orderkey AS VARCHAR)) AS hash,
        |  o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE md5('order|' || CAST(o_orderkey AS VARCHAR)) = md5('order|500')
        |ORDER BY o_orderkey""".stripMargin,
    "w1_row_number" ->
      """SELECT user_id, rn, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "w2_lag_delta" ->
      """SELECT event_id, user_id, value, prev_value, value - prev_value AS delta FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "w3_running_sum" ->
      """SELECT event_id, user_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "w4_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, CAST(SUM(new_sess) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "w7_session_window_native" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, SUM(new_sess) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "w5_tumbling_window" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n,
         |  ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "t5_epoch_roundtrip" ->
      """SELECT event_id, ts,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS ts_s,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strftime(ts, '%Y-%m-%d') AS date_str
        |FROM events WHERE event_id % 97 = 0 ORDER BY event_id""".stripMargin,
    "t8_hex_sequence" ->
      """SELECT event_id,
        |  lower(lpad(to_hex(event_id * 64), 8, '0')) AS seq,
        |  lower(lpad(to_hex(event_id * 64 + 64), 8, '0')) AS next_seq,
        |  concat_ws('/',
        |    substr(lower(lpad(to_hex(event_id * 64), 8, '0')), 1, 2),
        |    substr(lower(lpad(to_hex(event_id * 64), 8, '0')), 3, 2),
        |    substr(lower(lpad(to_hex(event_id * 64), 8, '0')), 5, 2)) AS dir
        |FROM events WHERE event_id % 97 = 0 ORDER BY event_id""".stripMargin,
    "t9_json_extract" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_id % 53 = 0 ORDER BY event_id""".stripMargin,
    "t10_translate_munge" ->
      """SELECT event_id,
        |  translate(props, '{}": k', '') AS stripped,
        |  CAST(translate(props, '{}": k', '') AS INTEGER) AS k_num
        |FROM events WHERE event_id % 53 = 0 ORDER BY event_id""".stripMargin,
    "p1_appid_memo_filter" ->
      """WITH m AS (
        |  SELECT doc_id, '1-' || substr(md5(text), 1, 4) || '-' || source AS memo
        |  FROM documents)
        |SELECT doc_id, memo FROM m
        |WHERE regexp_matches(memo, '^1-[A-z0-9]{4}-.*')
        |  AND substr(split_part(memo, '-', 2), 1, 1) BETWEEN 'a' AND 'c'
        |ORDER BY doc_id""".stripMargin,
    // Same MERGE ladder: union the change batch over the base with a
    // source rank, newest version per key wins via row_number.
    "u4_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 0 AS src
        |  FROM orders),
        |batch AS (SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
        |    o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice, 1 AS src
        |  FROM orders WHERE o_orderstatus = 'O'),
        |m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM batch))
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  (src = 1) AS was_updated
        |FROM m WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "u5_table_diff" ->
      """WITH cur AS (SELECT o_orderkey, o_totalprice FROM orders),
        |nxt AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * CAST(1.1 AS DOUBLE)
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 50000000, o_totalprice FROM orders WHERE o_orderkey % 101 = 0),
        |j AS (SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
        |    a.o_totalprice AS old_price, b.o_totalprice AS new_price
        |  FROM cur a FULL OUTER JOIN nxt b ON a.o_orderkey = b.o_orderkey)
        |SELECT COALESCE(ka, kb) AS o_orderkey,
        |  CASE WHEN kb IS NULL THEN 'removed' WHEN ka IS NULL THEN 'added'
        |       WHEN old_price <> new_price THEN 'changed' END AS change_type,
        |  old_price, new_price
        |FROM j WHERE kb IS NULL OR ka IS NULL OR old_price <> new_price
        |ORDER BY o_orderkey""".stripMargin,
    "a15_histogram" ->
      s"""WITH b AS (SELECT CAST(floor(o_totalprice / CAST(20000.0 AS DOUBLE)) AS BIGINT) AS bucket,
         |    o_totalprice
         |  FROM orders)
         |SELECT bucket, bucket * CAST(20000.0 AS DOUBLE) AS lo,
         |  (bucket + 1) * CAST(20000.0 AS DOUBLE) AS hi,
         |  CAST(count(*) AS BIGINT) AS cnt, ${dsumSql("o_totalprice")} AS sum_price
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // Same six-moment closed form, identical recombination order.
    "a16_regression" ->
      s"""WITH pts AS (SELECT event_type,
         |    CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x, value AS y
         |  FROM events),
         |sums AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
         |    ${dsumSql("(x * x)")} AS sxx, ${dsumSql("(y * y)")} AS syy,
         |    ${dsumSql("(x * y)")} AS sxy
         |  FROM pts GROUP BY event_type),
         |m AS (SELECT event_type, n,
         |    n * sxy - sx * sy AS cov_n,
         |    n * sxx - sx * sx AS var_x_n,
         |    n * syy - sy * sy AS var_y_n,
         |    sx, sy
         |  FROM sums)
         |SELECT event_type, n,
         |  round(cov_n / var_x_n, 9) AS slope,
         |  round((sy - (cov_n / var_x_n) * sx) / n, 9) AS intercept,
         |  round(cov_n * cov_n / (var_x_n * var_y_n), 9) AS r2
         |FROM m ORDER BY event_type""".stripMargin,
    // The identical one-scan metric set unpivoted to the same report
    // rows (DuckDB spells the composite-key distinct as a row-value).
    "a17_quality_checks" ->
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(l_quantity) AS BIGINT) AS nq,
        |    min(l_discount) AS min_disc, max(l_discount) AS max_disc,
        |    max(l_quantity) AS max_qty,
        |    CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS dc
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'completeness_l_quantity' AS check_name,
        |      CAST(nq AS DOUBLE) / CAST(n AS DOUBLE) AS observed,
        |      CAST(0.999 AS DOUBLE) AS threshold,
        |      CAST(nq AS DOUBLE) / CAST(n AS DOUBLE) >= 0.999 AS passed
        |    FROM m
        |  UNION ALL SELECT 'max_l_discount_le_0.1', max_disc,
        |      CAST(0.1 AS DOUBLE), max_disc <= 0.1 FROM m
        |  UNION ALL SELECT 'max_l_quantity_le_50', max_qty,
        |      CAST(50.0 AS DOUBLE), max_qty <= 50.0 FROM m
        |  UNION ALL SELECT 'min_l_discount_ge_0', min_disc,
        |      CAST(0.0 AS DOUBLE), min_disc >= 0.0 FROM m
        |  UNION ALL SELECT 'uniqueness_orderkey_linenumber',
        |      CAST(dc AS DOUBLE) / CAST(n AS DOUBLE),
        |      CAST(1.0 AS DOUBLE), dc = n FROM m
        |) ORDER BY check_name""".stripMargin
  )
}
