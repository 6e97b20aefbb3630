package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Scans, projections and predicates — SURVEY.md §2.1–2.2.
  *
  * The reference pushes its filters into source SQL
  * (`data_seoul_1_category.py:41-47`, `data_seoul_2_csv_noopenapi.py:42-49`);
  * here the same predicates are declared on the DataFrame and Catalyst pushes
  * them into the Parquet scan (visible as PushedFilters in explain output).
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Catalog-style scan: projection + conjunctive pushed-down predicates
    // (cf. data_seoul_1_category.py:41-47 SELECT ... WHERE COLLECT_SITE_ID=1).
    QueryDef(
      "q_scan_catalog",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
              ORDER BY o_orderkey""")) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 200000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Projection + rename + drop (cf. df.columns=[...] / drop(columns=['index'])
    // at data_seoul_1_category.py:50-52).
    QueryDef(
      "q_project",
      Some("""SELECT c_custkey AS id, upper(c_name) AS name_u,
                     c_mktsegment AS segment
              FROM customer ORDER BY id""")) { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey").as("id"),
          upper(col("c_name")).as("name_u"),
          col("c_mktsegment").as("segment"))
        .orderBy("id")
    },

    // Equality predicate (cf. COLLECT_SITE_ID = 1, data_seoul_1_category.py:43).
    QueryDef(
      "q_filter_eq",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_returnflag = 'A' AND l_quantity = 10.0
              ORDER BY l_orderkey, l_linenumber""")) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "A" && col("l_quantity") === 10.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // IS NULL predicate (cf. CATEGORY_BIG IS NULL, data_seoul_1_category.py:44):
    // the natural Spark shape — NULLs introduced by an outer join, then
    // filtered, i.e. "customers with no high-value order".
    QueryDef(
      "q_filter_null",
      Some("""SELECT c.c_custkey, c.c_name FROM customer c
              LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                         WHERE o_totalprice > 400000.0) o
                ON c.c_custkey = o.o_custkey
              WHERE o.o_custkey IS NULL
              ORDER BY c.c_custkey""")) { (s, d) =>
      val big = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_custkey").distinct()
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .filter(col("o_custkey").isNull)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // IN-list + flag conjunction (cf. ID IN (5758) AND IS_COLLECT_YN='Y',
    // data_seoul_2_csv_noopenapi.py:44-46).
    QueryDef(
      "q_filter_in",
      Some("""SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
                AND o_orderstatus = 'F'
              ORDER BY o_orderkey""")) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW") &&
          col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .orderBy("o_orderkey")
    }
  )
}
