package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dedup, Sample}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7). */
object SortSetQueries {

  val defs: Seq[QueryDef] = Seq(

    // Global sort (cf. ORDER BY ID DESC, data_seoul_2_csv_noopenapi.py:74).
    // Range-partitioned exchange under the hood — scales, unlike a
    // single-partition window.
    QueryDef(
      "q_sort",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey""")) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },

    // Limit after sort (cf. take-first, data_seoul_2_csv_noopenapi.py:77-79).
    QueryDef(
      "q_limit",
      Some("""SELECT o_orderkey, o_custkey FROM orders
              ORDER BY o_orderkey LIMIT 10""")) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .limit(10)
    },

    // Top-k: sort+limit fused by Catalyst into TakeOrderedAndProject —
    // O(k) memory per partition, no global sort at any scale.
    QueryDef(
      "q_topk",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // UNION ALL (unionByName — position-independent, the safe form).
    QueryDef(
      "q_set_union",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT * FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT * FROM events WHERE event_type = 'view')
              GROUP BY event_type ORDER BY event_type""")) { (s, d) =>
      val e = Tables.events(s, d)
      e.filter(col("event_type") === "click")
        .unionByName(e.filter(col("event_type") === "view"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // INTERSECT (distinct semantics): customers with both F and O orders.
    QueryDef(
      "q_set_intersect",
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              ORDER BY o_custkey""")) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // EXCEPT (distinct semantics): customers with F orders but no O orders.
    QueryDef(
      "q_set_except",
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              ORDER BY o_custkey""")) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // Exact dedup by content: one row kept per distinct document text
    // (deterministic keeper = min doc_id; see graft.operators.Dedup).
    QueryDef(
      "q_dedup_exact",
      Some("""SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
                     CAST(count(*) AS BIGINT) AS dup_cnt
              FROM documents GROUP BY text ORDER BY keep_id""")) { (s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), Seq("text"), "doc_id")
        .orderBy("keep_id")
    },

    // Deterministic stratified sampling (graft.operators.Sample): keep 25%
    // of English documents and 50% of the rest, selected by an arithmetic
    // id hash — the SAME rows on every run and on every engine (the oracle
    // applies identical arithmetic), so incremental re-ingestion stays
    // consistent. The corpus-balancing primitive of a training pipeline.
    QueryDef(
      "q_sample_stratified",
      Some(s"""SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       ${PortableSql.hashBucket("doc_id", 100)} AS b
                FROM documents)
              WHERE (lang = 'en' AND b < 25) OR (lang <> 'en' AND b < 50)
              ORDER BY doc_id""")) { (s, d) =>
      val b = Sample.hashBucket(col("doc_id"), 100)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), b.as("b"))
        .filter((col("lang") === "en" && col("b") < 25) ||
          (col("lang") =!= "en" && col("b") < 50))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Deterministic per-stratum reservoir: AT MOST k documents per
    // language, chosen as the k smallest (id-hash, id) pairs — a
    // reproducible fixed-size sample per group (Sample.fixedPerStratum),
    // the "N examples per language for eval" primitive. Unlike rate
    // sampling the output size is bounded per stratum regardless of
    // stratum skew; the window partitions by lang (one hash shuffle), and
    // re-ingestion keeps old picks stable unless a new doc hashes
    // earlier. Oracle replays the same hash order (portable pmod mirror).
    QueryDef(
      "q_sample_reservoir",
      Some(s"""SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY ${PortableSql.hashBucket("doc_id", 1000003)}, doc_id) AS rn
                FROM documents)
              WHERE rn <= 40 ORDER BY doc_id""")) { (s, d) =>
      Sample.fixedPerStratum(
          Tables.documents(s, d).select("doc_id", "lang"),
          stratumCol = "lang", idCol = "doc_id", k = 40)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Deterministic WEIGHT-PROPORTIONAL sampling (Sample.weightedPerStratum):
    // 30 documents per language, where a document's chance of selection
    // scales with its length — the token-budget subcorpus primitive
    // (sampling by n_chars approximates sampling by token count). The
    // priority key ⌊hash(id)·2^20 / weight⌋ is the sequential-Poisson
    // (u/w, Ohlsson) order statistic in exact integer form — a
    // deterministic approximation of weight-proportional sampling — so
    // both engines rank and tie-break identically; one partitioned
    // window, no global sort.
    QueryDef(
      "q_sample_weighted",
      Some(s"""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY (${PortableSql.hashBucket("doc_id", 1000003)} * 1048576)
                                    // GREATEST(n_chars, 1),
                                  doc_id) AS rn
                FROM documents)
              WHERE rn <= 30 ORDER BY doc_id""")) { (s, d) =>
      Sample.weightedPerStratum(
          Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
          stratumCol = "lang", idCol = "doc_id", weightCol = "n_chars",
          k = 30)
        .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")
    }
  )
}
