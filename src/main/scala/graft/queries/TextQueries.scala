package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{Num, TextFunctions => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over `documents` — SURVEY.md §2.10 plus the north-star
  * training-data-pipeline operators: tokenization, term frequency, n-grams,
  * quality scoring, language-ID heuristic, token counting, fingerprinting.
  *
  * Everything is explode/groupBy over codegen'd built-ins — the shape that
  * scales: tokenization is a narrow map, the only shuffle is the token/ngram
  * group-by (with map-side partial aggregation).
  */
object TextQueries {

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is")
  private val dataStop = Seq("data", "table", "row", "query", "join")
  private val sparkStop = Seq("spark", "stream", "filter", "window", "group")

  val defs: Seq[QueryDef] = Seq(

    // Tokenize + global term counts (shingle/tokenizer generator — §2.10).
    QueryDef(
      "q_text_tokens",
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                              t -> t <> '')) AS token
                    FROM documents)
              GROUP BY token ORDER BY token""")) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(T.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy("token")
    },

    // Term frequency: top-3 tokens per language (group-by + windowed top-k).
    QueryDef(
      "q_text_tf",
      Some("""SELECT lang, token, n, CAST(rn AS BIGINT) AS rn FROM (
                SELECT lang, token, CAST(count(*) AS BIGINT) AS n,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY count(*) DESC, token) AS rn
                FROM (SELECT lang,
                             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                                t -> t <> '')) AS token
                      FROM documents)
                GROUP BY lang, token)
              WHERE rn <= 3 ORDER BY lang, rn""")) { (s, d) =>
      val counts = Tables.documents(s, d)
        .select(col("lang"), explode(T.tokens(col("text"))).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("token"))
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("lang"), col("token"), col("n"), col("rn").cast("long"))
        .orderBy("lang", "rn")
    },

    // Bigrams: top-30 by frequency (n-gram generator — §2.10).
    QueryDef(
      "q_text_ngram",
      Some("""SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                             i -> toks[i] || ' ' || toks[i + 1])) AS bigram
                FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                                         t -> t <> '') AS toks
                      FROM documents))
              GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""")) { (s, d) =>
      Tables.documents(s, d)
        .repartition(col("doc_id")) // spread interpreted ngram HOF work
        .select(explode(T.ngrams(T.tokens(col("text")), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(30)
    },

    // Quality scoring: token count, mean token length, stopword ratio —
    // the standard pre-training corpus filters.
    QueryDef(
      "q_text_quality",
      Some(s"""SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                      CAST(round(CAST(CAST(n_chars AS DOUBLE) / len(toks) AS DECIMAL(28,6)), 2) AS DOUBLE) AS chars_per_token,
                      CAST(round(CAST(CAST(len(list_filter(toks,
                        t -> list_contains(${dk(enStop)}, t))) AS DOUBLE) / len(toks) AS DECIMAL(28,6)), 2) AS DOUBLE) AS stop_ratio
               FROM (SELECT doc_id, n_chars,
                            list_filter(string_split_regex(lower(text), '\\s+'),
                                        t -> t <> '') AS toks
                     FROM documents)
               ORDER BY doc_id""")) { (s, d) =>
      val toks = T.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), toks.as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          Num.round2(col("n_chars").cast("double") / size(col("toks")))
            .as("chars_per_token"),
          Num.round2(T.vocabCount(col("toks"), enStop).cast("double") /
            size(col("toks"))).as("stop_ratio"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic: vocabulary-profile scores per document (n-gram
    // profile voting; deterministic, oracle-checkable).
    QueryDef(
      "q_text_langid",
      Some(s"""SELECT doc_id,
                      CAST(len(list_filter(toks, t -> list_contains(${dk(enStop)}, t))) AS BIGINT) AS s_en,
                      CAST(len(list_filter(toks, t -> list_contains(${dk(dataStop)}, t))) AS BIGINT) AS s_data,
                      CAST(len(list_filter(toks, t -> list_contains(${dk(sparkStop)}, t))) AS BIGINT) AS s_spark
               FROM (SELECT doc_id,
                            list_filter(string_split_regex(lower(text), '\\s+'),
                                        t -> t <> '') AS toks
                     FROM documents)
               ORDER BY doc_id""")) { (s, d) =>
      val toks = T.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .select(
          col("doc_id"),
          T.vocabCount(col("toks"), enStop).cast("long").as("s_en"),
          T.vocabCount(col("toks"), dataStop).cast("long").as("s_data"),
          T.vocabCount(col("toks"), sparkStop).cast("long").as("s_spark"))
        .orderBy("doc_id")
    },

    // Content fingerprint (md5 of normalized text) + per-fingerprint
    // duplicate count — the exact-dup detector at corpus scale.
    QueryDef(
      "q_text_fingerprint",
      Some("""SELECT doc_id, fp, CAST(n_same AS BIGINT) AS n_same FROM (
                SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same
                FROM (SELECT doc_id,
                             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
                      FROM documents))
              ORDER BY doc_id""")) { (s, d) =>
      val wFp = Window.partitionBy("fp")
      Tables.documents(s, d)
        .select(col("doc_id"), T.fingerprintMd5(col("text")).as("fp"))
        .withColumn("n_same", count(lit(1)).over(wFp).cast("long"))
        .orderBy("doc_id")
    },

    // Token counting with a BPE-ish regex (word pieces + punctuation) —
    // the "how many tokens is this corpus" pipeline primitive.
    QueryDef(
      "q_token_count",
      Some("""SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
                     n_chars,
                     CAST(round(CAST(CAST(n_chars AS DOUBLE) /
                       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS DECIMAL(28,6)), 2) AS DOUBLE) AS chars_per_token
              FROM documents ORDER BY doc_id""")) { (s, d) =>
      val nTok = size(T.bpeTokens(col("text")))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nTok.cast("long").as("n_tokens"),
          col("n_chars"),
          Num.round2(col("n_chars").cast("double") / nTok).as("chars_per_token"))
        .orderBy("doc_id")
    }
  )

  /** Render a Scala string list as a DuckDB list literal. */
  private def dk(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ",", "]")

  val extraDefs: Seq[QueryDef] = Seq(

    // Document chunking: fixed 32-token windows with stride 24 (25%
    // overlap) — the pre-training windowing primitive. One narrow map per
    // doc (chunk count is tokens/stride, so per-row work is bounded);
    // output = one row per chunk with its text and token span.
    QueryDef(
      "q_text_chunks",
      Some("""SELECT doc_id, CAST(c AS BIGINT) AS chunk_idx,
                     CAST(c * 24 AS BIGINT) AS tok_start,
                     array_to_string(toks[c * 24 + 1 : c * 24 + 32], ' ') AS chunk
              FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS toks,
                       unnest(generate_series(0,
                         CAST(ceil(greatest(
                           len(list_filter(string_split_regex(lower(text), '\s+'),
                                           x -> x <> '')) - 8, 1) / 24.0)
                          AS BIGINT) - 1)) AS c
                FROM documents)
              ORDER BY doc_id, chunk_idx""")) { (s, d) =>
      val size = 32
      val stride = 24
      val toks = T.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .withColumn("n_chunks",
          ceil(greatest(org.apache.spark.sql.functions.size(col("toks")) - (size - stride), lit(1))
            .cast("double") / stride).cast("long"))
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(Seq("pos", "c")))
        .select(
          col("doc_id"),
          col("c").as("chunk_idx"),
          (col("c") * stride).as("tok_start"),
          array_join(slice(col("toks"), (col("c") * stride + 1).cast("int"), lit(size)), " ")
            .as("chunk"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Per-source corpus statistics — the "which crawl/feed is junk"
    // dashboard aggregate every corpus pipeline keeps.
    QueryDef(
      "q_text_source_stats",
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(round(CAST(avg(n_chars) AS DECIMAL(28,6)), 2) AS DOUBLE) AS avg_chars,
                     CAST(max(n_chars) AS BIGINT) AS max_chars,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
              FROM documents GROUP BY source ORDER BY source""")) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          Num.round2(avg("n_chars")).as("avg_chars"),
          max("n_chars").cast("long").as("max_chars"),
          countDistinct("lang").as("n_langs"))
        .orderBy("source")
    },

    // Hangul through the text stack: the reference's domain is Korean
    // metadata (공통-column skip, data_seoul_3_csv.py:133-137), so prove
    // the UTF-8 semantics match DuckDB end-to-end on a fixed Korean
    // fixture — tokenization (lowercase is identity on Hangul, ASCII
    // folds), the 공통 filter itself, and an md5-derived fingerprint
    // (Portable.h48 summed over distinct tokens), which only matches if
    // both engines hash IDENTICAL UTF-8 bytes. The fixture is literal on
    // both sides (VALUES in the oracle); the operators are the production
    // ones.
    QueryDef(
      "q_text_korean",
      Some(s"""WITH r(id, txt) AS (VALUES
                 (1, '서울 열린 데이터 광장 데이터'),
                 (2, '공통 컬럼 은 건너뛴다 공통'),
                 (3, '데이터 분석 플랫폼 서울 Spark 플랫폼'),
                 (4, '한글 과 English MIXED 토큰 테스트')),
               t AS (SELECT id, ${PortableSql.toks("txt")} AS toks FROM r)
               SELECT CAST(id AS BIGINT) AS id,
                      CAST(len(toks) AS INT) AS n_toks,
                      CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
                      CAST(len(list_filter(toks, x -> x = '공통')) AS INT) AS n_common,
                      CAST(list_sum(list_transform(list_distinct(toks),
                        s -> ${PortableSql.h48("s")})) AS BIGINT) AS fp
               FROM t ORDER BY id""")) { (s, d) =>
      import s.implicits._
      val rows = Seq(
        (1L, "서울 열린 데이터 광장 데이터"),
        (2L, "공통 컬럼 은 건너뛴다 공통"),
        (3L, "데이터 분석 플랫폼 서울 Spark 플랫폼"),
        (4L, "한글 과 English MIXED 토큰 테스트")).toDF("id", "txt")
      rows
        .select(col("id"), T.tokens(col("txt")).as("toks"))
        .select(
          col("id"),
          org.apache.spark.sql.functions.size(col("toks")).as("n_toks"),
          org.apache.spark.sql.functions.size(array_distinct(col("toks"))).as("n_distinct"),
          org.apache.spark.sql.functions.size(
            filter(col("toks"), t => t === "공통")).as("n_common"),
          aggregate(
            transform(array_distinct(col("toks")), graft.functions.Portable.h48(_)),
            lit(0L), (acc, h) => acc + h).as("fp"))
        .orderBy("id")
    },

    // Unicode NFC normalization over the corpus — every row is extended
    // with a DECOMPOSED suffix (e + combining acute, and 한 as three
    // Hangul jamo) so the normalizer does real composition work on every
    // document, then both engines must agree on the exact normalized
    // string: md5 of the NFC output is the parity check (same UTF-8 bytes
    // or the row fails), with the char counts exposing the 3-codepoint
    // contraction. Narrow per-row map (graft.expressions.NfcNormalize,
    // codegen, isNormalized fast path for already-NFC input); JDK and
    // DuckDB both implement Unicode canonical composition, which is what
    // makes this oracle-checkable at all.
    QueryDef(
      "q_text_normalize",
      Some("""SELECT doc_id,
                     CAST(length(raw) AS BIGINT) AS n_raw,
                     CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
                     md5(nfc_normalize(raw)) AS h_nfc
              FROM (SELECT doc_id,
                           text || ' e' || chr(769) || ' ' ||
                             chr(4370) || chr(4449) || chr(4523) AS raw
                    FROM documents)
              ORDER BY doc_id""")) { (s, d) =>
      val raw = concat(col("text"),
        lit(" é 한"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(
          col("doc_id"),
          length(col("raw")).cast("long").as("n_raw"),
          length(T.nfc(col("raw"))).cast("long").as("n_nfc"),
          md5(T.nfc(col("raw"))).as("h_nfc"))
        .orderBy("doc_id")
    }
  )
}
