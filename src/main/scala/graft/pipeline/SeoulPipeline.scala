package graft.pipeline

import graft.functions.TextFunctions
import graft.operators.Enrich
import graft.sources.{Audit, CatalogSchema, Ingest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's three driver scripts, composed end-to-end from the
  * engine's operators — SURVEY.md §3. A user of `newGeon/seoul_big_data`
  * maps each script onto one function here:
  *
  *  - Entry 1 (`data_seoul_1_category.py`): category enrichment —
  *    [[categoryEnrich]].
  *  - Entry 2 (`data_seoul_2_csv_noopenapi.py`): catalog-schema CSV ingest
  *    with offset resume + audit — [[csvIngest]].
  *  - Entry 3 (`data_seoul_3_csv.py`): Entry 2 preceded by doc-page schema
  *    inference — [[inferAndIngest]] (see graft.sources.SchemaInfer).
  *
  * The page *fetching* of entries 1/3 is out of engine scope (zero egress);
  * these functions take the already-fetched page text/cells as columns, and
  * extraction happens engine-side.
  */
object SeoulPipeline {

  /** Entry 1: for catalog rows with NULL category, extract CATEGORY_BIG /
    * CATEGORY_SMALL from the fetched detail-page text (the engine-side
    * equivalent of the strong.side-detail-ctg / tbl-base-d DOM walk,
    * data_seoul_1_category.py:70-78) and merge them back.
    *
    * `pages`: (id, page_text). Only rows needing enrichment are touched —
    * the reference's CATEGORY_BIG IS NULL incremental contract.
    */
  def categoryEnrich(catalog: DataFrame, pages: DataFrame): DataFrame = {
    val extracted = pages.select(
      col("id"),
      TextFunctions.normalizeWs(
        regexp_extract(col("page_text"),
          """(?s)<strong[^>]*class="side-detail-ctg"[^>]*>(.*?)</strong>""", 1))
        .as("category_big"),
      TextFunctions.normalizeWs(
        regexp_extract(col("page_text"),
          """(?s)<td[^>]*class="cate-s"[^>]*>(.*?)</td>""", 1))
        .as("category_small"))
    val candidates = extracted.filter(col("category_big") =!= "")
    Enrich.merge(catalog, candidates, "id",
      Seq("category_big", "category_small"))
  }

  /** Entry 2: resumable catalog-schema CSV ingest + audit row. Returns
    * (typed data, audit). The staging/final table naming follows the
    * reference (`TMP_`/`NLDATA_` + zero-padded id,
    * data_seoul_2_csv_noopenapi.py:68-69).
    */
  def csvIngest(
      spark: SparkSession,
      datasetId: Int,
      csvPath: String,
      schemaRows: DataFrame,
      startIdx: Long): (DataFrame, DataFrame) = {
    val schema: StructType = CatalogSchema.fromRows(schemaRows)
    val staged = Ingest.csvResume(spark, csvPath, schema, startIdx)
    val typed = Ingest.applyTypes(staged, schema)
    val tableName = f"NLDATA_$datasetId%06d"
    (typed, Audit.record(spark, tableName, typed))
  }

  /** Entry 3: doc-page schema inference feeding Entry 2. `pageCells` is the
    * flattened stride-3 output-column table of the dataset's OpenAPI doc
    * (see SchemaInfer.inferColumns); inferred columns become the catalog
    * schema under generic COL_nnn physical names with NUMBER/VARCHAR typing
    * deferred (all VARCHAR2 here, as the reference defers typing to the
    * store).
    */
  def inferAndIngest(
      spark: SparkSession,
      datasetId: Int,
      csvPath: String,
      pageCells: DataFrame,
      startIdx: Long): (DataFrame, DataFrame) = {
    val inferred = graft.sources.SchemaInfer.inferColumns(pageCells)
      .select(
        col("english").as("physical_column_name"),
        lit("VARCHAR2").as("physical_column_type"),
        col("ordinal").as("physical_column_order"))
    csvIngest(spark, datasetId, csvPath, inferred, startIdx)
  }
}
