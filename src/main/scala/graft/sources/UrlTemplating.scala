package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sample-URL surgery from the reference's OpenAPI ingest — SURVEY.md §3
  * Entry 3 (data_seoul_3_csv.py:93-106): substitute the auth key into the
  * sample path, normalize a missing trailing slash, and truncate trailing
  * path segments (Python `rsplit('/', n)[0]`), with the branch selectors
  * data-driven instead of hard-coded per dataset id.
  */
object UrlTemplating {

  /** `/sample/` path → authorized path (cf. replace("/sample/", "/KEY/")). */
  def withAuthKey(url: Column, key: Column): Column =
    regexp_replace(url, lit("/sample/"), concat(lit("/"), key, lit("/")))

  /** Ensure exactly one trailing slash (cf. the `+ "/"` fix at :98-99). */
  def ensureTrailingSlash(url: Column): Column =
    when(url.endsWith("/"), url).otherwise(concat(url, lit("/")))

  /** Drop the last `n` path segments — the reference's `rsplit('/', n)[0]`
    * with per-dataset n (data_seoul_3_csv.py:101-106). Statically unrolled
    * regex strip per n (n is a plan-time constant). */
  def dropLastSegments(url: Column, n: Int): Column =
    (1 to n).foldLeft(url)((u, _) => regexp_replace(u, "/[^/]*$", ""))

  /** Positional extraction after a marker — `split('/sample/xml/')[1]`
    * (data_seoul_3_csv.py:93). */
  def afterMarker(url: Column, marker: String): Column =
    element_at(split(url, java.util.regex.Pattern.quote(marker)), 2)
}
