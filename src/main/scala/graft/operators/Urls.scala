package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** URL canonicalization + URL-keyed dedup.
  *
  * Crawl-derived corpora carry the same page under many surface URLs —
  * scheme/host case, `www.` prefixes, default ports, tracking params
  * (`utm_*`, `fbclid`, `gclid`), param order, trailing slashes and
  * fragments all vary while the content is identical. Canonicalizing the
  * URL and deduping on the canonical form is the FIRST dedup pass every
  * web-scale pipeline runs (it is pure string surgery — no content
  * hashing, no shuffle beyond the final group-by), ahead of the content
  * lanes (d01 exact, d03 MinHash, d20 char-ngram).
  *
  * Reference scope note: heparchy has no web/URL surface at all; this is
  * north-star pipeline capability, expressed as composable scan-fused
  * Column functions.
  */
object Urls {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Canonical form of a URL column. The canonicalization contract:
    *   1. fragment stripped;
    *   2. scheme and host lowercased;
    *   3. leading `www.` dropped;
    *   4. explicit default ports (`:80`, `:443`) dropped;
    *   5. tracking parameters removed (`utm_*`, `fbclid`, `gclid`);
    *   6. remaining query params sorted bytewise;
    *   7. trailing slashes dropped from the path;
    *   8. empty query string drops its `?`.
    *
    * Built entirely from codegen'd native functions (regexp + array
    * lambdas) — a scan-fused narrow map, usable inside any pipeline
    * without materializing.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    // only the scheme's OWN default port is redundant: http on :443 (or
    // https on :80) is a different resource and must NOT merge
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z]+://[^/?]*([^?]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      !p.startsWith("utm_") && !p.startsWith("fbclid=") &&
        !p.startsWith("gclid=") && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** SQL restatements of [[canonicalizeUrl]] for the oracle (DuckDB list
    * lambdas mirror Spark's array lambdas 1:1), split so the query can
    * bind each piece ONCE in a CTE — the params expression must not be
    * duplicated across CASE branches, or a future edit diverges the two
    * copies silently.
    */
  private def schemeSql(noFrag: String): String =
    s"lower(regexp_extract($noFrag, '^([A-Za-z]+)://', 1))"

  /** scheme ‖ host ‖ path (everything before the query string). */
  private def canonicalPrefixSql(noFrag: String): String =
    s"""${schemeSql(noFrag)} || '://' ||
       |  regexp_replace(regexp_replace(
       |    lower(regexp_extract($noFrag, '^[A-Za-z]+://([^/?]*)', 1)),
       |    '^www\\.', ''),
       |    CASE WHEN ${schemeSql(noFrag)} = 'http' THEN ':80$$'
       |         WHEN ${schemeSql(noFrag)} = 'https' THEN ':443$$'
       |         ELSE 'a^' END, '') ||
       |  regexp_replace(
       |    regexp_extract($noFrag, '^[A-Za-z]+://[^/?]*([^?]*)', 1),
       |    '/+$$', '')""".stripMargin

  /** The sorted, tracking-stripped query string (possibly empty). */
  private def canonicalParamsSql(noFrag: String): String =
    s"""array_to_string(list_sort(list_filter(
       |    string_split(regexp_extract($noFrag, '\\?(.*)$$', 1), '&'),
       |    p -> p NOT LIKE 'utm\\_%' ESCAPE '\\'
       |         AND p NOT LIKE 'fbclid=%'
       |         AND p NOT LIKE 'gclid=%' AND p <> '')), '&')""".stripMargin

  /** Synthetic URL surface for the gate: documents have no URL column,
    * so both sides derive one DETERMINISTICALLY from `doc_id` — four
    * surface variants (case/`www.`/port/tracking-param/order/slash/
    * fragment noise) per target page `doc_id div 4`, exercising every
    * clause of the canonicalization contract. The shared construction is
    * test scaffolding; [[canonicalizeUrl]] is the operator.
    */
  private val urlSqlCases =
    """CASE CAST(doc_id % 4 AS INT)
      |  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/docs/' || (doc_id // 4) ||
      |              '/?b=2&a=1&utm_source=feed#top'
      |  WHEN 1 THEN 'http://example.com/docs/' || (doc_id // 4) ||
      |              '?a=1&b=2'
      |  WHEN 2 THEN 'http://EXAMPLE.com:80/docs/' || (doc_id // 4) ||
      |              '/?utm_medium=z&b=2&a=1'
      |  ELSE 'http://www.example.com/docs/' || (doc_id // 4) ||
      |       '?a=1&fbclid=XYZ&b=2#section-2'
      |END""".stripMargin

  private def urlCol: Column = {
    val p = expr("doc_id div 4").cast("string")
    val v = (col("doc_id") % 4).cast("int")
    when(v === 0, concat(lit("HTTP://WWW.Example.COM:80/docs/"), p,
      lit("/?b=2&a=1&utm_source=feed#top")))
      .when(v === 1, concat(lit("http://example.com/docs/"), p,
        lit("?a=1&b=2")))
      .when(v === 2, concat(lit("http://EXAMPLE.com:80/docs/"), p,
        lit("/?utm_medium=z&b=2&a=1")))
      .otherwise(concat(lit("http://www.example.com/docs/"), p,
        lit("?a=1&fbclid=XYZ&b=2#section-2")))
  }

  /** d22: URL-canonical dedup — group by canonical URL, keep the
    * smallest doc_id, report group size and the distinct surface count.
    *
    * Scale shape: canonicalization is a scan-fused narrow map; the ONLY
    * shuffle is the group-by on the canonical string (map-side partial
    * counts; min/count/distinct-2 all combine). The 100 TB profile is
    * exactly word-count: token-sized exchange, no joins, no windows.
    */
  val urlDedup: QueryDef = q(
    "d22_url_canonical",
    s"""WITH u AS (
       |  SELECT doc_id, $urlSqlCases AS url FROM documents),
       |nf AS (
       |  SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS f FROM u),
       |c AS (
       |  SELECT doc_id, url,
       |         ${canonicalPrefixSql("f")} AS pre,
       |         ${canonicalParamsSql("f")} AS ps
       |  FROM nf)
       |SELECT pre || CASE WHEN length(ps) > 0 THEN '?' || ps ELSE '' END
       |         AS canon_url,
       |       count(*) AS n_dups,
       |       count(DISTINCT url) AS n_surface_forms,
       |       min(doc_id) AS keep_doc
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), urlCol.as("url"))
      .withColumn("canon", canonicalizeUrl(col("url")))
      .groupBy(col("canon").as("canon_url"))
      .agg(count(lit(1)).as("n_dups"),
        countDistinct(col("url")).as("n_surface_forms"),
        min(col("doc_id")).as("keep_doc"))
      .orderBy("canon_url")
  }

  /** d23: ENSEMBLE dedup — one cluster space over MULTIPLE dedup lanes.
    * Production pipelines never run one dedup signal: a page is the same
    * page if its canonical URL matches (d22's lane) OR its text is
    * byte-identical (d01's lane) — and transitively, so a URL-duplicate
    * of a text-duplicate joins the same group. The composition is an
    * edge-union + connected components: each lane contributes STAR edges
    * (every member → its key-group minimum, linear in members, never the
    * quadratic pair set), the union feeds [[Dedup.connectedComponents]]
    * (adaptive local/distributed union-find), singletons keep their own
    * id. The oracle restates both lanes' star edges and closes the
    * transitive reach with a recursive CTE — a different CC evaluation
    * agreeing exactly (the d07 discipline).
    *
    * Scale shape: each lane is one keyed window (min per key group) —
    * map-side combined, linear edges out; CC is the audited adaptive
    * path; the final labeling is one left join on doc_id. Adding a lane
    * (phash, MinHash-confirmed, …) is one more star-edge relation
    * unioned in.
    */
  val ensembleDedup: QueryDef = q(
    "d23_ensemble_dedup",
    s"""WITH RECURSIVE u AS (
       |  SELECT doc_id, $urlSqlCases AS url FROM documents),
       |nf AS (
       |  SELECT doc_id, regexp_replace(url, '#.*$$', '') AS f FROM u),
       |ck AS (
       |  SELECT doc_id,
       |         ${canonicalPrefixSql("f")} || '?' ||
       |           ${canonicalParamsSql("f")} AS k
       |  FROM nf),
       |tk AS (SELECT doc_id, md5(text) AS k FROM documents),
       |e1 AS (
       |  SELECT min(doc_id) OVER (PARTITION BY k) AS a, doc_id AS b FROM ck),
       |e2 AS (
       |  SELECT min(doc_id) OVER (PARTITION BY k) AS a, doc_id AS b FROM tk),
       |ed AS (
       |  SELECT a, b FROM e1 WHERE a < b
       |  UNION SELECT a, b FROM e2 WHERE a < b),
       |und AS (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed),
       |reach(doc_id, r) AS (
       |  SELECT DISTINCT a, a FROM und
       |  UNION
       |  SELECT und.a, reach.r FROM und JOIN reach ON reach.doc_id = und.b),
       |lab AS (SELECT doc_id, min(r) AS cluster FROM reach GROUP BY 1)
       |SELECT d.doc_id, coalesce(lab.cluster, d.doc_id) AS cluster
       |FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def starEdges(keyed: DataFrame): DataFrame = {
      val w = Window.partitionBy("k")
      keyed.withColumn("a", min(col("doc_id")).over(w))
        .filter(col("a") < col("doc_id"))
        .select(col("a").as("doc_a"), col("doc_id").as("doc_b"))
    }
    val urlKey = docs
      .select(col("doc_id"), urlCol.as("url"))
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("k"))
    val textKey = docs.select(col("doc_id"), md5(col("text")).as("k"))
    val edges = starEdges(urlKey).unionByName(starEdges(textKey)).distinct()
    val cc = graft.operators.Dedup.connectedComponents(edges)
    docs.select("doc_id")
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .orderBy("doc_id")
  }

  def defs: Seq[QueryDef] = Seq(urlDedup, ensembleDedup)
}
