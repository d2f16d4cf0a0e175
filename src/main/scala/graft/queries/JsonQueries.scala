package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON pipeline queries (SURVEY §2.1 S10 + §2.2 P11).
  *
  * `q42_manifest_json` — the reference's url_mapping.json lifecycle
  * (portal_saude_mg.py:766-791 write, pdf_data_to_table.py:425-463
  * read + shape validation): a manifest derived from the documents
  * table is written as JSON, re-read DISTRIBUTED with an enforced
  * schema (`spark.read.schema(...).json`), and shape-validated with
  * missing-key / empty-field counts. Rows with a missing `url` key
  * exercise the reference's defensive `dict.get` checks (absent JSON
  * keys → null under the enforced schema). The DuckDB oracle computes
  * the same counts straight from the parquet — green means the
  * write→scan→validate roundtrip was lossless AND the validation
  * logic matches.
  *
  * `q43_llm_unwrap` — the reference's LLM-answer cleanup
  * (openai_client.py:43-55): strip markdown fences by extracting
  * first-`{`-to-last-`}`, then `from_json` with an explicit schema,
  * then aggregate the parsed fields. Fence shapes vary per row.
  */
object JsonQueries {

  private lazy val fixtureBase: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_q42_")

  private val manifestSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("filename", StringType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("full_path", StringType),
    StructField("source", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_manifest_json" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      // manifest rows; ~1 in 5 misses the url key (written JSON omits
      // null fields), ~1 in 10 has an empty title
      val manifest = docs.select(
        $"doc_id",
        concat(lit("doc-"), $"doc_id", lit(".pdf")).as("filename"),
        when(pmod($"doc_id" * 7 + 3, lit(10)) < 8,
          concat(lit("https://portal-antigo.saude.mg.gov.br/files/"),
            $"doc_id", lit(".pdf"))).as("url"),
        // title keyed on doc_id only: deriving it from `text` made
        // n_empty_title diverge from the arithmetic oracle whenever a
        // document's text was itself null/empty
        when(pmod($"doc_id" * 11 + 2, lit(10)) < 9,
          concat(lit("Documento nº "), $"doc_id")).otherwise(lit(""))
          .as("title"),
        concat(lit("/data/downloads/doc-"), $"doc_id", lit(".pdf"))
          .as("full_path"),
        $"source")
      // per-process fixture root: two concurrent Verify/Bench JVMs
      // must not overwrite each other's staged JSON
      val tmp = fixtureBase.resolve(math.abs(dir.hashCode).toString)
        .toString
      manifest.write.mode("overwrite").json(tmp)
      // S10: distributed JSON scan with enforced schema + validation
      s.read.schema(manifestSchema).json(tmp)
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_entries"),
          count(when($"url".isNull, 1)).as("n_missing_url"),
          count(when($"title" === "", 1)).as("n_empty_title"),
          count(when($"url".isNotNull && $"title" =!= "" &&
            $"full_path".startsWith("/data/"), 1)).as("n_valid"))
        .orderBy($"source")
    }),

    "q43_llm_unwrap" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val nation = s.read.parquet(s"$dir/nation.parquet")
      // synthesize fenced LLM answers with per-row fence variants
      val raw = nation.select($"n_nationkey", $"n_regionkey",
        concat(
          element_at(array(lit("Resposta:\n```json\n"), lit("```\n"),
            lit("")), (pmod($"n_nationkey", lit(3)) + 1).cast("int")),
          lit("{\"municipio\": \""), $"n_name",
          lit("\", \"valor\": "), ($"n_nationkey" * 137 + 11),
          lit(", \"ok\": "),
          when(pmod($"n_nationkey", lit(2)) === 0, lit("true"))
            .otherwise(lit("false")),
          lit("}"),
          element_at(array(lit("\n```\nObrigado."), lit("\n```"),
            lit(" fim")), (pmod($"n_nationkey", lit(3)) + 1).cast("int")))
          .as("raw"))
      // P11: first-{ to last-} extraction (greedy, dotall), then
      // schema-enforced parse
      val parsed = raw
        .withColumn("j", regexp_extract($"raw", "(?s)\\{.*\\}", 0))
        .withColumn("rec", from_json($"j",
          StructType(Seq(
            StructField("municipio", StringType),
            StructField("valor", LongType),
            StructField("ok", BooleanType)))))
      parsed
        .groupBy($"n_regionkey".cast("int").as("region"))
        .agg(
          count(lit(1)).as("n"),
          sum($"rec.valor").cast("long").as("sum_valor"),
          count(when($"rec.ok", 1)).as("n_ok"),
          min($"rec.municipio").as("first_municipio"))
        .orderBy($"region")
    }),

    "q44_llm_cleanup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val nation = s.read.parquet(s"$dir/nation.parquet")
      // five deterministic noise shapes around the true name — the
      // cleanup must recover the name exactly (P12,
      // municipality_corrector.py:94-114)
      val noisy = nation.select($"n_nationkey",
        element_at(array(
          concat(lit("## Correção\n[fonte](http://ibge.gov.br)\n"),
            $"n_name", lit("\noutra linha")),
          concat(lit("**"), $"n_name", lit("**")),
          concat(lit("\""), $"n_name", lit("\"")),
          concat(lit("["), $"n_name", lit("](https://ibge.gov.br/mun)")),
          concat(lit("`"), $"n_name", lit("`  "))),
          (pmod($"n_nationkey", lit(5)) + 1).cast("int")).as("raw"))
      noisy.select($"n_nationkey",
          graft.report.ReportOps.cleanLlmAnswer($"raw").as("municipio"))
        .orderBy($"n_nationkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q42_manifest_json" ->
      """SELECT source, count(*) AS n_entries,
        | count(*) FILTER (WHERE (doc_id*7+3)%10 >= 8) AS n_missing_url,
        | count(*) FILTER (WHERE (doc_id*11+2)%10 >= 9) AS n_empty_title,
        | count(*) FILTER (WHERE (doc_id*7+3)%10 < 8
        |   AND (doc_id*11+2)%10 < 9) AS n_valid
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_llm_unwrap" ->
      """SELECT CAST(n_regionkey AS INT) AS region, count(*) AS n,
        | CAST(sum(137*n_nationkey + 11) AS BIGINT) AS sum_valor,
        | count(*) FILTER (WHERE n_nationkey%2 = 0) AS n_ok,
        | min(n_name) AS first_municipio
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    // the cleanup recovers the name modulo markdown-char stripping:
    // '_' is markdown emphasis and is removed like the reference's
    // re.sub(r'[#*_`]', '', ...) — the synthetic names contain '_'
    "q44_llm_cleanup" ->
      """SELECT n_nationkey, replace(n_name, '_', '') AS municipio
        |FROM nation ORDER BY 1""".stripMargin
  )
}
