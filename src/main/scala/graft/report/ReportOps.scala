package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.url.Hashing

/** Downstream report batch (SURVEY §7.2 item 9): assembly and
  * validation of the reference's 9-field extraction record
  * (pdf_data_to_table.py:34-44), replacing the Excel sink (K3) with a
  * table. All validators are Catalyst built-ins (codegen'd), mirroring
  * validators.py semantics:
  *  - sentinel normalization P6 (pdf_data_to_table.py:244-262)
  *  - format regexes P7 (validators.py:17-20) incl. the real-calendar
  *    date check (validators.py:69-75) via to_date round-trip
  *  - budget-code categorization P8 with first-match-wins and the
  *    "NÃO CLASSIFICADO" default (validators.py:23-32, :93-129)
  *  - summary/quality aggregates A4/A5 (pdf_data_to_table.py:321-396)
  */
object ReportOps {

  val Sentinel = "NÃO INFORMADO"
  val Unclassified = "NÃO CLASSIFICADO"

  val extractionFields: Seq[String] = Seq("numero_resolucao", "relacionada",
    "objeto", "data_inicial", "prazo_execucao", "vedado_utilizacao",
    "dotacao_orcamentaria", "link", "abreviacao")

  /** P6: trim; empty/null → sentinel. */
  def normalizeSentinel(c: Column): Column =
    coalesce(nullif(trim(c), lit("")), lit(Sentinel))

  /** P7: resolution number `^\d{1,5}/20\d{2}$` (validators.py:17). */
  def validResolution(c: Column): Column = c.rlike("^\\d{1,5}/20\\d{2}$")

  /** P7: DD/MM/YYYY with a real-calendar check (validators.py:18,
    * :69-75): shape regex + to_date parse. */
  def validDate(c: Column): Column =
    c.rlike("^\\d{2}/\\d{2}/\\d{4}$") &&
      try_to_timestamp(c, lit("dd/MM/yyyy")).isNotNull

  /** P7: currency `R$ ...` (validators.py:20). */
  def validCurrency(c: Column): Column = c.rlike("R\\$\\s*[\\d.,]+")

  /** P8: the 8 budget categories, code set and names exactly as the
    * reference's BUDGET_CATEGORIES (validators.py:22-32); first
    * matching code in the text wins (validators.py:93-129). */
  val budgetCategories: Seq[(String, String)] = Seq(
    "301" -> "Atenção Primária",
    "302" -> "MAC",
    "303" -> "Assistência Farmacêutica",
    "304" -> "Vigilância Sanitária",
    "305" -> "Vigilância Epidemiológica",
    "306" -> "Alimentação e Nutrição",
    "122" -> "ADM",
    "242" -> "Assist. ao Portador de Deficiência")

  /** First budget code appearing in the text, '' when none. */
  def firstBudgetCode(c: Column): Column =
    regexp_extract(c,
      "\\b(" + budgetCategories.map(_._1).mkString("|") + ")\\b", 1)

  def categorize(c: Column): Column = {
    val code = firstBudgetCode(c)
    budgetCategories.foldRight(lit(Unclassified): Column) {
      case ((k, name), acc) => when(code === k, name).otherwise(acc)
    }
  }

  /** P12 LLM answer cleanup (municipality_corrector.py:94-114), all
    * Catalyst built-ins: when the answer starts with a markdown
    * header, take the first line that is not a header/link/url; unwrap
    * markdown links `[text](url)` to `text`; strip residual markdown
    * chars; trim and strip wrapping quotes. */
  def cleanLlmAnswer(c: Column): Column = {
    val t = trim(c)
    val picked = when(t.startsWith("#"),
      coalesce(element_at(filter(split(c, "\n"), l => {
        val lt = trim(l)
        length(lt) > 0 && !lt.startsWith("#") && !lt.startsWith("[") &&
          !lt.startsWith("http")
      }), 1), t)).otherwise(t)
    val noLinks =
      regexp_replace(picked, "\\[([^\\]]+)\\]\\([^)]+\\)", "$1")
    val noMd = regexp_replace(noLinks, "[#*_`]", "")
    trim(regexp_replace(trim(noMd), "^[\"']+|[\"']+$", ""))
  }

  /** Assemble the normalized report table from raw extraction rows. */
  def assemble(raw: DataFrame): DataFrame = {
    val normalized = extractionFields.foldLeft(raw) { (df, f) =>
      df.withColumn(f, normalizeSentinel(col(f)))
    }
    normalized
      .withColumn("categoria", categorize(col("dotacao_orcamentaria")))
      .withColumn("resolucao_valida", validResolution(col("numero_resolucao")))
      .withColumn("data_valida", validDate(col("data_inicial")))
  }

  /** A4: per-column informative-value counts (≠ sentinel),
    * pdf_data_to_table.py:331-354. */
  def summary(report: DataFrame): DataFrame = {
    val aggs = extractionFields.map(f =>
      count(when(col(f) =!= Sentinel, 1)).as(s"n_$f")) ++ Seq(
      count(lit(1)).as("n_rows"),
      count(when(col("resolucao_valida"), 1)).as("n_valid_resolucao"),
      count(when(col("data_valida"), 1)).as("n_valid_data"))
    report.agg(aggs.head, aggs.tail: _*)
  }

  /** A5: data-quality stats (pdf_data_to_table.py:384-396). */
  def qualityStats(report: DataFrame): DataFrame = {
    val sentinelCells = extractionFields
      .map(f => count(when(col(f) === Sentinel, 1)))
      .reduce(_ + _).as("sentinel_cells")
    val emptyRows = count(when(
      extractionFields.map(f => col(f) === Sentinel).reduce(_ && _), 1))
      .as("empty_rows")
    report.agg(count(lit(1)).as("n_rows"), sentinelCells, emptyRows)
  }

  /** Deterministic synthetic extraction rows derived from the
    * documents table (for tests/queries: no LLM in this environment —
    * field values are pure integer-arithmetic functions of doc_id,
    * with a controlled mix of valid/invalid/missing shapes). Uses only
    * `(doc_id·P+Q) % n` so a DuckDB oracle can mirror it exactly. */
  def syntheticExtractions(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def pick(p: Int, q: Int, n: Int): Column =
      pmod(id * p + q, lit(n))
    docs.select(
      id,
      when(pick(7, 3, 10) < 7,
        concat(pmod(id * 131, lit(9999)).cast("string"), lit("/20"),
          lpad(pmod(id * 17, lit(30)).cast("string"), 2, "0")))
        .when(pick(7, 3, 10) < 9, lit("RES-INVALIDA"))
        .otherwise(lit("")).as("numero_resolucao"),
      when(pick(11, 1, 3) === 0, lit("Resolução anterior nº 100/2020"))
        .otherwise(lit("")).as("relacionada"),
      substring(col("text"), 1, 120).as("objeto"),
      when(pick(13, 5, 10) < 6,
        concat(lpad((pmod(id * 19, lit(28)) + 1).cast("string"), 2, "0"),
          lit("/"),
          lpad((pmod(id * 23, lit(12)) + 1).cast("string"), 2, "0"),
          lit("/202"), pmod(id * 29, lit(5)).cast("string")))
        .when(pick(13, 5, 10) < 8, lit("31/02/2024")) // shape-valid, unreal
        .otherwise(lit("")).as("data_inicial"),
      when(pick(31, 0, 2) === 0, lit("12 meses")).otherwise(lit(""))
        .as("prazo_execucao"),
      when(pick(37, 2, 3) === 0,
        lit("vedada a utilização em despesas de capital"))
        .otherwise(lit("")).as("vedado_utilizacao"),
      when(pick(41, 7, 10) < 8,
        concat(lit("10."),
          element_at(array(budgetCategories.map(c => lit(c._1)): _*),
            (pick(43, 0, budgetCategories.size) + 1).cast("int")),
          lit(".0021 R$ "), pmod(id * 47, lit(900000)).cast("string"),
          lit(",00")))
        .otherwise(lit("sem dotação")).as("dotacao_orcamentaria"),
      concat(lit("https://portal-antigo.saude.mg.gov.br/res/"),
        id.cast("string")).as("link"),
      when(pick(53, 1, 4) === 0, lit("")).otherwise(lit("SES/MG"))
        .as("abreviacao"))
  }
}
