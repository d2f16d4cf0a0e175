package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.report.ReportOps

/** Downstream report-batch queries (SURVEY §2.2 P6-P8, §2.7 A4/A5)
  * over deterministic synthetic extraction records derived from the
  * documents table with pure integer arithmetic — so the DuckDB
  * oracle regenerates the identical input and checks normalization,
  * validation, categorization, and the summary aggregates exactly.
  */
object ReportQueries {

  private def extractions(s: SparkSession, dir: String): DataFrame =
    ReportOps.syntheticExtractions(
      s.read.parquet(s"$dir/documents.parquet"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P8 categorization + P7 validators + A4 conditional counts
    "q40_report_categories" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      ReportOps.assemble(extractions(s, dir))
        .groupBy($"categoria")
        .agg(count(lit(1)).as("n"),
          count(when($"resolucao_valida", 1)).as("n_valid_res"),
          count(when($"data_valida", 1)).as("n_valid_date"),
          count(when($"prazo_execucao" === ReportOps.Sentinel, 1))
            .as("n_missing_prazo"))
        .orderBy($"categoria")
    }),

    // A5 data-quality stats over the normalized table
    "q41_report_quality" -> ((s: SparkSession, dir: String) =>
      ReportOps.qualityStats(ReportOps.assemble(extractions(s, dir))))
  )

  /** Shared SQL fragment regenerating the synthetic extractions —
    * mirrors ReportOps.syntheticExtractions exactly. */
  private val extractionsSql =
    """SELECT doc_id,
      | CASE WHEN (doc_id*7+3)%10 < 7 THEN
      |   concat(CAST((doc_id*131)%9999 AS VARCHAR), '/20',
      |          lpad(CAST((doc_id*17)%30 AS VARCHAR), 2, '0'))
      |  WHEN (doc_id*7+3)%10 < 9 THEN 'RES-INVALIDA' ELSE '' END
      |   AS numero_resolucao,
      | CASE WHEN (doc_id*13+5)%10 < 6 THEN
      |   concat(lpad(CAST((doc_id*19)%28 + 1 AS VARCHAR), 2, '0'), '/',
      |          lpad(CAST((doc_id*23)%12 + 1 AS VARCHAR), 2, '0'),
      |          '/202', CAST((doc_id*29)%5 AS VARCHAR))
      |  WHEN (doc_id*13+5)%10 < 8 THEN '31/02/2024' ELSE '' END
      |   AS data_inicial,
      | CASE WHEN (doc_id*31)%2 = 0 THEN '12 meses' ELSE '' END
      |   AS prazo_execucao,
      | CASE WHEN (doc_id*37+2)%3 = 0
      |   THEN 'vedada a utilização em despesas de capital' ELSE '' END
      |   AS vedado_utilizacao,
      | CASE WHEN (doc_id*41+7)%10 < 8 THEN
      |   concat('10.',
      |     list_extract(['301','302','303','304','305','306','122','242'],
      |       CAST((doc_id*43)%8 + 1 AS INT)),
      |     '.0021 R$ ', CAST((doc_id*47)%900000 AS VARCHAR), ',00')
      |  ELSE 'sem dotação' END AS dotacao_orcamentaria,
      | CASE WHEN (doc_id*11+1)%3 = 0 THEN 'Resolução anterior nº 100/2020'
      |  ELSE '' END AS relacionada,
      | substr(text, 1, 120) AS objeto,
      | concat('https://portal-antigo.saude.mg.gov.br/res/',
      |   CAST(doc_id AS VARCHAR)) AS link,
      | CASE WHEN (doc_id*53+1)%4 = 0 THEN '' ELSE 'SES/MG' END
      |   AS abreviacao
      |FROM documents""".stripMargin

  private val normalizedSql =
    s"""SELECT *,
       | coalesce(nullif(trim(numero_resolucao), ''), 'NÃO INFORMADO')
       |   AS nr,
       | coalesce(nullif(trim(data_inicial), ''), 'NÃO INFORMADO') AS di,
       | coalesce(nullif(trim(prazo_execucao), ''), 'NÃO INFORMADO') AS pe,
       | CASE regexp_extract(dotacao_orcamentaria,
       |     '\\b(301|302|303|304|305|306|122|242)\\b', 1)
       |  WHEN '301' THEN 'Atenção Primária'
       |  WHEN '302' THEN 'MAC'
       |  WHEN '303' THEN 'Assistência Farmacêutica'
       |  WHEN '304' THEN 'Vigilância Sanitária'
       |  WHEN '305' THEN 'Vigilância Epidemiológica'
       |  WHEN '306' THEN 'Alimentação e Nutrição'
       |  WHEN '122' THEN 'ADM'
       |  WHEN '242' THEN 'Assist. ao Portador de Deficiência'
       |  ELSE 'NÃO CLASSIFICADO' END AS categoria
       |FROM ($extractionsSql)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q40_report_categories" ->
      s"""SELECT categoria, count(*) AS n,
         | count(*) FILTER (WHERE regexp_matches(nr, '^\\d{1,5}/20\\d{2}$$'))
         |   AS n_valid_res,
         | count(*) FILTER (WHERE
         |   regexp_matches(di, '^\\d{2}/\\d{2}/\\d{4}$$')
         |   AND try_strptime(di, '%d/%m/%Y') IS NOT NULL) AS n_valid_date,
         | count(*) FILTER (WHERE pe = 'NÃO INFORMADO') AS n_missing_prazo
         |FROM ($normalizedSql)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q41_report_quality" ->
      s"""SELECT count(*) AS n_rows,
         | (count(*) FILTER (WHERE nr = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE coalesce(nullif(trim(relacionada),''),
         |      'NÃO INFORMADO') = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE coalesce(nullif(trim(objeto),''),
         |      'NÃO INFORMADO') = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE di = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE pe = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE coalesce(nullif(trim(vedado_utilizacao),
         |      ''), 'NÃO INFORMADO') = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE coalesce(nullif(trim(
         |      dotacao_orcamentaria),''), 'NÃO INFORMADO')='NÃO INFORMADO')
         |  + count(*) FILTER (WHERE coalesce(nullif(trim(link),''),
         |      'NÃO INFORMADO') = 'NÃO INFORMADO')
         |  + count(*) FILTER (WHERE coalesce(nullif(trim(abreviacao),''),
         |      'NÃO INFORMADO') = 'NÃO INFORMADO')) AS sentinel_cells,
         | 0::BIGINT AS empty_rows
         |FROM ($normalizedSql)""".stripMargin
  )
}
