package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvDialect

/** S8 dialect cascade: Latin-1 + preamble + `;`, fallback `,`,
  * sniffed separator, raw-line degradation. */
class CsvDialectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-csv")
    val p = dir.resolve(name)
    Files.write(p, content.getBytes("ISO-8859-1"))
    p.toString
  }

  test("primary dialect: latin-1, ';', preamble skipped, accents intact") {
    val path = write("saldo.csv",
      "RELATÓRIO DE SALDOS - MDS\n" +
        "MUNICÍPIO;UF;SALDO\n" +
        "SÃO PAULO;SP;1234,56\n" +
        "BRASÍLIA;DF;789,00\n")
    val df = CsvDialect.read(spark, path)
    assert(df.columns.toSeq === Seq("MUNICÍPIO", "UF", "SALDO"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("SÃO PAULO", "SP"), ("BRASÍLIA", "DF")))
    assert(CsvDialect.recordCount(spark, path) === 2)
  }

  test("fallback to comma when ';' yields one column") {
    val path = write("parcelas.csv",
      "title line\nmun,uf,valor\nA,SP,1\nB,RJ,2\nC,MG,3\n")
    val df = CsvDialect.read(spark, path)
    assert(df.columns.toSeq === Seq("mun", "uf", "valor"))
    assert(df.count() === 3)
  }

  test("sniffed separator when none of the candidates split") {
    val path = write("weird.csv", "skip\na|b|c\n1|2|3\n4|5|6\n")
    val df = CsvDialect.read(spark, path)
    assert(df.columns.toSeq === Seq("a", "b", "c"))
    assert(df.count() === 2)
  }

  test("raw-line degradation for separator-free files") {
    val path = write("plain.txt", "header\njust words here\nand more\n")
    val df = CsvDialect.read(spark, path)
    assert(df.columns.toSeq === Seq("line"))
    assert(df.count() === 2) // preamble skipped, 2 non-empty lines
  }
}
