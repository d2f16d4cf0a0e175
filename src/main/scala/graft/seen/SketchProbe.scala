package graft.seen

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.BooleanType

/** Shared column-keyed probe for the persisted partition-aligned
  * sketches ([[BloomSeen]], [[CuckooSeen]]).
  *
  * Routing is a `pmod` COLUMN repartition + `mapPartitions`, not a
  * typed `groupByKey`: the grouped shape sort-shuffles every row by a
  * lambda key (per-element encode of the key, sort-based grouping)
  * when all the probe needs is co-location of each pmod group with
  * its one filter file — any order within the task is fine. All rows
  * of one pmod group land in one Spark partition; a task may own
  * several groups (hash-of-group routing), each filter loaded lazily
  * at most once per task. A missing file means the partition holds no
  * keys → definite miss. */
object SketchProbe {

  /** `df` plus a `maybeSeen` boolean column: false is EXACT (no
    * sketch false negatives for inserted keys), true must be
    * confirmed against the exact seen table by the caller. */
  def probeAligned(df: DataFrame, hashCol: String, parts: Int,
      fileFor: Int => Path,
      contains: (Array[Byte], Long) => Boolean): DataFrame = {
    val schema = df.schema.add("maybeSeen", BooleanType, nullable = false)
    val hashIdx = df.schema.fieldIndex(hashCol)
    df.repartition(parts, pmod(col(hashCol), lit(parts.toLong)))
      .mapPartitions { it =>
        // None = file absent (empty partition, definite miss)
        val filters =
          scala.collection.mutable.HashMap.empty[Int, Option[Array[Byte]]]
        it.map { r =>
          val h = r.getLong(hashIdx)
          val part = java.lang.Math.floorMod(h, parts)
          val filter = filters.getOrElseUpdate(part, {
            val f = fileFor(part)
            if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
          })
          Row.fromSeq(r.toSeq :+ filter.exists(contains(_, h)))
        }
      }(Encoders.row(schema))
  }
}
