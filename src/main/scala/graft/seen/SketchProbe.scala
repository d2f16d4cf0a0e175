package graft.seen

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.BooleanType

/** Shared column-keyed probe for the persisted partition-aligned
  * sketches ([[BloomSeen]], [[CuckooSeen]]).
  *
  * Routing is a `pmod` COLUMN repartition + a NATIVE
  * `sortWithinPartitions` on the same key + `mapPartitions`, not a
  * typed `groupByKey`: the grouped shape sort-shuffles every row by a
  * lambda key (per-element encode of the key plus an object sort).
  * The native sort is whole-stage-friendly, spillable, and keys on a
  * single long — and it matters for MEMORY, not just grouping: a task
  * may own several pmod groups (hash-of-group routing), and streaming
  * them in key order means exactly ONE filter is resident per task at
  * any moment. An unsorted map holding every owned filter would pin
  * 2-4 × the per-partition filter size (~GiB each at the 10^10-key
  * design point) and OOM small executors. A missing file means the
  * partition holds no keys → definite miss. */
object SketchProbe {

  /** `df` plus a `maybeSeen` boolean column: false is EXACT (no
    * sketch false negatives for inserted keys), true must be
    * confirmed against the exact seen table by the caller. */
  def probeAligned(df: DataFrame, hashCol: String, parts: Int,
      fileFor: Int => Path,
      contains: (Array[Byte], Long) => Boolean): DataFrame = {
    val schema = df.schema.add("maybeSeen", BooleanType, nullable = false)
    val hashIdx = df.schema.fieldIndex(hashCol)
    val key = pmod(col(hashCol), lit(parts.toLong))
    df.repartition(parts, key)
      .sortWithinPartitions(key)
      .mapPartitions { it =>
        var curPart = -1
        // None = file absent (empty partition, definite miss)
        var filter: Option[Array[Byte]] = None
        it.map { r =>
          val h = r.getLong(hashIdx)
          val part = java.lang.Math.floorMod(h, parts)
          if (part != curPart) {
            curPart = part
            val f = fileFor(part)
            filter =
              if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
          }
          Row.fromSeq(r.toSeq :+ filter.exists(contains(_, h)))
        }
      }(Encoders.row(schema))
  }
}
