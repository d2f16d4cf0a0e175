package graft.tmp
object Micro {
  def main(args: Array[String]): Unit = {
    def mkText(id: Long): String = {
      val sb = new StringBuilder(1100)
      var j = 0
      while (j < 60) {
        sb.append(java.lang.Long.toHexString(
          graft.url.Hashing.mix(id * 131L + j, 0x5EED2L))).append(' ')
        j += 1
      }
      sb.toString
    }
    val texts = (0 until 10000).map(i => mkText(i)).toArray
    // warmup
    var s = 0L
    for (i <- 0 until 2000) s += graft.ops.DedupOps.shingles(texts(i), 5).length
    var t0 = System.nanoTime()
    for (t <- texts) s += graft.ops.DedupOps.shingles(t, 5).length
    println(f"[micro] shingles: ${(System.nanoTime()-t0)/1e3/texts.length}%.1f us/doc")
    for (i <- 0 until 2000) s += graft.ops.DedupOps.bandKeys(texts(i), graft.ops.DedupOps.shingles(_, 5), 64, 16).length
    t0 = System.nanoTime()
    for (t <- texts) s += graft.ops.DedupOps.bandKeys(t, graft.ops.DedupOps.shingles(_, 5), 64, 16).length
    println(f"[micro] bandKeys(64): ${(System.nanoTime()-t0)/1e3/texts.length}%.1f us/doc  (sink=$s)")
  }
}
