package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {

  private def pairs(rows: Seq[(Long, String)], d: Int,
                    cap: Long = 0L): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("id", "s")
    EditDistance.edJoin(df, "id", "s", maxDist = d, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  private def naive(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j), m(i)(j - 1)) + 1,
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= d
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
  }

  test("substitution, insertion, deletion and far pairs at d=1") {
    val rows = Seq(1L -> "kitten", 2L -> "mitten", 3L -> "kittens",
      4L -> "kiten", 5L -> "sitting", 6L -> "kitten")
    val out = pairs(rows, 1)
    assert(out == naive(rows, 1))
    // duplicate strings pair at distance 0
    assert(out.contains((1L, 6L, 0L)))
    // sub / append / delete each at distance 1
    assert(out.contains((1L, 2L, 1L)) && out.contains((1L, 3L, 1L)) &&
      out.contains((1L, 4L, 1L)))
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("d=2 deletion neighborhood stays complete vs the naive join") {
    val rows = Seq(1L -> "graft", 2L -> "grft", 3L -> "gra",
      4L -> "craft", 5L -> "crafts", 6L -> "spark", 7L -> "shark",
      8L -> "", 9L -> "a", 10L -> "ab")
    assert(pairs(rows, 2) == naive(rows, 2))
  }

  test("runs of repeated characters collapse, pairs still exact") {
    val rows = Seq(1L -> "aaaa", 2L -> "aaab", 3L -> "aaa",
      4L -> "baaa", 5L -> "bbbb")
    assert(pairs(rows, 1) == naive(rows, 1))
  }

  test("hot-bucket cap suppresses a degenerate constant field") {
    val rows = (1L to 40L).map(_ -> "same") :+ (99L -> "tame")
    // uncapped: 40·39/2 zero-distance pairs + 40 cross pairs
    assert(pairs(rows, 1).size == 820)
    // capped below the hot bucket: the degenerate value drops out
    assert(pairs(rows, 1, cap = 10).isEmpty)
  }

  test("unicode strings measure distance in characters") {
    val rows = Seq(1L -> "café", 2L -> "cafe", 3L -> "caf")
    assert(pairs(rows, 1) == naive(rows, 1))
  }
}
