package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Properties of q74's HDR-histogram bin arithmetic — the pure-integer
  * mirror of the SQL both engines run (`16·shift + (v >> shift)` with
  * `shift = max(bitlen(v) - 5, 0)`): binning must be monotone, the
  * reported bucket lower bound must bracket the value within the
  * designed ≤ 1/16 relative width, and the bin id space must stay small
  * enough that a group's counter table is O(100s) of rows whatever the
  * value domain. A divergence here would not fail the oracle gate (both
  * engines would be wrong together) — this pins the MATH.
  */
object SketchProps extends Properties("hdr-sketch") {

  private def bitlen(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  private def bin(v: Long): Long = {
    val shift = math.max(bitlen(v) - 5, 0)
    16L * shift + (v >> shift)
  }

  private def lo(bin: Long): Long = {
    val shift = math.max(bin / 16 - 1, 0L).toInt
    (bin - 16L * shift) << shift
  }

  private val values: Gen[Long] = Gen.oneOf(
    Gen.choose(1L, 1000L),
    Gen.choose(1L, 1L << 30),
    Gen.choose(1L, 1L << 53),
    // power-of-two boundaries ± 1, where shift changes
    Gen.choose(1, 52).map(p => 1L << p).flatMap(p => Gen.oneOf(p - 1, p, p + 1)))

  property("bin is monotone non-decreasing") = forAll(values, values) { (a, b) =>
    val (x, y) = (math.min(a, b), math.max(a, b))
    bin(x) <= bin(y)
  }

  property("bucket lower bound brackets v within 1/16 relative width") =
    forAll(values) { v =>
      val l = lo(bin(v))
      val width = math.max(1L, l / 16)
      Prop(l <= v && v < l + width) :|
        s"v=$v bin=${bin(v)} lo=$l width=$width"
    }

  property("lo is the smallest value mapping to its bin (exact inverse)") =
    forAll(values) { v =>
      val b = bin(v)
      val l = lo(b)
      Prop(bin(l) == b && (l == 1L || bin(l - 1) == b - 1)) :|
        s"v=$v bin=$b lo=$l bin(lo)=${bin(l)}"
    }

  property("bin id space is bounded: 53-bit values use < 800 bins") =
    // 16 sub-buckets × ~49 octaves — the fixed-memory guarantee the
    // sketch's 100 TB story rests on
    Prop(bin((1L << 53) - 1) < 800L && bin(1L) == 1L)
}
