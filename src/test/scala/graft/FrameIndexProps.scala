package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.pcapio.FrameIndex

/** Pure pins for the frame-index range math (round 14): the planner
  * trusts [[FrameIndex.ranges]] to PARTITION the file's frame bytes —
  * any gap double-reads nothing but DROPS frames, any overlap
  * double-reads them. The reader-level multiset specs catch this too,
  * but only at the file sizes they generate; the property covers the
  * space.
  */
object FrameIndexProps extends Properties("frame-index") {

  private val genIndex: Gen[FrameIndex.Index] = for {
    stride <- Gen.oneOf(1, 2, 8, 8192)
    nOffs <- Gen.chooseNum(1, 200)
    gaps <- Gen.listOfN(nOffs - 1, Gen.chooseNum(1L, 1000L))
    tailFrames <- Gen.chooseNum(0, stride - 1)
    tailBytes <- Gen.chooseNum(0L, 1000L)
  } yield {
    // offsets strictly increasing from the 24-byte header
    val offs = gaps.scanLeft(graft.pcapio.PcapFramer.LegacyHeaderLen.toLong)(_ + _).toArray
    FrameIndex.Index(
      fileLen = offs.last + 1 + tailBytes,
      frameCount = (nOffs - 1).toLong * stride + 1 + tailFrames,
      stride = stride,
      offsets = offs)
  }

  property("ranges partition [first offset, fileLen) exactly, or refuse") =
    Prop.forAll(genIndex, Gen.chooseNum(1, 64)) { (idx, n) =>
      FrameIndex.ranges(idx, n) match {
        case None =>
          // refusal is only for n too coarse to cut (or n == 1)
          Prop(n <= 1 || idx.offsets.length < n) :| "refused a cuttable index"
        case Some(rs) =>
          val contiguous = rs.sliding(2).forall {
            case Array((_, e1), (s2, _)) => e1 == s2
            case _ => true
          }
          val bounds = rs.head._1 == idx.offsets.head && rs.last._2 == idx.fileLen
          // STRICT: a zero-byte range is an idle shard (round-15 ADVICE —
          // round(target/stride) could duplicate adjacent bounds when n
          // approached offsets.length)
          val monotone = rs.forall { case (s, e) => s < e }
          val aligned = rs.forall { case (s, _) =>
            s == idx.fileLen || idx.offsets.contains(s) }
          Prop(rs.length == n && contiguous && bounds && monotone && aligned) :|
            s"bad ranges for n=$n offsets=${idx.offsets.length}: ${rs.take(4).mkString(",")}"
      }
    }
}
