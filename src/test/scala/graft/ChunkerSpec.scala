package graft

import graft.chunk.Chunker
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {

  /** Seeded ScalaCheck sampling (no scalatestplus bridge in the offline
    * cache): deterministic draws from a Gen.
    */
  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("short text yields one chunk covering everything") {
    val cs = Chunker.split("hello world", 600, 100)
    assert(cs.size == 1)
    assert(cs.head.start == 0 && cs.head.end == 11 && cs.head.text == "hello world")
  }

  test("empty text yields no chunks") {
    assert(Chunker.split("", 600, 100).isEmpty)
  }

  test("text of exactly chunk_size yields one chunk") {
    val t = "a" * 600
    val cs = Chunker.split(t, 600, 100)
    assert(cs.size == 1 && cs.head.text == t)
  }

  test("approximate ends land on word boundaries when possible") {
    val t = ("word " * 300).trim // 1499 chars
    val cs = Chunker.split(t, 600, 100)
    cs.dropRight(1).foreach { c =>
      assert(c.text.last.isWhitespace || !t.charAt(c.end).isLetter,
        s"chunk ${c.index} ends mid-word: ...${c.text.takeRight(10)}")
    }
  }

  test("uid is deterministic and distinct per index") {
    val a = Chunker.chunkUid("conv-1", 0, "xyz")
    assert(a == Chunker.chunkUid("conv-1", 0, "xyz"))
    assert(a != Chunker.chunkUid("conv-1", 1, "xyz"))
    assert(a != Chunker.chunkUid("conv-2", 0, "xyz"))
  }

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 5000)
    cs <- Gen.listOfN(n, Gen.frequency((8, Gen.alphaNumChar), (2, Gen.const(' '))))
  } yield cs.mkString

  test("property: exact mode strides are fixed (start_k = k*(size-overlap))") {
    // kg_chunks' SQL oracle depends on this closed form
    val cases = samples(
      for {
        t <- textGen
        s <- Gen.chooseNum(10, 800)
        o <- Gen.chooseNum(0, 9)
      } yield (t, s, o),
      200)
    cases.foreach { case (text: String, size: Int, ovFrac: Int) =>
      val overlap = math.min(size - 1, ovFrac * size / 10)
      val cs = Chunker.split(text, size, overlap, approximate = false)
      cs.foreach { c =>
        assert(c.start == c.index * (size - overlap), s"stride broken at ${c.index}")
        assert(c.end == math.min(c.start + size, text.length))
        assert(c.text == text.substring(c.start, c.end))
      }
      if (text.nonEmpty) {
        assert(cs.head.start == 0 && cs.last.end == text.length)
        val expected = if (text.length <= size) 1
          else 1 + math.ceil((text.length - size).toDouble / (size - overlap)).toInt
        assert(cs.size == expected, s"len=${text.length} size=$size ov=$overlap got=${cs.size}")
      } else assert(cs.isEmpty)
    }
  }

  test("property: coverage and reconstruction for any text/size/overlap") {
    val cases = samples(
      for {
        t <- textGen
        s <- Gen.chooseNum(10, 800)
        o <- Gen.chooseNum(0, 9)
      } yield (t, s, o),
      200)
    cases.foreach { case (text: String, size: Int, ovFrac: Int) =>
        val overlap = math.min(size - 1, ovFrac * size / 10)
        val cs = Chunker.split(text, size, overlap)
        if (text.isEmpty) assert(cs.isEmpty)
        else {
          assert(cs.head.start == 0)
          assert(cs.last.end == text.length)
          cs.foreach(c => assert(c.text == text.substring(c.start, c.end)))
          // contiguous with overlap: next starts at or before prev end
          cs.sliding(2).foreach {
            case Seq(a, b) =>
              assert(b.start <= a.end && b.start > a.start)
            case _ => ()
          }
          // reconstruction: drop the overlapped prefix of each later chunk
          val rebuilt = new StringBuilder(cs.head.text)
          cs.sliding(2).foreach {
            case Seq(a, b) => rebuilt.append(b.text.substring(a.end - b.start))
            case _ => ()
          }
          assert(rebuilt.toString == text)
        }
    }
  }
}
