package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property: arbitrary small cell grids → hand-built BIFF8
  * workbook (SST + LABELSST + NUMBER records inside a CFB mini-stream)
  * → XlsReader → the exact grid back. Deterministic seeds; exercises
  * the reader against WRITER-INDEPENDENT structure (shared-string
  * interning, row/col addressing, number formatting) rather than one
  * fixed fixture.
  */
class XlsRoundTripSpec extends AnyFunSuite {
  import BiffFixture._

  private def forAllN[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val cellValue: Gen[Either[String, Double]] = Gen.oneOf(
    Gen.alphaNumStr.map(s => Left(s.take(10)).withRight[Double]),
    Gen.chooseNum(-1000000, 1000000).map(n => Right(n.toDouble).withLeft[String]),
    Gen.chooseNum(-10000, 10000).map(n => Right(n / 8.0).withLeft[String])) // exact binary fractions

  private val grid: Gen[Map[(Int, Int), Either[String, Double]]] = for {
    n <- Gen.chooseNum(1, 10) // keeps the workbook stream under one mini-stream sector run
    cells <- Gen.listOfN(n, for {
      r <- Gen.chooseNum(0, 20)
      c <- Gen.chooseNum(0, 8)
      v <- cellValue
    } yield (r, c) -> v)
  } yield cells.toMap

  private def buildXls(cells: Map[(Int, Int), Either[String, Double]]): Array[Byte] = {
    def bof(dt: Int) = rec(0x809, new LE().u16(0x0600).u16(dt).u16(0).u16(0).u32(0).u32(0))
    val eof = rec(0x0A, new LE())
    val strings = cells.values.collect { case Left(s) => s }.toSeq.distinct
    val sstIdx = strings.zipWithIndex.toMap
    val sst = rec(0xFC, {
      val l = new LE().u32(strings.size).u32(strings.size)
      strings.foreach(s => l.u16(s.length).u8(0).ascii(s))
      l
    })
    val body = cells.toSeq.sortBy(_._1).map {
      case ((r, c), Left(s)) =>
        rec(0xFD, new LE().u16(r).u16(c).u16(0).u32(sstIdx(s)))
      case ((r, c), Right(d)) =>
        rec(0x203, new LE().u16(r).u16(c).u16(0).f64(d))
    }.foldLeft(Array.emptyByteArray)(_ ++ _)
    val sheet = bof(0x0010) ++ body ++ eof
    def boundsheet(pos: Int) =
      rec(0x85, new LE().u32(pos).u16(0).u8(1).u8(0).ascii("s"))
    def globals(p1: Int) = bof(0x0005) ++ sst ++ boundsheet(p1) ++ eof
    cfb(globals(globals(0).length) ++ sheet)
  }

  test("property: random grids round-trip through BIFF8 bytes") {
    forAllN(grid, 120) { cells =>
      val parsed = XlsReader.parseWorkbook(buildXls(cells))
        .map(c => (c.row, c.col) -> c.value).toMap
      val expected = cells.map {
        case (k, Left(s)) => k -> s
        case (k, Right(d)) => k -> XlsReader.formatNum(d)
      }
      assert(parsed == expected, s"grid ${cells.take(3)}...")
    }
  }
}
