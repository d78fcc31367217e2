package graft.pipeline
import org.scalatest.funsuite.AnyFunSuite

/** Annex B standard-table domain pins (see Jbig2.stdTableRoundTrip). */
class Jbig2HuffTableSpec extends AnyFunSuite {
  test("standard tables round-trip normal/boundary/escape/OOB values") {
    assert(Jbig2.stdTableRoundTrip())
  }
}
