package graft.sim

import org.scalatest.funsuite.AnyFunSuite

/** Pins the capped IVF cell-count formula on both sides of the
  * boundary — the r15 sf10 decade sweep measured the uncapped
  * N/250 scaling as a live N²/250 assignment cost (75.7× on 10×
  * data at q_ann_cell_balance), so the cap is the documented bound
  * until hierarchical assignment lands. The DuckDB oracle mirrors
  * the same formula inline (SimQueries.annPairCtes:
  * least(greatest(8, count//250), 2048)). */
class IvfCellCapSpec extends AnyFunSuite {

  test("floor: small corpora get the 8-cell minimum") {
    assert(Similarity.ivfCellCount(0L) === 8L)
    assert(Similarity.ivfCellCount(1999L) === 8L)
    assert(Similarity.ivfCellCount(2000L) === 8L)
  }

  test("scaled region: N/250 between floor and cap") {
    assert(Similarity.ivfCellCount(20000L) === 80L)    // sf1
    assert(Similarity.ivfCellCount(200000L) === 800L)  // sf10 — cap inert
    assert(Similarity.ivfCellCount(511999L) === 2047L)
  }

  test("cap: fires at 250*IvfCellCap and stays flat") {
    assert(Similarity.ivfCellCount(512000L) === Similarity.IvfCellCap)
    assert(Similarity.ivfCellCount(100000000L) === Similarity.IvfCellCap)
  }
}
