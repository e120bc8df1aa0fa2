package graft.sim

import org.scalatest.funsuite.AnyFunSuite

/** Pins the IVF sizing formulas on both sides of every boundary.
  * r15 capped the cell count at 2048 because flat assignment was
  * N·k = N²/250 (the decade sweep measured 75.7× on 10× data at
  * q_ann_cell_balance); r16's two-level assignment makes the cost
  * N·2√k, so the cap retreated to the 2¹⁸ driver-memory bound and a
  * new constant — the flat→hierarchical cutover — carries the
  * tested-SF inertness guarantee instead. The DuckDB oracle mirrors
  * both constants by interpolation (SimQueries.annPairCtes). */
class IvfCellCapSpec extends AnyFunSuite {

  test("floor: small corpora get the 8-cell minimum") {
    assert(Similarity.ivfCellCount(0L) === 8L)
    assert(Similarity.ivfCellCount(1999L) === 8L)
    assert(Similarity.ivfCellCount(2000L) === 8L)
  }

  test("scaled region: N/250 between floor and cap") {
    assert(Similarity.ivfCellCount(20000L) === 80L)    // sf1
    assert(Similarity.ivfCellCount(200000L) === 800L)  // sf10 — cap inert
    assert(Similarity.ivfCellCount(511999L) === 2047L) // old r15 cap point,
    assert(Similarity.ivfCellCount(512000L) === 2048L) // now inside the band
  }

  test("cap: fires at 250*IvfCellCap (the 2^18 driver bound) and stays flat") {
    assert(Similarity.IvfCellCap === 262144L)
    assert(Similarity.ivfCellCount(250L * Similarity.IvfCellCap - 1) ===
      Similarity.IvfCellCap - 1)
    assert(Similarity.ivfCellCount(250L * Similarity.IvfCellCap) ===
      Similarity.IvfCellCap)
    assert(Similarity.ivfCellCount(1000000000L) === Similarity.IvfCellCap)
  }

  test("hier cutover sits strictly between tested-SF k=8 and sf1 k=80") {
    // every tested small SF (N <= 2000) resolves k=8 < cutover => flat
    // assignment, bit-identical artifacts; sf1 (k=80) exercises the
    // two-level path
    assert(Similarity.ivfCellCount(2000L) < Similarity.IvfHierCutover)
    assert(Similarity.ivfCellCount(20000L) >= Similarity.IvfHierCutover)
  }

  test("meta count: ceil(sqrt(k)), exact on squares and off-squares") {
    assert(Similarity.ivfMetaCount(32L) === 6L)
    assert(Similarity.ivfMetaCount(80L) === 9L)     // sf1
    assert(Similarity.ivfMetaCount(800L) === 29L)   // sf10
    assert(Similarity.ivfMetaCount(262144L) === 512L) // perfect square at cap
    assert(Similarity.ivfMetaCount(2048L) === 46L)
  }
}
