package graft.model

/** Deterministic 61-hit TDC sample with the reference CSV's schema and
  * value domains (reference `code/test/test_data.csv:1` header; 61 data
  * rows) — same shape and domains, synthesized values. Shared by the
  * golden-fixture tests (TdcSpec) and the declared `q_tdc_occupancy`
  * query, so the driver's DuckDB gate exercises the TDC domain layer on
  * exactly the frame the tests pin.
  */
object TdcFixture {

  /** Orbit ramps over 451 orbits, channels cycle 1..125, FPGA alternates —
    * mirrors the golden sample's observed domains (SURVEY.md §1.2). */
  val hits: Seq[TdcHit] = (0 until 61).map { i =>
    TdcHit(
      HEAD = 2,
      FPGA = i % 2,
      TDC_CHANNEL = 1 + (i * 7) % 125,
      ORBIT_CNT = 2252311494L + (i * 451L) / 61,
      BX_COUNTER = (i * 57) % 3564,
      TDC_MEAS = 1 + i % 30)
  }
}
