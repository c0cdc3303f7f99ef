package graft.sources

/** Shared HepMC3 Asciiv3 test fixture: the standard pp → W(→qq̄)γ example
  * event from the HepMC papers (event 0), plus a second event exercising
  * vertex elision — p2's production vertex is elided (parent = mother
  * particle id 1) and p3 decays at a real vertex fed by p2. Used by both
  * the reader (HepMcSourceSpec) and the writer round-trip
  * (HepMcWriterSpec).
  */
object HepMcFixture {
  val text: String =
    """HepMC::Version 3.02.05
      |HepMC::Asciiv3-START_EVENT_LISTING
      |E 0 4 8
      |U GEV MM
      |W 0.75
      |P 1 0 2212 0.0 0.0 7000.0 7000.0 0.938 4
      |P 2 0 2212 0.0 0.0 -7000.0 7000.0 0.938 4
      |V -1 0 [1]
      |P 3 -1 1 0.75 -1.569 32.191 32.24 0.0 3
      |V -2 0 [2]
      |P 4 -2 -2 -3.047 -19.0 -54.629 57.92 0.0 3
      |V -3 0 [3,4]
      |P 5 -3 22 -3.813 0.113 -1.833 4.233 0.0 1
      |P 6 -3 -24 1.517 -20.68 -20.605 85.925 80.799 3
      |V -4 0 [6]
      |P 7 -4 1 -2.445 28.816 6.082 29.552 0.01 1
      |P 8 -4 -2 3.962 -49.498 -26.687 56.373 0.006 1
      |E 1 1 3
      |U MEV CM
      |W 1.0 2.0
      |P 1 0 11 0.0 0.0 1.0 1.0 0.000511 4
      |P 2 1 22 0.0 0.0 0.5 0.5 0.0 2
      |V -1 0 [2]
      |P 3 -1 11 0.0 0.0 0.25 0.25 0.000511 1
      |HepMC::Asciiv3-END_EVENT_LISTING
      |""".stripMargin
}
