package graft.extract

/** Broadcast-side gazetteer dictionaries for deterministic mention detection.
  *
  * Replaces the reference's LLM entity extraction
  * (ref:src/fancyrag/kg/pipeline.py:665-756, [lib] LLMEntityRelationExtractor)
  * with closed dictionaries + alias tables so the emitted triple set is
  * reproducible and P/R-checkable (SURVEY.md §7.5). Labels follow the closed
  * schema of ref:scripts/config/kg_schema.json:2-21 (+ Person for the sample
  * corpus patterns of ref:sample.txt:1).
  *
  * Each entity is (canonicalName, aliases...). Alias chains are deliberately
  * present (e.g. "ACME" -> "Acme Corporation" -> "Acme Corp") so the
  * canonicalization stage's connected-components fixpoint is genuinely
  * exercised, not just a one-hop lookup.
  */
object Gazetteer {

  /** canonical name -> all surface forms (canonical first). */
  val companies: Seq[Seq[String]] = Seq(
    Seq("Acme Corp", "Acme Corporation", "ACME", "Acme"),
    Seq("Globex", "Globex Inc", "Globex International"),
    Seq("Initech", "Initech LLC"),
    Seq("Umbrella Corp", "Umbrella Corporation", "Umbrella"),
    Seq("Stark Industries", "Stark Ind"),
    Seq("Wayne Enterprises", "Wayne Ent"),
    Seq("Hooli", "Hooli XYZ"),
    Seq("Pied Piper"),
    Seq("Aviato"),
    Seq("Vandelay Industries", "Vandelay"),
    Seq("Wonka Industries", "Wonka"),
    Seq("Duff Brewing", "Duff"),
    Seq("Cyberdyne Systems", "Cyberdyne"),
    Seq("Tyrell Corp", "Tyrell Corporation"),
    Seq("Weyland Yutani", "Weyland-Yutani"),
    Seq("Massive Dynamic"),
    Seq("Oscorp", "Oscorp Industries"),
    Seq("LexCorp"),
    Seq("Gringotts Bank", "Gringotts"),
    Seq("Nakatomi Trading", "Nakatomi"),
    Seq("Blue Sun Corp", "Blue Sun"),
    Seq("Virtucon"),
    Seq("Monsters Inc", "Monsters Incorporated"),
    Seq("Gekko Capital", "Gekko and Co"),
    Seq("Prestige Worldwide"),
    Seq("Dunder Mifflin", "Dunder Mifflin Paper"),
    Seq("Sterling Cooper", "Sterling Cooper Draper"),
    Seq("Bluth Company", "Bluth Co"),
    Seq("Soylent Corp", "Soylent"),
    Seq("InGen", "InGen Bioengineering"),
    Seq("Omni Consumer Products", "OCP"),
    Seq("Rekall"),
    Seq("Zorg Industries", "Zorg"),
    Seq("Wallace Corp", "Wallace Corporation"),
    Seq("Abstergo Industries", "Abstergo"),
    Seq("Aperture Science", "Aperture"),
    Seq("Black Mesa"),
    Seq("Vault Tec", "Vault-Tec"),
    Seq("Arasaka Corp", "Arasaka"),
    Seq("Militech"),
    Seq("Shinra Electric", "Shinra"),
    Seq("Encom", "Encom International"),
    Seq("Setec Astronomy"),
    Seq("Yoyodyne Propulsion", "Yoyodyne"),
    Seq("Clamp Enterprises", "Clamp"),
    Seq("Genco Olive Oil", "Genco"),
    Seq("Sirius Cybernetics", "Sirius Cyber"),
    Seq("MomCorp"),
    Seq("Planet Express"),
    Seq("Octan Corp", "Octan")
  )

  val products: Seq[Seq[String]] = Seq(
    Seq("GraphRAG Pilot", "the Pilot"),
    Seq("HoverBoard X"),
    Seq("Quantum Widget", "Q-Widget"),
    Seq("NeuroLink One"),
    Seq("DataCube Pro"),
    Seq("SkyNet Core"),
    Seq("FluxDrive"),
    Seq("TurboEncabulator"),
    Seq("PivotTable Max"),
    Seq("CloudNine Suite"),
    Seq("EchoSphere"),
    Seq("PhotonPad"),
    Seq("NanoWeave"),
    Seq("HyperLoop Kit"),
    Seq("SmartMirror Duo"),
    Seq("AquaPure Filter"),
    Seq("SolarSail Mini"),
    Seq("MechaSuit Mark II", "MechaSuit MkII"),
    Seq("BioScanner Z"),
    Seq("CryoPod Lite"),
    Seq("WarpCell Battery"),
    Seq("OmniLens"),
    Seq("PulseTracker"),
    Seq("ZeroG Boots"),
    Seq("TerraFormer Unit"),
    Seq("DreamWeaver Band"),
    Seq("SonicBrush Elite"),
    Seq("GigaRouter Ten"),
    Seq("PlasmaForge"),
    Seq("AstroChef Oven"),
    Seq("VoltRunner Bike"),
    Seq("MindMeld Headset"),
    Seq("FusionCore Pack"),
    Seq("RoboVac Prime"),
    Seq("HoloDesk Station"),
    Seq("AeroDrone Four"),
    Seq("DeepScan Sonar"),
    Seq("ChronoWatch"),
    Seq("SpectraCam"),
    Seq("IonShield Case"),
    Seq("GravLift Jack"),
    Seq("NimbusServer Rack"),
    Seq("PolyGlot Translator"),
    Seq("StealthCloak Jacket"),
    Seq("MagLev Skates"),
    Seq("ThermaBrew Mug"),
    Seq("CircuitSage Kit"),
    Seq("PixelPaint Tablet"),
    Seq("VortexFan Pro"),
    Seq("LumenLamp Arc")
  )

  val persons: Seq[Seq[String]] = Seq(
    Seq("Alice Nguyen", "Alice"),
    Seq("Bob Marsh", "Bob"),
    Seq("Carol Danvers"),
    Seq("David Oyelowo"),
    Seq("Erin Brockovich"),
    Seq("Frank Abagnale"),
    Seq("Grace Hopper"),
    Seq("Hank Scorpio"),
    Seq("Ivy Chen"),
    Seq("Jack Donaghy"),
    Seq("Kara Thrace"),
    Seq("Liz Lemon"),
    Seq("Max Rockatansky"),
    Seq("Nina Sharp"),
    Seq("Oscar Martinez"),
    Seq("Pam Beesly"),
    Seq("Quinn Fabray"),
    Seq("Rita Vrataski"),
    Seq("Sam Lowry"),
    Seq("Tina Belcher"),
    Seq("Uma Karuna"),
    Seq("Victor Fries"),
    Seq("Wanda Maximoff"),
    Seq("Xavier Niel"),
    Seq("Yuri Zhivago"),
    Seq("Zoe Washburne"),
    Seq("Ada Lovelace"),
    Seq("Blaise Pascal"),
    Seq("Claude Shannon"),
    Seq("Dennis Ritchie"),
    Seq("Edsger Dijkstra"),
    Seq("Fei Fei Li"),
    Seq("Geoffrey Hinton"),
    Seq("Hedy Lamarr"),
    Seq("Ichiro Suzuki"),
    Seq("Joan Clarke"),
    Seq("Ken Thompson"),
    Seq("Leslie Lamport"),
    Seq("Margaret Hamilton"),
    Seq("Niklaus Wirth")
  )

  val operators: Seq[Seq[String]] = Seq(
    Seq("ingest-bot-01"),
    Seq("ingest-bot-02"),
    Seq("etl-daemon"),
    Seq("crawler-7"),
    Seq("batcher-omega"),
    Seq("loader-alpha"),
    Seq("indexer-prime"),
    Seq("pipeline-runner"),
    Seq("sync-agent"),
    Seq("archivist-9")
  )

  /** canonical name for a surface group. */
  def canonical(group: Seq[String]): String = group.head

  /** (alias, canonicalName, label) rows — the broadcast side of the
    * entity-linking join (SURVEY.md J7/X5).
    */
  lazy val aliasRows: Seq[(String, String, String)] = {
    def rows(groups: Seq[Seq[String]], label: String) =
      groups.flatMap(g => g.map(a => (normalize(a), g.head, label)))
    rows(companies, "Company") ++ rows(products, "Product") ++
      rows(persons, "Person") ++ rows(operators, "Operator")
  }

  /** Same-entity equivalence edges as a CHAIN (a1-a2, a2-a3, ...) rather than
    * a star, so transitive closure is required to recover each group — this is
    * what the canonicalization connected-components fixpoint consumes.
    */
  lazy val aliasChainEdges: Seq[(String, String)] =
    (companies ++ products ++ persons ++ operators).flatMap { g =>
      g.sliding(2).collect { case Seq(a, b) => (normalize(a), normalize(b)) }
    }

  /** Normalization applied to both mention surfaces and alias keys before the
    * linking join: lowercase, collapse whitespace, trim.
    */
  def normalize(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim
}
