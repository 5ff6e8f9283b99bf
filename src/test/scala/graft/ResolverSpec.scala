package graft

import graft.canon.Resolver
import org.scalatest.funsuite.AnyFunSuite

class ResolverSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("connected components resolves transitive chains") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // one chain -> rep "a"
      ("x", "y"), // pair -> rep "x"
      ("z", "z") // singleton
    ).toDF("u", "v")
    val cc = Resolver.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc("a") == "a" && cc("b") == "a" && cc("c") == "a" && cc("d") == "a")
    assert(cc("x") == "x" && cc("y") == "x")
    assert(cc("z") == "z")
  }

  test("connected components is idempotent (resolve(resolve(g)) == resolve(g))") {
    val edges = Seq(("m", "n"), ("n", "o")).toDF("u", "v")
    val once = Resolver.connectedComponents(edges)
    // feeding the output mapping back in as edges must not change anything
    val again = Resolver.connectedComponents(once.toDF("u", "v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val first = once.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(first.forall { case (m, rep) => again(m) == rep })
  }

  test("canonical entity dataset maps every alias of a group to its head") {
    val canon = Resolver.canonicalEntities(spark)
      .collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getString(3)))
      .toMap
    assert(canon("acme") == ("Acme Corp", "Company"))
    assert(canon("acme corporation") == ("Acme Corp", "Company"))
    assert(canon("acme corp") == ("Acme Corp", "Company"))
    assert(canon("the pilot") == ("GraphRAG Pilot", "Product"))
    assert(canon("alice") == ("Alice Nguyen", "Person"))
    assert(canon("etl-daemon") == ("etl-daemon", "Operator"))
  }

  test("alias chains in the gazetteer genuinely need transitive closure") {
    // at least one group has >= 3 surfaces => a chain a-b, b-c with no a-c edge
    assert(graft.extract.Gazetteer.companies.exists(_.size >= 3))
  }

  test("pointer jumping: a 200-node chain converges within the round budget") {
    import spark.implicits._
    // exercises the DISTRIBUTED fixpoint directly (the public entry would
    // take the driver fast path at this size): plain min-label propagation
    // needs O(diameter) = 199 rounds and would exhaust maxIter=50 (and
    // throw); pointer jumping needs O(log d) ~ 9
    val edges = (0 until 199).map(i => (f"n$i%03d", f"n${i + 1}%03d")).toDF("u", "v")
    val cc = graft.canon.Resolver.connectedComponentsDistributed(edges)
    val reps = cc.select("rep").distinct().collect().map(_.getString(0))
    assert(reps.toSeq == Seq("n000"), reps.mkString(","))
    assert(cc.count() == 200)
  }

  test("driver fast path and distributed fixpoint produce identical components") {
    import spark.implicits._
    // mixed shapes: chain, triangle-with-tail, pair, self-loop singleton
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),
      ("p", "q"), ("q", "r"), ("r", "p"), ("r", "s"),
      ("x", "y"), ("z", "z")
    ).toDF("u", "v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val fast = toMap(Resolver.connectedComponents(edges)) // takes driver path
    val dist = toMap(Resolver.connectedComponentsDistributed(edges))
    assert(fast == dist, s"fast=$fast dist=$dist")
  }

  test("distributed fixpoint retains NO persisted RDDs after returning") {
    import spark.implicits._
    val edges = (0 until 120).map(i => (f"c$i%03d", f"c${i + 1}%03d")).toDF("u", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cc = Resolver.connectedComponentsDistributed(edges)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"fixpoint leaked persisted RDDs: $leaked")
    // the returned (reliable-checkpointed) table is still fully usable
    assert(cc.count() == 121)
    assert(cc.agg(org.apache.spark.sql.functions.countDistinct("rep")).head.getLong(0) == 1)
  }

  test("null edge endpoints are dropped, not NPE'd, on both paths") {
    import spark.implicits._
    val edges = Seq(("a", "b"), (null, "c"), ("d", null))
      .toDF("u", "v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(toMap(Resolver.connectedComponents(edges)) == Map("a" -> "a", "b" -> "a"))
  }

  test("cross-path equivalence holds on seeded random graphs") {
    import spark.implicits._
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until n).map { _ =>
        (f"v${rnd.nextInt(25)}%02d", f"v${rnd.nextInt(25)}%02d")
      }.toDF("u", "v")
      val fast = toMap(Resolver.connectedComponents(edges))
      val dist = toMap(Resolver.connectedComponentsDistributed(edges))
      assert(fast == dist, s"seed=$seed diverged: fast=$fast dist=$dist")
    }
  }
}
