package graft.operators

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy / graph operators — the reference's ontology-hierarchy
  * surface (4-level OpenAlex topic rollups, ontology parent-child
  * traversal in sparql_query.py) re-expressed as joins + an
  * iterative fixpoint loop.
  *
  * Scale notes: rollups are broadcast-dim joins; the closure loop is
  * hop-bounded BFS where each iteration is one equi-join shuffled on
  * the frontier key — the standard distributed pattern (no recursion
  * in the engine, the driver only orchestrates plan construction).
  */
object Graph {

  /** Child -> parent -> grandparent rollup with a path label
    * (topic -> subfield -> field style). */
  def graph01HierarchyRollup(lake: Lake): DataFrame =
    lake.customer
      .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(lake.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(
        concat(col("r_name"), lit(" > "), col("n_name")).as("path"),
        col("r_name"),
        col("n_name")
      )
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum("c_acctbal"), 4).as("total_acctbal")
      )
      .orderBy("path")

  /** Generic hop-bounded transitive closure: (src, dst, min_hops)
    * pairs reachable in <= maxHops. Each iteration joins the frontier
    * to the edge list; termination is the hop bound (cycle-safe).
    *
    * Lineage control: iterative DataFrame loops grow the logical plan
    * exponentially (each frontier embeds the previous one twice —
    * join + union), which stalls the optimizer and, at executor
    * level, re-runs every prior hop on a task retry. Past a few hops
    * the frontier is truncated via localCheckpoint, which caps the
    * plan size and the task-retry recompute cost. Tradeoff:
    * localCheckpoint blocks are executor-local and unreplicated, so
    * losing an executor loses the truncated lineage and fails the
    * job — on a real cluster where executor loss is routine, set
    * sparkContext.setCheckpointDir to reliable storage and swap in
    * .checkpoint() for the deep-closure path; local-mode keeps the
    * cheap variant. */
  def transitiveClosure(edges: DataFrame, maxHops: Int): DataFrame = {
    // edges: (src: long, dst: long)
    var frontier = edges.select(
      col("src"),
      col("dst"),
      lit(1L).as("hops")
    )
    var all = frontier
    for (h <- 2 to maxHops) {
      frontier = frontier
        .join(
          edges.select(col("src").as("mid"), col("dst").as("next")),
          col("dst") === col("mid")
        )
        .select(col("src"), col("next").as("dst"), lit(h.toLong).as("hops"))
        .distinct()
      if (h >= 4 && h < maxHops) frontier = frontier.localCheckpoint()
      all = all.unionAll(frontier)
    }
    all.groupBy("src", "dst").agg(min("hops").as("min_hops"))
  }

  /** SPO triple table derived from the star schema — the relational
    * form of the reference's oxigraph store (sparql_query.py). Every
    * row is (subject, predicate, object) with typed-prefix IRIs. */
  def triples(lake: Lake): DataFrame = {
    val custNation = lake.customer.select(
      concat(lit("cust:"), col("c_custkey")).as("s"),
      lit("in_nation").as("p"),
      concat(lit("nat:"), col("c_nationkey")).as("o")
    )
    val nationRegion = lake.nation.select(
      concat(lit("nat:"), col("n_nationkey")).as("s"),
      lit("in_region").as("p"),
      concat(lit("reg:"), col("n_regionkey")).as("o")
    )
    val nationLabel = lake.nation.select(
      concat(lit("nat:"), col("n_nationkey")).as("s"),
      lit("label").as("p"),
      col("n_name").as("o")
    )
    val regionLabel = lake.region.select(
      concat(lit("reg:"), col("r_regionkey")).as("s"),
      lit("label").as("p"),
      col("r_name").as("o")
    )
    custNation.unionAll(nationRegion).unionAll(nationLabel).unionAll(regionLabel)
  }

  /** SPARQL basic-graph-pattern matching as predicate-filtered
    * self-joins over the triple table — the re-expression of
    * `?c in_nation ?n . ?n in_region ?r . ?r label ?rl` (the
    * sparql_query.py query surface; each triple pattern is one
    * filtered scan, each shared variable one equi-join).
    *
    * Scale notes: a 100 TB triple table is stored partitioned by
    * predicate, so each pattern scan prunes to one predicate's
    * partition; join order follows pattern selectivity (labels and
    * schema-level predicates are tiny → broadcast), which is exactly
    * how SPARQL engines plan BGPs. */
  def graph03TriplePatterns(lake: Lake): DataFrame = {
    val t = triples(lake)
    val custOfNation = t
      .filter(col("p") === "in_nation")
      .select(col("s").as("c"), col("o").as("n"))
    val nationOfRegion = t
      .filter(col("p") === "in_region")
      .select(col("s").as("n"), col("o").as("r"))
    val labelOfRegion = t
      .filter(col("p") === "label")
      .select(col("s").as("r"), col("o").as("rl"))
    custOfNation
      .join(broadcast(nationOfRegion), "n")
      .join(broadcast(labelOfRegion), "r")
      .groupBy(col("rl").as("region_label"))
      .agg(countDistinct(col("c")).as("n_customers"))
      .orderBy("region_label")
  }

  /** Closure demo over a deterministic synthetic edge list derived
    * from nation keys (src -> (2*src+7) mod 25) — the recursive-CTE
    * analog, hop-bounded at 4. */
  def graph02TransitiveClosure(lake: Lake): DataFrame = {
    val edges = lake.nation.select(
      col("n_nationkey").cast("long").as("src"),
      pmod(col("n_nationkey") * 2 + 7, lit(25)).cast("long").as("dst")
    )
    transitiveClosure(edges, 4).orderBy("src", "dst")
  }
}
