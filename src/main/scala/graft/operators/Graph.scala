package graft.operators

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Per-partition adjacency index for the long-keyed Pregel kernels
    * (graph27/graph30) — GraphX's EdgePartition idea re-expressed
    * minimally: two (three with weights) PRIMITIVE long arrays sorted
    * by source, looked up by binary search + linear walk. Why not a
    * HashMap: an RDD join walks the FULL edge iterator every
    * superstep (O(|edges| x levels) — 144M row visits for 4 levels at
    * sf3), and a boxed HashMap/HashSet index allocates per-row
    * objects for |edges|/P rows in 32 concurrent tasks, which is an
    * allocation failure at sf10 (120M directed edges). Primitive
    * arrays cost exactly the data's bytes, the one sort is in-place,
    * and each later level touches only the frontier's rows. */
  private[operators] final class LongAdj(
      val srcs: Array[Long],
      val dsts: Array[Long],
      val ws: Array[Long] // null when unweighted
  ) extends Serializable {
    /** first index holding src `n`, or -1 */
    @inline def lower(n: Long): Int = {
      var lo = 0; var hi = srcs.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (srcs(mid) < n) lo = mid + 1 else hi = mid
      }
      if (lo < srcs.length && srcs(lo) == n) lo else -1
    }
  }

  private[operators] object LongAdj {
    /** In-place dual/triple-array quicksort by `s` (median-of-3,
      * insertion sort below 16) — no boxing, no permutation array. */
    private def sort(s: Array[Long], d: Array[Long], w: Array[Long]): Unit = {
      @inline def swap(i: Int, j: Int): Unit = {
        val t = s(i); s(i) = s(j); s(j) = t
        val u = d(i); d(i) = d(j); d(j) = u
        if (w != null) { val v = w(i); w(i) = w(j); w(j) = v }
      }
      def qs(lo0: Int, hi0: Int): Unit = {
        var lo = lo0; var hi = hi0
        while (hi - lo > 15) {
          val mid = (lo + hi) >>> 1
          // median-of-3 pivot to s(mid)
          if (s(lo) > s(mid)) swap(lo, mid)
          if (s(lo) > s(hi)) swap(lo, hi)
          if (s(mid) > s(hi)) swap(mid, hi)
          val pivot = s(mid)
          var i = lo; var j = hi
          while (i <= j) {
            while (s(i) < pivot) i += 1
            while (s(j) > pivot) j -= 1
            if (i <= j) { swap(i, j); i += 1; j -= 1 }
          }
          // recurse into the smaller side, loop on the larger
          if (j - lo < hi - i) { qs(lo, j); lo = i }
          else { qs(i, hi); hi = j }
        }
        var i = lo + 1
        while (i <= hi) {
          var j = i
          while (j > lo && s(j - 1) > s(j)) { swap(j - 1, j); j -= 1 }
          i += 1
        }
      }
      if (s.length > 1) qs(0, s.length - 1)
    }

    def build(
        it: Iterator[(Long, Long)],
        weights: Iterator[Long] = null
    ): LongAdj = {
      var cap = 1 << 10
      var n = 0
      var s = new Array[Long](cap); var d = new Array[Long](cap)
      var w: Array[Long] = if (weights != null) new Array[Long](cap) else null
      while (it.hasNext) {
        if (n == cap) {
          cap <<= 1
          s = java.util.Arrays.copyOf(s, cap)
          d = java.util.Arrays.copyOf(d, cap)
          if (w != null) w = java.util.Arrays.copyOf(w, cap)
        }
        val (a, b) = it.next()
        s(n) = a; d(n) = b
        if (w != null) w(n) = weights.next()
        n += 1
      }
      val adj = new LongAdj(
        java.util.Arrays.copyOf(s, n),
        java.util.Arrays.copyOf(d, n),
        if (w != null) java.util.Arrays.copyOf(w, n) else null
      )
      sort(adj.srcs, adj.dsts, adj.ws)
      adj
    }

    /** build from (src, dst, w) triples */
    def buildWeighted(it: Iterator[(Long, (Long, Long))]): LongAdj = {
      var cap = 1 << 10
      var n = 0
      var s = new Array[Long](cap); var d = new Array[Long](cap)
      var w = new Array[Long](cap)
      while (it.hasNext) {
        if (n == cap) {
          cap <<= 1
          s = java.util.Arrays.copyOf(s, cap)
          d = java.util.Arrays.copyOf(d, cap)
          w = java.util.Arrays.copyOf(w, cap)
        }
        val (a, (b, c)) = it.next()
        s(n) = a; d(n) = b; w(n) = c
        n += 1
      }
      val adj = new LongAdj(
        java.util.Arrays.copyOf(s, n),
        java.util.Arrays.copyOf(d, n),
        java.util.Arrays.copyOf(w, n)
      )
      sort(adj.srcs, adj.dsts, adj.ws)
      adj
    }

    /** Dual-array quicksort by (s, d) LEXICOGRAPHIC — the
      * dedupe-ready order buildDistinct needs (the by-s sort above
      * leaves duplicate (s, d) pairs scattered inside a run). */
    private def sortPairs(s: Array[Long], d: Array[Long]): Unit = {
      @inline def lt(i: Int, js: Long, jd: Long): Boolean =
        s(i) < js || (s(i) == js && d(i) < jd)
      @inline def gt(i: Int, js: Long, jd: Long): Boolean =
        s(i) > js || (s(i) == js && d(i) > jd)
      @inline def swap(i: Int, j: Int): Unit = {
        val t = s(i); s(i) = s(j); s(j) = t
        val u = d(i); d(i) = d(j); d(j) = u
      }
      def qs(lo0: Int, hi0: Int): Unit = {
        var lo = lo0; var hi = hi0
        while (hi - lo > 15) {
          val mid = (lo + hi) >>> 1
          if (gt(lo, s(mid), d(mid))) swap(lo, mid)
          if (gt(lo, s(hi), d(hi))) swap(lo, hi)
          if (gt(mid, s(hi), d(hi))) swap(mid, hi)
          val ps = s(mid); val pd = d(mid)
          var i = lo; var j = hi
          while (i <= j) {
            while (lt(i, ps, pd)) i += 1
            while (gt(j, ps, pd)) j -= 1
            if (i <= j) { swap(i, j); i += 1; j -= 1 }
          }
          if (j - lo < hi - i) { qs(lo, j); lo = i }
          else { qs(i, hi); hi = j }
        }
        var i = lo + 1
        while (i <= hi) {
          var j = i
          while (j > lo && gt(j - 1, s(j), d(j))) { swap(j - 1, j); j -= 1 }
          i += 1
        }
      }
      if (s.length > 1) qs(0, s.length - 1)
    }

    /** build + DISTINCT: sort by (src, dst) and drop adjacent
      * duplicates in place. All copies of a duplicate pair hash to
      * the same src partition, so the per-partition dedupe is global
      * — the SQL `repartition(a, b).distinct()` exchange (and its
      * ~unique-key partial aggregate) lands inside the one index
      * build shuffle, zero extra exchange, zero per-row allocation.
      * For callers whose semantics NEED distinct edges (pagerank's
      * outdeg); the BFS builds stay dedupe-free on purpose (their
      * seen set absorbs duplicates — see the graph27 note). */
    def buildDistinct(it: Iterator[(Long, Long)]): LongAdj = {
      var cap = 1 << 10
      var n = 0
      var s = new Array[Long](cap); var d = new Array[Long](cap)
      while (it.hasNext) {
        if (n == cap) {
          cap <<= 1
          s = java.util.Arrays.copyOf(s, cap)
          d = java.util.Arrays.copyOf(d, cap)
        }
        val (a, b) = it.next()
        s(n) = a; d(n) = b
        n += 1
      }
      s = java.util.Arrays.copyOf(s, n)
      d = java.util.Arrays.copyOf(d, n)
      sortPairs(s, d)
      var m = 0
      var i = 0
      while (i < n) {
        if (m == 0 || s(i) != s(m - 1) || d(i) != d(m - 1)) {
          s(m) = s(i); d(m) = d(i); m += 1
        }
        i += 1
      }
      new LongAdj(
        java.util.Arrays.copyOf(s, m),
        java.util.Arrays.copyOf(d, m),
        null
      )
    }
  }

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
    * pairs reachable in <= maxHops — FRONTIER form, not path
    * enumeration: each hop expands only the pairs FIRST reached at
    * the previous hop, so every (src, dst) pair is expanded exactly
    * once and carries its min hop count by construction (the
    * recursive-CTE replay enumerates paths, whose count compounds per
    * level; BFS per source is what survives big graphs).
    * Shortest-path prefix optimality makes the visited check exact: a
    * min-hop path to `next` extends a min-hop path to `dst`.
    *
    * Pregel-shape kernel (round 14 — graph27's measured lesson
    * applied to the whole closure family: the DataFrame loop paid ~4
    * AQE query-stage materializations per hop for milliseconds of
    * kernel work). Co-partitioned state, two shuffles per hop:
    *   - edges hash-partitioned ONCE by src and deduped narrowly;
    *   - the reached-pair set `all` lives partitioned by (src, dst),
    *     so each hop's candidate pairs shuffle once to the pair
    *     partitioner and the dedupe + visited check run NARROW via
    *     zipPartitions (a per-partition hash set over the slice);
    *   - the next frontier re-keys by dst (the second shuffle) to
    *     meet the edge partitioner for a narrow join.
    * At 100 TB this is GraphX's model: per-partition state slices are
    * |pairs|/P and messages shuffle once per superstep. RDD layer by
    * measurement, not taste — the same queries' DataFrame form was
    * measurably slower at sf0.1 with identical rows (BASELINE round
    * 14 pairs).
    *
    * Null edges (never produced by current callers, but the old
    * DataFrame form tolerated them) pass through as hop-1 rows and
    * never propagate — SQL equi-join semantics preserved. */
  def transitiveClosure(edges0: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges0.sparkSession
    import org.apache.spark.sql.types.{LongType, StringType}
    val sel = edges0.select(col("src"), col("dst"))
    val clean = sel.filter(col("src").isNotNull && col("dst").isNotNull)
    val nullRows = sel
      .filter(col("src").isNull || col("dst").isNull)
      .distinct()
      .withColumn("min_hops", lit(1L))
    import spark.implicits._
    val closed = sel.schema("src").dataType match {
      case LongType =>
        closureKernel[Long](
          clean.queryExecution.toRdd
            .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(1)))),
          maxHops
        ).map { case ((s, d), h) => (s, d, h) }
          .toDF("src", "dst", "min_hops")
      case StringType =>
        closureKernel[String](
          clean.queryExecution.toRdd
            .mapPartitions(it =>
              // toString copies out of the scan's reused buffer
              it.map(r =>
                (r.getUTF8String(0).toString, r.getUTF8String(1).toString))),
          maxHops
        ).map { case ((s, d), h) => (s, d, h) }
          .toDF("src", "dst", "min_hops")
      case other =>
        sys.error(s"transitiveClosure: unsupported key type $other")
    }
    closed.unionAll(nullRows)
  }

  /** The typed closure kernel: returns ((src, dst), min_hops), with
    * the result co-partitioned by pair. Bounded-depth persists per
    * level (recompute protection; RDD lineage grows LINEARLY here —
    * union chains, no plan-doubling — so no checkpoint cadence is
    * needed at the <= 6 hops every caller uses; a deep-loop caller on
    * a real cluster should swap persist for reliable checkpoints).
    *
    * Sizing contract: every caller feeds DIMENSION-SIZED edge sets
    * (ontology is-a stores, supplier-nation hierarchies — thousands
    * to low millions of edges), and the per-partition dedupe below
    * keeps a boxed (K, K) HashSet over |edges|/P rows on that
    * assumption. A FACT-scale closure (120M+ edges — the allocation
    * regime that killed graph27's boxed frontier at sf10) does not
    * belong here: it needs the primitive LongAdj index path the BFS
    * kernels use (bfsKernel/bellmanFordKernel below), which this
    * generic-K kernel deliberately does not reimplement. */
  private def closureKernel[K](
      raw: org.apache.spark.rdd.RDD[(K, K)],
      maxHops: Int
  )(implicit
      kt: scala.reflect.ClassTag[K]
  ): org.apache.spark.rdd.RDD[((K, K), Long)] = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val n = raw.sparkContext.defaultParallelism
    val nodePart = new HashPartitioner(n)
    val pairPart = new HashPartitioner(n)
    val edges: RDD[(K, K)] = raw
      .partitionBy(nodePart)
      .mapPartitions(
        { it =>
          val seen = new java.util.HashSet[(K, K)]()
          it.filter(seen.add)
        },
        preservesPartitioning = true
      )
      .persist(StorageLevel.MEMORY_AND_DISK)
    var all: RDD[((K, K), Long)] = edges
      .map { case (s, d) => ((s, d), 1L) }
      .partitionBy(pairPart)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // frontier keyed by dst (the node partitioner) for the edge join
    var frontier: RDD[(K, K)] =
      all.map { case ((s, d), _) => (d, s) }.partitionBy(nodePart)
    for (h <- 2 to maxHops) {
      val msgs = edges
        .join(frontier) // narrow: both sides on nodePart
        .map { case (_, (next, src)) => ((src, next), h.toLong) }
        .partitionBy(pairPart) // hop shuffle 1: candidates to pair space
      val fresh = msgs
        .zipPartitions(all, preservesPartitioning = true) { (m, a) =>
          val seen = new java.util.HashSet[(K, K)]()
          a.foreach(kv => seen.add(kv._1))
          m.filter(kv => seen.add(kv._1)) // visited check + dedupe
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      all = all.union(fresh) // PartitionerAwareUnionRDD keeps pairPart
      frontier = fresh
        .map { case ((s, d), _) => (d, s) }
        .partitionBy(nodePart) // hop shuffle 2: frontier to node space
    }
    all
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
    // A deliberately PARTIAL predicate (only every third nation) so
    // OPTIONAL has something to be optional about — the analog of the
    // reference ontologies' sparsely-populated annotation properties.
    val nationFlag = lake.nation
      .filter(col("n_nationkey") % 3 === 0)
      .select(
        concat(lit("nat:"), col("n_nationkey")).as("s"),
        lit("flagged").as("p"),
        lit("true").as("o")
      )
    custNation
      .unionAll(nationRegion)
      .unionAll(nationLabel)
      .unionAll(regionLabel)
      .unionAll(nationFlag)
  }

  /** Generic SPARQL basic-graph-pattern matcher — patterns as DATA,
    * not code (the sparql_query.py:89 `run_query` surface: arbitrary
    * (s, p, o) patterns with named variables). Terms starting with
    * `?` are variables; anything else is a constant. Each pattern
    * compiles to one constant-filtered scan of the triple table
    * projected to its variable bindings; patterns then join on their
    * shared variables (a cross join only when a pattern shares no
    * variable — the SPARQL cartesian semantics). A variable repeated
    * WITHIN one pattern becomes an equality filter on that scan.
    *
    * Scale notes: a 100 TB triple store is partitioned by predicate,
    * so a constant-predicate pattern prunes to one partition;
    * `broadcastIdx` marks the patterns known small (label lookups,
    * schema-level predicates) for broadcast joins — the caller-side
    * analog of a SPARQL engine's selectivity-ordered BGP plan. Join
    * order is the caller's pattern order. */
  def bgpMatch(
      triples: DataFrame,
      patterns: Seq[(String, String, String)],
      broadcastIdx: Set[Int] = Set.empty,
      optionalIdx: Set[Int] = Set.empty,
      filterExpr: Option[org.apache.spark.sql.Column] = None,
      maxPathHops: Int = 8
  ): DataFrame = {
    require(patterns.nonEmpty, "BGP needs at least one pattern")
    require(
      !optionalIdx.contains(0),
      "the first pattern anchors the binding set and cannot be OPTIONAL"
    )
    // Constant-filter, repeated-variable-equality and variable
    // projection over an arbitrary (column -> term) binding list —
    // shared by plain triple scans and path-closure frames.
    def bind(df0: DataFrame, terms: Seq[(String, String)]): DataFrame = {
      var df = terms.foldLeft(df0) { case (acc, (c, t)) =>
        if (t.startsWith("?")) acc else acc.filter(col(c) === t)
      }
      val varTerms = terms.filter(_._2.startsWith("?"))
      // Repeated variable within one pattern => equality on the scan.
      varTerms.groupBy(_._2).values.foreach { occ =>
        occ.tail.foreach(o2 => df = df.filter(col(occ.head._1) === col(o2._1)))
      }
      val proj = varTerms
        .map(_._2)
        .distinct
        .map(v => col(varTerms.find(_._2 == v).get._1).as(v.drop(1)))
      df.select(proj: _*)
    }
    def scan(pat: (String, String, String)): DataFrame = pat._2 match {
      // SPARQL property paths as pattern predicates: `p+`/`(p1|p2)+`
      // solutions are the transitive closure over the predicate union
      // (hop bound `maxPathHops`, cycle-safe, same as graph02/08);
      // `p*` unions in SPARQL's ZeroLengthPath (a ground endpoint
      // contributes itself; two variables range over the graph's
      // nodes — subjects ∪ objects); `p?` is the single-hop edge set
      // plus the same zero-length solutions. All bind on (s, o) like
      // any other pattern; path solutions are SETS per the spec,
      // hence the distinct after the zero union.
      // Negated property set `!p` / `!(p1|p2)`: every triple whose
      // predicate is NOT in the set — one NOT IN filter on the scan
      // (bag semantics like a plain pattern; on a predicate-
      // partitioned store this is partition-pruning's complement).
      case p if p.startsWith("!") =>
        val preds = p.drop(1).stripPrefix("(").stripSuffix(")")
          .split('|').toSeq
        bind(
          triples.filter(!col("p").isin(preds: _*)).select(col("s"), col("o")),
          Seq("s" -> pat._1, "o" -> pat._3)
        )
      case p if !p.startsWith("?") &&
          (p.endsWith("+") || p.endsWith("*") || p.endsWith("?")) =>
        val mod = p.last
        val preds = p.dropRight(1).stripPrefix("(").stripSuffix(")")
          .split('|').toSeq
        val step =
          if (mod == '?')
            triples.filter(col("p").isin(preds: _*)).select(col("s"), col("o"))
          else
            propertyPathClosure(triples, preds, maxPathHops)
              .select(col("src").as("s"), col("dst").as("o"))
        val reach =
          if (mod == '+') step
          else {
            val zero =
              if (!pat._1.startsWith("?"))
                triples.sparkSession
                  .range(1)
                  .select(lit(pat._1).as("s"), lit(pat._1).as("o"))
              else if (!pat._3.startsWith("?"))
                triples.sparkSession
                  .range(1)
                  .select(lit(pat._3).as("s"), lit(pat._3).as("o"))
              else {
                val nodes = triples
                  .select(col("s").as("n"))
                  .unionAll(triples.select(col("o").as("n")))
                  .distinct()
                nodes.select(col("n").as("s"), col("n").as("o"))
              }
            zero.unionAll(step).distinct()
          }
        bind(reach, Seq("s" -> pat._1, "o" -> pat._3))
      case _ =>
        bind(triples, Seq("s" -> pat._1, "p" -> pat._2, "o" -> pat._3))
    }
    val matched = patterns.zipWithIndex.tail.foldLeft(scan(patterns.head)) {
      case (acc, (pat, i)) =>
        val f = scan(pat)
        val fb = if (broadcastIdx.contains(i)) broadcast(f) else f
        val shared = acc.columns.intersect(f.columns).toSeq
        if (optionalIdx.contains(i)) {
          // SPARQL OPTIONAL == left outer join of the pattern's
          // bindings: rows keep their solution, unmatched optional
          // variables stay null (sparql_query.py:89 executes the same
          // semantics through oxigraph).
          require(
            shared.nonEmpty,
            s"OPTIONAL pattern $i shares no variable with the preceding group"
          )
          acc.join(fb, shared, "left")
        } else if (shared.nonEmpty) acc.join(fb, shared)
        else acc.crossJoin(fb)
    }
    // SPARQL FILTER over the bound variables (columns named without
    // '?'), applied to the completed group like a HAVING-less WHERE.
    filterExpr.fold(matched)(matched.filter)
  }

  /** SPARQL property path `(p1|p2|…)+` (one-or-more) over a predicate
    * union: every (start, ancestor, min_hops) pair reachable through
    * edges whose predicate is in `preds` — the hierarchy-traversal
    * idiom of the reference's ontology queries (skos:broader+ /
    * rdfs:subClassOf+ in sparql_query.py's query surface). Compiles
    * to the hop-bounded distributed closure (one equi-join per hop,
    * cycle-safe), so the same SPARQL construct that oxigraph walks
    * in-process scales out as joins. */
  def propertyPathClosure(
      triples: DataFrame,
      preds: Seq[String],
      maxHops: Int
  ): DataFrame = {
    val edges = triples
      .filter(col("p").isin(preds: _*))
      .select(col("s").as("src"), col("o").as("dst"))
    transitiveClosure(edges, maxHops)
  }

  /** graph08: `?x (in_nation|in_region)+ ?a` — every node's ancestor
    * set at any depth with the shortest hop count: customers reach
    * their nation (1 hop) and region (2 hops), nations their region
    * (1 hop). The 4-level OpenAlex rollup run as a SPARQL path rather
    * than a fixed join chain. */
  def graph08AncestorPaths(lake: Lake, maxHops: Int = 3): DataFrame =
    propertyPathClosure(triples(lake), Seq("in_nation", "in_region"), maxHops)
      .select(
        col("src").as("start"),
        col("dst").as("ancestor"),
        col("min_hops")
      )
      .orderBy("start", "ancestor")

  /** graph09: the SPARQL surface as TEXT — the reference's actual
    * interface is a query string handed to `run_query(store, query)`
    * (reference: scripts/sparql_query.py:89, prefix injection :52).
    * One string exercises the full supported fragment — PREFIX, a
    * property path `(p1|p2)+`, a plain BGP pattern, OPTIONAL, FILTER,
    * ORDER BY — compiled by [[graft.sparql.Sparql]] into the same
    * bgpMatch plan the hand-built graph07/08 queries use: every
    * (start, ancestor) pair at any depth, the ancestor's label, its
    * sparse `flagged` annotation when present, ASIA pruned. */
  def graph09SparqlText(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """PREFIX p: <in_>
        |SELECT ?c ?anc ?l ?fl
        |WHERE {
        |  ?c (p:nation|p:region)+ ?anc .
        |  ?anc <label> ?l .
        |  OPTIONAL { ?anc <flagged> ?fl } .
        |  FILTER(?l != "ASIA")
        |}
        |ORDER BY ?c ?anc""".stripMargin,
      // The caller picks the hop bound for its hierarchy, like
      // graph08's default: this one is 2 deep (cust→nation→region),
      // and every bound ≥ depth returns identical rows while each
      // excess hop costs a full (empty) join+distinct stage.
      maxPathHops = 3
    )

  /** graph11: SPARQL UNION as TEXT — `{ … } UNION { … }` branches,
    * each compiled to its own bgpMatch plan and combined with BAG
    * semantics (duplicates kept, like real SPARQL union) and
    * null-aligned bindings: `?r` binds only in the first branch, so
    * union rows from the second carry null — the same alignment
    * oxigraph applies. Nations that are in ASIA, together with
    * nations carrying the sparse `flagged` annotation; a flagged
    * ASIA nation appears once per branch. */
  def graph11SparqlUnion(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?x ?l ?r
        |WHERE {
        |  { ?x <in_region> ?r . ?r <label> "ASIA" . ?x <label> ?l }
        |  UNION
        |  { ?x <flagged> "true" . ?x <label> ?l }
        |}
        |ORDER BY ?x ?r""".stripMargin
    )

  /** graph12: SPARQL sequence + inverse property paths as TEXT —
    * `<in_nation>/<in_region>/<label>` walks customer→nation→region→
    * label in ONE predicate position (desugared at parse time into a
    * pattern chain through hidden fresh variables — ordinary joins,
    * no closure needed for a fixed-length path), and `?n ^<in_nation>
    * ?c` binds the same rows as `?c <in_nation> ?n` (endpoint swap).
    * The two idioms a real SKOS/ontology user writes constantly
    * (`skos:broader/skos:prefLabel`, `^skos:narrower`). Per customer:
    * its nation label and region label. */
  def graph12SparqlPathOps(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?c ?nl ?rl
        |WHERE {
        |  ?c <in_nation>/<in_region>/<label> ?rl .
        |  ?n ^<in_nation> ?c .
        |  ?n <label> ?nl
        |}
        |ORDER BY ?c""".stripMargin
    )

  /** graph13: SPARQL VALUES + BIND as TEXT — inline bindings join in
    * as a BROADCAST literal frame (shared var ?l constrains the label
    * scan; at 100 TB the constant table is the canonical broadcast
    * side), and BIND adds a computed column through the FILTER
    * expression language. The reference's oxigraph surface accepts
    * both (arbitrary SPARQL strings, sparql_query.py:89). */
  def graph13SparqlValuesBind(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?n ?l ?ll
        |WHERE {
        |  ?n <label> ?l .
        |  ?n <in_region> ?r .
        |  VALUES ?l { "NATION_2" "NATION_7" "NATION_11" } .
        |  BIND(LCASE(?l) AS ?ll)
        |}
        |ORDER BY ?ll""".stripMargin
    )

  /** graph14: SPARQL MINUS as TEXT — `{ … } MINUS { … }` compiles to
    * a LEFT ANTI join on the branches' shared variables (?n): ASIA
    * nations that do NOT carry the sparse `flagged` annotation. The
    * negation idiom of real ontology queries ("concepts without an
    * exact match"); as an anti join it stays a single shuffle with no
    * subtraction materialization. */
  def graph14SparqlMinus(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?n ?l
        |WHERE {
        |  { ?n <in_region> ?r . ?r <label> "ASIA" . ?n <label> ?l }
        |  MINUS
        |  { ?n <flagged> "true" }
        |}
        |ORDER BY ?n""".stripMargin
    )

  /** graph16: SPARQL CONSTRUCT as TEXT — the third result shape the
    * reference's run_query surface returns (a graph, i.e. a triple
    * set). The template derives a materialized 2-hop shortcut edge
    * and its inverse from the customer→nation→region BGP — the
    * ontology-closure materialization move (build the inferred edge
    * once, query it forever after). Template instantiation is one
    * projection per template triple over the solution frame, a
    * unionAll, and the set-semantics distinct — no extra joins. */
  def graph16SparqlConstruct(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """CONSTRUCT { ?c <in_region> ?r . ?r <has_member> ?c }
        |WHERE { ?c <in_nation> ?n . ?n <in_region> ?r }""".stripMargin
    )

  /** graph17: SPARQL DESCRIBE as TEXT — the node-lookup query form
    * (the reference CLI's obvious exploration verb: every triple a
    * resource participates in, either side). Compiles to one
    * predicate-pushed scan with an isin filter — no join; set
    * semantics like CONSTRUCT. */
  def graph17SparqlDescribe(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(triples(lake), "DESCRIBE <nat:4> <reg:1>")

  /** The triple store as an RDF DATASET: the same synthesized triples
    * tagged with a named graph per predicate family — the reference
    * loads its 13 ontologies into one store as one named graph each
    * and wraps queries in GRAPH clauses (sparql_query.py:52,:60); here
    * the graph boundary falls on predicate families, which is where a
    * graph-partitioned store would shard anyway. A real ingestion tags
    * `g` at load time (one graph per source file). */
  def quads(lake: Lake): DataFrame =
    triples(lake).withColumn(
      "g",
      when(col("p") === "in_nation", lit("graph:people"))
        .when(col("p") === "in_region", lit("graph:topology"))
        .when(col("p") === "label", lit("graph:labels"))
        .otherwise(lit("graph:flags"))
    )

  /** graph18: the SPARQL DATASET surface as TEXT — one query string
    * exercising all three named-graph constructs: a FROM dataset
    * clause scoping the default graph to the topology, a ground
    * `GRAPH <iri>` group pulling labels from the labels graph, and a
    * `GRAPH ?g` group binding the graph that holds each nation's
    * sparse `flagged` annotation. Each GRAPH clause prunes the quad
    * frame to one graph BEFORE matching — on a graph-partitioned
    * store that's partition pruning, not a scan-then-filter. */
  def graph18SparqlGraphs(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      quads(lake),
      // A dataset clause pins the WHOLE dataset (spec §13.2), so the
      // graphs the GRAPH groups touch must be declared FROM NAMED
      // alongside the FROM default graph.
      """SELECT ?n ?name ?g
        |FROM <graph:topology>
        |FROM NAMED <graph:labels>
        |FROM NAMED <graph:flags>
        |WHERE {
        |  ?n <in_region> ?reg .
        |  GRAPH <graph:labels> { ?n <label> ?name } .
        |  GRAPH ?g { ?n <flagged> "true" }
        |}
        |ORDER BY ?n""".stripMargin
    )

  /** graph25: SPARQL FROM NAMED as TEXT — the dataset clause that
    * completes the §13.2 surface: declaring it pins which graphs
    * `GRAPH ?g` may range over, so the any-predicate group below
    * binds solutions from the labels and flags graphs ONLY (people
    * and topology exist in the store but are not named). On a
    * graph-partitioned 100 TB store the named list compiles to an
    * `isin` partition prune, identical to a ground GRAPH IRI. The
    * per-graph counts depend only on the fixed 25-nation/5-region
    * tables, so the result is scale-stable. */
  def graph25SparqlFromNamed(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      quads(lake),
      """SELECT ?g (COUNT(*) AS ?n_triples)
        |FROM NAMED <graph:labels>
        |FROM NAMED <graph:flags>
        |WHERE { GRAPH ?g { ?s ?p2 ?o } }
        |GROUP BY ?g
        |ORDER BY ?g""".stripMargin
    )

  /** graph19: SPARQL FILTER EXISTS / NOT EXISTS as TEXT — the
    * spec's existence test, the OTHER negation idiom next to MINUS
    * (and the one real ontology queries reach for first: "concepts
    * with at least one member", "terms lacking an annotation"). Each
    * group compiles to a LEFT SEMI (anti when negated) join on the
    * shared variable — one shuffle, no per-solution probing, the
    * 100 TB shape of an existence gate. Here: nations outside EUROPE
    * that have at least one customer (EXISTS — semi join against the
    * in_nation scan) and do NOT carry the sparse `flagged`
    * annotation (NOT EXISTS — anti join), with a plain FILTER
    * composing alongside. */
  def graph19SparqlExists(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?n ?l
        |WHERE {
        |  ?n <in_region> ?r .
        |  ?r <label> ?rl .
        |  ?n <label> ?l .
        |  FILTER(?rl != "EUROPE")
        |  FILTER EXISTS { ?c <in_nation> ?n }
        |  FILTER NOT EXISTS { ?n <flagged> "true" }
        |}
        |ORDER BY ?n""".stripMargin
    )

  /** graph20: SPARQL zero-or-more property path as TEXT — `p*` is
    * `p+` unioned with the spec's ZeroLengthPath (every graph node
    * reaches itself), the reflexive-transitive idiom ontology
    * hierarchies actually use (`skos:broader*` = "the concept AND its
    * ancestors" — rdfs/SKOS closures are reflexive). Two-variable
    * zero-length solutions range over the graph's nodes (subjects ∪
    * objects — one linear distinct, no quadratic work); the label
    * join then prunes to labeled nodes, so every nation/region pairs
    * with itself AND nations pair with their region. */
  def graph20SparqlPathStar(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?start ?anc ?l
        |WHERE {
        |  ?start <in_region>* ?anc .
        |  ?anc <label> ?l .
        |}
        |ORDER BY ?start ?anc""".stripMargin
    )

  /** graph21: SPARQL subquery as TEXT — `{ SELECT … GROUP BY … }`
    * inside WHERE, the spec's aggregate-in-pattern construct (§12)
    * and the idiom behind "concepts with more than N members". The
    * subquery evaluates bottom-up against the same store, joins into
    * the outer group on its shared variable, and the outer FILTER
    * reads the aggregate alias — the HAVING idiom without HAVING. At
    * scale this is the pre-aggregate-then-join plan one writes by
    * hand: the count partial-aggregates map-side before the join,
    * never shipping per-customer rows through the label join. */
  def graph21SparqlSubquery(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?nl ?n_customers
        |WHERE {
        |  { SELECT ?n (COUNT(?c) AS ?n_customers)
        |    WHERE { ?c <in_nation> ?n } GROUP BY ?n }
        |  ?n <label> ?nl .
        |  FILTER(?n_customers >= 5)
        |}
        |ORDER BY ?nl""".stripMargin
    )

  /** graph22: SPARQL negated property set as TEXT — `!(p1|p2|…)`
    * matches every triple whose predicate is OUTSIDE the set (SPARQL
    * PathNegatedPropertySet), the "any edge except the boring ones"
    * exploration idiom (e.g. skip rdfs:label/rdf:type when walking an
    * unknown ontology). Compiles to one NOT IN filter on the scan —
    * the complement of predicate partition pruning. Excluding the
    * three annotation predicates leaves exactly the topology edges,
    * which then join to their endpoint labels. */
  def graph22SparqlNegatedProps(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?s ?o ?l
        |WHERE {
        |  ?s !(<in_nation>|<label>|<flagged>) ?o .
        |  ?o <label> ?l .
        |}
        |ORDER BY ?s""".stripMargin
    )

  /** graph23: multi-triple OPTIONAL as TEXT — `OPTIONAL { A . B }`
    * left-joins the A⋈B SOLUTIONS as one unit (SPARQL leftjoin), so
    * the group's bindings are both-or-nothing: a nation that has a
    * label but no `flagged` annotation binds NEITHER here, where two
    * separate OPTIONALs would bind the label alone. That distinction
    * is the whole construct; the plan is the group's inner join
    * feeding one left join — no per-row probing. */
  def graph23SparqlOptionalGroup(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?c ?n ?f ?fl
        |WHERE {
        |  ?c <in_nation> ?n .
        |  OPTIONAL { ?n <flagged> ?f . ?n <label> ?fl }
        |}
        |ORDER BY ?c""".stripMargin
    )

  /** graph28: NESTED OPTIONAL through the text front-end — the
    * recursive LeftJoin tree (round-9 engine addition): every labeled
    * subject, optionally its region hierarchy, and — only inside a
    * successful hierarchy match — optionally the sparse `flagged`
    * annotation. The data exercises all three regimes: region
    * subjects miss the outer group entirely (rl AND fl null,
    * both-or-nothing), unflagged nations bind the outer group but
    * miss the inner one, every-third nations bind both. */
  def graph28SparqlNestedOptional(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?n ?nl ?rl ?fl
        |WHERE {
        |  ?n <label> ?nl .
        |  OPTIONAL { ?n <in_region> ?r . ?r <label> ?rl .
        |             OPTIONAL { ?n <flagged> ?fl } }
        |}
        |ORDER BY ?n""".stripMargin
    )

  /** graph29: VALUES with UNDEF through the text front-end (18.5
    * mapping compatibility, the other round-9 engine addition): one
    * row pins the subject and leaves the label unconstrained, the
    * other pins the label across all subjects — each solution joins
    * every row it is compatible with. */
  def graph29SparqlValuesUndef(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?n ?nl
        |WHERE {
        |  ?n <label> ?nl .
        |  VALUES (?n ?nl) { (<nat:0> UNDEF) (UNDEF "NATION_18") }
        |}
        |ORDER BY ?n ?nl""".stripMargin
    )

  /** graph24: SPARQL HAVING + GROUP_CONCAT through the text
    * front-end — the last two grouped-query constructs the fragment
    * lacked. HAVING's aggregate call is computed as an internal column
    * in the SAME partial-aggregating groupBy (rewritten to a
    * `_having0` reference, filtered, dropped at projection — never a
    * second pass over the store); GROUP_CONCAT sorts each group's
    * values before joining so the string is deterministic under any
    * partitioning (the engine's SAMPLE→min rule). The MIN(?nl)
    * predicate is scale-stable: region→nation labels are fixed at
    * every SF, so the same two regions survive at sf0.001 and sf100. */
  def graph24SparqlHaving(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?rl (COUNT(DISTINCT ?n) AS ?n_nations)
        |       (GROUP_CONCAT(DISTINCT ?nl; SEPARATOR=", ") AS ?nations)
        |WHERE {
        |  ?n <in_region> ?r .
        |  ?r <label> ?rl .
        |  ?n <label> ?nl
        |}
        |GROUP BY ?rl
        |HAVING(MIN(?nl) < "NATION_12")
        |ORDER BY ?rl""".stripMargin
    )

  /** graph15: SPARQL ASK as TEXT — the reference surface's other
    * query form (sparql_query.py's run_query prints `Result: bool`
    * when oxigraph returns one). Two probes in one frame: the sparse
    * `flagged` annotation exists somewhere (true), and a label the
    * store cannot contain (false); limit(1) short-circuits each
    * scan. */
  def graph15SparqlAsk(lake: Lake): DataFrame = {
    val t = triples(lake)
    graft.sparql.Sparql.run(t, """ASK { ?n <flagged> "true" }""")
      .withColumn("probe", lit("has_flagged"))
      .unionAll(
        graft.sparql.Sparql.run(t, """ASK { ?x <label> "NO_SUCH_LABEL" }""")
          .withColumn("probe", lit("impossible_label")))
      .select(col("probe"), col("ask"))
      .orderBy("probe")
  }

  /** graph10: SPARQL aggregation as TEXT — graph04's hand-built
    * count-per-nation expressed as a query string: `GROUP BY` +
    * `(COUNT(DISTINCT ?c) AS ?n_customers)` compile to a plain
    * partial-aggregating groupBy over the BGP join, so the same
    * oracle family checks the aggregate path of the parser. */
  def graph10SparqlAgg(lake: Lake): DataFrame =
    graft.sparql.Sparql.run(
      triples(lake),
      """SELECT ?nl (COUNT(DISTINCT ?c) AS ?n_customers)
        |WHERE {
        |  ?c <in_nation> ?n .
        |  ?n <in_region> ?r .
        |  ?r <label> "ASIA" .
        |  ?n <label> ?nl
        |}
        |GROUP BY ?nl
        |ORDER BY ?nl""".stripMargin
    )

  /** graph26: NUMERIC aggregates over TYPED literals — the one
    * SPARQL-fragment reject a reference corpus could plausibly hit
    * (ontology annotation values like counts and scores are
    * `"5"^^xsd:integer` literals; VERDICT r6 #8). The store gains a
    * `balance` predicate whose objects are `"lex"^^xsd:decimal`
    * typed literals built from customer balances; the query SUMs and
    * AVGs them per nation through the text front-end — the engine
    * strips the literal syntax, numeric-guards the cast, and
    * propagates any non-numeric binding as an UNBOUND aggregate (the
    * spec's error semantics, exercised in SparqlSpec). Post-rounds to
    * 4dp for cross-engine float stability. */
  def graph26SparqlNumericAgg(lake: Lake): DataFrame = {
    val bal = lake.customer.select(
      concat(lit("cust:"), col("c_custkey")).as("s"),
      lit("balance").as("p"),
      concat(
        lit("\""), col("c_acctbal").cast("string"),
        lit("\"^^<http://www.w3.org/2001/XMLSchema#decimal>")).as("o")
    )
    graft.sparql.Sparql
      .run(
        triples(lake).unionAll(bal),
        """SELECT ?nl (SUM(?b) AS ?total_bal) (AVG(?b) AS ?avg_bal)
          |       (COUNT(?b) AS ?n_cust)
          |WHERE {
          |  ?c <balance> ?b .
          |  ?c <in_nation> ?n .
          |  ?n <label> ?nl
          |}
          |GROUP BY ?nl
          |ORDER BY ?nl""".stripMargin
      )
      .select(
        col("nl").as("nation"),
        round(col("total_bal"), 4).as("total_bal"),
        round(col("avg_bal"), 4).as("avg_bal"),
        col("n_cust")
      )
  }

  /** graph07: OPTIONAL + FILTER over the triple store — `?n in_region
    * ?r . ?r label ?rl . OPTIONAL { ?n flagged ?fl } . FILTER(?rl !=
    * "ASIA")`. Nations keep their row whether or not the sparse
    * `flagged` annotation exists (left join), and the filter prunes
    * one region's solutions — the two SPARQL constructs the
    * reference's ontology queries use beyond plain BGP. */
  def graph07OptionalFilter(lake: Lake): DataFrame =
    bgpMatch(
      triples(lake),
      Seq(
        ("?n", "in_region", "?r"),
        ("?r", "label", "?rl"),
        ("?n", "flagged", "?fl")
      ),
      broadcastIdx = Set(1, 2),
      optionalIdx = Set(2),
      filterExpr = Some(col("rl") =!= "ASIA")
    )
      .select(col("n").as("nation_iri"), col("rl").as("region_label"), col("fl").as("flagged"))
      .orderBy("nation_iri")

  /** `?c in_nation ?n . ?n in_region ?r . ?r label ?rl` — the original
    * hard-coded 3-pattern query, now expressed through bgpMatch (label
    * and hierarchy patterns broadcast, as before). */
  def graph03TriplePatterns(lake: Lake): DataFrame =
    bgpMatch(
      triples(lake),
      Seq(
        ("?c", "in_nation", "?n"),
        ("?n", "in_region", "?r"),
        ("?r", "label", "?rl")
      ),
      broadcastIdx = Set(1, 2)
    )
      .groupBy(col("rl").as("region_label"))
      .agg(countDistinct(col("c")).as("n_customers"))
      .orderBy("region_label")

  /** Multi-variable BGP with a constant object binding — `?c
    * in_nation ?n . ?n in_region ?r . ?r label "ASIA" . ?n label ?nl`:
    * customers per nation label within one named region. Exercises
    * constant filtering on the OBJECT position and two label patterns
    * over the same variable graph. */
  def graph04BgpNationCounts(lake: Lake): DataFrame =
    bgpMatch(
      triples(lake),
      Seq(
        ("?c", "in_nation", "?n"),
        ("?n", "in_region", "?r"),
        ("?r", "label", "ASIA"),
        ("?n", "label", "?nl")
      ),
      broadcastIdx = Set(1, 2, 3)
    )
      .groupBy(col("nl").as("nation_label"))
      .agg(countDistinct(col("c")).as("n_customers"))
      .orderBy("nation_label")

  /** 4-level hierarchy rollup with per-level subtotals — the
    * reference's actual ontology rollup depth (OpenAlex
    * domain > field > subfield > topic): here the chain is
    * ALL > region > nation > order-priority over the order fact
    * table, with one subtotal row per node at EVERY level (SQL
    * ROLLUP — grouping-set expansion happens map-side as partial
    * aggregates; no extra pass per level). `level` is derived from
    * GROUPING() flags: 0 = grand total ... 3 = leaf.
    *
    * Via the spark.sql surface: the DataFrame rollup + orderBy
    * formulation trips the analyzer's ambiguous-self-join heuristic
    * on the nullable grouping output (same as rel09). */
  def graph05HierarchyRollup4(lake: Lake): DataFrame = {
    lake.registerViews()
    lake.spark.sql(
      """SELECT
        |  CAST(3 - GROUPING(r_name) - GROUPING(n_name)
        |         - GROUPING(o_orderpriority) AS BIGINT) AS level,
        |  COALESCE(r_name, 'ALL') AS region,
        |  COALESCE(n_name, 'ALL') AS nation,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 4) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name, o_orderpriority)
        |ORDER BY level, region, nation, priority""".stripMargin
    )
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

  /** PageRank in fixed-point integer arithmetic: ranks are "micros"
    * (total mass 10^12 split over N nodes), contributions use integer
    * division, and the damping mix is (15·base + 85·Σ) div 100 — every
    * engine computes bit-identical ranks in ANY aggregation order, so
    * an iterative float algorithm becomes oracle-exact. (Float
    * PageRank sums partial contributions in shuffle order; 5 nested
    * iterations can amplify last-bit differences into rank flips —
    * integer micros remove the hazard entirely.) The deliberate cost:
    * each division floors, so up to outdeg-1 micros of mass leak per
    * node per iteration — a ~1e-6 relative perturbation, far below
    * rank gaps of interest, and identically reproduced everywhere.
    *
    * Scale: the canonical distributed PageRank loop — per iteration
    * one equi-join of ranks to the (src-partitioned) edge list and one
    * groupBy(dst) sum; localCheckpoint caps lineage growth exactly as
    * in transitiveClosure. Edges live once; degree is precomputed and
    * carried on the edge row so the loop body never re-joins it. */
  /** PRECONDITION: the edge list must be SYMMETRIC (every (u,v) paired
    * with (v,u) — graph06 bidirects its pairs before calling). The node
    * universe is derived from `src` alone and each iteration rebuilds
    * ranks from groupBy(dst), so on a general directed graph sinks
    * would never be ranked and in-degree-0 nodes would drop after the
    * first iteration. On a symmetric graph src-set == dst-set == node
    * set and neither case exists. */
  def pagerankMicro(edges0: DataFrame, iters: Int): DataFrame = {
    val totalMass = 1000000000000L
    // Checkpoint the shared frames ONCE, in dependency order: edges0
    // (often an expensive fact join) feeds deg and the edge join; deg
    // feeds the node count, the rank seed and the edge join. Left
    // unmaterialized, each of those references re-executes the whole
    // upstream pipeline — the first cut of this loop recomputed the
    // edge build ~10x and ran 16 s at sf0.1 vs ~2 s with checkpoints.
    // Degree rides the edge row via a window over the SAME partitioning
    // the edge list already needs — one shuffle, no self-join. (An
    // aggregate-then-broadcast-join variant was measured SLOWER here:
    // the blocking broadcast build costs more than the window's reuse
    // of the single src shuffle.)
    val withDeg = edges0
      .withColumn(
        "outdeg",
        count(lit(1)).over(Window.partitionBy("src"))
      )
      .localCheckpoint()
    val nodes = withDeg.select(col("src").as("node")).distinct().localCheckpoint()
    // |V| is ONE scalar reused by every iteration: counting it on the
    // driver (the count is answered from the checkpointed frame) and
    // folding it into literal per-node/teleport constants deletes the
    // crossJoin(broadcast(nRow)) from the seed AND from all `iters`
    // loop bodies — each of those broadcast builds blocked the driver
    // for a scheduling round-trip. Integer-exact vs the oracle: all
    // operands are positive, so Scala Long division == SQL `div`/`//`.
    val n = nodes.count()
    // Empty graph: no nodes means no ranks — return the empty frame
    // with the loop's schema instead of dividing by zero (advisor r5).
    if (n == 0) return nodes.select(col("node"), lit(0L).as("r"))
    val perNode = totalMass / n
    val teleport = (15L * perNode) / 100L
    // Seed is NOT checkpointed: it is a pure projection of the
    // checkpointed `nodes`, referenced exactly once (iteration 1).
    var ranks = nodes.select(col("node"), lit(perNode).as("r"))
    var prevCkpt: Set[Int] = Set.empty
    var i = 0
    while (i < iters) {
      // No forced broadcast on ranks: at this SF AQE broadcasts the
      // |V|-row side (the edge list never re-shuffles), while on a
      // billion-node graph the same plan degrades to a shuffle join
      // instead of OOMing the driver — the q05 scaling-dim discipline.
      // Damping is folded into the aggregate projection so each
      // iteration is exactly one join stage + one aggregate stage.
      //
      // repartition-BEFORE-aggregate (round 14 — the xref02/q18
      // lesson landing here the hard way): fused with the join, the
      // partial aggregate's per-task hash map sees ~|V|-cardinality
      // dst keys while sharing the stage's memory with the join
      // itself, 32 tasks at once — at sf10 (100M contrib rows, 17M
      // nodes) that stage died AGGREGATE_OUT_OF_MEMORY at 8g and
      // even 16g, and crawled at 24g (198 s, spill-bound).
      // Exchanging the RAW (dst, contrib) rows first bounds each
      // task's aggregate to |V|/P keys (~34 MB): sf10 completes at
      // 8g in ~80 s. The traded map-side compression was ~2x shuffle
      // volume — the memory bound is what survives scale.
      ranks = withDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("contrib"))
        .repartition(col("dst"))
        .groupBy("dst")
        .agg(expr(s"$teleport + (85 * sum(contrib)) div 100").as("r"))
        .withColumnRenamed("dst", "node")
      // Checkpoint every THIRD iterate (and the last). Measured at
      // sf0.1 (min of 5 sweeps each): every-2nd 3.61 s, every-3rd
      // 2.88 s, none-at-all 2.91 s — each checkpoint is a blocking
      // driver job, and the rank lineage grows LINEARLY (one join +
      // one agg per iteration, unlike the closure loop's join+union
      // doubling), so sparse materialization wins. Not zero, though:
      // the cadence caps plan size for arbitrary iteration counts,
      // at the price of one no-op barrier per 3 iterations. Task
      // retries recompute at most back to the previous iteration's
      // shuffle files either way.
      //
      // Release the SUPERSEDED rank checkpoint as soon as the next
      // one is materialized (localCheckpoint is eager): once iterate
      // i is pinned, iterate i-3's blocks are unreachable from any
      // future step. At iters=5 this is measurably neutral (86 vs
      // 93 s sf10, window noise — only two generations ever exist);
      // the point is BOUNDED storage for real centrality runs
      // (20-50 iterations), where waiting on the async ContextCleaner
      // stacks dead rank generations against the live working set.
      // Release ids come from the checkpointed Dataset's own
      // LogicalRDD leaves (Bridge.checkpointRddIds) — never a global
      // keyset diff.
      if (i % 3 == 2 || i == iters - 1) {
        val sc = ranks.sparkSession.sparkContext
        ranks = ranks.localCheckpoint()
        // ids read off the checkpointed Dataset itself (LogicalRDD
        // leaves) — a global keyset diff could capture a concurrent
        // job's RDD in a shared session (advisor round 12)
        val added =
          org.apache.spark.sql.graftbridge.Bridge.checkpointRddIds(ranks)
        prevCkpt.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        prevCkpt = added
      }
      i += 1
    }
    ranks
  }

  /** pagerankMicro's rank recurrence on the co-partitioned primitive
    * kernel (the bfsKernel pattern applied to the iterative-aggregate
    * family's last DataFrame loop). SAME FUNCTION as pagerankMicro —
    * every quantity is integer micro-mass and integer addition is
    * order-independent, so the kernel reproduces the DataFrame loop
    * BIT-FOR-BIT whatever the partitioning (spec-pinned equal at two
    * SFs; contrast the float-sum case, where this rewrite would not
    * be result-stable). Same SYMMETRIC-edges precondition.
    *
    * Why it beats the SQL loop at scale (measured in ProbePagerank):
    *  - the edge side is ONE shuffle total: raw pairs hash-partition
    *    by src and become a per-partition (src, dst)-sorted primitive
    *    index; the caller-side `repartition(a,b).distinct()` exchange
    *    AND the outdeg window shuffle both collapse into the build
    *    (duplicates of a pair land in the same src partition, so the
    *    in-array adjacent dedupe is global; outdeg is the run length,
    *    free from the same sort).
    *  - each iteration is exactly ONE shuffle (reduceByKey on dst):
    *    ranks stay co-partitioned with the index, the contribution
    *    expansion is a narrow zipPartitions (binary search + run
    *    walk, zero allocation per row), and the map-side combiner
    *    both halves the shuffle volume the round-14 repartition fix
    *    traded away AND bounds task memory by spilling
    *    (ExternalAppendOnlyMap) instead of dying — the
    *    AGGREGATE_OUT_OF_MEMORY failure mode of the fused SQL
    *    aggregate cannot occur here.
    *  - no per-iteration AQE stage materializations, no broadcast
    *    builds, no join: the 10-stage SQL loop becomes iters+1
    *    stages.
    * Rank generations are each consumed exactly once (by the next
    * iteration), so none is persisted — every reduceByKey leaves
    * shuffle files that bound task-retry recompute to one iteration,
    * exactly the recovery barrier the SQL loop's checkpoint cadence
    * bought with blocking driver jobs. Only the index persists (it
    * is read every iteration). Deep-loop callers (20-50 iterations)
    * inherit linear lineage growth in the PLAN only; the shuffle
    * barriers keep recovery flat, so no checkpoint cadence is needed
    * at any iters. */
  private[operators] def pagerankKernelMicro(
      spark: org.apache.spark.sql.SparkSession,
      raw: org.apache.spark.rdd.RDD[(Long, Long)],
      iters: Int
  ): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val p = new HashPartitioner(
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    )
    val adj = raw
      .partitionBy(p)
      .mapPartitions(
        it => Iterator.single(LongAdj.buildDistinct(it)),
        preservesPartitioning = true
      )
      .persist(StorageLevel.MEMORY_AND_DISK)
    // |V| = Σ per-partition distinct srcs (each src lives in exactly
    // one partition) — one small job, replacing the SQL nodes.count()
    val n = adj
      .map { a =>
        var c = 0L; var i = 0
        while (i < a.srcs.length) {
          if (i == 0 || a.srcs(i) != a.srcs(i - 1)) c += 1
          i += 1
        }
        c
      }
      .fold(0L)(_ + _)
    import spark.implicits._
    if (n == 0)
      return spark.emptyDataset[(Long, Long)].toDF("node", "r")
    val totalMass = 1000000000000L
    val perNode = totalMass / n
    val teleport = (15L * perNode) / 100L
    // seed narrowly off the index's own run heads — already
    // partitioned by p, no separate nodes frame, no extra shuffle
    var ranks: org.apache.spark.rdd.RDD[(Long, Long)] = adj
      .mapPartitions(
        { ait =>
          val a = ait.next()
          new Iterator[(Long, Long)] {
            private var i = 0
            def hasNext: Boolean = i < a.srcs.length
            def next(): (Long, Long) = {
              val r = (a.srcs(i), perNode)
              val cur = a.srcs(i)
              while (i < a.srcs.length && a.srcs(i) == cur) i += 1
              r
            }
          }
        },
        preservesPartitioning = true
      )
    var it = 0
    while (it < iters) {
      val msgs = ranks
        .zipPartitions(adj, preservesPartitioning = false) { (rit, ait) =>
          val a = ait.next()
          rit.flatMap { case (node, r) =>
            val i0 = a.lower(node)
            if (i0 < 0) Iterator.empty
            else {
              var i1 = i0
              while (i1 < a.srcs.length && a.srcs(i1) == node) i1 += 1
              val c = r / (i1 - i0) // exact: r div outdeg, run length
              val end = i1
              new Iterator[(Long, Long)] {
                private var k = i0
                def hasNext: Boolean = k < end
                def next(): (Long, Long) = {
                  val t = (a.dsts(k), c); k += 1; t
                }
              }
            }
          }
        }
      ranks = msgs
        .reduceByKey(p, _ + _) // the iteration's ONE shuffle
        .mapValues(s => teleport + (85L * s) / 100L)
      it += 1
    }
    spark.createDataFrame(ranks).toDF("node", "r")
  }

  /** graph06: rank customers and suppliers by PageRank on the
    * bidirected trading graph (distinct customer-supplier pairs from
    * lineitem x orders — the citation-graph centrality analog on the
    * lake's own fact data). 5 iterations, top 20. */
  def graph06Pagerank(lake: Lake, iters: Int = 5, topK: Int = 20): DataFrame = {
    // The loop runs on LONG node ids (customer -> 2k, supplier -> 2k+1),
    // not the display strings: 5 iterations of join+groupBy each hash,
    // shuffle and compare the node key, and an 8-byte long beats a
    // variable-length "c12345" string in every one of those. The
    // 'c'/'s' labels are re-derived once, on the topK output.
    val pairs = lake.lineitem
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(lake.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        expr("o_custkey * 2L").as("a"),
        expr("l_suppkey * 2L + 1L").as("b")
      )
      // repartition-before-distinct (round 14, same memory bound as
      // the rank loop): the distinct's partial aggregate would
      // otherwise share the fact-join stage's memory with ~unique
      // (a, b) keys across 32 concurrent tasks
      .repartition(col("a"), col("b"))
      .distinct()
      // Materialize before bidirecting: the union below references
      // `pairs` twice, and without the checkpoint the fact join +
      // distinct execute once per branch.
      .localCheckpoint()
    val edges = pairs
      .select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    pagerankMicro(edges, iters)
      .select(
        expr(
          "IF(node % 2 = 0, concat('c', node div 2), concat('s', (node - 1) div 2))"
        ).as("node"),
        col("r")
      )
      .orderBy(col("r").desc, col("node"))
      .limit(topK)
      .select(col("node"), col("r").as("rank_micro"))
  }

  /** graph06 on the primitive kernel loop — the SAME function (see
    * pagerankKernelMicro: integer mass ⇒ bit-for-bit equal results,
    * spec-pinned), with the SQL distinct, the outdeg window and the
    * per-iteration join/aggregate stages all gone. The raw bidirected
    * stream feeds the index UN-deduped: duplicates of a pair land in
    * the same src partition and die in the build's adjacent dedupe,
    * and bidirect-then-distinct ≡ distinct-then-bidirect (the two
    * orientations are distinct elements either way). */
  def graph06PagerankKernel(
      lake: Lake,
      iters: Int = 5,
      topK: Int = 20
  ): DataFrame = {
    val raw = lake.lineitem
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(
        lake.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey")
      )
      .select(
        expr("o_custkey * 2L").as("a"),
        expr("l_suppkey * 2L + 1L").as("b")
      )
      .queryExecution
      .toRdd // InternalRow: no Row boxing on the hot scan
      .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(1))))
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
    pagerankKernelMicro(lake.spark, raw, iters)
      .select(
        expr(
          "IF(node % 2 = 0, concat('c', node div 2), concat('s', (node - 1) div 2))"
        ).as("node"),
        col("r")
      )
      .orderBy(col("r").desc, col("node"))
      .limit(topK)
      .select(col("node"), col("r").as("rank_micro"))
  }

  /** graph27: multi-source-capable frontier BFS — hop distances from
    * a seed over the bidirected order↔part co-purchase graph (the
    * "how far is everything from X" traversal the closure can't
    * serve at scale: transitiveClosure materializes ALL-PAIRS
    * reachability — quadratic output — while BFS from a seed set is
    * linear in the visited nodes).
    *
    * Scale shape — the textbook distributed BFS: each level is one
    * frontier ⋈ edges equi-join, a distinct on the expanded
    * neighbors, and a left-anti join against the visited set, so
    * every node is EXPANDED EXACTLY ONCE no matter how many paths
    * reach it (the recursive-CTE replay enumerates paths — their
    * count grows ~30x per level on this graph — which is exactly why
    * the frontier form is the one that survives big graphs).
    * Frontiers are lazily cached per level (see the cache-vs-
    * checkpoint note below); the visited set stays a lazy union of
    * those small cached frames. The loop runs on long
    * node ids (order → 2k, part → 2k+1; graph06's rationale),
    * display strings are derived once on output. */
  def graph27BfsDistances(lake: Lake, maxDepth: Int = 4): DataFrame = {
    // Pregel-shape kernel (round 14, VERDICT r13 #2). The previous
    // DataFrame loop was semantically right but paid ~9 physical
    // stages PER LEVEL once the bench stopped crediting cross-sweep
    // caches: each level's join/distinct/anti-join exchanges plus
    // AQE's per-cache stage-materialization jobs put the sf0.1 run at
    // 37 jobs / 37 stages / 1300 tasks for milliseconds of kernel
    // work (measured, ProbeGraphFloor) — 4.9-5.2 s of pure floors.
    // Tried and refuted on the DataFrame side (ProbeBfsVariants, all
    // sweeps-min at sf0.1): pre-partitioned edge cache 4.0 s,
    // last-two-frontier anti-join 3.9 s, two-hop rounds 5.6 s,
    // parallelismFirst=false 4.1 s, uncached frontiers 11.8 s — the
    // floor is the number of AQE query-stage materializations, which
    // no DataFrame shape can push below ~4/level. The co-partitioned
    // form CAN: it is GraphX's execution model (public Pregel/GraphX
    // design, e.g. org.apache.spark.graphx.Pregel) re-expressed
    // minimally —
    //   - edges hash-partitioned ONCE into a primitive per-partition
    //     adjacency index (LongAdj — see its scaladoc and the
    //     no-dedupe note at the build below);
    //   - each level = exactly ONE shuffle (repartition the expanded
    //     neighbor set by node), then a NARROW zipPartitions against
    //     the co-partitioned visited set does dedupe + anti-join in
    //     one per-partition hash set;
    //   - visited stays co-partitioned via PartitionerAwareUnionRDD,
    //     so no level ever re-exchanges state.
    // Measured: 5.9 -> 1.9 s at sf0.1 (3x, identical rows). At 100 TB
    // the model is exactly GraphX's: per-partition visited slices are
    // |visited|/P, messages shuffle once per superstep, and P scales
    // with the cluster (spark.sql.shuffle.partitions) — this is the
    // one operator family where the declarative form is structurally
    // worse, which is why it drops to the RDD layer (the documented
    // last resort, taken on measurement).
    val spark = lake.spark
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val p = new HashPartitioner(
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    )
    // NO edge dedupe (round-14 sf10 lesson): BFS doesn't need
    // distinct edges — a duplicate (a,b) only re-sends a message the
    // per-level seen set absorbs, and this schema's (order, part)
    // pairs are nearly unique anyway. The SQL distinct costs an extra
    // exchange (measured 2.4 vs 1.9 s at sf0.1), and a per-partition
    // HashSet[(Long,Long)] dedupe allocates boxed tuples for
    // |edges|/P rows x 32 concurrent tasks — an allocation failure at
    // sf10 (120M directed edges). One shuffle into the primitive
    // LongAdj index (see its scaladoc), zero per-row allocation.
    val adj: RDD[LongAdj] = lake.lineitem
      .select(expr("l_orderkey * 2L").as("a"), expr("l_partkey * 2L + 1L").as("b"))
      .queryExecution
      .toRdd // InternalRow: no Row boxing on the hot scan
      .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(1))))
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(p)
      .mapPartitions(it => Iterator.single(LongAdj.build(it)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deterministic seed: the smallest order key. A driver-side
    // 1-row scalar (bounded collect) — parquet aggregate pushdown
    // answers it from footer stats; empty lake ⇒ empty seed ⇒ the
    // BFS degrades to zero rows instead of a null seed (EmptyLakeSpec)
    val seedArr = lake.lineitem
      .agg((min("l_orderkey") * lit(2L)).cast("long").as("node"))
      .filter(col("node").isNotNull)
      .collect()
      .map(_.getLong(0))
    var visited: RDD[(Long, Long)] = spark.sparkContext
      .parallelize(seedArr.map(n => (n, 0L)).toSeq, 1)
      .partitionBy(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier: RDD[(Long, Long)] = visited
    for (d <- 1 to maxDepth) {
      val msgs = frontier
        // narrow: frontier and the index share partitioner p, so the
        // expansion touches ONLY the frontier's adjacency rows
        // (binary search + walk), not the full edge iterator
        .zipPartitions(adj, preservesPartitioning = false) { (fit, ait) =>
          val a = ait.next()
          fit.flatMap { case (n, _) =>
            val i0 = a.lower(n)
            if (i0 < 0) Iterator.empty
            else new Iterator[(Long, Long)] {
              private var i = i0
              def hasNext: Boolean = i < a.srcs.length && a.srcs(i) == n
              def next(): (Long, Long) = { val r = (a.dsts(i), d.toLong); i += 1; r }
            }
          }
        }
        .partitionBy(p) // the level's ONE shuffle
      val next = msgs
        .zipPartitions(visited, preservesPartitioning = true) { (m, vis) =>
          val seen = new java.util.HashSet[Long]()
          vis.foreach(kv => seen.add(kv._1))
          m.filter(kv => seen.add(kv._1)) // anti-join + dedupe in one
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      visited = visited.union(next) // PartitionerAwareUnionRDD keeps p
      frontier = next
    }
    import spark.implicits._
    visited
      .toDF("node", "dist")
      .select(
        expr(
          "IF(node % 2 = 0, concat('ord:', node div 2), concat('prt:', (node - 1) div 2))"
        ).as("node"),
        col("dist")
      )
      .orderBy("dist", "node")
  }

  /** graph30: bounded-hop WEIGHTED shortest paths — graph27's BFS
    * with edge costs (min l_quantity over duplicate order-part
    * edges), i.e. Bellman-Ford relaxation: after k rounds every node
    * holds the cheapest cost over paths of ≤ k edges. Unlike BFS, a
    * node already reached can get CHEAPER on a later round (a long
    * low-weight path beats a short heavy one), so each round relaxes
    * the FULL distance table, not a frontier — the per-round shape
    * is one equi-join on src + one min-groupBy on node, exactly the
    * partitioned-relaxation form a 100 TB edge list distributes
    * (both sides hash on the node key; no frontier bookkeeping
    * state). Hop-bounded like graph02/27: the round count is the
    * contract (k-edge-bounded costs), not a convergence loop.
    *
    * Oracle: the ≤ maxHops-edge paths enumerate exactly as a
    * recursive CTE (hops < maxHops guard, cycles allowed — the hop
    * bound keeps the enumeration finite) folded by MIN per node,
    * which is term-for-term the Bellman-Ford recurrence. */
  def graph30ShortestPaths(lake: Lake, maxHops: Int = 4): DataFrame = {
    // Pregel-shape kernel, graph27's sibling (round 14, VERDICT r13
    // #2 — the DataFrame relaxation loop paid the same per-round
    // AQE stage floors: 26 jobs / 26 stages at sf0.1 for ms of
    // kernel). Same co-partitioned model plus two Bellman-Ford-
    // specific moves:
    //   - raw weighted edges through ONE shuffle into the primitive
    //     LongAdj index (see the no-dedupe note at the build below);
    //   - DELTA relaxation: only nodes whose cost CHANGED last round
    //     send messages — an unchanged node would re-send exactly
    //     what it sent when it last changed and min() already took
    //     it, so the pruning is exact (the classic delta/frontier
    //     Bellman-Ford; round 1's "changed" set is the seed).
    // Measured: 4.6 -> 2.7 s at sf0.1, identical rows. The hop bound
    // stays the contract: after k rounds every node holds the
    // cheapest ≤ k-edge cost (delta pruning does not change this —
    // a cost that would improve at round k comes from a neighbor
    // that changed at round k-1, which is in the changed set).
    val spark = lake.spark
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val p = new HashPartitioner(
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    )
    // NO per-partition min-dedupe map (round-14 sf10 lesson, same as
    // graph27's): duplicate weighted edges only emit duplicate relax
    // messages that the min-merge absorbs, and a HashMap keyed by
    // boxed (Long, Long) tuples for |edges|/P rows x 32 concurrent
    // tasks is an allocation failure at sf10. Raw edges into the
    // primitive LongAdj index — exact result.
    val adj: RDD[LongAdj] = lake.lineitem
      .select(
        expr("l_orderkey * 2L").as("a"),
        expr("l_partkey * 2L + 1L").as("b"),
        col("l_quantity").cast("long").as("w")
      )
      .queryExecution
      .toRdd
      .mapPartitions(it =>
        it.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      .flatMap { case (a, b, w) => Iterator((a, (b, w)), (b, (a, w))) }
      .partitionBy(p)
      .mapPartitions(it => Iterator.single(LongAdj.buildWeighted(it)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedArr = lake.lineitem
      .agg((min("l_orderkey") * lit(2L)).cast("long").as("node"))
      .filter(col("node").isNotNull) // empty lake ⇒ empty result
      .collect()
      .map(_.getLong(0))
    var dist: RDD[(Long, Long)] = spark.sparkContext
      .parallelize(seedArr.map(n => (n, 0L)).toSeq, 1)
      .partitionBy(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed: RDD[(Long, Long)] = dist
    for (_ <- 1 to maxHops) {
      val relaxed = changed
        // narrow: only the changed nodes' adjacency rows are touched
        .zipPartitions(adj, preservesPartitioning = false) { (cit, ait) =>
          val a = ait.next()
          cit.flatMap { case (n, cost) =>
            val i0 = a.lower(n)
            if (i0 < 0) Iterator.empty
            else new Iterator[(Long, Long)] {
              private var i = i0
              def hasNext: Boolean = i < a.srcs.length && a.srcs(i) == n
              def next(): (Long, Long) = {
                val r = (a.dsts(i), cost + a.ws(i)); i += 1; r
              }
            }
          }
        }
        .partitionBy(p) // the round's ONE shuffle
      val merged = dist
        .zipPartitions(relaxed, preservesPartitioning = true) { (dv, rv) =>
          val m = new java.util.HashMap[Long, Long]()
          dv.foreach { case (n, c) => m.put(n, c) }
          val ch = new java.util.HashMap[Long, Long]()
          rv.foreach { case (n, c) =>
            // getOrDefault, not get: a boxed-null get would silently
            // unbox to 0L under Scala's Long auto-unboxing
            val old = m.getOrDefault(n, Long.MaxValue)
            if (c < old) { m.put(n, c); ch.put(n, c) }
          }
          import scala.jdk.CollectionConverters._
          m.entrySet()
            .iterator()
            .asScala
            .map(e => (e.getKey, (e.getValue, ch.containsKey(e.getKey))))
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      dist = merged.mapValues(_._1)
      changed = merged.filter(_._2._2).mapValues(_._1)
    }
    import spark.implicits._
    dist
      .toDF("node", "cost")
      .select(
        expr(
          "IF(node % 2 = 0, concat('ord:', node div 2), concat('prt:', (node - 1) div 2))"
        ).as("node"),
        col("cost")
      )
      .orderBy("node")
  }
}
