package graft

import graft.catalog.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the BFS-family job-floor audit (VERDICT r13 #2):
  * measures graph27 variants head-to-head in one JVM so the winner is
  * chosen on data, not theory. Variants:
  *   base      — the shipped shape (per-level join+distinct+anti,
  *               plain-cached edges)
  *   prepart   — edges repartition(col("src")).cache() so the
  *               per-level join reuses ONE edges exchange instead of
  *               re-exchanging edges every level
  *   fronttwo  — prepart + anti-join against the last TWO frontiers
  *               only (bidirected graph: a neighbor of a distance-d-1
  *               node is at distance d-2, d-1 or d, so the full
  *               visited union is redundant build-side weight)
  *   twohop    — prepart + two levels expanded per cached round
  *               (halves the cached-frame/job count; the inner
  *               expansion stays deduped so path-count blowup can't
  *               regrow)
  *   noaqe     — base under adaptive.enabled=false (quantifies the
  *               AQE per-stage materialization share of the floor)
  *   parfalse  — base under coalescePartitions.parallelismFirst=false
  *               (quantifies the 32-partitions-per-tiny-shuffle task
  *               floor share)
  *
  * usage: graft.ProbeBfsVariants [variant ...]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS
  */
object ProbeBfsVariants {

  def bfs(
      lake: Lake,
      maxDepth: Int,
      prepart: Boolean,
      frontTwo: Boolean,
      twoHop: Boolean,
      cacheLevels: Boolean = true
  ): DataFrame = {
    val pairs = lake.lineitem
      .select(expr("l_orderkey * 2L").as("a"), expr("l_partkey * 2L + 1L").as("b"))
      .distinct()
      .cache()
    val edges0 = pairs
      .select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
    val edges = if (prepart) edges0.repartition(col("src")).cache() else edges0
    var visited = lake.lineitem
      .agg((min("l_orderkey") * lit(2L)).cast("long").as("node"))
      .select(col("node"), lit(0L).as("dist"))
      .filter(col("node").isNotNull)
      .cache()
    var frontier = visited
    var prev: DataFrame = visited // frontier at d-2 (for frontTwo)
    if (!twoHop) {
      for (d <- 1 to maxDepth) {
        val anti =
          if (frontTwo) prev.select("node").unionAll(frontier.select("node"))
          else visited
        val next0 = frontier
          .join(edges, frontier("node") === edges("src"))
          .select(col("dst").as("node"))
          .distinct()
          .join(anti, Seq("node"), "left_anti")
          .select(col("node"), lit(d.toLong).as("dist"))
        val next = if (cacheLevels) next0.cache() else next0
        prev = frontier
        frontier = next
        visited = visited.unionAll(frontier)
      }
    } else {
      var d = 0
      while (d < maxDepth) {
        val steps = math.min(2, maxDepth - d)
        var expand = frontier
        var level = frontier
        // expand `steps` hops inside one cached round: each hop stays
        // deduped + anti-joined so per-hop work cannot regrow, but
        // only the LAST hop's frame is cached (half the cached-frame
        // materializations).
        val newLevels = (1 to steps).map { s =>
          val anti =
            if (s == 1) prev.select("node").unionAll(level.select("node"))
            else prev.select("node").unionAll(level.select("node"))
          val nxt = expand
            .join(edges, expand("node") === edges("src"))
            .select(col("dst").as("node"))
            .distinct()
            .join(anti, Seq("node"), "left_anti")
            .select(col("node"), lit((d + s).toLong).as("dist"))
          prev = level
          level = nxt
          expand = nxt
          nxt
        }
        // cache ONLY the round's last level: the inner hop's frame is
        // referenced 3x downstream but stays lazy — ReuseExchange/
        // subplan reuse may dedupe it; the probe decides empirically
        // whether fewer cache materializations beat the recompute.
        val cachedLast = newLevels.last.cache()
        val levels =
          if (steps == 2) Seq(newLevels.head, cachedLast)
          else Seq(cachedLast)
        levels.foreach(l => visited = visited.unionAll(l))
        prev = levels.dropRight(1).lastOption.getOrElse(prev)
        frontier = cachedLast
        d += steps
      }
    }
    visited
      .select(
        expr(
          "IF(node % 2 = 0, concat('ord:', node div 2), concat('prt:', (node - 1) div 2))"
        ).as("node"),
        col("dist")
      )
      .orderBy("dist", "node")
  }

  /** Pregel-shape BFS: edges hash-partitioned ONCE and cached; each
    * level is exactly one shuffle (repartition the expanded neighbor
    * set to the node partitioner) — dedupe and the visited anti-join
    * run NARROW via zipPartitions against the co-partitioned visited
    * set, and union keeps the partitioner (PartitionerAwareUnionRDD).
    * Stage count = maxDepth + small constant, vs ~9 stages/level for
    * the DataFrame form under AQE.
    */
  def bfsRdd(lake: Lake, maxDepth: Int, fuseDedup: Boolean): DataFrame = {
    val spark = lake.spark
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val p = new HashPartitioner(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val pairsDf =
      lake.lineitem
        .select(expr("l_orderkey * 2L").as("a"), expr("l_partkey * 2L + 1L").as("b"))
    val pairs = (if (fuseDedup) pairsDf else pairsDf.distinct())
      .queryExecution
      .toRdd
      .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(1))))
    val edges0: RDD[(Long, Long)] = pairs
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(p)
    val edges = (if (fuseDedup)
      edges0.mapPartitions(
        { it =>
          val seen = new java.util.HashSet[(Long, Long)]()
          it.filter(seen.add)
        },
        preservesPartitioning = true
      )
    else edges0)
      .persist(StorageLevel.MEMORY_AND_DISK)
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
      val msgs = edges
        .join(frontier) // narrow: both sides partitioned by p
        .map { case (_, (dst, _)) => (dst, d.toLong) }
        .partitionBy(p) // THE one shuffle of this level
      val next = msgs
        .zipPartitions(visited, preservesPartitioning = true) { (m, vis) =>
          val seen = new java.util.HashSet[Long]()
          vis.foreach(kv => seen.add(kv._1))
          m.filter(kv => seen.add(kv._1))
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

  /** bfsRdd + a PERSISTENT per-partition adjacency index (GraphX's
    * EdgePartition idea): the plain co-partitioned join walks the
    * FULL edge iterator every level (O(|edges|) per superstep — 36M
    * rows x 4 levels at sf3); indexing each edge partition once into
    * a hash map makes every later level O(|frontier|) lookups. */
  def bfsRddIdx(lake: Lake, maxDepth: Int): DataFrame = {
    val spark = lake.spark
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val p = new HashPartitioner(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val idx: RDD[java.util.HashMap[Long, Array[Long]]] = lake.lineitem
      .select(expr("l_orderkey * 2L").as("a"), expr("l_partkey * 2L + 1L").as("b"))
      .queryExecution
      .toRdd
      .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(1))))
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(p)
      .mapPartitions(
        { it =>
          val tmp = new java.util.HashMap[Long, java.util.HashSet[Long]]()
          it.foreach { case (s, d) =>
            tmp.computeIfAbsent(s, _ => new java.util.HashSet[Long]()).add(d)
          }
          val m = new java.util.HashMap[Long, Array[Long]](tmp.size())
          tmp.forEach { (k, v) =>
            val arr = new Array[Long](v.size())
            var i = 0
            val vi = v.iterator()
            while (vi.hasNext) { arr(i) = vi.next(); i += 1 }
            m.put(k, arr)
          }
          Iterator.single(m)
        },
        preservesPartitioning = false
      )
      .persist(StorageLevel.MEMORY_AND_DISK)
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
        .zipPartitions(idx, preservesPartitioning = false) { (fit, iit) =>
          val m = iit.next()
          fit.flatMap { case (n, _) =>
            val nbrs = m.get(n)
            if (nbrs == null) Iterator.empty
            else nbrs.iterator.map(x => (x, d.toLong))
          }
        }
        .partitionBy(p) // the level's ONE shuffle
      val next = msgs
        .zipPartitions(visited, preservesPartitioning = true) { (m, vis) =>
          val seen = new java.util.HashSet[Long]()
          vis.foreach(kv => seen.add(kv._1))
          m.filter(kv => seen.add(kv._1))
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      visited = visited.union(next)
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

  /** Pregel-shape Bellman-Ford (graph30): weighted edges partitioned
    * once; each round is one shuffle (repartition relaxed costs) and
    * a narrow zipPartitions min-merge against the co-partitioned
    * distance table. */
  def spRdd(lake: Lake, maxHops: Int): DataFrame = {
    val spark = lake.spark
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val p = new HashPartitioner(spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val raw = lake.lineitem
      .select(
        expr("l_orderkey * 2L").as("a"),
        expr("l_partkey * 2L + 1L").as("b"),
        col("l_quantity").cast("long").as("w")
      )
      .queryExecution
      .toRdd
      .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    // min-weight dedupe folds into the ONE edge shuffle, per partition
    val edges: RDD[(Long, (Long, Long))] = raw
      .flatMap { case (a, b, w) => Iterator((a, (b, w)), (b, (a, w))) }
      .partitionBy(p)
      .mapPartitions(
        { it =>
          val m = new java.util.HashMap[(Long, Long), Long]()
          it.foreach { case (s, (d, w)) =>
            m.merge((s, d), w, (x, y) => math.min(x, y))
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala.map(e =>
            (e.getKey._1, (e.getKey._2, e.getValue)))
        },
        preservesPartitioning = true
      )
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedArr = lake.lineitem
      .agg((min("l_orderkey") * lit(2L)).cast("long").as("node"))
      .filter(col("node").isNotNull)
      .collect()
      .map(_.getLong(0))
    var dist: RDD[(Long, Long)] = spark.sparkContext
      .parallelize(seedArr.map(n => (n, 0L)).toSeq, 1)
      .partitionBy(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Delta relaxation: only nodes whose cost CHANGED last round send
    // messages (an unchanged node re-sends what it already sent, and
    // min() already took it — exact, classic delta Bellman-Ford).
    var changed: RDD[(Long, Long)] = dist
    for (_ <- 1 to maxHops) {
      val relaxed = edges
        .join(changed) // narrow
        .map { case (_, ((dst, w), cost)) => (dst, cost + w) }
        .partitionBy(p) // the round's one shuffle
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
          m.entrySet().iterator().asScala.map(e =>
            (e.getKey, (e.getValue, ch.containsKey(e.getKey))))
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "3").toInt
    val variants =
      if (args.nonEmpty) args.toSeq
      else Seq("base", "prepart", "fronttwo", "twohop", "noaqe", "parfalse")
    def mkSession(extra: Map[String, String]): SparkSession = {
      var b = GraftSession
        .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      extra.foreach { case (k, v) => b = b.config(k, v) }
      b.getOrCreate()
    }
    // expected rows from the shipped implementation (correctness pin)
    var expected: Seq[String] = null
    for (v <- variants) {
      val extra = v match {
        case "noaqe" | "nocache-noaqe" =>
          Map("spark.sql.adaptive.enabled" -> "false")
        case "parfalse" | "nocache-parfalse" =>
          Map(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false"
          )
        case _ => Map.empty[String, String]
      }
      val spark = mkSession(extra)
      spark.sparkContext.setLogLevel("WARN")
      spark.range(1000).selectExpr("sum(id)").collect()
      val lake = Lake(spark, sfDir)
      val times = (1 to sweeps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        val df = v match {
          case "base" | "noaqe" | "parfalse" =>
            bfs(lake, 4, prepart = false, frontTwo = false, twoHop = false)
          case "prepart" =>
            bfs(lake, 4, prepart = true, frontTwo = false, twoHop = false)
          case "fronttwo" =>
            bfs(lake, 4, prepart = true, frontTwo = true, twoHop = false)
          case "twohop" =>
            bfs(lake, 4, prepart = true, frontTwo = true, twoHop = true)
          case "nocache" | "nocache-noaqe" | "nocache-parfalse" =>
            bfs(lake, 4, prepart = true, frontTwo = true, twoHop = false,
              cacheLevels = false)
          case "nocache-noprepart" =>
            bfs(lake, 4, prepart = false, frontTwo = true, twoHop = false,
              cacheLevels = false)
          case "rdd"      => bfsRdd(lake, 4, fuseDedup = false)
          case "rddfuse"  => bfsRdd(lake, 4, fuseDedup = true)
          case "rddidx"   => bfsRddIdx(lake, 4)
          case "sp-base"  =>
            SparkEntry.queries("graph30_shortest_paths")(spark, sfDir)
          case "sp-rdd"   => spRdd(lake, 4)
        }
        val rows = df.collect().map(_.toString).toSeq
        val sec = (System.nanoTime() - t0) / 1e9
        if (expected == null) expected = rows
        else
          require(
            rows == expected,
            s"$v diverges: ${rows.size} vs ${expected.size} rows"
          )
        sec
      }
      println(
        f"$v%-10s min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}"
      )
      // session confs differ between variants: tear down fully
      if (extra.nonEmpty) { spark.stop(); SparkSession.clearActiveSession() }
    }
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
