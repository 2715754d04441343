package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph operators for corpus curation: centrality-style quality priors
  * over entity/link graphs (the CommonCrawl recipe weights domains by
  * link centrality before sampling). The iterative sibling family of
  * [[Dedup.nearDupComponents]] (components) and
  * [[Similarity.kmeansFit]] (Lloyd) — bounded driver loops over
  * partial-aggregating joins, lineage truncated per round.
  */
object Graph {

  /** One damped PageRank step, INTEGER-EXACT: ranks are scaled longs, the
    * per-edge contribution is `rank DIV outdeg`, and damping is applied as
    * the rational `d = dNum/100`:
    *
    *   rank'(v) = ((100-dNum) * scale) DIV 100
    *            + (dNum * Σ_{u→v} (rank(u) DIV outdeg(u))) DIV 100
    *
    * Floor division everywhere — like [[Corpus.rarityScore]], this trades
    * the float formulation's cross-engine drift for a deterministic
    * contract any engine reproduces bit-for-bit (each step loses < 1 unit
    * of scale per division; at the default scale of 10^6 that is 1e-6 of
    * mass — far below ranking resolution). Dangling nodes (no out-edges)
    * keep the teleport term only, the standard simplification.
    *
    * `edges` must have two columns (src, dst); `ranks` two columns
    * (id, rank_scaled). Start from `uniformRanks`. Returns (id, rank).
    *
    * Scale shape: out-degrees and contributions are partial-aggregating
    * groupBys on node ids; the edge join hashes on src. One shuffle per
    * side — the classic Pregel-free PageRank dataflow. Iterate with
    * `localCheckpoint(true)` between rounds (see nearDupComponents for
    * why lineage must truncate).
    */
  def pagerankStep(edges: DataFrame, ranks: DataFrame, dNum: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(dNum >= 0 && dNum <= 100, s"dNum must be in [0,100], got $dNum")
    require(scale > 0, s"scale must be positive, got $scale")
    require(edges.columns.length == 2, "edges must be exactly (src, dst)")
    require(ranks.columns.length == 2, "ranks must be exactly (id, rank)")
    val e = edges.toDF("src", "dst")
    val r = ranks.toDF("id", "rank")
    val outdeg = e.groupBy("src").agg(count(lit(1)).alias("outdeg"))
    val contrib = e
      .join(outdeg, "src")
      .join(r.withColumnRenamed("id", "src"), "src")
      .select(col("dst").alias("id"), expr("rank DIV outdeg").alias("c"))
      .groupBy("id").agg(sum(col("c")).alias("contrib"))
    val teleport = (100L - dNum) * scale / 100L // exact: positive integer div
    r.select(col("id"))
      .join(contrib, Seq("id"), "left")
      .withColumn("__c", coalesce(col("contrib"), lit(0L)))
      .select(col("id"),
        (lit(teleport) + expr(s"(${dNum}L * __c) DIV 100")).alias("rank"))
  }

  /** Uniform starting ranks: every node gets `scale` (so total mass is
    * n*scale — the unnormalized convention; rankings are scale-invariant).
    */
  def uniformRanks(nodes: DataFrame, scale: Long = 1000000L): DataFrame = {
    require(nodes.columns.length == 1, "nodes must be a single id column")
    nodes.toDF("id").distinct().withColumn("rank", lit(scale))
  }

  /** Iterated [[pagerankStep]] with per-round lineage truncation. Fixed
    * round count (PageRank converges geometrically; 10-20 rounds is the
    * standard production choice — no convergence join needed).
    *
    * `nodes` defaults to the edge endpoints. Pass it explicitly only when
    * isolated nodes (no edges at all) must still receive teleport rank —
    * the default derives endpoints from the CHECKPOINTED edge list, so an
    * expensive edge derivation (a join + distinct over fact tables) is
    * executed once, not re-run per rank-frame reference.
    *
    * `checkpointDir`: rounds localCheckpoint by default (executor-local —
    * lost on executor death at cluster scale); pass a cluster-visible dir
    * for reliable checkpointing on long runs ([[Iterative.truncate]]).
    */
  def pagerank(edges: DataFrame, rounds: Int, dNum: Int = 85,
      scale: Long = 1000000L, nodes: Option[DataFrame] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // The edge list is read every round (contribution join + out-degrees);
    // checkpointing it once materializes whatever derivation produced it
    // instead of re-executing that upstream per round (measured 3x on
    // q100's 3-round run).
    val e = Iterative.truncate(edges.toDF("src", "dst"), checkpointDir)
    val nodeIds = nodes.map(_.toDF("id"))
      .getOrElse(e.select(col("src").alias("id"))
        .union(e.select(col("dst").alias("id"))))
    var r = Iterative.truncate(uniformRanks(nodeIds, scale), checkpointDir)
    (1 to rounds).foreach { _ =>
      r = Iterative.truncate(pagerankStep(e, r, dNum, scale), checkpointDir)
    }
    r
  }

  /** Fixed-round k-core peeling over an undirected edge list (id_a, id_b):
    * each round drops every node whose CURRENT degree is below `k`, then
    * every edge touching a dropped node — the degeneracy-ordering trim that
    * isolates the dense cores of a co-occurrence or near-dup graph (cores
    * are where true duplicate clusters and head entities live; the peeled
    * fringe is the long tail). Removals cascade: a node alive in round 1
    * can starve in round 2 once its fringe neighbors vanish.
    *
    * FIXED `rounds`, not loop-to-convergence — same contract as
    * [[pagerank]]: deterministic cost, and an oracle can replay R rounds
    * as mechanically unrolled SQL. (True k-core = run until a round
    * removes nothing; the spec pins a converged example.) Returns the
    * surviving (id, degree) with degree measured over surviving edges —
    * nodes that would fall in round R+1 report their honest sub-k degree.
    *
    * Scale shape per round: one partial-agg degree groupBy (node-sized)
    * and two semi-join-shaped equi-joins keyed on node ids; lineage
    * truncated per round ([[Iterative.truncate]], localCheckpoint default,
    * reliable `checkpointDir` opt-in).
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(edges.columns.length == 2, "edges must be exactly (id_a, id_b)")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").alias("id")).union(e.select(col("b").alias("id")))
        .groupBy("id").agg(count(lit(1)).alias("degree"))
    var e = Iterative.truncate(edges.toDF("a", "b"), checkpointDir)
    (1 to rounds).foreach { _ =>
      val alive = degrees(e).filter(col("degree") >= k).select("id")
      e = Iterative.truncate(
        e.join(alive.withColumnRenamed("id", "a"), Seq("a"))
          .join(alive.withColumnRenamed("id", "b"), Seq("b"))
          .select("a", "b"), checkpointDir)
    }
    degrees(e)
  }

  /** Borůvka minimum spanning forest over an undirected weighted edge
    * list (a, b, w) — THE distributed MST algorithm (each round every
    * component picks its lightest outgoing edge; components at least
    * halve per round, so rounds ~ log₂ n). Weights are totally ordered
    * by the tuple (w, a, b), which makes the forest UNIQUE — Borůvka
    * here and Kruskal in the oracle provably select the identical edge
    * set, so the driver check verifies the algorithm against an
    * independent one (the q366 discipline).
    *
    * Scale shape per round: one edge relabel join, one per-component
    * partial-agg `min(struct(w, a, b))` (map-side combined — the shuffle
    * carries one candidate per component per partition), and component
    * merging delegated to [[graft.operators.Dedup.nearDupComponents]]
    * over the CHOSEN edges only (a pseudo-forest that shrinks
    * geometrically); lineage truncated per round, reliable
    * `checkpointDir` opt-in. Returns the accepted edges (a, b, w).
    */
  def boruvkaMst(edges: DataFrame, maxRounds: Int = 20,
      checkpointDir: Option[String] = None,
      maxLocalEdges: Long = 4L << 20): DataFrame = {
    // `e` lives at COMPONENT granularity: (ca, cb, w, a, b) with
    // ca < cb the endpoint components and (w, a, b) the original edge.
    // Per unordered component pair only the LIGHTEST edge is kept — by
    // the cut property no other inter-pair edge can ever enter the
    // forest, and the per-component min is unchanged by the pruning, so
    // the edge list shrinks geometrically with the components and no
    // node-level label table (or node-relabel join) is needed at all.
    def contract(df: DataFrame): DataFrame = df
      .groupBy(col("ca"), col("cb"))
      .agg(min(struct(col("w"), col("a"), col("b"))).alias("m"))
      .select(col("ca"), col("cb"), col("m.w").alias("w"),
        col("m.a").alias("a"), col("m.b").alias("b"))
    // null w dropped up front (null ids already die in the a =!= b
    // filter): equi-join semantics on both tiers — the driver Kruskal
    // keys on getLong and must see the same edge set the distributed
    // joins would.
    var e = Iterative.truncate(
      contract(edges.toDF("a", "b", "w")
        .filter(col("a") =!= col("b") && col("w").isNotNull)
        .select(least(col("a"), col("b")).alias("ca"),
          greatest(col("a"), col("b")).alias("cb"),
          col("w"), col("a"), col("b"))), checkpointDir)
    // Hybrid driver path (the bfsDistances/nearDupComponents move): the
    // forest is UNIQUE under the (w, a, b) total order, so Kruskal over
    // the collected edges provably returns Borůvka's exact edge set — the
    // scaladoc's uniqueness argument IS the equivalence proof. Below
    // maxLocalEdges (counted on the materialized contract, which the
    // first distributed round would materialize anyway), one bounded
    // collect + an in-memory sort/union-find replaces ~log n rounds of
    // relabel joins and pointer doubling; corpus-scale graphs keep the
    // distributed rounds, and the spec pins both paths to the same set.
    // Long ids/weights only (the union-find keys on getLong). The
    // plausiblyDriverSized leaf pre-check makes the gate FREE on
    // corpus-scale inputs (no count job at all); driverRowBudget bounds
    // the boxed collect to the actual heap.
    val kruskalBudget = driverRowBudget(maxLocalEdges)
    if (e.schema.drop(2).take(3).forall(_.dataType ==
          org.apache.spark.sql.types.LongType) &&
        plausiblyDriverSized(edges, kruskalBudget) &&
        e.count() <= kruskalBudget) {
      val rows = e.select(col("w"), col("a"), col("b"), col("ca"), col("cb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy { case (w, a, b, _, _) => (w, a, b) }
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) { // path halving
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
        }
        x
      }
      val kept = rows.flatMap { case (w, a, b, ca, cb) =>
        val (ru, rv) = (find(ca), find(cb))
        if (ru == rv) None
        else {
          if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
          Some((a, b, w))
        }
      }
      import edges.sparkSession.implicits._
      return kept.toSeq.toDF("a", "b", "w")
    }
    val accepted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    while (!e.isEmpty) {
      require(round < maxRounds,
        s"boruvkaMst did not converge in $maxRounds rounds")
      // every component with any edge picks its lightest; carrying the
      // far component in the struct makes the chosen frame double as the
      // component-merge graph (no relabel join to recover endpoints)
      val cand = e.select(col("ca").alias("comp"), struct(col("w"),
          col("a"), col("b"), col("cb").alias("other")).alias("m"))
        .union(e.select(col("cb").alias("comp"), struct(col("w"),
          col("a"), col("b"), col("ca").alias("other")).alias("m")))
      val chosen = Iterative.truncate(
        cand.groupBy(col("comp")).agg(min(col("m")).alias("m")),
        checkpointDir)
      // distinct: a mutual-min pair of components chooses the same edge
      accepted += chosen.select(col("m.w").alias("w"),
        col("m.a").alias("a"), col("m.b").alias("b")).distinct()
      // merge the chosen comp-graph (chains are possible — comp1's pick
      // can bridge into comp2 whose pick bridges further). The graph is
      // FUNCTIONAL (every component points at exactly one other, and the
      // only cycles are mutual-min 2-cycles — strictly decreasing (w,a,b)
      // along any longer cycle is impossible), so the merge needs no
      // general components machinery: break each 2-cycle to its min
      // endpoint (roots point at themselves), then pointer-double the
      // resulting FOREST — p ← p∘p reaches every root in ⌈log₂ depth⌉
      // rounds with none of label propagation's side-branch decoys.
      // Labels are canonical-root ids (not component minima) — Borůvka
      // only needs consistency, the accepted edge set is recorded above.
      val p0 = chosen.select(col("comp").alias("id"), col("m.other").alias("p"))
      var p = Iterative.truncate(
        p0.alias("x").join(p0.alias("y"), col("x.p") === col("y.id"))
          .select(col("x.id").alias("id"),
            when(col("y.p") === col("x.id"),
              least(col("x.id"), col("x.p"))).otherwise(col("x.p")).alias("p")),
        checkpointDir)
      var stable = false
      while (!stable) {
        // ONE pointer-doubling join per truncate+stability check. The
        // bfs/dag compose batching was tried and reverted after
        // measurement (q402 distributed MST: composed 8.3-9.1 s vs
        // single-step 7.7-7.9 s): the step is a self-JOIN whose two
        // references to the un-materialized inner step re-execute its
        // shuffle inside the outer job — same lesson as the starPass
        // revert, recompute of shuffle-bearing steps costs more than the
        // driver round it saves.
        val next = Iterative.truncate(
          p.alias("x").join(p.alias("y"), col("x.p") === col("y.id"))
            .select(col("x.id").alias("id"), col("y.p").alias("p"),
              (col("y.p") =!= col("x.p")).alias("chg")),
          checkpointDir)
        stable = next.filter(col("chg")).isEmpty
        p = next.select(col("id"), col("p"))
      }
      val merged = p.select(col("id"), col("p").alias("component_id"))
      e = Iterative.truncate(
        contract(e
          .join(merged.select(col("id").alias("__ca"),
            col("component_id").alias("na")), col("ca") === col("__ca"))
          .join(merged.select(col("id").alias("__cb"),
            col("component_id").alias("nb")), col("cb") === col("__cb"))
          .filter(col("na") =!= col("nb"))
          .select(least(col("na"), col("nb")).alias("ca"),
            greatest(col("na"), col("nb")).alias("cb"),
            col("w"), col("a"), col("b"))), checkpointDir)
      round += 1
    }
    if (accepted.isEmpty)
      edges.toDF("a", "b", "w").select(col("a"), col("b"), col("w")).limit(0)
    else accepted.reduce(_ union _).select(col("a"), col("b"), col("w"))
  }

  /** Fixed-round synchronous label propagation over an undirected edge
    * list (id_a, id_b) — Raghavan et al.'s community detection, the
    * standard first-pass clustering of a similarity/co-occurrence graph
    * (communities in a near-dup pair graph are topical clusters; in a
    * co-purchase graph, product families). Each node starts labeled with
    * its own id; every round ALL nodes simultaneously adopt the most
    * frequent label among their neighbors, ties broken toward the
    * SMALLEST label — fully deterministic, unlike the classic randomized
    * sweep, so an oracle can replay R rounds as mechanically unrolled SQL
    * (the [[pagerank]]/[[kCorePeel]] contract). Differs from
    * [[Dedup.nearDupComponents]]: components connect everything reachable;
    * propagation splits a connected graph into locally-dense regions.
    *
    * Scale shape per round: one edge-keyed equi-join (neighbor label
    * lookup), one (node, label) partial-agg count, one per-node argmax via
    * `min(struct(-count, label))` — no windows, no driver-side state;
    * lineage truncated per round ([[Iterative.truncate]], reliable
    * `checkpointDir` opt-in). Isolated nodes never appear in the edge
    * list and keep their own label by construction of the node set.
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(edges.columns.length == 2, "edges must be exactly (id_a, id_b)")
    val e0 = edges.toDF("a", "b")
    // both directions once, checkpointed: every round re-reads this frame
    val nbrs = Iterative.truncate(
      Relational.bothDirections(e0, "a", "b"), checkpointDir)
    var labels = Iterative.truncate(
      nbrs.select(col("a").alias("id")).distinct()
        .withColumn("label", col("id")), checkpointDir)
    (1 to rounds).foreach { _ =>
      val counted = nbrs
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").alias("id"), col("label"))
        .agg(count(lit(1)).alias("c"))
      labels = Iterative.truncate(
        counted.groupBy("id")
          .agg(min(struct((-col("c")).alias("nc"), col("label"))).alias("m"))
          .select(col("id"), col("m.label").alias("label")), checkpointDir)
    }
    labels
  }

  /** Fixed-round multi-source BFS distances over an undirected edge list
    * (id_a, id_b): hop distance from the NEAREST source, computed as R
    * rounds of frontier relaxation — dist'(v) = min(dist(v),
    * min over neighbors u of dist(u)+1). Returns (id, dist) for nodes
    * REACHED within R hops only (unreached nodes are absent, not
    * sentinel-valued — at 100 TB the reached set is the small output, the
    * complement is not). The graph-proximity feature a curation pipeline
    * derives from seed sets (distance-to-trusted-domain, hops-from-spam) —
    * and FIXED rounds, so the oracle replays R relaxations as unrolled SQL
    * ([[pagerank]]'s contract; BFS needs at most diameter rounds).
    *
    * Scale shape per round: FRONTIER-relaxed — with unit weights a node's
    * distance never improves after its first reach, so only the nodes
    * discovered LAST round need their neighbors expanded: one edge
    * equi-join keyed on the frontier id + one per-node partial-agg min +
    * one anti-join against the settled set. Join input is the frontier
    * (shrinks to zero at the true diameter), not the whole reached set —
    * and an empty frontier ends the loop early (identical answer: no
    * further round can change anything), so R is a CAP, not a cost.
    * Lineage truncated per round ([[Iterative.truncate]]).
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None,
      maxLocalEdges: Long = 4L << 20): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(edges.columns.length == 2, "edges must be exactly (id_a, id_b)")
    require(sources.columns.length == 1, "sources must be a single id column")
    // null endpoints dropped up front: the distributed frontier join
    // would never match them (equi-join semantics), and the local
    // adjacency map must not treat null as a joinable key.
    val e0 = edges.toDF("a", "b")
      .filter(col("a").isNotNull && col("b").isNotNull)
    // Hybrid driver path — nearDupComponents' iterate-until-it-fits
    // pattern, applicable at step 0 because BFS never shrinks its graph:
    // below the driver budget (maxLocalEdges capped by heap, one bounded
    // collect) the level-synchronous multi-source BFS runs in memory,
    // collapsing up to `rounds` driver-loop rounds of fixed
    // job-scheduling cost (measured ~0.3 s/round at sf0.1 — q349's
    // 15-hop horizon spent ~4.5 s on a 12.5k-edge graph) into one
    // collect + milliseconds of adjacency walking. Above the bound, the
    // distributed frontier loop below keeps the shuffle-per-hop shape
    // that scales. Identical contract either way: min hop distance from
    // any source, horizon `rounds`, unreached nodes absent. Requires
    // matching id types (the local map compares boxed values);
    // mixed-type callers fall through to the join path.
    //
    // The gate frame is materialized ONCE and reused: the count used to
    // run on the RAW input — executing the caller's whole upstream
    // lineage for the gate and again when staging nbrs — and it ran
    // unconditionally, so a corpus-scale caller paid a full extra pass
    // just to learn it was too big. Now the free leaf pre-check skips
    // both the checkpoint and the count when the input cannot plausibly
    // fit, and when it can, the materialized frame feeds BOTH the local
    // collect and the distributed nbrs staging.
    val bfsBudget = driverRowBudget(maxLocalEdges)
    val e0m =
      if (plausiblyDriverSized(e0, bfsBudget))
        Some(Iterative.truncate(e0, checkpointDir))
      else None
    if (sources.schema.head.dataType == e0.schema.head.dataType &&
        e0m.exists(_.count() <= bfsBudget)) {
      val t0 = System.nanoTime()
      val adj = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]]()
      e0m.get.collect().foreach { row =>
        val (x, y) = (row.get(0), row.get(1))
        adj.computeIfAbsent(x, _ => scala.collection.mutable.ArrayBuffer.empty) += y
        adj.computeIfAbsent(y, _ => scala.collection.mutable.ArrayBuffer.empty) += x
      }
      val distL = new java.util.LinkedHashMap[Any, Long]()
      var frontier: Seq[Any] =
        sources.toDF("id").distinct().collect().map(_.get(0)).toSeq
      frontier.foreach(distL.put(_, 0L))
      var d = 0L
      while (d < rounds && frontier.nonEmpty) {
        d += 1
        val next = scala.collection.mutable.ArrayBuffer.empty[Any]
        frontier.foreach { u =>
          val ns = adj.get(u)
          if (ns != null) ns.foreach { v =>
            if (!distL.containsKey(v)) { distL.put(v, d); next += v }
          }
        }
        frontier = next.toSeq
      }
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(Seq(
        e0.schema.head.copy(name = "id"),
        org.apache.spark.sql.types.StructField("dist",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val rows = distL.entrySet().asScala.toSeq
        .map(e => org.apache.spark.sql.Row(e.getKey, e.getValue))
      System.err.println(
        f"[bfs] local hops=$d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      return edges.sparkSession.createDataFrame(rows.asJava, schema)
    }
    // pre-partitioned by the per-round join key: the checkpoint preserves
    // outputPartitioning (LogicalRDD carries it), so every round's
    // frontier join reads nbrs exchange-free instead of re-shuffling the
    // full edge list R times — only the (shrinking) frontier moves.
    // eBase: the gate's materialized frame when it exists (sub-budget
    // inputs with a non-matching id type), else the raw input — either
    // way the caller's upstream lineage executes exactly once.
    val eBase = e0m.getOrElse(e0)
    val nbrs = Iterative.truncate(
      Relational.bothDirections(eBase, "a", "b")
        .repartition(col("a")), checkpointDir)
    var dist = Iterative.truncate(
      sources.toDF("id").distinct().withColumn("dist", lit(0L)), checkpointDir)
    var frontier = dist
    var r = 0
    var bfsT0 = System.nanoTime()
    var done = false
    // THREE hops per driver round: on round-dominated graphs (tiny frames,
    // deep structure — q349 runs its full 15-hop horizon) the cost is
    // fixed per-round overhead (one truncate job + one isEmpty job), not
    // data, so batching hops cuts the wall time almost proportionally.
    // Hop h+1 expands hop h's un-materialized fresh set, re-executing the
    // earlier hops' joins inside the same job — the plan deepens
    // geometrically with hops-per-round, which is why this stops at 3:
    // cheap exactly when rounds dominate, and bounded when they don't.
    // Correctness is plain frontier BFS: every expansion is anti-joined
    // against known dists and the union takes min(dist), so a node
    // reached at several hops keeps the shortest distance, and a mixed-
    // depth frontier only ever relaxes edges forward.
    while (r < rounds && !done) {
      def expand(f: DataFrame): DataFrame = nbrs
        .join(f.withColumnRenamed("id", "a"), Seq("a"))
        .groupBy(col("b").alias("id"))
        .agg(min(col("dist") + 1L).alias("dist"))
        .join(dist, Seq("id"), "left_anti")
      // ONE count job per round on the materialized frontier: it is both
      // the ADAPTIVE batching gate (hop h+1 re-executes hop h's joins
      // inside the same job, so batching only pays while ROUNDS dominate —
      // on a fat frontier the recompute would multiply the expansion work
      // 2-3x, so past Iterative.batchRows fall back to one materialized
      // hop per round) and the empty-frontier early exit that skips every
      // post-diameter round. Counting replaces the former isEmpty probe,
      // so the per-round job count is unchanged — and unlike the plan-
      // stats byte gate it used to be, a count cannot be inflated by
      // join/agg derivation (which silently disabled batching here).
      val frontierRows = frontier.count()
      if (frontierRows == 0) done = true
      else {
        val hops =
          if (frontierRows <= Iterative.batchRows) math.min(3, rounds - r)
          else 1
        var acc = expand(frontier)
        var last = acc
        (2 to hops).foreach { _ =>
          last = expand(last)
          acc = acc.union(last)
        }
        val fresh =
          if (hops > 1)
            acc.groupBy(col("id")).agg(min(col("dist")).alias("dist"))
          else acc
        frontier = Iterative.truncate(fresh, checkpointDir)
        // dist needs NO truncate of its own: it is a union of already-
        // checkpointed frontiers — a depth-R plan over materialized
        // leaves, nothing recomputes and stats merely add. A final empty
        // frontier unions in zero rows; the next round's count exits.
        dist = dist.union(frontier)
        r += hops
      }
      System.err.println(f"[bfs] hops=$r t=${(System.nanoTime() - bfsT0) / 1e9}%.2fs")
      bfsT0 = System.nanoTime()
    }
    System.err.println(s"[bfs] total hops=$r done=$done")
    dist
  }

  /** Per-node triangle counts over an undirected edge list given as
    * ordered pairs (id_a < id_b). With every edge stored once in
    * ascending order, a triangle {a < b < c} is found exactly once by
    * joining e1=(a,b), e2=(b,c), e3=(a,c) — no candidate is counted from
    * a second orientation, so no post-dedup pass.
    *
    * The triangle density of a near-dup pair graph is a dedup-quality
    * diagnostic: true duplicate clusters are near-cliques (high triangle
    * count per node), while chains of borderline pairs — the transitive-
    * closure over-merging failure mode — have none.
    *
    * Scale shape: two equi-joins on node ids; the classic optimization
    * (join lower-degree endpoints first) is Catalyst's call via join
    * reordering + AQE, not hand-scheduled here.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a").alias("a"), col("id_b").alias("b"))
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .join(e.alias("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").alias("x"), col("e1.b").alias("y"), col("e2.b").alias("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).alias("id"))
      .groupBy(col("id")).agg(count(lit(1)).alias("n_triangles"))
  }

  /** Fixed-round k-truss peeling over an undirected edge list given as
    * ordered pairs (id_a < id_b): each round computes every edge's
    * SUPPORT (triangles it participates in — each ascending triangle
    * (a,b),(b,c),(a,c) credits all three edges) and drops edges with
    * support < k−2; removals cascade across rounds. The edge-level
    * sibling of [[kCorePeel]] — k-trusses isolate the provably dense
    * cores (every edge in a k-truss has k−2 common neighbors), the
    * strongest standard cohesion filter for near-dup cluster quality.
    *
    * FIXED `rounds` (deterministic cost, mechanically unrollable
    * oracle — the [[kCorePeel]]/[[pagerank]] contract). Returns the
    * surviving (id_a, id_b, support) with support measured over
    * surviving edges.
    *
    * Scale shape per round: [[triangleCounts]]'s two equi-joins plus an
    * edge-keyed count and a semi-join filter; lineage truncated per
    * round ([[Iterative.truncate]], reliable `checkpointDir` opt-in).
    */
  def kTrussPeel(edges: DataFrame, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    def support(e: DataFrame): DataFrame = {
      val tri = e.alias("e1")
        .join(e.alias("e2"), col("e1.b") === col("e2.a"))
        .join(e.alias("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(col("e1.a").alias("x"), col("e1.b").alias("y"),
          col("e2.b").alias("z"))
      val credit = tri.select(col("x").alias("a"), col("y").alias("b"))
        .union(tri.select(col("y").alias("a"), col("z").alias("b")))
        .union(tri.select(col("x").alias("a"), col("z").alias("b")))
      e.join(credit.groupBy(col("a"), col("b"))
          .agg(count(lit(1)).alias("support")),
          Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("support"), lit(0L)).alias("support"))
    }
    var e = Iterative.truncate(
      edges.select(col("id_a").alias("a"), col("id_b").alias("b")),
      checkpointDir)
    (1 to rounds).foreach { _ =>
      e = Iterative.truncate(
        support(e).filter(col("support") >= (k - 2).toLong)
          .select(col("a"), col("b")), checkpointDir)
    }
    support(e).select(col("a").alias("id_a"), col("b").alias("id_b"),
      col("support"))
  }

  /** Local clustering coefficient per node — triangles through the node
    * over its possible wedges, the "how clique-like is this node's
    * neighborhood" diagnostic (near-1 inside true duplicate clusters,
    * near-0 along transitive chains): coeff = ⌊tri·10⁶ / C(deg,2)⌋, NULL
    * for degree < 2. Input: undirected edges as ordered pairs
    * (id_a < id_b), each stored once — [[triangleCounts]]'s convention.
    * Returns (id, degree, n_triangles, coeff_ppm) over ALL nodes.
    *
    * Scale shape: [[triangleCounts]]'s two equi-joins plus one
    * node-sized degree groupBy and a left join — no new morphology.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id_a").alias("a"), col("id_b").alias("b"))
    val deg = e.select(col("a").alias("id"))
      .union(e.select(col("b").alias("id")))
      .groupBy(col("id")).agg(count(lit(1)).alias("degree"))
    deg.join(triangleCounts(edges).withColumnRenamed("id", "__t"),
        col("id") === col("__t"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).alias("n_triangles"),
        expr("""CASE WHEN degree < 2 THEN NULL
                ELSE (coalesce(n_triangles, 0) * 1000000)
                  DIV ((degree * (degree - 1)) DIV 2) END""")
          .alias("coeff_ppm"))
  }

  /** Personalized PageRank, integer-exact: [[pagerank]] with the teleport
    * mass restricted to a SEED set — rank'(v) = [v ∈ S]·((100−dNum)·scale)
    * DIV 100 + (dNum·Σ contrib) DIV 100, starting from rank = scale on
    * seeds and 0 elsewhere. The "trust/relevance radiates from these
    * nodes" prior (trusted-domain weighting, related-entity expansion)
    * where global PageRank answers overall centrality. Same DIV-floor
    * arithmetic as [[pagerankStep]], so `rounds` rounds unroll into exact
    * SQL.
    *
    * Returns (id, rank) over ALL nodes (zeros included — a zero after r
    * rounds is the "unreachable within r hops of the seed flow" signal).
    *
    * Scale shape: per round one outdeg-joined edge aggregation and one
    * node-sized left join, lineage truncated ([[Iterative.truncate]],
    * reliable `checkpointDir` opt-in); the seed flag rides the node frame,
    * never a driver collection.
    */
  def personalizedPagerank(edges: DataFrame, seeds: DataFrame, rounds: Int,
      dNum: Int = 85, scale: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(dNum >= 0 && dNum <= 100, s"dNum must be in [0,100], got $dNum")
    require(scale > 0, s"scale must be positive, got $scale")
    val e = Iterative.truncate(edges.toDF("src", "dst"), checkpointDir)
    val nodes = e.select(col("src").alias("id"))
      .union(e.select(col("dst").alias("id"))).distinct()
    val s = seeds.toDF("id").distinct()
    val nodeSeed = Iterative.truncate(
      nodes.join(s.withColumn("__s", lit(1L)), Seq("id"), "left")
        .select(col("id"), coalesce(col("__s"), lit(0L)).alias("is_seed")),
      checkpointDir)
    val outdeg = e.groupBy("src").agg(count(lit(1)).alias("outdeg"))
    val teleport = (100L - dNum) * scale / 100L
    var r = Iterative.truncate(
      nodeSeed.select(col("id"), (col("is_seed") * scale).alias("rank")),
      checkpointDir)
    var i = 0
    while (i < rounds) {
      val contrib = e.join(outdeg, "src")
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").alias("id"), expr("rank DIV outdeg").alias("c"))
        .groupBy("id").agg(sum(col("c")).alias("contrib"))
      r = Iterative.truncate(
        nodeSeed.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (col("is_seed") * teleport +
              expr(s"(${dNum}L * coalesce(contrib, 0L)) DIV 100")).alias("rank")),
        checkpointDir)
      i += 1
    }
    r
  }

  /** HITS hubs-and-authorities, integer-exact: authority(v) = Σ_{u→v}
    * hub(u), hub(u) = Σ_{u→v} authority(v), each half-round renormalized
    * by DIV-flooring against the current maximum (score·scale DIV max) —
    * max-normalization instead of the textbook L2 norm, so no sqrt exists
    * and `rounds` rounds unroll into exact SQL (the q100 discipline). On a
    * purchase/link bipartite graph this separates "prolific pointers"
    * (hubs) from "widely pointed-at" entities (authorities) — the two
    * roles PageRank's single score conflates.
    *
    * Returns (id, kind, score) with kind ∈ {'hub', 'auth'}: hubs are the
    * distinct src nodes, authorities the distinct dst nodes (a node id
    * appearing on both sides gets one row per role). Scores are in
    * [0, scale], the round's maximum pinned at scale exactly.
    *
    * Scale shape: per round two edge-keyed partial-agg joins and two
    * 1-row max broadcasts; lineage truncated per round
    * ([[Iterative.truncate]], reliable `checkpointDir` opt-in).
    */
  def hits(edges: DataFrame, rounds: Int, scale: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(scale > 0, s"scale must be positive, got $scale")
    val e = Iterative.truncate(edges.toDF("src", "dst"), checkpointDir)
    var h = Iterative.truncate(
      e.select(col("src").alias("id")).distinct()
        .select(col("id"), lit(scale).alias("score")),
      checkpointDir)
    var a: DataFrame = null
    var i = 0
    while (i < rounds) {
      val araw = e.join(h.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").alias("id")).agg(sum(col("score")).alias("s"))
      val amax = araw.agg(max(col("s")).alias("m"))
      a = Iterative.truncate(
        araw.crossJoin(broadcast(amax))
          .select(col("id"), expr(s"CAST((CAST(s AS DECIMAL(38,0)) * ${scale}L) DIV m AS BIGINT)").alias("score")),
        checkpointDir)
      val hraw = e.join(a.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").alias("id")).agg(sum(col("score")).alias("s"))
      val hmax = hraw.agg(max(col("s")).alias("m"))
      h = Iterative.truncate(
        hraw.crossJoin(broadcast(hmax))
          .select(col("id"), expr(s"CAST((CAST(s AS DECIMAL(38,0)) * ${scale}L) DIV m AS BIGINT)").alias("score")),
        checkpointDir)
      i += 1
    }
    h.select(col("id"), lit("hub").alias("kind"), col("score"))
      .union(a.select(col("id"), lit("auth").alias("kind"), col("score")))
  }

  /** Degree distribution over an undirected edge list (id_a, id_b): one
    * row per distinct degree with the node count holding it and its share
    * of all nodes in ppm — the first diagnostic read on ANY derived graph
    * (a near-dup pair graph whose distribution is head-heavy has hub
    * documents that will explode wedge joins; a co-occurrence graph with a
    * fat degree-1 tail is mostly noise edges). Summary columns (n_nodes,
    * n_edges, max degree) ride every row so the profile is one frame.
    *
    * Scale shape: one endpoint union + two partial-agg groupBys (node- and
    * degree-cardinality sized) + a 1-row totals broadcast — no windows, no
    * driver state.
    */
  def degreeStats(edges: DataFrame): DataFrame = {
    require(edges.columns.length == 2, "edges must be exactly (id_a, id_b)")
    val e = edges.toDF("a", "b")
    val deg = e.select(col("a").alias("id")).union(e.select(col("b").alias("id")))
      .groupBy("id").agg(count(lit(1)).alias("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).alias("n_nodes"))
    val totals = deg.agg(count(lit(1)).alias("n_nodes_total"),
      sum(col("degree")).alias("deg_sum"), max(col("degree")).alias("max_degree"))
    hist.crossJoin(broadcast(totals))
      .select(col("degree"), col("n_nodes"),
        expr("(n_nodes * 1000000L) DIV n_nodes_total").alias("node_share_ppm"),
        col("n_nodes_total"),
        // each undirected edge contributes 2 to the degree sum
        expr("deg_sum DIV 2").alias("n_edges"),
        col("max_degree"))
  }

  /** Degree assortativity over an undirected edge list (id_a, id_b) —
    * Newman's "do hubs link to hubs" coefficient, and on an UNDIRECTED
    * graph an EXACT RATIONAL: over the directed orientation list (each
    * edge counted both ways, m = 2E rows of (deg_u, deg_v)), symmetry
    * makes Σx = Σy and Σx² = Σy², so Pearson's sqrt(den_x·den_y)
    * collapses to den_x and
    *
    *   r = (m·Σxy − Σx·Σy) / (m·Σx² − (Σx)²)
    *
    * needs no square root — the same no-log/no-sqrt discipline as
    * [[hits]]/[[pagerank]], so the ppm output replays bit-for-bit in SQL.
    * Positive r: assortative (social-graph-like); negative: disassortative
    * (hub-and-spoke, the shape of most web/purchase graphs). Returns ONE
    * row (m, sx, sxy, sxx, num, den, r_ppm), num/den in DECIMAL(38,0),
    * r_ppm sign-split floor division, NULL when den = 0 (degree-regular
    * graph — assortativity undefined).
    *
    * Scale shape: one degree groupBy, two edge-keyed degree-lookup joins,
    * one 1-row reduction; nothing quadratic, no windows.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    require(edges.columns.length == 2, "edges must be exactly (id_a, id_b)")
    val e = edges.toDF("a", "b")
    val dir = e.union(e.select(col("b").alias("a"), col("a").alias("b")))
    val deg = dir.groupBy(col("a").alias("id")).agg(count(lit(1)).alias("deg"))
    val pairs = dir
      .join(deg.select(col("id").alias("a"), col("deg").alias("dx")), Seq("a"))
      .join(deg.select(col("id").alias("b"), col("deg").alias("dy")), Seq("b"))
    pairs.agg(count(lit(1)).alias("m"),
        sum(col("dx")).alias("sx"),
        sum(col("dx").cast(DecimalType(38, 0)) * col("dy")).alias("sxy"),
        sum(col("dx").cast(DecimalType(38, 0)) * col("dx")).alias("sxx"))
      .selectExpr("m", "sx", "CAST(sxy AS BIGINT) AS sxy", "CAST(sxx AS BIGINT) AS sxx",
        "CAST(m AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sx AS num",
        "CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS den")
      .selectExpr("m", "sx", "sxy", "sxx", "num", "den",
        """CAST(CASE WHEN den = 0 THEN NULL
             WHEN num >= 0 THEN (num * 1000000) DIV den
             ELSE -((-num * 1000000) DIV den) END AS BIGINT) AS r_ppm""")
  }

  /** One round of neighborhood feature aggregation over an undirected
    * edge list (id_a, id_b): for every node with at least one neighbor,
    * the count / sum / min / max of its NEIGHBORS' integer feature — the
    * message-passing primitive GNN pipelines and graph feature
    * engineering run before any model sees the graph ("average quality of
    * the documents this one links to", "max toxicity among co-cluster
    * members"). Mean is delivered as the exact (sum, count) pair plus a
    * floor-ppk quotient — never a double division, the no-log rule.
    * Nodes missing from `features` contribute nothing and aggregate
    * nothing (inner join semantics — absent features must not read as 0).
    *
    * Returns (id, n_nbrs, f_sum, f_min, f_max, f_mean_ppk).
    *
    * Scale shape: one symmetric orientation union, one feature equi-join
    * keyed on the neighbor id, one per-node partial-agg groupBy — a
    * single round of Pregel without the framework; stack rounds by
    * feeding the output back as the next feature frame.
    */
  def neighborAgg(edges: DataFrame, features: DataFrame): DataFrame = {
    require(edges.columns.length == 2, "edges must be exactly (id_a, id_b)")
    require(features.columns.length == 2, "features must be exactly (id, f)")
    val e = edges.toDF("a", "b")
    val dir = e.union(e.select(col("b").alias("a"), col("a").alias("b")))
    val f = features.toDF("id", "f")
      .select(col("id").alias("b"), col("f").cast("long").alias("f"))
    dir.join(f, Seq("b"))
      .groupBy(col("a").alias("id"))
      .agg(count(lit(1)).alias("n_nbrs"), sum(col("f")).alias("f_sum"),
        min(col("f")).alias("f_min"), max(col("f")).alias("f_max"))
      .selectExpr("id", "n_nbrs", "f_sum", "f_min", "f_max",
        """CASE WHEN f_sum >= 0 THEN (f_sum * 1000L) DIV n_nbrs
             ELSE -((-f_sum * 1000L) DIV n_nbrs) END AS f_mean_ppk""")
  }

  /** Link prediction by neighborhood overlap: for every NON-edge pair that
    * shares at least one neighbor, the common-neighbor count and the
    * Jaccard of the two neighborhoods in ppm — the Liben-Nowell/Kleinberg
    * baselines that rank "edges that should exist" (missing related-item
    * links, entity-resolution candidates the direct-similarity pass
    * missed). Adamic-Adar's 1/log(deg) weighting is deliberately absent —
    * not correctly-rounded cross-engine; common-neighbors and Jaccard are
    * integer-exact.
    *
    * `edges` is undirected canonical (id_a < id_b). Returns (id_a, id_b,
    * cn, deg_a, deg_b, jaccard_ppm) for candidate pairs only — existing
    * edges are anti-joined out, and pairs sharing no neighbor never
    * materialize (at 100 TB the zero-overlap pair set is the quadratic
    * blowup; the wedge join bounds candidates to Σ_w deg(w)²).
    *
    * Scale shape: one symmetric adjacency union, a self equi-join on the
    * shared neighbor (the wedge generator — hub nodes dominate its cost;
    * `maxWedgeDegree` caps the through-node degree, the standard
    * hub-exclusion guard, replayable in SQL), one partial-agg pair count,
    * one anti join, two degree broadcasts.
    */
  def linkPrediction(edges: DataFrame,
      maxWedgeDegree: Int = Int.MaxValue): DataFrame = {
    require(maxWedgeDegree >= 1, s"maxWedgeDegree must be >= 1, got $maxWedgeDegree")
    val e = edges.select(col("id_a").cast("long").alias("id_a"),
      col("id_b").cast("long").alias("id_b"))
    val adj = e.select(col("id_a").alias("u"), col("id_b").alias("w"))
      .union(e.select(col("id_b").alias("u"), col("id_a").alias("w")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).alias("deg"))
    val thru = adj.join(
      deg.filter(col("deg") <= maxWedgeDegree).select(col("u").alias("w")), Seq("w"))
    val pairs = thru.alias("x").join(thru.alias("y"),
        col("x.w") === col("y.w") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").alias("id_a"), col("y.u").alias("id_b"))
      .agg(count(lit(1)).alias("cn"))
    pairs.join(e, Seq("id_a", "id_b"), "left_anti")
      .join(deg.select(col("u").alias("id_a"), col("deg").alias("deg_a")), Seq("id_a"))
      .join(deg.select(col("u").alias("id_b"), col("deg").alias("deg_b")), Seq("id_b"))
      .withColumn("jaccard_ppm",
        expr("(cn * 1000000L) DIV (deg_a + deg_b - cn)"))
      .select(col("id_a"), col("id_b"), col("cn"), col("deg_a"), col("deg_b"),
        col("jaccard_ppm"))
  }

  /** Weighted longest path (critical path) per node over a DAG: returns
    * (id, dist) where dist = the maximum total edge weight over any path
    * ending at id (0 for sources), i.e. the critical-path schedule of a
    * task/dependency graph. `edges` is (src, dst, w) with integer weights;
    * ACYCLICITY is the caller's contract — construct edges along a
    * monotone axis (ascending ids, layer i → i+1) and it holds by
    * construction. On a cyclic input the relaxation never converges and
    * `rounds` simply truncates it (values still grow monotonically — the
    * spec pins the under-converged behavior).
    *
    * Bellman-Ford-style max-relaxation: `rounds` must be ≥ the DAG depth
    * for exact convergence; each round is one equi-join of edges against
    * the current frontier and a partial-agg max per node — shuffles carry
    * (id, dist) pairs only, never paths. Layered DAGs know their depth
    * up front (the layer count), which is how the q334 caller sizes
    * `rounds`. Per-round lineage is truncated (see [[Iterative.truncate]];
    * pass `checkpointDir` for cluster-reliable checkpoints on long runs).
    */
  /** Local-max greedy matching over an undirected weighted graph — the
    * distributed version of sorted greedy matching (each round an edge is
    * matched iff it is the best incident edge of BOTH its endpoints;
    * matched nodes leave the graph; repeat). Priority is (w DESC, a ASC,
    * b ASC) — fully deterministic, and the round-1 winners are exactly
    * the locally-dominant edges of the classic analysis (converges to a
    * maximal matching in O(log n) expected rounds; `rounds` truncates —
    * leftovers are simply unmatched, identically in any replay). Weight
    * at least half the maximum-weight matching when run to maximality
    * (the greedy bound). Use: assigning near-dup pairs for one-pass
    * human review, pairing A/B cohorts, any one-partner-each allocation.
    * Returns (a, b, w, round).
    *
    * Scale shape per round: one partial-agg min(struct) per node for the
    * best incident edge, two equi-joins to test both-endpoints-agree,
    * two anti joins to drop matched nodes' edges — all on 64-bit node
    * keys; lineage truncated per round ([[Iterative.truncate]]).
    */
  def localMaxMatching(edges: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(edges.columns.length == 3, "edges must be exactly (a, b, w)")
    var e = Iterative.truncate(edges.toDF("a", "b", "w")
      .select(col("a"), col("b"), col("w").cast("long").alias("w")),
      checkpointDir)
    var matched: DataFrame = null
    (1 to rounds).foreach { r =>
      val o = e.select(col("a").alias("node"), col("a"), col("b"), col("w"))
        .union(e.select(col("b").alias("node"), col("a"), col("b"), col("w")))
      val best = o.groupBy(col("node"))
        .agg(min(struct((-col("w")).alias("nw"), col("a").alias("pa"),
          col("b").alias("pb"))).alias("m"))
        .select(col("node"), col("m.pa").alias("pa"), col("m.pb").alias("pb"))
      val m1 = Iterative.truncate(
        e.join(best.alias("x"),
            col("x.node") === col("a") && col("x.pa") === col("a") &&
              col("x.pb") === col("b"))
          .join(best.alias("y"),
            col("y.node") === col("b") && col("y.pa") === col("a") &&
              col("y.pb") === col("b"))
          .select(col("a"), col("b"), col("w")), checkpointDir)
      val withRound = m1.withColumn("round", lit(r.toLong))
      matched = if (matched == null) withRound else matched.union(withRound)
      val touched = m1.select(col("a").alias("n"))
        .union(m1.select(col("b").alias("n"))).distinct()
      e = Iterative.truncate(
        e.join(touched, col("a") === col("n"), "left_anti")
          .join(touched, col("b") === col("n"), "left_anti"), checkpointDir)
    }
    matched
  }

  /** Multi-source weighted shortest path with a hop bound: returns
    * (id, dist) = the minimum total edge weight over any path of at most
    * `rounds` hops from any source to id (sources at 0; nodes unreachable
    * within the bound are ABSENT — at 100 TB the reached set is the small
    * output, its complement is not). Weights must be non-negative
    * (require-checked on the first batch is impossible declaratively —
    * the caller's contract; negative weights would need the full
    * |V|−1-round Bellman-Ford to be exact). The weighted sibling of
    * [[bfsDistances]] and the min-dual of [[dagLongestPath]]: same
    * frontier relaxation, same shuffle shape — each round one equi-join
    * of edges against the current distances and a partial-agg min per
    * node. Edges are directed; pass both orientations for an undirected
    * graph.
    */
  def shortestPaths(edges: DataFrame, sources: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None,
      maxLocalEdges: Long = 4L << 20): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(edges.columns.length == 3, "edges must be exactly (src, dst, w)")
    require(sources.columns.length == 1, "sources must be a single id column")
    // null src/dst/w dropped up front: the distributed relaxation's
    // equi-join would never match them, and the local replay keys on
    // getLong — both tiers must see the same edge set.
    val e0 = Iterative.truncate(edges.toDF("src", "dst", "w")
      .filter(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      .select(col("src"), col("dst"), col("w").cast("long").alias("w")),
      checkpointDir)
    // Hybrid driver path (the bfsDistances move): the round function is a
    // SYNCHRONOUS relaxation — each round reads only the previous round's
    // table — so an in-memory two-map sweep replays it exactly, round for
    // round, with early exit at the monotone fixed point (further rounds
    // are no-ops by idempotence). One bounded collect replaces `rounds`
    // join+agg driver rounds; larger graphs keep the distributed loop
    // and, via the free leaf pre-check, never pay a count to learn so.
    val ssspBudget = driverRowBudget(maxLocalEdges)
    if (localRelaxable(e0, sources) && plausiblyDriverSized(edges, ssspBudget) &&
        e0.count() <= ssspBudget) {
      return localRelax(e0, Some(sources), rounds, minimize = true)
    }
    var dist = Iterative.truncate(
      sources.toDF("id").filter(col("id").isNotNull).distinct()
        .withColumn("dist", lit(0L)), checkpointDir)
    (1 to rounds).foreach { _ =>
      val relaxed = e0
        .join(dist.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").alias("id"), (col("dist") + col("w")).alias("dist"))
        .union(dist)
      dist = Iterative.truncate(
        relaxed.groupBy("id").agg(min(col("dist")).alias("dist")), checkpointDir)
    }
    dist
  }

  /** FREE size pre-gate for the driver-tier hybrids: before paying a
    * `count()` to learn whether an edge frame fits under the driver
    * bound, check the LEAF-scan bytes of its plan (the
    * Dedup.leafInputBytes pattern — leaf sizes are file/relation sizes,
    * the number that bounds what the count would read, unlike root
    * estimates which inflate through join/agg derivation). A 100 TB edge
    * list fails this check and skips straight to the distributed tier
    * WITHOUT scanning anything; the sf-scale graphs the hybrids exist
    * for pass it (MB-sized leaves) and pay the one cheap count as
    * before. Direction of error is safe by construction: a falsely-huge
    * estimate only forfeits the driver shortcut (the distributed tier is
    * always correct), and a falsely-small one is caught by the count
    * that follows. The bound is generous — 512 B per candidate edge or
    * 4 GB, whichever is larger — so only genuinely corpus-scale inputs
    * skip the count.
    *
    * ALREADY-MATERIALIZED leaves (checkpoints' LogicalRDD, cached
    * InMemoryRelation, LocalRelation) are excluded from the sum: a count
    * over them never re-executes upstream lineage and touches at most
    * what the distributed tier would materialize anyway — and their
    * "leaf" stats are the pre-materialization plan's ROOT estimate,
    * join-inflated (measured: q334's MB-scale checkpointed DAG edges and
    * q349's pair frame both reported past the bound, silently disabling
    * their driver tiers, 1.2 s -> 5.5 s in a focused A/B). Scan leaves
    * carry real file/relation sizes — the number that bounds what the
    * count would read.
    */
  private[graft] def plausiblyDriverSized(df: DataFrame, maxRows: Long): Boolean = {
    val scanBytes = df.queryExecution.optimizedPlan.collectLeaves()
      .filterNot(l =>
        l.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] ||
          l.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation] ||
          l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      .map(_.stats.sizeInBytes).sum
    scanBytes <= (BigInt(maxRows) * 512).max(BigInt(4L << 30))
  }

  /** Heap-aware driver row budget: the collected representation is BOXED
    * (Row arrays, HashMap adjacency with per-entry overhead — ~160 bytes
    * per edge, not the 8-byte longs of the raw column), so a raw 4M-edge
    * default can need several hundred MB of driver heap. Spend at most
    * 1/8 of max heap on a hybrid's collect: a 16 GB driver keeps the full
    * configured bound, a 1 GB one self-lowers to ~800k edges instead of
    * risking an OOM exactly where the hybrid engages.
    */
  private[graft] def driverRowBudget(maxRows: Long): Long =
    math.min(maxRows, Runtime.getRuntime.maxMemory() / 1280)

  /** Gate for the driver relaxation hybrids: Long node ids (the local
    * maps key on getLong) on both the edge list and the optional source
    * set. */
  private def localRelaxable(e0: DataFrame, sources: DataFrame): Boolean = {
    val lt = org.apache.spark.sql.types.LongType
    e0.schema.take(2).forall(_.dataType == lt) &&
      (sources == null || sources.schema.head.dataType == lt)
  }

  /** In-memory synchronous relaxation shared by [[shortestPaths]]
    * (minimize, source-seeded, unreached absent) and [[dagLongestPath]]
    * (maximize, all nodes at 0). Replays exactly `rounds` rounds of the
    * distributed round function over collected (src, dst, w) edges, with
    * early exit once a round changes nothing (monotone fixed point —
    * identical output by idempotence).
    */
  private def localRelax(e0: DataFrame, sources: Option[DataFrame],
      rounds: Int, minimize: Boolean): DataFrame = {
    val es = e0.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var dist = new java.util.HashMap[Long, Long]()
    sources match {
      case Some(s) =>
        // null sources dropped on both tiers (the distributed init below
        // does the same) — getLong on a null id would NPE here
        s.toDF("id").filter(col("id").isNotNull).distinct()
          .collect().foreach(r => dist.put(r.getLong(0), 0L))
      case None =>
        es.foreach { case (a, b, _) => dist.put(a, 0L); dist.put(b, 0L) }
    }
    var r = 0
    var changed = true
    while (r < rounds && changed) {
      val next = new java.util.HashMap[Long, Long](dist)
      changed = false
      es.foreach { case (src, dst, w) =>
        // synchronous: candidates read the PREVIOUS round's table
        if (dist.containsKey(src)) {
          val cand = dist.get(src) + w
          val better =
            if (!next.containsKey(dst)) true // first reach always wins
            else if (minimize) cand < next.get(dst)
            else cand > next.get(dst)
          if (better) { next.put(dst, cand); changed = true }
        }
      }
      dist = next
      r += 1
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = dist.entrySet().asScala.toSeq
      .map(e => org.apache.spark.sql.Row(e.getKey, e.getValue))
    e0.sparkSession.createDataFrame(rows.asJava, schema)
  }

  def dagLongestPath(edges: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None,
      maxLocalEdges: Long = 4L << 20): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(edges.columns.length == 3, "edges must be exactly (src, dst, w)")
    // null src/dst/w dropped — see shortestPaths (tier parity).
    val e0 = Iterative.truncate(edges.toDF("src", "dst", "w")
      .filter(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      .select(col("src"), col("dst"), col("w").cast("long").alias("w")),
      checkpointDir)
    // Hybrid driver path — see shortestPaths: the synchronous max-relax
    // replays exactly in memory (all nodes seeded at 0), early-exiting at
    // the monotone fixed point with an identical result; the leaf
    // pre-check keeps the gate count-free on corpus-scale inputs.
    val dagBudget = driverRowBudget(maxLocalEdges)
    if (localRelaxable(e0, null) && plausiblyDriverSized(edges, dagBudget) &&
        e0.count() <= dagBudget) {
      return localRelax(e0, None, rounds, minimize = false)
    }
    val nodes = e0.select(col("src").alias("id"))
      .union(e0.select(col("dst").alias("id"))).distinct()
    var dist = Iterative.truncate(
      nodes.withColumn("dist", lit(0L)), checkpointDir)
    // ONE relax per truncate. The compose batching (3 steps per
    // materialize) was reverted with the starPass/pointer-doubling
    // composes: a relax references its input TWICE (join side + union
    // side), both shuffle-bearing, so an un-materialized inner step's
    // shuffles re-execute inside the outer job — the measured lesson
    // from the star (14.5 s vs 8.8 s) and pointer-doubling (9.1 s vs
    // 7.7 s) reverts. Sub-threshold inputs take the driver hybrid above,
    // so this loop only runs where the frames are big enough that the
    // recompute would dominate anyway.
    def relax(d: DataFrame): DataFrame = e0
      .join(d.withColumnRenamed("id", "src"), Seq("src"))
      .select(col("dst").alias("id"), (col("dist") + col("w")).alias("dist"))
      .union(d)
      .groupBy("id").agg(max(col("dist")).alias("dist"))
    (1 to rounds).foreach { _ =>
      dist = Iterative.truncate(relax(dist), checkpointDir)
    }
    dist
  }
}
