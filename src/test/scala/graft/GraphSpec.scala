package graft

import graft.graph._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    // keep top_k_scored on the object-hash path (see TopKAggregate doc)
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
    // the sf1-gated scale tests run multi-minute jobs under broadcast
    // exchanges on this deliberately-small 4-thread session; the 300s
    // default would fail them spuriously
    .config("spark.sql.broadcastTimeout", "1800")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def edgeDf(pairs: (Int, Int)*) =
    pairs.toSeq.toDF("src", "dst")

  test("bfsLevels finds level order on a known path graph") {
    // 0 -> 1 -> 2 -> 3, plus shortcut 0 -> 2
    val e = edgeDf((0, 1), (1, 2), (2, 3), (0, 2))
    val got = Traversals.bfsLevels(e, 0, 6).orderBy("node")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((0, 0), (1, 1), (2, 1), (3, 2)))
  }

  test("reachableFrom stops at unreachable nodes") {
    val e = edgeDf((0, 1), (1, 2), (5, 6))
    val got = Traversals.reachableFrom(e, 0).orderBy("node")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 2))
  }

  test("labelPropagate separates two components") {
    val nodes = Seq(0, 1, 2, 10, 11).toDF("node")
    val sym = edgeDf((0, 1), (1, 0), (1, 2), (2, 1), (10, 11), (11, 10))
    val got = Components.labelPropagate(nodes, sym).orderBy("node")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((0, 0), (1, 0), (2, 0), (10, 10), (11, 10)))
  }

  test("adjacency matrix text roundtrip matches G.txt format") {
    val e = edgeDf((0, 1), (1, 2), (2, 0))
    val text = AdjacencyCodec.toText(AdjacencyCodec.toMatrix(e, 3), 3)
    assert(text == "3\n0 1 0\n0 0 1\n1 0 0")
    val back = AdjacencyCodec.fromMatrix(AdjacencyCodec.parseText(spark, text))
      .orderBy("src", "dst").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(back == Seq((0, 1), (1, 2), (2, 0)))
  }

  test("GraphStore add/modify/read with snapshot versioning") {
    val dir = java.nio.file.Files.createTempDirectory("graphstore").toString
    val store = new GraphStore(spark, dir)
    assert(store.list().isEmpty)
    store.add("G1", edgeDf((0, 1), (1, 2)))
    assert(store.currentVersion("G1").contains(1L))
    assert(store.read("G1").count() == 2)
    store.modify("G1", edgeDf((4, 5)))
    assert(store.currentVersion("G1").contains(2L))
    val rows = store.read("G1").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((4, 5)))
    store.add("G2", edgeDf((7, 8)))
    assert(store.list() == Seq("G1", "G2"))
    intercept[java.util.NoSuchElementException](store.read("missing"))
    // time travel: immutable snapshots keep history readable
    assert(store.versions("G1") == Seq(1L, 2L))
    val v1 = store.readVersion("G1", 1L).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(v1 == Set((0, 1), (1, 2)))
    intercept[java.util.NoSuchElementException](store.readVersion("G1", 9L))
  }

  test("GraphStore publish is atomic under concurrent reads") {
    // regression for the delete/rename pointer window: a reader
    // polling currentVersion during repeated put() calls must always
    // see some version — never a missing pointer — and versions must
    // be strictly increasing
    val dir = java.nio.file.Files.createTempDirectory("graphrace").toString
    val store = new GraphStore(spark, dir)
    store.add("G", edgeDf((0, 1)))
    @volatile var failure: Option[String] = None
    @volatile var running = true
    val reader = new Thread(() => {
      var last = 0L
      while (running && failure.isEmpty) {
        store.currentVersion("G") match {
          case None => failure = Some("pointer vanished mid-publish")
          case Some(v) =>
            if (v < last) failure = Some(s"version went backwards: $last -> $v")
            last = v
        }
      }
    })
    reader.start()
    (2 to 6).foreach(i => store.modify("G", edgeDf((i, i + 1))))
    running = false
    reader.join(10000)
    assert(failure.isEmpty, failure.getOrElse(""))
    assert(store.currentVersion("G").contains(6L))
  }

  test("GraphStore applyDelta and drop") {
    val dir = java.nio.file.Files.createTempDirectory("graphdelta").toString
    val store = new GraphStore(spark, dir)
    store.add("G", edgeDf((0, 1), (1, 2), (2, 3)))
    store.applyDelta("G", additions = edgeDf((5, 6)), deletions = edgeDf((1, 2)))
    val rows = store.read("G").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows == Set((0, 1), (2, 3), (5, 6)))
    assert(store.currentVersion("G").contains(2L))
    store.drop("G")
    assert(store.list().isEmpty)
    intercept[java.util.NoSuchElementException](store.read("G"))
  }

  test("GraphStore vacuum retains newest versions and the current pointer") {
    val dir = java.nio.file.Files.createTempDirectory("graphvacuum").toString
    val store = new GraphStore(spark, dir)
    (1 to 5).foreach(i => store.put("G", edgeDf((i, i + 1))))
    assert(store.versions("G") == Seq(1L, 2L, 3L, 4L, 5L))
    val dropped = store.vacuum("G", keepLast = 2)
    assert(dropped == Seq(1L, 2L, 3L))
    assert(store.versions("G") == Seq(4L, 5L))
    assert(store.read("G").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      == Seq((5, 6)))
    // vacuumed history is gone; retained history still time-travels
    intercept[java.util.NoSuchElementException](store.readVersion("G", 1L))
    assert(store.readVersion("G", 4L).count() == 1)
    // idempotent: nothing more to drop
    assert(store.vacuum("G", keepLast = 2).isEmpty)
    intercept[IllegalArgumentException](store.vacuum("G", keepLast = 0))
  }

  test("GraphStore readers of retained snapshots survive a concurrent vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("graphvacrace").toString
    val store = new GraphStore(spark, dir)
    (1 to 8).foreach(i => store.put("G", edgeDf((i, i + 1))))
    @volatile var failure: Option[String] = None
    @volatile var running = true
    // readers hammer the two versions every vacuum(keepLast=2) retains
    val readers = Seq(7L, 8L).map { v =>
      new Thread(() => {
        while (running && failure.isEmpty) {
          try {
            if (store.readVersion("G", v).count() != 1)
              failure = Some(s"v$v lost rows mid-vacuum")
          } catch {
            case e: Exception => failure = Some(s"v$v read failed: $e")
          }
        }
      })
    }
    readers.foreach(_.start())
    // repeated vacuums while writers add history behind the readers
    (9 to 12).foreach { i =>
      store.put("G", edgeDf((i, i + 1)))
      store.vacuum("G", keepLast = 6)
    }
    running = false
    readers.foreach(_.join(20000))
    assert(failure.isEmpty, failure.getOrElse(""))
    // the hammered versions are still within the retained window
    assert(store.versions("G").toSet.intersect(Set(7L, 8L)) == Set(7L, 8L))
  }

  test("bipartite components report consistent sides") {
    val got = SparkEntry.queries("g11_bipartite_cc")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3)) // n_nodes = customers + suppliers
    }
  }

  test("labelPropagate matches GraphX connectedComponents on the trade graph") {
    // independent cross-check against Spark's own graph library:
    // GraphX CC also labels each component with its min vertex id, so
    // the outputs must agree exactly
    import org.apache.spark.graphx.{Edge, Graph}
    val edges = TradeGraph.edgesTable(spark, "/root/testdata/sf0.001")
    val sym = TradeGraph.symEdges(edges)
    val nodes = TradeGraph.nodes(spark, "/root/testdata/sf0.001")
    val ours = Components.labelPropagate(nodes, sym)
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toMap
    val vRdd = spark.sparkContext.parallelize(
      nodes.collect().map(r => (r.getInt(0).toLong, ())).toSeq)
    val eRdd = spark.sparkContext.parallelize(
      sym.collect().map(r => Edge(r.getInt(0).toLong, r.getInt(1).toLong, ())).toSeq)
    val theirs = Graph(vRdd, eRdd).connectedComponents()
      .vertices.collect().toMap
    assert(ours == theirs)
  }

  test("bipartiteComponents contraction equals direct label propagation") {
    // three components: {c1,c2 / s1,s2}, {c5 / s9}, {c7,c8 / s3} —
    // plus a case where the min node is a supplier (s3=7 < c7*2=14)
    val pairs = Seq((1L, 1L), (1L, 2L), (2L, 2L), (5L, 9L), (7L, 3L), (8L, 3L))
      .toDF("cust", "supp")
    val got = Components.bipartiteComponents(pairs).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // direct propagation on the doubled graph for comparison
    val bip = pairs.select((col("cust") * 2).cast("long").as("src"),
      (col("supp") * 2 + 1).cast("long").as("dst"))
    val nodes = bip.select(col("src").as("node"))
      .unionAll(bip.select(col("dst").as("node"))).distinct()
    val sym = bip.unionAll(bip.select(col("dst").as("src"), col("src").as("dst")))
    val want = Components.labelPropagate(nodes, sym).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.map(_._2).distinct.size == 3)
    // the {c7,c8,s3} component is labeled by its supplier (7 < 14)
    assert(got.toMap.apply(14L) == 7L)
  }

  test("kCore peels low-degree tails, cascading") {
    // triangle 0-1-2 with a chain 2-3-4: peeling 4 then 3 leaves the triangle
    val und = Seq((0, 1), (1, 2), (0, 2), (2, 3), (3, 4))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core = Components.kCore(sym, 2).orderBy("node")
      .collect().map(_.getInt(0)).toSeq
    assert(core == Seq(0, 1, 2))
  }

  test("Boruvka spanning forest matches Prim's total cost on the trade graph") {
    // undirected unique edges with integral cost (min over directions)
    val e = TradeGraph.symEdges(TradeGraph.edgesTable(spark, "/root/testdata/sf0.001"))
      .join(TradeGraph.edgesTable(spark, "/root/testdata/sf0.001")
        .select(col("src").as("s2"), col("dst").as("d2"),
          (floor(lit(1000000.0) / col("weight")) + 1).cast("long").as("c2")),
        col("src") === col("s2") && col("dst") === col("d2"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("c2")).as("cost"))
    val nodes = TradeGraph.nodes(spark, "/root/testdata/sf0.001")
    val forest = Mst.boruvka(nodes, e).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))

    // reference: in-test Prim over the collected edge list
    val edges = e.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val verts = nodes.collect().map(_.getInt(0)).toSet
    val adj: Map[Int, Seq[(Int, Long)]] =
      edges.flatMap { case (a, b, c) => Seq(a -> (b, c), b -> (a, c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var primCost = 0L
    var nTreeEdges = 0
    val seen = scala.collection.mutable.Set.empty[Int]
    verts.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        seen += start
        val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
          Ordering.by[(Long, Int), (Long, Int)](identity).reverse)
        adj.getOrElse(start, Seq.empty[(Int, Long)]).foreach { case (n, c) => pq.enqueue((c, n)) }
        while (pq.nonEmpty) {
          val (c, n) = pq.dequeue()
          if (!seen.contains(n)) {
            seen += n; primCost += c; nTreeEdges += 1
            adj.getOrElse(n, Seq.empty[(Int, Long)]).foreach { case (m, c2) =>
              if (!seen.contains(m)) pq.enqueue((c2, m))
            }
          }
        }
      }
    }
    // all MSTs of a graph share the same total cost; the forest must
    // also have exactly V - C edges (spanning, acyclic)
    assert(forest.map(_._3).sum == primCost)
    assert(forest.length == nTreeEdges)
    assert(forest.toSet.subsetOf(edges.toSet))
  }

  test("triangle counting on a known graph") {
    // square 0-1-2-3 with one diagonal 0-2: triangles (0,1,2) and (0,2,3)
    val e = edgeDf((0, 1), (1, 2), (2, 3), (3, 0), (0, 2))
    val tris = Triangles.orderedEdges(e)
    val t1 = tris.as("e1"); val t2 = tris.as("e2"); val t3 = tris.as("e3")
    val n = t1.join(t2, col("e1.b") === col("e2.a"))
      .join(t3, col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .count()
    assert(n == 2)
  }

  test("bounded Bellman-Ford relaxes through cheaper multi-hop paths") {
    import org.apache.spark.sql.functions.{col => c}
    // direct 0->3 cost 10 vs 0->1->2->3 cost 3
    val dag = Seq((0, 3, 10L), (0, 1, 1L), (1, 2, 1L), (2, 3, 1L))
      .toDF("src", "dst", "cost").localCheckpoint()
    var dist = Seq((0, 0L)).toDF("node", "cost")
    for (_ <- 1 to 4) {
      val relaxed = dist.join(dag, dist("node") === dag("src"))
        .select(dag("dst").as("node"), (dist("cost") + dag("cost")).as("cost"))
      dist = dist.unionAll(relaxed)
        .groupBy(c("node")).agg(org.apache.spark.sql.functions.min(c("cost")).as("cost"))
        .localCheckpoint()
    }
    val m = dist.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(3) == 3L && m(2) == 2L && m(1) == 1L && m(0) == 0L)
  }

  test("pagerank ranks sum to ~1") {
    val nodes = Seq(0, 1, 2).toDF("node")
    val e = edgeDf((0, 1), (1, 2)) // node 2 dangles
    val total = PageRank.run(nodes, e.withColumn("weight", lit(1L)), 10)
      .agg(sum("rank")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("racing writers from separate store instances never share a version") {
    // Two GraphStore instances on one directory model two driver
    // processes: the in-JVM writer lock cannot serialize them, so the
    // atomic claim-file allocation must — a shared version number
    // would mean one writer's parquet overwrite clobbers the other's
    // snapshot mid-write.
    val dir = java.nio.file.Files.createTempDirectory("graphrace2").toString
    val a = new GraphStore(spark, dir)
    val b = new GraphStore(spark, dir)
    a.add("G", edgeDf((0, 1)))
    val dfs = (1 to 12).map(i => edgeDf((i, i + 1)))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() => try {
        val st = if (t % 2 == 0) a else b
        (0 until 3).foreach(j => st.put("G", dfs(t * 3 + j)))
      } catch { case e: Throwable => failures.add(e) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    // 1 initial + 12 racing puts: 13 DISTINCT versions, no clobbers
    assert(a.versions("G") == (1L to 13L))
    // pointer monotonicity at quiescence: a slow writer's rename can
    // transiently roll the pointer back, but its post-publish fix-up
    // must re-publish the newest complete snapshot — once all writers
    // finish, the pointer is the max version, never a rolled-back one
    assert(a.currentVersion("G").contains(13L))
    // the pointer resolves to a readable snapshot that is one of the
    // racing writers' single-edge frames
    assert(a.read("G").count() == 1L)
    // every snapshot is intact (none half-overwritten)
    (1L to 13L).foreach(v => assert(a.readVersion("G", v).count() == 1L))
  }

  test("bipairs delta refresh on real testdata equals full rebuild") {
    // The concrete instance of the incremental story: the bipartite
    // customer-supplier pair index maintained under a stream of trade
    // deltas without rescanning the fact data.
    val base = java.nio.file.Files.createTempDirectory("bipairsview").toString
    val store = new GraphStore(spark, s"$base/store")
    val view = new DistinctPairView(spark, store, "bipairs", s"$base/view")
    val pairs = Components.bipartitePairs(spark, "/root/testdata/sf0.001")
      .select(col("cust").as("src"), col("supp").as("dst"))
    store.add("bipairs", pairs)
    view.rebuild()
    // new trade relationships + a churned one, as a delta
    val adds = Seq((900001L, 1L), (900001L, 2L), (900002L, 3L)).toDF("src", "dst")
    val dels = pairs.limit(5)
    view.applyDelta(adds, dels)
    val got = view.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = store.read("bipairs").select("src", "dst").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == full && got.contains((900001L, 1L)))
    assert(view.isFresh)
  }

  test("DistinctPairView delta refresh equals full rebuild across deltas") {
    val base = java.nio.file.Files.createTempDirectory("graphview").toString
    val store = new GraphStore(spark, s"$base/store")
    val view = new DistinctPairView(spark, store, "G", s"$base/view")
    def viewSet() = view.read().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    def fullSet() = store.read("G").select("src", "dst").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet

    // multiplicity matters: (1,2) twice, so the view must not need counts
    store.add("G", edgeDf((0, 1), (1, 2), (1, 2), (2, 3)))
    view.rebuild()
    assert(view.isFresh && viewSet() == Set((0, 1), (1, 2), (2, 3)))

    // delete a multi-edge key + a single key, add a new key and re-add
    // a deleted one — the union/anti algebra's corner cases in one delta
    view.applyDelta(additions = edgeDf((5, 6), (2, 3)),
      deletions = edgeDf((1, 2), (2, 3)))
    assert(view.isFresh && store.currentVersion("G").contains(2L))
    assert(viewSet() == fullSet() && viewSet() == Set((0, 1), (2, 3), (5, 6)))

    // second chained delta stays consistent
    view.applyDelta(additions = edgeDf((7, 8)), deletions = edgeDf((0, 1)))
    assert(view.isFresh && viewSet() == fullSet())

    // store modified behind the view's back -> stale, next delta recovers
    store.modify("G", edgeDf((9, 9)))
    assert(!view.isFresh)
    view.applyDelta(additions = edgeDf((4, 4)), deletions = edgeDf((9, 9)))
    assert(view.isFresh && viewSet() == fullSet() && viewSet() == Set((4, 4)))
  }

  test("DegreeView delta refresh equals full rebuild, multiplicity counted") {
    val base = java.nio.file.Files.createTempDirectory("degview").toString
    val store = new GraphStore(spark, s"$base/store")
    val view = new DegreeView(spark, store, "G", s"$base/view")
    def viewMap() = view.read().collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def fullMap() = {
      val e = store.read("G")
      val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("o"))
      val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("i"))
      out.join(in, Seq("node"), "full_outer").collect().map { r =>
        val o = if (r.isNullAt(1)) 0L else r.getLong(1)
        val i = if (r.isNullAt(2)) 0L else r.getLong(2)
        r.getInt(0) -> (o, i, o + i)
      }.toMap
    }

    // (1,2) twice: degrees MUST count multi-edges, unlike the pair view
    store.add("G", edgeDf((0, 1), (1, 2), (1, 2), (2, 3)))
    view.rebuild()
    assert(view.isFresh && viewMap() == fullMap())
    assert(viewMap()(1) == ((2L, 1L, 3L))) // out counts both (1,2) rows

    // delete the multi-edge key (removes BOTH rows), re-add it once,
    // stack an extra row on a surviving key, add a brand-new key
    view.applyDelta(
      additions = edgeDf((1, 2), (0, 1), (5, 6)),
      deletions = edgeDf((1, 2)))
    assert(view.isFresh && viewMap() == fullMap())
    assert(viewMap()(1) == ((1L, 2L, 3L))) // (1,2) back to one row; in from 0 twice
    assert(viewMap()(0) == ((2L, 0L, 2L))) // (0,1) stacked to multiplicity 2

    // chained delta: a node whose degree drops to zero leaves the view
    view.applyDelta(additions = edgeDf(), deletions = edgeDf((5, 6)))
    assert(view.isFresh && viewMap() == fullMap() && !viewMap().contains(5))

    // store modified behind the view's back -> stale, next delta recovers
    store.modify("G", edgeDf((9, 8)))
    assert(!view.isFresh)
    view.applyDelta(additions = edgeDf((4, 3)), deletions = edgeDf())
    assert(view.isFresh && viewMap() == fullMap())
    assert(viewMap() == Map(9 -> ((1L, 0L, 1L)), 8 -> ((0L, 1L, 1L)),
      4 -> ((1L, 0L, 1L)), 3 -> ((0L, 1L, 1L))))
  }

  test("DegreeView half-published snapshot is invisible and recovered") {
    val base = java.nio.file.Files.createTempDirectory("degviewcrash").toString
    val store = new GraphStore(spark, s"$base/store")
    val view = new DegreeView(spark, store, "G", s"$base/view")
    store.add("G", edgeDf((0, 1), (1, 2)))
    view.rebuild()
    view.applyDelta(additions = edgeDf((2, 3)), deletions = edgeDf())
    assert(view.version.contains(2L) && view.isFresh)

    // a writer that crashed between the kcnt and deg writes leaves a
    // markerless v3: must not become the served version
    val p = java.nio.file.Paths.get(s"$base/view/v3/kcnt")
    java.nio.file.Files.createDirectories(p)
    assert(view.version.contains(2L) && view.isFresh)
    assert(view.read().count() == 4) // v2 still serves (nodes 0,1,2,3)

    // crash AFTER the marker was removed (simulates marker-less newest
    // at the CURRENT graph version): view reports the older complete
    // snapshot, shows stale, and the next delta recovers via rebuild
    val marker = java.nio.file.Paths.get(s"$base/view/v2/_VIEW_OK")
    java.nio.file.Files.delete(marker)
    assert(view.version.contains(1L) && !view.isFresh)
    view.applyDelta(additions = edgeDf((5, 6)), deletions = edgeDf((0, 1)))
    assert(view.isFresh && view.version.contains(3L))
    val got = view.read().collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got == Map(1 -> 1L, 2 -> 2L, 3 -> 1L, 5 -> 1L, 6 -> 1L))
  }

  test("view vacuum retains the served snapshot and drops history + crash leftovers") {
    val base = java.nio.file.Files.createTempDirectory("viewvacuum").toString
    val store = new GraphStore(spark, s"$base/store")
    val dv = new DegreeView(spark, store, "G", s"$base/dv")
    val pv = new DistinctPairView(spark, store, "G", s"$base/pv")
    store.add("G", edgeDf((0, 1), (1, 2)))
    dv.rebuild(); pv.rebuild()
    dv.applyDelta(additions = edgeDf((2, 3)), deletions = edgeDf())
    pv.applyDelta(additions = edgeDf((3, 4)), deletions = edgeDf())
    // view versions now: dv {1,2}, pv {1,3} (pv's delta bumped store to 3)
    intercept[IllegalArgumentException](dv.vacuum(0))
    // plant a markerless crash leftover; vacuum sweeps it too
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/dv/v9/kcnt"))
    assert(dv.vacuum(1).toSet == Set(1L, 9L))
    assert(dv.version.contains(2L) && dv.read().count() == 4)
    assert(pv.vacuum(1) == Seq(1L))
    assert(pv.version.contains(3L))
    assert(pv.read().collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((0, 1), (1, 2), (2, 3), (3, 4)))
    // vacuum keeps everything when keepLast covers all versions
    assert(dv.vacuum(5).isEmpty)
  }

  test("DegreeView incremental refresh never scans the base edge table") {
    // The g21 serve-path guarantee, proven the brutal way: after the
    // store publishes the delta, DELETE every base snapshot's data
    // files — the incremental refresh must still succeed (it reads only
    // the view's own kcnt/deg snapshots + the delta) and produce the
    // same degrees a full rebuild would have.
    val base = java.nio.file.Files.createTempDirectory("degviewnoscan").toString
    val store = new GraphStore(spark, s"$base/store")
    val view = new DegreeView(spark, store, "G", s"$base/view")
    store.add("G", edgeDf((0, 1), (1, 2), (1, 2), (2, 3)))
    view.rebuild()
    assert(view.isFresh)
    val adds = edgeDf((3, 4), (1, 2))
    val dels = edgeDf((0, 1))
    // expected result of (base ∖ {(0,1)}) ∪ adds, multiplicity counted:
    // edges (1,2)x3, (2,3), (3,4)
    val expected = Map(
      1 -> ((3L, 0L, 3L)), 2 -> ((1L, 3L, 4L)),
      3 -> ((1L, 1L, 2L)), 4 -> ((0L, 1L, 1L)))
    store.applyDelta("G", adds, dels) // view now one version behind
    // scorched earth: no base data left to scan
    store.versions("G").foreach { v =>
      val d = java.nio.file.Paths.get(s"$base/store/G/v$v")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    view.refreshIncremental(adds, dels)
    assert(view.isFresh && view.version.contains(2L))
    val got = view.read().collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("g21 repeated invocations share one stored base: same result, flat disk") {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def g21Dirs() = java.nio.file.Files.list(tmp).iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft_g21")).toSet
    def versionDirs(p: java.nio.file.Path) =
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(d => java.nio.file.Files.isDirectory(d) &&
          d.getFileName.toString.matches("v\\d+")).toSeq

    val before = g21Dirs()
    def run() = SparkEntry.queries("g21_stored_degrees")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toList
    val first = run()
    assert(first.nonEmpty)
    assert(run() == first) // delta is idempotent against the shared base
    assert(run() == first)
    // at most one scratch dir for the whole session — zero new when an
    // earlier suite in this session (e.g. Smoke) already ran g21 —
    // never one per invocation
    assert((g21Dirs() -- before).size <= 1)
    // and vacuum keeps store+view snapshots bounded (≤3 store versions
    // + ≤3 view versions live right after a delta), so disk cannot
    // grow with the invocation count
    g21Dirs().foreach(d => assert(versionDirs(d).size <= 6))
  }

  test("GraphStore.repair re-publishes the newest complete snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graphrepair").toString
    val store = new GraphStore(spark, dir)
    store.add("G", edgeDf((0, 1)))
    store.modify("G", edgeDf((1, 2)))
    assert(store.currentVersion("G").contains(2L))
    // simulate a writer that died between its rollback rename and the
    // fix-up loop: pointer rolled back to v1 while complete v2 exists
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/G/_CURRENT"), "v1".getBytes("UTF-8"))
    assert(store.currentVersion("G").contains(1L))
    assert(store.repair("G").contains(2L))
    assert(store.currentVersion("G").contains(2L))
    assert(store.read("G").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 2)))
    // repair on a healthy store is a no-op
    assert(store.repair("G").contains(2L))
  }
}
