package graft

import org.apache.spark.sql.functions._

/** The serving daemon end to end: a real Thrift JDBC endpoint in this
  * JVM, queried with the stock Hive JDBC driver — the path a BI tool
  * takes. Covers the last reference serving role (docs/bi.md:5,
  * docs/olap.md:17): SQL over JDBC answered by the engine, dashboard
  * aggregates routed onto the cuboid lattice. */
class ServeSpec extends SparkSuite {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("JDBC client gets engine answers; dashboard agg routes to the " +
      "lattice-backed result") {
    val port = freePort()
    // the thrift server mutates session confs on the SHARED suite
    // session (observed: spark.sql.datetime.java8API.enabled flips to
    // true, which makes Row.getDate throw for every later date-typed
    // suite) — snapshot and restore around the daemon
    val confBefore = spark.conf.getAll
    val server = Serve.start(spark, port, sf)
    try {
      // the server binds asynchronously; poll the socket
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/default"
      var conn: java.sql.Connection = null
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (conn == null) {
        try conn = java.sql.DriverManager.getConnection(url, "graft", "")
        catch {
          case e: Exception =>
            if (System.nanoTime() > deadline) throw e
            Thread.sleep(500)
        }
      }
      try {
        // 1) plain SQL over JDBC == DataFrame API on the same session
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT l_returnflag, COUNT(*) AS n, " +
            "MIN(l_quantity) AS mn FROM lineitem " +
            "GROUP BY l_returnflag ORDER BY l_returnflag")
        val viaJdbc = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
          .toList
        val viaApi = Engine.table(spark, sf, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), min("l_quantity").as("mn"))
          .orderBy("l_returnflag")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .toList
        assert(viaJdbc == viaApi, s"jdbc $viaJdbc != api $viaApi")
        assert(viaJdbc.nonEmpty)

        // 2) the Kylin move: a fact-table dashboard aggregate served
        // over JDBC matches the raw-fact answer (routing is enabled
        // daemon-wide; CubeSpec pins that this exact shape scans the
        // {l_suppkey} cuboid, not the fact)
        val rs2 = st.executeQuery(
          "SELECT l_suppkey, COUNT(*) AS n FROM lineitem " +
            "GROUP BY l_suppkey ORDER BY l_suppkey LIMIT 5")
        val routed = Iterator.continually(rs2).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getLong(2))).toList
        val naive = Engine.table(spark, sf, "lineitem")
          .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
          .orderBy("l_suppkey").limit(5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toList
        assert(routed == naive, s"routed $routed != naive $naive")
        // 2b) the vtab SQL surface over JDBC: a BI tool can time-travel
        // and tail CDC with plain SQL — the serve session shares the
        // suite session (singleSession), so the injected resolution
        // rule answers these exactly like the Scala API
        locally {
          import spark.implicits._
          val root = java.nio.file.Files
            .createTempDirectory("graft_vtab_jdbc").toString
          graft.operators.VersionedTable.commit(spark, root,
            Seq((1L, "a")).toDF("id", "s"))
          graft.operators.VersionedTable.commit(spark, root,
            Seq((2L, "b")).toDF("id", "s"))
          val rsT = st.executeQuery(
            s"SELECT id FROM vtab.`$root` VERSION AS OF 1")
          val v1 = Iterator.continually(rsT).takeWhile(_.next())
            .map(_.getLong(1)).toList
          assert(v1 == List(1L), s"vtab over JDBC: $v1")
          val rsC = st.executeQuery(
            s"SELECT id, change FROM vtab_changes.`$root` VERSION AS OF 1")
          val cdc = Iterator.continually(rsC).takeWhile(_.next())
            .map(r => (r.getLong(1), r.getString(2))).toList
          assert(cdc == List((2L, "insert")), s"vtab_changes over JDBC: $cdc")
          // bounded CDC via the table_changes TVF — same from/to
          // contract as changesBetween (exclusive from, inclusive to)
          val rsB = st.executeQuery(
            s"SELECT id, change FROM table_changes('$root', 1, 2)")
          val bounded = Iterator.continually(rsB).takeWhile(_.next())
            .map(r => (r.getLong(1), r.getString(2))).toList
          assert(bounded == List((2L, "insert")),
            s"table_changes over JDBC: $bounded")
          // a SQL-first user can WRITE versions over JDBC too: every
          // routed DML verb commits through the manifest APIs
          st.executeUpdate(s"INSERT INTO vtab.`$root` VALUES (3, 'c')")
          val rsI = st.executeQuery(
            s"SELECT id FROM vtab.`$root` VERSION AS OF 3 ORDER BY id")
          val v3 = Iterator.continually(rsI).takeWhile(_.next())
            .map(_.getLong(1)).toList
          assert(v3 == List(1L, 2L, 3L), s"routed INSERT over JDBC: $v3")
          st.executeUpdate(
            s"UPDATE vtab.`$root` SET s = 'upd' WHERE id = 2")   // v4
          st.executeUpdate(
            s"""MERGE INTO vtab.`$root` t
                USING (SELECT 3 AS id, 'x' AS s
                       UNION ALL SELECT 9, 'new') s
                ON t.id = s.id
                WHEN MATCHED AND s.s = 'x' THEN DELETE
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")               // v5
          val rsD = st.executeQuery(
            s"SELECT id, s FROM vtab.`$root` ORDER BY id")
          val latest = Iterator.continually(rsD).takeWhile(_.next())
            .map(r => (r.getLong(1), r.getString(2))).toList
          assert(latest == List((1L, "a"), (2L, "upd"), (9L, "new")),
            s"routed UPDATE+MERGE over JDBC: $latest")
          // 2c) by NAME: a dashboard registers once, then every query
          // addresses the table like any catalog table — no temp
          // paths pasted into BI SQL (the reference's bi.md shape)
          st.executeQuery(
            s"SELECT vtab_register('dws_jdbc.inv', '$root')").next()
          val rsN = st.executeQuery(
            "SELECT id FROM dws_jdbc.inv VERSION AS OF 1")
          val n1 = Iterator.continually(rsN).takeWhile(_.next())
            .map(_.getLong(1)).toList
          assert(n1 == List(1L), s"named vtab over JDBC: $n1")
          st.executeUpdate(
            "INSERT INTO dws_jdbc.inv VALUES (11, 'named')")   // v6
          val rsN2 = st.executeQuery(
            "SELECT id, change FROM table_changes('dws_jdbc.inv', 5, 6)")
          val nCdc = Iterator.continually(rsN2).takeWhile(_.next())
            .map(r => (r.getLong(1), r.getString(2))).toList
          assert(nCdc == List((11L, "insert")),
            s"named table_changes over JDBC: $nCdc")
          // DROP over JDBC unregisters; data (all 6 versions) stays
          st.executeUpdate("DROP TABLE dws_jdbc.inv")
          assert(graft.operators.VTabCatalog.resolve("dws_jdbc.inv").isEmpty)
          assert(graft.operators.VersionedTable
            .versions(spark, root).size == 6,
            "DROP by name must not touch the table's versions")
        }

        // 3) concurrent dashboards: N parallel connections, each its
        // own statement, all answered correctly (the daemon's only
        // per-query state is Spark's scheduler — this pins that the
        // shared singleSession state is safe under concurrency)
        val expected = viaApi.map(_._2).sum
        val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
        try {
          val futures = (1 to 8).map { _ =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                val c = java.sql.DriverManager.getConnection(url, "graft", "")
                try {
                  val r = c.createStatement()
                    .executeQuery("SELECT COUNT(*) FROM lineitem")
                  r.next(); r.getLong(1)
                } finally c.close()
              }
            })
          }
          futures.foreach(f =>
            assert(f.get(60, java.util.concurrent.TimeUnit.SECONDS)
              == expected))
        } finally pool.shutdownNow()
      } finally conn.close()
    } finally {
      server.stop()
      // the daemon flips state session-wide; restore for other suites
      val exp = spark.experimental
      exp.extraOptimizations = exp.extraOptimizations
        .filterNot(_ == graft.plans.AggRouteRewrite)
      val confAfter = spark.conf.getAll
      (confAfter.keySet ++ confBefore.keySet).foreach { k =>
        (confBefore.get(k), confAfter.get(k)) match {
          case (Some(v0), cur) if !cur.contains(v0) =>
            try spark.conf.set(k, v0)
            catch { case _: Exception => () } // static conf: skip
          case (None, Some(_)) =>
            try spark.conf.unset(k)
            catch { case _: Exception => () }
          case _ => ()
        }
      }
    }
  }
}
