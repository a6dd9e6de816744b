package graft

import org.apache.spark.sql.functions._

import graft.meta.{AuthContext, JdbcMetaStore, PermissionDeniedException, TableInfo}
import graft.tables.GraftTable

/** Domain-scoped catalog authorization, mirroring the reference's
  * RBACOperationSuite grant/deny cases (lakesoul-spark/src/test/scala/com/
  * dmetasoul/lakesoul/meta/RBACOperationSuite.scala — there enforced by PG
  * roles + row-level security, here by [[JdbcMetaStore]]'s store-level
  * checks since PostgreSQL is unreachable in this environment):
  *   - testDifferentDomain: another domain's namespaces/tables are
  *     INVISIBLE ("cannot be found"), creation under them fails, the RLS
  *     policy blocks claiming their names;
  *   - testDifferentRole: ordinary users CRUD tables inside their domain
  *     but get "permission denied for table namespace" on namespace
  *     management;
  *   - public stays shared (the single-tenant default every other suite
  *     runs under);
  *   - the FILE store refuses non-public identities loudly — it has no
  *     arbitration to back an access-control promise. */
class RbacSuite extends SparkFixture {
  import spark.implicits._

  private val admin1 = AuthContext("admin1", "domain1", admin = true)
  private val admin2 = AuthContext("admin2", "domain2", admin = true)
  private val user1 = AuthContext("user1", "domain1", admin = false)

  private def rows = (1 to 20).map(i => (i.toLong, i * 10)).toDF("id", "v")

  private def freshStore(tag: String) = new JdbcMetaStore(
    s"jdbc:derby:memory:rbac$tag${java.lang.Long.toHexString(System.nanoTime())};create=true")

  test("cross-domain tables are invisible; same-domain users keep full CRUD") {
    withTempPath { path =>
      val store = freshStore("t1")
      AuthContext.as(admin1) {
        val t = GraftTable.create(spark, rows, path,
          hashColumns = Seq("id"), bucketNum = 2, store = store)
        t.upsert(rows.withColumn("v", col("v") + 1))
        assert(t.toDF.count() == 20)
        assert(store.getTableInfo(path).exists(
          _.properties.get(TableInfo.DomainProp).contains("domain1")))
      }
      // another DOMAIN: the table reports exactly like a missing one
      AuthContext.as(admin2) {
        assert(store.getTableInfo(path).isEmpty)
        val e = intercept[Exception] {
          GraftTable.forPath(spark, path, store = store).toDF.count()
        }
        assert(e.getMessage.contains("no graft table"), e.getMessage)
        intercept[IllegalArgumentException](store.dropTable(path))
        intercept[IllegalArgumentException](store.restoreTable(path, 0L))
        intercept[IllegalArgumentException](
          store.commit(path, Nil, Map.empty))
      }
      // an ORDINARY USER of the owning domain reads and writes freely
      AuthContext.as(user1) {
        val t = GraftTable.forPath(spark, path, store = store)
        t.upsert(rows.filter(col("id") % 2 === 0)
          .withColumn("v", col("v") * 5))
        assert(t.toDF.count() == 20)
        t.deleteTombstone(col("id") > 15)
        assert(t.toDF.count() == 15)
      }
      // and the owner still sees the user's writes
      AuthContext.as(admin1) {
        assert(GraftTable.forPath(spark, path, store = store).toDF.count() == 15)
      }
    }
  }

  test("public tables stay shared across every identity") {
    withTempPath { path =>
      val store = freshStore("t2")
      // created under the default public context — no domain stamp at all
      val t = GraftTable.create(spark, rows, path,
        hashColumns = Seq("id"), bucketNum = 2, store = store)
      assert(store.getTableInfo(path).exists(
        !_.properties.contains(TableInfo.DomainProp)))
      AuthContext.as(admin2) {
        val h = GraftTable.forPath(spark, path, store = store)
        h.upsert(rows.withColumn("v", col("v") + 7))
        assert(h.toDF.count() == 20)
      }
      assert(t.toDF.count() == 20)
    }
  }

  test("namespace management is admin-only and domain-visible") {
    val store = freshStore("t3")
    AuthContext.as(admin1)(store.createNamespace("database1"))
    AuthContext.as(user1) {
      // users see their domain's namespaces but cannot manage them
      assert(store.listNamespaces() == Seq("database1"))
      val e1 = intercept[PermissionDeniedException](
        store.createNamespace("database3"))
      assert(e1.getMessage.contains("permission denied for table namespace"))
      intercept[PermissionDeniedException](store.dropNamespace("database1"))
    }
    AuthContext.as(admin2) {
      // another domain: database1 is invisible, its NAME is still protected
      assert(store.listNamespaces().isEmpty)
      assert(store.namespaceDomain("database1").isEmpty)
      val e2 = intercept[PermissionDeniedException](
        store.createNamespace("database1"))
      assert(e2.getMessage.contains("row-level security"))
      intercept[IllegalArgumentException](store.dropNamespace("database1"))
      store.createNamespace("database2")
      assert(store.listNamespaces() == Seq("database2"))
    }
    // idempotent same-domain re-create; drop removes
    AuthContext.as(admin1) {
      store.createNamespace("database1")
      store.dropNamespace("database1")
      assert(store.listNamespaces().isEmpty)
    }
  }

  test("table creation under a foreign namespace fails as no-such-namespace") {
    val store = freshStore("t4")
    AuthContext.as(admin1)(store.createNamespace("database1"))
    val info = TableInfo("tid-rbac-1", "/tmp/rbac-ns-t1",
      rows.schema.json, Nil, Seq("id"), 2, Map.empty,
      shortName = Some("database1.table3"))
    AuthContext.as(admin2) {
      val e = intercept[IllegalArgumentException](store.createTable(info))
      assert(e.getMessage.contains("no such namespace"), e.getMessage)
    }
    // the owning domain's USER can create under it — and the table
    // inherits the namespace's domain
    AuthContext.as(user1) {
      store.createTable(info)
      assert(store.getTableInfo("/tmp/rbac-ns-t1").exists(
        _.properties.get(TableInfo.DomainProp).contains("domain1")))
    }
    AuthContext.as(admin2) {
      assert(store.getTableInfo("/tmp/rbac-ns-t1").isEmpty)
    }
    AuthContext.as(admin1)(store.dropTable("/tmp/rbac-ns-t1"))
  }

  test("explicitly claiming a foreign domain on create violates the policy") {
    val store = freshStore("t5")
    val info = TableInfo("tid-rbac-2", "/tmp/rbac-claim-t1",
      rows.schema.json, Nil, Seq("id"), 2,
      Map(TableInfo.DomainProp -> "domain2"), None)
    AuthContext.as(admin1) {
      val e = intercept[PermissionDeniedException](store.createTable(info))
      assert(e.getMessage.contains("row-level security"))
    }
  }

  test("SQL namespace DDL enforces RBAC when the catalog runs on a JDBC store") {
    val store = freshStore("t6")
    val prevWh = spark.conf.getOption("spark.graft.warehouse")
    try {
      val cat = new graft.catalog.GraftCatalogV2 {
        override protected def metaStore: graft.meta.MetaStore = store
      }
      cat.initialize("rbac_cat",
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("warehouse",
            java.nio.file.Files.createTempDirectory("rbacwh-").toString)))
      val none = java.util.Map.of[String, String]()
      AuthContext.as(admin1)(cat.createNamespace(Array("db1"), none))
      AuthContext.as(user1) {
        // visible to the domain's users, but management is admin-only
        assert(cat.listNamespaces().map(_.mkString(".")).contains("db1"))
        intercept[PermissionDeniedException](cat.createNamespace(Array("db9"), none))
        intercept[PermissionDeniedException](cat.dropNamespace(Array("db1"), cascade = false))
      }
      AuthContext.as(admin2) {
        // foreign domain: invisible, name protected, drop reports absent
        assert(!cat.listNamespaces().map(_.mkString(".")).contains("db1"))
        intercept[PermissionDeniedException](cat.createNamespace(Array("db1"), none))
        intercept[org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException](
          cat.dropNamespace(Array("db1"), cascade = false))
      }
      AuthContext.as(admin1) {
        assert(cat.dropNamespace(Array("db1"), cascade = false))
        assert(!cat.listNamespaces().map(_.mkString(".")).contains("db1"))
      }
    } finally prevWh match {
      case Some(w) => spark.conf.set("spark.graft.warehouse", w)
      case None => spark.conf.unset("spark.graft.warehouse")
    }
  }

  test("property: RBAC x multi-table txn x restore x strict streams under 100 random schedules") {
    // META-LEVEL model check (no Spark jobs — the invariants live in the
    // catalog): each schedule drives a random interleaving of cross-table
    // commitMany transactions (marker commits to tables A and B), restores
    // of A, and foreign-identity commit attempts, while two concurrent
    // observers run throughout:
    //   - the FOREIGN observer (domain2) must never see either table, in
    //     any intermediate state — invisibility is not eventually
    //     consistent;
    //   - the DOMAIN observer reads A's head snapshot then B's: every
    //     txn marker visible in A (read FIRST) must already be in B —
    //     a half-committed cross-table transaction would break the subset
    //     (restores only ever run against A, which shrinks the left side
    //     and can never mask a violation).
    // After the writer finishes, a strict incremental window crossing any
    // state-changing restore must abort with NonIncrementalWindowException
    // (the streaming source's re-pin contract), and a foreign commit
    // attempt must have left NO marker in either table.
    import graft.meta.{CommitOp, DataCommitInfo, DataFileInfo, MetaRerunException, MetaStore, SnapshotResolver, TableInfo => TI}
    val rnd = new scala.util.Random(20260815)
    val store = freshStore("prop")
    val resolver = new SnapshotResolver(store)
    // Derby under concurrent readers/writers surfaces transient 40* lock
    // states as MetaRerunException (absorbed by withRetry on real paths);
    // the test's raw store calls absorb them the same way
    def retry[T](body: => T): T = {
      var last: Throwable = null
      for (_ <- 0 until 200) {
        try return body
        catch { case e: MetaRerunException => last = e; Thread.sleep(2) }
      }
      throw last
    }
    def ti(path: String) = TI(
      tableId = java.util.UUID.randomUUID().toString, tablePath = path,
      schemaJson = """{"type":"struct","fields":[]}""",
      rangeColumns = Nil, hashColumns = Seq("id"), bucketNum = 2,
      properties = Map.empty, shortName = None)
    def marker(tag: String) = DataCommitInfo(MetaStore.newCommitId(), "a",
      Seq(DataFileInfo(s"/f/$tag.parquet", "add", 10L, 0)),
      CommitOp.Merge, 0L)
    def headSnapshot(path: String): Set[String] =
      retry(store.partitionVersions(path, "a")).lastOption
        .map(_.snapshot.toSet).getOrElse(Set.empty)
    def headVersion(path: String): Int =
      retry(store.partitionVersions(path, "a")).lastOption.map(_.version).getOrElse(-1)

    for (sched <- 1 to 100) {
      val pa = s"/prop/$sched/a"; val pb = s"/prop/$sched/b"
      AuthContext.as(admin1) {
        store.createTable(ti(pa)); store.createTable(ti(pb))
      }
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val foreignObserver = new Thread(() => AuthContext.as(admin2) {
        while (!stop.get()) {
          if (retry(store.getTableInfo(pa)).isDefined ||
              retry(store.getTableInfo(pb)).isDefined)
            violations.add(s"sched $sched: foreign domain saw a table")
          try { retry(store.commit(pa, Seq(marker("foreign-observer")),
              Map("a" -> headVersion(pa))))
            violations.add(s"sched $sched: foreign commit succeeded") }
          catch { case _: IllegalArgumentException => () }
          Thread.sleep(1)
        }
      })
      val domainObserver = new Thread(() => AuthContext.as(user1) {
        while (!stop.get()) {
          val sa = headSnapshot(pa) // A FIRST — see invariant note above
          val sb = headSnapshot(pb)
          val missing = sa.filterNot(sb)
          if (missing.nonEmpty)
            violations.add(s"sched $sched: half-committed txn visible: $missing")
        }
      })
      foreignObserver.start(); domainObserver.start()

      var restoredAfter = List.empty[Long] // pre-restore boundaries of state-changing restores
      try AuthContext.as(if (rnd.nextBoolean()) admin1 else user1) {
        for (op <- 0 until 4 + rnd.nextInt(5)) rnd.nextInt(10) match {
          case r if r <= 5 => // cross-table txn: one marker to BOTH tables
            val m = MetaStore.newCommitId()
            val c = marker(s"txn-$sched-$op")
            retry(store.commitMany(Seq(
              (pa, Seq(c.copy(commitId = m)), Map("a" -> headVersion(pa))),
              (pb, Seq(c.copy(commitId = m)), Map("a" -> headVersion(pb))))))
          case 6 | 7 => // restore A to a random earlier boundary
            val before = retry(store.maxCommitTs(pa))
            if (before > 0 && AuthContext.current.admin) {
              val tsList = retry(store.commitTimestamps(pa))
              val asOf = tsList(rnd.nextInt(tsList.size))
              if (retry(store.restoreTable(pa, asOf)).nonEmpty)
                restoredAfter ::= asOf
            }
          case _ => // foreign txn attempt: must fail atomically (no marker in EITHER table)
            val m = MetaStore.newCommitId()
            val c = marker(s"foreign-$sched-$op")
            val (va, vb) = (headVersion(pa), headVersion(pb))
            AuthContext.as(admin2) {
              intercept[IllegalArgumentException](retry(store.commitMany(Seq(
                (pa, Seq(c.copy(commitId = m)), Map("a" -> va)),
                (pb, Seq(c.copy(commitId = m)), Map("a" -> vb))))))
            }
            assert(!headSnapshot(pa).contains(m) && !headSnapshot(pb).contains(m),
              s"sched $sched: foreign commit left a marker")
        }
      } finally {
        stop.set(true); foreignObserver.join(10000); domainObserver.join(10000)
      }
      assert(violations.isEmpty, violations.toArray.mkString("; "))
      // strict stream crossing a state-changing restore ALWAYS aborts
      restoredAfter.foreach { asOf =>
        AuthContext.as(user1) {
          intercept[graft.meta.NonIncrementalWindowException](
            resolver.incrementalFiles(pa, "a", asOf,
              retry(store.maxCommitTs(pa)), strict = true))
        }
      }
    }
  }

  test("a second store instance observes a domain handoff within the TTL window") {
    withTempPath { path =>
      // two store INSTANCES over the same database stand in for two JVMs:
      // each has its own domainCache, so a handoff committed through one is
      // visible to the other only when its cached entry expires (same-JVM
      // writes refresh immediately; a foreign JVM's can only age out)
      val url = s"jdbc:derby:memory:rbacttl${java.lang.Long.toHexString(System.nanoTime())};create=true"
      val prev = sys.props.get("graft.meta.domainCacheTtlMs")
      sys.props("graft.meta.domainCacheTtlMs") = "2000"
      try {
        val a = new JdbcMetaStore(url)
        val b = new JdbcMetaStore(url)
        AuthContext.as(admin1) {
          GraftTable.create(spark, rows, path,
            hashColumns = Seq("id"), bucketNum = 2, store = a)
        }
        // warm B's cache with domain1: admin2's mutation is denied as
        // not-found (and the denial path caches the raw-read domain)
        AuthContext.as(admin2) {
          intercept[IllegalArgumentException](b.commit(path, Nil, Map.empty))
        }
        // handoff through A: the owning admin moves the table to domain2
        AuthContext.as(admin1) {
          val i = a.getTableInfo(path).get
          a.updateTableInfo(i.copy(properties =
            i.properties + (TableInfo.DomainProp -> "domain2")))
        }
        // same-JVM refresh: A itself sees the new domain immediately —
        // admin1 lost the table through A without any TTL wait
        AuthContext.as(admin1) {
          intercept[IllegalArgumentException](a.commit(path, Nil, Map.empty))
        }
        // B's cache is stale for at most the TTL; past it the new owner's
        // mutation goes through and the old owner's is denied
        Thread.sleep(2300)
        AuthContext.as(admin2) { b.commit(path, Nil, Map.empty) }
        AuthContext.as(admin1) {
          intercept[IllegalArgumentException](b.commit(path, Nil, Map.empty))
        }
      } finally {
        prev match {
          case Some(v) => sys.props("graft.meta.domainCacheTtlMs") = v
          case None => sys.props.remove("graft.meta.domainCacheTtlMs")
        }
      }
    }
  }

  test("the file store refuses non-public identities loudly") {
    withTempPath { path =>
      AuthContext.as(admin1) {
        val e = intercept[UnsupportedOperationException] {
          GraftTable.create(spark, rows, path,
            hashColumns = Seq("id"), bucketNum = 2)
        }
        assert(e.getMessage.contains("single-user"), e.getMessage)
      }
      // back to public: everything works again
      assert(GraftTable.create(spark, rows, path,
        hashColumns = Seq("id"), bucketNum = 2).toDF.count() == 20)
    }
  }
}
