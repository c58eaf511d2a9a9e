package graft

import graft.engine._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Engine concurrency soak (VERDICT r13 #5): OperationManager's pool
  * mirrors the reference's concurrent gateway (MiniClusterRunner.java:
  * 124-132), and single-statement lifecycle/cancel is spec'd, but nothing
  * pinned N concurrent mixed batch/stream statements with mid-flight
  * cancels. This spec runs every statement SOLO first (recording its
  * drained pages), then re-runs all of them CONCURRENTLY — 12 batch + 2
  * unbounded streaming — firing randomized-delay cancels at a seeded
  * subset mid-flight, and asserts:
  *
  *  - result-store isolation: every surviving operation's drained rows are
  *    identical to its solo run (a cancel that leaked into a neighbor's
  *    job group would kill or truncate it — the "Failed to cancel job
  *    group" warnings in the test logs are now pinned benign);
  *  - canceled operations land in Canceled with a terminating store (EOS
  *    reachable — a fetch loop must not hang);
  *  - survivors land in Finished with no error.
  */
class EngineConcurrencySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = GraftSession.local("8")
  lazy val session: EngineSession = {
    val s = new EngineSession(spark)
    Tables.registerAll(spark, dir)
    s.executeSync("SET 'execution.runtime-mode' = 'batch'")
    s
  }

  private def drain(h: OperationHandle, maxPages: Int = 400): Seq[Seq[Any]] = {
    var token = 0L
    val out = Seq.newBuilder[Seq[Any]]
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val r = session.ops.fetch(h, token)
      out ++= r.rows.map(_.fields)
      r.resultType match {
        case "EOS" => done = true
        case "PAYLOAD" => token = r.nextToken.get
        case "NOT_READY" => Thread.sleep(20)
      }
      pages += 1
    }
    assert(done, s"store did not terminate within $maxPages pages")
    out.result()
  }

  private def canon(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.map(String.valueOf).mkString("|")).sorted

  // deterministic ORDER BY-free aggregations — pages may arrive in any
  // order, canon() sorts, so solo-vs-concurrent equality is well-defined
  private val batchStatements: Seq[String] = Seq(
    "SELECT l_returnflag, count(*) AS c, sum(l_quantity) AS q FROM lineitem GROUP BY l_returnflag",
    "SELECT count(*) AS c FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey",
    "SELECT o_orderpriority, count(*) AS c FROM orders GROUP BY o_orderpriority",
    "SELECT count(DISTINCT l_orderkey) AS c FROM lineitem",
    "SELECT max(length(text)) AS m, count(*) AS c FROM documents",
    "SELECT source, count(*) AS c FROM documents GROUP BY source",
    "SELECT count(*) AS c FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_totalprice > 1000",
    "SELECT event_type, count(*) AS c FROM events GROUP BY event_type",
    "SELECT avg(l_quantity) AS a FROM lineitem",
    "SELECT n_name, count(*) AS c FROM nation GROUP BY n_name",
    "SELECT count(*) AS c FROM part a JOIN part b ON a.p_brand = b.p_brand",
    "SELECT l_linestatus, min(l_discount) AS mn, max(l_discount) AS mx FROM lineitem GROUP BY l_linestatus")

  test("10+ concurrent mixed ops with randomized mid-flight cancels: survivors byte-identical to solo") {
    // ------------------------------------------------------------- solo
    val solo: Map[String, Seq[String]] = batchStatements.map { sql =>
      sql -> canon(drain(session.executeSync(sql).handle))
    }.toMap
    solo.values.foreach(rows => assert(rows.nonEmpty))

    // two unbounded streaming statements (datagen source): these NEVER
    // finish on their own — they are the guaranteed mid-flight targets
    session.executeSync(
      """CREATE TABLE soak_stream_a (id BIGINT, v INT) WITH (
        |  'connector' = 'datagen', 'rows-per-second' = '200',
        |  'fields.v.min' = '0', 'fields.v.max' = '9')""".stripMargin)
    session.executeSync(
      """CREATE TABLE soak_stream_b (id BIGINT, v INT) WITH (
        |  'connector' = 'datagen', 'rows-per-second' = '200',
        |  'fields.v.min' = '0', 'fields.v.max' = '9')""".stripMargin)

    // ------------------------------------------------------- concurrent
    val rnd = new scala.util.Random(20260814L)
    val victims = rnd.shuffle(batchStatements).take(3).toSet
    val handles = batchStatements.map(sql => sql -> session.execute(sql))
    val streamHandles = Seq(
      "SELECT v, count(*) AS c FROM soak_stream_a GROUP BY v",
      "SELECT v, count(*) AS c FROM soak_stream_b GROUP BY v")
      .map(sql => session.execute(sql))

    // randomized-delay cancels while the fleet is in flight
    val cancelers = (handles.filter(h => victims(h._1)).map(_._2) ++ streamHandles)
      .map { h =>
        val delay = 50 + rnd.nextInt(400)
        new Thread(() => { Thread.sleep(delay); session.ops.cancel(h) })
      }
    cancelers.foreach(_.start())
    cancelers.foreach(_.join())

    // ------------------------------------------------------- assertions
    val deadline = System.nanoTime() + 180L * 1000000000L
    handles.foreach { case (sql, h) =>
      while (Set(OpStatus.Pending, OpStatus.Running).contains(session.ops.status(h)) &&
          System.nanoTime() < deadline)
        Thread.sleep(20)
      val st = session.ops.status(h)
      if (victims(sql)) {
        // cancel() marks Canceled unconditionally (even if the op had just
        // finished — the gateway surfaces the user's intent); either way
        // the store must terminate and a fetch loop must not hang
        assert(st == OpStatus.Canceled, s"victim '$sql' in state $st")
        drain(h) // must reach EOS, content unspecified mid-cancel
      } else {
        assert(st == OpStatus.Finished,
          s"survivor '$sql' in state $st err=${session.ops.get(h).flatMap(_.error)}")
        assert(canon(drain(h)) == solo(sql),
          s"survivor '$sql' diverged from its solo run under concurrency")
      }
    }
    streamHandles.foreach { h =>
      assert(session.ops.status(h) == OpStatus.Canceled)
      val info = session.ops.get(h).get
      info.streamingQuery.foreach(q => assert(!q.isActive, "stream still running after cancel"))
      drain(h) // EOS reachable on a canceled stream store
    }
  }

  test("fetch on an op canceled before store creation answers EOS, not NOT_READY forever") {
    // deterministic form of the race the soak caught probabilistically:
    // the body parks BEFORE creating its store, cancel lands, and a
    // well-behaved fetch loop must terminate (pre-fix: NOT_READY forever)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val h = session.ops.submit("soak: storeless cancel") { _ =>
      gate.await() // park with store = None
    }
    // op is Pending/Running with no store: fetch must hold the line open
    assert(session.ops.fetch(h, 0L).resultType == "NOT_READY")
    session.ops.cancel(h)
    gate.countDown()
    assert(session.ops.status(h) == OpStatus.Canceled)
    val r = session.ops.fetch(h, 0L)
    assert(r.resultType == "EOS" && r.rows.isEmpty,
      s"terminal storeless op answered ${r.resultType}")
  }

  test("cancel is atomic with the Pending->Running transition") {
    // the r15 advisor gap: cancel landing between the runnable's Canceled
    // check and its Running write was LOST (the op ran to Finished). The
    // transition primitives are synchronized now — pin their invariants
    // deterministically rather than racing the pool.
    val a = new OperationInfo(OperationHandle("t-a"), "s")
    a.markCanceled()
    assert(!a.tryStart(), "tryStart must refuse after cancel")
    assert(a.status == OpStatus.Canceled)
    val b = new OperationInfo(OperationHandle("t-b"), "s")
    assert(b.tryStart())
    b.markCanceled() // cancel mid-run
    b.finishIfRunning() // body completion must NOT overwrite the cancel
    assert(b.status == OpStatus.Canceled,
      "Canceled must stick through body completion")
  }

  test("a fetch racing the store-assign/Finished window never drops results") {
    // r15 advice (TOCTOU): fetch used to read store BEFORE status, so it
    // could observe store=None, lose the CPU across the body's
    // store-assign + Finished write, then observe Finished and answer an
    // empty EOS — silently dropping the op's rows. fetch now reads status
    // FIRST (store write happens-before the Finished write, so a terminal
    // status guarantees store visibility). Hammer the exact window: tight
    // unthrottled fetch spins against bodies that assign a one-row store
    // and immediately finish — the first terminal answer must always carry
    // the row, never an empty EOS.
    (1 to 500).foreach { i =>
      val h = session.ops.submit(s"toctou $i") { info =>
        val store = new ResultStore(Seq("v"))
        store.append(Seq(i))
        store.markEos()
        info.store = Some(store)
      }
      var r = session.ops.fetch(h, 0L)
      val deadline = System.nanoTime() + 10e9.toLong
      while (r.resultType == "NOT_READY" && System.nanoTime() < deadline)
        r = session.ops.fetch(h, 0L) // no sleep — maximize window pressure
      // the terminal page carries the final rows (an at-EOS store serves
      // rows WITH resultType=EOS); the drop-bug signature is specifically
      // an EMPTY terminal answer for an op that produced a row
      assert(r.rows.map(_.fields) == Seq(Seq(i)),
        s"iteration $i: first terminal fetch was ${r.resultType} with " +
          s"${r.rows.size} rows — results dropped in the assign/Finish window")
    }
  }

  test("fetch on a Finished op that never created a store answers EOS") {
    // DDL/SET-shaped bodies legitimately finish storeless; store is only
    // assigned inside the body, so Finished-with-no-store is final and a
    // fetch loop must terminate (pre-fix: NOT_READY forever)
    val h = session.ops.submit("soak: storeless finish") { _ => () }
    val deadline = System.nanoTime() + 10e9.toLong
    while (session.ops.status(h) != OpStatus.Finished &&
      System.nanoTime() < deadline) Thread.sleep(5)
    assert(session.ops.status(h) == OpStatus.Finished)
    val r = session.ops.fetch(h, 0L)
    assert(r.resultType == "EOS" && r.rows.isEmpty,
      s"Finished storeless op answered ${r.resultType}")
  }
}
