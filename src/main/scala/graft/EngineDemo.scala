package graft

import graft.engine._
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    val s = new EngineSession(spark)
    def show(label: String, h: OperationHandle, wait: Boolean = true): Unit = {
      if (wait) try s.awaitFinished(h) catch { case e: Throwable => println(s"$label => ERROR: ${e.getMessage.linesIterator.next()}"); return }
      var token = 0L; var n = 0; var done = false
      val sample = new StringBuilder
      while (!done) {
        val r = s.ops.fetch(h, token)
        r.resultType match {
          case "EOS" => n += r.rows.size; r.rows.take(2).foreach(x => sample ++= x.fields.mkString("[",",","] ")); done = true
          case "PAYLOAD" => n += r.rows.size; if (n <= 200) r.rows.take(2).foreach(x => sample ++= x.fields.mkString("[",",","] ")); token = r.nextToken.get
          case "NOT_READY" => Thread.sleep(100)
        }
      }
      println(s"$label => ${s.ops.status(h)} rows=$n sample=${sample.toString.take(120)}")
    }
    show("smoke", s.execute("SELECT 1 as id, 'Hello Spark!' as msg"))
    show("set-mode", s.execute("SET 'execution.runtime-mode' = 'batch'"))
    show("ddl", s.execute("""CREATE TABLE ob (order_id INT, product_id INT, price DECIMAL(10,2), t TIMESTAMP(3)) WITH ('connector'='datagen','number-of-rows'='100','fields.order_id.kind'='sequence','fields.order_id.start'='1','fields.product_id.min'='1','fields.product_id.max'='20','fields.price.min'='10','fields.price.max'='500')"""))
    show("scan", s.execute("SELECT * FROM ob"))
    show("agg", s.execute("SELECT product_id, COUNT(*) c, SUM(price) rev FROM ob GROUP BY product_id ORDER BY rev DESC"))
    // streaming
    show("set-stream", s.execute("SET 'execution.runtime-mode' = 'streaming'"))
    show("stream-ddl", s.execute("""CREATE TABLE cs (page_id INT, event_time TIMESTAMP(3), WATERMARK FOR event_time AS event_time - INTERVAL '5' SECOND) WITH ('connector'='datagen','rows-per-second'='40','fields.page_id.min'='1','fields.page_id.max'='5')"""))
    val h = s.execute("SELECT page_id, TUMBLE_START(event_time, INTERVAL '10' SECOND) ws, COUNT(*) c FROM cs GROUP BY page_id, TUMBLE(event_time, INTERVAL '10' SECOND)")
    val info = s.ops.get(h).get
    val dl = System.currentTimeMillis + 25000
    var r = s.ops.fetch(h, 0)
    while (r.rows.isEmpty && System.currentTimeMillis < dl) { Thread.sleep(300); r = s.ops.fetch(h, 0) }
    println(s"stream-tumble => status=${info.status} streaming=${info.isStreaming} firstPage=${r.rows.size} type=${r.resultType} sample=${r.rows.take(2).map(_.fields.mkString("[",",","]")).mkString(" ")}")
    s.ops.cancel(h)
    Thread.sleep(1500)
    println(s"after-cancel => status=${info.status} queryActive=${info.streamingQuery.exists(_.isActive)}")
    // CDC: file-backed Debezium changelog → keyed store with row kinds
    val cdcDir = java.nio.file.Files.createTempDirectory("demo-cdc")
    java.nio.file.Files.writeString(cdcDir.resolve("log.json"),
      """{"before":null,"after":{"id":1,"name":"ada"},"op":"c","ts_ms":1}
        |{"before":null,"after":{"id":2,"name":"bob"},"op":"c","ts_ms":2}
        |""".stripMargin)
    show("cdc-ddl", s.execute(
      s"""CREATE TABLE users_cdc (id INT, name STRING, PRIMARY KEY (id) NOT ENFORCED)
         |WITH ('connector'='postgres-cdc','debezium.json.path'='$cdcDir')""".stripMargin))
    val ch = s.execute("SELECT * FROM users_cdc")
    val cinfo = s.ops.get(ch).get
    val cdl = System.currentTimeMillis + 20000
    while (cinfo.store.forall(_.size < 2) && cinfo.status != OpStatus.Error &&
      System.currentTimeMillis < cdl) Thread.sleep(200)
    println(s"cdc-scan => status=${cinfo.status} snapshot=${cinfo.store.map(_.snapshot()).getOrElse(Nil)}")
    s.ops.cancel(ch)
    // CDC transformation: GROUP BY over the changelog converges to the
    // compacted answer (per-batch snapshot + keyed-convergent delivery)
    val th = s.execute("SELECT name, COUNT(*) AS n FROM users_cdc GROUP BY name")
    val tinfo = s.ops.get(th).get
    val tdl = System.currentTimeMillis + 20000
    while (tinfo.store.forall(_.size < 2) && tinfo.status != OpStatus.Error &&
      System.currentTimeMillis < tdl) Thread.sleep(200)
    println(s"cdc-transform => status=${tinfo.status} groups=${tinfo.store.map(_.snapshot()).getOrElse(Nil)}")
    s.ops.cancel(th)

    // REST facade: the same engine over the reference's two HTTP APIs
    val rest = new RestGateway(spark)
    rest.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def call(req: java.net.http.HttpRequest): String =
        http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val base = rest.gatewayAddress
      val sess = call(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base/v1/sessions"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString("""{"properties":{"execution.runtime-mode":"batch"}}""")).build())
      val sid = sess.split("\"")(3)
      val op = call(java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base/v1/sessions/$sid/statements"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString("""{"statement":"SELECT 42 AS answer"}""")).build())
      val oid = op.split("\"")(3)
      var st = ""
      val rdl = System.currentTimeMillis + 15000
      while (st != "FINISHED" && st != "ERROR" && System.currentTimeMillis < rdl) {
        st = call(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"$base/v1/sessions/$sid/operations/$oid/status")).GET().build()).split("\"")(3)
        Thread.sleep(100)
      }
      val page = call(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$base/v1/sessions/$sid/operations/$oid/result/0")).GET().build())
      println(s"rest-gateway => status=$st page=${page.take(160)}")
      val jobs = call(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${rest.monitorAddress}/jobs/overview")).GET().build())
      println(s"rest-monitor => jobs=${jobs.take(120)}")
    } finally rest.stop()

    // job monitor drill-down: per-operator vertices + checkpoint stats
    val reg = new JobRegistry(spark)
    spark.range(100000).selectExpr("sum(id)").collect()
    Thread.sleep(1000) // listener delivery
    reg.overview().values.flatten.headOption.flatMap(j => reg.details(j.id)).foreach { d =>
      println(s"job-details => ${d.job.state} vertices=${d.vertices.map(_.name).take(5)}")
    }
    reg.close()

    // probes
    show("bad-ddl", s.execute("CREATE TABLE broken (x FROG) WITH ('connector'='datagen')"))
    show("unknown-table", s.execute("SELECT * FROM never_registered"))
    show("kafka-unreachable", s.execute("CREATE TABLE kt (v BIGINT) WITH ('connector'='kafka','topic'='t')"))
    show("kafka-select", s.execute("SELECT * FROM kt"))
    show("drop-missing", s.execute("DROP TABLE no_such_table"))
    show("drop-if-exists", s.execute("DROP TABLE IF EXISTS no_such_table"))
    s.close(); spark.stop()
  }
}
