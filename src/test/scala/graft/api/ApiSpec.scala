package graft.api

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.sources.{Tables, TpchGraph}

class ApiSpec extends SparkSpec {
  private implicit lazy val s: SparkSession = spark

  test("QueryRouter classifies Cypher vs SQL, quote-aware") {
    import QueryRouter._
    assert(classify("MATCH (n) RETURN n") == Cypher)
    assert(classify("SELECT * FROM t WHERE x = 'MATCH (n)'") == Sql)
    assert(classify("CREATE (n:Person {name: 'SELECT'})") == Cypher)
    assert(classify("select count(*) from lineitem") == Sql)
    assert(classify("what is this") == Unknown)
  }

  test("GraftSession routes Cypher and SQL; mutations update the graph") {
    val sess = GraftSession(spark, TpchGraph(Tables(spark, sf("sf0.001"))))
    val n = sess.execute("MATCH (n:customer) RETURN count(n) AS n")
      .collect().head.getLong(0)
    assert(n == 150)
    Tables(spark, sf("sf0.001")).customer.createOrReplaceTempView("customer")
    val viaSql = sess.execute("SELECT count(*) AS n FROM customer")
      .collect().head.getLong(0)
    assert(viaSql == 150)
    sess.execute(
      """CREATE (:probe {name: 'router-test'})""")
    val probe = sess.execute(
      """MATCH (p:probe) RETURN p.name""").collect()
    assert(probe.map(_.getString(0)).toSeq == Seq("router-test"))
  }

  test("execute() threads Cypher parameters through the router") {
    val sess = GraftSession(spark, TpchGraph(Tables(spark, sf("sf0.001"))))
    val n = sess.execute(
      "MATCH (c:customer) WHERE c.mktsegment = $seg RETURN count(c) AS n",
      Map("seg" -> "BUILDING")).collect().head.getLong(0)
    assert(n == 34L)
  }

  test("stream() yields rows incrementally via toLocalIterator") {
    val sess = GraftSession(spark, TpchGraph(Tables(spark, sf("sf0.001"))))
    val it = sess.stream("MATCH (n:nation) RETURN n.name AS name")
    assert(it.hasNext)
    assert(it.take(5).size == 5)
  }

  test("KV namespace: set/get/delete/flush") {
    val sess = GraftSession.empty(spark)
    sess.kvSet("k1", "v1".getBytes)
    assert(sess.kvGet("k1").map(new String(_)).contains("v1"))
    assert(sess.kvDelete("k1"))
    assert(sess.kvGet("k1").isEmpty)
    sess.kvSet("a", "1".getBytes)
    sess.kvFlush()
    assert(sess.kvGet("a").isEmpty)
  }

  test("index_property compat mode raises NotIndexed like indradb") {
    val sess = GraftSession.empty(spark)
    sess.checkIndexed("anything") // compat off: no error
    sess.indradbCompatMode = true
    intercept[NotIndexedException] { sess.checkIndexed("name") }
    sess.indexProperty("name")
    sess.checkIndexed("name") // now declared
  }

  test("plugin registry: register/execute/UDF exposure") {
    Plugins.register("echo_len",
      json => s"""{"len": ${json.length}}""")
    assert(Plugins.execute("echo_len", "abc") == """{"len": 3}""")
    Plugins.registerAsUdf(spark, "echo_len")
    val viaSql = spark.sql("SELECT echo_len('xyzw') AS r")
      .collect().head.getString(0)
    assert(viaSql == """{"len": 4}""")
    assert(Plugins.list.contains("echo_len"))
  }

  test("bulkInsert mirrors reference semantics (no endpoint validation)") {
    val sess = GraftSession.empty(spark)
    sess.bulkInsert(
      vertices = vertexDf(("v1", "t", Map.empty)),
      edges = edgeDf(("e1", "v1", "missing", "knows")))
    assert(sess.graph.vertices.count() == 1)
    assert(sess.graph.edges.count() == 1) // dangling edge accepted
  }

  test("bulkInsert property items (BulkInsertItem::VertexProperty/EdgeProperty)") {
    import spark.implicits._
    val sess = GraftSession.empty(spark)
    sess.bulkInsert(
      vertices = vertexDf(("v1", "t", Map("old" -> "kept")),
        ("v2", "t", Map.empty)),
      edges = edgeDf(("e1", "v1", "v2", "knows")))
    sess.bulkInsert(
      vertexProperties = Seq(("v1", "rank", "7"), ("v2", "rank", "9"))
        .toDF("id", "key", "value"),
      edgeProperties = Seq(("e1", "weight", "0.5")).toDF("id", "key", "value"))
    val vProps = sess.graph.vertices.collect()
      .map(r => r.getString(0) -> r.getMap[String, String](2)).toMap
    assert(vProps("v1")("rank") == "7" && vProps("v1")("old") == "kept")
    assert(vProps("v2")("rank") == "9")
    val eProps = sess.graph.edges.collect().head.getMap[String, String](5)
    assert(eProps("weight") == "0.5")
  }

  test("QueryRouter recognizes GraphQL first; execution gives a clear error") {
    import QueryRouter._
    assert(classify("query Hero { hero { name } }") == GraphQL)
    assert(classify("{ user(id: 1) { name } }") == GraphQL)
    assert(classify("mutation { addUser(name: \"x\") { id } }") == GraphQL)
    // Cypher/SQL are untouched by the GraphQL-first check
    assert(classify("MATCH (n) RETURN n") == Cypher)
    assert(classify("select 1") == Sql)
    val sess = GraftSession.empty(spark)
    val err = intercept[graft.cypher.ParseException] {
      sess.execute("query Hero { hero { name } }")
    }
    assert(err.getMessage.contains("GraphQL"))
  }
}
