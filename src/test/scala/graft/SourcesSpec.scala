package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.sources.RefCsvGraphSource

class SourcesSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark

  // a tiny graph in the reference's TSV interchange shape:
  // one Function node (id 1) with a CallExpression (2) -> Callee (3),
  // plus a dangling edge to a nonexistent node 99
  private val nodesTsv =
    """command	key	type	code	location	functionId	childNum	isCFGNode	operator	baseType	completeType	identifier
      |ANR	1	Function	foo			0
      |ANR	2	CallExpression	bar ( x )	3:0:10:18	1	0	True
      |ANR	3	Callee	bar		1	0				bar
      |""".stripMargin
  private val edgesTsv =
    """start	end	type	var	childnum
      |1	2	IS_FUNCTION_OF_AST
      |2	3	IS_AST_PARENT		0
      |2	99	REACHES	x
      |""".stripMargin

  private lazy val dir = {
    val d = Files.createTempDirectory("refcsv")
    Files.write(d.resolve("nodes.csv"), nodesTsv.getBytes("UTF-8"))
    Files.write(d.resolve("edges.csv"), edgesTsv.getBytes("UTF-8"))
    d
  }

  test("reference TSV nodes map onto the graft nodes schema") {
    val nodes = RefCsvGraphSource.readNodes(spark, dir.resolve("nodes.csv").toString)
    nodes.columns.toSeq shouldBe Seq("id", "kind", "code", "pageId", "childNum", "props")
    val call = nodes.filter(col("kind") === "CallExpression").head()
    call.getLong(0) shouldBe 2L
    call.getString(2) shouldBe "bar ( x )"
    call.getLong(3) shouldBe 1L // functionId -> pageId
    val props = call.getMap[String, String](5)
    props("isCFGNode") shouldBe "True"
    props("location") shouldBe "3:0:10:18"
    props.get("operator") shouldBe None // empty attrs dropped
    props.get("command") shouldBe None // import directive, not a property
  }

  test("write/read round-trips multi-line and tab-bearing values") {
    import spark.implicits._
    val nodes = Seq(
      (1L, "Function", "if (a)\n\tfoo();", 0L, 0, Map("location" -> "1:0\n2:3")),
      (2L, "Callee", "plain", 1L, 1, Map.empty[String, String]))
      .toDF("id", "kind", "code", "pageId", "childNum", "props")
    val edges = Seq((1L, 2L, "REACHES", "x\ty", null.asInstanceOf[String]))
      .toDF("src", "dst", "kind", "variable", "label")
    val d = Files.createTempDirectory("refcsv-rt").toString
    try {
      RefCsvGraphSource.writeNodes(nodes, s"$d/nodes.csv")
      RefCsvGraphSource.writeEdges(edges, s"$d/edges.csv")
      val n2 = RefCsvGraphSource.readNodes(spark, s"$d/nodes.csv")
        .orderBy("id").collect()
      n2.length shouldBe 2
      n2(0).getString(2) shouldBe "if (a)\n\tfoo();"
      n2(0).getMap[String, String](5)("location") shouldBe "1:0\n2:3"
      val e2 = RefCsvGraphSource.readEdges(spark, s"$d/edges.csv").head()
      e2.getString(3) shouldBe "x\ty"
      e2.isNullAt(4) shouldBe true
    } finally graft.store.TableIO.deleteRecursively(d)
  }

  test("edges load, validate, and drive the query steps") {
    val nodes = RefCsvGraphSource.readNodes(spark, dir.resolve("nodes.csv").toString)
    val edges = RefCsvGraphSource.readEdges(spark, dir.resolve("edges.csv").toString)
    val (valid, dangling) = RefCsvGraphSource.validated(nodes, edges)
    dangling shouldBe 1L // the edge to 99 is counted, not silently dropped
    valid.count() shouldBe 2L
    edges.filter(col("kind") === "REACHES").head().getString(3) shouldBe "x"
    // the loaded graph answers a Steps query (getCallsTo-style shape)
    val calls = graft.query.Steps.nodesWithKindAndCode(nodes, "CallExpression", "bar ( x )")
    val callee = graft.query.Steps.out(calls, valid, nodes, "IS_AST_PARENT")
    callee.select("code").head().getString(0) shouldBe "bar"
  }
}
