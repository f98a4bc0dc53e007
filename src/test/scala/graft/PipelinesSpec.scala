package graft

import graft.lscl.Pipelines
import graft.lscl.Pipelines.{Create, Reload, StopAndDelete}

/** Multi-pipeline converge semantics, mirroring the reference's
  * `qa/integration/fixtures/reload_config_spec.yml` flow: run an initial
  * config, swap in a reload config that adds a grok filter, converge, and
  * observe that ONLY the changed pipeline re-executed and its sink reflects
  * the new filter. Resolver behavior follows state_resolver.rb:29-58 and
  * the pipeline_action ORDERING.
  */
class PipelinesSpec extends SparkSpec {

  // reload_config_spec.yml shapes with our supported input/output plugins:
  // initial passes messages through; reload adds the fixture's grok filter
  private val initial =
    """input { generator { count => 20 lines => ['10.1.2.3 - frank [10/Oct/2000:13:55:36 +0000] "GET /a HTTP/1.0" 200 12 "-" "curl/8.0"'] } }
      |output { sink { id => "out" } }
      |""".stripMargin

  private val reloaded =
    """input { generator { count => 20 lines => ['10.1.2.3 - frank [10/Oct/2000:13:55:36 +0000] "GET /a HTTP/1.0" 200 12 "-" "curl/8.0"'] } }
      |filter {
      |  grok {
      |    match => {
      |      "message" => '%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "%{WORD:verb} %{DATA:request} HTTP/%{NUMBER:httpversion}" %{NUMBER:response:int} (?:-|%{NUMBER:bytes:int}) %{QS:referrer} %{QS:agent}'
      |    }
      |  }
      |}
      |output { sink { id => "out" } }
      |""".stripMargin

  private val other =
    """input { generator { count => 5 lines => ["x"] } }
      |output { sink { id => "out" } }
      |""".stripMargin

  test("converge: create / noop / reload-only-changed / stop, reference action order") {
    val root = java.nio.file.Files.createTempDirectory("graft_pipelines").toString
    val reg = new Pipelines.Registry(spark, root, Map.empty)

    // 1. initial converge creates both pipelines
    val a1 = reg.converge(Seq(
      Pipelines.PipelineSpec("main", initial), Pipelines.PipelineSpec("aux", other)))
    assert(a1 == Seq(Create("aux"), Create("main")))
    assert(reg.running("main").runs == 1 && reg.running("aux").runs == 1)
    assert(reg.running("main").lastResult.get.counts("out") == 20L)

    // 2. identical desired state: zero actions, zero re-executions
    val a2 = reg.converge(Seq(
      Pipelines.PipelineSpec("main", initial), Pipelines.PipelineSpec("aux", other)))
    assert(a2.isEmpty)
    assert(reg.running("main").runs == 1 && reg.running("aux").runs == 1)

    // 3. reload only the changed pipeline; the untouched one must not re-run
    val a3 = reg.converge(Seq(
      Pipelines.PipelineSpec("main", reloaded), Pipelines.PipelineSpec("aux", other)))
    assert(a3 == Seq(Reload("main")))
    assert(reg.running("main").runs == 2 && reg.running("aux").runs == 1)
    // the re-executed sink reflects the NEW filter: grok fields present
    val sink = spark.read.parquet(s"$root/main/out")
    assert(sink.count() == 20)
    val r = sink.selectExpr("clientip", "verb", "response", "bytes").head
    assert(r.getString(0) == "10.1.2.3" && r.getString(1) == "GET")
    assert(r.getLong(2) == 200L && r.getLong(3) == 12L)

    // 4. dropping a pipeline from the desired state stops and deletes it
    val a4 = reg.converge(Seq(Pipelines.PipelineSpec("main", reloaded)))
    assert(a4 == Seq(StopAndDelete("aux")))
    assert(reg.running.keySet == Set("main"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/aux")))
  }

  test("pipelines.yml loader: block-scalar config.string and path.config") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pyml")
    val conf = dir.resolve("aux.conf")
    java.nio.file.Files.writeString(conf, other)
    val yml = dir.resolve("pipelines.yml")
    java.nio.file.Files.writeString(yml,
      s"""# comment
         |- pipeline.id: main
         |  config.string: |-
         |    input { generator { count => 3 lines => ["y"] } }
         |    output { sink { id => "out" } }
         |- pipeline.id: aux
         |  path.config: $conf
         |""".stripMargin)
    val specs = Pipelines.fromYaml(yml.toString, Map.empty)
    assert(specs.map(_.id) == Seq("main", "aux"))
    assert(specs(0).configText.startsWith("input { generator { count => 3"))
    assert(specs(0).configText.contains("\noutput { sink { id => \"out\" } }"))
    assert(specs(1).configText == other)
    // and the loaded specs actually converge+run
    val root = java.nio.file.Files.createTempDirectory("graft_pyml_run").toString
    val reg = new Pipelines.Registry(spark, root, Map.empty)
    reg.converge(specs)
    assert(reg.running("main").lastResult.get.counts("out") == 3L)
    assert(reg.running("aux").lastResult.get.counts("out") == 5L)
  }
}
