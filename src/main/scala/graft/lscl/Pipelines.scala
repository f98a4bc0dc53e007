package graft.lscl

import org.apache.spark.sql.SparkSession
import graft.operators.Route

/** Multiple pipelines + reload converge — the reference agent's
  * pipelines.yml loop re-expressed batch-style.
  *
  * Semantics follow `lib/logstash/state_resolver.rb:29-58` exactly: for each
  * desired pipeline, Create when the id is unknown, Reload when the config
  * differs from the running one, nothing when identical; running ids absent
  * from the desired set StopAndDelete. Actions execute in the reference's
  * ORDERING (pipeline_action.rb:26-33: Create=100 < Reload=200 <
  * StopAndDelete=350). Config identity is the reference's `uniqueHash`
  * (PipelineIR.java:78 — a digest of the original source text).
  *
  * Create/Reload execute the config via [[LsclRun.runConfig]] into
  * `outRoot/<id>` (cleared first — Route.run's `_SUCCESS` resume would
  * otherwise skip the re-execution a Reload exists to perform); unchanged
  * pipelines are NOT re-executed — the property the reference's converge
  * loop guarantees and `reload_config_spec` observes.
  */
object Pipelines {

  final case class PipelineSpec(id: String, configText: String)

  sealed trait Action { def id: String; def order: Int }
  final case class Create(id: String) extends Action { val order = 100 }
  final case class Reload(id: String) extends Action { val order = 200 }
  final case class StopAndDelete(id: String) extends Action { val order = 350 }

  final case class PipelineState(configHash: String, runs: Int,
                                 lastResult: Option[Route.RunResult],
                                 produced: Set[String] = Set.empty)

  /** The reference's pipeline-config identity: sha-256 over the source. */
  def uniqueHash(source: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(source.getBytes("UTF-8")).map("%02x".format(_)).mkString

  final class Registry(spark: SparkSession, outRoot: String,
                       env: Map[String, String] = sys.env) {
    private var states = Map.empty[String, PipelineState]

    /** Shared pipeline-to-pipeline address bus: `pipeline { send_to => [...] }`
      * outputs register here, `pipeline { address => ... }` inputs resolve.
      * Frames survive converge passes, so an unchanged upstream keeps feeding
      * a reloaded downstream without re-executing.
      */
    val bus = new LsclRun.PipelineBus

    def running: Map[String, PipelineState] = states

    /** Addresses a config CONSUMES (pipeline inputs). */
    private def consumed(cfg: Lscl.Config): Set[String] =
      cfg.inputs.collect {
        case Lscl.PluginItem(p) if p.name == "pipeline" =>
          p.attr("address") match {
            case Some(Lscl.VString(a)) => a
            case other => throw new IllegalArgumentException(
              s"pipeline input: address must be a string, got $other")
          }
      }.toSet

    /** Addresses a config PRODUCES (pipeline outputs). */
    private def produced(cfg: Lscl.Config): Set[String] =
      LsclRun.pipelineSends(cfg.outputs).flatMap(_._1).toSet

    private def clearDir(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

    /** One converge pass: resolve actions against the running set, execute
      * them in reference order, return them (still in that order).
      */
    def converge(specs: Seq[PipelineSpec]): Seq[Action] = {
      require(specs.map(_.id).distinct.length == specs.length,
        "duplicate pipeline ids in desired state")
      val byId = specs.map(s => s.id -> s).toMap
      val actions = Seq.newBuilder[Action]
      specs.foreach { sp =>
        states.get(sp.id) match {
          case None => actions += Create(sp.id)
          case Some(st) if st.configHash != uniqueHash(sp.configText) =>
            actions += Reload(sp.id)
          case _ => () // identical config: leave it running, do NOT re-execute
        }
      }
      val configured = specs.map(_.id).toSet
      states.keys.filterNot(configured).toSeq.sorted
        .foreach(id => actions += StopAndDelete(id))
      val sorted = actions.result().sortBy(a => (a.order, a.id))
      // Create/Reload execute in ADDRESS-DEPENDENCY order: an upstream that
      // feeds a `pipeline { address => ... }` input must register its frame
      // before the downstream resolves it (the reference gets this for free
      // from the bus's blocking ensureDelivery; batch execution topo-sorts)
      val toRun = sorted.collect { case Create(id) => id; case Reload(id) => id }
      topoExecute(toRun.map(byId))
      sorted.foreach {
        case StopAndDelete(id) =>
          // the reference bus unregisters senders on pipeline shutdown: a
          // later downstream consuming a dead upstream's address must hit
          // resolve()'s loud no-registered-upstream error, not a stale frame
          states.get(id).foreach(_.produced.foreach(bus.unregister))
          clearDir(s"$outRoot/$id")
          states -= id
        case _ => ()
      }
      sorted
    }

    private def topoExecute(toRun: Seq[PipelineSpec]): Unit = {
      val parsed = toRun.map(sp => sp -> Lscl.parse(sp.configText, env))
      var remaining = parsed
      while (remaining.nonEmpty) {
        val pendingProduces = remaining.flatMap { case (_, cfg) => produced(cfg) }.toSet
        // runnable: every consumed address is already on the bus, or nobody
        // in this batch will produce it (let resolve() raise the clear error)
        val (runnable, blocked) = remaining.partition { case (_, cfg) =>
          consumed(cfg).forall(a => bus.addresses.contains(a) || !pendingProduces.contains(a))
        }
        if (runnable.isEmpty)
          throw new IllegalStateException(
            s"pipeline address cycle among ${remaining.map(_._1.id).mkString(", ")}")
        runnable.sortBy(_._1.id).foreach { case (sp, _) => execute(sp) }
        remaining = blocked
      }
    }

    private def execute(sp: PipelineSpec): Unit = {
      val dir = s"$outRoot/${sp.id}"
      clearDir(dir)
      val prev = states.get(sp.id)
      // snapshot the previous run's registrations: a FAILED Create/Reload
      // must leave the bus exactly as it found it (a previously healthy
      // upstream keeps feeding its downstream consumers) and keep the old
      // state entry (old hash => a retry with the new text is a Reload, not
      // skipped-as-converged)
      val prevFrames = prev.toSeq.flatMap(_.produced.toSeq.collect {
        case a if bus.addresses.contains(a) => a -> bus.resolve(a)
      })
      val newProduced = produced(Lscl.parse(sp.configText, env))
      val result =
        try LsclRun.runConfig(spark, sp.configText, dir, env, Some(bus))
        catch {
          case e: Throwable =>
            newProduced.filterNot(a => prevFrames.exists(_._1 == a))
              .foreach(bus.unregister) // half-registered new addresses
            prevFrames.foreach { case (a, f) => bus.register(a, f) }
            throw e
        }
      // success: addresses the reload DROPPED unregister now — never before
      // the new run, so a throw can't orphan downstream consumers. This runs
      // before any downstream in the same converge batch executes, so a
      // same-batch consumer of a dropped address still fails loudly.
      prev.foreach(_.produced.filterNot(newProduced).foreach(bus.unregister))
      states += sp.id -> PipelineState(uniqueHash(sp.configText),
        prev.map(_.runs).getOrElse(0) + 1, Some(result), newProduced)
    }
  }

  /** pipelines.yml loader (reference `config/pipelines.yml` shape): a list of
    * `- pipeline.id: <id>` entries each carrying `path.config: <file>` or an
    * inline `config.string:` (plain scalar, or a `|`/`|-` block scalar whose
    * lines are dedented to the common indent — enough for the published
    * examples; this is not a general YAML engine).
    */
  def fromYaml(path: String, env: Map[String, String] = sys.env): Seq[PipelineSpec] = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .toArray(Array.empty[String])
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    val out = Seq.newBuilder[PipelineSpec]
    var id: Option[String] = None
    var cfg: Option[String] = None
    def flush(): Unit = {
      id.foreach { i =>
        out += PipelineSpec(i, cfg.getOrElse(
          throw new IllegalArgumentException(s"pipeline `$i`: no config.string or path.config")))
      }
      id = None; cfg = None
    }
    var k = 0
    while (k < lines.length) {
      val raw = lines(k)
      val t = raw.trim
      if (t.isEmpty || t.startsWith("#")) { k += 1 }
      else {
        val body = if (t.startsWith("- ")) { flush(); t.substring(2) } else t
        val ci = body.indexOf(':')
        if (ci > 0) {
          val key = body.substring(0, ci).trim
          val value = body.substring(ci + 1).trim
          key match {
            case "pipeline.id" => id = Some(unquote(value))
            case "path.config" =>
              cfg = Some(java.nio.file.Files.readString(
                java.nio.file.Paths.get(unquote(value))))
            case "config.string" if value == "|" || value == "|-" =>
              // block scalar: consume more-indented lines, dedent to common
              val block = Seq.newBuilder[String]
              val baseIndent = raw.indexOf(raw.trim)
              var j = k + 1
              var blockIndent = -1
              var go = true
              while (go && j < lines.length) {
                val l = lines(j)
                if (l.trim.isEmpty) { block += ""; j += 1 }
                else {
                  val ind = l.indexOf(l.trim)
                  if (ind <= baseIndent) go = false
                  else {
                    if (blockIndent < 0) blockIndent = ind
                    block += l.substring(math.min(blockIndent, ind))
                    j += 1
                  }
                }
              }
              cfg = Some(block.result().mkString("\n"))
              k = j - 1
            case "config.string" => cfg = Some(unquote(value))
            case _ => () // other settings (workers, queue.*) not modeled
          }
        }
        k += 1
      }
    }
    flush()
    out.result()
  }
}
