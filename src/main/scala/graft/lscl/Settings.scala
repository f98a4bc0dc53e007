package graft.lscl

/** `logstash.yml` settings loader: the reference's settings file is a FLAT
  * yaml map of dotted keys (`pipeline.id: mypipeline`,
  * `config/logstash.yml`; nested-form yaml is normalized to the same dotted
  * keys by the reference's Settings#from_yaml — we accept the flat form,
  * which is what every qa fixture writes). Values get the same `${VAR}` /
  * `${VAR:default}` substitution as config text, INCLUDING the secret store
  * (the reference resolves settings through the keystore —
  * secret_store_spec.rb "expands secret store variables from settings").
  */
object Settings {

  /** Parse flat `key: value` yaml text. Comments and blank lines skipped;
    * quoted values unquoted; `${...}` substituted from `env` (keystore
    * layered via [[Keystore.resolve]], secrets winning — same as config
    * text). Unresolvable references abort, like config parse does.
    */
  def fromYaml(text: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val resolved = Keystore.resolve(env)
    val out = Map.newBuilder[String, String]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val i = line.indexOf(':')
        require(i > 0, s"settings line is not `key: value`: $line")
        val key = line.substring(0, i).trim
        var v = line.substring(i + 1).trim
        if (v.length >= 2 &&
          ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        out += key -> Lscl.substEnv(v, resolved)
      }
    }
    out.result()
  }

  def fromFile(path: String, env: Map[String, String] = sys.env): Map[String, String] =
    fromYaml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)), env)

  /** The pipeline id a settings map names (reference default: "main"). */
  def pipelineId(settings: Map[String, String]): String =
    settings.getOrElse("pipeline.id", "main")
}
