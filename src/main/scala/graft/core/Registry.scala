package graft.core

import scala.collection.concurrent.TrieMap

/** Name → operator-factory registry, mirroring the reference's
  * `OPERATOR_REGISTRY` (`dataflow/utils/registry.py:257`) so pipelines are
  * declarable by name. Factories take a string-keyed param map (the
  * analogue of the reference's kwargs convention).
  */
object Registry {
  type Params = Map[String, String]
  private val factories = TrieMap.empty[String, Params => Op]

  /** Serving resolution for LLM-backed factories: params pick the client
    * (`serving=mock|http` + endpoint/model), or the host application
    * installs its own provider via [[setServingProvider]] — by-name
    * pipelines can target real serving, not only the mock. */
  @volatile private var servingProvider: Params => graft.serving.ServingClient = { p =>
    p.getOrElse("serving", "mock") match {
      case "mock" =>
        graft.serving.MockServing(p.get("embedding_dim").map(_.toInt).getOrElse(16))
      case "http" =>
        graft.serving.HttpServing(
          p.getOrElse("endpoint",
            throw new IllegalArgumentException("serving=http requires 'endpoint'")),
          p.getOrElse("model", "default"),
          apiKeyEnv = p.getOrElse("api_key_env", "LLM_API_KEY"))
      case other =>
        throw new IllegalArgumentException(s"unknown serving '$other'")
    }
  }

  def setServingProvider(f: Params => graft.serving.ServingClient): Unit =
    servingProvider = f

  def serving(p: Params): graft.serving.ServingClient = servingProvider(p)

  /** Scorer for the model-scored filter families, derived from the same
    * provider (`score_system_prompt`/`dimension` params refine it). */
  def scorer(p: Params): graft.serving.Scorer =
    graft.serving.ServingScorer(serving(p),
      p.getOrElse("score_system_prompt", "SCORE"), p.getOrElse("dimension", ""))

  def register(name: String)(factory: Params => Op): Unit =
    factories.put(name, factory)

  def get(name: String, params: Params = Map.empty): Op =
    factories.getOrElse(name,
      throw new NoSuchElementException(
        s"operator '$name' not registered; known: ${factories.keys.toSeq.sorted.mkString(", ")}")
    )(params)

  def known: Seq[String] = factories.keys.toSeq.sorted
}
