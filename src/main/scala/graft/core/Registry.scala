package graft.core

import scala.collection.concurrent.TrieMap

/** Name → operator-factory registry, mirroring the reference's
  * `OPERATOR_REGISTRY` (`dataflow/utils/registry.py:257`) so pipelines are
  * declarable by name. Factories take a string-keyed param map (the
  * analogue of the reference's kwargs convention).
  */
/** Result of [[Registry.applyWhitelist]] — the same fields as the
  * reference's `apply_whitelist` report dict
  * (`dataflow/utils/registry.py:129-186`). */
final case class WhitelistReport(
    requestedWhitelist: Seq[String],
    missingInRegistry: Seq[String],
    kept: Seq[String],
    removed: Seq[String],
    totalBefore: Int,
    totalAfter: Int) {
  def trimmedBy: Int = totalBefore - totalAfter
}

object Registry {
  type Params = Map[String, String]
  private val factories = TrieMap.empty[String, Params => Op]

  /** A lazily-materialized operator module: the analogue of one
    * `dataflow.operators.<name>` package in the reference's loader map
    * (`registry.py:66-79`). `entries` is evaluated at most once, on the
    * first `get` miss or [[loadAllModules]]. */
  private final class Module(thunk: () => Map[String, Params => Op]) {
    var cache: Option[Map[String, Params => Op]] = None
    def load(): Map[String, Params => Op] = cache match {
      case Some(c) => c
      case None =>
        val c = thunk()
        cache = Some(c)
        // first registration wins, like the reference's _do_register
        c.foreach { case (n, f) => factories.putIfAbsent(n, f) }
        c
    }
  }
  private val modules =
    scala.collection.mutable.LinkedHashMap.empty[String, Module]

  /** Declare a module of operator factories, loaded on demand: `get` on
    * an unregistered name walks unloaded modules in declaration order
    * until the name resolves (the reference's lazy `_init_loaders` +
    * per-module getattr walk, `registry.py:75-121`). */
  def registerModule(module: String)(entries: => Map[String, Params => Op]): Unit =
    synchronized {
      if (!modules.contains(module)) modules(module) = new Module(() => entries)
    }

  def knownModules: Seq[String] = synchronized(modules.keys.toSeq)

  def loadAllModules(): Unit = synchronized(modules.valuesIterator.foreach(_.load()))

  /** Keep only `names` in the registry, returning the same report the
    * reference emits (`registry.py:129-186`). Loads every module first so
    * the trim sees the full inventory. Like the reference, a trimmed name
    * is re-resolvable by a later `get` (its module's catalog is kept). */
  def applyWhitelist(names: Seq[String]): WhitelistReport = synchronized {
    loadAllModules()
    val keep = names.toSet
    val before = factories.keySet.toSet
    val missing = (keep -- before).toSeq.sorted
    val kept = (before & keep).toSeq.sorted
    val removed = (before -- keep).toSeq.sorted
    removed.foreach(factories.remove)
    WhitelistReport(keep.toSeq.sorted, missing, kept, removed, before.size, factories.size)
  }

  private[graft] def resetForTest(): Unit = synchronized {
    factories.clear()
    modules.clear()
  }

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

  def get(name: String, params: Params = Map.empty): Op = {
    val factory = factories.get(name).orElse(synchronized {
      // lazy-load modules in declaration order until the name resolves;
      // a loaded module's cached catalog also re-resolves names trimmed
      // by applyWhitelist (reference `get` re-adds via getattr,
      // registry.py:104-121)
      val it = modules.valuesIterator
      var found: Option[Params => Op] = None
      while (found.isEmpty && it.hasNext) found = it.next().load().get(name)
      found.foreach(f => factories.putIfAbsent(name, f))
      found
    })
    factory.getOrElse(throw new NoSuchElementException(
      s"operator '$name' not registered; known: ${factories.keys.toSeq.sorted.mkString(", ")}")
    )(params)
  }

  def known: Seq[String] = factories.keys.toSeq.sorted
}
