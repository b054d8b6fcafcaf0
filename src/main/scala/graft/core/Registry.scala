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

  def register(name: String)(factory: Params => Op): Unit =
    factories.put(name, factory)

  def get(name: String, params: Params = Map.empty): Op =
    factories.getOrElse(name,
      throw new NoSuchElementException(
        s"operator '$name' not registered; known: ${factories.keys.toSeq.sorted.mkString(", ")}")
    )(params)

  def known: Seq[String] = factories.keys.toSeq.sorted
}
