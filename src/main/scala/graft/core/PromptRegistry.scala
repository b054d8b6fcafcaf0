package graft.core

import scala.collection.concurrent.TrieMap

/** A named prompt template — the analogue of the reference's `PromptABC`
  * subclasses (`dataflow/core/prompt.py:6`). In this engine a template is
  * declarative data, not a class: a system prompt plus a `{col}` format
  * string that [[graft.ops.gen.FormatStrPromptedGenerator]] compiles to a
  * codegen'd `concat` expression.
  *
  * `diy = true` marks a user-supplied template (the `DIYPromptABC`
  * analogue, `prompt.py:12`): DIY templates pass every operator's
  * restriction check, exactly like the reference accepts any
  * `DIYPromptABC` subclass regardless of the op's allow-list.
  */
final case class PromptTemplate(name: String, template: String,
    systemPrompt: String = "", diy: Boolean = false)

/** Name → prompt-template registry with per-operator restriction,
  * mirroring `PROMPT_REGISTRY` (`dataflow/utils/registry.py:259`) and the
  * `prompt_restrict` decorator (`dataflow/core/prompt.py:29-81`): an
  * operator may declare the set of template names it accepts; resolving a
  * template outside that set fails loudly (listing the allowed names)
  * unless the template is DIY.
  */
object PromptRegistry {
  private val templates = TrieMap.empty[String, PromptTemplate]
  private val restrictions = TrieMap.empty[String, Set[String]]

  def register(t: PromptTemplate): Unit = templates.put(t.name, t)

  def get(name: String): PromptTemplate =
    templates.getOrElse(name, throw new NoSuchElementException(
      s"prompt template '$name' not registered; known: ${known.mkString(", ")}"))

  /** Declare the allow-list for an operator (the `prompt_restrict`
    * analogue). Ops with no declared restriction accept any template. */
  def restrict(opName: String, allowed: String*): Unit =
    restrictions.put(opName, allowed.toSet)

  def allowedFor(opName: String): Option[Set[String]] = restrictions.get(opName)

  /** Resolve a template for an operator, enforcing its restriction:
    * unknown name → NoSuchElementException; known but not allowed for
    * this op and not DIY → IllegalArgumentException naming the allowed
    * set (the reference raises TypeError with the same shape,
    * `prompt.py:58-68`). */
  def resolve(opName: String, templateName: String): PromptTemplate = {
    val t = get(templateName)
    restrictions.get(opName) match {
      case Some(allowed) if !allowed.contains(t.name) && !t.diy =>
        throw new IllegalArgumentException(
          s"[$opName] prompt template '${t.name}' is not allowed; expected one of: " +
            s"${allowed.toSeq.sorted.mkString(", ")} (or a diy template)")
      case _ => t
    }
  }

  def known: Seq[String] = templates.keys.toSeq.sorted
}
