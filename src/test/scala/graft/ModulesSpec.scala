package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Registry

/** Lazy module loading + whitelist parity with the reference registry
  * (`dataflow/utils/registry.py:60-186`): factories are grouped into the
  * reference's operator-package taxonomy, materialized on demand by
  * `Registry.get`, and trimmable by `applyWhitelist` with the same report
  * shape.
  */
class ModulesSpec extends AnyFunSuite {

  /** Run `body` against a clean registry, then restore the eager
    * registration every other suite expects. */
  private def withFreshRegistry(body: => Unit): Unit = {
    Registry.resetForTest()
    Ops.resetForTest()
    try body
    finally {
      Registry.resetForTest()
      Ops.resetForTest()
      Ops.registerAll()
    }
  }

  test("module partition covers the entry inventory exactly") {
    val names = Ops.entryNames
    assert(names.distinct.size == names.size, "duplicate entry name")
    val assigned = Ops.modules.flatMap(_._2)
    assert(assigned.distinct.size == assigned.size,
      "a name appears in two modules")
    assert(assigned.toSet == names.toSet,
      s"unassigned: ${(names.toSet -- assigned.toSet).toSeq.sorted.mkString(", ")}; " +
        s"unknown: ${(assigned.toSet -- names.toSet).toSeq.sorted.mkString(", ")}")
  }

  test("get lazily loads modules in declaration order until the name resolves") {
    withFreshRegistry {
      Ops.registerLazy()
      assert(Registry.known.isEmpty, "lazy install must not materialize factories")
      assert(Registry.knownModules.head == "general_text")
      assert(Registry.get("word_number_filter").name == "word_number_filter")
      // only the modules walked so far are materialized: general_text is
      // first, pdf2vqa last, so pdf_merger is not yet registered
      assert(Registry.known.contains("word_number_filter"))
      assert(!Registry.known.contains("pdf_merger"))
      assert(Registry.get("pdf_merger").name == "pdf_merger")
      assert(Registry.known.contains("pdf_merger"))
    }
  }

  test("applyWhitelist trims, reports, and trimmed names re-resolve via get") {
    withFreshRegistry {
      Ops.registerLazy()
      val rep = Registry.applyWhitelist(
        Seq("word_number_filter", "pdf_merger", "not_an_op"))
      assert(rep.totalBefore == Ops.entryNames.size)
      assert(rep.kept == Seq("pdf_merger", "word_number_filter"))
      assert(rep.missingInRegistry == Seq("not_an_op"))
      assert(rep.totalAfter == 2)
      assert(rep.trimmedBy == rep.totalBefore - 2)
      assert(rep.removed.size == rep.trimmedBy)
      assert(Registry.known.toSet == Set("pdf_merger", "word_number_filter"))
      // reference parity: get on a trimmed name re-resolves it from the
      // module's retained catalog (registry.py:104-121 getattr walk)
      assert(Registry.get("colon_end_filter").name == "colon_end_filter")
      assert(Registry.known.contains("colon_end_filter"))
      // a name no module provides still fails loudly
      intercept[NoSuchElementException](Registry.get("definitely_not_an_op"))
    }
  }
}
