package graft.serving

/** Model-scorer seam — the contract behind the reference's model-backed
  * filter/eval families (FineWebEdu `text_pt/filter/fineweb_edu_filter.py:9`,
  * Perplexity `text_pt/filter/perplexity_filter.py:10`, Qurating, the
  * text_sft filter set `text_sft/filter/alpagasus_filter.py:11` …). Every
  * one of them is "score = model(text); keep rows with min ≤ score ≤ max":
  * the weights are not logic, so the engine-side seam is just
  * `Seq[String] => Seq[Double]`. Production binds an HTTP classifier /
  * reward-model endpoint; hermetic tests bind [[ServingScorer]] over
  * [[MockServing]] (deterministic, SQL-oracle-able).
  */
trait Scorer extends Serializable {
  /** One score per text, order-preserving. */
  def score(texts: Seq[String]): Seq[Double]
}

/** Score via a [[ServingClient]] whose response parses as a double — the
  * LLM-judge scoring path (Alpagasus/Treeinstruct style). Unparseable
  * responses become NaN (row fails any min/max filter). A `dimension` is
  * appended to the system prompt for multi-axis scorers
  * (Qurating's writing_style / educational_value …, Deita quality vs
  * complexity). */
final case class ServingScorer(serving: ServingClient,
    systemPrompt: String = "SCORE", dimension: String = "") extends Scorer {
  private def sys = if (dimension.isEmpty) systemPrompt else s"$systemPrompt:$dimension"
  def score(texts: Seq[String]): Seq[Double] =
    serving.generate(texts, sys).map { s =>
      try s.trim.toDouble catch { case _: NumberFormatException => Double.NaN }
    }
}
