package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy pipeline: a sequence of [[Op]]s folded over one DataFrame.
  *
  * Mirrors the reference's `PipelineABC` compile/forward split
  * (`dataflow/pipeline/Pipeline.py:43-58,507-541`) but executes as a single
  * Catalyst plan instead of step-materialized pandas frames. `validate`
  * reproduces the key-flow check (`Pipeline.py:100-135`): each op's
  * inputKeys must be produced by the source schema or an earlier op.
  */
final case class Pipeline(ops: Seq[Op]) {

  /** Pre-flight key-flow validation against a source schema. Returns the
    * accumulated column set; throws with an op-level diagnostic on a
    * missing key (friendlier than Catalyst's analysis error). */
  def validate(sourceColumns: Seq[String]): Set[String] =
    ops.foldLeft(sourceColumns.toSet) { (cols, op) =>
      val missing = op.inputKeys.filterNot(cols.contains)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"op '${op.name}': input key(s) ${missing.mkString(", ")} not " +
            s"produced by any previous operator; available: ${cols.toSeq.sorted.mkString(", ")}")
      cols ++ op.outputKeys
    }

  def apply(df: DataFrame): DataFrame = {
    validate(df.columns.toSeq)
    ops.foldLeft(df)((d, op) => op(d))
  }

  /** Checkpointed run: writes parquet after each op — parity with the
    * reference's per-step `FileStorage` materialization
    * (`dataflow/utils/storage.py:522-698`) for debuggability/resume. At
    * scale this is opt-in, not the execution model. */
  def runCheckpointed(df: DataFrame, checkpointDir: String): DataFrame = {
    validate(df.columns.toSeq)
    val spark = df.sparkSession
    ops.zipWithIndex.foldLeft(df) { case (d, (op, i)) =>
      val out = op(d)
      val path = f"$checkpointDir/step$i%03d_${op.name}"
      out.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }

  /** Graphviz DOT rendering of the op/key dependency graph — the
    * declarative twin of the reference's `draw_graph`
    * (`dataflow/pipeline/Pipeline.py:252-341`, pyvis nodes labeled
    * name/class/step with key-flow edges). Emitting DOT text keeps it
    * dependency-free: `dot -Tpng` or any viewer renders it. Edges follow
    * key production: the op (or source) that last produced a key links to
    * every op consuming it, labeled with the keys carried. */
  def toDot(sourceColumns: Seq[String]): String = {
    validate(sourceColumns)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val sb = new StringBuilder("digraph pipeline {\n  rankdir=LR;\n  node [shape=box];\n")
    sb.append("  source [label=\"source\", shape=oval];\n")
    ops.zipWithIndex.foreach { case (op, i) =>
      sb.append(s"""  op$i [label="${esc(op.name)}\\n<${op.getClass.getSimpleName}>\\n(step=$i)"];\n""")
    }
    val producer = scala.collection.mutable.Map.empty[String, Int] // key → step, source = -1
    sourceColumns.foreach(c => producer(c) = -1)
    def id(step: Int) = if (step < 0) "source" else s"op$step"
    ops.zipWithIndex.foreach { case (op, i) =>
      if (op.inputKeys.isEmpty)
        sb.append(s"  ${id(i - 1)} -> op$i [style=dashed];\n")
      else op.inputKeys.groupBy(producer).toSeq.sortBy(_._1).foreach { case (p, keys) =>
        sb.append(s"""  ${id(p)} -> op$i [label="${esc(keys.mkString(", "))}"];\n""")
      }
      op.outputKeys.foreach(k => producer(k) = i)
    }
    sb.append("}\n").toString
  }

  /** Resume from the last completed step checkpoint, mirroring
    * `Pipeline.py:507-515` resume_step. */
  def resume(spark: SparkSession, checkpointDir: String, fromStep: Int): DataFrame = {
    val start = spark.read.parquet(
      f"$checkpointDir/step${fromStep}%03d_${ops(fromStep).name}")
    ops.drop(fromStep + 1).foldLeft(start)((d, op) => op(d))
  }
}

object Pipeline {
  def of(ops: Op*): Pipeline = Pipeline(ops)
}
