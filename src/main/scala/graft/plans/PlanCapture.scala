package graft.plans

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Audit-time hook for plans that are otherwise invisible: the recall
  * evals and audit suites (d09, d13, s21/s21c, m11–m14) eagerly
  * materialize their pipelines via `localCheckpoint` and evict their
  * persisted inputs — correct at run time (a leaked cache would rewrite
  * every later query's plan), but it means `explain` on the RETURNED
  * frame shows only a checkpoint scan. The eager-materialization sites
  * call [[note]] with the pre-materialization frame; when a plan audit
  * has called [[enable]], the formatted plan is captured right there —
  * while the pipeline's persisted inputs are still in the plan — and
  * [[drain]] hands the audit real shuffle/pushdown/codegen evidence for
  * exactly the queries at the top of the cost table.
  *
  * Off by default: [[note]] is a single volatile read on the Bench and
  * Verify paths.
  */
object PlanCapture {

  @volatile private var queue
      : Option[ConcurrentLinkedQueue[(String, String)]] = None

  /** Turn capture on (plan-audit tooling only). */
  def enable(): Unit = queue = Some(new ConcurrentLinkedQueue)

  /** Turn capture off — MUST bracket any wall-clock measurement that
    * executes capture-instrumented pipelines: with capture on, every
    * eager materialization pays a full `explain("formatted")` of a
    * large plan inside the measured window. */
  def disable(): Unit = queue = None

  /** Captured (label, formatted plan) pairs since the last drain. */
  def drain(): Seq[(String, String)] = queue match {
    case Some(q) =>
      val out = Seq.newBuilder[(String, String)]
      var e = q.poll()
      while (e != null) { out += e; e = q.poll() }
      out.result()
    case None => Seq.empty
  }

  /** Record `df`'s formatted physical plan under `label` when a plan
    * audit is listening; free otherwise. Planning only — nothing
    * executes. */
  def note(label: String, df: DataFrame): Unit =
    queue.foreach(_.add(label -> explainText(df)))

  /** Capture `df.explain("formatted")` output as a string. */
  def explainText(df: DataFrame): String = {
    val buf = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(buf, true, "UTF-8")) {
      df.explain("formatted")
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }
}
