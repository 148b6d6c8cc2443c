package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` injects every graft SQL
  * function into each new session cluster-wide.
  *
  * This is deliberately the ONLY extension the engine needs. The brief's
  * escalation ladder — compose built-ins, then custom `Expression`, then
  * custom `LogicalPlan`/`Rule`/`SparkStrategy` — stops at level (b)
  * here: every operator the reference (and the training-data surface)
  * requires is expressible as DataFrame composition over built-ins plus
  * the codegen'd expressions in [[graft.functions]]; no operator needed
  * its own plan node, so Catalyst's optimizer applies to all of them
  * unmodified.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.Registry.inject(ext)
}
