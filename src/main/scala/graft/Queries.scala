package graft

import graft.operators.{Corpus, Curation, Dedup, Entity, Graph, Layout, Multimodal, ProductQuant, Profiling, Relational, Retrieval, ScalarQuant, Similarity, Skew, Temporal, TextAnalysis}
import graft.sources.{Bucketed, EmbeddingIndex}

/** The full gated query registry: every entry is an implemented operator
  * from SURVEY.md §2 (or the LLM-pipeline extension surface) exposed as a
  * driver-checkable query with a DuckDB oracle.
  */
object Queries {
  val all: Seq[QuerySpec] =
    Relational.specs ++ Similarity.specs ++ ProductQuant.specs ++
      ScalarQuant.specs ++ Dedup.specs ++
      TextAnalysis.specs ++ Multimodal.specs ++ Curation.specs ++ Skew.specs ++
      Temporal.specs ++ Profiling.specs ++ Bucketed.specs ++ Corpus.specs ++
      EmbeddingIndex.specs ++ Layout.specs ++ Graph.specs ++ Retrieval.specs ++
      Entity.specs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
