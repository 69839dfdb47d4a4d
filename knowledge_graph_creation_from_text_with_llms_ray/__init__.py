"""kgray — a Ray-Data-native knowledge-graph construction engine.

Brand-new engine (NOT a port) with the query / data-processing
capabilities of abraxas-dev/Knowledge-Graph-Creation-from-Text-with-LLMs,
re-expressed as streaming ``ray.data.Dataset`` pipelines over zero-copy
Arrow batches:

    documents (repo, path, commit, lang, content)
      → clean + chunk           (stateless map_batches)
      → triple extraction       (actor pool, warm model state)
      → response parsing        (stateless map_batches, dual grammars)
      → entity/property linking (broadcast alias dict + embedding top-k)
      → canonicalization        (salted groupby on surface forms)
      → nodes / edges Parquet   (sorted groupby dedup materialization)

Layout:
    functions/  pure, deterministic kernels (grammars, chunker, hashing)
    sources/    corpus synthesis, readers, the broadcast alias dictionary
    stages/     Dataset -> Dataset transforms (the operators)
    pipelines/  end-to-end compositions + checkpointing
    state/      lineage manifests, partition-level resume

The public convenience alias is ``import
knowledge_graph_creation_from_text_with_llms_ray as kgray``.
"""

__version__ = "0.1.0"
