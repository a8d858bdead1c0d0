from .corpus import pages_from_documents, synthetic_corpus
from .extract import extract_text
from .triples import extract_triples, DEFAULT_PATTERNS, DOC_PATTERNS
from .link import EntityLinker, build_alias_map, build_entity_index, link_entities
from .canonicalize import canonicalize
from .kg import kg_pipeline, kg_pipeline_from_pages
from .manifest import materialize_edges, read_manifest, pending_partitions

__all__ = [
    "pages_from_documents", "synthetic_corpus", "extract_text",
    "extract_triples", "DEFAULT_PATTERNS", "DOC_PATTERNS", "EntityLinker",
    "link_entities", "build_alias_map", "build_entity_index", "canonicalize", "kg_pipeline", "kg_pipeline_from_pages",
    "materialize_edges", "read_manifest", "pending_partitions",
]
