from .kgtk_tsv import (read_kgtk_tsv, read_kgtk_jsonl, write_kgtk_tsv,
                       read_edges_parquet, write_edges_parquet)
from .rdf import import_ntriples, generate_ntriples
from .formats import (
    to_markdown,
    write_jsonl,
    export_neo4j,
    export_neo4j_nodes,
    export_entities_json,
    generate_mediawiki_jsons,
)
from .importers import edges_from_table, import_conceptnet_like
from .mediawiki import generate_wikidata_jsons, load_prop_types
from .wikidata import import_wikidata, split_wikidata

__all__ = [
    "read_kgtk_tsv",
    "read_kgtk_jsonl",
    "write_kgtk_tsv",
    "read_edges_parquet",
    "write_edges_parquet",
    "import_ntriples",
    "generate_ntriples",
    "to_markdown",
    "write_jsonl",
    "export_neo4j",
    "export_neo4j_nodes",
    "export_entities_json",
    "generate_mediawiki_jsons",
    "generate_wikidata_jsons",
    "load_prop_types",
    "edges_from_table",
    "import_conceptnet_like",
    "import_wikidata",
    "split_wikidata",
]
