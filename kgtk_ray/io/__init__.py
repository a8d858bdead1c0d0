from .kgtk_tsv import read_kgtk_tsv, write_kgtk_tsv, read_edges_parquet, write_edges_parquet

__all__ = [
    "read_kgtk_tsv",
    "write_kgtk_tsv",
    "read_edges_parquet",
    "write_edges_parquet",
]
