from .core import (
    kgtk_filter,
    ifempty,
    ifnotempty,
    calc_percentage,
    expand_lists,
    normalize_nodes,
    lower_labels,
    add_id,
    remove_columns,
    rename_columns,
    reorder_columns,
    cat,
)
from .shuffle import (
    compact,
    compact_sorted,
    dedup_with_transforms,
    unique_counts,
    ifexists,
    ifnotexists,
    kgtk_join,
    lift,
    sort_edges,
    dedup_exact_edges,
)
from .validate import validate_edges, clean_edges, explode_node2, implode_node2
from .graph import (
    degrees,
    graph_statistics,
    reachable_nodes,
    connected_components,
    paths,
    paths_statistics,
    graph_statistics_edges,
    hits,
    pagerank,
)
from .window import tumbling_window, sliding_window, session_window
from .unreify import unreify_rdf_statements, unreify_values
from .propvalidate import validate_properties
from .sample import (every_nth, record_limit, tail, initial_skip,
                     sample_per_group, shard_assign, split_dataset,
                     weighted_sample)
from .profile import grouped_profile

__all__ = [
    "kgtk_filter", "ifempty", "ifnotempty", "calc_percentage", "expand_lists",
    "normalize_nodes", "lower_labels", "add_id", "remove_columns", "rename_columns",
    "reorder_columns", "cat", "compact", "compact_sorted",
    "dedup_with_transforms", "unique_counts", "ifexists", "ifnotexists",
    "kgtk_join", "lift", "sort_edges", "dedup_exact_edges", "validate_edges",
    "clean_edges", "explode_node2", "implode_node2", "degrees", "graph_statistics",
    "reachable_nodes", "connected_components", "paths", "paths_statistics", "graph_statistics_edges", "pagerank",
    "tumbling_window", "sliding_window", "session_window",
    "unreify_rdf_statements", "unreify_values", "hits", "validate_properties", "every_nth", "record_limit",
    "tail", "initial_skip", "sample_per_group", "weighted_sample",
    "split_dataset", "grouped_profile", "shard_assign",
]
