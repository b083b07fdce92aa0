from libgrape_lite_spark.functions.ids import encode_vertices, encode_edges
from libgrape_lite_spark.functions.edges import (
    derive_edges,
    undirected,
    out_degrees,
    build_graph_from_transcripts,
)

__all__ = [
    "encode_vertices",
    "encode_edges",
    "derive_edges",
    "undirected",
    "out_degrees",
    "build_graph_from_transcripts",
]
