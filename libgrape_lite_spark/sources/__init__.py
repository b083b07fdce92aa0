from libgrape_lite_spark.sources.tsv import load_edge_tsv, load_vertex_tsv, load_graph_tsv
from libgrape_lite_spark.sources.transcripts import synthesize_transcripts
from libgrape_lite_spark.sources.events import events_to_transcripts

__all__ = [
    "load_edge_tsv",
    "load_vertex_tsv",
    "load_graph_tsv",
    "synthesize_transcripts",
    "events_to_transcripts",
]
