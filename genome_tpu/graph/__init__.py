from genome_tpu.graph.build import build_graph_device
from genome_tpu.graph.simplify import simplify_device
from genome_tpu.graph.contigs import emit_contigs

__all__ = ["build_graph_device", "simplify_device", "emit_contigs"]
