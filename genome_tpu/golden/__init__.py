from genome_tpu.golden.assembler import assemble as assemble_golden
from genome_tpu.golden.assembler import count_canonical_kmers
from genome_tpu.golden.tiny import assemble as assemble_tiny

__all__ = ["assemble_golden", "assemble_tiny", "count_canonical_kmers"]
