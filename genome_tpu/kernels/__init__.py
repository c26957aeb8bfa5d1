from genome_tpu.kernels.count import count_kmers_device
from genome_tpu.kernels.extract import extract_canonical_kmers, pack_reads

__all__ = ["count_kmers_device", "extract_canonical_kmers", "pack_reads"]
