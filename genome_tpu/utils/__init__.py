from genome_tpu.utils import dna

__all__ = ["dna"]
