from genome_tpu.assemble.pipeline import assemble_device

__all__ = ["assemble_device"]
