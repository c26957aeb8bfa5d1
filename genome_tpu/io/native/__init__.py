from genome_tpu.io.native.cio import native_available, parse_fastx_codes

__all__ = ["native_available", "parse_fastx_codes"]
