from genome_tpu.io.native.cio import (count_fastx_records, native_available,
                                      parse_fastx_codes)

__all__ = ["count_fastx_records", "native_available", "parse_fastx_codes"]
