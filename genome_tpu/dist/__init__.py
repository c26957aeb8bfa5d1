from genome_tpu.dist.assemble import assemble_sharded
from genome_tpu.dist.partition import owner_of_np

__all__ = ["assemble_sharded", "owner_of_np"]
