from salmon_tpu.parallel.quant_step import (make_mesh, parallel_map_paired,
                                            parallel_map_single,
                                            shard_batch_arrays)
from salmon_tpu.parallel.em import run_em_sharded
