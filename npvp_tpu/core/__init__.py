from npvp_tpu.core.config import (AEConfig, Config, DatasetConfig, EnvConfig,
                                  PredictorConfig, apply_overrides, from_dict,
                                  load_config)
from npvp_tpu.core.mesh import (batch_sharding, enable_sequence_parallel,
                                make_mesh, sequence_parallel, shard_batch,
                                shard_params, shard_state, sp_shard)
