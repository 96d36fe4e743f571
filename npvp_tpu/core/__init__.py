from npvp_tpu.core.config import (AEConfig, Config, DatasetConfig, EnvConfig,
                                  PredictorConfig, apply_overrides, from_dict,
                                  load_config)
