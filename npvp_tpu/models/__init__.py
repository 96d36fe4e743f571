from npvp_tpu.models.coords import (coordinate_grid, full_coordinate_volume,
                                    spatial_index_lists, task_time_lists)
from npvp_tpu.models.predictor import (NPPredictor, PredictorOutput,
                                       build_predictor)
from npvp_tpu.models.inference import VideoPredictor
