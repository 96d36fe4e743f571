"""Import the reference PyTorch modules with stand-in shims for their
missing deps (timm / pytorch_lightning), so converter parity tests can
compare our Flax modules against the genuine reference computation.

Test-only utility: the reference code is never imported by npvp_tpu itself.
"""

import sys
import types


def load_reference():
    import torch

    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_m = types.ModuleType("timm.models")
        timm_l = types.ModuleType("timm.models.layers")
        timm_l.to_2tuple = lambda x: (x, x) if not isinstance(
            x, (tuple, list)) else tuple(x)
        sys.modules.update({"timm": timm, "timm.models": timm_m,
                            "timm.models.layers": timm_l})
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def __init__(self):
                super().__init__()

            def save_hyperparameters(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.seed_everything = lambda *a, **k: None
        sys.modules["pytorch_lightning"] = pl
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import importlib

    # models/__init__.py re-exports class names that shadow the submodules,
    # so fetch the modules from sys.modules via importlib
    ref_predictor = importlib.import_module("models.Predictor")
    ref_ae = importlib.import_module("models.ResNetAutoEncoder")
    ref_former = importlib.import_module("models.VidHRFormer")
    ref_submodules = importlib.import_module("models.submodules")

    return types.SimpleNamespace(predictor=ref_predictor, ae=ref_ae,
                                 former=ref_former,
                                 submodules=ref_submodules)
