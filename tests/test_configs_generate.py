"""configs/generate.py regression: the committed YAMLs must be exactly what
the generator produces (catches silent drift between the two), and every
generated config must pass Config.validate()."""

import pathlib

import yaml

from npvp_tpu.configs import generate as gen
from npvp_tpu.core.config import from_dict


def test_committed_configs_match_generator():
    cfg_dir = pathlib.Path(gen.__file__).parent
    count = 0
    for ds_name, variants in gen.SHIPPED.items():
        for variant in variants:
            built = gen.build_config(ds_name, variant)
            path = cfg_dir / f"config_{ds_name}_{variant}.yaml"
            assert path.exists(), path
            committed = yaml.safe_load(path.read_text())
            assert committed == built, f"{path.name} drifted from generator"
            count += 1
    assert count >= 21  # the full shipped family


def test_generated_configs_validate():
    for ds_name, variants in gen.SHIPPED.items():
        for variant in variants:
            built = gen.build_config(ds_name, variant)
            from_dict(built).validate()
