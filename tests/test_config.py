"""Config serde + run-name convention (reference config_base.py:8-72,
config_parm.py:57, test_brn.py:337-344)."""

import numpy as np

from tera_mind_tpu.config import TrainConfig, config_from_name, prep_config


def test_json_roundtrip(tmp_path):
    conf = prep_config("609882", batch=8, size=64, stain="DAPI", srna=8)
    conf.remat = True
    conf.save(tmp_path / "c.json")
    back = TrainConfig.load(tmp_path / "c.json")
    assert back == conf


def test_run_name_convention_and_rederivation():
    conf = prep_config("638850", batch=32, size=64, stain="all", srna=4)
    assert conf.name == "638850_64_229_all_4_ours"
    re = config_from_name(conf.name)
    assert re.mouse == "638850" and re.image_size == 64
    assert re.rna_num == 229 and re.stain == "all"
    assert re.rna_slices == 4 and re.method == "ours"


def test_method_encoded_in_name():
    for m in ("ours", "patch-dm", "sinf"):
        conf = prep_config("609889", method=m)
        assert conf.name.endswith(m)
        assert config_from_name(conf.name).method == m


def test_derived_fields_match_reference_formulas():
    """rchn = ceil(srna/2), x2 for stain='all' (config.py:293-308);
    gn_sz = size//16 (config_parm.py:47); accum = 64//batch."""
    c = prep_config("638850", batch=16, size=64, stain="all", srna=4)
    assert c.in_channels == 4 and c.gn_sz == 4 and c.accum_batches == 4
    c2 = prep_config("609882", batch=64, size=32, stain="PolyT", srna=8)
    assert c2.in_channels == 4 and c2.gn_sz == 2 and c2.accum_batches == 1
    assert c2.use_exl  # size 32 -> excluded-slice manifests (train.py)
    c3 = prep_config("638850", srna=1, stain="DAPI")
    assert c3.in_channels == 1 and c3.z_size == 1
