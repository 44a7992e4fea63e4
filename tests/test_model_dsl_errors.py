"""Model-DSL compiler robustness: malformed configs produce actionable
ValueErrors (the reference eval()s yaml rows and crashes with whatever
NameError/IndexError falls out, yolo.py:450-456 — we validate instead)."""

import pytest

from desenet_tpu.models.build import parse_config


def base_cfg():
    return {
        "de_nc": 2, "se_nc": 2, "depth_multiple": 0.33,
        "width_multiple": 0.25,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Focus", [16, 3]],
                     [-1, 1, "Conv", [32, 3, 2]]],
        "head": [[[-1], 1, "Detect", ["de_nc", "anchors"]]],
    }


def test_valid_base_parses():
    spec = parse_config(base_cfg())
    assert spec.det_layer == 2


@pytest.mark.parametrize("key", ["de_nc", "depth_multiple", "anchors",
                                 "backbone", "head"])
def test_missing_required_key(key):
    cfg = base_cfg()
    del cfg[key]
    with pytest.raises(ValueError, match="missing required"):
        parse_config(cfg)


def test_non_mapping_config():
    with pytest.raises(ValueError, match="mapping"):
        parse_config([1, 2, 3])


def test_bad_row_shape():
    cfg = base_cfg()
    cfg["backbone"][1] = [-1, 1, "Conv"]  # missing args
    with pytest.raises(ValueError, match="row 1 must be"):
        parse_config(cfg)


def test_unknown_module():
    cfg = base_cfg()
    cfg["backbone"][1] = [-1, 1, "TotallyMadeUp", [32]]
    with pytest.raises(ValueError, match="unknown module 'TotallyMadeUp'"):
        parse_config(cfg)


def test_from_index_out_of_range():
    cfg = base_cfg()
    cfg["backbone"][1] = [7, 1, "Conv", [32, 3, 2]]  # forward reference
    with pytest.raises(ValueError, match="out of range"):
        parse_config(cfg)


def test_from_index_too_negative():
    cfg = base_cfg()
    cfg["backbone"][1] = [-5, 1, "Conv", [32, 3, 2]]
    with pytest.raises(ValueError, match="out of range"):
        parse_config(cfg)


def test_nc_override_beats_missing_de_nc():
    cfg = base_cfg()
    del cfg["de_nc"]
    spec = parse_config(cfg, nc=6)  # explicit override: no de_nc needed
    assert spec.de_nc == 6

# --- fuzz-found crashers (tools/fuzz_model_dsl.py), each kept as a fixed
# regression: the compiler must reject these with a clean ValueError, not
# hang (anchors shorthand used to allocate range(2N) unbounded) or raise
# IndexError/ZeroDivisionError.


def test_anchor_shorthand_bounded():
    cfg = base_cfg()
    cfg["head"][0] = [[-1], 1, "Detect", ["de_nc", 10**9]]
    with pytest.raises(ValueError, match="shorthand"):
        parse_config(cfg)


def test_repeat_count_bounded():
    cfg = base_cfg()
    cfg["backbone"][1] = [-1, 10**9, "Conv", [32, 3, 2]]
    with pytest.raises(ValueError, match="repeat count"):
        parse_config(cfg)
    cfg["backbone"][1] = [-1, 0, "Conv", [32, 3, 2]]
    with pytest.raises(ValueError, match="repeat count"):
        parse_config(cfg)


def test_empty_from_list():
    cfg = base_cfg()
    cfg["backbone"][1] = [[], 1, "Conv", [32, 3, 2]]
    with pytest.raises(ValueError, match="at least one input"):
        parse_config(cfg)


@pytest.mark.parametrize("row", [
    [-1, 1, "Conv", []],                 # width block needs out-channels
    [-1, 1, "nn.Upsample", ["None"]],    # needs scale
    [[-1], 1, "Detect", ["de_nc"]],      # needs anchors
    [-1, 1, "Contract", []],
])
def test_short_args_rejected(row):
    cfg = base_cfg()
    cfg["backbone"].insert(1, row)
    with pytest.raises(ValueError, match="needs at least"):
        parse_config(cfg)


@pytest.mark.parametrize("row", [
    [-1, 1, "nn.Upsample", [None, 0]],
    [-1, 1, "Contract", [0]],
    [-1, 1, "Expand", [-2]],
])
def test_degenerate_gains_rejected(row):
    cfg = base_cfg()
    cfg["backbone"].insert(1, row)
    with pytest.raises(ValueError):
        parse_config(cfg)


def test_fuzz_compiler_contract():
    """2000 randomly corrupted configs: parse_config returns a spec or
    raises ValueError/TypeError/KeyError — never an internal error and
    never hangs (5s alarm per config inside the fuzzer)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fuzz_model_dsl import run as fuzz_run

    assert fuzz_run(2000, seed=0) == []
