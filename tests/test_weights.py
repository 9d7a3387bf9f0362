"""Weight format round-trip + validation (reference C6/C7)."""

import json

import numpy as np
import pytest

from waifu2x_tpu.models import (
    WAIFU2X_7LAYER,
    ModelSpec,
    init_params,
    load_model_json,
    params_from_json_obj,
    params_to_json_obj,
    save_model_json,
    validate_params,
)
from waifu2x_tpu.models.srcnn import count_maccs_per_pixel
import jax


def test_architecture_constants():
    spec = WAIFU2X_7LAYER
    assert spec.n_layers == 7
    assert spec.offset == 7  # srcnn.lua:31
    widths = [l.cin for l in spec.layers] + [spec.layers[-1].cout]
    assert widths == [1, 32, 32, 64, 64, 128, 128, 1]
    # sum of nIn*nOut over layers (appendix/waifu2x-commented.py:38) x 9 taps
    # = (1*32 + 32*32 + 32*64 + 64*64 + 64*128 + 128*128 + 128*1) * 9
    assert count_maccs_per_pixel(spec) == 31904 * 9


def test_init_and_validate():
    params = init_params(jax.random.PRNGKey(0))
    spec = validate_params(params, WAIFU2X_7LAYER)
    assert spec == WAIFU2X_7LAYER


def test_json_roundtrip(tmp_path, rng):
    params = init_params(jax.random.PRNGKey(1))
    path = tmp_path / "scale2.0x_model.json"
    save_model_json(path, params)
    loaded = load_model_json(path, WAIFU2X_7LAYER)
    for p, q in zip(params, loaded):
        # JSON stores decimal floats; repr round-trip is exact for float32
        # values serialized from float64 (python floats)
        np.testing.assert_array_equal(np.asarray(p["w"]), q["w"])
        np.testing.assert_array_equal(np.asarray(p["b"]), q["b"])


def test_json_schema_is_reference_format(rng):
    """The emitted schema must match the reference loader's expectations:
    weight[nOut][nIn][kH][kW], bias[nOut] (modelHandler.cpp:74-115)."""
    params = init_params(jax.random.PRNGKey(2), ModelSpec.from_widths([1, 2, 1]))
    doc = params_to_json_obj(params)
    assert doc[0]["nInputPlane"] == 1 and doc[0]["nOutputPlane"] == 2
    w = np.asarray(doc[0]["weight"], np.float32)
    assert w.shape == (2, 1, 3, 3)
    hwio = np.asarray(params[0]["w"])
    np.testing.assert_array_equal(w[1, 0], hwio[:, :, 0, 1])
    # and bias length
    assert len(doc[0]["bias"]) == 2
    # must be valid JSON end-to-end
    params2 = params_from_json_obj(json.loads(json.dumps(doc)))
    np.testing.assert_array_equal(params2[0]["w"], hwio)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: d[0].update(kW=5), "kW(5) != kH"),
        (lambda d: d[0].update(nOutputPlane=3), "weight shape"),
        (lambda d: d[0]["bias"].append(0.0), "bias shape"),
    ],
)
def test_loader_rejects_malformed(mutate, msg):
    params = init_params(jax.random.PRNGKey(3), ModelSpec.from_widths([1, 2, 1]))
    doc = params_to_json_obj(params)
    mutate(doc)
    with pytest.raises(ValueError, match=msg.replace("(", r"\(").replace(")", r"\)")):
        params_from_json_obj(doc)


def test_validate_rejects_broken_chain():
    params = init_params(jax.random.PRNGKey(4), ModelSpec.from_widths([1, 4, 1]))
    broken = list(params)
    broken[1] = {"w": np.zeros((3, 3, 5, 1), np.float32),
                 "b": np.zeros((1,), np.float32)}
    with pytest.raises(ValueError, match="does not chain"):
        validate_params(tuple(broken))
