"""HRNet JSON configer shim."""
import json
import pytest
import jax
import jax.numpy as jnp

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def test_configer_json_roundtrip(tmp_path):
    from csbsr_tpu.models.hrnet_configer import set_configer, hrnet_from_configer

    cfg_path = tmp_path / "h48.json"
    cfg_path.write_text(json.dumps({
        "network": {"backbone": "hrnet48", "bn_type": "torchbn"},
        "data": {"num_classes": 1},
    }))
    configer = set_configer(str(cfg_path))
    assert configer.get("network", "bn_type") == "torchbn"
    assert configer.get("nope", "missing", default=7) == 7
    m = hrnet_from_configer(configer)
    assert m.num_classes == 1


def test_configer_width_rows(tmp_path):
    """hrnet18/32/64 rows dispatch to the width-parameterised backbone
    (hrnet_config.py width table); unknown names still raise."""
    import pytest
    from csbsr_tpu.models.hrnet_configer import set_configer, hrnet_from_configer

    for name, width in [("hrnet18", 18), ("hrnet32", 32), ("hrnet64", 64)]:
        cfg_path = tmp_path / f"{name}.json"
        cfg_path.write_text(json.dumps({
            "network": {"backbone": name}, "data": {"num_classes": 2},
        }))
        m = hrnet_from_configer(set_configer(str(cfg_path)))
        assert (m.width, m.num_classes) == (width, 2)

    cfg_path = tmp_path / "bad.json"
    cfg_path.write_text(json.dumps({"network": {"backbone": "hrnet96"}}))
    with pytest.raises(NotImplementedError):
        hrnet_from_configer(set_configer(str(cfg_path)))


def test_hrnet18_forward_shapes():
    """A real forward through the W18 row: aux head must be in_ch->in_ch
    (270 at W18), both outputs at input resolution."""
    from csbsr_tpu.models.hrnet_ocr import HRNetW48OCR

    m = HRNetW48OCR(num_classes=1, width=18)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    aux0 = params["params"]["aux_conv0"]
    kern = aux0["conv"]["kernel"] if "conv" in aux0 else aux0["kernel"]
    assert kern.shape[-2:] == (270, 270)
    out, aux = m.apply(params, x)
    assert out.shape == (1, 64, 64, 1) and aux.shape == (1, 64, 64, 1)
