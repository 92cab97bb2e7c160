"""HRNet JSON configer shim."""
import json
import jax
import jax.numpy as jnp


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
