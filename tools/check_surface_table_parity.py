"""Dev-time parity check: generated 3-D surfel-area table vs the DeepMind
table vendored by the reference (requires /root/reference to be present;
the pytest suite stays standalone - see tests/test_surface_distance_3d.py).

Usage: python tools/check_surface_table_parity.py
"""
import importlib.util
import os
import sys
import types

import numpy as np

REF_LUT = (
    "/root/reference/model/utils/metrics/surface_distance/metrics/lookup_tables.py"
)
REF_SD = (
    "/root/reference/model/utils/metrics/surface_distance/metrics/surface_distance.py"
)


def main():
    if not os.path.exists(REF_LUT):
        print("reference package not found; nothing to compare")
        return 0
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from csbsr_tpu.metrics.surface_distance import (
        _surface_area_table_3d,
        compute_surface_distances,
    )

    spec = importlib.util.spec_from_file_location("reflut", REF_LUT)
    lut = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lut)

    rc = 0
    for sp in ([1.0, 1.0, 1.0], [1.0, 2.0, 3.0], [0.7, 1.3, 0.9]):
        ref = lut.create_table_neighbour_code_to_surface_area(sp)
        mine = _surface_area_table_3d(sp)
        diff = float(np.abs(mine - ref).max())
        print(f"table spacing={sp}: max abs diff {diff:.2e}")
        if diff > 1e-12:
            rc = 1

    # end-to-end on random volumes (np.Inf shim for numpy>=2)
    for name in (
        "model", "model.utils", "model.utils.metrics",
        "model.utils.metrics.surface_distance",
        "model.utils.metrics.surface_distance.metrics",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["model.utils.metrics.surface_distance.metrics.lookup_tables"] = lut
    src = open(REF_SD).read().replace("np.Inf", "np.inf")
    ref_sd = types.ModuleType("refsd")
    exec(compile(src, "refsd", "exec"), ref_sd.__dict__)

    rng = np.random.RandomState(0)
    cases = [
        ((rng.rand(20, 22, 24) > 0.6), (rng.rand(20, 22, 24) > 0.55), [1.0, 1.0, 1.0]),
        ((rng.rand(20, 22, 24) > 0.6), (rng.rand(20, 22, 24) > 0.55), [2.0, 0.5, 1.5]),
        ((rng.rand(40, 40) > 0.7), (rng.rand(40, 40) > 0.65), [1.0, 1.0]),
    ]
    for g, p, sp in cases:
        a = compute_surface_distances(g, p, sp)
        b = ref_sd.compute_surface_distances(g, p, sp)
        worst = max(
            float(np.abs(np.asarray(a[k]) - np.asarray(b[k])).max()) if len(a[k]) else 0.0
            for k in a
        )
        print(f"e2e {g.ndim}-D spacing={sp}: max abs diff {worst:.2e}")
        if worst > 1e-12:
            rc = 1
    print("PARITY OK" if rc == 0 else "PARITY FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
