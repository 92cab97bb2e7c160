"""Reference-oracle tests: the real torch modules from /root/reference are
the ground truth; our flax models + name translators must reproduce them.

Everything here is CPU-only (torch cpu + jax cpu) and f64 where possible.
"""
import pytest

from . import shims

shims.install()


def pytest_collection_modifyitems(items):
    # the whole oracle family counts as the conversion-correctness tier;
    # individual heavy tests (HRNet, DSRL) mark themselves slow.
    for item in items:
        if "reference_oracle" in str(item.fspath):
            item.add_marker(pytest.mark.oracle)
