"""Strided batch_blur (s2d shift-einsum) vs torch grouped-conv oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from csbsr_tpu.ops.blur import batch_blur

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


@pytest.mark.parametrize("hw,k,s", [(32, 21, 4), (16, 7, 4), (24, 5, 2), (32, 21, 1)])
def test_batch_blur_strides_match_torch(rng, hw, k, s):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, c = 3, 3
    imgs = rng.rand(b, hw, hw, c).astype(np.float32)
    kerns = rng.rand(b, k, k).astype(np.float32)
    kerns /= kerns.sum(axis=(1, 2), keepdims=True)
    ours = np.asarray(batch_blur(jnp.asarray(imgs), jnp.asarray(kerns), stride=s))
    pad = (k - 1) // 2
    for i in range(b):
        x = torch.from_numpy(imgs[i].transpose(2, 0, 1))[None]
        w = torch.from_numpy(kerns[i])[None, None].expand(c, 1, k, k)
        ref = F.conv2d(x, w, stride=s, padding=pad, groups=c)[0].numpy().transpose(1, 2, 0)
        assert ours[i].shape == ref.shape
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)
