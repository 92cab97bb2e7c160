"""Parity tests for the core op library against scipy/torch oracles."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from csbsr_tpu.ops import (
    resize,
    pixel_shuffle,
    adaptive_avg_pool,
    edt,
    sdf_normalized,
    gaussian_kernels,
    batch_blur,
    degrade,
    kernel_compound,
    split_patch,
    joint_patch,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


# ------------------------------------------------------------------ resize
@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (8, 8)), ((8, 8), (32, 32)), ((56, 56), (224, 224))])
def test_bicubic_matches_torch(rng, in_hw, out_hw):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.rand(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), out_hw, method="bicubic"))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.interpolate(xt, out_hw, mode="bicubic", align_corners=False)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_bilinear_align_corners_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.rand(1, 14, 14, 5).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), (56, 56), method="bilinear", align_corners=True))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.interpolate(xt, (56, 56), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_bilinear_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.rand(1, 28, 28, 4).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), (56, 56), method="bilinear"))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.interpolate(xt, (56, 56), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_area_matches_adaptive_pool(rng):
    torch = pytest.importorskip("torch")

    x = rng.rand(2, 17, 23, 3).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), (6, 6)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.AdaptiveAvgPool2d((6, 6))(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pixel_shuffle_matches_torch(rng):
    torch = pytest.importorskip("torch")

    x = rng.rand(2, 5, 7, 36).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 3))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.PixelShuffle(3)(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=0)


# --------------------------------------------------------------------- EDT
def test_edt_matches_scipy(rng):
    from scipy.ndimage import distance_transform_edt

    mask = rng.rand(3, 41, 37) > 0.95
    mask[1] = False
    mask[1, 20, 18] = True
    ours = np.asarray(edt(jnp.asarray(mask)))
    for b in range(3):
        ref = distance_transform_edt(~mask[b])
        np.testing.assert_allclose(ours[b], ref, atol=1e-3)


def test_sdf_normalized_matches_reference_formula(rng):
    from scipy.ndimage import distance_transform_edt as distance

    gt = (rng.rand(2, 1, 33, 33) > 0.8).astype(np.float32)
    gt[1] = 0  # empty mask slice must produce zeros
    ours = np.asarray(sdf_normalized(jnp.asarray(gt)))

    # reference compute_sdf1_1 (boundary_loss.py:40-67) with our own
    # find_boundaries (skimage unavailable; 4-neighbour inner boundary)
    def ref_boundary(posmask):
        p = np.pad(posmask, 1, constant_values=True)
        inner = p[:-2, 1:-1] & p[2:, 1:-1] & p[1:-1, :-2] & p[1:-1, 2:]
        return posmask & ~inner

    expected = np.zeros_like(ours)
    for b in range(2):
        posmask = gt[b, 0].astype(bool)
        if posmask.any():
            negmask = ~posmask
            posdis = distance(posmask)
            negdis = distance(negmask)
            sdf = (negdis - negdis.min()) / max(negdis.max() - negdis.min(), 1e-12) - (
                posdis - posdis.min()
            ) / max(posdis.max() - posdis.min(), 1e-12)
            sdf[ref_boundary(posmask)] = 0
            expected[b, 0] = sdf
    np.testing.assert_allclose(ours, expected, atol=1e-3)


# -------------------------------------------------------------------- blur
def test_gaussian_kernel_matches_reference_formula():
    """Vectorised generator vs the scalar formula of blur.py:128-168."""
    key = jax.random.PRNGKey(0)
    ks = np.asarray(gaussian_kernels(key, 4, size=21, sigma_range=(0.2, 4.0)))
    assert ks.shape == (4, 21, 21)
    np.testing.assert_allclose(ks.sum(axis=(1, 2)), 1.0, atol=1e-5)
    assert (ks >= 0).all()


def test_batch_blur_matches_torch_groupconv(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    imgs = rng.rand(3, 16, 16, 2).astype(np.float32)
    kerns = rng.rand(3, 5, 5).astype(np.float32)
    kerns /= kerns.sum(axis=(1, 2), keepdims=True)
    ours = np.asarray(batch_blur(jnp.asarray(imgs), jnp.asarray(kerns)))
    for b in range(3):
        x = torch.from_numpy(imgs[b].transpose(2, 0, 1))[None]
        w = torch.from_numpy(kerns[b])[None, None].expand(2, 1, 5, 5)
        ref = F.conv2d(x, w, stride=1, padding=2, groups=2)[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours[b], ref, atol=1e-5)


def test_degrade_shapes():
    hr = jnp.ones((2, 64, 64, 3))
    k = jnp.asarray(np.eye(21)[None].repeat(2, 0), jnp.float32)
    k = k / k.sum(axis=(1, 2), keepdims=True)
    lr = degrade(hr, k, scale_factor=4)
    assert lr.shape == (2, 16, 16, 3)


def test_kernel_compound_normalised(rng):
    a = jnp.asarray(rng.rand(2, 21, 21).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 21, 21).astype(np.float32))
    out = kernel_compound(a, b)
    assert out.shape == (2, 21, 21)
    np.testing.assert_allclose(np.asarray(out).sum(axis=(1, 2)), 1.0, atol=1e-5)


@pytest.mark.quick
@pytest.mark.parametrize("mode", ["gaus", "disk", "motion", "all_rand", "motion-gaus"])
def test_kernel_sampler_modes(mode):
    """`make_kernel_sampler` dispatch parity with `set_blur`
    (`blur/blur.py:207-238`): every mode yields normalised, non-negative,
    jit-stable (B, k, k) kernels."""
    from csbsr_tpu.ops.blur import make_kernel_sampler

    sample = make_kernel_sampler(mode=mode, size=21)
    ks = jax.jit(sample, static_argnums=1)(jax.random.PRNGKey(3), 4)
    ks = np.asarray(ks)
    assert ks.shape == (4, 21, 21)
    assert (ks >= 0).all()
    np.testing.assert_allclose(ks.sum(axis=(1, 2)), 1.0, atol=1e-5)
    # distinct kernels per sample (the point of per-sample randomness)
    assert not np.allclose(ks[0], ks[1])


def test_kernel_sampler_gaus_matches_gaussian_kernels():
    """mode='gaus' must be exactly the plain gaussian generator."""
    from csbsr_tpu.ops.blur import make_kernel_sampler

    key = jax.random.PRNGKey(9)
    ours = make_kernel_sampler(mode="gaus", size=13, sigma_range=(0.2, 4.0))(key, 3)
    ref = gaussian_kernels(key, 3, size=13, sigma_range=(0.2, 4.0))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_kernel_sampler_unknown_mode():
    from csbsr_tpu.ops.blur import make_kernel_sampler

    with pytest.raises(ValueError):
        make_kernel_sampler(mode="nope")


# ------------------------------------------------------------------- patch
def test_patch_roundtrip(rng):
    img = jnp.asarray(rng.rand(112, 168, 3).astype(np.float32))
    patches, ushape = split_patch(img, 56, 56)
    assert patches.shape == (6, 56, 56, 3)
    back = joint_patch(patches, ushape)
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(img), atol=0)


def test_patch_roundtrip_scaled(rng):
    """SR scales patch H/W before reassembly (inference.py:89-90 semantics)."""
    img = jnp.asarray(rng.rand(112, 112, 3).astype(np.float32))
    patches, ushape = split_patch(img, 56, 56)
    up = jnp.repeat(jnp.repeat(patches, 4, axis=1), 4, axis=2)
    ushape2 = ushape.copy()
    ushape2[[5, 6]] *= 4
    out = joint_patch(up, ushape2)
    assert out.shape == (1, 448, 448, 3)


def test_blur_kernel_cli(tmp_path):
    """`python -m csbsr_tpu.ops.blur DIR N` = the reference blur.py:275-282
    __main__ probe: N random kernels dumped as max-normalised L-mode PNGs."""
    import numpy as np
    from PIL import Image
    from csbsr_tpu.ops.blur import _kernel_cli

    _kernel_cli([str(tmp_path), "2", "--size", "11", "--seed", "3"])
    for i in range(2):
        img = np.array(Image.open(tmp_path / f"{i}.png"))
        assert img.shape == (11, 11) and img.max() == 255
