"""Round-2 extension-zoo equivalents: PacConvTranspose2d, pac_pool2d,
deformable PSROI pooling, PacCRF, ModuleHelper 'sn'/'frn' wiring.

Equivalence style follows tests/test_extensions.py: constant-guide PAC ops
collapse to their non-adaptive counterparts; PSROI is checked against a
direct numpy transcription of the CUDA kernel's spec
(extensions/dcn/src/cuda/deform_psroi_pooling_cuda.cu:46-135)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from csbsr_tpu.models.extensions import (
    PacCRF,
    PacConvTranspose2d,
    bn_relu,
    deform_psroi_pool,
    pac_gauss_kernel,
    pac_pool2d,
)


def test_pac_conv_transpose_uniform_guide_equals_deconv(rng):
    """Constant guide => all-ones kernel => correlation-form ConvTranspose2d
    == torch F.conv_transpose2d with a spatially flipped weight."""
    torch = pytest.importorskip("torch")
    x = rng.rand(1, 5, 5, 3).astype(np.float32)
    guide = np.ones((1, 10, 10, 2), np.float32)
    m = PacConvTranspose2d(4, kernel_size=4, stride=2, padding=1, output_padding=0)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(guide))
    out = np.asarray(m.apply(v, jnp.asarray(x), jnp.asarray(guide)))
    assert out.shape == (1, 10, 10, 4)

    w = np.asarray(v["params"]["kernel"]).reshape(4, 4, 3, 4)  # (kh,kw,I,O)
    w_flip = w[::-1, ::-1]  # correlation == convolution with flipped kernel
    tw = torch.from_numpy(np.transpose(w_flip, (2, 3, 0, 1)).copy())  # (I,O,kh,kw)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    ref = torch.nn.functional.conv_transpose2d(tx, tw, stride=2, padding=1)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    bias = np.asarray(v["params"]["bias"])
    # interior: the guide's zero-pad taps shrink border affinities
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2] + bias, atol=1e-4)


def test_pac_pool_uniform_guide_equals_avg_pool(rng):
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    guide = np.ones((2, 8, 8, 2), np.float32)
    out = np.asarray(pac_pool2d(jnp.asarray(x), jnp.asarray(guide), 2, stride=2,
                                normalize_kernel=True))
    ref = x.reshape(2, 4, 2, 4, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.quick
def test_pac_gauss_kernel_matches_formula(rng):
    g = rng.rand(1, 6, 6, 3).astype(np.float32)
    k = np.asarray(pac_gauss_kernel(jnp.asarray(g), 3, 1, 1, 1))
    assert k.shape == (1, 6, 6, 9)
    # center tap affinity is exactly 1
    np.testing.assert_allclose(k[..., 4], 1.0, atol=1e-6)
    # a hand-computed off-center tap at an interior pixel
    i, j = 3, 3
    d = g[0, i - 1, j - 1] - g[0, i, j]
    np.testing.assert_allclose(k[0, i, j, 0], np.exp(-0.5 * np.sum(d**2)), rtol=1e-5)


def _psroi_numpy_ref(data, rois, trans, pooled, out_dim, scale, gs, spp, tstd):
    """Direct transcription of DeformablePSROIPoolForwardKernel."""
    n = rois.shape[0]
    h, w = data.shape[1:3]
    part = pooled
    num_classes = 1 if trans is None else trans.shape[-1] // 2
    ch_each = out_dim // num_classes
    out = np.zeros((n, pooled, pooled, out_dim), np.float32)
    for ni in range(n):
        bi = int(rois[ni, 0])
        x1 = round(rois[ni, 1]) * scale - 0.5
        y1 = round(rois[ni, 2]) * scale - 0.5
        x2 = (round(rois[ni, 3]) + 1.0) * scale - 0.5
        y2 = (round(rois[ni, 4]) + 1.0) * scale - 0.5
        rw, rh = max(x2 - x1, 0.1), max(y2 - y1, 0.1)
        bh, bw = rh / pooled, rw / pooled
        sh, sw = bh / spp, bw / spp
        for ct in range(out_dim):
            cls = ct // ch_each
            for ph in range(pooled):
                for pw_ in range(pooled):
                    p_h = int(np.floor(ph / pooled * part))
                    p_w = int(np.floor(pw_ / pooled * part))
                    tx = 0.0 if trans is None else trans[ni, p_h, p_w, 2 * cls] * tstd
                    ty = 0.0 if trans is None else trans[ni, p_h, p_w, 2 * cls + 1] * tstd
                    ws = pw_ * bw + x1 + tx * rw
                    hs = ph * bh + y1 + ty * rh
                    gw = min(max(pw_ * gs // pooled, 0), gs - 1)
                    gh = min(max(ph * gs // pooled, 0), gs - 1)
                    c = (ct * gs + gh) * gs + gw
                    total, cnt = 0.0, 0
                    for ih in range(spp):
                        for iw in range(spp):
                            sx = ws + iw * sw
                            sy = hs + ih * sh
                            if sx < -0.5 or sx > w - 0.5 or sy < -0.5 or sy > h - 0.5:
                                continue
                            sx = min(max(sx, 0.0), w - 1.0)
                            sy = min(max(sy, 0.0), h - 1.0)
                            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                            x1i, y1i = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
                            fx, fy = sx - x0, sy - y0
                            v = (data[bi, y0, x0, c] * (1 - fy) * (1 - fx)
                                 + data[bi, y0, x1i, c] * (1 - fy) * fx
                                 + data[bi, y1i, x0, c] * fy * (1 - fx)
                                 + data[bi, y1i, x1i, c] * fy * fx)
                            total += v
                            cnt += 1
                    out[ni, ph, pw_, ct] = 0.0 if cnt == 0 else total / cnt
    return out


def test_deform_psroi_pool_matches_cuda_spec(rng):
    gs, out_dim, pooled = 2, 3, 3
    data = rng.rand(2, 12, 12, out_dim * gs * gs).astype(np.float32)
    rois = np.array([[0, 1, 2, 8, 9], [1, 0, 0, 11, 11]], np.float32)
    # no_trans
    ours = np.asarray(deform_psroi_pool(
        jnp.asarray(data), jnp.asarray(rois), None,
        pooled_size=pooled, output_dim=out_dim, group_size=gs, sample_per_part=2,
    ))
    ref = _psroi_numpy_ref(data, rois, None, pooled, out_dim, 1.0, gs, 2, 0.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # with offsets (single class)
    trans = (rng.randn(2, pooled, pooled, 2) * 0.5).astype(np.float32)
    ours = np.asarray(deform_psroi_pool(
        jnp.asarray(data), jnp.asarray(rois), jnp.asarray(trans),
        pooled_size=pooled, output_dim=out_dim, group_size=gs,
        sample_per_part=2, trans_std=0.1,
    ))
    ref = _psroi_numpy_ref(data, rois, trans, pooled, out_dim, 1.0, gs, 2, 0.1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pac_crf_runs_and_zero_pairwise_is_identity(rng):
    unary = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    edge = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    m = PacCRF(channels=2, num_steps=3, kernel_sizes=(3, 5), dilations=(1, 1))
    v = m.init(jax.random.PRNGKey(0), unary, edge)
    out = np.asarray(m.apply(v, unary, edge))
    assert out.shape == unary.shape and np.isfinite(out).all()
    # zero pairwise weights -> logQ = unary * w_u exactly
    params = jax.tree_util.tree_map(lambda a: a, v["params"])
    params["pairwise_weights"] = jnp.zeros_like(params["pairwise_weights"])
    out0 = np.asarray(m.apply({"params": params}, unary, edge))
    np.testing.assert_allclose(out0, np.asarray(unary), atol=1e-6)


@pytest.mark.quick
def test_bn_relu_sn_and_frn_wired(rng):
    import flax.linen as nn

    class Wrap(nn.Module):
        bn_type: str

        @nn.compact
        def __call__(self, x):
            return bn_relu(x, train=False, bn_type=self.bn_type)

    x = jnp.asarray((rng.rand(2, 6, 6, 4) * 4 - 2).astype(np.float32))
    for bn_type in ("sn", "frn"):
        m = Wrap(bn_type)
        v = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(v, x))
        assert out.shape == x.shape and np.isfinite(out).all()
    assert (np.asarray(Wrap("sn").apply(Wrap("sn").init(jax.random.PRNGKey(0), x), x)) >= 0).all()


def test_pac_crf_loose_runs(rng):
    from csbsr_tpu.models.extensions import PacCRFLoose

    unary = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    edge = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    m = PacCRFLoose(channels=2, num_steps=2)
    v = m.init(jax.random.PRNGKey(0), unary, edge)
    # per-step parameters exist (the 'loose' untying, paccrf.py:227-240)
    assert "step0_pairwise_weights" in v["params"] and "step1_pairwise_weights" in v["params"]
    out = np.asarray(m.apply(v, unary, edge))
    assert out.shape == unary.shape and np.isfinite(out).all()
