"""Shape and init tests for the model zoo (tiny inputs, CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _init_and_run(model, *args, train=False, rngs=None):
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, *args, train=train)
    out = model.apply(
        variables, *args, train=train,
        mutable=["batch_stats"] if train else False,
        rngs={"dropout": jax.random.PRNGKey(1)} if train else None,
    )
    if train:
        return out[0]
    return out


@pytest.mark.quick
def test_dbpn_shapes():
    from csbsr_tpu.models.dbpn import DBPN

    x = jnp.zeros((1, 14, 14, 3))
    for stages in (2, 4):
        m = DBPN(scale_factor=4, num_stages=stages)
        out = _init_and_run(m, x)
        assert out.shape == (1, 56, 56, 3)


def test_kbpn_shapes():
    from csbsr_tpu.models.kbpn import KBPN

    k = 7
    m = KBPN(scale_factor=4, num_stages=2, estimate_ksize=k, ksize_output=k)
    x = jnp.zeros((2, 14, 14, 3))
    kv = jnp.ones((2, k * k)) / (k * k)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, kv, False, train=False)
    sr, kernel = m.apply(variables, x, kv, False, train=False)
    assert sr.shape == (2, 56, 56, 3)
    assert kernel.shape == (2, k * k)
    # GT-kernel path must return the GT kernel unchanged (SR-pretrain window)
    sr2, kernel2 = m.apply(variables, x, kv, True, train=False)
    np.testing.assert_allclose(np.asarray(kernel2), np.asarray(kv), rtol=1e-5)


@pytest.mark.quick
def test_unet16_shapes():
    from csbsr_tpu.models.unet import UNet16

    for method in ("deconv", "pixel_shuffle", "interpolate"):
        m = UNet16(up_sampling_method=method)
        out = _init_and_run(m, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 64, 64, 1)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_pspnet_shapes():
    from csbsr_tpu.models.pspnet import PSPNet

    m = PSPNet(n_classes=1)
    main, aux = _init_and_run(m, jnp.zeros((1, 64, 64, 3)))
    assert main.shape == (1, 64, 64, 1)
    assert aux.shape == (1, 64, 64, 1)


def test_pspnet_blurskip_shapes():
    from csbsr_tpu.models.pspnet import PSPNetBlurSkip

    m = PSPNetBlurSkip(n_classes=1)
    kv = jnp.ones((1, 49)) / 49
    main, aux = _init_and_run(m, jnp.zeros((1, 64, 64, 3)), kv)
    assert main.shape == (1, 64, 64, 1)
    assert aux.shape == (1, 64, 64, 1)


def test_kbpn_lr_error_mode():
    """SUM_LR_ERROR_POS='LR' (kbpn.py:176-186,410-412): the back-projected
    error joins the low-res features after each DownBlock."""
    from csbsr_tpu.models.kbpn import KBPN

    k = 7
    m = KBPN(scale_factor=4, num_stages=2, estimate_ksize=k, ksize_output=k,
             sum_lr_error_pos="LR")
    x = jnp.zeros((1, 14, 14, 3))
    kv = jnp.ones((1, k * k)) / (k * k)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, kv, False, train=False)
    sr, kernel = m.apply(variables, x, kv, False, train=False)
    assert sr.shape == (1, 56, 56, 3)
    assert kernel.shape == (1, k * k)
    # the LR-mode error conv exists in the param tree (KBlock 'conv')
    assert "conv" in variables["params"]["stage1_kb"]


def test_pspnet_extractor_zoo():
    """extractors.py zoo (resnet18..152 / densenet / squeezenet): forward
    shapes and the documented feature channel counts."""
    from csbsr_tpu.models.pspnet import make_extractor

    x = jnp.zeros((1, 32, 32, 3))
    expect = {
        "resnet18": (512, 256), "resnet50": (2048, 1024),
        "densenet": (1024, 512), "squeezenet": (512, 256),
    }
    for backend, (c4, c3) in expect.items():
        m = make_extractor(backend, jnp.float32)
        variables = m.init({"params": jax.random.PRNGKey(0)}, x)
        f4, f3 = m.apply(variables, x, False)
        assert f4.shape == (1, 4, 4, c4), (backend, f4.shape)
        assert f3.shape == (1, 4, 4, c3), (backend, f3.shape)


def test_pspnet_bottleneck_backend_end_to_end():
    from csbsr_tpu.models.pspnet import PSPNet

    m = PSPNet(n_classes=1, backend="resnet50")
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    main, aux = m.apply(variables, x)
    assert main.shape == (1, 32, 32, 1) and aux.shape == (1, 32, 32, 1)


def test_dense_ikc_matches_banded(monkeypatch):
    """CSBSR_DENSE_IKC selects the materialised IKC chain; both forms are
    the same math on the same params, so outputs must agree."""
    import csbsr_tpu.models.kbpn as kbpn_mod
    from csbsr_tpu.models.kbpn import KBPN

    k = 7
    m = KBPN(scale_factor=4, num_stages=2, estimate_ksize=k, ksize_output=k)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 14, 14, 3).astype(np.float32))
    kv = jnp.ones((2, k * k)) / (k * k)
    monkeypatch.setattr(kbpn_mod, "_DENSE_IKC", False)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, kv, False, train=False)
    sr_b, kern_b = m.apply(variables, x, kv, False, train=False)
    monkeypatch.setattr(kbpn_mod, "_DENSE_IKC", True)
    sr_d, kern_d = m.apply(variables, x, kv, False, train=False)
    np.testing.assert_allclose(np.asarray(kern_d), np.asarray(kern_b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sr_d), np.asarray(sr_b), atol=2e-4)


def test_merged_sr_matches_per_stage(monkeypatch):
    """CSBSR_MERGED_SR folds the 14 narrow sr_reconst/output_conv passes into
    one merged conv per producer stage (kbpn.py: _MERGED_SR). Same math on an
    identical param tree: init trees must match exactly, forward outputs and
    grads must agree to summation-order noise."""
    import csbsr_tpu.models.kbpn as kbpn_mod
    from csbsr_tpu.models.kbpn import KBPN

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32))

    def build(merged, **kw):
        # 2 stages keeps the multi-consumer merge covered (stage1's h feeds
        # both stage2_kb and output_conv) at half the CPU compile time of
        # the 3-stage variant; the 3-stage form was validated on-chip.
        monkeypatch.setattr(kbpn_mod, "_MERGED_SR", merged)
        return KBPN(scale_factor=4, num_stages=2, estimate_ksize=7,
                    ksize_output=21, dtype=jnp.float32, **kw)

    m_new = build(True)
    v_new = m_new.init({"params": jax.random.PRNGKey(0)}, x, None, False, train=False)
    m_old = build(False)
    v_old = m_old.init({"params": jax.random.PRNGKey(0)}, x, None, False, train=False)

    pn = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(v_new["params"])}
    po = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(v_old["params"])}
    assert set(pn) == set(po), set(pn) ^ set(po)
    for key in pn:
        np.testing.assert_array_equal(np.asarray(pn[key]), np.asarray(po[key]))

    monkeypatch.setattr(kbpn_mod, "_MERGED_SR", True)
    sr_new, kv_new = m_new.apply(v_old, x, None, False, train=False)
    monkeypatch.setattr(kbpn_mod, "_MERGED_SR", False)
    sr_old, kv_old = m_old.apply(v_old, x, None, False, train=False)
    np.testing.assert_allclose(np.asarray(sr_new), np.asarray(sr_old), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kv_new), np.asarray(kv_old), atol=1e-6)

    def mkloss(merged):
        m = build(merged, remat=True)

        def loss(v):
            sr, kv = m.apply(v, x, None, False, train=True)
            return jnp.sum(sr ** 2) + jnp.sum(kv ** 2)

        return loss

    monkeypatch.setattr(kbpn_mod, "_MERGED_SR", True)
    g_new = jax.grad(mkloss(True))(v_old)
    monkeypatch.setattr(kbpn_mod, "_MERGED_SR", False)
    g_old = jax.grad(mkloss(False))(v_old)
    a = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(g_new)])
    b = np.concatenate([np.ravel(t) for t in jax.tree_util.tree_leaves(g_old)])
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 1e-4, rel
